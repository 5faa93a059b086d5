"""pgcrypto hmac() (contrib/pgcrypto/px-hmac.c) as pure JVM expressions:
constant-folded RFC 2104 pads + builtin md5/sha1/sha2 over binary
concat — codegen-resident, no Python in the loop."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpdb_spark.functions.crypto import hmac_hex, reference_hmac_hex

JEFE_SHA256 = "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843"


def _compute(spark, data: str, key, algo: str) -> str:
    df = spark.createDataFrame([(data,)], "m string")
    return df.select(hmac_hex(F.col("m"), key, algo).alias("h")).first().h


def test_rfc2202_4231_jefe_vectors(spark):
    """RFC 2202 (md5/sha1) and RFC 4231 (sha2 family) test case 2."""
    data, key = "what do ya want for nothing?", "Jefe"
    got = _compute(spark, data, key, "sha256")
    assert got == JEFE_SHA256  # published RFC 4231 constant
    for algo in ("md5", "sha1", "sha224", "sha384", "sha512"):
        assert _compute(spark, data, key, algo) == reference_hmac_hex(
            data, key, algo
        )


def test_long_key_is_hashed_first(spark):
    """Keys longer than the block are digested first (RFC 4231 case 6);
    sha384/512 use the 128-byte block."""
    key = b"\xaa" * 131
    data = "Test Using Larger Than Block-Size Key - Hash Key First"
    for algo in ("sha256", "sha512", "md5"):
        assert _compute(spark, data, key, algo) == reference_hmac_hex(
            data, key, algo
        )


def test_hmac_stays_jvm_side(spark):
    df = spark.createDataFrame([("x",), ("y",)], "m string").select(
        hmac_hex(F.col("m"), "k", "sha256").alias("h")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hmac_over_corpus_distinct(spark):
    """Distinct messages get distinct MACs; equal messages collide —
    the keyed-fingerprint use (signed dedup keys) a pipeline needs."""
    df = spark.createDataFrame(
        [("a", "doc one"), ("b", "doc two"), ("c", "doc one")], "id string, m string"
    )
    out = df.select("id", hmac_hex(F.col("m"), b"signing-key", "sha256").alias("h"))
    rows = {r.id: r.h for r in out.collect()}
    assert rows["a"] == rows["c"] != rows["b"]
    assert rows["a"] == reference_hmac_hex("doc one", b"signing-key", "sha256")
