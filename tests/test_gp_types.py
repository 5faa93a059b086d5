"""Unit tests for GPDB-specific type modules: complex, sparse vectors,
full-text — the pieces not already covered by an oracle-checked query
(svec_dot / svec_plus / to_tsvector)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def svec_df(spark):
    from gpdb_spark.functions.svec import svec_from_dense

    data = [
        (1, [0.0, 2.0, 0.0, -3.0]),
        (2, [1.0, 0.0, 4.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(data, "id long, dense array<double>")
    return df.select("id", svec_from_dense(F.col("dense")).alias("sv"), "dense")


def test_svec_dot_matches_dense(svec_df):
    from gpdb_spark.functions.svec import svec_dot

    a = svec_df.where("id = 1").select(F.col("sv").alias("a")).first()
    rows = (
        svec_df.crossJoin(
            svec_df.where("id = 1").select(F.col("sv").alias("other"))
        )
        .select("id", svec_dot(F.col("sv"), F.col("other")).alias("d"))
        .collect()
    )
    got = {r.id: r.d for r in rows}
    # dense dots vs [0,2,0,-3]: id1 = 4+9 = 13, id2 = 0, id3 = 0
    assert got == {1: 13.0, 2: 0.0, 3: 0.0}


def test_svec_plus_and_to_dense(svec_df, spark):
    from gpdb_spark.functions.svec import svec_plus, svec_to_dense

    pair = (
        svec_df.where("id = 1")
        .select(F.col("sv").alias("a"))
        .crossJoin(svec_df.where("id = 2").select(F.col("sv").alias("b")))
    )
    out = pair.select(
        svec_to_dense(svec_plus(F.col("a"), F.col("b")), 4).alias("d")
    ).first()
    assert out.d == [1.0, 2.0, 4.0, -3.0]


def test_svec_empty_support(svec_df):
    from gpdb_spark.functions.svec import svec_l2norm, svec_nnz

    r = (
        svec_df.where("id = 3")
        .select(svec_nnz(F.col("sv")).alias("n"), svec_l2norm(F.col("sv")).alias("l2"))
        .first()
    )
    assert r.n == 0 and r.l2 == 0.0


def test_complex_identities(spark):
    from gpdb_spark.functions.complex import c_abs, c_arg, c_conj, c_make, c_mul

    df = spark.createDataFrame([(3.0, 4.0)], "re double, im double")
    z = c_make(F.col("re"), F.col("im"))
    r = df.select(
        c_abs(z).alias("mod"),
        c_mul(z, c_conj(z))["re"].alias("zzbar_re"),
        c_mul(z, c_conj(z))["im"].alias("zzbar_im"),
        c_arg(z).alias("arg"),
    ).first()
    assert r.mod == 5.0
    assert r.zzbar_re == 25.0 and r.zzbar_im == 0.0
    assert math.isclose(r.arg, math.atan2(4.0, 3.0))


def test_to_tsvector_counts(spark):
    from gpdb_spark.functions.fulltext import to_tsvector

    df = spark.createDataFrame([("the cat and the hat",)], "text string")
    out = df.select(to_tsvector(F.col("text")).alias("v")).first().v
    got = {r["lexeme"]: r["tf"] for r in out}
    assert got == {"the": 2, "cat": 1, "and": 1, "hat": 1}
    # sorted lexeme order
    assert [r["lexeme"] for r in out] == sorted(got)


def test_ts_match_modes(spark):
    from gpdb_spark.functions.fulltext import ts_match

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha delta"), (3, "beta")],
        "doc_id long, text string",
    )
    all_ids = {r.doc_id for r in ts_match(df, ["alpha", "beta"], "all").collect()}
    any_ids = {r.doc_id for r in ts_match(df, ["alpha", "beta"], "any").collect()}
    assert all_ids == {1}
    assert any_ids == {1, 2, 3}


def test_named_timezone_dst(spark):
    """from_utc_timestamp with a named zone must apply DST: the same UTC
    wall-clock maps to EST (-05) in January and EDT (-04) in July —
    checked against Python zoneinfo ground truth."""
    from datetime import datetime, timezone
    from zoneinfo import ZoneInfo

    rows = [(datetime(2024, 1, 15, 12, 0),), (datetime(2024, 7, 15, 12, 0),)]
    df = spark.createDataFrame(rows, "ts timestamp")
    got = [
        r.local
        for r in df.select(
            F.from_utc_timestamp("ts", "America/New_York").alias("local")
        ).orderBy("local").collect()
    ]
    want = sorted(
        ts.replace(tzinfo=timezone.utc)
        .astimezone(ZoneInfo("America/New_York"))
        .replace(tzinfo=None)
        for (ts,) in rows
    )
    assert got == want
    assert got[0].hour == 7 and got[1].hour == 8  # EST -5, EDT -4


def test_range_type_semantics(spark):
    """rangetypes.c edge semantics: emptiness, unbounded sides,
    inclusive/exclusive touching, intersection emptiness."""
    from gpdb_spark.functions import ranges as R

    df = spark.range(1)

    def val(col):
        return df.select(col.alias("v")).collect()[0].v

    def rng(lo, hi, bounds="[)"):
        mk = lambda x: F.lit(x).cast("double") if x is not None else F.lit(None).cast("double")
        return R.range_make(mk(lo), mk(hi), bounds)

    # emptiness: lo > hi, or lo = hi unless []
    assert val(R.range_is_empty(rng(5, 3)))
    assert val(R.range_is_empty(rng(4, 4, "[)")))
    assert not val(R.range_is_empty(rng(4, 4, "[]")))
    # unbounded sides are never empty and contain accordingly
    assert not val(R.range_is_empty(rng(None, 3)))
    assert val(R.range_contains_elem(rng(None, 3), F.lit(-1e9)))
    assert val(R.range_contains_elem(rng(3, None), F.lit(1e9)))
    # element containment honors bound inclusivity
    assert val(R.range_contains_elem(rng(1, 2, "[]"), F.lit(2.0)))
    assert not val(R.range_contains_elem(rng(1, 2, "[)"), F.lit(2.0)))
    # touching ranges overlap only when both touching bounds inclusive
    assert val(R.range_overlaps(rng(1, 2, "[]"), rng(2, 3, "[]")))
    assert not val(R.range_overlaps(rng(1, 2, "[)"), rng(2, 3, "[]")))
    # containment: empty contained in everything; unbounded contains all
    assert val(R.range_contains(rng(5, 3), rng(7, 6)))
    assert val(R.range_contains(rng(0, 10), rng(5, 3)))
    assert val(R.range_contains(rng(None, None), rng(-1e6, 1e6, "[]")))
    assert not val(R.range_contains(rng(0, 10, "[)"), rng(5, 10, "[]")))
    # intersection of disjoint ranges is empty; overlap keeps bounds
    assert val(R.range_is_empty(R.range_intersect(rng(0, 1), rng(2, 3))))
    inter = R.range_intersect(rng(0, 5, "[]"), rng(3, 9, "[)"))
    assert val(R.range_lower(inter)) == 3.0
    assert val(R.range_upper(inter)) == 5.0
    assert not val(R.range_is_empty(inter))


def test_misc_types_semantics(spark):
    """dbsize.c pg_size_pretty thresholds; network.c inet operators;
    varbit.c bit ops."""
    from gpdb_spark.functions import misc_types as M

    df = spark.range(1)

    def val(col):
        return df.select(col.alias("v")).collect()[0].v

    # pg_size_pretty: PG-documented outputs at the unit boundaries
    assert val(M.pg_size_pretty(F.lit(10239))) == "10239 bytes"
    assert val(M.pg_size_pretty(F.lit(10240))) == "10 kB"
    assert val(M.pg_size_pretty(F.lit(1536))) == "1536 bytes"
    assert val(M.pg_size_pretty(F.lit(1024 * 1024 * 21))) == "21 MB"
    assert val(M.pg_size_pretty(F.lit(5_368_709_120))) == "5120 MB"
    assert val(M.pg_size_pretty(F.lit(1024**4 * 3))) == "3072 GB"

    # inet
    assert val(M.inet_network(F.lit("10.1.2.3/24"))) == "10.1.2.0/24"
    assert val(M.inet_masklen(F.lit("10.1.2.3"))) == 32
    assert val(M.inet_host(F.lit("10.1.2.3/24"))) == "10.1.2.3"
    assert val(M.inet_broadcast(F.lit("10.1.0.0/16"))) == "10.1.255.255/16"
    assert val(
        M.inet_contained_in(F.lit("192.168.1.5"), F.lit("192.168.1.0/24"))
    )
    assert not val(
        M.inet_contained_in(F.lit("192.168.2.5"), F.lit("192.168.1.0/24"))
    )
    # << is strict: a net is not contained in itself
    assert not val(
        M.inet_contained_in(F.lit("192.168.1.0/24"), F.lit("192.168.1.0/24"))
    )

    # varbit (length 8): B'10110000' ops
    b = F.lit(0b10110000)
    assert val(M.bit_to_string(b, 8)) == "10110000"
    assert val(M.bit_not(b, 8)) == 0b01001111
    assert val(M.bit_shiftl(b, 2, 8)) == 0b11000000  # dropped high bits
    assert val(M.get_bit(b, 0, 8)) == 1
    assert val(M.get_bit(b, 3, 8)) == 1
    assert val(M.get_bit(b, 1, 8)) == 0
    assert val(M.set_bit(b, 7, 1, 8)) == 0b10110001
    assert val(M.bit_xor(b, F.lit(0b11111111), 8)) == 0b01001111
