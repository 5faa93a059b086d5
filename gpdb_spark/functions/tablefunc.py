"""tablefunc normal_rand — n values from a normal distribution
(reference: contrib/tablefunc/tablefunc.c:174 normal_rand, :58
get_normal_pair Box-Muller). crosstab/connectby live in
``engine.py::crosstab`` and the recursive-union ``connectby_tree``.

Two tiers, same doctrine as the MinHash families (datapipe/dedup.py):

- **native** (``portable=False``): ``mean + stddev * F.randn(seed)``
  — Spark's JVM Gaussian (XORShift + polar method), the fast path for
  real workloads. Deterministic per (seed, partitioning) but not
  reproducible outside Spark, so it is pytest-attested (moment checks)
  rather than oracled.
- **portable** (default): seeded md5-derived Irwin–Hall(12) — the sum
  of 12 uniforms minus 6 is a classic CLT normal approximation
  (variance exactly 1, support ±6σ). Every uniform is a 13-hex-digit
  integer scaled by 2^-52 (16^13 = 2^52, exact in doubles) so both
  engines run the same IEEE +,*,/ ops — no ln/cos, whose libm
  rounding differs across engines. DuckDB re-derives the whole column
  from the same md5 strings, which is what makes the oracled query
  possible at all: true normal_rand is nondeterministic, so ANY
  attestable twin must pin the entropy source, and this one documents
  that divergence from tablefunc.c's srandom-seeded Box-Muller.

Scale shape: a pure per-row map over ``spark.range(n)`` (distributed
id generator, no data source) — 6 md5 calls per row inside whole-stage
codegen, zero Python, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

# 16^13 == 2^52: a 13-hex-digit integer is exact in a double, and the
# scale factor is a power of two, so u = (k + 0.5) * 2^-52 is one
# IEEE multiply — identical in Spark and DuckDB.
_SCALE = float(2.0 ** -52)


def _uniform(hex_col: Column, start: int) -> Column:
    """Uniform in (0,1) from 13 hex digits of an md5 column."""
    k = F.conv(F.substring(hex_col, start, 13), 16, 10).cast("double")
    return (k + F.lit(0.5)) * F.lit(_SCALE)


def irwin_hall_normal(i: Column, seed: int) -> Column:
    """Standard-normal-ish deviate for row id ``i``: sum of 12 seeded
    md5 uniforms minus 6 (Irwin–Hall CLT; mean 0, variance exactly 1).
    Each md5 yields two independent 13-digit uniforms -> 6 hashes."""
    total = F.lit(0.0)
    for j in range(6):
        h = F.md5(F.concat_ws(":", F.lit(seed), i.cast("string"), F.lit(j)))
        total = total + _uniform(h, 1) + _uniform(h, 14)
    return total - F.lit(6.0)


def normal_rand(
    spark: SparkSession,
    n: int,
    mean: float,
    stddev: float,
    seed: int = 0,
    portable: bool = True,
) -> DataFrame:
    """normal_rand(n, mean, stddev) -> (i, val). See module docstring
    for the portable-vs-native tier contract."""
    df = spark.range(int(n)).withColumnRenamed("id", "i")
    if portable:
        z = irwin_hall_normal(F.col("i"), seed)
    else:
        z = F.randn(seed)
    return df.select("i", (F.lit(mean) + F.lit(stddev) * z).alias("val"))


def duck_normal_rand_sql(n: int, mean: float, stddev: float, seed: int = 0) -> str:
    """DuckDB twin of the portable tier: the identical md5 strings and
    the same unrolled exact hex-to-int sums (powers of 16 are powers of
    two — every term exact in a double)."""

    def hex13(expr: str, start: int) -> str:
        # start is 1-based (DuckDB substr), mirroring Spark substring.
        # Multipliers MUST be CAST(... AS DOUBLE), not written as
        # 281474976710656.0: that literal types as DECIMAL in DuckDB,
        # the whole term chain then sums in DECIMAL(18,1), and THAT ->
        # DOUBLE conversion rounds (mantissas ending .5 exceed 2^53) —
        # a 1-ulp skew vs Spark that floor-truncation can flip at a
        # boundary. A BIGINT literal cast to DOUBLE is exact (every
        # power of 16 here is < 2^53), keeping the chain pure IEEE.
        return " + ".join(
            f"(strpos('0123456789abcdef', substr({expr}, {start + p}, 1)) - 1)"
            f" * CAST({16 ** (12 - p)} AS DOUBLE)"
            for p in range(13)
        )

    def dbl(x: float) -> str:
        # 17-sig-digit E-notation round-trips any double exactly and
        # always parses as DOUBLE (never DECIMAL) in DuckDB
        return f"{float(x):.17e}"

    us = []
    for j in range(6):
        h = f"md5('{seed}:' || CAST(i AS VARCHAR) || ':{j}')"
        us.append(f"((({hex13(h, 1)}) + 0.5) * {dbl(_SCALE)})")
        us.append(f"((({hex13(h, 14)}) + 0.5) * {dbl(_SCALE)})")
    z = "(" + " + ".join(us) + " - 6.0)"
    return (
        f"SELECT i, ({dbl(mean)} + {dbl(stddev)} * {z}) AS val "
        f"FROM range({int(n)}) t(i)"
    )
