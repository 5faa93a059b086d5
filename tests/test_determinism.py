"""Cross-engine float-determinism gates.

Round 3 forensic finding (fuzz sim on reseeded fixtures): ``round(x, n)``
on DOUBLE disagrees between Spark (BigDecimal of the shortest decimal
repr, HALF_UP — round(0.285d, 2) = 0.29) and DuckDB (binary-scaled
nearbyint — 0.28), so any compared output built with round(double) can
flip the driver's value hash whenever the data lands near a tie. The
repo-wide policy is registry.fr / registry.ofr: floor(x*10^n)/10^n,
identical IEEE ops in both engines, bit-identical results. These tests
pin the divergence (so the policy stays motivated) and the fr/ofr
equivalence over adversarial values.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from gpdb_spark.registry import fr, ofr

# money-like ties, smooth irrationals, negatives, dyadics
ADVERSARIAL = [
    0.285, 2.005, 1.005, 2.675, 0.15, 1234.45, -0.0810585, -2.005,
    0.0234375, 7.6455895, 0.3363469890477031, 3.141592653589793,
    1e-7, 123456.789012345, -99.9999995,
]


def test_fr_matches_ofr_bitwise(spark):
    con = duckdb.connect()
    for n in (1, 2, 4, 6, 8):
        duck = con.execute(
            "SELECT " + ", ".join(ofr(f"CAST({v!r} AS DOUBLE)", n) for v in ADVERSARIAL)
        ).fetchone()
        got = spark.range(1).select(
            *[fr(F.lit(v).cast("double"), n) for v in ADVERSARIAL]
        ).collect()[0]
        assert tuple(got) == tuple(duck), f"n={n}"


def test_round_double_divergence_exists(spark):
    """Documents WHY the fr policy exists: native round(double) disagrees
    between the engines on at least one money-like tie. If this ever
    starts passing (engines converge), the fr policy is still safe —
    this test just flags that the motivation changed."""
    con = duckdb.connect()
    duck = con.execute("SELECT round(CAST(0.285 AS DOUBLE), 2)").fetchone()[0]
    got = spark.range(1).select(F.round(F.lit(0.285).cast("double"), 2)).collect()[0][0]
    assert got != duck  # Spark 0.29, DuckDB 0.28


def test_no_raw_float_products_in_embed_oracles():
    """DuckDB multiplies FLOAT*FLOAT in float precision while Spark's
    queries promote to double — every embedding product in an oracle
    must double-cast both operands (round-3 forensic: embed_norms
    diverged at 4e-7 per 64-dim sum)."""
    import re

    import gpdb_spark.queries  # noqa: F401
    from gpdb_spark.registry import ORACLE

    bad = {}
    pat = re.compile(r"(?<!AS DOUBLE\) \* CAST\()\b\w*\.?embedding\[i?\w*\]\s*\*")
    for name, sql in ORACLE.items():
        for m in re.finditer(r"embedding\[[^]]+\]\s*\*|\*\s*\w+\.embedding\[", sql):
            frag = sql[max(0, m.start() - 30) : m.end() + 30]
            if "AS DOUBLE" not in frag:
                bad.setdefault(name, []).append(frag)
    assert not bad, bad


def test_dsum_davg_split_long_matches_decimal_cast(spark):
    """r11 optimization gate: registry.dsum/davg moved from
    sum(cast(x AS DECIMAL(25,6))) to the split-long fixed-point sum
    (registry._usum). The two must be VALUE-IDENTICAL on the tame-measure
    domain (<=6 exact decimal digits, |x| < ~1e7 — money, quantities and
    their few-term products), including negatives, nulls, and
    all-null / empty groups."""
    from pyspark.sql import Row

    from gpdb_spark.registry import davg, dsum

    rows = [
        Row(g="a", x=0.285), Row(g="a", x=-2.005), Row(g="a", x=104999.99),
        Row(g="a", x=0.01), Row(g="a", x=1.005), Row(g="a", x=-0.015),
        Row(g="b", x=480000.0), Row(g="b", x=-480000.0), Row(g="b", x=0.0),
        Row(g="b", x=52500.375), Row(g="b", x=2.5e-6), Row(g="b", x=-2.5e-6),
        Row(g="c", x=None), Row(g="c", x=None),  # all-null group
        Row(g="d", x=9999999.999999), Row(g="d", x=-9999999.999999),
    ]
    df = spark.createDataFrame(rows, "g string, x double")

    def old_dsum(c, n=2):
        return F.round(F.sum(F.col(c).cast("decimal(25,6)")), n).cast("double")

    def old_davg(c, n=6):
        return fr(
            F.sum(F.col(c).cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1)),
            n,
        )

    got = {
        r.g: r
        for r in df.groupBy("g")
        .agg(
            dsum("x").alias("s_new"),
            old_dsum("x").alias("s_old"),
            davg("x").alias("a_new"),
            old_davg("x").alias("a_old"),
            dsum("x", 6).alias("s6_new"),
            F.round(F.sum(F.col("x").cast("decimal(25,6)")), 6)
            .cast("double")
            .alias("s6_old"),
        )
        .collect()
    }
    for g, r in got.items():
        assert r.s_new == r.s_old or (r.s_new is None and r.s_old is None), (g, r)
        assert r.a_new == r.a_old or (
            r.a_new is None or math.isnan(r.a_new)
        ), (g, r)
        assert r.s6_new == r.s6_old or (r.s6_new is None and r.s6_old is None), (g, r)
    # all-null group: exact sum is NULL in both formulations
    assert got["c"].s_new is None and got["c"].s_old is None
