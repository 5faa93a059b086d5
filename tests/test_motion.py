"""Motion-vocabulary explain (SURVEY.md §2.8 parity tool)."""

from __future__ import annotations

from pyspark.sql import functions as F

import gpdb_spark.queries  # noqa: F401
from gpdb_spark.plans import explain_motion, motion_summary
from gpdb_spark.registry import QUERIES


def test_agg_shows_redistribute(spark, sf_dir):
    df = QUERIES["q01_pricing_summary"](spark, sf_dir)
    df.collect()
    txt = explain_motion(df)
    assert "Redistribute Motion N:N (hash: l_returnflag,l_linestatus)" in txt
    assert txt.startswith("-- slices:")


def test_broadcast_join_shows_broadcast_motion(spark, sf_dir):
    df = QUERIES["q05_local_supplier_volume"](spark, sf_dir)
    df.collect()
    s = motion_summary(df)
    assert s["broadcast"] >= 1


def test_gather_on_coalesce(spark):
    df = spark.range(0, 1000).groupBy((F.col("id") % 7).alias("k")).count().coalesce(1).orderBy("k")
    df.collect()
    s = motion_summary(df)
    assert s["redistribute"] >= 1
