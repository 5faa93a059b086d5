"""Randomized parity tests for custom operators against reference
implementations (pandas/numpy ground truth) — the property-test layer the
reference gets from pg_regress golden files."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.mark.parametrize("seed", [7, 42, 1234])
def test_asof_join_matches_pandas_merge_asof(spark, seed):
    """asof_join (operators/asof.py) must reproduce pandas.merge_asof
    (direction='backward', allow_exact_matches=True) on random data with
    duplicate timestamps, unmatched keys, and empty groups."""
    from gpdb_spark.operators.asof import asof_join

    rng = np.random.default_rng(seed)
    n_l, n_r = 200, 150
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n_l),
            "ts": rng.integers(0, 1000, n_l).astype("datetime64[s]"),
            "lval": rng.normal(size=n_l).round(6),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 10, n_r),  # some keys absent on the left
            "ts": rng.integers(0, 1000, n_r).astype("datetime64[s]"),
            "rval": rng.normal(size=n_r).round(6),
        }
    )
    # merge_asof requires sort; ties broken by taking the LAST right row at
    # a given ts — make right ts unique per key to avoid tie ambiguity
    right = right.drop_duplicates(["k", "ts"])

    want = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort"),
        on="ts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    )
    want_set = {
        (int(r.k), r.ts.to_pydatetime(), float(r.lval),
         None if pd.isna(r.rval) else float(r.rval))
        for r in want.itertuples()
    }

    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="ts",
        by="k",
    )
    got_set = {
        (int(r.k), r.ts, float(r.lval),
         None if r.rval is None else float(r.rval))
        for r in got.collect()
    }
    assert got_set == want_set


def test_asof_join_null_value_from_latest_row(spark):
    """Row-wise semantics: when the LATEST matching right row has NULL in
    a value column, the output must carry that NULL — not a non-NULL value
    from an older right row (per-column fill would leak stale values)."""
    from gpdb_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100.0)], "k int, ts double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, 10.0, 5.0, "old"), (1, 50.0, None, "new")],
        "k int, ts double, rval double, tag string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    row = asof_join(left, right, on="ts", by="k").collect()[0]
    assert row.tag == "new"
    assert row.rval is None  # from the matched row, not the older one

    # tolerance must be judged against the matched row's own ts
    row2 = asof_join(
        left, right, on="ts", by="k", tolerance_seconds=60.0
    ).collect()[0]
    assert row2.tag == "new" and row2.rval is None


def test_add_sequence_dense(spark, sf_dir):
    """Sequence ids must be exactly start..start+N-1 (dense, unique),
    with only O(num_partitions) driver traffic."""
    from gpdb_spark.operators.sequence import add_sequence

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").repartition(8)
    n = o.count()
    got = add_sequence(o, "seq", start=100)
    ids = [r.seq for r in got.select("seq").collect()]
    assert sorted(ids) == list(range(100, 100 + n))
    assert got.columns == o.columns + ["seq"]


@pytest.mark.parametrize("seed", [3, 99])
def test_linear_interpolate_matches_numpy(spark, seed):
    """linear_interpolate (operators/interpolate.py — the reference's
    interpolate.c gap filling) must agree with numpy.interp on random
    series with missing runs at the edges and interior."""
    from datetime import datetime, timedelta
    from gpdb_spark.operators.interpolate import linear_interpolate

    rng = np.random.default_rng(seed)
    rows, expected = [], {}
    for part in range(4):
        n = 40
        ts = [datetime(2024, 1, 1) + timedelta(seconds=int(s))
              for s in np.sort(rng.choice(100000, size=n, replace=False))]
        vals = rng.normal(size=n).round(6)
        miss = rng.random(n) < 0.4
        known = ~miss
        xs = np.array([t.timestamp() for t in ts])
        if known.sum() >= 1:
            interp = np.interp(xs, xs[known], vals[known])
        for i in range(n):
            rows.append((part, ts[i], None if miss[i] else float(vals[i])))
            if known.sum() >= 1:
                # operator floor-truncates to 6 digits (registry.fr)
                expected[(part, ts[i])] = float(np.floor(interp[i] * 1e6) / 1e6)
            else:
                expected[(part, ts[i])] = None
    df = spark.createDataFrame(rows, "part int, ts timestamp, v double")
    got = linear_interpolate(
        df, "part", "ts", "v", missing=F.col("v").isNull()
    )
    for r in got.collect():
        want = expected[(r.part, r.ts)]
        assert (r.value_interp is None and want is None) or (
            abs(r.value_interp - want) < 1e-6
        ), (r.part, r.ts, r.value_interp, want)


def test_time_bucket_gapfill_semantics(spark):
    """Dense axis, LOCF fill, leading gaps NULL, zero mode."""
    from pyspark.sql import functions as F

    from gpdb_spark.operators.gapfill import time_bucket_gapfill

    rows = [
        # part a: values at minute 0 and 3 -> gaps at 1, 2 filled with 10.0
        ("a", "2024-01-01 00:00:30", 10.0),
        ("a", "2024-01-01 00:03:10", 40.0),
        # part b: first value at minute 2 -> minutes 0,1 stay NULL (leading)
        ("b", "2024-01-01 00:02:05", 7.0),
    ]
    df = spark.createDataFrame(rows, "part string, ts string, v double").select(
        "part", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = time_bucket_gapfill(
        df, "part", "ts", F.avg("v"), width_seconds=60, fill="locf"
    )
    got = {
        (r.part, r.bucket.strftime("%M")): (r.value, r.is_gap)
        for r in out.collect()
    }
    assert len(got) == 8  # 2 parts x 4 minutes (00..03)
    assert got[("a", "00")] == (10.0, False)
    assert got[("a", "01")] == (10.0, True)
    assert got[("a", "02")] == (10.0, True)
    assert got[("a", "03")] == (40.0, False)
    assert got[("b", "00")] == (None, True)  # leading gap stays NULL
    assert got[("b", "01")] == (None, True)
    assert got[("b", "02")] == (7.0, False)
    assert got[("b", "03")] == (7.0, True)

    zero = time_bucket_gapfill(
        df, "part", "ts", F.avg("v"), width_seconds=60, fill="zero"
    )
    z = {(r.part, r.bucket.strftime("%M")): r.value for r in zero.collect()}
    assert z[("b", "00")] == 0.0 and z[("a", "01")] == 0.0


def test_redact_pii_semantics(spark):
    from pyspark.sql import functions as F

    from gpdb_spark.datapipe.text import pii_hit_count, redact_pii

    df = spark.createDataFrame(
        [
            ("mail a.b+c@x-y.co.uk end", "<EMAIL>"),
            ("ip 192.168.0.1 here", "<IP>"),
            ("call +1 555-867-5309", "<PHONE>"),  # partial: 555-867-5309
            ("ssn 123-45-6789 x", "<ID>"),
            ("clean text stays", None),
        ],
        "s string, expect string",
    )
    got = df.select("s", "expect", redact_pii("s").alias("r")).collect()
    for row in got:
        if row.expect:
            assert row.expect in row.r, (row.s, row.r)
        else:
            assert row.r == row.s
    # audit counter counts pre-redaction hits
    n = df.agg(F.sum(pii_hit_count("s", "email")).alias("n")).first().n
    assert n == 1


def test_salted_join_rejects_right_full(spark):
    """Review regression: right/full would preserve each unmatched dim
    replica once per salt — refuse instead of silently duplicating."""
    import pytest as _pytest

    from gpdb_spark.operators.skew import salted_join

    f = spark.createDataFrame([(1, "a")], "k int, v string")
    d = spark.createDataFrame([(1, "x"), (2, "y")], "k int, w string")
    # supported hows still match the unsalted join
    got = salted_join(f, d, "k", how="left", salt=4).collect()
    assert len(got) == 1
    for how in ("right", "full", "outer"):
        with _pytest.raises(ValueError, match="salted_join"):
            salted_join(f, d, "k", how=how)


def test_interval_overlap_join_keeps_duplicate_rows(spark):
    """Review regression: two identical input intervals must each join
    (multiset semantics) — dedup only removes bin-induced duplicates."""
    from gpdb_spark.operators.range_join import interval_overlap_join

    left = spark.createDataFrame(
        [(0.0, 10.0), (0.0, 10.0)], "lo double, hi double"
    )  # identical rows, both overlap the right interval over many bins
    right = spark.createDataFrame([(5.0, 25.0)], "lo double, hi double")
    out = interval_overlap_join(left, right, "lo", "hi", "lo", "hi",
                                bin_width=2.0)
    assert out.count() == 2  # one per left row — not collapsed to 1


def test_add_sequence_stable_under_nondeterminism(spark):
    """Review regression: the counts pass and the projection pass must
    see the SAME rows (persist pins the plan) — a rand() filter upstream
    previously could desynchronize offsets from row numbers."""
    from pyspark.sql import functions as F

    from gpdb_spark.operators.sequence import add_sequence

    df = (
        spark.range(0, 2000, 1, 8)
        .where(F.rand(seed=None) < 0.5)  # nondeterministic per-evaluation
    )
    out = add_sequence(df, "seq").collect()
    seqs = sorted(r.seq for r in out)
    assert seqs == list(range(1, len(out) + 1))  # dense, unique, no NULLs


def test_time_bucket_floors_pre_epoch(spark):
    """Review regression: pre-1970 timestamps floor to the bucket START
    (Spark % follows the dividend sign; naive mod rounded toward zero)."""
    from pyspark.sql import functions as F

    from gpdb_spark.operators.gapfill import time_bucket

    df = spark.createDataFrame(
        [("1969-12-31 23:59:30",), ("1970-01-01 00:00:30",)], "t string"
    ).select(F.col("t").cast("timestamp").alias("ts"))
    got = [
        str(r.b)
        for r in df.select(time_bucket(F.col("ts"), 60).alias("b")).collect()
    ]
    assert got == ["1969-12-31 23:59:00", "1970-01-01 00:00:00"]


def test_scatter_function_sees_complete_slice_across_arrow_batches(spark, tmp_path):
    """Regression (round-5 timing-audit rewrite): mapInPandas hands a
    partition as ~10k-row Arrow batches, so a scatter group larger than
    one batch must still get group-COMPLETE stats — per-batch min/max
    silently produced plausible-but-wrong scaling for 873/15000 rows
    before the slice-concat fix."""
    import numpy as np
    import pandas as pd

    import gpdb_spark.queries  # noqa: F401
    from gpdb_spark.registry import QUERIES

    n = 25_000  # one customer spanning ~3 Arrow batches
    pd.DataFrame(
        {
            "o_custkey": np.int64(7),
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_totalprice": np.arange(n, dtype=np.float64) + 100.0,
        }
    ).to_parquet(tmp_path / "orders.parquet")

    got = (
        QUERIES["table_function_scatter"](spark, str(tmp_path))
        .toPandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    v = np.arange(n, dtype=np.float64) + 100.0
    want = np.floor((v - v.min()) / (v.max() - v.min()) * 1e6) / 1e6
    assert len(got) == n
    assert (got.scaled.to_numpy() == want).all()
