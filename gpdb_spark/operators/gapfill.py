"""time_bucket + gap filling (LOCF / interpolation) for time series.

Reference adjacency: the reference ships linear_interpolate
(src/backend/utils/adt/interpolate.c) and window framing for time
series; the bucket+gapfill composite is the TimescaleDB-style operation
its users build from generate_series + LEFT JOIN + window fill
(src/test/regress windowing patterns). This operator provides it as one
composable step.

Spark-first construction, all declarative:

1. bucket:   groupBy(part, date-truncated bucket) . agg(measure)
2. densify:  the (min,max) bucket bounds are a 1-row aggregate,
             cross-joined (broadcast, 1 row) with the distinct part
             keys, then ``sequence()`` + ``explode`` emits the dense
             bucket axis — no driver collect, no Python.
3. fill:     LEFT JOIN actuals onto the dense axis, then LOCF via
             ``last(value, ignorenulls=True)`` over (part ORDER BY
             bucket) — one extra shuffle at most; with the join already
             hash-partitioned on part the window reuses the exchange.

Scale shape: output rows = |parts| x |buckets|, i.e. linear in the
time span, independent of input row count; the only wide exchange is
the bucket aggregation itself. Skewed parts are irrelevant here because
the dense axis is uniform by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def time_bucket(ts: Column, width_seconds: int) -> Column:
    """Fixed-width bucket start (epoch-aligned), any width — the
    time_bucket analog of date_trunc for arbitrary intervals. Uses
    floor-mod (``pmod``): Spark's ``%`` follows the dividend's sign, so
    the naive ``secs - secs % w`` would round pre-1970 timestamps toward
    zero (bucket END) instead of flooring to the bucket start."""
    secs = F.unix_timestamp(ts)
    return F.timestamp_seconds(secs - F.pmod(secs, F.lit(width_seconds)))


def time_bucket_gapfill(
    df: DataFrame,
    part_col: str,
    ts_col: str,
    measure: Column,
    width_seconds: int,
    fill: str = "locf",
    bucket_col: str = "bucket",
    value_col: str = "value",
) -> DataFrame:
    """Aggregate ``measure`` into fixed buckets per ``part_col`` and emit
    a row for EVERY bucket in [min, max] of the whole frame, filling
    empty buckets per ``fill``:

    - ``"locf"``: last observation carried forward (leading gaps stay
      NULL, like timescale's locf());
    - ``"null"``: leave gaps NULL (plain gapfill);
    - ``"zero"``: fill 0.0.

    Adds ``is_gap`` marking synthesized buckets.
    """
    b = time_bucket(F.col(ts_col), width_seconds)
    # the ONE heavy pass over the input: scan + bucket aggregation.
    # Persisted so bounds and the part-key list derive from the (small:
    # |parts| x |buckets| rows) aggregate instead of re-scanning the
    # input — at scale this is 1 wide scan instead of 3.
    actual = (
        df.groupBy(F.col(part_col), b.alias(bucket_col))
        .agg(measure.alias(value_col))
        .persist()
    )

    bounds = actual.agg(
        F.min(bucket_col).alias("lo"), F.max(bucket_col).alias("hi")
    )
    parts = actual.select(part_col).distinct()
    axis = (
        parts.crossJoin(F.broadcast(bounds))
        .select(
            part_col,
            F.explode(
                F.sequence(
                    F.col("lo"),
                    F.col("hi"),
                    F.expr(f"INTERVAL {width_seconds} SECOND"),
                )
            ).alias(bucket_col),
        )
    )
    dense = axis.join(actual, [part_col, bucket_col], "left").withColumn(
        "is_gap", F.col(value_col).isNull()
    )
    if fill == "locf":
        w = (
            Window.partitionBy(part_col)
            .orderBy(bucket_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        dense = dense.withColumn(
            value_col, F.last(value_col, ignorenulls=True).over(w)
        )
    elif fill == "zero":
        dense = dense.withColumn(value_col, F.coalesce(F.col(value_col), F.lit(0.0)))
    elif fill != "null":
        raise ValueError(f"unknown fill mode {fill!r}")
    return dense
