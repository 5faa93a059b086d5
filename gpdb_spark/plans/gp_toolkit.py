"""gp_toolkit administrative views: distribution-skew diagnostics.

Reference: gp_toolkit.gp_skew_coefficients /
gp_skew_idle_fractions (gpMgmt + gp_toolkit.sql) report how evenly a
table's rows spread across segments under its distribution key — the
first thing a GPDB admin checks when a query is slow, because one hot
segment serializes every scan and join on that table.

Spark-first mapping: "segment" = hash bucket of the distribution key.
For *diagnostics* the exact hash function doesn't matter, only that it
matches how keys co-locate; we use a deterministic md5-derived bucket
(same discipline as datapipe/sample.py) so the report is reproducible
across engines and runs — and testable against a SQL oracle. The
metrics mirror gp_toolkit:

- ``skcoeff``  — coefficient of variation of per-segment row counts
  (gp_skew_coefficients.skccoeff), percent.
- ``siffraction`` — fraction of system idle while the fullest segment
  finishes: 1 - avg/max (gp_skew_idle_fractions.siffraction).

Everything is two stacked aggregations over one scan — the per-key
count never materializes (segment assignment is a row expression), so
the report itself cannot skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gpdb_spark.registry import fr


def segment_of(key: Column, n_segments: int) -> Column:
    """Deterministic segment id in [0, n_segments): first 8 md5 hex
    digits of the key, mod segments — engine-portable (DuckDB: the
    same md5/substr/conv arithmetic)."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
    return (h.cast("long") % n_segments).cast("int")


def skew_report(
    df: DataFrame, dist_cols: list[str] | tuple[str, ...], n_segments: int = 32
) -> DataFrame:
    """One-row skew summary for a hypothetical DISTRIBUTED BY
    (dist_cols) layout: total rows, per-segment min/max/avg, skew
    coefficient (percent CV) and idle fraction."""
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in dist_cols])
    per_seg = df.groupBy(
        segment_of(key, n_segments).alias("segment")
    ).agg(F.count(F.lit(1)).alias("n"))
    # variance from exact integer sums (sum, sum of squares): the float
    # math runs on two exact scalars, so the result is identical under
    # any partial-aggregation order — hash-compare safe across engines
    sums = per_seg.agg(
        F.sum("n").alias("total_rows"),
        F.count(F.lit(1)).alias("segments_used"),
        F.min("n").alias("min_rows"),
        F.max("n").alias("max_rows"),
        F.sum(F.col("n") * F.col("n")).alias("ss"),
    )
    mean = F.col("total_rows") / F.col("segments_used")
    var = F.col("ss") / F.col("segments_used") - mean * mean
    return sums.select(
        "total_rows",
        "segments_used",
        "min_rows",
        "max_rows",
        fr(100.0 * F.sqrt(var) / mean, 4).alias("skcoeff"),
        fr(1.0 - mean / F.col("max_rows"), 4).alias("siffraction"),
    )
