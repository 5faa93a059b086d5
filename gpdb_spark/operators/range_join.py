"""Binned range join: scalable point-in-interval and interval-overlap joins.

The reference runs pure range predicates as NestLoop (nodeNestloop.c:366)
or MergeJoin theta ranges (nodeMergejoin.c) — per-segment O(n*m) or a full
sort. Open-source Spark likewise plans a join whose only condition is a
range as BroadcastNestedLoopJoin, which is quadratic work and caps the
build side at broadcast size. That dies at 100 TB.

The standard distributed fix (the technique behind proprietary range-join
optimizers): quantize the range dimension into fixed-width bins.
- intervals explode to one row per bin they touch: ceil(len/w) rows each;
- points map to exactly one bin;
- equi-join on the bin id (plus any leading equi keys) -> shuffled hash
  join, AQE-skew-splittable like any other key join;
- the exact predicate re-filters the candidates.

Each matching (point, interval) pair meets in exactly one bin (the
point's), so no post-join dedup is needed for point-in-interval. Interval
overlap joins dedup on the pair after the residual filter (cheap: only
true matches survive). Bin width trades shuffle fan-out (small w = more
replicas per interval) against candidate selectivity (large w = more
false candidates); pick w near the median interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bin(c: Column, width: float) -> Column:
    return F.floor(c.cast("double") / F.lit(float(width))).cast("long")


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    equi_keys: list[str] | None = None,
    closed: str = "left",  # 'left' = [lo, hi), 'both' = [lo, hi]
) -> DataFrame:
    """Join each point row to every interval row with lo <= point < hi
    (or <= hi when closed='both'), optionally also matching equi_keys.
    One shuffle keyed by (equi_keys..., bin); no nested loop."""
    equi_keys = equi_keys or []
    p = points.withColumn("__bin", _bin(F.col(point_col), bin_width))
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                _bin(F.col(lo_col), bin_width), _bin(F.col(hi_col), bin_width)
            )
        ),
    )
    upper = (
        F.col(point_col) <= F.col(hi_col)
        if closed == "both"
        else F.col(point_col) < F.col(hi_col)
    )
    return (
        p.join(iv, equi_keys + ["__bin"])
        .where((F.col(point_col) >= F.col(lo_col)) & upper)
        .drop("__bin")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    lo1: str,
    hi1: str,
    lo2: str,
    hi2: str,
    bin_width: float,
    suffix: str = "_r",
) -> DataFrame:
    """Pairs of intervals that overlap (half-open: lo1 < hi2 AND lo2 < hi1).
    Both sides explode to their touched bins; an interval pair sharing
    several bins yields one candidate per shared bin, so bin-induced
    duplicates are removed on synthetic per-row ids (assigned BEFORE the
    explode) — deduplicating on all output columns would also collapse
    genuinely duplicate input rows and lose multiset join semantics."""
    for c in right.columns:
        if c in left.columns:
            right = right.withColumnRenamed(c, c + suffix)
    lo2, hi2 = (c + suffix if c in left.columns else c for c in (lo2, hi2))
    l = left.withColumn("__lid", F.monotonically_increasing_id()).withColumn(
        "__bin",
        F.explode(
            F.sequence(_bin(F.col(lo1), bin_width), _bin(F.col(hi1), bin_width))
        ),
    )
    r = right.withColumn("__rid", F.monotonically_increasing_id()).withColumn(
        "__bin",
        F.explode(
            F.sequence(_bin(F.col(lo2), bin_width), _bin(F.col(hi2), bin_width))
        ),
    )
    out_cols = [c for c in l.columns if c not in ("__bin", "__lid")] + [
        c for c in r.columns if c not in ("__bin", "__rid")
    ]
    return (
        l.join(r, "__bin")
        .where((F.col(lo1) < F.col(hi2)) & (F.col(lo2) < F.col(hi1)))
        .dropDuplicates(["__lid", "__rid"])
        .select(*out_cols)
    )
