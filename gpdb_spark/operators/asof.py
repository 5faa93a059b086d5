"""As-of join: for each left row, the latest right row at-or-before its
timestamp (per key) — the time-series join the reference lacks as an
operator (its gap-filling is scalar `linear_interpolate`,
src/backend/utils/adt/interpolate.c; SURVEY.md §2.3 notes the absence).

Spark-first formulation: UNION the two sides tagged by origin, sort
within (key, ts) once, and carry the most recent right-side payload
forward with `last(ignorenulls=True)` over an unbounded-preceding window.
One shuffle on the key — same cost envelope as a sort-merge join — versus
the naive range-join which explodes to O(left x right) per key. Tolerance
is applied post-propagation. This is the standard scalable as-of shape
(pandas merge_asof semantics, distributed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    value_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For every left row: the most recent right row with
    right.on <= left.on, matching on ``by``. Right's ``value_cols`` (default:
    all non-key, non-ts columns) are appended (suffixed on collision);
    unmatched/over-tolerance rows keep NULLs (LEFT OUTER semantics)."""
    by = [by] if isinstance(by, str) else list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in set(by) | {on}]

    l_tag = left.withColumn("__side", F.lit(1))
    r_cols = [F.col(c).alias(f"__r_{c}") for c in value_cols]
    r_tag = right.select(
        *by, F.col(on).alias(on), F.lit(0).alias("__side"), *r_cols
    )
    # align schemas for the union
    for c in left.columns:
        if c not in set(by) | {on}:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in value_cols:
        l_tag = l_tag.withColumn(
            f"__r_{c}", F.lit(None).cast(dict(right.dtypes)[c])
        )

    u = l_tag.unionByName(r_tag)
    # right rows sort before left rows at the same ts (side 0 < 1), so a
    # right row AT the left timestamp is visible to it (<= semantics)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry ONE struct per right row (ts + all values) so every output
    # column comes from the SAME matched row — per-column last() would
    # silently take a NULL value column from an older right row, diverging
    # from merge_asof's row-wise semantics.
    r_struct = F.when(
        F.col("__side") == 0,
        F.struct(
            F.col(on).alias("__ts"),
            *[F.col(f"__r_{c}").alias(c) for c in value_cols],
        ),
    )
    filled = u.select(
        "*",
        F.last(r_struct, ignorenulls=True).over(w).alias("__r"),
    ).where(F.col("__side") == 1)

    r_ts = F.col("__r.__ts")
    in_tol = (
        F.lit(True)
        if tolerance_seconds is None
        else (
            F.col(on).cast("double") - r_ts.cast("double")
            <= F.lit(float(tolerance_seconds))
        )
    )
    keep = F.col("__r").isNotNull() & in_tol
    out_cols = [c for c in left.columns]
    proj = [F.col(c) for c in out_cols]
    for c in value_cols:
        name = c + (suffix if c in out_cols else "")
        proj.append(F.when(keep, F.col(f"__r.{c}")).alias(name))
    proj.append(F.when(keep, r_ts).alias(on + suffix))
    return filled.select(*proj)
