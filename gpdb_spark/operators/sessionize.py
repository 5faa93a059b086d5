"""Gap-based sessionization (batch form).

The reference has no streaming operators (SURVEY.md §2.11); its users do
sessionization with window functions over ordered event tables
(lag -> gap flag -> running sum). This module packages that idiom; the
streaming twin (session_window + watermark) lives in
gpdb_spark.streaming.events_stream.

Scale: one shuffle on the session key; both window passes share the same
partitioning so Spark plans a single Exchange + two Window operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str | None = None,
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign a per-user ``session_id`` (1-based) using a max-gap rule.

    Gap comparison is done on epoch microseconds so semantics are exact
    and engine-reproducible (interval comparison on truncated seconds
    would mis-bucket gaps within 1s of the threshold).
    """
    order: list[Column] = [F.col(ts_col)]
    if order_tiebreak:
        order.append(F.col(order_tiebreak))
    w = Window.partitionBy(user_col).orderBy(*order)
    us = F.unix_micros(F.col(ts_col))
    gap_us = gap_minutes * 60 * 1_000_000
    prev_us = F.lag(us).over(w)
    is_new = F.when(
        prev_us.isNull() | ((us - prev_us) > gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_id", F.sum(is_new).over(wrun))
