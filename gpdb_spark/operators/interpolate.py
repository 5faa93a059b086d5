"""linear_interpolate — time-series gap filling.

Reference: src/backend/utils/adt/interpolate.c:253-546 (9 type variants;
abscissa ratio helper linterp_abscissa :35): given an ordered series with
missing values, fill each gap by linear interpolation between the nearest
non-missing neighbors:

    y = y0 + (y1 - y0) * (x - x0) / (x1 - x0)

Spark-first construction (no UDF): two window passes per partition —
``last(non-missing, ignorenulls)`` looking back and ``first(non-missing,
ignorenulls)`` looking forward — carrying (abscissa, value) structs, then
pure column arithmetic. Edge rows with only one neighbor take that
neighbor's value (same boundary rule as the reference).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def linear_interpolate(
    df: DataFrame,
    part_col: str,
    ts_col: str,
    value_col: str,
    missing: Column,
    out_col: str = "value_interp",
    order_tiebreak: str | None = None,
    round_digits: int | None = 6,
) -> DataFrame:
    """Fill ``value_col`` where ``missing`` is true by linear interpolation
    over epoch-microsecond abscissa within ``part_col`` partitions."""
    order: list[Column] = [F.col(ts_col)]
    if order_tiebreak:
        order.append(F.col(order_tiebreak))
    base = Window.partitionBy(part_col).orderBy(*order)
    w_back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    us = F.unix_micros(F.col(ts_col)).cast("double")
    point = F.when(
        ~missing, F.struct(us.alias("x"), F.col(value_col).cast("double").alias("y"))
    )
    prev = F.last(point, ignorenulls=True).over(w_back)
    nxt = F.first(point, ignorenulls=True).over(w_fwd)

    x, x0, y0 = us, prev["x"], prev["y"]
    x1, y1 = nxt["x"], nxt["y"]
    interp = (
        F.when(prev.isNull() & nxt.isNull(), F.lit(None).cast("double"))
        .when(prev.isNull(), y1)
        .when(nxt.isNull(), y0)
        .when(x1 == x0, y0)
        .otherwise(y0 + (y1 - y0) * (x - x0) / (x1 - x0))
    )
    if round_digits is not None:
        from gpdb_spark.registry import fr

        # floor-truncate, not round: engine-portable on finite doubles
        interp = fr(interp, round_digits)
    return df.withColumn(out_col, interp)
