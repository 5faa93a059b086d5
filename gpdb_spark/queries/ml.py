"""In-database ML primitives — closed-form multiple linear regression
from exact moment sums (generalizing the pg_aggregate.h regr_* family,
src/include/catalog/pg_aggregate.h, beyond one regressor).

The 100 TB shape: ONE aggregation pass collects the O(p^2) moment sums
(p = #features, here 2) as exact decimals — order-independent, partial-
aggregatable, no iteration, no driver data transfer beyond the final
group rows. The normal equations are then solved inline (Cramer's rule
for p=2) in plain double arithmetic that both engines evaluate with the
identical IEEE ops, so the coefficients are oracle-checkable bit-for-bit
after floor-truncation (registry.fr discipline).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gpdb_spark.registry import DEC, fr, query, t

# moment-sum SQL (shared text so both engines aggregate the same way);
# every product of fixture measures has <= 6 decimal digits, so the
# DECIMAL(25,6) casts are exact and the sums order-independent.
_MOMENTS = """
    SELECT l_returnflag,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS s1,
           CAST(sum(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) AS s2,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sy,
           CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS s11,
           CAST(sum(CAST(l_discount * l_discount AS DECIMAL(25,6))) AS DOUBLE) AS s22,
           CAST(sum(CAST(l_quantity * l_discount AS DECIMAL(25,6))) AS DOUBLE) AS s12,
           CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS s1y,
           CAST(sum(CAST(l_discount * l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS s2y,
           CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS syy
    FROM lineitem GROUP BY l_returnflag
"""


@query(
    "linregr_multi",
    oracle=f"""
    WITH m AS ({_MOMENTS}),
    c AS (
        SELECT l_returnflag, n,
               s11 - s1 * s1 / n AS c11,
               s22 - s2 * s2 / n AS c22,
               s12 - s1 * s2 / n AS c12,
               s1y - s1 * sy / n AS c1y,
               s2y - s2 * sy / n AS c2y,
               syy - sy * sy / n AS cyy,
               s1 / n AS m1, s2 / n AS m2, sy / n AS my
        FROM m
    )
    SELECT l_returnflag, n,
           (floor((c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) * 1e6) / 1e6)
             AS b_qty,
           (floor((c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) * 1e6) / 1e6)
             AS b_disc,
           (floor((my - (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) * m1
                      - (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) * m2)
                  * 1e6) / 1e6) AS b0,
           (floor(((c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) * c1y
                 + (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) * c2y)
                  / cyy * 1e6) / 1e6) AS r2
    FROM c
    """,
)
def linregr_multi(spark, sf_dir):
    """OLS of l_extendedprice on (l_quantity, l_discount) per returnflag:
    one exact-decimal moment pass, Cramer's-rule solve, R^2 from the
    explained-sum identity b'X'y / Syy. Single 2-stage aggregation —
    the MADlib-style linregr shape without any iteration."""
    l = t(spark, sf_dir, "lineitem")
    x1, x2, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")

    def dsum_d(c):
        return F.sum(c.cast(DEC)).cast("double")

    m = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum_d(x1).alias("s1"),
        dsum_d(x2).alias("s2"),
        dsum_d(y).alias("sy"),
        dsum_d(x1 * x1).alias("s11"),
        dsum_d(x2 * x2).alias("s22"),
        dsum_d(x1 * x2).alias("s12"),
        dsum_d(x1 * y).alias("s1y"),
        dsum_d(x2 * y).alias("s2y"),
        dsum_d(y * y).alias("syy"),
    )
    n = F.col("n")
    c11 = F.col("s11") - F.col("s1") * F.col("s1") / n
    c22 = F.col("s22") - F.col("s2") * F.col("s2") / n
    c12 = F.col("s12") - F.col("s1") * F.col("s2") / n
    c1y = F.col("s1y") - F.col("s1") * F.col("sy") / n
    c2y = F.col("s2y") - F.col("s2") * F.col("sy") / n
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    m1, m2, my = F.col("s1") / n, F.col("s2") / n, F.col("sy") / n
    det = c11 * c22 - c12 * c12
    b1 = (c22 * c1y - c12 * c2y) / det
    b2 = (c11 * c2y - c12 * c1y) / det
    return m.select(
        "l_returnflag",
        "n",
        fr(b1, 6).alias("b_qty"),
        fr(b2, 6).alias("b_disc"),
        fr(my - b1 * m1 - b2 * m2, 6).alias("b0"),
        fr((b1 * c1y + b2 * c2y) / cyy, 6).alias("r2"),
    )
