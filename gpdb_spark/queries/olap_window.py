"""Window-function surface (SURVEY.md §2.5 — nodeWindowAgg.c, windowfuncs.c).

All ranking/analytic functions, ROWS and RANGE frames (the reference
supports value-RANGE frames ahead of upstream PG 9.4 —
parsenodes.h:495-517), aggregates-as-window-functions, and multiple
windows in one query.

Determinism: every ORDER BY inside a window includes a unique tiebreak
column so row_number/ntile/lag are reproducible across engines; windowed
sums go through the DECIMAL(25,6) cast (Spark computes running frames,
DuckDB uses segment trees — different float summation orders otherwise).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gpdb_spark.registry import fr, owsum, query, t, wdec, wround

ORD = "ORDER BY o_orderdate, o_orderkey"


@query(
    "window_rank_family",
    oracle="""
    SELECT o_custkey, o_orderkey,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           row_number() OVER w AS rn,
           (floor(percent_rank() OVER w * 1e6) / 1e6) AS prnk,
           (floor(cume_dist() OVER w * 1e6) / 1e6) AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_rank_family(spark, sf_dir):
    """rank/dense_rank/row_number/percent_rank/cume_dist
    (windowfuncs.c:98-211)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
        fr(F.percent_rank().over(w), 6).alias("prnk"),
        fr(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "window_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) x WHERE rn <= 3
    """,
)
def window_topk_per_group(spark, sf_dir):
    """Top-k per group — the distributed idiom replacing correlated
    LIMIT subqueries; shuffles once on the partition key."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "window_running_sum",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           {owsum('o_totalprice', f'(PARTITION BY o_custkey {ORD} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)')} AS running_total,
           count(*) OVER (PARTITION BY o_custkey {ORD}
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
    FROM orders
    """,
)
def window_running_sum(spark, sf_dir):
    """Aggregate-as-window-function with a running ROWS frame
    (nodeWindowAgg.c agg path)."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        wround(F.sum(wdec("o_totalprice")).over(w)).alias("running_total"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


@query(
    "window_sliding_avg",
    # the measure is floor-truncated to cents BEFORE the decimal cast:
    # fr(x,2) is IEEE-identical cross-engine and its result's shortest
    # repr has <= 2 decimals, so the DECIMAL(25,6) cast is tie-free —
    # raw (non-pre-rounded) money cannot diverge (seed-626364 fuzz:
    # casting the raw double directly hit a repr-vs-binary rounding
    # tie whose 1e-6 sum difference the floor-at-6 average exposed)
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           (floor(CAST(sum(CAST((floor(o_totalprice * 1e2) / 1e2)
                               AS DECIMAL(25,6)))
                      OVER (PARTITION BY o_custkey {ORD}
                            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / count(*) OVER (PARTITION BY o_custkey {ORD}
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                 * 1e6) / 1e6) AS sliding_avg
    FROM orders
    """,
)
def window_sliding_avg(spark, sf_dir):
    """Sliding ROWS frame (moving average)."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        fr(
            F.sum(wdec(fr("o_totalprice", 2))).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            6,
        ).alias("sliding_avg"),
    )


@query(
    "window_lag_lead",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice, 2) OVER w AS next2_price,
           lag(o_orderdate) OVER w AS prev_date,
           lead(o_orderpriority, 1, 'NONE') OVER w AS next_prio
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey {ORD})
    """,
)
def window_lag_lead(spark, sf_dir):
    """lag/lead with offsets and defaults (windowfuncs.c:338,373)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice", 2).over(w).alias("next2_price"),
        F.lag("o_orderdate").over(w).alias("prev_date"),
        F.lead("o_orderpriority", 1, "NONE").over(w).alias("next_prio"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           count(*) OVER (ORDER BY o_totalprice
                          RANGE BETWEEN 500 PRECEDING AND CURRENT ROW) AS n_within_500,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6)))
                      OVER (ORDER BY o_totalprice
                            RANGE BETWEEN 500 PRECEDING AND CURRENT ROW), 2)
                AS DOUBLE) AS sum_within_500
    FROM orders WHERE o_custkey < 50
    """,
)
def window_range_frame(spark, sf_dir):
    """Value-RANGE frame (FRAMEOPTION value PRECEDING,
    parsenodes.h:495-517 — GPDB supports this ahead of PG 9.4)."""
    o = t(spark, sf_dir, "orders").where(F.col("o_custkey") < 50)
    w = Window.orderBy("o_totalprice").rangeBetween(-500, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_within_500"),
        wround(F.sum(wdec("o_totalprice")).over(w)).alias("sum_within_500"),
    )


@query(
    "window_first_last_nth",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_ok,
           last_value(o_orderkey) OVER w AS last_ok,
           nth_value(o_orderkey, 2) OVER w AS second_ok
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey {ORD}
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last_nth(spark, sf_dir):
    """first/last/nth_value with full-partition frame
    (windowfuncs.c:407-449)."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.last("o_orderkey").over(w).alias("last_ok"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_ok"),
    )


@query(
    "window_ntile",
    oracle="""
    SELECT o_orderkey,
           ntile(4) OVER (PARTITION BY o_orderstatus
                          ORDER BY o_totalprice, o_orderkey) AS quartile
    FROM orders
    """,
)
def window_ntile(spark, sf_dir):
    """ntile (windowfuncs.c:169) — total ordering so bucket assignment is
    reproducible."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select("o_orderkey", F.ntile(4).over(w).alias("quartile"))


@query(
    "window_multi_windows",
    oracle=f"""
    SELECT o_orderkey,
           rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
             AS rank_in_cust,
           rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
             AS rank_in_status,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6)))
                 OVER (PARTITION BY o_custkey), 2) AS DOUBLE) AS cust_total
    FROM orders
    """,
)
def window_multi_windows(spark, sf_dir):
    """Multiple distinct windows in one projection (the reference plans
    one WindowAgg per window clause; Spark chains Window operators)."""
    o = t(spark, sf_dir, "orders")
    w1 = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w2 = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w3 = Window.partitionBy("o_custkey")
    return o.select(
        "o_orderkey",
        F.rank().over(w1).alias("rank_in_cust"),
        F.rank().over(w2).alias("rank_in_status"),
        wround(F.sum(wdec("o_totalprice")).over(w3)).alias("cust_total"),
    )


@query(
    "window_frame_exclude_groups",
    # EXCLUDE CURRENT ROW (native in DuckDB) and GROUPS mode (DuckDB
    # lacks GROUPS: both engines use the dense_rank + integer-RANGE
    # equivalence, which IS the definition of a GROUPS frame)
    oracle="""
    WITH g AS (
        SELECT user_id, event_id, ts, value,
               dense_rank() OVER (
                   PARTITION BY user_id
                   ORDER BY date_trunc('minute', ts)) AS grp
        FROM events WHERE user_id < 40
    )
    SELECT user_id, event_id,
           CAST(round(sum(CAST(value AS DECIMAL(25,6))) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
                    EXCLUDE CURRENT ROW), 6) AS DOUBLE) AS excl_sum,
           CAST(round(sum(CAST(value AS DECIMAL(25,6))) OVER (
                    PARTITION BY user_id ORDER BY grp
                    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING), 6)
                AS DOUBLE) AS groups_sum
    FROM g
    """,
)
def window_frame_exclude_groups(spark, sf_dir):
    """PG 11 frame refinements (nodeWindowAgg.c): EXCLUDE CURRENT ROW —
    emulated as frame_sum - current (NULL when the exclusion empties the
    frame, matching PG/DuckDB) — and GROUPS mode — peers collapse to one
    step, exactly a RANGE(-1,1) frame over dense_rank. Both stay single
    window passes per spec."""
    e = t(spark, sf_dir, "events").where(F.col("user_id") < 40)
    w_rows = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 2)
    )
    frame_sum = F.sum(wdec("value")).over(w_rows)
    frame_cnt = F.count(F.lit(1)).over(w_rows)
    excl = F.when(
        frame_cnt > 1,
        F.round(frame_sum - F.col("value").cast("decimal(25,6)"), 6),
    ).cast("double")
    grp = F.dense_rank().over(
        Window.partitionBy("user_id").orderBy(
            F.date_trunc("minute", F.col("ts"))
        )
    )
    base = e.select("user_id", "event_id", "ts", "value", grp.alias("grp"))
    w_groups = (
        Window.partitionBy("user_id").orderBy("grp").rangeBetween(-1, 1)
    )
    return base.select(
        "user_id",
        "event_id",
        excl.alias("excl_sum"),
        wround(F.sum(wdec("value")).over(w_groups), 6).alias("groups_sum"),
    )


@query(
    "window_filter_clause",
    # ok_running follows the owsum discipline EXACTLY like the Spark
    # side (round the exact DECIMAL sum to 2, then cast to double) — the
    # former round(CAST(... AS DOUBLE), 6) was asymmetric in both the
    # rounding base (double vs decimal) and the digit count (6 vs
    # wround's 2), masked by pre-rounded fixture money and caught by the
    # round-6 full-precision-money fuzz sweep
    oracle="""
    SELECT event_id, user_id,
           CAST(round(sum(CAST(value AS DECIMAL(25,6)))
                      FILTER (WHERE event_type <> 'error')
                      OVER w, 2) AS DOUBLE) AS ok_running,
           count(*) FILTER (WHERE event_type = 'click') OVER w AS clicks_so_far,
           max(value) FILTER (WHERE event_type = 'view') OVER w AS max_view
    FROM events
    WHERE user_id < 60
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_filter_clause(spark, sf_dir):
    """Aggregate FILTER clause on window functions (PG 9.4 parse_agg.c
    transformAggregateCall + nodeWindowAgg.c agg path). Spark has no
    window FILTER syntax, so the filter folds into the aggregated
    expression — sum/max over CASE, count over a 0/1 indicator — the
    rewrite PG itself uses internally; the plan stays one Window node,
    no extra shuffle. Decimal-cast sum per the registry's determinism
    discipline."""
    e = t(spark, sf_dir, "events").where(F.col("user_id") < 60)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ok = F.when(F.col("event_type") != "error", wdec("value"))
    return e.select(
        "event_id",
        "user_id",
        wround(F.sum(ok).over(w)).alias("ok_running"),
        F.count(F.when(F.col("event_type") == "click", F.lit(1))).over(w).alias(
            "clicks_so_far"
        ),
        F.max(F.when(F.col("event_type") == "view", F.col("value"))).over(w).alias(
            "max_view"
        ),
    )
