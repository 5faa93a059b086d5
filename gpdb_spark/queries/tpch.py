"""TPC-H-derived queries adapted to the fixture star schema.

The reference plans these through its MPP pipeline (multi-stage agg
cdbgroup.c:347, motion planning cdbpath.c, hash/merge/NL joins §2.3);
here every query is a declarative DataFrame plan so Catalyst produces the
equivalent distributed plan (partial/final HashAggregate, broadcast or
shuffled joins, TakeOrderedAndProject for top-k).

Scale notes (100 TB): dimension tables (region/nation/supplier/part) are
broadcast — no shuffle of the fact table for those joins; fact-fact joins
(orders x lineitem) shuffle on the join key, which is the table's natural
distribution key (FIXTURES.md), so a bucketed layout co-locates them;
aggregations are partial-aggregated map-side before the exchange.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from gpdb_spark.registry import _usum, davg, dsum, fr, oavg, osum, query, t

def _rev():
    # revenue measure; built lazily because Column construction needs a live session
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


O_REV = "l_extendedprice * (1 - l_discount)"


@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {osum('l_quantity')} AS sum_qty,
           {osum('l_extendedprice')} AS sum_base_price,
           {osum(O_REV)} AS sum_disc_price,
           {osum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {oavg('l_quantity')} AS avg_qty,
           {oavg('l_extendedprice')} AS avg_price,
           {oavg('l_discount')} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark, sf_dir):
    """TPC-H Q1: scan->filter->2-stage hash agg (execHHashagg.c:904 ≈
    partial+final HashAggregate)."""
    l = t(spark, sf_dir, "lineitem")
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(_rev()).alias("sum_disc_price"),
            dsum(_rev() * (1 + F.col("l_tax"))).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q03_shipping_priority",
    oracle=f"""
    SELECT o.o_orderkey, {osum(O_REV)} AS revenue, o.o_orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q03_shipping_priority(spark, sf_dir):
    """TPC-H Q3: selective dim filter + fact-fact join + top-k
    (TakeOrderedAndProject ≈ bounded tuplesort, nodeLimit.c:233)."""
    c = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(dsum(_rev()).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


@query(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    GROUP BY o_orderpriority
    """,
)
def q04_order_priority(spark, sf_dir):
    """TPC-H Q4: EXISTS -> left-semi hash join (CPhysicalLeftSemiHashJoin,
    nodes.h JOIN_SEMI)."""
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q05_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name, {osum(O_REV)} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def q05_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5: 6-way join; dims broadcast (MOTIONTYPE_FIXED broadcast ≈
    BroadcastExchange), facts shuffle once on orderkey."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(_rev()).alias("revenue"))
    )


@query(
    "q06_forecast_revenue",
    oracle=f"""
    SELECT {osum('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q06_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: pure scan+filter+scalar agg; all predicates push to the
    parquet scan (PushedFilters)."""
    l = t(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@query(
    "q07_volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(extract(year FROM l.l_shipdate) AS INT) AS l_year,
           {osum(O_REV)} AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE sn.n_name IN ('NATION_1','NATION_2') AND cn.n_name IN ('NATION_1','NATION_2')
      AND sn.n_name <> cn.n_name
    GROUP BY sn.n_name, cn.n_name, CAST(extract(year FROM l.l_shipdate) AS INT)
    """,
)
def q07_volume_shipping(spark, sf_dir):
    """TPC-H Q7: two aliased joins against the same dim (nation) + year
    extraction; tests self-referenced dims and multi-key grouping."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ).where(F.col("n_name").isin("NATION_1", "NATION_2"))
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ).where(F.col("n_name").isin("NATION_1", "NATION_2"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .join(broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(_rev()).alias("revenue"))
    )


@query(
    "q09_product_type_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(extract(year FROM o.o_orderdate) AS INT) AS o_year,
           {osum('l_extendedprice * (1 - l_discount) - 0.5 * p_retailprice * l_quantity')} AS profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, CAST(extract(year FROM o.o_orderdate) AS INT)
    """,
)
def q09_product_type_profit(spark, sf_dir):
    """TPC-H Q9 (adapted: no partsupp fixture — supplycost := 0.5*retailprice).
    LIKE-filtered dim broadcast into the fact."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    profit = _rev() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .join(broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            profit.alias("p"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("p")).alias("profit"))
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, {osum(O_REV)} AS revenue,
           c.c_acctbal, n.n_name, c.c_mktsegment
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name, c.c_mktsegment
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10: returned-item revenue per customer, top 20."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(dsum(_rev()).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "c_mktsegment")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q12_priority_shipping",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN l_quantity < 25 THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY o_orderpriority
    """,
)
def q12_priority_shipping(spark, sf_dir):
    """TPC-H Q12 (adapted): conditional aggregation (CASE inside sum)."""
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("l_quantity") >= 25, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(F.col("l_quantity") < 25, 1).otherwise(0))
            .cast("long")
            .alias("low_line_count"),
        )
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13: left outer join + count(col) null semantics + re-agg."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count(F.col("o_orderkey")).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@query(
    "q14_promo_effect",
    oracle=f"""
    SELECT (floor(
             100.00 * CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(({O_REV}) AS DECIMAL(25,6)) ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
             / CAST(sum(CAST(({O_REV}) AS DECIMAL(25,6))) AS DOUBLE) * 1e4) / 1e4) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def q14_promo_effect(spark, sf_dir):
    """TPC-H Q14: ratio of conditional sums."""
    l = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part")
    # r11: split-long exact sums (registry._usum) — same value as the
    # DECIMAL(25,6) cast+sum, ~2.5x cheaper per row (see registry.py)
    promo = _usum(
        F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0))
    ).cast("double")
    total = _usum(_rev()).cast("double")
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .agg(fr(100.0 * promo / total, 4).alias("promo_revenue"))
    )


@query(
    "q16_part_supplier_relationships",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_part_supplier_relationships(spark, sf_dir):
    """TPC-H Q16: NOT IN (null-free subquery) -> left_anti join + DISTINCT
    aggregation (3-stage DQA in the reference, cdbgroup.c:348)."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    )
    bad_s = t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(broadcast(bad_s), l.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT (floor(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / 7.0 * 1e2) / 1e2)
           AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
        SELECT l_partkey,
               0.5 * (CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / count(*))
               AS qty_threshold
        FROM lineitem GROUP BY l_partkey
    ) a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND l.l_quantity < a.qty_threshold
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17: correlated scalar avg subquery decorrelated into an
    aggregate+join (CSubqueryHandler.cpp semantics, Spark-native form)."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    thresholds = (
        l.groupBy("l_partkey")
        .agg(
            (
                0.5
                * (
                    # r11: split-long exact sum (same value, cheaper row path)
                    _usum(F.col("l_quantity")).cast("double")
                    / F.count(F.lit(1))
                )
            ).alias("qty_threshold")
        )
        .withColumnRenamed("l_partkey", "t_partkey")
    )
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .join(thresholds, l.l_partkey == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            fr(
                _usum(F.col("l_extendedprice")).cast("double") / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


@query(
    "q18_large_volume_customer",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           {osum('l_quantity')} AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(25,6))) > 140
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18: IN over a grouped/HAVING subquery. The outer
    sum(l_quantity) groups by exactly the subquery's key, so the HAVING
    aggregation IS the output aggregate — reuse it instead of re-joining
    the full lineitem fact and re-aggregating (the naive shape scans
    lineitem twice and shuffles lineitem x orders before the semi
    filter; this one scans it once, and the surviving per-order rows —
    a small fraction past the >140 threshold — drive the orders join,
    with AQE free to broadcast whichever side ends up small)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(_usum(F.col("l_quantity")).alias("q"))  # r11: split-long exact sum
        .where(F.col("q") > 140)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round(F.col("q"), 2).cast("double").alias("sum_qty"),
        )
    )


@query(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT {osum(O_REV)} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#5' AND p.p_size BETWEEN 1 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def q19_discounted_revenue(spark, sf_dir):
    """TPC-H Q19: disjunction of conjunctive range predicates across the
    join (BitmapOr-style predicate combination, nodeBitmapOr.c:107 — in
    Spark the disjunction is evaluated post-join by codegen)."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#5") & F.col("p_size").between(1, 30) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 50) & q.between(20, 30))
    )
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .where(cond)
        .agg(dsum(_rev()).alias("revenue"))
    )


@query(
    "q21_waiting_orders",
    oracle="""
    SELECT n.n_name, count(*) AS numwait
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'P')
    GROUP BY n.n_name
    """,
)
def q21_waiting_orders(spark, sf_dir):
    """TPC-H Q21 (adapted): EXISTS + NOT EXISTS -> semi then anti join
    (JOIN_SEMI / JOIN_ANTI, nodes.h:739-776)."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders")
    has_f = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    has_p = o.where(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("p_custkey")
    )
    return (
        c.join(has_f, c.c_custkey == F.col("o_custkey"), "left_semi")
        .join(has_p, c.c_custkey == F.col("p_custkey"), "left_anti")
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT c_mktsegment, count(*) AS numcust,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(25,6))), 2) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
            SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) / count(*)
            FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    GROUP BY c_mktsegment
    """,
)
def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 (adapted): scalar subquery threshold + anti join."""
    c = t(spark, sf_dir, "customer")
    o = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "P")
        .select("o_custkey")
    )
    avg_bal_row = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(
            (
                _usum(F.col("c_acctbal")).cast("double")
                / F.count(F.lit(1))
            ).alias("v")
        )
    )
    # scalar subquery: cross-join the 1-row aggregate (broadcast) instead of
    # collecting to the driver — stays fully distributed.
    return (
        c.crossJoin(broadcast(avg_bal_row))
        .where(F.col("c_acctbal") > F.col("v"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(_usum(F.col("c_acctbal")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
    )


@query(
    "q02_min_cost_supplier",
    oracle="""
    WITH partsup AS (
        SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        FROM lineitem
    ), eligible AS (
        SELECT ps_partkey, ps_suppkey, s_acctbal, s_name, n_name
        FROM partsup
        JOIN supplier s ON s.s_suppkey = ps_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_type
    FROM eligible e
    JOIN part p ON p.p_partkey = e.ps_partkey
    JOIN (
        SELECT ps_partkey, min(s_acctbal) AS min_bal
        FROM eligible GROUP BY ps_partkey
    ) m ON m.ps_partkey = e.ps_partkey AND e.s_acctbal = m.min_bal
    WHERE p.p_size = 15 AND p.p_type = 'LARGE'
    """,
)
def q02_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 (adapted: no partsupp fixture — the DISTINCT
    (l_partkey, l_suppkey) pairs stand in for partsupp, min supply cost
    := min s_acctbal). The correlated MIN subquery is decorrelated into a
    grouped aggregate self-join, the ORCA CSubqueryHandler strategy."""
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    p = t(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    partsup = l.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).distinct()
    eligible = (
        partsup.join(broadcast(s), F.col("ps_suppkey") == s.s_suppkey)
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("ps_partkey", "ps_suppkey", "s_acctbal", "s_name", "n_name")
    )
    # r11 (guide §2.4): the grouped-min self-join computed `eligible`
    # (distinct shuffle + 3 joins) TWICE; a per-partkey window min over a
    # single pass keeps exactly the same rows (ties at the min survive
    # both forms) with one distinct shuffle + one window exchange.
    from pyspark.sql.window import Window as _W

    wmin = F.min("s_acctbal").over(_W.partitionBy("ps_partkey"))
    return (
        eligible.join(broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .withColumn("_min_bal", wmin)
        .where(F.col("s_acctbal") == F.col("_min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
    )


@query(
    "q08_national_market_share",
    oracle=f"""
    WITH all_nations AS (
        SELECT CAST(extract(year FROM o.o_orderdate) AS INT) AS o_year,
               CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6)) AS volume,
               ns.n_name AS supp_nation
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation nc ON nc.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = nc.n_regionkey
        JOIN nation ns ON ns.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           (floor(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                          ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE) * 1e6) / 1e6) AS mkt_share
    FROM all_nations GROUP BY o_year
    """,
)
def q08_national_market_share(spark, sf_dir):
    """TPC-H Q8 (adapted types/nation names): NATION_3's share of ECONOMY
    part revenue sold into AMERICA, by order year. 7-table join with every
    dimension broadcast; conditional aggregation for the share."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    nc = n.select(F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region"))
    ns = n.select(F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation"))
    vol = _rev()
    nat_vol = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
        F.lit(0.0)
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(p), l.l_partkey == p.p_partkey)
        .join(broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(broadcast(r), F.col("nc_region") == F.col("r_regionkey"))
        .join(broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            fr(
                # r11: split-long exact sums (same values as the decimal casts)
                _usum(nat_vol).cast("double") / _usum(vol).cast("double"), 6
            ).alias("mkt_share")
        )
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH value_by_part AS (
        SELECT l.l_partkey AS ps_partkey,
               CAST(sum(CAST(0.5 * p.p_retailprice * l.l_quantity
                             AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS value
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_1'
        GROUP BY l.l_partkey
    )
    SELECT ps_partkey, CAST(round(value, 2) AS DOUBLE) AS value
    FROM value_by_part
    WHERE value > (SELECT sum(value) * 0.001 FROM value_by_part)
    """,
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 (adapted: stock value := 0.5*retailprice*shipped qty):
    per-part value in one nation filtered by a scalar-subquery fraction of
    the total — the HAVING > scalar shape (ORCA unnests to a cross join
    against the one-row aggregate; Spark plans the same)."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    val = 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    by_part = (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .join(broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(_usum(val).alias("value"))  # r11: split-long exact sum
    )
    threshold = by_part.agg(
        (F.sum("value") * F.lit(0.001)).alias("thr")
    )
    return (
        by_part.join(broadcast(threshold))
        .where(F.col("value") > F.col("thr"))
        .select(
            "ps_partkey", F.round(F.col("value"), 2).cast("double").alias("value")
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(round(r.total_revenue, 2) AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: the revenue view + scalar MAX subquery — view reuse is
    the reference's ShareInputScan (planshare.c); Spark reuses the
    exchange or recomputes the small aggregate."""
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    revenue = (
        l.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        # r11: split-long exact sum (same value as the decimal cast+sum)
        .agg(_usum(_rev()).alias("total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        s.join(revenue, s.s_suppkey == F.col("supplier_no"))
        .join(broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_revenue"), 2).cast("double").alias("total_revenue"),
        )
    )


@query(
    "q20_potential_promotion",
    oracle="""
    WITH shipped AS (
        SELECT l_partkey, l_suppkey,
               CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_partkey, l_suppkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN shipped sh ON sh.l_suppkey = s.s_suppkey
    JOIN part p ON p.p_partkey = sh.l_partkey
    WHERE p.p_name LIKE '%gear%' AND sh.qty > 40
    """,
)
def q20_potential_promotion(spark, sf_dir):
    """TPC-H Q20 (adapted: availqty -> shipped qty threshold): nested IN
    subqueries flattened to semi-join chain (convert_IN_to_join,
    cdbsubselect.c)."""
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    p = t(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    shipped = (
        l.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(_usum(F.col("l_quantity")).cast("double").alias("qty"))
        .where(F.col("qty") > 40)
    )
    qualifying = shipped.join(
        broadcast(p), F.col("l_partkey") == p.p_partkey, "left_semi"
    ).select("l_suppkey").distinct()
    return (
        s.join(qualifying, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
    )
