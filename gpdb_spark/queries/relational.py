"""Core relational surface (SURVEY.md §2.3 joins, §2.6 sort/limit,
§2.7 set ops, §2.1 values/CTE/recursive).

Join-type parity with the reference's executor (nodes.h:739-776):
INNER/LEFT/RIGHT/FULL/SEMI/ANTI plus the GPDB-specific null-aware anti
join for NOT IN (JOIN_LASJ_NOTIN) — expressed here with Spark's native
null-aware planning (SQL NOT IN) and an explicit DataFrame construction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gpdb_spark.registry import osum, query, t


@query(
    "join_full_outer",
    oracle="""
    SELECT n.n_name, c.c_custkey
    FROM nation n
    FULL OUTER JOIN (SELECT * FROM customer WHERE c_custkey < 30) c
      ON n.n_nationkey = c.c_nationkey
    WHERE n.n_nationkey >= 20 OR n.n_nationkey IS NULL
    """,
)
def join_full_outer(spark, sf_dir):
    """FULL OUTER join (ExecMergeJoin FULL path / ORCA
    CXformImplementFullOuterMergeJoin) with null-extended rows on both
    sides."""
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer").where(F.col("c_custkey") < 30)
    return (
        n.join(c, n.n_nationkey == c.c_nationkey, "full_outer")
        .where((F.col("n_nationkey") >= 20) | F.col("n_nationkey").isNull())
        .select("n_name", "c_custkey")
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT s.s_suppkey, n.n_name
    FROM (SELECT * FROM supplier WHERE s_acctbal > 5000) s
    RIGHT OUTER JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
)
def join_right_outer(spark, sf_dir):
    s = t(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 5000)
    n = t(spark, sf_dir, "nation")
    return s.join(n, s.s_nationkey == n.n_nationkey, "right_outer").select(
        "s_suppkey", "n_name"
    )


@query(
    "join_theta_range",
    oracle="""
    SELECT c.c_custkey, count(*) AS n_richer
    FROM (SELECT * FROM customer WHERE c_custkey < 100) c
    JOIN supplier s
      ON s.s_acctbal > c.c_acctbal AND s.s_nationkey = c.c_nationkey
    GROUP BY c.c_custkey
    """,
)
def join_theta_range(spark, sf_dir):
    """Theta (non-equi) join — NestLoop in the reference
    (nodeNestloop.c:366); Spark plans equi-key + range residual."""
    c = t(spark, sf_dir, "customer").where(F.col("c_custkey") < 100)
    s = t(spark, sf_dir, "supplier")
    return (
        c.join(
            s,
            (s.s_acctbal > c.c_acctbal) & (s.s_nationkey == c.c_nationkey),
        )
        .groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n_richer"))
    )


@query(
    "join_cross",
    oracle="""
    SELECT r1.r_name AS from_region, r2.r_name AS to_region
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey <> r2.r_regionkey
    """,
)
def join_cross(spark, sf_dir):
    """Cartesian product (BroadcastNestedLoopJoin)."""
    r = t(spark, sf_dir, "region")
    r1 = r.select(F.col("r_name").alias("from_region"), F.col("r_regionkey").alias("k1"))
    r2 = r.select(F.col("r_name").alias("to_region"), F.col("r_regionkey").alias("k2"))
    return (
        r1.crossJoin(r2)
        .where(F.col("k1") != F.col("k2"))
        .select("from_region", "to_region")
    )


@query(
    "join_notin_nullaware",
    # Two branches so the row can never be TRIVIALLY green: 'no_nulls'
    # is an ordinary NOT IN (returns rows), 'with_null' injects a NULL
    # into the subquery set and must return ZERO rows by tri-valued
    # logic — its absence is part of the compared hash.
    oracle="""
    SELECT c_custkey, 'no_nulls' AS variant FROM customer
    WHERE c_custkey < 200
      AND c_nationkey NOT IN (
        SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
    UNION ALL
    SELECT c_custkey, 'with_null' AS variant FROM customer
    WHERE c_custkey < 200
      AND c_nationkey NOT IN (
        SELECT CASE WHEN n_nationkey < 5 THEN NULL ELSE n_nationkey END
        FROM nation WHERE n_regionkey = 2)
    """,
)
def join_notin_nullaware(spark, sf_dir):
    """Null-aware anti join — GPDB JOIN_LASJ_NOTIN (nodes.h:739-776,
    convert_IN_to_antijoin cdbsubselect.c:1465). Two variants: the
    null-free subquery behaves as a plain anti join (non-empty — keeps
    this row from matching trivially on any corpus), while the
    NULL-containing subquery must reject EVERY tuple per tri-valued
    logic. Both expressed as anti joins whose condition is true on
    (match OR either-side-null)."""
    c = t(spark, sf_dir, "customer").where(F.col("c_custkey") < 200)

    def branch(with_null: bool, tag: str):
        sub = t(spark, sf_dir, "nation").where(F.col("n_regionkey") == 2)
        k = (
            F.when(F.col("n_nationkey") < 5, F.lit(None))
            .otherwise(F.col("n_nationkey"))
            if with_null
            else F.col("n_nationkey")
        )
        sub = sub.select(k.alias("k"))
        cond = (
            (c.c_nationkey == F.col("k"))
            | c.c_nationkey.isNull()
            | F.col("k").isNull()
        )
        return c.join(sub, cond, "left_anti").select(
            "c_custkey", F.lit(tag).alias("variant")
        )

    return branch(False, "no_nulls").unionAll(branch(True, "with_null"))


@query(
    "setop_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_totalprice > 30000
    """,
)
def setop_intersect(spark, sf_dir):
    """INTERSECT (nodeSetOp.c:195; ORCA rewrites to semi join)."""
    a = (
        t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    b = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 30000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a.intersect(b)


@query(
    "setop_except",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def setop_except(spark, sf_dir):
    """EXCEPT (CXformDifference2LeftAntiSemiJoin)."""
    a = (
        t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "MACHINERY")
        .select("c_custkey")
    )
    b = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a.subtract(b)


@query(
    "setop_intersect_all",
    oracle="""
    SELECT l_suppkey FROM lineitem WHERE l_quantity > 48
    INTERSECT ALL
    SELECT l_suppkey FROM lineitem WHERE l_discount > 0.08
    """,
)
def setop_intersect_all(spark, sf_dir):
    """INTERSECT ALL — bag semantics (SetOp hashed mode)."""
    l = t(spark, sf_dir, "lineitem")
    a = l.where(F.col("l_quantity") > 48).select("l_suppkey")
    b = l.where(F.col("l_discount") > 0.08).select("l_suppkey")
    return a.intersectAll(b)


@query(
    "setop_except_all",
    oracle="""
    SELECT l_suppkey FROM lineitem WHERE l_quantity >= 45
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_quantity >= 48
    """,
)
def setop_except_all(spark, sf_dir):
    """EXCEPT ALL — bag difference: multiplicity(a) - multiplicity(b),
    guaranteed non-empty here since the second set is a strict subset."""
    l = t(spark, sf_dir, "lineitem")
    a = l.where(F.col("l_quantity") >= 45).select("l_suppkey")
    b = l.where(F.col("l_quantity") >= 48).select("l_suppkey")
    return a.exceptAll(b)


@query(
    "setop_union_mixed",
    oracle="""
    SELECT DISTINCT x FROM (
        SELECT c_nationkey AS x FROM customer WHERE c_acctbal > 9900
        UNION ALL
        SELECT s_nationkey AS x FROM supplier WHERE s_acctbal > 9000
        UNION ALL
        SELECT n_nationkey AS x FROM nation WHERE n_regionkey = 0
    ) u
    """,
)
def setop_union_mixed(spark, sf_dir):
    """UNION ALL of 3 branches + dedup (nodeAppend.c:197 + nodeUnique)."""
    a = (
        t(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9900)
        .select(F.col("c_nationkey").alias("x"))
    )
    b = (
        t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("x"))
    )
    c = (
        t(spark, sf_dir, "nation")
        .where(F.col("n_regionkey") == 0)
        .select(F.col("n_nationkey").alias("x"))
    )
    return a.unionAll(b).unionAll(c).distinct()


@query(
    "distinct_dropdup",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_quantity
    FROM lineitem WHERE l_quantity <= 3
    """,
)
def distinct_dropdup(spark, sf_dir):
    """DISTINCT / dropDuplicates (nodeUnique.c:48 over sort; Spark hash
    aggregates instead)."""
    l = t(spark, sf_dir, "lineitem").where(F.col("l_quantity") <= 3)
    return l.select("l_returnflag", "l_linestatus", "l_quantity").distinct()


@query(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15 OFFSET 10
    """,
)
def limit_offset(spark, sf_dir):
    """ORDER BY + LIMIT/OFFSET (nodeLimit.c:233; bounded tuplesort top-k)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(10)
        .limit(15)
    )


@query(
    "values_scan",
    oracle="""
    SELECT v.seg, count(*) AS n
    FROM (VALUES ('BUILDING', 1), ('MACHINERY', 2), ('AUTOMOBILE', 3)) v(seg, pri)
    JOIN customer c ON c.c_mktsegment = v.seg
    GROUP BY v.seg
    """,
)
def values_scan(spark, sf_dir):
    """VALUES list (nodeValuesscan.c:200) joined against a table."""
    v = spark.createDataFrame(
        [("BUILDING", 1), ("MACHINERY", 2), ("AUTOMOBILE", 3)], ["seg", "pri"]
    )
    c = t(spark, sf_dir, "customer")
    return (
        c.join(F.broadcast(v), c.c_mktsegment == v.seg)
        .groupBy("seg")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "cte_shared_scan",
    oracle=f"""
    WITH big_orders AS (
        SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 40000
    )
    SELECT a.o_custkey, a.n_big, b.total
    FROM (SELECT o_custkey, count(*) AS n_big FROM big_orders GROUP BY o_custkey) a
    JOIN (SELECT o_custkey, {osum('o_totalprice')} AS total
          FROM big_orders GROUP BY o_custkey) b
      ON a.o_custkey = b.o_custkey
    """,
)
def cte_shared_scan(spark, sf_dir):
    """CTE consumed twice — ShareInputScan (nodeShareInputScan.c:148,
    planshare.c). Spark reuses the exchange; we mirror with one cached
    DataFrame feeding two aggregations."""
    from gpdb_spark.registry import dsum

    big = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 40000)
        .select("o_custkey", "o_totalprice")
    )
    a = big.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_big"))
    b = big.groupBy("o_custkey").agg(dsum("o_totalprice").alias("total"))
    return a.join(b, "o_custkey").select("o_custkey", "n_big", "total")


@query(
    "recursive_cte_series",
    oracle="""
    WITH RECURSIVE r(n) AS (
        SELECT 1
        UNION ALL
        SELECT n * 2 FROM r WHERE n * 2 <= 1000000
    )
    SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS iters FROM r
    """,
)
def recursive_cte_series(spark, sf_dir):
    """WITH RECURSIVE (nodeRecursiveunion.c:76 + nodeWorktablescan.c) —
    driver-side fixpoint loop over DataFrame unions
    (gpdb_spark.operators.recursive)."""
    from gpdb_spark.operators.recursive import recursive_cte

    seed = spark.range(1, 2).select(F.col("id").cast("int").alias("n"))

    def step(prev):
        return prev.where(F.col("n") * 2 <= 1000000).select(
            (F.col("n") * 2).alias("n")
        )

    r = recursive_cte(seed, step, max_iterations=50)
    return r.agg(
        F.sum("n").cast("long").alias("total"), F.count(F.lit(1)).alias("iters")
    )


@query(
    "recursive_cte_graph",
    oracle="""
    WITH RECURSIVE reach(key) AS (
        SELECT n_nationkey FROM nation WHERE n_nationkey = 0
        UNION
        SELECT n.n_nationkey FROM nation n
        JOIN reach r ON n.n_regionkey = CAST(r.key % 5 AS INT)
    )
    SELECT count(*) AS n_reached FROM reach
    """,
)
def recursive_cte_graph(spark, sf_dir):
    """Recursive CTE with UNION (dedup) semantics over a join step —
    transitive closure shape."""
    from gpdb_spark.operators.recursive import recursive_cte

    n = t(spark, sf_dir, "nation")
    seed = n.where(F.col("n_nationkey") == 0).select(
        F.col("n_nationkey").cast("long").alias("key")
    )

    def step(prev):
        return (
            n.join(
                prev.select((F.col("key") % 5).cast("int").alias("rk")).distinct(),
                F.col("n_regionkey") == F.col("rk"),
            )
            .select(F.col("n_nationkey").cast("long").alias("key"))
        )

    r = recursive_cte(seed, step, max_iterations=50, distinct=True)
    return r.agg(F.count(F.lit(1)).alias("n_reached"))


_PRICE_BANDS = [
    (0, 0.0, 500.0), (1, 500.0, 1500.0), (2, 1500.0, 3000.0),
    (3, 3000.0, 5000.0), (4, 5000.0, 8000.0), (5, 8000.0, 12000.0),
    (6, 12000.0, 20000.0), (7, 20000.0, 40000.0), (8, 40000.0, 80000.0),
    (9, 80000.0, 200000.0),
]


@query(
    "join_range_binned",
    oracle=f"""
    WITH bands(band_id, lo, hi) AS (
        VALUES {", ".join(f"({b}, {lo}, {hi})" for b, lo, hi in _PRICE_BANDS)}
    )
    SELECT band_id, count(*) AS n_items,
           {osum('l_extendedprice')} AS band_revenue
    FROM lineitem JOIN bands
      ON l_extendedprice >= lo AND l_extendedprice < hi
    GROUP BY band_id
    """,
)
def join_range_binned(spark, sf_dir):
    """Pure range-predicate join via the binned range join
    (operators/range_join.py) — the scale path for what the reference
    runs as NestLoop (nodeNestloop.c:366) and open-source Spark would
    plan as a quadratic BroadcastNestedLoopJoin. Equi-join on the bin id,
    exact residual filter; gate test_plans.py asserts no NestedLoop."""
    from gpdb_spark.operators.range_join import point_in_interval_join

    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    bands = spark.createDataFrame(_PRICE_BANDS, "band_id int, lo double, hi double")
    joined = point_in_interval_join(
        l, bands, "l_extendedprice", "lo", "hi", bin_width=2000.0
    )
    from gpdb_spark.registry import dsum

    return joined.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum("l_extendedprice").alias("band_revenue"),
    )
