"""Aggregation / OLAP grouping surface (SURVEY.md §2.4).

Reference machinery being re-expressed:
- GROUPING SETS / ROLLUP / CUBE + grouping()/group_id — planned via
  plangroupext.c:406 + nodeRepeat.c in the reference; Spark's Expand
  operator is the built-in equivalent.
- ordered-set aggs percentile_cont/disc, median, mode —
  orderedsetaggs.c:407,542.
- multiple DISTINCT-qualified aggregates (MDQA, 3-stage agg
  cdbgroup.c:347-348) — Spark's Expand-based distinct rewrite.
- string_agg/array_agg with ORDER BY (varlena.c) — deterministic
  collect_list(struct)->array_sort composition, partial-aggregatable.
- corr/covar/regr_* (pg_aggregate.h) — expressed via exact decimal moment
  sums so the result is order-independent and engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gpdb_spark.registry import DEC, dsum, fr, osum, query, t


@query(
    "rollup_returns",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {osum('l_quantity')} AS sum_qty,
           count(*) AS n,
           CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def rollup_returns(spark, sf_dir):
    """ROLLUP with grouping_id (plangroupext.c canonical rollup ->
    Spark Expand). r11: pre-aggregated by the full key set below the
    Expand (see grouping_sets_mixed) — the rollup re-sums ~6 exact
    partials instead of expanding the fact 3x."""
    from gpdb_spark.registry import _usum

    l = t(spark, sf_dir, "lineitem")
    base = l.groupBy("l_returnflag", "l_linestatus").agg(
        _usum(F.col("l_quantity")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        base.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("s"), 2).cast("double").alias("sum_qty"),
            F.sum("n").alias("n"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


@query(
    "cube_orders",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           {osum('o_totalprice')} AS sum_price,
           count(*) AS n,
           CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def cube_orders(spark, sf_dir):
    """r11: pre-aggregated below the Expand (see grouping_sets_mixed) —
    the cube re-sums ~15 exact partials instead of expanding orders 4x."""
    from gpdb_spark.registry import _usum

    o = t(spark, sf_dir, "orders")
    base = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        _usum(F.col("o_totalprice")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        base.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.round(F.sum("s"), 2).cast("double").alias("sum_price"),
            F.sum("n").alias("n"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


@query(
    "grouping_sets_mixed",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {osum('l_extendedprice')} AS sum_price, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_mixed(spark, sf_dir):
    """Explicit GROUPING SETS through the SQL front door (gram.y:12432).

    r11: pre-aggregated below the Expand. Spark plans GROUPING SETS as
    Expand (one input copy per set) -> aggregate, so the raw formulation
    pushed 3x the fact rows through the hash aggregate. Summing is
    decomposable: aggregate once by the UNION of the grouping columns
    (six (flag, status) groups), then run the grouping sets over those
    partials — the Expand now triples ~6 rows instead of the fact table
    (guide §2.3 "aggregate before you shuffle"). Decimal sums re-sum
    exactly; count(*) becomes sum(n); results are value-identical. The
    pre-aggregate uses the registry's split-long exact sum (_usum) —
    same value as sum(CAST(x AS DECIMAL(25,6))), ~2.5x cheaper per row."""
    from gpdb_spark.registry import _usum

    l = t(spark, sf_dir, "lineitem")
    base = l.groupBy("l_returnflag", "l_linestatus").agg(
        _usum(F.col("l_extendedprice")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    base.createOrReplaceTempView("lineitem_gs_base")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(round(sum(s), 2) AS DOUBLE) AS sum_price,
               sum(n) AS n
        FROM lineitem_gs_base
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "mdqa_multi_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd_part,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS nd_supp,
           CAST(count(DISTINCT l_quantity) AS BIGINT) AS nd_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def mdqa_multi_distinct(spark, sf_dir):
    """Multiple DISTINCT-qualified aggregates in one projection (MDQA —
    CXformGbAggWithMDQA2Join / 3-stage DQA cdbgroup.c:348; Spark Expand)."""
    l = t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("nd_part"),
        F.count_distinct("l_suppkey").alias("nd_supp"),
        F.count_distinct("l_quantity").alias("nd_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "sum_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_dq
    FROM lineitem GROUP BY l_returnflag
    """,
)
def sum_distinct(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.sum_distinct(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_dq")
    )


@query(
    "ordered_set_aggs",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
           round(median(l_extendedprice), 4) AS med
    FROM lineitem GROUP BY l_returnflag
    """,
)
def ordered_set_aggs(spark, sf_dir):
    """percentile_cont / median (orderedsetaggs.c:542) — exact percentile,
    computed distributed (sort-based within partial agg).

    r11 (guide §1.2): ONE Percentile aggregate evaluating the fraction
    ARRAY — a single value buffer per group instead of four independent
    copies of the column (F.median IS Percentile(0.5) internally, so
    p50/med stay the identical value)."""
    l = t(spark, sf_dir, "lineitem")
    pcts = F.percentile(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.25), F.lit(0.95))
    )
    return (
        l.groupBy("l_returnflag")
        .agg(pcts.alias("_p"))
        .select(
            "l_returnflag",
            F.round(F.col("_p")[0], 4).alias("p50"),
            F.round(F.col("_p")[1], 4).alias("p25"),
            F.round(F.col("_p")[2], 4).alias("p95"),
            F.round(F.col("_p")[0], 4).alias("med"),
        )
    )


@query(
    "percentile_disc_agg",
    oracle="""
    SELECT l_linestatus,
           quantile_disc(l_quantity, 0.25) AS q25_disc,
           quantile_disc(l_quantity, 0.5) AS q50_disc
    FROM lineitem GROUP BY l_linestatus
    """,
)
def percentile_disc_agg(spark, sf_dir):
    """percentile_disc (orderedsetaggs.c:407): discrete percentile — the
    first value whose cumulative fraction reaches p."""
    l = t(spark, sf_dir, "lineitem")
    return l.groupBy("l_linestatus").agg(
        F.expr(
            "percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)"
        ).alias("q25_disc"),
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)"
        ).alias("q50_disc"),
    )


@query(
    "mode_deterministic",
    oracle="""
    SELECT o_orderpriority, qty_mode FROM (
        SELECT o_orderpriority, l_quantity AS qty_mode,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY count(*) DESC, l_quantity) AS rn
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o_orderpriority, l_quantity
    ) x WHERE rn = 1
    """,
)
def mode_deterministic(spark, sf_dir):
    """mode() with a deterministic tiebreak (smallest value), built as
    count-groupBy + row_number — the distributed two-phase form of
    orderedsetaggs.c's mode_final."""
    from pyspark.sql.window import Window

    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    counts = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderpriority", "l_quantity")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("cnt").desc(), F.col("l_quantity")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_orderpriority", F.col("l_quantity").alias("qty_mode"))
    )


@query(
    "string_agg_ordered",
    oracle="""
    SELECT r.r_name, string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def string_agg_ordered(spark, sf_dir):
    """string_agg(x, sep ORDER BY k) (varlena.c) — deterministic ordered
    concat via collect_list(struct)->array_sort->array_join, all JVM-side."""
    from gpdb_spark.functions.pg import string_agg

    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(string_agg("n_name", ",").alias("nations"))
    )


@query(
    "array_agg_ordered_str",
    oracle="""
    SELECT c_mktsegment,
           string_agg(c_custkey, ',' ORDER BY c_custkey) AS keys_csv
    FROM customer WHERE c_custkey < 60
    GROUP BY c_mktsegment
    """,
)
def array_agg_ordered_str(spark, sf_dir):
    """array_agg(x ORDER BY x) (array_userfuncs.c) rendered to CSV so the
    cross-engine comparison is type-stable."""
    from gpdb_spark.functions.pg import array_agg_ordered

    c = t(spark, sf_dir, "customer").where(F.col("c_custkey") < 60)
    return c.groupBy("c_mktsegment").agg(
        F.array_join(
            F.transform(
                array_agg_ordered(F.col("c_custkey")),
                lambda v: v.cast("string"),
            ),
            ",",
        ).alias("keys_csv")
    )


@query(
    "bool_bit_aggs",
    oracle="""
    SELECT c_mktsegment,
           bool_and(c_acctbal > 0) AS all_pos,
           bool_or(c_acctbal > 9000) AS any_rich,
           CAST(bit_and(c_nationkey) AS BIGINT) AS band,
           CAST(bit_or(c_nationkey) AS BIGINT) AS bor
    FROM customer GROUP BY c_mktsegment
    """,
)
def bool_bit_aggs(spark, sf_dir):
    """bool_and/bool_or/bit_and/bit_or (pg_aggregate.h builtins)."""
    c = t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.bool_and(F.col("c_acctbal") > 0).alias("all_pos"),
        F.bool_or(F.col("c_acctbal") > 9000).alias("any_rich"),
        F.bit_and("c_nationkey").cast("long").alias("band"),
        F.bit_or("c_nationkey").cast("long").alias("bor"),
    )


@query(
    "minmax_hetero",
    oracle="""
    SELECT l_returnflag,
           min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship,
           min(l_quantity) AS min_qty, max(l_extendedprice) AS max_price,
           min(l_linestatus) AS min_status
    FROM lineitem GROUP BY l_returnflag
    """,
)
def minmax_hetero(spark, sf_dir):
    """min/max across timestamp, double and string types."""
    l = t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_linestatus").alias("min_status"),
    )


@query(
    "corr_regr_explicit",
    oracle="""
    SELECT l_returnflag, n,
           (floor((n * sxy - sx * sy) /
                 (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) * 1e6) / 1e6)
             AS corr_qp,
           (floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1e6) / 1e6)
             AS regr_slope
    FROM (
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag
    ) m
    """,
)
def corr_regr_explicit(spark, sf_dir):
    """corr/regr_slope (pg_aggregate.h regr_* family) via exact moment sums
    — order-independent, unlike streaming Welford updates."""
    from gpdb_spark.registry import _usum

    l = t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    y = F.col("l_extendedprice")
    # r11: split-long exact sums (registry._usum, value-identical to the
    # DECIMAL(25,6) casts) for every moment whose |value|*1e6 stays
    # below 2^51; y*y (~1.2e10) exceeds that bound and keeps the
    # decimal-cast spelling.
    m = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        _usum(x).cast("double").alias("sx"),
        _usum(y).cast("double").alias("sy"),
        _usum(x * y).cast("double").alias("sxy"),
        _usum(x * x).cast("double").alias("sxx"),
        F.sum((y * y).cast(DEC)).cast("double").alias("syy"),
    )
    n, sx, sy, sxy, sxx, syy = (F.col(c) for c in ["n", "sx", "sy", "sxy", "sxx", "syy"])
    return m.select(
        "l_returnflag",
        "n",
        fr(
            (n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        ).alias("corr_qp"),
        fr((n * sxy - sx * sy) / (n * sxx - sx * sx), 6).alias("regr_slope"),
    )


@query(
    "approx_count_distinct_hll",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_nd_part,
           TRUE AS hll_within_2pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_count_distinct_hll(spark, sf_dir):
    """HyperLogLog approximate NDV (gp_hyperloglog.c; used by ANALYZE).
    DuckDB's approx_count_distinct uses a different HLL seed, so the
    raw sketch value cannot be oracle-compared; instead the query emits
    the exact NDV plus a boolean asserting the HLL estimate is within
    2% of it — the driver hash then verifies both the exact value and
    the accuracy claim. tests/test_datapipe.py additionally bounds the
    relative error locally."""
    # r11 (guide §2.3 "aggregate before you shuffle"): mixing a DISTINCT
    # aggregate with a plain one made Spark Expand-duplicate every row
    # through the partial aggregate. Deduplicating the (flag, partkey)
    # pairs FIRST (the exact NDV needs that dedup anyway) and sketching
    # the distinct pairs removes the Expand; an HLL sketch is
    # duplicate-insensitive, so approx_nd_part is bit-identical. 3.7 s
    # -> 1.2 s at sf0.1.
    l = t(spark, sf_dir, "lineitem").select("l_returnflag", "l_partkey")
    agg = l.distinct().groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_nd_part"),
        F.count(F.lit(1)).alias("exact_nd_part"),
    )
    tol = (
        F.abs(F.col("approx_nd_part") - F.col("exact_nd_part"))
        / F.col("exact_nd_part")
        < 0.02
    )
    return agg.select(
        "l_returnflag",
        "exact_nd_part",
        tol.alias("hll_within_2pct"),
    )


@query(
    "agg_filter_clause",
    oracle=f"""
    SELECT o_orderpriority,
           count(*) AS n_all,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           {osum('o_totalprice')} AS sum_all,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6)))
                FILTER (WHERE o_orderstatus = 'O'), 2) AS DOUBLE) AS sum_open
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_filter_clause(spark, sf_dir):
    """PG aggregate FILTER (WHERE ...) clause (parse_agg.c aggfilter;
    SURVEY.md §2.4): per-aggregate predicates inside one grouping pass —
    no self-joins, single shuffle. Spark: conditional aggregation via
    when(); same partial/final 2-stage plan."""
    from gpdb_spark.registry import _usum

    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        dsum("o_totalprice").alias("sum_all"),
        # r11: split-long exact sum (same value as the DECIMAL(25,6) path)
        F.round(
            _usum(F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))), 2
        )
        .cast("double")
        .alias("sum_open"),
    )


@query(
    "percentile_multi",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS q25,
           round(quantile_cont(l_extendedprice, 0.5), 4)  AS q50,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS q75,
           round(quantile_cont(l_discount, 0.9), 4) AS p90_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentile_multi(spark, sf_dir):
    """percentile_cont over an array of fractions (orderedsetaggs.c:542
    multi-fraction WITHIN GROUP) — one sort per group serves all
    quantiles on the Spark side; the result is projected to scalar
    columns (q25/q50/q75) so the driver canonicalizer can hash it
    (arrays are unhashable in its pandas sort). Both engines
    interpolate a + (b-a)*f over the same sorted multiset, so 4-digit
    rounding is stable."""
    l = t(spark, sf_dir, "lineitem")
    qs = F.percentile(
        "l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    )
    return l.groupBy("l_returnflag").agg(
        F.round(F.element_at(qs, 1), 4).alias("q25"),
        F.round(F.element_at(qs, 2), 4).alias("q50"),
        F.round(F.element_at(qs, 3), 4).alias("q75"),
        F.round(F.percentile("l_discount", F.lit(0.9)), 4).alias("p90_disc"),
    )


@query(
    "hypothetical_set_aggs",
    # orderedsetaggs.c hypothetical-set aggregates: rank/dense_rank/
    # percent_rank/cume_dist (value) WITHIN GROUP (ORDER BY col) — the
    # rank a hypothetical value WOULD take in each group's distribution.
    # Neither Spark nor DuckDB has them natively; both sides compute the
    # defining counting formulas (SQL:2008): one aggregation pass each.
    oracle="""
    SELECT o_orderpriority,
           count(*) + 1 - count(*) FILTER (WHERE o_totalprice >= 150000)
               AS hyp_rank_gt,
           CAST(sum(CASE WHEN o_totalprice < 150000 THEN 1 ELSE 0 END) + 1
                AS BIGINT) AS hyp_rank,
           count(DISTINCT CASE WHEN o_totalprice < 150000
                               THEN o_totalprice END) + 1 AS hyp_dense_rank,
           CAST((sum(CASE WHEN o_totalprice < 150000 THEN 1 ELSE 0 END)
                 * 1000000) // count(*) AS BIGINT)
               AS hyp_percent_rank_ppm,
           CAST(((sum(CASE WHEN o_totalprice <= 150000 THEN 1 ELSE 0 END) + 1)
                 * 1000000) // (count(*) + 1) AS BIGINT)
               AS hyp_cume_dist_ppm
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def hypothetical_set_aggs(spark, sf_dir):
    """Hypothetical-set aggregates (orderedsetaggs.c:1031 hypothetical_rank
    family, SURVEY.md §2.4): where would value v=150000 rank inside each
    group? rank = 1 + count(x < v); dense_rank = 1 + count(distinct x<v);
    cume_dist = (count(x <= v)+1)/(n+1). Pure counting aggregates — a
    single 2-stage agg pass, no sort, no window."""
    o = t(spark, sf_dir, "orders")
    v = F.lit(150000.0)
    p = F.col("o_totalprice")
    # All compared ratios are pure BIGINT (x * 1e6) DIV n — no doubles
    # anywhere in the compared output, so no rounding/fusion question can
    # exist between engines (ppm values are exact integers on both sides;
    # operands are nonnegative so floor-div == trunc-div).
    agg = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(F.when(p < v, 1).otherwise(0)).cast("long").alias("_below"),
        F.sum(F.when(p <= v, 1).otherwise(0)).cast("long").alias("_le"),
        F.count(F.when(p >= v, 1)).cast("long").alias("_ge"),
        (F.count_distinct(F.when(p < v, p)) + 1).alias("hyp_dense_rank"),
    )
    return agg.select(
        "o_orderpriority",
        (F.col("_n") + 1 - F.col("_ge")).alias("hyp_rank_gt"),
        (F.col("_below") + 1).alias("hyp_rank"),
        "hyp_dense_rank",
        F.expr("CAST((_below * 1000000) DIV _n AS BIGINT)").alias(
            "hyp_percent_rank_ppm"
        ),
        F.expr("CAST(((_le + 1) * 1000000) DIV (_n + 1) AS BIGINT)").alias(
            "hyp_cume_dist_ppm"
        ),
    )


@query(
    "distinct_ordered_aggs",
    # DISTINCT inside ordered aggregates (aggref aggdistinct +
    # aggorder, parse_agg.c): dedup THEN deterministic order
    oracle="""
    SELECT l_returnflag,
           string_agg(DISTINCT l_linestatus, '|' ORDER BY l_linestatus)
               AS modes,
           array_to_string(list_sort(list_distinct(
               list(CAST(l_quantity AS BIGINT)))), ',') AS qty_set,
           count(DISTINCT l_linestatus) AS n_modes
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def distinct_ordered_aggs(spark, sf_dir):
    """string_agg(DISTINCT ... ORDER BY) / array_agg(DISTINCT) — dedup +
    deterministic ordering via collect_set -> array_sort, all JVM-side
    and partial-aggregatable (collect_set combines per-partition)."""
    l = t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.array_join(
            F.array_sort(F.collect_set("l_linestatus")), "|"
        ).alias("modes"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_set(F.col("l_quantity").cast("bigint"))
                ),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("qty_set"),
        F.count_distinct("l_linestatus").alias("n_modes"),
    )


@query(
    "approx_percentile_sketch",
    # same oracle pattern as approx_count_distinct_hll: DuckDB computes
    # the EXACT percentile and asserts the sketch landed within
    # tolerance; the compared value is the boolean, which both engines
    # agree on whenever the sketch honors its accuracy contract.
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           TRUE AS p50_within_tol,
           TRUE AS p95_within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_percentile_sketch(spark, sf_dir):
    """Quantile sketch (Greenwald-Khanna approx_percentile — the
    streaming/mergeable analog of gp_percentile_agg): at accuracy 10000
    the rank error is <= n/10000, so the sketch median must sit within
    0.5% rank of the exact one. The sketch is partial-aggregatable
    (mergeable digests) — the 2-stage MPP agg shape for quantiles at
    100 TB, where exact percentile would need a full sort per group."""
    l = t(spark, sf_dir, "lineitem")
    exact = F.expr("percentile(l_extendedprice, array(0.5, 0.95))")
    approx = F.expr(
        "approx_percentile(l_extendedprice, array(0.5, 0.95), 10000)"
    )
    # value-tolerance check: approx within 2% of exact value (rank
    # tolerance is the contract; value tolerance holds on these smooth
    # price distributions and is what a user observes)
    def ok(i):
        e, a = F.element_at(exact, i), F.element_at(approx, i)
        return (F.abs(a - e) <= 0.02 * F.abs(e)).alias(
            f"p{'50' if i == 1 else '95'}_within_tol"
        )

    return l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), ok(1), ok(2)
    )
