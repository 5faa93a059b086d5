"""Type-extension contribs: hstore (key/value maps), ltree (label
paths), tablefunc connectby (hierarchy expansion), intarray operators —
/root/reference/contrib/{hstore,ltree,tablefunc,intarray}/.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gpdb_spark.functions import hstore, ltree
from gpdb_spark.registry import query, t

_HS = "'status=>' || o_orderstatus || ', pri=>' || o_orderpriority || ', key=>' || o_orderkey"


@query(
    "hstore_funcs",
    oracle=f"""
    WITH h AS (
        SELECT o_orderkey, {_HS} AS hs FROM orders WHERE o_orderkey < 200
    )
    SELECT o_orderkey,
           regexp_extract(hs, 'status=>([^,]*)', 1) AS status_val,
           regexp_matches(hs, 'pri=>') AS has_pri,
           NOT regexp_matches(hs, 'missing=>') AS no_missing,
           CAST(len(string_split(hs, ',')) AS INT) AS n_keys,
           'key,pri,status' AS keys_csv,
           'key,status' AS keys_after_del,
           'X' AS status_after_concat,
           '{{"key":"' || o_orderkey || '","pri":"' ||
             regexp_extract(hs, 'pri=>([^,]*)', 1) || '","status":"X"}}' AS js
    FROM h
    """,
)
def hstore_funcs(spark, sf_dir):
    """hstore surface (hstore_op.c): parse text format, ``->`` fetch,
    ``?`` exists, ``-`` delete, ``||`` concat with right-wins override,
    akeys, hstore_to_json (canonical sorted-key form). The DuckDB oracle
    derives every expected value from the same text via string functions
    — independent of the map machinery under test."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 200)
    hs = F.concat(
        F.lit("status=>"), F.col("o_orderstatus"),
        F.lit(", pri=>"), F.col("o_orderpriority"),
        F.lit(", key=>"), F.col("o_orderkey").cast("string"),
    )
    m = hstore.hstore_parse(hs)
    merged = hstore.concat(m, hstore.hstore_parse(F.lit("status=>X")))
    return o.select(
        "o_orderkey",
        hstore.fetch(m, "status").alias("status_val"),
        hstore.exists(m, "pri").alias("has_pri"),
        (~hstore.exists(m, "missing")).alias("no_missing"),
        F.size(F.map_keys(m)).cast("int").alias("n_keys"),
        F.array_join(hstore.akeys(m), ",").alias("keys_csv"),
        F.array_join(hstore.akeys(hstore.delete(m, "pri")), ",").alias(
            "keys_after_del"
        ),
        hstore.fetch(merged, "status").alias("status_after_concat"),
        hstore.to_json_sorted(merged).alias("js"),
    )


_LQ = ltree.lquery_regex("top.*.building")


@query(
    "ltree_funcs",
    oracle=f"""
    WITH p AS (
        SELECT c_custkey,
               lower(regexp_replace(r_name, '[^a-zA-Z0-9]', '_', 'g')) AS rlab,
               lower(regexp_replace(n_name, '[^a-zA-Z0-9]', '_', 'g')) AS nlab,
               lower(c_mktsegment) AS mlab
        FROM customer JOIN nation ON c_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        WHERE c_custkey < 120
    ), q AS (
        SELECT c_custkey, rlab, nlab, mlab,
               'top.' || rlab || '.' || nlab || '.' || mlab AS path
        FROM p
    )
    SELECT a.c_custkey,
           a.path,
           CAST(len(string_split(a.path, '.')) AS INT) AS nlevel,
           array_to_string(string_split(a.path, '.')[2:3], '.') AS sub_1_2,
           CAST(list_position(string_split(a.path, '.'), a.nlab) - 1 AS INT)
             AS idx_nation,
           TRUE AS anc_region,
           ('top.' || a.rlab) = 'top.asia' OR
             starts_with(a.path, 'top.asia.') AS anc_asia,
           concat_ws('.', 'top',
               CASE WHEN a.rlab = b.rlab THEN a.rlab END,
               CASE WHEN a.rlab = b.rlab AND a.nlab = b.nlab THEN a.nlab END,
               CASE WHEN a.rlab = b.rlab AND a.nlab = b.nlab
                         AND a.mlab = b.mlab THEN a.mlab END) AS lca_next,
           regexp_matches(a.path, '{_LQ}') AS lq_building
    FROM q a JOIN q b ON b.c_custkey = a.c_custkey + 1
    """,
)
def ltree_funcs(spark, sf_dir):
    """ltree surface (ltree_op.c): nlevel, subpath, index, ``@>``
    ancestor, lca, and the lquery ``~`` match (label/* subset compiled to
    an anchored regex — lquery_op.c). Paths are built
    top.region.nation.mktsegment; the oracle derives lca from the join
    columns directly, independent of the array machinery."""
    c = t(spark, sf_dir, "customer").where(F.col("c_custkey") < 120)
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")

    def lab(col):
        return F.lower(F.regexp_replace(col, "[^a-zA-Z0-9]", "_"))

    q = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select(
            "c_custkey",
            lab(F.col("r_name")).alias("rlab"),
            lab(F.col("n_name")).alias("nlab"),
            lab(F.col("c_mktsegment")).alias("mlab"),
        )
        .withColumn(
            "path",
            F.concat_ws(".", F.lit("top"), "rlab", "nlab", "mlab"),
        )
    )
    a = q.alias("a")
    b = q.select(
        (F.col("c_custkey") - 1).alias("join_key"), F.col("path").alias("bpath")
    ).alias("b")
    pa, pb = F.col("a.path"), F.col("bpath")
    return (
        a.join(b, F.col("a.c_custkey") == F.col("join_key"))
        .select(
            F.col("a.c_custkey").alias("c_custkey"),
            pa.alias("path"),
            ltree.nlevel(pa).cast("int").alias("nlevel"),
            ltree.subpath(pa, 1, 2).alias("sub_1_2"),
            ltree.index(pa, F.col("a.nlab")).cast("int").alias("idx_nation"),
            ltree.is_ancestor(
                F.concat(F.lit("top."), F.col("a.rlab")), pa
            ).alias("anc_region"),
            ltree.is_ancestor(F.lit("top.asia"), pa).alias("anc_asia"),
            ltree.lca(pa, pb).alias("lca_next"),
            pa.rlike(_LQ).alias("lq_building"),
        )
    )


@query(
    "connectby_tree",
    oracle="""
    WITH RECURSIVE tree AS (
        SELECT CAST(1 AS BIGINT) AS key, 0 AS lvl, '1' AS branch
        UNION ALL
        SELECT c.c_custkey, t.lvl + 1, t.branch || '.' || c.c_custkey
        FROM customer c JOIN tree t
          ON c.c_custkey // 10 = t.key AND c.c_custkey != t.key
        WHERE t.lvl < 3
    )
    SELECT key, CAST(key // 10 AS BIGINT) AS parent, lvl, branch
    FROM tree
    """,
)
def connectby_tree(spark, sf_dir):
    """tablefunc connectby (contrib/tablefunc/tablefunc.c:1102): expand a
    parent/child hierarchy from a start key with level and branch path.
    Edges are synthesized as parent(k) = k div 10 over customer keys (a
    deterministic forest). Realized on the recursive-union fixpoint
    operator (operators/recursive.py — nodeRecursiveunion.c mapping);
    each step is one distributed hash join, no driver-side edges."""
    from gpdb_spark.operators.recursive import recursive_cte

    c = t(spark, sf_dir, "customer").select("c_custkey")
    seed = spark.createDataFrame([(1, 0, "1")], ["key", "lvl", "branch"]).select(
        F.col("key").cast("bigint").alias("key"),
        F.col("lvl").cast("int").alias("lvl"),
        "branch",
    )

    def step(frontier):
        f = frontier.where(F.col("lvl") < 3)
        return (
            c.join(f, (F.col("c_custkey") - (F.col("c_custkey") % 10)) / 10 == F.col("key"))
            .where(F.col("c_custkey") != F.col("key"))
            .select(
                F.col("c_custkey").alias("key"),
                (F.col("lvl") + 1).alias("lvl"),
                F.concat(F.col("branch"), F.lit("."), F.col("c_custkey")).alias(
                    "branch"
                ),
            )
        )

    out = recursive_cte(seed, step, max_iterations=10)
    return out.select(
        "key",
        F.floor(F.col("key") / 10).cast("bigint").alias("parent"),
        "lvl",
        "branch",
    )


@query(
    "intarray_ops",
    oracle="""
    WITH arrs AS (
        SELECT l_orderkey, list_sort(list_distinct(list(l_linenumber))) AS arr
        FROM lineitem WHERE l_orderkey < 200 GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(len(arr) AS INT) AS icount,
           CAST(len(list_intersect(arr, [1, 2, 3])) AS INT) AS n_common,
           CAST(len(list_distinct(list_concat(arr, [1, 2, 3]))) AS INT) AS n_union,
           CAST(len(list_filter(arr, x -> NOT list_contains([1, 2, 3], x))) AS INT)
             AS n_minus,
           CAST(coalesce(list_position(arr, 3), 0) AS INT) AS idx_3,
           len(list_filter([1, 2], x -> NOT list_contains(arr, x))) = 0 AS has_12
    FROM arrs
    """,
)
def intarray_ops(spark, sf_dir):
    """intarray operator set (contrib/intarray/_int_op.c): # (icount),
    & | - set ops, idx, @> containment — over per-order uniq()'d
    linenumber arrays (set semantics, as intarray's uniq(sort()) idiom). All JVM array expressions after one 2-stage collect_list."""
    li = t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 200)
    arrs = li.groupBy("l_orderkey").agg(
        F.array_sort(F.array_distinct(F.collect_list("l_linenumber"))).alias("arr")
    )
    b = F.array(F.lit(1), F.lit(2), F.lit(3))
    return arrs.select(
        "l_orderkey",
        F.size("arr").cast("int").alias("icount"),
        F.size(F.array_intersect("arr", b)).cast("int").alias("n_common"),
        F.size(F.array_union("arr", b)).cast("int").alias("n_union"),
        F.size(F.array_except("arr", b)).cast("int").alias("n_minus"),
        F.array_position("arr", 3).cast("int").alias("idx_3"),
        (F.size(F.array_except(F.array(F.lit(1), F.lit(2)), F.col("arr"))) == 0)
        .alias("has_12"),
    )
