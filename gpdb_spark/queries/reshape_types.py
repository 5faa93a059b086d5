"""Reshape ops (pivot.c / matrix.c analogs) and GPDB-specific types
(complex_type.c, gp_sparse_vector) as oracle-checked queries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gpdb_spark.catalog import spread
from gpdb_spark.registry import fr, query, t
from gpdb_spark.functions import complex as C
from gpdb_spark.functions import svec as SV


@query(
    "unpivot_stack",
    oracle="""
    SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value
    FROM part
    """,
)
def unpivot_stack(spark, sf_dir):
    """UNPIVOT via stack() — the inverse of pivot_accum (pivot.c): wide
    columns to (key, metric, value) rows. Narrow projection reaches the
    scan; no shuffle at all."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.expr(
            "stack(2, 'retailprice', p_retailprice,"
            " 'size', CAST(p_size AS DOUBLE)) AS (metric, value)"
        ),
    )


@query(
    "merge_append_ordered",
    oracle="""
    SELECT * FROM (
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'O'
    ) u
    """,
)
def merge_append_ordered(spark, sf_dir):
    """MergeAppend (nodeMergeAppend.c:159): ordered union of sorted
    branches. Spark needs no streaming merge operator — union + orderBy
    range-partitions the sort; the driver compare is order-insensitive so
    the oracle omits ORDER BY."""
    o = t(spark, sf_dir, "orders")
    f = o.where(F.col("o_orderstatus") == "F").select("o_orderkey", "o_totalprice")
    op = o.where(F.col("o_orderstatus") == "O").select("o_orderkey", "o_totalprice")
    return f.unionAll(op).orderBy("o_orderkey")


@query(
    "matrix_sum_agg",
    oracle="""
    SELECT label, i,
           round(sum(CAST(embedding[i] AS DOUBLE) * 1073741824.0)
                 / 1073741824.0, 6) AS s
    FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) idx
    GROUP BY label, i
    """,
)
def matrix_sum_agg(spark, sf_dir):
    """matrix.c's matrix_add-as-aggregate: element-wise sum of vectors per
    label. Scale path = posexplode to (label, i, v) then a keyed sum —
    fully partial-aggregatable, no per-row UDF, skew-free (keys =
    label x dim)."""
    e = spread(t(spark, sf_dir, "embeddings"))
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "v"))
        .select("label", (F.col("pos") + 1).alias("i"), "v")
        .groupBy("label", "i")
        .agg(
            # order-independent float sum without decimal casts: scaling a
            # float32 by 2^30 makes it an exact double integer (any
            # exponent >= -30), partial sums stay < 2^53, so every
            # accumulation order yields the identical bit pattern in both
            # engines. Decimal(30,15) casts instead hit engine-specific
            # digit-15 rounding of the binary value.
            F.round(
                F.sum(F.col("v").cast("double") * F.lit(1073741824.0))
                / F.lit(1073741824.0),
                6,
            ).alias("s")
        )
    )


@query(
    "complex_arith",
    oracle="""
    SELECT p_partkey,
           round(p_retailprice * p_retailprice - p_size * p_size, 6) AS re,
           round(2 * p_retailprice * p_size, 6) AS im,
           (floor(sqrt(p_retailprice * p_retailprice + p_size * p_size) * 1e6)
               / 1e6) AS modulus
    FROM part
    """,
)
def complex_arith(spark, sf_dir):
    """complex type (complex_type.c) as struct<re,im>: z^2 and |z| for
    z = retailprice + size*i — pure codegen struct arithmetic."""
    p = t(spark, sf_dir, "part")
    z = C.c_make(F.col("p_retailprice"), F.col("p_size").cast("double"))
    z2 = C.c_mul(z, z)
    return p.select(
        "p_partkey",
        F.round(z2["re"], 6).alias("re"),
        F.round(z2["im"], 6).alias("im"),
        fr(C.c_abs(z), 6).alias("modulus"),
    )


@query(
    "svec_sparsify_stats",
    oracle="""
    SELECT vec_id,
           len(list_filter(embedding, x -> abs(x) > 0.5)) AS nnz,
           (floor(sqrt(CAST(
               coalesce(list_sum(list_transform(
                   list_filter(list_transform(embedding,
                                              x -> CAST(x AS DOUBLE)),
                               x -> abs(x) > 0.5),
                   x -> CAST(x * x AS DECIMAL(30,15)))), 0)
               AS DOUBLE)) * 1e6) / 1e6) AS sparse_norm
    FROM embeddings
    """,
)
def svec_sparsify_stats(spark, sf_dir):
    """gp_sparse_vector: sparsify dense embeddings (|x| > 0.5), report
    nnz + l2norm of the sparse form (operators.c:455)."""
    e = spread(t(spark, sf_dir, "embeddings"))
    sv = SV.svec_from_dense(F.col("embedding"), 0.5)
    return e.select(
        "vec_id",
        SV.svec_nnz(sv).alias("nnz"),
        fr(SV.svec_l2norm(sv), 6).alias("sparse_norm"),
    )


@query(
    "range_type_ops",
    # PG range semantics spelled out on explicit lo/hi columns (DuckDB has
    # no PG range type): r1 = [ck-50, ck+50) half-open, r2 = [m, m+80]
    # closed, x = o_orderkey % 120.
    oracle="""
    WITH r AS (
        SELECT o_orderkey,
               o_custkey - 50 AS lo1, o_custkey + 50 AS hi1,
               o_orderkey % 100 AS lo2, o_orderkey % 100 + 80 AS hi2,
               o_orderkey % 120 AS x
        FROM orders WHERE o_orderkey > 0 AND o_orderkey < 500
    )
    SELECT o_orderkey,
           (lo1 <= hi2 AND lo2 < hi1) AS overlaps,
           (lo1 <= x AND x < hi1) AS elem_in,
           (lo1 <= lo2 AND hi1 > hi2) AS contains_r2,
           CASE WHEN lo1 <= hi2 AND lo2 < hi1
                THEN greatest(lo1, lo2) END AS inter_lo,
           CASE WHEN lo1 <= hi2 AND lo2 < hi1
                THEN least(hi1, hi2) END AS inter_hi,
           NOT (lo1 <= hi2 AND lo2 < hi1) AS inter_empty
    FROM r
    """,
)
def range_type_ops(spark, sf_dir):
    """PG range type + operators (rangetypes.c: @> && * lower upper
    isempty) as typed structs with pure JVM expressions
    (functions/ranges.py). Range-keyed JOINs reuse the binned equi-join
    (operators/range_join.py) with these as the residual filter."""
    from gpdb_spark.functions import ranges as R

    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderkey") > 0) & (F.col("o_orderkey") < 500)
    )
    # r11 (guide §7.3 plan cost): the range ops reference their operand
    # struct many times, so inlining range_make/range_intersect trees
    # into every predicate multiplied the expression tree — seconds of
    # driver-side analysis for a 500-row query. Stage the ranges as
    # STRUCT COLUMNS so each op reads cheap field references. Same
    # expressions, same values.
    m = F.col("o_orderkey") % 100
    s1 = o.select(
        "o_orderkey",
        R.range_make(F.col("o_custkey") - 50, F.col("o_custkey") + 50, "[)")
        .alias("r1"),
        R.range_make(m, m + 80, "[]").alias("r2"),
        (F.col("o_orderkey") % 120).alias("x"),
    )
    s2 = s1.select(
        "o_orderkey",
        "r1",
        "r2",
        "x",
        R.range_intersect(F.col("r1"), F.col("r2")).alias("inter"),
    )
    r1, r2, inter = F.col("r1"), F.col("r2"), F.col("inter")
    return s2.select(
        "o_orderkey",
        R.range_overlaps(r1, r2).alias("overlaps"),
        R.range_contains_elem(r1, F.col("x")).alias("elem_in"),
        R.range_contains(r1, r2).alias("contains_r2"),
        R.range_lower(inter).alias("inter_lo"),
        R.range_upper(inter).alias("inter_hi"),
        R.range_is_empty(inter).alias("inter_empty"),
    )


@query(
    "misc_type_funcs",
    # pg_size_pretty replicated with dbsize.c's exact shift arithmetic;
    # inet network/masklen/containment on packed uint32 (network.c);
    # varbit ops on a 12-bit string (varbit.c) — all mirrored as explicit
    # arithmetic in the DuckDB oracle.
    oracle="""
    WITH c AS (
        SELECT c_custkey AS k,
               c_custkey * 987654 AS sz,
               (c_custkey % 200) * 65536 + (c_custkey % 251) * 256 + 17
                   AS addr
        FROM customer WHERE c_custkey > 0 AND c_custkey < 400
    )
    SELECT k,
           CASE
             WHEN sz < 10240 THEN CAST(sz AS VARCHAR) || ' bytes'
             WHEN abs(sz >> 9) < 20480
               THEN CAST(((sz >> 9) + 1) >> 1 AS VARCHAR) || ' kB'
             WHEN abs(sz >> 19) < 20480
               THEN CAST(((sz >> 19) + 1) >> 1 AS VARCHAR) || ' MB'
             WHEN abs(sz >> 29) < 20480
               THEN CAST(((sz >> 29) + 1) >> 1 AS VARCHAR) || ' GB'
             ELSE CAST(((sz >> 39) + 1) >> 1 AS VARCHAR) || ' TB'
           END AS pretty_size,
           CAST((addr >> 24) & 255 AS VARCHAR) || '.' ||
           CAST((addr >> 16) & 255 AS VARCHAR) || '.' ||
           CAST((addr >> 8) & 255 AS VARCHAR) || '.0/24' AS net,
           24 AS net_masklen,
           TRUE AS in_own_net,
           ((addr >> 8) & 16777215) != (((addr + 256) >> 8) & 16777215)
               AS moved_net,
           xor(k & 4095, 2730) AS bits_xor,
           ((k & 4095) >> 11) & 1 AS bit0,
           lpad(bin(k & 4095), 12, '0') AS bstr
    FROM c
    """,
)
def misc_type_funcs(spark, sf_dir):
    """Misc PG types (SURVEY §2.9 tail): pg_size_pretty (dbsize.c exact
    halving), inet network/masklen/containment on IPv4 (network.c),
    varbit &/#/shift/get_bit (varbit.c) — pure JVM expressions
    (functions/misc_types.py), no UDF."""
    from gpdb_spark.functions import misc_types as M

    c = t(spark, sf_dir, "customer").where(
        (F.col("c_custkey") > 0) & (F.col("c_custkey") < 400)
    )
    k = F.col("c_custkey")
    # r11 (guide §7.3 plan cost): the inet helpers re-parse their TEXT
    # argument, so inlining long_to_inet(...) into every operator
    # multiplied the expression tree combinatorially — ~11 s of
    # driver-side analysis for a 400-row query. Staged selects
    # materialize each repeated value as a COLUMN, so every level's tree
    # stays small and analysis is linear. Same expressions, same values.
    s1 = c.select(
        k.alias("k"),
        ((k % 200) * 65536 + (k % 251) * 256 + 17).alias("addr"),
        k.bitwiseAND(F.lit(4095)).alias("bits"),
    )
    s2 = s1.select(
        "k",
        "addr",
        "bits",
        M.long_to_inet(F.col("addr")).alias("host"),  # bare address = /32
        M.long_to_inet(F.col("addr") + 256).alias("moved_host"),
    )
    s3 = s2.select(
        "k",
        "bits",
        "host",
        "moved_host",
        M.inet_network(F.concat(F.col("host"), F.lit("/24"))).alias("net"),
    )
    bits = F.col("bits")
    return s3.select(
        F.col("k"),
        M.pg_size_pretty(F.col("k") * 987654).alias("pretty_size"),
        F.col("net").alias("net"),
        M.inet_masklen(F.col("net")).alias("net_masklen"),
        M.inet_contained_in(F.col("host"), F.col("net")).alias("in_own_net"),
        (~M.inet_contained_in(F.col("moved_host"), F.col("net"))).alias(
            "moved_net"
        ),
        M.bit_xor(bits, F.lit(2730), 12).alias("bits_xor"),
        M.get_bit(bits, 0, 12).alias("bit0"),
        M.bit_to_string(bits, 12).alias("bstr"),
    )


@query(
    "uuid_v3_funcs",
    # deterministic name-based UUID (uuid-ossp uuid_generate_v3 / RFC
    # 4122 v3): the same md5 re-punctuation runs verbatim in DuckDB
    oracle="""
    WITH h AS (
        SELECT doc_id, md5('doc:' || CAST(doc_id AS VARCHAR)) AS hx
        FROM documents WHERE doc_id < 300
    )
    SELECT doc_id,
           substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-3' ||
           substr(hx, 14, 3) || '-' ||
           substr('89ab89ab89ab89ab',
                  strpos('0123456789abcdef', substr(hx, 17, 1)), 1) ||
           substr(hx, 18, 3) || '-' || substr(hx, 21, 12) AS uid,
           TRUE AS valid
    FROM h
    """,
)
def uuid_v3_funcs(spark, sf_dir):
    """uuid type + name-based generation (uuid.c, uuid-ossp v3):
    deterministic md5 UUIDs validated against uuid_in's format."""
    from gpdb_spark.functions import misc_types as M

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    uid = M.uuid_v3(F.concat(F.lit("doc:"), F.col("doc_id").cast("string")))
    return d.select(
        "doc_id", uid.alias("uid"), M.is_uuid(uid).alias("valid")
    )


@query(
    "geometry_ops",
    # oracle re-derives every predicate from coordinate arithmetic; the
    # triangle containment uses the half-plane (cross-product) form as an
    # independent check of the engine's ray-crossing implementation
    oracle="""
    WITH pts AS (
        SELECT c_custkey,
               c_acctbal / 1000.0 AS x,
               (c_custkey % 97) / 10.0 AS y
        FROM customer
    )
    SELECT count(*) AS n,
        CAST(sum(CASE WHEN x <= 6 AND x >= 1 AND y <= 8 AND y >= 1
                      THEN 1 ELSE 0 END) AS BIGINT) AS in_box,
        CAST(sum(CASE WHEN sqrt((x-5)*(x-5) + (y-5)*(y-5)) <= 3
                      THEN 1 ELSE 0 END) AS BIGINT) AS in_circle,
        CAST(sum(CASE WHEN
              (10.0 - 0.0) * (y - 0.0001234567) - (0.0001234567 - 0.0001234567) * (x - 0.0001234567) > 0
          AND (0.0001234567 - 10.0001234567) * (y - 0.0001234567) - (9.0001234567 - 0.0001234567) * (x - 10.0001234567) > 0
          AND (0.0 - 0.0) * (y - 9.0001234567) - (0.0001234567 - 9.0001234567) * (x - 0.0001234567) > 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS in_triangle,
        CAST(round(sum(CAST(sqrt(x*x + y*y) AS DECIMAL(25,6))), 4) AS DOUBLE) AS dist_total
    FROM pts
    """,
)
def geometry_ops(spark, sf_dir):
    """PG geometric types (geo_ops.c): point distance, box @> point,
    circle @> point, polygon @> point (ray-crossing). All struct-based
    JVM expressions — one scan, one 2-stage aggregate, no UDF."""
    from gpdb_spark.functions import geometry as G

    c = t(spark, sf_dir, "customer")
    p = G.point(F.col("c_acctbal") / 1000.0, (F.col("c_custkey") % 97) / 10.0)
    bx = G.box(G.point(F.lit(1.0), F.lit(1.0)), G.point(F.lit(6.0), F.lit(8.0)))
    ci = G.circle(G.point(F.lit(5.0), F.lit(5.0)), F.lit(3.0))
    # vertices offset so no fixture coordinate falls exactly on an edge
    tri = F.array(
        G.point(F.lit(0.0001234567), F.lit(0.0001234567)),
        G.point(F.lit(10.0001234567), F.lit(0.0001234567)),
        G.point(F.lit(0.0001234567), F.lit(9.0001234567)),
    )
    flags = c.select(
        G.box_contains_pt(bx, p).cast("long").alias("in_box"),
        G.circle_contains_pt(ci, p).cast("long").alias("in_circle"),
        G.poly_contains_pt(tri, p).cast("long").alias("in_triangle"),
        G.pt_distance(p, G.point(F.lit(0.0), F.lit(0.0))).alias("dist"),
    )
    return flags.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("in_box").alias("in_box"),
        F.sum("in_circle").alias("in_circle"),
        F.sum("in_triangle").alias("in_triangle"),
        F.round(F.sum(F.col("dist").cast("decimal(25,6)")), 4)
        .cast("double")
        .alias("dist_total"),
    )


@query(
    "money_type_funcs",
    # the oracle reproduces cash_out/cash_in in SQL: integer-part comma
    # grouping + 2-digit cents, then parses its own output back
    oracle="""
    WITH m AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), f AS (
        SELECT cents,
               (CASE WHEN cents < 0 THEN '-' ELSE '' END) || '$' ||
               format('{:,}', abs(cents) // 100) || '.' ||
               lpad(CAST(abs(cents) % 100 AS VARCHAR), 2, '0') AS money_str
        FROM m
    )
    SELECT count(*) AS n,
        CAST(sum(cents) AS BIGINT) AS total_cents,
        CAST(sum(CASE WHEN CAST(round(CAST(regexp_replace(money_str, '[^0-9.]', '', 'g')
                 AS DECIMAL(26,4)) * 100, 0) AS BIGINT)
                 * (CASE WHEN cents < 0 THEN -1 ELSE 1 END) = cents
                 THEN 0 ELSE 1 END) AS BIGINT) AS roundtrip_mismatches,
        CAST(sum(CAST(round(CAST(cents AS DECIMAL(26,6))
                 * CAST(0.075 AS DECIMAL(26,6)), 0) AS BIGINT)) AS BIGINT) AS tax_cents
    FROM f
    """,
)
def money_type_funcs(spark, sf_dir):
    """money type (cash.c): int64-cents storage, cash_out formatting
    ('-$1,234.56'), cash_in parsing, exact money * numeric with
    round-half-up — all integer/decimal column math, no floats."""
    from gpdb_spark.functions.misc_types import money_in, money_mul, money_out

    o = t(spark, sf_dir, "orders")
    m = o.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    ).select(
        "cents",
        money_out(F.col("cents")).alias("money_str"),
    )
    return m.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("total_cents"),
        F.sum(
            F.when(money_in(F.col("money_str")) == F.col("cents"), 0).otherwise(1)
        ).alias("roundtrip_mismatches"),
        F.sum(money_mul(F.col("cents"), F.lit(0.075))).alias("tax_cents"),
    )


@query(
    "xml_funcs",
    # oracle builds the identical SQL/XML serialization with string
    # concatenation and aggregates the original values the engine must
    # recover through real XPath evaluation
    oracle="""
    WITH x AS (
        SELECT n_regionkey, n_nationkey, n_name,
               '<nation key="' || n_nationkey || '"><name>' || n_name ||
               '</name><region>' || n_regionkey || '</region></nation>' AS doc
        FROM nation
    )
    SELECT n_regionkey,
           count(*) AS n_nations,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
           '<names>' || string_agg('<n>' || n_name || '</n>', '' ORDER BY n_name)
               || '</names>' AS names_doc
    FROM x
    GROUP BY n_regionkey
    """,
)
def xml_funcs(spark, sf_dir):
    """xml type (xml.c): XMLELEMENT/XMLFOREST generation with SQL/XML
    escaping, XPath extraction via Spark's JVM xpath builtins, ordered
    XMLAGG. key_sum/names_doc are computed from values recovered out of
    the generated XML, so generation and extraction are both exercised."""
    from gpdb_spark.functions import xml as X

    n = t(spark, sf_dir, "nation")
    docs = n.select(
        "n_regionkey",
        X.xmlelement(
            "nation",
            {"key": F.col("n_nationkey")},
            X.xmlforest(name=F.col("n_name"), region=F.col("n_regionkey")),
        ).alias("doc"),
    ).select(
        "n_regionkey",
        X.xpath_int(F.col("doc"), F.lit("/nation/@key")).alias("xkey"),
        X.xpath_string(F.col("doc"), F.lit("/nation/name")).alias("xname"),
    )
    return docs.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.sum("xkey").alias("key_sum"),
        F.concat(
            F.lit("<names>"),
            X.xmlagg(
                F.concat(F.lit("<n>"), F.col("xname"), F.lit("</n>")),
                order_by=F.col("xname"),
            ),
            F.lit("</names>"),
        ).alias("names_doc"),
    )
