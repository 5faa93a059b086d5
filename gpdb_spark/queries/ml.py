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
    from gpdb_spark.registry import _usum

    l = t(spark, sf_dir, "lineitem")
    x1, x2, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")

    def dsum_d(c):
        # r11: split-long exact sum (registry._usum) — same value as
        # sum(cast(c AS DECIMAL(25,6))) for measures with |c|*1e6 < 2^51
        # (every moment here except y*y; see _usplit's proof).
        return _usum(c).cast("double")

    def dsum_wide(c):
        # y*y reaches ~1.2e10: beyond the 2^51/1e6 primitive-rounding
        # bound, so it keeps the decimal-cast spelling.
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
        dsum_wide(y * y).alias("syy"),
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


def _pagerank_oracle(iters: int = 3) -> str:
    ctes = ["""
    e AS (SELECT DISTINCT 'C' || CAST(o.o_custkey AS VARCHAR) AS src,
                 'S' || CAST(l.l_suppkey AS VARCHAR) AS dst
          FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    nn AS (SELECT count(*) AS n FROM nodes),
    outdeg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
    pr0 AS (SELECT node, floor(1.0 / nn.n * 1e9) / 1e9 AS pr FROM nodes, nn)"""]
    for i in range(1, iters + 1):
        p = i - 1
        ctes.append(f"""
    c{i} AS (SELECT e.dst AS node,
                    CAST(sum(CAST(floor(p.pr / d.deg * 1e12) / 1e12
                                  AS DECIMAL(28,15))) AS DOUBLE) AS contrib
             FROM e JOIN pr{p} p ON p.node = e.src
                    JOIN outdeg d ON d.src = e.src
             GROUP BY e.dst),
    dg{i} AS (SELECT CAST(sum(CAST(p.pr AS DECIMAL(28,15))) AS DOUBLE) AS dm
              FROM pr{p} p LEFT JOIN outdeg d ON d.src = p.node
              WHERE d.src IS NULL),
    pr{i} AS (SELECT n.node,
                     floor(((1.0 - 0.85) / nn.n
                            + 0.85 * (COALESCE(c.contrib, 0.0)
                                      + COALESCE(dg.dm, 0.0) / nn.n)) * 1e9) / 1e9
                       AS pr
              FROM nodes n LEFT JOIN c{i} c ON c.node = n.node, nn, dg{i} dg)""")
    return "WITH" + ",".join(ctes) + f"""
    SELECT node, pr AS pr_rank FROM pr{iters}
    """


@query("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark, sf_dir):
    """PageRank (damping 0.85, 3 power iterations, dangling mass
    redistributed) over the customer->supplier purchase graph — MADlib-
    style in-database graph analytics on the MPP substrate. Exact-decimal
    iteration (operators/graph_rank.py) makes the fixpoint engine-
    reproducible: the oracle unrolls the identical iterations as a CTE
    chain. Per iteration: one dst-keyed shuffle + one broadcast scalar."""
    from gpdb_spark.operators.graph_rank import pagerank

    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    edges = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
    )
    return pagerank(edges, iterations=3).select(
        "node", F.col("rank").alias("pr_rank")
    )


def _logregr_oracle(iters: int = 8) -> str:
    """Unrolled IRLS as a CTE chain: per iteration one full-table moment
    aggregation (floor-12 terms, exact decimal sums — mirroring
    operators/logistic.py) and a Cramer's-rule 3x3 solve. Spark solves
    with numpy LU instead of Cramer; the resulting O(1e-13) coefficient
    differences are absorbed by the floor-6 output granularity, same as
    the libm-ulp noise in exp()."""

    def sums(b: str) -> str:
        return f"""
      SELECT count(*) AS n,
             {_S('w')} AS sw, {_S('w * x1')} AS sw1, {_S('w * x2')} AS sw2,
             {_S('w * x1 * x1')} AS sw11, {_S('w * x1 * x2')} AS sw12,
             {_S('w * x2 * x2')} AS sw22,
             {_S('r')} AS sr, {_S('r * x1')} AS sr1, {_S('r * x2')} AS sr2
      FROM (
        SELECT x1, x2, y, mu * (1.0 - mu) AS w,
               mu * (1.0 - mu) * eta + y - mu AS r
        FROM (
          SELECT x1, x2, y,
                 {b}.c0 + {b}.c1 * x1 + {b}.c2 * x2 AS eta,
                 1.0 / (1.0 + exp(-({b}.c0 + {b}.c1 * x1 + {b}.c2 * x2))) AS mu
          FROM feats, {b}
        ) e
      ) t"""

    solve = """
      SELECT n,
             ( sr  * (sw11 * sw22 - sw12 * sw12)
             - sw1 * (sr1 * sw22 - sw12 * sr2)
             + sw2 * (sr1 * sw12 - sw11 * sr2)) / det AS c0,
             ( sw  * (sr1 * sw22 - sw12 * sr2)
             - sr  * (sw1 * sw22 - sw12 * sw2)
             + sw2 * (sw1 * sr2 - sr1 * sw2)) / det AS c1,
             ( sw  * (sw11 * sr2 - sr1 * sw12)
             - sw1 * (sw1 * sr2 - sr1 * sw2)
             + sr  * (sw1 * sw12 - sw11 * sw2)) / det AS c2
      FROM (SELECT *,
              sw  * (sw11 * sw22 - sw12 * sw12)
            - sw1 * (sw1 * sw22 - sw12 * sw2)
            + sw2 * (sw1 * sw12 - sw11 * sw2) AS det FROM {S}) d"""

    ctes = ["""
    feats AS (
      SELECT CAST(l_quantity AS DOUBLE) AS x1, CAST(l_discount AS DOUBLE) AS x2,
             CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
      FROM lineitem),
    b0 AS (SELECT CAST(0 AS BIGINT) AS n, 0.0 AS c0, 0.0 AS c1, 0.0 AS c2),"""]
    for i in range(1, iters + 1):
        ctes.append(f"\n    s{i} AS ({sums(f'b{i-1}')}),")
        ctes.append(f"\n    b{i} AS ({solve.replace('{S}', f's{i}')})")
        if i < iters:
            ctes[-1] += ","
    b = f"b{iters}"
    ll = (
        f"SELECT {_S('y * eta - ln(1.0 + exp(eta))')} AS v FROM ("
        f"SELECT y, {b}.c0 + {b}.c1 * x1 + {b}.c2 * x2 AS eta"
        f" FROM feats, {b}) z"
    )
    return ("WITH" + "".join(ctes) + f""",
    ll AS ({ll})
    SELECT term, floor(est * 1e6) / 1e6 AS estimate, {b}.n AS n
    FROM (
      SELECT 'intercept' AS term, {b}.c0 AS est FROM {b}
      UNION ALL SELECT 'l_quantity', {b}.c1 FROM {b}
      UNION ALL SELECT 'l_discount', {b}.c2 FROM {b}
      UNION ALL SELECT 'log_likelihood', ll.v FROM ll
    ) o, {b}
    """)


def _S(expr: str) -> str:
    """floor-12 term, exact decimal sum, back to double (mirrors
    operators/logistic.py dsum)."""
    return (
        f"CAST(sum(CAST(floor(({expr}) * 1e12) / 1e12"
        f" AS DECIMAL(30,15))) AS DOUBLE)"
    )


@query("logregr_irls", oracle=_logregr_oracle())
def logregr_irls(spark, sf_dir):
    """Logistic regression P(l_returnflag='R' | quantity, discount) by
    IRLS (operators/logistic.py) — the iterative half of the in-database
    ML pair next to linregr_multi. ORACLED: the 8 Newton steps are
    unrolled as DuckDB CTEs (same floored-decimal moment sums, Cramer
    solve); floor-6 outputs absorb the numpy-vs-Cramer and libm-ulp
    noise. tests/test_ml.py additionally checks the fit against a
    pure-numpy IRLS and that the gradient at the optimum vanishes."""
    from gpdb_spark.operators.logistic import logistic_irls

    l = t(spark, sf_dir, "lineitem").withColumn(
        "is_return", (F.col("l_returnflag") == "R").cast("int")
    )
    coefs, ll, n = logistic_irls(l, "is_return", ["l_quantity", "l_discount"])
    rows = [
        ("intercept", coefs[0]),
        ("l_quantity", coefs[1]),
        ("l_discount", coefs[2]),
        ("log_likelihood", ll),
    ]
    import math

    return spark.createDataFrame(
        [(term, math.floor(v * 1e6) / 1e6, n) for term, v in rows],
        "term string, estimate double, n long",
    )


def _kmeans_oracle(k: int = 16, iters: int = 2) -> str:
    idx = "(SELECT unnest(generate_series(1, 64)) AS i) idx"
    ctes = [f"""
    el AS (SELECT vec_id AS vid, i,
                  CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, {idx}),
    cent0 AS (SELECT vid AS cid, i, floor(x * 1e9) / 1e9 AS val
              FROM el WHERE vid IN
                (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k}))"""]
    for it in range(1, iters + 1):
        p = it - 1
        ctes.append(f"""
    d{it} AS (SELECT e.vid, c.cid,
                     CAST(sum(CAST(floor((e.x - c.val) * (e.x - c.val) * 1e12)
                                   / 1e12 AS DECIMAL(30,15))) AS DOUBLE) AS dist
              FROM el e JOIN cent{p} c ON c.i = e.i
              GROUP BY e.vid, c.cid),
    a{it} AS (SELECT vid, cid FROM (
                SELECT vid, cid,
                       row_number() OVER (PARTITION BY vid
                                          ORDER BY dist, cid) AS r
                FROM d{it}) x WHERE r = 1),
    cent{it} AS (SELECT a.cid, e.i,
                        floor(CAST(sum(CAST(e.x AS DECIMAL(30,15))) AS DOUBLE)
                              / count(*) * 1e9) / 1e9 AS val
                 FROM a{it} a JOIN el e ON e.vid = a.vid
                 GROUP BY a.cid, e.i)""")
    return "WITH" + ",".join(ctes) + f"""
    SELECT vid AS vec_id, cid AS cluster FROM a{iters}
    """


@query("kmeans_lloyd", oracle=_kmeans_oracle())
def kmeans_lloyd(spark, sf_dir):
    """Lloyd's k-means (k=16, 2 rounds, deterministic lowest-id init) on
    the embeddings — ORACLED iterative clustering: exact-decimal
    centroids and distances (operators/kmeans.py) make every round
    engine-reproducible, so DuckDB re-runs the identical iterations as
    an unrolled CTE chain. Long-form (vec, dim, value) layout — the MPP
    shape with no arrays in the hot path and the centroid relation
    broadcast."""
    from gpdb_spark.operators.kmeans import kmeans_assign

    e = t(spark, sf_dir, "embeddings")
    return kmeans_assign(e, k=16, iterations=2)
