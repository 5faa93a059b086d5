"""Vector-similarity queries over the embeddings fixture (north-star
operators; maps gp_sparse_vector svec_dot/l2norm —
gpcontrib/gp_sparse_vector/operators.c:144,455 — onto array<float>).

Determinism note: the oracle-checked queries compute dot products /
norms through exact DECIMAL(30,15) sums of per-element double products
(order-independent, engine-identical); the fast float fold
(datapipe.similarity.dot) is used by the rows-only ANN query and is
validated against brute force in tests/test_datapipe.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gpdb_spark.catalog import spread
from gpdb_spark.registry import fr, query, t

DIM = 64
DEC30 = "decimal(30,15)"
IDX = "(SELECT unnest(generate_series(1, 64)) AS i) idx"


def _dec_dot(a, b):
    """Exact decimal dot product of two double arrays (order-independent)."""
    prods = F.zip_with(
        a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(DEC30)
    )
    return F.aggregate(
        prods,
        F.lit(0).cast(DEC30),
        lambda acc, v: (acc + v).cast(DEC30),
    )


def _dec_norm(a):
    return F.sqrt(_dec_dot(a, a).cast("double"))


@query(
    "embed_norms",
    oracle=f"""
    SELECT vec_id, label,
           (floor(sqrt(CAST(sum(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) AS DECIMAL(30,15)))
                           AS DOUBLE)) * 1e6) / 1e6) AS l2norm
    FROM embeddings, {IDX}
    GROUP BY vec_id, label
    """,
)
def embed_norms(spark, sf_dir):
    """l2norm per vector (operators.c:455) via exact decimal sum of
    squares."""
    e = spread(t(spark, sf_dir, "embeddings"))
    return e.select(
        "vec_id",
        "label",
        fr(_dec_norm(F.col("embedding")), 6).alias("l2norm"),
    )


@query(
    "embed_cosine_pairs",
    oracle=f"""
    WITH norms AS (
        SELECT vec_id,
               sqrt(CAST(sum(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) AS DECIMAL(30,15)))
                         AS DOUBLE)) AS nrm
        FROM embeddings, {IDX}
        GROUP BY vec_id
    ), dots AS (
        SELECT a.vec_id AS a, b.vec_id AS b, a.label AS label,
               CAST(sum(CAST(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) AS DECIMAL(30,15)))
                    AS DOUBLE) AS dp
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id, {IDX}
        GROUP BY a.vec_id, b.vec_id, a.label
    )
    SELECT d.a, d.b, d.label,
           (floor(d.dp / (na.nrm * nb.nrm) * 1e5) / 1e5) AS cos
    FROM dots d JOIN norms na ON na.vec_id = d.a JOIN norms nb ON nb.vec_id = d.b
    WHERE (floor(d.dp / (na.nrm * nb.nrm) * 1e5) / 1e5) >= 0.3
    """,
)
def embed_cosine_pairs(spark, sf_dir):
    """Within-label cosine-similar pairs (>= 0.3) — the blocked similarity
    join: label is the blocking key, so the pair space is per-block, not
    corpus-squared."""
    from gpdb_spark.datapipe.similarity import dot as _ddot

    e = spread(t(spark, sf_dir, "embeddings"))
    # r11 (guide §1.2): norms are computed ONCE per vector and carried
    # through the pair join (the two norm re-joins are gone), and the
    # exact decimal dot runs only on pairs whose cheap primitive-double
    # cosine clears 0.3 minus a band that provably covers the double
    # fold's error (see similarity.semdedup_prune — same argument; the
    # exact floor-5 filter below stays authoritative, so a false band
    # survivor is still dropped by exactly the old predicate).
    a = e.select(
        F.col("vec_id").alias("a"), F.col("label"),
        F.col("embedding").alias("va"),
        _dec_norm(F.col("embedding")).alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("b"),
        F.col("label").alias("lb"),
        F.col("embedding").alias("vb"),
        _dec_norm(F.col("embedding")).alias("nb"),
    )
    np_ = F.col("na") * F.col("nb")
    dcos = _ddot(F.col("va"), F.col("vb")) / np_
    return (
        a.join(b, (a.label == b.lb) & (F.col("a") < F.col("b")))
        .where(dcos >= F.lit(0.3) - (F.lit(2e-5) + F.lit(1e-10) / np_))
        .withColumn("dp", _dec_dot(F.col("va"), F.col("vb")).cast("double"))
        .withColumn("cos", fr(F.col("dp") / np_, 5))
        .where(F.col("cos") >= 0.3)
        .select("a", "b", "label", "cos")
    )


# exact top-5 oracle, shared by the JVM-expression and the BLAS-blocked
# formulations (the blocked path exact-rescores its winners, so both
# produce identical rounded values)
_ANN_TOPK_ORACLE = f"""
    WITH norms AS (
        SELECT vec_id,
               sqrt(CAST(sum(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) AS DECIMAL(30,15)))
                         AS DOUBLE)) AS nrm
        FROM embeddings, {IDX}
        GROUP BY vec_id
    ), dots AS (
        SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
               CAST(sum(CAST(CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE) AS DECIMAL(30,15)))
                    AS DOUBLE) AS dp
        FROM embeddings q
        JOIN embeddings c ON q.vec_id < 20 AND c.vec_id <> q.vec_id, {IDX}
        GROUP BY q.vec_id, c.vec_id
    ), scored AS (
        SELECT query_id, corpus_id,
               (floor(dp / (nq.nrm * nc.nrm) * 1e6) / 1e6) AS cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY (floor(dp / (nq.nrm * nc.nrm) * 1e6) / 1e6) DESC,
                                           corpus_id) AS rnk
        FROM dots JOIN norms nq ON nq.vec_id = query_id
                  JOIN norms nc ON nc.vec_id = corpus_id
    )
    SELECT query_id, corpus_id, cos, rnk FROM scored WHERE rnk <= 5
    """


@query("embed_ann_topk", oracle=_ANN_TOPK_ORACLE)
def embed_ann_topk(spark, sf_dir):
    """Exact cosine top-5 for a broadcast query set (vec_id < 20) — the
    brute-force ANN baseline: corpus scanned once, per-query window
    top-k, no corpus shuffle."""
    e = spread(t(spark, sf_dir, "embeddings"))
    norms = e.select(
        F.col("vec_id").alias("nid"), _dec_norm(F.col("embedding")).alias("nrm")
    )
    q = e.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = e.select(F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("corpus_id") != F.col("query_id"))
        .select(
            "query_id",
            "corpus_id",
            _dec_dot(F.col("qv"), F.col("cv")).cast("double").alias("dp"),
        )
        .join(
            F.broadcast(norms.withColumnRenamed("nid", "query_id").withColumnRenamed("nrm", "nq")),
            "query_id",
        )
        .join(norms.withColumnRenamed("nid", "corpus_id").withColumnRenamed("nrm", "nc"), "corpus_id")
        .withColumn("cos", fr(F.col("dp") / (F.col("nq") * F.col("nc")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("corpus_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select("query_id", "corpus_id", "cos", "rnk")
    )


@query(
    "embed_centroids",
    oracle=f"""
    SELECT label, i AS dim,
           (floor(CAST(sum(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(30,15))) AS DOUBLE)
                 / count(*) * 1e6) / 1e6) AS centroid
    FROM embeddings, {IDX}
    GROUP BY label, i
    """,
)
def embed_centroids(spark, sf_dir):
    """Per-label centroid (dim-wise mean) via posexplode + exact decimal
    sums — the reduce side of k-means/IVF coarse quantization."""
    e = spread(t(spark, sf_dir, "embeddings"))
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg(
            fr(
                F.sum(F.col("val").cast(DEC30)).cast("double") / F.count(F.lit(1)),
                6,
            ).alias("centroid")
        )
    )


@query(
    "embed_ann_lsh",
    oracle=f"""
    WITH planes AS (
      SELECT tbl, p, i,
             CASE WHEN (strpos('0123456789abcdef',
                   substr(md5(CAST(tbl * 1000 + p AS VARCHAR) || ':'
                              || CAST(i AS VARCHAR)), 1, 1)) - 1) % 2 = 0
                  THEN 1.0 ELSE -1.0 END AS s
      FROM generate_series(0, 15) t(tbl),
           generate_series(0, 3) pp(p),
           generate_series(0, 63) ii(i)
    ),
    proj AS (
      SELECT e.vec_id, pl.tbl, pl.p,
             CAST(sum(CAST(pl.s * CAST(e.embedding[CAST(pl.i AS INT) + 1] AS DOUBLE)
                           AS DECIMAL(30,15))) AS DOUBLE) AS d
      FROM embeddings e, planes pl
      GROUP BY e.vec_id, pl.tbl, pl.p
    ),
    buck AS (
      SELECT vec_id, tbl,
             CAST(sum(CASE WHEN d >= 0
                           THEN CAST(power(2, 3 - p) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS bucket
      FROM proj GROUP BY vec_id, tbl
    ),
    cand AS (
      SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS corpus_id
      FROM buck qb JOIN buck cb ON qb.tbl = cb.tbl AND qb.bucket = cb.bucket
      WHERE qb.vec_id < 20 AND cb.vec_id <> qb.vec_id
    ),
    norms AS (
        SELECT vec_id,
               sqrt(CAST(sum(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) AS DECIMAL(30,15)))
                         AS DOUBLE)) AS nrm
        FROM embeddings, {IDX}
        GROUP BY vec_id
    ),
    dots AS (
      SELECT c.query_id, c.corpus_id,
             CAST(sum(CAST(CAST(q.embedding[i] AS DOUBLE) * CAST(co.embedding[i] AS DOUBLE) AS DECIMAL(30,15)))
                  AS DOUBLE) AS dp
      FROM cand c
      JOIN embeddings q ON q.vec_id = c.query_id
      JOIN embeddings co ON co.vec_id = c.corpus_id, {IDX}
      GROUP BY c.query_id, c.corpus_id
    ),
    scored AS (
      SELECT query_id, corpus_id,
             (floor(dp / (nq.nrm * nc.nrm) * 1e6) / 1e6) AS cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY (floor(dp / (nq.nrm * nc.nrm) * 1e6) / 1e6) DESC,
                                         corpus_id) AS rnk
      FROM dots JOIN norms nq ON nq.vec_id = query_id
                JOIN norms nc ON nc.vec_id = corpus_id
    )
    SELECT query_id, corpus_id, cos, rnk FROM scored WHERE rnk <= 5
    """,
)
def embed_ann_lsh(spark, sf_dir):
    """Approximate top-5 via signed-random-projection LSH (16 tables x 4
    hyperplanes) with exact re-rank of candidates. ORACLED (was
    rows-only): the portable md5-parity plane family
    (similarity.portable_plane, seed tbl*1000+p) plus exact DECIMAL
    projections make bucket assignment engine-reproducible — DuckDB
    re-derives every plane from md5, every bucket, the candidate set,
    and the exact cosine re-rank. Recall vs brute force asserted in
    tests/test_datapipe.py. Cost ~ bucket collisions, not corpus size;
    on *random* embeddings neighbors are weak so wide tables are
    needed — clustered real embeddings get the same recall with far
    fewer probes."""
    from gpdb_spark.datapipe.similarity import lsh_topk

    e = spread(t(spark, sf_dir, "embeddings"))
    q = e.where(F.col("vec_id") < 20)
    return lsh_topk(e, q, k=5, dim=DIM, tables=16, planes_per_table=4,
                    portable=True)


def _ivf_trained_oracle(
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 8,
    iters: int = 2,
    sample: int = 256,
) -> str:
    """DuckDB re-derivation of the TRAINED IVF index: md5-ordered
    sample, the unrolled Lloyd rounds (same floor discipline as
    queries/ml._kmeans_oracle), full-corpus cell assignment, probe,
    exact-decimal cosine re-rank (same tail as embed_ann_ivf_flat)."""
    dist = (
        "CAST(sum(CAST(floor((e.x - c.val) * (e.x - c.val) * 1e12) / 1e12"
        " AS DECIMAL(30,15))) AS DOUBLE)"
    )
    ctes = [f"""
    el AS (SELECT vec_id AS vid, i, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, {IDX}),
    samp AS (SELECT vec_id AS vid, md5(CAST(vec_id AS VARCHAR)) AS h
             FROM embeddings ORDER BY h, vid LIMIT {sample}),
    els AS (SELECT e.vid, e.i, e.x FROM el e JOIN samp s ON s.vid = e.vid),
    init AS (SELECT vid FROM samp ORDER BY h, vid LIMIT {n_centroids}),
    cent0 AS (SELECT vid AS cid, i, floor(x * 1e9) / 1e9 AS val
              FROM els WHERE vid IN (SELECT vid FROM init))"""]
    for it in range(1, iters + 1):
        p = it - 1
        ctes.append(f"""
    d{it} AS (SELECT e.vid, c.cid, {dist} AS dist
              FROM els e JOIN cent{p} c ON c.i = e.i
              GROUP BY e.vid, c.cid),
    a{it} AS (SELECT vid, cid FROM (
                SELECT vid, cid,
                       row_number() OVER (PARTITION BY vid
                                          ORDER BY dist, cid) AS r
                FROM d{it}) x WHERE r = 1),
    cent{it} AS (SELECT a.cid, e.i,
                        floor(CAST(sum(CAST(e.x AS DECIMAL(30,15))) AS DOUBLE)
                              / count(*) * 1e9) / 1e9 AS val
                 FROM a{it} a JOIN els e ON e.vid = a.vid
                 GROUP BY a.cid, e.i)""")
    ctes.append(f"""
    dc AS (SELECT e.vid, c.cid, {dist} AS dist
           FROM el e JOIN cent{iters} c ON c.i = e.i
           GROUP BY e.vid, c.cid),
    rc AS (SELECT vid, cid,
                  row_number() OVER (PARTITION BY vid
                                     ORDER BY dist, cid) AS r
           FROM dc),
    c_cell AS (SELECT vid AS corpus_id, cid FROM rc WHERE r = 1),
    q_cell AS (SELECT vid AS query_id, cid FROM rc
               WHERE r <= {n_probe} AND vid < 20),
    norms AS (
      SELECT vec_id,
             sqrt(CAST(sum(CAST(CAST(embedding[i] AS DOUBLE)
                                * CAST(embedding[i] AS DOUBLE)
                                AS DECIMAL(30,15))) AS DOUBLE)) AS nrm
      FROM embeddings, {IDX}
      GROUP BY vec_id),
    cand AS (
      SELECT q.query_id, c.corpus_id
      FROM q_cell q JOIN c_cell c ON q.cid = c.cid
                                 AND c.corpus_id <> q.query_id),
    dots AS (
      SELECT cd.query_id, cd.corpus_id,
             CAST(sum(CAST(CAST(q.embedding[i] AS DOUBLE)
                           * CAST(co.embedding[i] AS DOUBLE)
                           AS DECIMAL(30,15))) AS DOUBLE) AS dp
      FROM cand cd
      JOIN embeddings q ON q.vec_id = cd.query_id
      JOIN embeddings co ON co.vec_id = cd.corpus_id, {IDX}
      GROUP BY cd.query_id, cd.corpus_id),
    scored AS (
      SELECT query_id, corpus_id,
             (floor(dp / (nq.nrm * nc.nrm) * 1e6) / 1e6) AS cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY (floor(dp / (nq.nrm * nc.nrm) * 1e6) / 1e6) DESC,
                                         corpus_id) AS rnk
      FROM dots JOIN norms nq ON nq.vec_id = query_id
                JOIN norms nc ON nc.vec_id = corpus_id)""")
    return (
        "WITH" + ",".join(ctes)
        + f" SELECT query_id, corpus_id, cos, rnk FROM scored WHERE rnk <= {k}"
    )


@query("embed_ann_ivf", oracle=_ivf_trained_oracle())
def embed_ann_ivf(spark, sf_dir):
    """IVF ANN top-5 with a TRAINED coarse quantizer — ORACLED (was
    rows-only): the numpy-RandomState training sample is replaced by
    the portable md5-ordered sample and exact-decimal Lloyd rounds
    (similarity.ivf_topk_trained_portable), so DuckDB re-derives the
    training, the inverted lists, the probes, and the re-rank end to
    end. The numpy fast path (similarity.ivf_topk, BLAS training) stays
    available and recall-tested in tests/test_datapipe.py."""
    from pyspark.sql import functions as F

    from gpdb_spark.datapipe.similarity import ivf_topk_trained_portable

    e = spread(t(spark, sf_dir, "embeddings"))
    q = e.where(F.col("vec_id") < 20)
    return ivf_topk_trained_portable(
        e, q, k=5, n_centroids=16, n_probe=8, iters=2, sample_size=256
    )


@query("embed_ann_topk_blocked", oracle=_ANN_TOPK_ORACLE)
def embed_ann_topk_blocked(spark, sf_dir):
    """Exact cosine top-5 via Arrow-batched BLAS block multiply with
    per-batch local pruning (datapipe/similarity.py
    brute_force_topk_blocked) — ~4x the JVM-expression formulation here
    and the shape that holds at 10^9 vectors (candidates shrink from
    |corpus|*|q| to n_batches*k*|q| before the only shuffle).

    ORACLED (was rows-only): BLAS float reduction order makes 6-digit
    rounding unstable at score boundaries, so the BLAS pass is used
    only for *pruning* — it keeps k+2 candidates per query (the buffer
    absorbs any boundary flip), and the kept ~|q|*(k+2) rows are
    re-scored with the exact order-independent DECIMAL dot/norm fold
    (identical to the oracle's arithmetic) and re-ranked to k. The
    exact re-score touches only the winner set: two broadcast joins +
    per-row O(dim) folds over ~140 rows — negligible against the
    corpus scan, and the result is value-identical to embed_ann_topk."""
    from gpdb_spark.datapipe.similarity import brute_force_topk_blocked

    e = spread(t(spark, sf_dir, "embeddings"))
    q = e.where(F.col("vec_id") < 20)
    # one corpus pass: the BLAS pruner emits each surviving candidate
    # WITH its vector, so the exact re-score never rejoins the corpus
    cand = brute_force_topk_blocked(e, q, k=7, emit_vectors=True)
    # trim to the global top-(k+2) on the BLAS score FIRST so the exact
    # decimal folds run over ~|q|*(k+2) rows, not every batch candidate
    w0 = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("corpus_id"))
    cand = (
        cand.withColumn("brnk", F.row_number().over(w0))
        .where(F.col("brnk") <= 7)
        .drop("brnk", "cos")
    )
    qv = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        _dec_norm(F.col("embedding")).alias("nq"),
    )
    scored = cand.join(F.broadcast(qv), "query_id").select(
        "query_id",
        "corpus_id",
        fr(
            _dec_dot(F.col("qv"), F.col("cv")).cast("double")
            / (F.col("nq") * _dec_norm(F.col("cv"))),
            6,
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("corpus_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select("query_id", "corpus_id", "cos", "rnk")
    )


@query(
    "embed_neardup_clusters",
    # The exact cosine-threshold pair graph is deterministic (decimal dot
    # products, round-5 threshold — same discipline as embed_cosine_pairs)
    # and connected components IS SQL-expressible as a recursive CTE:
    # reach(id, comp) = every node reaches itself ∪ step across edges;
    # component = min reachable id — exactly components_from_edges'
    # min-label fixpoint.
    oracle=f"""
    WITH RECURSIVE norms AS (
        SELECT vec_id,
               sqrt(CAST(sum(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) AS DECIMAL(30,15)))
                         AS DOUBLE)) AS nrm
        FROM embeddings, {IDX}
        GROUP BY vec_id
    ), dots AS (
        SELECT a.vec_id AS a, b.vec_id AS b,
               CAST(sum(CAST(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) AS DECIMAL(30,15)))
                    AS DOUBLE) AS dp
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id, {IDX}
        GROUP BY a.vec_id, b.vec_id
    ), pairs AS (
        SELECT d.a, d.b
        FROM dots d
        JOIN norms na ON na.vec_id = d.a
        JOIN norms nb ON nb.vec_id = d.b
        WHERE (floor(d.dp / (na.nrm * nb.nrm) * 1e5) / 1e5) >= 0.35
    ), edges AS (
        SELECT a AS u, b AS v FROM pairs
        UNION
        SELECT b AS u, a AS v FROM pairs
    ), reach(id, comp) AS (
        SELECT vec_id, vec_id FROM embeddings
        UNION
        SELECT e.u, r.comp FROM edges e JOIN reach r ON r.id = e.v
    )
    SELECT id AS vec_id, min(comp) AS component
    FROM reach
    GROUP BY id
    """,
)
def embed_neardup_clusters(spark, sf_dir):
    """Embedding-cosine near-duplicate CLUSTERS: cosine >= 0.35 pair
    graph (label-blocked, so the pair space is per-block rather than
    corpus-squared; at web scale the blocking key comes from SRP-LSH
    buckets — similarity.srp_buckets — instead of a label column)
    -> connected components by min-label propagation
    (datapipe/graph.py). Returns (vec_id, component); a training
    pipeline keeps one representative per component. Oracled: the
    fixpoint is a DuckDB recursive CTE (reach = transitive closure,
    component = min reachable id); pytest additionally checks union-find
    parity (test_datapipe.py)."""
    from gpdb_spark.datapipe.graph import components_from_edges
    from gpdb_spark.registry import QUERIES

    pairs = QUERIES["embed_cosine_pairs"](spark, sf_dir).where(
        F.col("cos") >= 0.35
    )
    nodes = t(spark, sf_dir, "embeddings").select("vec_id")
    return components_from_edges(
        nodes, pairs, id_col="vec_id", a_col="a", b_col="b"
    )


@query(
    "embed_ann_ivf_flat",
    oracle=f"""
    WITH norms AS (
      SELECT vec_id,
             sqrt(CAST(sum(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) AS DECIMAL(30,15)))
                       AS DOUBLE)) AS nrm
      FROM embeddings, {IDX}
      GROUP BY vec_id
    ),
    sims AS (
      SELECT d.vec_id, d.cid,
             d.dp / (nv.nrm * nc.nrm) AS sim
      FROM (
        SELECT e.vec_id, c.vec_id AS cid,
               CAST(sum(CAST(CAST(e.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)
                             AS DECIMAL(30,15))) AS DOUBLE) AS dp
        FROM embeddings e
        JOIN embeddings c
          ON c.vec_id IN (SELECT vec_id FROM embeddings
                          ORDER BY vec_id LIMIT 16), {IDX}
        GROUP BY e.vec_id, c.vec_id
      ) d
      JOIN norms nv ON nv.vec_id = d.vec_id
      JOIN norms nc ON nc.vec_id = d.cid
    ),
    ranked AS (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY sim DESC, cid) AS r
      FROM sims
    ),
    c_cell AS (SELECT vec_id AS corpus_id, cid FROM ranked WHERE r = 1),
    q_cell AS (SELECT vec_id AS query_id, cid FROM ranked
               WHERE r <= 8 AND vec_id < 20),
    cand AS (
      SELECT q.query_id, c.corpus_id
      FROM q_cell q JOIN c_cell c ON q.cid = c.cid
                                 AND c.corpus_id <> q.query_id
    ),
    dots AS (
      SELECT cd.query_id, cd.corpus_id,
             CAST(sum(CAST(CAST(q.embedding[i] AS DOUBLE)
                           * CAST(co.embedding[i] AS DOUBLE)
                           AS DECIMAL(30,15))) AS DOUBLE) AS dp
      FROM cand cd
      JOIN embeddings q ON q.vec_id = cd.query_id
      JOIN embeddings co ON co.vec_id = cd.corpus_id, {IDX}
      GROUP BY cd.query_id, cd.corpus_id
    ),
    scored AS (
      SELECT query_id, corpus_id,
             (floor(dp / (nq.nrm * nc.nrm) * 1e6) / 1e6) AS cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY (floor(dp / (nq.nrm * nc.nrm) * 1e6) / 1e6) DESC,
                                         corpus_id) AS rnk
      FROM dots JOIN norms nq ON nq.vec_id = query_id
                JOIN norms nc ON nc.vec_id = corpus_id
    )
    SELECT query_id, corpus_id, cos, rnk FROM scored WHERE rnk <= 5
    """,
)
def embed_ann_ivf_flat(spark, sf_dir):
    """IVF ANN with the deterministic untrained coarse quantizer
    (similarity.ivf_topk_flat): centroids = 16 lowest-id vectors, exact
    decimal cell assignment, 8-probe candidate join, exact re-rank —
    every step engine-reproducible, so the inverted-list search shape
    itself is oracle-checked. Complements embed_ann_ivf (trained
    k-means centroids, rows-only) the way
    dedup_minhash_clusters (portable family) complements its fast path."""
    from gpdb_spark.datapipe.similarity import ivf_topk_flat

    e = spread(t(spark, sf_dir, "embeddings"))
    q = e.where(F.col("vec_id") < 20)
    return ivf_topk_flat(e, q, k=5, n_centroids=16, n_probe=8)


def _srp_planes_values(planes: int, dim: int) -> str:
    """The portable SRP hyperplanes (similarity.portable_plane, seeds
    0..planes-1) as a DuckDB VALUES list — inlining the md5-parity
    family as literals is constant folding, not a third hash family."""
    from gpdb_spark.datapipe.similarity import portable_plane

    rows = []
    for p in range(planes):
        s = ", ".join(
            "1.0" if x > 0 else "-1.0" for x in portable_plane(p, dim)
        )
        rows.append(f"({p}, [{s}])")
    return ", ".join(rows)


@query(
    "embed_semdedup",
    oracle=f"""
    WITH planes(p, s) AS (VALUES {_srp_planes_values(4, DIM)}),
    norms AS (
        SELECT vec_id,
               sqrt(CAST(sum(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) AS DECIMAL(30,15)))
                         AS DOUBLE)) AS nrm
        FROM embeddings, {IDX}
        GROUP BY vec_id
    ),
    projs AS (
        SELECT e.vec_id, pl.p,
               CAST(sum(CAST(CAST(e.embedding[i] AS DOUBLE) * pl.s[i] AS DECIMAL(30,15)))
                    AS DOUBLE) AS proj
        FROM embeddings e JOIN norms n USING (vec_id), planes pl, {IDX}
        WHERE n.nrm > 0
        GROUP BY e.vec_id, pl.p
    ),
    bucketed AS (
        SELECT vec_id,
               CAST(sum(CASE WHEN proj >= 0
                             THEN (CASE p WHEN 0 THEN 8 WHEN 1 THEN 4
                                          WHEN 2 THEN 2 ELSE 1 END)
                             ELSE 0 END) AS BIGINT) AS bucket
        FROM projs GROUP BY vec_id
    ),
    units AS (
        SELECT e.vec_id, b.bucket, i,
               CAST(e.embedding[i] AS DOUBLE) / n.nrm AS u
        FROM embeddings e JOIN norms n USING (vec_id)
                          JOIN bucketed b USING (vec_id), {IDX}
        WHERE n.nrm > 0
    ),
    cents AS (
        SELECT bucket, i,
               CAST(sum(CAST(u AS DECIMAL(30,15))) AS DOUBLE) / count(*) AS cv
        FROM units GROUP BY bucket, i
    ),
    centnorm AS (
        SELECT bucket,
               sqrt(CAST(sum(CAST(cv * cv AS DECIMAL(30,15))) AS DOUBLE)) AS cn
        FROM cents GROUP BY bucket
    ),
    cosc AS (
        SELECT b.vec_id, b.bucket,
               floor(CAST(sum(CAST(CAST(e.embedding[c.i] AS DOUBLE) * c.cv AS DECIMAL(30,15)))
                          AS DOUBLE) / (n.nrm * cn.cn) * 1e6) / 1e6 AS cosc
        FROM embeddings e
        JOIN bucketed b USING (vec_id)
        JOIN norms n USING (vec_id)
        JOIN cents c ON c.bucket = b.bucket
        JOIN centnorm cn ON cn.bucket = b.bucket
        GROUP BY b.vec_id, b.bucket, n.nrm, cn.cn
    ),
    ranked AS (
        SELECT vec_id, bucket,
               row_number() OVER (PARTITION BY bucket
                                  ORDER BY cosc DESC, vec_id) AS rnk
        FROM cosc
    ),
    paircos AS (
        SELECT rb.vec_id AS dup_id,
               floor(CAST(sum(CAST(CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE) AS DECIMAL(30,15)))
                          AS DOUBLE) / (na.nrm * nb.nrm) * 1e5) / 1e5 AS pc
        FROM ranked ra
        JOIN ranked rb ON rb.bucket = ra.bucket AND ra.rnk < rb.rnk
        JOIN embeddings ea ON ea.vec_id = ra.vec_id
        JOIN embeddings eb ON eb.vec_id = rb.vec_id
        JOIN norms na ON na.vec_id = ra.vec_id
        JOIN norms nb ON nb.vec_id = rb.vec_id, {IDX}
        GROUP BY ra.vec_id, rb.vec_id, na.nrm, nb.nrm
    ),
    dups AS (SELECT dup_id FROM paircos WHERE pc >= 0.35 GROUP BY dup_id)
    SELECT r.vec_id, r.bucket, r.rnk, (d.dup_id IS NOT NULL) AS dropped
    FROM ranked r LEFT JOIN dups d ON d.dup_id = r.vec_id
    """,
)
def embed_semdedup(spark, sf_dir):
    """SemDeDup semantic dedup (Abbas et al. 2023, arXiv:2303.09540)
    over the embeddings fixture: portable-SRP clusters (16 buckets),
    rank members by cosine-to-centroid, drop members tau-similar
    (>= 0.35) to any higher-ranked cluster-mate — the
    keep-one-representative-per-semantic-neighborhood prune a training
    pipeline runs after exact/minhash dedup. Fully oracled: clustering,
    centroids, ranking, and the prune decision are all exact-decimal
    deterministic (see datapipe.similarity.semdedup_prune for the 100 TB
    shape: one bucket shuffle, broadcast centroids, per-bucket pairs)."""
    from gpdb_spark.datapipe.similarity import semdedup_prune

    e = spread(t(spark, sf_dir, "embeddings"))
    return semdedup_prune(e, "embedding", dim=DIM, planes=4, tau=0.35)
