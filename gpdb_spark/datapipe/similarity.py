"""Vector similarity search over embedding columns (array<float>).

Maps the reference's sparse-vector ops (gpcontrib/gp_sparse_vector:
svec_dot operators.c:144, l2norm operators.c:455) onto Spark array
columns, then extends to ANN search for the embeddings fixture.

Scale design:
- exact top-k ("brute force") broadcasts the (small) query set against the
  corpus — one pass, no shuffle of the corpus, TakeOrdered per query via
  window top-k. This is the correct baseline up to ~10^4 queries.
- LSH variant (random signed projections -> band join) bounds candidate
  generation for corpus-vs-corpus search the same way MinHash LSH does
  for text: equi-join on bucket keys, AQE-skew-tolerant.
- dot products are single JVM expressions (zip_with + aggregate): no
  Python, vectorizes in codegen.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gpdb_spark.registry import fr


def dot(a: Column, b: Column) -> Column:
    """svec_dot (operators.c:144): elementwise product sum, sequential
    fold in element order (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2norm(a: Column) -> Column:
    """l2norm (operators.c:455)."""
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


DEC30 = "decimal(30,15)"


def dec_dot(a: Column, b: Column) -> Column:
    """Exact decimal dot product (order-independent, engine-identical) —
    the determinism discipline from registry.py applied to vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(DEC30)),
        F.lit(0).cast(DEC30),
        lambda acc, v: (acc + v).cast(DEC30),
    )


def dec_norm(a: Column) -> Column:
    return F.sqrt(dec_dot(a, a).cast("double"))


def portable_plane(seed: int, dim: int) -> list[float]:
    """±1 hyperplane components from md5 parity of "seed:i" — the
    engine-independent SRP family: any SQL engine (and this Python)
    derives the identical plane, so LSH bucket assignment is exactly
    reproducible outside Spark. Python's md5 == Spark's md5 == DuckDB's
    md5 (same bytes in, same hex out), so inlining these as literals is
    constant-folding, not a third hash family."""
    import hashlib

    return [
        1.0
        if int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[0], 16) % 2 == 0
        else -1.0
        for i in range(dim)
    ]


def normalize(df: DataFrame, vec_col: str = "embedding", out_col: str = "unit") -> DataFrame:
    """Pre-normalize vectors so cosine becomes a plain dot product —
    amortizes the norm across every downstream comparison.

    The norm is projected as a REAL column before the element lambda:
    Spark does not hoist invariant aggregate subtrees out of
    higher-order-function bodies, so an inlined l2norm inside the
    transform re-evaluates the O(dim) fold per element — O(dim²)/row
    on the hottest path in this module.

    A zero-norm vector has no direction: its ``out_col`` is NULL (the
    similarity operators filter those out), never a NaN unit — Spark
    floor(NaN)=0 would silently rank it mid-pack while other engines
    keep NaN."""
    v = F.col(vec_col)
    d = df.withColumn("__nrm", l2norm(v))
    return d.withColumn(
        out_col,
        F.when(
            F.col("__nrm") > 0,
            F.transform(v, lambda x: x.cast("double") / F.col("__nrm")),
        ),
    ).drop("__nrm")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (excluding itself). Queries are broadcast; the corpus is
    scanned once; per-query top-k via window row_number."""
    c = normalize(corpus, vec_col).where(F.col("unit").isNotNull()).select(
        F.col(id_col).alias("corpus_id"), F.col("unit").alias("cv")
    )
    q = normalize(queries, vec_col).where(F.col("unit").isNotNull()).select(
        F.col(id_col).alias("query_id"), F.col("unit").alias("qv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("corpus_id") != F.col("query_id"))
        .withColumn("cos", fr(dot(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("corpus_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "corpus_id", "cos", "rnk")
    )


def srp_buckets(
    df: DataFrame,
    vec_col: str,
    dim: int,
    tables: int = 4,
    planes_per_table: int = 8,
    id_alias: str = "id",
    id_col: str = "vec_id",
    portable: bool = False,
    with_norm: bool = False,
    carry_vec: bool = True,
) -> DataFrame:
    """Signed-random-projection LSH: ``tables`` independent hash tables,
    each bucketing on the sign pattern of ``planes_per_table`` hyperplane
    projections. Output: one row per (vector, table) with its bucket key —
    the equi-join key for candidate generation.

    ``portable=True``: planes are the md5-parity family
    (portable_plane, seed = tbl*1000 + p) inlined as constant-folded
    literals, and each projection is the exact DECIMAL sum of ±v_i —
    sign decisions are engine-identical, so bucket assignment is
    reproducible by any engine. Works on the RAW vector (SRP signs are
    scale-invariant, so normalization is unnecessary — and skipping it
    keeps the decimal sums exact).

    ``carry_vec=False`` emits only (id, tbl, bucket) — guide §8: when
    the caller re-attaches vectors AFTER candidate dedup, carrying the
    payload through the ``tables``-way explode duplicates every vector
    ``tables`` times through the bucket join for nothing.

    r11 (guide §4.2 "hand whole batches to vectorized native code"):
    the portable projections are computed by ONE numpy integer matmul
    per Arrow batch instead of tables*planes interpreted decimal folds
    per row. Exactness is inherited, not re-derived: the JVM first
    materializes the scale-15 fixed-point vector u_i = dec15(v_i)*1e15
    as int64 (dec15 = Spark's own double→DECIMAL(30,15) cast, so the
    JDK's Double.toString shortest-repr + HALF_UP semantics are never
    re-implemented in Python), and the sign of the exact decimal
    projection Σ s_i*dec15(v_i) equals the sign of the integer sum
    Σ s_i*u_i — dec15(-x) = -dec15(x), the smallest nonzero magnitude
    is 1 (= 1e-15 in decimal, which never double-casts to 0), and
    int64 matmul is exact below the loudly-guarded overflow bound.
    Earlier JVM attempts, measured and rejected: per-plane long
    zip_with/aggregate folds were ~2x SLOWER than dec_dot (HOF lambda
    overhead dominates; CollapseProject re-inlines the fixed-point
    transform into every fold), and flattened ±element_at chains blow
    the codegen 64 KB method limit (Janino InternalCompilerException),
    falling back to interpreted Projection, 10x worse.

    ``dim`` must equal the actual vector length: a mismatch would make
    every projection NULL (zip_with pads with nulls) and every bucket
    bit 0 — ALL vectors in one bucket, i.e. the silent O(n²) cross
    product LSH exists to avoid. A per-row assert_true fails loudly
    instead (negligible next to the projection arithmetic)."""
    v = F.col(vec_col)
    rows = df.select(F.col(id_col).alias(id_alias), v.alias("_v")).where(
        F.assert_true(
            F.array_size(F.col("_v")) == dim,
            F.lit(f"srp_buckets: vector length != dim={dim}"),
        ).isNull()
    )
    # r11: optionally compute the exact-decimal norm ONCE per vector here,
    # so downstream candidate scoring (one row per COLLISION) reads a
    # column instead of re-running the O(dim) decimal fold per candidate.
    carry = ["_n"] if with_norm else []
    if with_norm:
        rows = rows.withColumn("_n", dec_norm(F.col("_v")))
    out_vec = ["_v"] if carry_vec else []
    if portable:
        import numpy as np
        from pyspark.sql.types import IntegerType, LongType, StructField, StructType

        # (dim, tables*planes) ±1 sign matrix, column t*planes+p = plane
        # portable_plane(t*1000+p, dim) — closure-shipped once per task.
        signs = np.array(
            [
                portable_plane(tbl * 1000 + p, dim)
                for tbl in range(tables)
                for p in range(planes_per_table)
            ],
            dtype=np.int64,
        ).T
        ppt = planes_per_table
        ntb = tables
        # |Σ s_i*u_i| <= dim*max|u|: keep it provably inside int64.
        ovfl = (2**62) // max(dim, 1)
        pow2 = (1 << np.arange(ppt - 1, -1, -1)).astype(np.int64)

        u = F.transform(
            F.col("_v"),
            lambda x: (x.cast("double").cast(DEC30) * F.lit(10**15)).cast("long"),
        )
        fixed = rows.select(F.col(id_alias), u.alias("_u"))
        id_field = fixed.schema[id_alias]
        out_schema = StructType(
            [
                id_field,
                StructField("tbl", IntegerType(), False),
                StructField("bucket", LongType(), False),
            ]
        )

        def _buckets_arrow(batches):
            import numpy as _np
            import pyarrow as pa

            for b in batches:
                n = b.num_rows
                if n == 0:
                    continue
                ids = b.column(0)
                uc = b.column(1)
                flat = uc.flatten()
                if uc.null_count or flat.null_count or len(flat) != n * dim:
                    raise RuntimeError(
                        "srp_buckets: null or ragged fixed-point vector"
                    )
                U = flat.to_numpy(zero_copy_only=False).reshape(n, dim)
                if _np.abs(U).max(initial=0) > ovfl:
                    raise RuntimeError(
                        "srp_buckets: fixed-point magnitude exceeds the "
                        "int64 projection bound — refusing to mis-bucket"
                    )
                proj = U @ signs                     # exact int64
                bits = (proj >= 0).astype(_np.int64).reshape(n, ntb, ppt)
                buck = bits @ pow2                   # (n, tables)
                idx = pa.array(_np.repeat(_np.arange(n), ntb))
                yield pa.RecordBatch.from_arrays(
                    [
                        ids.take(idx),
                        pa.array(_np.tile(_np.arange(ntb, dtype=_np.int32), n)),
                        pa.array(buck.reshape(-1)),
                    ],
                    schema=pa.schema(
                        [
                            pa.field(id_alias, ids.type),
                            pa.field("tbl", pa.int32()),
                            pa.field("bucket", pa.int64()),
                        ]
                    ),
                )

        bucketed = fixed.mapInArrow(_buckets_arrow, out_schema)
        if not (carry_vec or with_norm):
            return bucketed
        # re-attach the payload/norm exactly once, AFTER bucketing — the
        # heavy columns never ride the tables-way fan-out through Python
        return bucketed.join(
            rows.select(id_alias, *out_vec, *carry), id_alias
        ).select(id_alias, *out_vec, *carry, "tbl", "bucket")
    buckets = F.transform(
        F.sequence(F.lit(0), F.lit(tables - 1)),
        lambda tbl: F.struct(
            tbl.alias("tbl"),
            F.aggregate(
                F.sequence(F.lit(0), F.lit(planes_per_table - 1)),
                F.lit(0).cast("long"),
                lambda acc, p: acc * 2
                + F.when(
                    dot(
                        F.col("_v"),
                        _projection_vector_expr(tbl * 1000 + p, dim),
                    )
                    >= 0,
                    1,
                ).otherwise(0),
            ).alias("bucket"),
        ),
    )
    return rows.select(
        id_alias,
        *out_vec,
        *carry,
        F.explode(buckets).alias("tb"),
    ).select(
        id_alias,
        *out_vec,
        *carry,
        F.col("tb.tbl").alias("tbl"),
        F.col("tb.bucket").alias("bucket"),
    )


def _projection_vector_expr(seed: Column | int, dim: int) -> Column:
    seed_col = F.lit(seed) if isinstance(seed, int) else seed
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.when(
            F.xxhash64(
                F.concat_ws(":", seed_col.cast("string"), i.cast("string"))
            )
            % 2
            == 0,
            F.lit(1.0),
        ).otherwise(F.lit(-1.0)),
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    tables: int = 4,
    planes_per_table: int = 8,
    portable: bool = False,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing an LSH bucket
    with the query in any table; exact cosine re-rank of candidates.

    Recall improves with ``tables``; cost scales with bucket collision
    rate instead of corpus size. tests/test_datapipe.py measures recall
    against brute_force_topk.

    ``portable=True``: md5-parity planes + decimal projections (see
    srp_buckets) and an exact DECIMAL cosine re-rank — the entire
    operator is deterministic and reproducible by any engine."""
    if portable:
        # r11 (guide §8 "decide with small rows, move big rows once"):
        # buckets are computed and joined on IDS ONLY — carrying the
        # vector through the `tables`-way explode duplicated every
        # payload 16x through the bucket join and the dedup shuffle
        # (measured: ids-only candidates 3.1 s vs vector-carrying
        # 4.1 s at sf0.1 before the re-rank). Vectors are attached
        # exactly once, to the deduplicated pair set.
        cb = srp_buckets(corpus, vec_col, dim, tables, planes_per_table,
                         "corpus_id", id_col, portable=True,
                         carry_vec=False)
        qb = srp_buckets(queries, vec_col, dim, tables, planes_per_table,
                         "query_id", id_col, portable=True,
                         carry_vec=False)
        cand = (
            cb.join(qb, ["tbl", "bucket"])
            .where(F.col("corpus_id") != F.col("query_id"))
            .select("query_id", "corpus_id")
            .dropDuplicates(["query_id", "corpus_id"])
        )
        cv = corpus.select(
            F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("_v")
        ).withColumn("_ndv", F.sqrt(dot(F.col("_v"), F.col("_v"))))
        qv = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        ).withColumn("_ndq", F.sqrt(dot(F.col("_qv"), F.col("_qv"))))
        pairs = cand.join(cv, "corpus_id").join(F.broadcast(qv), "query_id")
        return _exact_topk_band_rerank(pairs, k)
    cn = normalize(corpus, vec_col).where(F.col("unit").isNotNull())
    qn = normalize(queries, vec_col).where(F.col("unit").isNotNull())
    cb = srp_buckets(cn, "unit", dim, tables, planes_per_table, "corpus_id", id_col)
    qb = srp_buckets(qn, "unit", dim, tables, planes_per_table, "query_id", id_col)
    cand = (
        cb.join(
            qb.withColumnRenamed("_v", "_qv"),
            ["tbl", "bucket"],
        )
        .where(F.col("corpus_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "corpus_id"])
    )
    cos = fr(dot(F.col("_qv"), F.col("_v")), 6)
    scored = cand.withColumn("cos", cos)
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("corpus_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "corpus_id", "cos", "rnk")
    )


def _exact_topk_band_rerank(pairs: DataFrame, k: int) -> DataFrame:
    """Exact-decimal cosine top-k over candidate ``pairs`` (query_id,
    corpus_id, _qv, _v), with the O(candidates) exact folds pruned to
    O(k) by a primitive-double pre-rank — value-identical output.

    r11 (guide §1.2 per-task work; the semdedup band argument applied
    to RANKING): the authoritative score is floor6(dec_dot/(dec_norm *
    dec_norm)). The primitive double cosine ``dcos`` differs from the
    exact quotient by < dim*eps (double fold rounding, Cauchy-Schwarz)
    + dim*0.5e-15/(nq*nc) (dec15 per-term rounding) — both covered
    1000x by BAND = 2e-5 + 1e-10/(nq*nc). floor-6 moves a value < 1e-6.
    So a pair can place in the exact top-k ONLY if its dcos is within
    2*BAND + 1e-6 of the k-th highest dcos of its query: every such
    pair is kept and exactly re-scored, the rest are provably out.
    Zero-norm pairs: norm 0 ⟹ vector 0 ⟹ dot 0, and the exact
    formulation yields fr(0/0=NaN) = 0.0 (Spark floor(NaN)=0) — the
    double path mirrors that 0.0 exactly, so those rows rank
    identically in both passes (band 0 needed: the values are equal).
    The exact window then re-ranks survivors with the same total order
    (cos DESC, corpus_id) the unpruned formulation used.

    Callers may pre-attach per-VECTOR double norms as ``_ndv``/``_ndq``
    columns (one fold per vector instead of one per pair — guide §1.2);
    any double norm works for the prune, the bound covers it."""
    cols = set(pairs.columns)
    nd_c = F.col("_ndv") if "_ndv" in cols else F.sqrt(dot(F.col("_v"), F.col("_v")))
    nd_q = F.col("_ndq") if "_ndq" in cols else F.sqrt(dot(F.col("_qv"), F.col("_qv")))
    np_d = nd_q * nd_c
    dcos = F.when(np_d > 0, dot(F.col("_qv"), F.col("_v")) / np_d).otherwise(
        F.lit(0.0)
    )
    band = F.lit(2e-5) + F.lit(1e-10) / F.when(np_d > 0, np_d).otherwise(1) + F.lit(1e-6)
    wq = Window.partitionBy("query_id")
    wd = wq.orderBy(F.col("_dcos").desc(), F.col("corpus_id"))
    pruned = (
        pairs.withColumn("_dcos", dcos)
        .withColumn("_band", band)
        .withColumn("_rd", F.row_number().over(wd))
        .withColumn("_dk", F.max(F.when(F.col("_rd") == k, F.col("_dcos"))).over(wq))
        .where(
            (F.col("_rd") <= k)
            | (F.col("_dcos") >= F.col("_dk") - F.lit(2) * F.col("_band"))
        )
    )
    cos = fr(
        dec_dot(F.col("_qv"), F.col("_v")).cast("double")
        / (dec_norm(F.col("_qv")) * dec_norm(F.col("_v"))),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("corpus_id"))
    return (
        pruned.withColumn("cos", cos)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "corpus_id", "cos", "rnk")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------

def train_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    sample_size: int = 2048,
    iters: int = 8,
):
    """k-means coarse quantizer trained on a BOUNDED deterministic sample
    (first ``sample_size`` ids) pulled to the driver — the one deliberate
    driver-side step, O(sample) regardless of corpus size, exactly how
    IVF indexes are trained in production ANN systems. Returns a numpy
    (n_centroids, dim) array of unit-normalized centroids.
    """
    import numpy as np

    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_size)
        .collect()
    )
    if not rows:
        raise ValueError("train_centroids: empty corpus")
    x = np.array([r[1] for r in rows], dtype=np.float64)
    nrm = np.linalg.norm(x, axis=1, keepdims=True)
    x = x[nrm[:, 0] > 0] / nrm[nrm[:, 0] > 0]
    if not len(x):
        raise ValueError("train_centroids: all sampled vectors are zero")
    # clamp: a corpus/sample smaller than n_centroids would make
    # rng.choice raise 'larger sample than population'
    n_centroids = min(n_centroids, len(x))
    rng = np.random.RandomState(42)
    cent = x[rng.choice(len(x), size=n_centroids, replace=False)]
    for _ in range(iters):
        sims = x @ cent.T                      # cosine (unit vectors)
        assign = sims.argmax(axis=1)
        for c in range(n_centroids):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / np.linalg.norm(m)
    return cent


def _assign_udf(centroids, n_probe: int = 1):
    """Vectorized (Arrow) assignment of unit vectors to their n_probe
    nearest centroids. Centroids ship in the UDF closure (tiny broadcast)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    cent = centroids  # (C, dim)

    @pandas_udf("array<int>")
    def assign(vecs: pd.Series) -> pd.Series:
        x = np.stack(vecs.to_numpy())
        x = x / np.linalg.norm(x, axis=1, keepdims=True)
        sims = x @ cent.T
        top = np.argsort(-sims, axis=1)[:, :n_probe]
        return pd.Series(list(top.astype("int32")))

    return assign


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    sample_size: int = 2048,
) -> DataFrame:
    """IVF ANN: corpus partitioned into centroid cells (inverted lists);
    each query probes its ``n_probe`` nearest cells and exact-reranks only
    those candidates.

    Scale shape: the corpus shuffle key is the cell id, so the candidate
    join touches ~n_probe/n_centroids of the corpus per query instead of
    all of it; cells are balanced by k-means (skewed cells can be split by
    raising n_centroids). The assignment pass is one Arrow-vectorized UDF
    over the corpus — embarrassingly parallel, no driver involvement."""
    cent = train_centroids(
        corpus, id_col, vec_col, n_centroids, sample_size
    )
    c_assign = _assign_udf(cent, 1)
    q_assign = _assign_udf(cent, n_probe)

    cn = normalize(corpus, vec_col).where(F.col("unit").isNotNull()).select(
        F.col(id_col).alias("corpus_id"), F.col("unit").alias("cv")
    )
    qn = normalize(queries, vec_col).where(F.col("unit").isNotNull()).select(
        F.col(id_col).alias("query_id"), F.col("unit").alias("qv")
    )
    c_cells = cn.withColumn("cell", F.element_at(c_assign("cv"), 1))
    q_cells = qn.withColumn("cell", F.explode(q_assign("qv")))

    cand = c_cells.join(q_cells, "cell").where(
        F.col("corpus_id") != F.col("query_id")
    )
    scored = cand.withColumn("cos", fr(dot(F.col("qv"), F.col("cv")), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("corpus_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "corpus_id", "cos", "rnk")
    )


def ivf_topk_flat(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 8,
) -> DataFrame:
    """IVF ANN with a DETERMINISTIC untrained coarse quantizer: centroids
    are the ``n_centroids`` lowest-id corpus vectors (the FAISS
    "don't train the quantizer" option). Same inverted-list scale shape
    as ivf_topk — the corpus joins on its single cell id, each query
    probes its n_probe nearest cells — but every step is an exact
    DECIMAL cosine + total-order ranking, so cell assignment and output
    are engine-reproducible (DuckDB-oracle-checkable) and the whole
    operator is JVM expressions: no UDF, no driver-side k-means.
    Trained centroids (ivf_topk) balance cells better on clustered
    corpora; the flat pick costs recall only when ids correlate with
    geometry."""
    # the n_centroids LOWEST ids, whatever the id base (a `< n` filter
    # under-selects for 1-based ids); orderBy+limit = TakeOrdered top-k
    cent = (
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        .orderBy("cid")
        .limit(n_centroids)
        # r11: centroid norm computed ONCE per centroid (n_centroids
        # rows) instead of once per (vector x centroid) pair
        .withColumn("_cn", dec_norm(F.col("cvec")))
    )

    def cells(df: DataFrame, out_id: str, n: int) -> DataFrame:
        # r11 (guide §1.2): the old shape ran 3 exact-decimal folds per
        # (vector x centroid) pair — dot + BOTH norms re-derived per
        # pair. Now: the vector norm is a column (one fold per row), the
        # centroid norm rides the broadcast relation, and the top-n cell
        # choice is pre-ranked with the primitive double cosine; the
        # exact decimal similarity is evaluated only for rows that could
        # change the selection (within 2*band of the n-th double rank —
        # the _exact_topk_band_rerank bound; the sim value itself is
        # never output, only the chosen cid set). Zero-norm vectors:
        # sim = NaN in BOTH paths (double x/0 and the decimal quotient
        # cast both give NaN), NaN sorts greatest with cid tie-break in
        # both — identical cells.
        x = df.select(
            F.col(id_col).alias(out_id), F.col(vec_col).alias("_v")
        ).withColumn("_n", dec_norm(F.col("_v")))
        np_ = F.col("_n") * F.col("_cn")
        dsim = dot(F.col("_v"), F.col("cvec")) / np_
        band = F.lit(2e-5) + F.lit(1e-10) / np_
        esim = dec_dot(F.col("_v"), F.col("cvec")).cast("double") / np_
        wp = Window.partitionBy(out_id)
        wd = wp.orderBy(F.col("_dsim").desc(), F.col("cid"))
        pruned = (
            x.crossJoin(F.broadcast(cent))
            .withColumn("_dsim", dsim)
            .withColumn("_rd", F.row_number().over(wd))
            .withColumn(
                "_dn", F.max(F.when(F.col("_rd") == n, F.col("_dsim"))).over(wp)
            )
            .where(
                (F.col("_rd") <= n)
                | (F.col("_dsim") >= F.col("_dn") - F.lit(2) * band)
            )
        )
        w = Window.partitionBy(out_id).orderBy(F.col("sim").desc(), F.col("cid"))
        return (
            pruned.withColumn("sim", esim)
            .withColumn("r", F.row_number().over(w))
            .where(F.col("r") <= n)
            .select(out_id, "_v", "_n", "cid")
        )

    c_cells = cells(corpus, "corpus_id", 1).withColumnRenamed("_n", "_ndv")
    q_cells = (
        cells(queries, "query_id", n_probe)
        .withColumnRenamed("_v", "_qv")
        .withColumnRenamed("_n", "_ndq")
    )
    cand = c_cells.join(q_cells, "cid").where(
        F.col("corpus_id") != F.col("query_id")
    )
    return _exact_topk_band_rerank(
        cand.select("query_id", "corpus_id", "_qv", "_v", "_ndv", "_ndq"), k
    )


def ivf_topk_trained_portable(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 8,
    iters: int = 2,
    sample_size: int = 256,
) -> DataFrame:
    """IVF ANN with a TRAINED coarse quantizer whose every step is
    engine-reproducible — the oracled twin of ivf_topk (whose numpy
    RandomState sample is the one non-portable step).

    Training sample = the ``sample_size`` ids with the LOWEST md5(id)
    (the repo's portable-hash doctrine: a uniform, seedless, any-engine
    sample — same family as sample.py's md5-prefix splits). Centroid
    init = the ``n_centroids`` lowest-md5 members of that sample. The
    Lloyd rounds are operators/kmeans.lloyd_rounds: floor-9 means,
    floor-12 squared-distance terms, DECIMAL sums — bit-identical in
    any engine, so DuckDB unrolls the identical training and the
    trained-index SEARCH PATH itself is oracle-checked.

    Scale shape: identical to ivf_topk — training is O(sample), the
    corpus touches one broadcast of the k*dim centroid relation for
    cell assignment, and the candidate join is keyed on cell id
    (~n_probe/n_centroids of the corpus per query). Cell metric is
    squared euclidean (the k-means objective; rank-equivalent to
    cosine on unit-normalized inputs)."""
    # r11 (guide §1.2 algorithm first): the distributed Lloyd rounds over
    # a 256-row training sample chained ~4 shuffle stages per round on a
    # 2-task frame (measured: 12 s of tiny-data scheduling at sf0.1), and
    # the corpus/query cell assignment fanned every vector out k x dim
    # long-form rows through two more exchanges (5.8 s). Training now
    # runs driver-side on the COLLECTED bounded sample (the standard IVF
    # contract — FAISS holds the quantizer driver-side; train_centroids
    # above already does exactly this for the non-portable twin), and
    # assignment is one mapInArrow pass with the k*dim centroid matrix
    # in the closure — no exchanges at all.
    #
    # Bit-identity with operators/kmeans.lloyd_rounds / assign_cells
    # (the oracle unrolls THOSE semantics), piece by piece:
    # - the fixed-point distance term floor(d²·1e12) uses only IEEE
    #   double ops + floor — numpy float64 reproduces each term exactly;
    #   the per-pair term SUM is an exact int64 sum (= registry.xsum);
    #   the compared dist is its double image, identical to
    #   xsum(..).cast("double") because the int fits 2^53 (guarded
    #   loudly — beyond it the double image could tie differently).
    # - argmin/top-n order is (dist, cid) with centroid columns kept
    #   cid-ascending, matching the row_number tie-break.
    # - the floor-9 mean consumes Σ dec15(x) via the JVM-computed
    #   scale-15 fixed points (never re-deriving the double→decimal
    #   cast in Python) and Fraction→float for the correctly-rounded
    #   decimal→double image, then floor(c·1e9)/1e9 in IEEE doubles.
    import numpy as np
    from fractions import Fraction

    h = F.md5(F.col(id_col).cast("string"))
    u_expr = F.transform(
        F.col(vec_col),
        lambda x: (x.cast("double").cast(DEC30) * F.lit(10**15)).cast("long"),
    )
    samp = (
        corpus.select(
            F.col(id_col).alias("vid"), h.alias("__h"),
            F.col(vec_col).alias("_x"), u_expr.alias("_u"),
        )
        .orderBy("__h", "vid")
        .limit(sample_size)
        .collect()
    )
    if not samp:
        raise ValueError("ivf_topk_trained_portable: empty corpus")
    samp.sort(key=lambda r: (r["__h"], r["vid"]))
    if any(r["_x"] is None or None in r["_x"] or None in r["_u"] for r in samp):
        raise ValueError("ivf_topk_trained_portable: null vector element")
    xs = np.array([list(r["_x"]) for r in samp], dtype=np.float64)
    us = np.array([list(r["_u"]) for r in samp], dtype=np.int64)
    svids = np.array([r["vid"] for r in samp], dtype=np.int64)
    dim = xs.shape[1]
    nc = min(n_centroids, len(samp))

    def _dist_int(X: "np.ndarray", V: "np.ndarray") -> "np.ndarray":
        if not np.isfinite(X).all():
            raise RuntimeError(
                "ivf assign: non-finite vector element — floor(NaN/Inf) "
                "has no integer image; refusing to mis-assign"
            )
        out = np.empty((len(X), len(V)), dtype=np.int64)
        for j in range(len(V)):
            d = X - V[j]
            out[:, j] = np.floor((d * d) * 1e12).astype(np.int64).sum(axis=1)
        if out.max(initial=0) >= 2**53:
            raise RuntimeError(
                "ivf assign: distance fixed point exceeds 2^53 — the "
                "double image could break ties differently; refusing"
            )
        return out

    def _cid_sorted(cids, V):
        order = np.argsort(np.array(cids, dtype=np.int64), kind="stable")
        return [cids[i] for i in order], V[order]

    cids = [int(v) for v in svids[:nc]]
    V = np.floor(xs[:nc] * 1e9) / 1e9
    cids, V = _cid_sorted(cids, V)
    for _ in range(iters):
        assign = np.argmin(_dist_int(xs, V) / 1e12, axis=1)  # first-min = lowest cid
        new_cids, new_vs = [], []
        for j, cid in enumerate(cids):
            mask = assign == j
            m = int(mask.sum())
            if m == 0:
                continue  # empty clusters drop, like plain Lloyd
            sums = us[mask].sum(axis=0, dtype=np.int64)
            c = np.array(
                [float(Fraction(int(s), 10**15)) for s in sums],
                dtype=np.float64,
            ) / m
            new_cids.append(cid)
            new_vs.append(np.floor(c * 1e9) / 1e9)
        cids, V = _cid_sorted(new_cids, np.stack(new_vs))

    cid_arr = np.array(cids, dtype=np.int64)
    Vf = V  # (k, dim), cid-ascending

    def _cells_arrow_of(n_sel: int, out_id: str):
        import pyarrow as pa

        nn = min(n_sel, len(cid_arr))

        def gen(batches):
            import numpy as _np

            for b in batches:
                nrows = b.num_rows
                if nrows == 0:
                    continue
                ids = b.column(0)
                vec = b.column(1)
                flat = vec.flatten()
                if vec.null_count or flat.null_count or len(flat) != nrows * dim:
                    raise RuntimeError("ivf assign: null or ragged vector")
                X = flat.to_numpy(zero_copy_only=False).reshape(
                    nrows, dim
                ).astype(_np.float64)
                Dd = _dist_int(X, Vf) / 1e12
                ordx = _np.argsort(Dd, axis=1, kind="stable")[:, :nn]
                idx = pa.array(_np.repeat(_np.arange(nrows), nn))
                yield pa.RecordBatch.from_arrays(
                    [ids.take(idx), pa.array(cid_arr[ordx.reshape(-1)])],
                    schema=pa.schema(
                        [pa.field(out_id, ids.type), pa.field("cid", pa.int64())]
                    ),
                )

        return gen

    c_cells = corpus.select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col)
    ).mapInArrow(_cells_arrow_of(1, "corpus_id"), "corpus_id long, cid long")
    q_cells = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col)
    ).mapInArrow(_cells_arrow_of(n_probe, "query_id"), "query_id long, cid long")

    cv = corpus.select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("_v")
    ).withColumn("_ndv", F.sqrt(dot(F.col("_v"), F.col("_v"))))
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).withColumn("_ndq", F.sqrt(dot(F.col("_qv"), F.col("_qv"))))
    # each corpus vector lives in exactly ONE cell, so the cell join
    # cannot duplicate a (query, corpus) pair — no dedup pass needed
    cand = (
        c_cells.join(q_cells, "cid")
        .where(F.col("corpus_id") != F.col("query_id"))
        .select("query_id", "corpus_id")
        .join(cv, "corpus_id")
        .join(F.broadcast(qv), "query_id")
    )
    # r11: exact folds only for pairs that can reach the top-k
    # (primitive-double pre-rank + provable band — see the helper)
    return _exact_topk_band_rerank(cand, k)


def brute_force_topk_blocked(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    emit_vectors: bool = False,
    max_queries: int = 100_000,
) -> DataFrame:
    """Exact cosine top-k via Arrow-batched block matrix multiply.

    With ``emit_vectors=True`` each surviving candidate row carries its
    corpus vector (``cv``), so an exact re-scoring pass downstream
    needs NO second corpus scan — the candidate set is
    n_batches * k * |q| rows, a vanishing fraction of the corpus, and
    shipping 64 doubles per candidate is far cheaper than re-reading
    and re-joining 10^9 vectors.

    Same semantics as brute_force_topk, different execution: the (small,
    <=~10^4 rows) query set is collected into the UDF closure as one
    normalized numpy matrix; each corpus Arrow batch computes
    C_batch @ Q.T in a single BLAS call and keeps only its LOCAL top-k
    rows per query (ordered by cos desc, corpus_id asc — the same total
    order as the global ranking, so the global winners always survive
    their batch). The window top-k then runs over n_batches * k * n_q
    candidate rows instead of |corpus| * n_q — at 10^9 corpus vectors the
    shuffle shrinks by ~5 orders of magnitude, and the dot products move
    from per-row JVM expression folds to vectorized BLAS."""
    import numpy as np

    schema = "query_id long, corpus_id long, cos double"
    if emit_vectors:
        schema += ", cv array<double>"
    # r12 (VERDICT r11 #5): the blocked formulation's contract is a
    # SMALL query set collected into the UDF closure — an unbounded
    # query side would silently OOM the driver and ship a giant closure
    # to every task. Refuse LOUDLY past the bound (limit(max+1) keeps
    # the probe itself bounded), the same discipline as the IVF 2^53
    # guard; callers with big query sets belong on brute_force_topk /
    # the LSH paths.
    q_rows = queries.select(id_col, vec_col).limit(max_queries + 1).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"brute_force_topk_blocked: query set exceeds max_queries="
            f"{max_queries} rows — the blocked kernel collects queries "
            "driver-side by contract; use brute_force_topk or an ANN "
            "path for large query sets (or raise max_queries explicitly)"
        )
    if not q_rows:
        # an empty query set is a valid input (an upstream filter can
        # match nothing); np.linalg.norm on a 0-row array would raise
        return corpus.sparkSession.createDataFrame([], schema + ", rnk int"
                                                   if not emit_vectors else schema)
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    # zero-norm vectors have no direction — excluded, matching
    # normalize()'s NULL-unit contract in the JVM formulation
    qkeep = qn[:, 0] > 0
    q_ids, Q, qn = q_ids[qkeep], Q[qkeep], qn[qkeep]
    if not len(q_ids):
        return corpus.sparkSession.createDataFrame([], schema + ", rnk int"
                                                   if not emit_vectors else schema)
    Q /= qn

    def local_topk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            C = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cn = np.linalg.norm(C, axis=1, keepdims=True)
            ckeep = cn[:, 0] > 0
            if not ckeep.all():
                # drop zero-norm rows: a NaN score row would sort as
                # largest inside np.partition and displace true winners
                ids, C, cn = ids[ckeep], C[ckeep], cn[ckeep]
                if not len(ids):
                    continue
            C /= cn
            S = C @ Q.T  # (n_batch, n_q)
            # self-matches sink below every real score; scores are rounded
            # BEFORE selection so the batch-local order is identical to the
            # global window's (round -> desc, id asc) and ties at the k-th
            # place keep exactly the rows the global ranking would
            S[ids[:, None] == q_ids[None, :]] = -np.inf
            # floor-truncation, NOT np.round: fr (the repo's compared-
            # output policy) floors, and round's half-to-even here would
            # make the standalone output diverge from brute_force_topk
            Sr = np.floor(S * 1e6) / 1e6
            kk = min(k, Sr.shape[0])
            # Fully vectorized candidate selection — no per-query Python
            # loop (a loop over 10^3+ queries per batch dominated wall
            # time). Emit every row >= the per-query k-th-largest score:
            # that is a superset of the batch's global winners INCLUDING
            # boundary ties (a tie with a smaller corpus_id can win the
            # global (cos desc, id asc) ranking, so ties must survive);
            # the downstream window trims to exactly k.
            thr = np.partition(Sr, -kk, axis=0)[-kk, :]  # (n_q,) k-th largest
            mask = (Sr >= thr[None, :]) & np.isfinite(Sr)
            rows, cols = np.nonzero(mask)
            out = {
                "query_id": q_ids[cols],
                "corpus_id": ids[rows],
                "cos": Sr[rows, cols],
            }
            if emit_vectors:
                vecs = pdf[vec_col].to_numpy()
                out["cv"] = [list(vecs[r]) for r in rows]
            yield pd.DataFrame(out)

    cand = corpus.select(id_col, vec_col).mapInPandas(local_topk, schema)
    if emit_vectors:
        return cand
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("corpus_id")
    )
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "corpus_id", "cos", "rnk")
    )


def semdedup_prune(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    planes: int = 4,
    tau: float = 0.35,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings, then within each cluster drop
    every member whose cosine similarity to a higher-ranked member
    reaches ``tau``, where rank = cosine-to-cluster-centroid descending
    (the paper's keep-one-representative-per-semantic-neighborhood
    pruning, made deterministic).

    Deviations from the paper, for engine-reproducibility: the
    clustering is the portable SRP family (``srp_buckets`` with one
    table of ``planes`` hyperplanes — deterministic, any-engine
    reproducible) instead of trained k-means, and a member is dropped
    if it is tau-similar to ANY higher-ranked member (not only kept
    ones) — one window + one bounded join instead of a sequential scan.

    Scale shape: one hash shuffle on the bucket key; the centroid table
    is (2^planes x dim) rows — computed with a tiny two-level
    aggregation and broadcast back; the pair phase is per-bucket, never
    corpus-squared (add planes to keep buckets bounded as the corpus
    grows — a bucket must fit one task's memory for the BLAS judge,
    the same O(bucket²) bound the old pair join already implied); the
    authoritative comparisons stay exact-decimal JVM folds, with the
    per-pair tau decision pre-screened by one BLAS matrix per bucket.

    Returns (vec_id, bucket, rnk, dropped); zero-norm vectors (no
    direction, no cosine) are excluded.
    """
    e = df.select("vec_id", F.col(vec_col).alias("_v")).withColumn(
        "nrm", dec_norm(F.col("_v"))
    ).where(F.col("nrm") > 0)
    b = srp_buckets(
        e, "_v", dim, tables=1, planes_per_table=planes,
        id_alias="vec_id", portable=True, carry_vec=False,
    ).select("vec_id", "bucket")
    m = e.join(b, "vec_id")
    # per-bucket centroid of the unit vectors: exact decimal mean per
    # dimension, reassembled in index order; 2^planes rows -> broadcast.
    # r11: explode the RAW vector and divide by the norm AFTER the
    # Generate — posexplode of a computed `unit` array made Spark infer
    # a size()>0/isnotnull filter on it (InferFiltersFromGenerate) and
    # push it below the join with the whole expression inlined, nesting
    # the O(dim) dec_norm fold INSIDE the per-element lambda: the fold
    # re-ran dim times per row, twice (measured: this one inferred
    # filter was 6.9 s of the operator's 13 s at sf0.1). Same (i, u)
    # pairs, same exact decimal mean.
    cents = (
        m.select("bucket", "nrm", F.posexplode("_v").alias("i", "x"))
        .select(
            "bucket", "i", (F.col("x").cast("double") / F.col("nrm")).alias("u")
        )
        .groupBy("bucket", "i")
        .agg(
            (F.sum(F.col("u").cast(DEC30)).cast("double") / F.count("*")).alias("cv")
        )
        .groupBy("bucket")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "cv"))),
                lambda s: s.cv,
            ).alias("cent")
        )
        .withColumn("cn", dec_norm(F.col("cent")))
    )
    ranked = (
        m.join(F.broadcast(cents), "bucket")
        .withColumn(
            "cosc",
            fr(dec_dot(F.col("_v"), F.col("cent")).cast("double")
               / (F.col("nrm") * F.col("cn")), 6),
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("bucket").orderBy(
                    F.col("cosc").desc(), F.col("vec_id")
                )
            ),
        )
        .select("vec_id", "bucket", "rnk", "_v", "nrm")
    )
    # r11 (guide §4.2 + §1.2): the tau decision per (member, higher-ranked
    # member) pair is made by ONE BLAS cosine matrix per bucket inside an
    # applyInPandas judge, instead of a per-bucket self-JOIN whose every
    # row re-ran an interpreted O(dim) double fold — and whose three
    # references to `ranked` re-executed the whole bucket/centroid/window
    # lineage three times. Value-identical by the established band
    # argument: the authoritative predicate is floor5(exact_cos) >= tau;
    # ANY estimate within the band half-width 2e-5 + 1e-10/(nrm*hn) of
    # the exact quotient decides it outside [tau-band, tau+band) — the
    # numpy float64 dot's error (<= dim*eps*na*nb / (na*nb) by
    # Cauchy-Schwarz, plus the dec15 per-term rounding) is covered
    # exactly like the JVM double fold's was. Pairs INSIDE the band come
    # back with both vectors attached and are resolved by the same exact
    # decimal fold as before — the Python stage never computes a decimal.
    # (Zero-norm rows were excluded upstream, so no NaN cosines.)
    tau_f = float(tau)
    judge_schema = (
        "vec_id long, bucket long, rnk int, sure int, "
        "self_v array<double>, partner_vs array<array<double>>, "
        "nrm double, hns array<double>"
    )

    def _judge(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        order = np.argsort(pdf["rnk"].to_numpy())
        ids = pdf["vec_id"].to_numpy()[order]
        rnk = pdf["rnk"].to_numpy()[order]
        bkt = pdf["bucket"].to_numpy()[order]
        nr = pdf["nrm"].to_numpy(dtype=np.float64)[order]
        vlists = pdf["_v"].to_numpy()[order]
        n = len(ids)
        V = np.stack(vlists).astype(np.float64)
        npd = np.outer(nr, nr)
        M = (V @ V.T) / npd
        band = 2e-5 + 1e-10 / npd
        lower = np.tril(np.ones((n, n), dtype=bool), k=-1)  # j < i in rank
        sure_true = lower & (M >= tau_f + band)
        in_band = lower & (M >= tau_f - band) & (M < tau_f + band)
        dropped = sure_true.any(axis=1)
        need_exact = in_band.any(axis=1) & ~dropped
        pvs, hns, svs = [], [], []
        for i in range(n):
            if need_exact[i]:
                js = np.nonzero(in_band[i])[0]
                pvs.append([list(vlists[j]) for j in js])
                hns.append([nr[j] for j in js])
                svs.append(list(vlists[i]))
            else:
                pvs.append(None); hns.append(None); svs.append(None)
        return pd.DataFrame(
            {
                "vec_id": ids, "bucket": bkt, "rnk": rnk,
                "sure": dropped.astype(np.int32),
                "self_v": svs, "partner_vs": pvs,
                "nrm": nr, "hns": hns,
            }
        )

    judged = ranked.groupBy("bucket").applyInPandas(_judge, judge_schema)
    # band pairs (measure-zero) resolve inline with the SAME exact
    # decimal fold the join formulation used — no second pass, no union
    exact_any = F.exists(
        F.arrays_zip(F.col("partner_vs").alias("pv"), F.col("hns").alias("hn")),
        lambda s: fr(
            dec_dot(F.col("self_v"), s.pv).cast("double")
            / (F.col("nrm") * s.hn),
            5,
        )
        >= tau,
    )
    return judged.select(
        "vec_id", "bucket", "rnk",
        (
            (F.col("sure") == 1) | F.coalesce(exact_any, F.lit(False))
        ).alias("dropped"),
    )
