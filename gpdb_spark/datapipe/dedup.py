"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Beyond-reference capability (SURVEY.md §7 phase 6). Design targets 100 TB:

- exact dedup: hash-groupBy on a content digest — one shuffle keyed by the
  digest, arbitrarily skew-tolerant (AQE splits hot digests).
- pairwise Jaccard: *never* all-pairs. Candidate generation goes through
  an inverted index (explode tokens -> join on token) or LSH buckets, so
  the shuffle volume is O(postings), not O(n^2).
- MinHash: k independent permutations simulated by seeded xxhash64; the
  whole signature is one JVM column expression (no UDF). Banding turns
  signature agreement into an equi-join key — the classic
  shuffle-friendly LSH formulation.
- SimHash: 64-bit signature from sign-aggregated per-bit votes; candidate
  pairs via 16-bit chunk equi-join (pigeonhole: hamming<=3 pairs share a
  chunk), verified by exact popcount.

All candidate joins are plain equi-joins -> Spark plans shuffled hash
joins with AQE skew handling; no driver-side state.

Cache lifetime: the pair operators persist their signature relation
because the lazily-returned plan reads it from both sides of the
candidate self-join — it cannot be unpersisted inside the function
(nothing has materialized yet). The blocks use Spark's default
MEMORY_AND_DISK_DESER level, which is LRU-EVICTABLE — long sessions
running many dedup calls degrade to recompute, never OOM. A caller
needing deterministic release can `spark.catalog.clearCache()` between
calls.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gpdb_spark.catalog import spread
from gpdb_spark.registry import fr
from gpdb_spark.datapipe.text import tokens


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the smallest id per exact content (md5 digest) group."""
    return (
        df.withColumn("content_hash", F.md5(F.col(text_col)))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard via inverted index
# ---------------------------------------------------------------------------

def ngram_shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles (distinct). A doc with fewer than n tokens
    yields its whole token stream as one short shingle; a ZERO-token doc
    yields NO shingles (an empty doc has no content to shingle — pairing
    empties belongs to exact_dedup, not near-dup signatures)."""
    # r11: zip n shifted slices instead of a transform whose lambda closes
    # over ``toks`` — the closed-over array was re-evaluated (full
    # tokenize) per ELEMENT, O(tokens²) splits per row (see text.ngrams).
    # Identical values: for cnt < n the trailing slices are empty, the
    # zip pads nulls, and concat_ws skips them — same one short shingle
    # the old array_join(slice(toks, 1, n)) produced.
    toks = tokens(text)
    cnt = F.array_size(toks)
    length = F.greatest(cnt - n + 1, F.lit(1))
    z = F.arrays_zip(*[F.slice(toks, k, length) for k in range(1, n + 1)])
    g = F.transform(z, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)]))
    return F.array_distinct(
        F.when(cnt > 0, g).otherwise(F.array().cast("array<string>"))
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 1,
    threshold: float = 0.8,
    max_df_frac: float | None = None,
) -> DataFrame:
    """All pairs (a<b) with shingle-set Jaccard >= threshold.

    Inverted-index join: explode distinct shingles, self-join on shingle to
    count intersections, then |A∪B| = |A|+|B|-|A∩B|. The shuffle key is the
    shingle, so common-shingle skew is the scale hazard: ONE shingle
    appearing in m docs yields O(m²) intersection pairs on a single
    shuffle key. ``max_df_frac`` drops shingles whose document frequency
    exceeds that fraction of the corpus (the way search engines drop
    stopword postings), bounding the worst posting list at
    max_df_frac·n — jaccard is then computed over the filtered shingle
    universe (sizes shrink consistently). ``None`` = exact semantics,
    no filter; at 100 TB always set it.
    """
    sh = (
        spread(df).select(
            F.col(id_col).alias("id"),
            F.explode(
                ngram_shingles(F.col(text_col), ngram)
                if ngram > 1
                else F.array_distinct(tokens(F.col(text_col)))
            ).alias("shingle"),
        )
    )
    if max_df_frac is not None:
        # document-frequency cutoff: one extra groupBy on the SAME shuffle
        # key; the scalar corpus count rides in via a 1-row cross join
        # (no driver collect)
        n_docs = df.select(F.count(F.lit(1)).alias("__n"))
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .crossJoin(F.broadcast(n_docs))
            .where(F.col("__df") <= F.col("__n") * max_df_frac)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))

    a = sh.select(F.col("id").alias("a"), "shingle")
    b = sh.select(F.col("id").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            fr(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def shingle_hashes(
    text: Column | str, ngram: int = 1, portable: bool = False
) -> Column:
    """Each distinct shingle hashed once to a long — the only pass that
    touches string bytes. ``portable=True`` uses the md5-derived hash
    (engine-independent, see _token_hash) instead of xxhash64."""
    sh = (
        ngram_shingles(text, ngram)
        if ngram > 1
        else F.array_distinct(tokens(text))
    )
    return F.transform(sh, lambda s: _token_hash(s, portable))


def _seeded_rehash(h: Column, seed: Column, portable: bool) -> Column:
    """Fixed-width re-hash of a shingle hash under a seed — one member
    of the permutation family per seed. Portable form: md5 of the
    decimal "hash:seed" string (any engine can recompute it)."""
    if portable:
        return F.conv(
            F.substring(
                F.md5(F.concat_ws(":", h.cast("string"), seed.cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
    return F.xxhash64(h, seed)


def minhash_from_hashes(
    hashes: Column, k: int = 64, portable: bool = False
) -> Column:
    """k-component MinHash from pre-hashed shingles: component i = min over
    shingles of a seeded re-hash of the shingle hash — so string bytes
    are hashed exactly once per shingle.

    Re-hashing (not an affine a*h+b combine) is deliberate twice over:
    affine maps without a modulus are order-preserving, so every component
    would pick the same shingle and the signature collapses to one
    effective permutation; and long-multiply overflow would trip ANSI
    arithmetic checks. Seeded re-hash of the base hash is the standard
    min-wise-independent-in-practice family (cf. Kirsch-Mitzenmacher
    double hashing)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda seed: F.array_min(
            F.transform(hashes, lambda h: _seeded_rehash(h, seed, portable))
        ),
    )


def minhash_signature(text: Column | str, k: int = 64, ngram: int = 1) -> Column:
    """One-expression convenience form. Prefer the two-projection shape
    (``shingle_hashes`` then ``minhash_from_hashes``) inside operators:
    as separate projections the shingle-hash array is materialized once
    per row (CollapseProject keeps non-cheap multi-referenced expressions
    in their own projection), instead of once per signature component."""
    return minhash_from_hashes(shingle_hashes(text, ngram), k)


def _sig_table(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    ngram: int,
    portable: bool,
) -> DataFrame:
    """(id, sig) MinHash signature table, zero-shingle docs dropped
    (array_min over an empty array is NULL, and k NULLs would give every
    empty doc the same degenerate band bucket — empties are exact
    duplicates, exact_dedup's job, not MinHash's).

    The whole signature is one per-row JVM expression — ZERO shuffle.
    (r11 tested and REJECTED: deduplicating the portable md5 rehash per
    DISTINCT shingle — explode postings, rehash the vocabulary once,
    join back, 64 primitive min aggregates. Value-identical and the
    fixture corpus repeats tokens 3700x, yet measured SLOWER, 1.6 vs
    2.6 s interleaved at sf0.1: the explode + join + 64-buffer
    aggregation costs more than the md5 work it saves, the same verdict
    the 64-codegen-min-agg signature shape got for xxhash64.)"""
    base = (
        spread(df)
        .select(
            F.col(id_col).alias("id"),
            shingle_hashes(F.col(text_col), ngram, portable).alias("__sh"),
        )
        .where(F.array_size(F.col("__sh")) > 0)
    )
    return base.select(
        "id", minhash_from_hashes(F.col("__sh"), k, portable).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 64,
    bands: int = 16,
    ngram: int = 1,
    threshold: float = 0.7,
    portable: bool = False,
) -> DataFrame:
    """Near-dup pairs via banded MinHash LSH.

    bands=16 over k=64 -> rows-per-band=4; collision prob of a pair with
    Jaccard j is 1-(1-j^4)^16 (s-curve centered ~0.55). Candidates are
    pairs sharing >=1 band hash; verified by full-signature agreement
    (estimated Jaccard) >= threshold.

    ``portable=True`` swaps the xxhash64 permutation family for the
    md5-derived one (_seeded_rehash): signatures become reproducible by
    any engine (and DuckDB-oracle-checkable) at ~3x the hashing cost.

    r12 execution (guide §4.2/§2.4; value-identical, see the judge's
    proof): candidates are enumerated and verified INSIDE each
    (band, bucket) group by one numpy pass (groupBy + applyInPandas),
    instead of materializing every per-bucket id pair in the JVM. The
    old shape shuffled the raw bucket pairs (45.7M rows at sf0.1),
    dropDuplicates'd them to 9.1M, re-attached both signatures with two
    more shuffles, and ran an interpreted zip_with per pair; now ONE
    shuffle carries n_docs x bands signature rows (80k at sf0.1) and
    only verified matches cross back. Each pair is emitted exactly once
    — by the FIRST band in which the pair agrees — so no dedup pass
    exists at all.
    """
    if k % bands:
        raise ValueError(
            f"k={k} must be divisible by bands={bands} — a remainder "
            "would silently drop the trailing signature components"
        )
    rows_per_band = k // bands
    sig = _sig_table(df, text_col, id_col, k, ngram, portable)

    def bucket(b):
        # same encodings as _banded: collision-free joined-decimal
        # slice for portable mode, banded xxhash64 fold otherwise
        sl = F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
        if portable:
            return F.concat_ws("-", F.transform(sl, lambda v: v.cast("string")))
        return F.aggregate(
            sl, F.xxhash64(b), lambda acc, v: F.xxhash64(acc, v)
        )

    bucketed = sig.select(
        "id",
        "sig",
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)), bucket
        ).alias("__bks"),
    )
    # non-portable buckets are xxhash64 folds: slice equality implies
    # bucket equality but not conversely, so the judge needs the actual
    # bucket array to reproduce the old candidate semantics exactly
    # (fold collisions included). Portable buckets are collision-free
    # slice encodings — signature-slice equality IS bucket equality,
    # so the (string) array need not ride the shuffle.
    carry = [] if portable else ["__bks"]
    exploded = bucketed.select(
        "id",
        "sig",
        *carry,
        F.posexplode("__bks").alias("band", "bucket"),
    )
    # pre-partition on the GROUP key with an explicit width: the judge
    # stage is compute-bound (pairwise work ∝ Σ m² per bucket), so
    # AQE's size-based coalescing — which sees only the ~0.5 KB/row
    # signature bytes — would fold the whole stage into 1-2 tasks and
    # serialize it (measured at sf0.1). An explicit hash partitioning
    # on (band, bucket) satisfies applyInPandas' required clustering,
    # so no second exchange is inserted; width scales with the session's
    # core count, not a constant tuned to this box.
    par = df.sparkSession.sparkContext.defaultParallelism
    pairs = (
        exploded.repartition(max(2 * par, 16), "band", "bucket")
        .groupBy("band", "bucket")
        .applyInPandas(
            _lsh_group_judge(k, bands, threshold, portable),
            "a long, b long, matches int",
        )
    )
    # fr (floor-truncation), NOT round: matches/k is only
    # round-vs-floor-identical for power-of-two k; for any other k
    # round(double) hits the Spark-HALF_UP vs DuckDB divergence the
    # repo policy exists to avoid. The judge pre-filtered on the SAME
    # floored estimate (bit-identical IEEE sequence in numpy), so the
    # where() below is a no-op safety net, not a semantic filter.
    from gpdb_spark.registry import fr as _fr

    est = _fr(F.col("matches").cast("double") / F.lit(float(k)), 6)
    return (
        pairs.withColumn("est_jaccard", est)
        .where(F.col("est_jaccard") >= threshold)
        .select("a", "b", "est_jaccard")
    )


def _lsh_group_judge(k: int, bands: int, threshold: float, portable: bool):
    """Per-(band, bucket) candidate verification for minhash_lsh_pairs.

    Emits (a, b, matches) for every pair in the group with
    floor6(matches/k) >= threshold AND whose FIRST agreeing band is this
    group's band — each qualifying pair is emitted exactly once across
    all groups, with est computed from full-signature agreement.

    Value identity with the join/zip_with formulation:
    - candidate set: a pair is a candidate iff its buckets agree in >= 1
      band. Every group the pair shares sees the same signature rows, so
      "first agreeing band" is well-defined and selects exactly one
      emitting group per candidate pair (for portable mode, slice
      equality == bucket equality because the bucket is a collision-free
      decimal encoding of the slice; for xxhash mode the judge compares
      the actual bucket values, fold collisions included).
    - est: matches is an exact integer; floor(matches/k*1e6)/1e6 runs
      the identical IEEE double sequence numpy-side and JVM-side, so the
      numpy pre-filter keeps exactly the rows fr() keeps.
    - ordering (a < b): ids are unique within a group; rows are sorted
      by id so emitting upper-triangle index pairs is emitting a < b.

    Skew note (guide §2.5): a hot bucket of m docs is O(m^2) work here
    exactly as it was O(m^2) shuffled rows before — but as vectorized
    numpy inside one task instead of m^2/2 rows through three exchanges.
    The equality tensor is row-chunked to bound memory at ~4M elements.
    """

    rpb = k // bands

    def judge(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                "matches": pd.Series([], dtype="int32"),
            }
        )
        m = len(pdf)
        if m < 2:
            return empty
        band = int(pdf["band"].iloc[0])
        ids = pdf["id"].to_numpy(dtype=np.int64)
        S = np.stack(pdf["sig"].to_numpy()).astype(np.int64)  # (m, k)
        # FACTORIZE by full signature: near-dup buckets are cliques of
        # docs with IDENTICAL signatures (that is what put them in one
        # bucket), so pairwise work collapses from m^2 to u^2 signature
        # classes (measured u << m on duplicate-heavy corpora; u == m is
        # the graceful worst case). matches/bandeq/first-band/est are
        # class-level facts; member pairs inherit them by expansion.
        U, uidx, inv = np.unique(
            S, axis=0, return_index=True, return_inverse=True
        )
        u = len(uidx)
        # class membership, member ids ascending within each class
        ordc = np.lexsort((ids, inv))
        sorted_ids, sorted_inv = ids[ordc], inv[ordc]
        starts = np.searchsorted(sorted_inv, np.arange(u))
        ends = np.append(starts[1:], m)
        Bu = None
        if not portable:
            # buckets are a pure function of the signature, so one
            # representative row per class carries the class's buckets
            Bu = np.stack(pdf["__bks"].to_numpy()).astype(np.int64)[uidx]

        out_a, out_b, out_m = [], [], []
        sz = ends - starts

        # same-class pairs: matches = k exactly, est = 1.0, every band
        # agrees, so the first agreeing band is 0 — band 0's group owns
        # the emission (exactly once globally). Vectorized square-index
        # expansion with an i<j mask; member ids ascend within a class,
        # so i<j is a<b.
        if band == 0 and 1.0 >= threshold:
            big = np.nonzero(sz > 1)[0]
            if len(big):
                s = sz[big]
                cnt = s * s
                rep_s = np.repeat(s, cnt)
                cum0 = np.concatenate(([0], np.cumsum(cnt)[:-1]))
                pos = np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(
                    cum0, cnt
                )
                ia = pos // rep_s
                jb = pos - ia * rep_s
                keep = ia < jb
                base = np.repeat(starts[big], cnt)
                out_a.append(sorted_ids[(base + ia)[keep]])
                out_b.append(sorted_ids[(base + jb)[keep]])
                out_m.append(np.full(int(keep.sum()), k, dtype=np.int32))

        # cross-class pairs, chunked over class rows to bound the
        # (c, u, k) equality tensor; qualifying CLASS pairs are
        # collected, then expanded to member pairs fully vectorized
        qa, qb, qm = [], [], []
        ch = max(1, 16_000_000 // max(1, u * k))
        for st in range(0, u - 1, ch):
            en = min(st + ch, u - 1)
            E = U[st:en, None, :] == U[None, :, :]  # (c, u, k)
            matches = E.sum(axis=2, dtype=np.int64)
            if portable:
                bandeq = E.reshape(en - st, u, bands, rpb).all(axis=3)
            else:
                bandeq = Bu[st:en, None, :] == Bu[None, :, :]
            first = bandeq.argmax(axis=2)  # first agreeing band index
            est = np.floor(matches / np.float64(k) * 1e6) / 1e6
            jmask = np.arange(u)[None, :] > np.arange(st, en)[:, None]
            sel = (
                jmask
                & bandeq[:, :, band]
                & (first == band)
                & (est >= threshold)
            )
            ci, bj = np.nonzero(sel)
            if len(ci):
                qa.append(ci + st)
                qb.append(bj)
                qm.append(matches[ci, bj])
        if qa:
            A = np.concatenate(qa)
            B = np.concatenate(qb)
            MV = np.concatenate(qm)
            nb = sz[B]
            cnt = sz[A] * nb
            rep_nb = np.repeat(nb, cnt)
            cum0 = np.concatenate(([0], np.cumsum(cnt)[:-1]))
            pos = np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(
                cum0, cnt
            )
            ia = pos // rep_nb
            jb = pos - ia * rep_nb
            a_ids = sorted_ids[np.repeat(starts[A], cnt) + ia]
            b_ids = sorted_ids[np.repeat(starts[B], cnt) + jb]
            out_a.append(np.minimum(a_ids, b_ids))
            out_b.append(np.maximum(a_ids, b_ids))
            out_m.append(np.repeat(MV, cnt).astype(np.int32))

        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "a": np.concatenate(out_a),
                "b": np.concatenate(out_b),
                "matches": np.concatenate(out_m),
            }
        )

    return judge


def _banded(sig: DataFrame, k: int, bands: int, portable: bool = False) -> DataFrame:
    """Explode a signature table into (id, band, bucket) rows; bucket =
    hash-fold of the band's signature slice (h = xxhash64(h, v) per
    component — stays in long arithmetic, no string building).
    Portable mode uses the joined decimal string of the slice instead:
    collision-free by construction and reproducible by any engine (the
    band index is already a separate join key, so identical slices in
    different bands cannot collide)."""
    if k % bands:
        raise ValueError(
            f"k={k} must be divisible by bands={bands} — a remainder "
            "would silently drop the trailing signature components"
        )
    rows_per_band = k // bands

    def bucket(b):
        sl = F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
        if portable:
            return F.concat_ws("-", F.transform(sl, lambda v: v.cast("string")))
        return F.aggregate(
            sl,
            # seed with the band index so identical slices in
            # different bands land in distinct buckets
            F.xxhash64(b),
            lambda acc, v: F.xxhash64(acc, v),
        )

    return sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(b.alias("band"), bucket(b).alias("bucket")),
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_dedup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 64,
    bands: int = 16,
    ngram: int = 1,
    max_iter: int = 30,
    portable: bool = False,
) -> DataFrame:
    """Scale-path dedup: (doc_id, keep_id) cluster assignment WITHOUT
    materializing near-dup pairs. (``portable=True``: md5-derived hash
    family — engine-reproducible signatures, ~3x hashing cost.)

    A bucket of m near-identical docs produces m^2/2 pairs under the pairs
    formulation — quadratic in cluster size, fatal at 100 TB (a 1M-doc
    boilerplate cluster = 5e11 pairs). Here each bucket only contributes
    m (id -> bucket-min) edges; label propagation to the fixpoint then
    yields connected-component representatives in O(E * iters) with
    E = n_docs * bands. This is how production web-dedup pipelines run
    MinHash at corpus scale.
    """
    # zero-shingle docs have no signature — they rejoin as singleton
    # clusters at the end (see the final left join)
    sig = _sig_table(df, text_col, id_col, k, ngram, portable)
    # doc <-> bucket bipartite edges; components found by alternating
    # min-label propagation doc -> bucket -> doc. Pointer jumping alone is
    # NOT enough: a component's min may only be reachable through a
    # *neighbor* (1-{1,2}, 2-{0,2}: label(1) must learn 0 via doc 2), so
    # each round must traverse the actual edges. Convergence in
    # O(component diameter) rounds; dup clusters are bucket-cliques, so
    # diameter is tiny in practice.
    # Right-size the edge table's partitioning before the loop: memb has
    # EXACTLY n_docs * bands rows of three longs (n_docs is metadata-only
    # for a parquet-backed input; one cheap count otherwise), so the global shuffle default is usually
    # 10-100x too wide for it and every LP round pays idle-task
    # scheduling. Pre-partition on the bucket key at ~1M rows/partition
    # (≈24 MB): the per-round groupBy(band, bucket) reuses this hash
    # partitioning shuffle-free, and at 10^10 edges the same formula
    # yields thousands of partitions. Measured at sf0.1: LP loop
    # 5.5 s -> 2 s.
    n_edges = df.count() * bands
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    parts = int(max(4, min(-(-n_edges // 1_000_000), 4 * parallelism)))
    memb = _banded(sig, k, bands, portable).repartition(parts, "band", "bucket").persist()

    # labels start as the identity map, realized implicitly by round 0's
    # bucket-min (no separate distinct/materialize job).
    def _prop(lbls):
        """One label-propagation round as a LAZY plan: each doc takes the
        min of its buckets' min labels (its own label rides through its
        buckets, so labels are monotone non-increasing)."""
        if lbls is None:
            bucket_lbl = memb.groupBy("band", "bucket").agg(
                F.min("id").alias("blbl")
            )
        else:
            bucket_lbl = (
                memb.join(lbls, "id")
                .groupBy("band", "bucket")
                .agg(F.min("label").alias("blbl"))
            )
        return (
            memb.join(bucket_lbl, ["band", "bucket"])
            .groupBy("id")
            .agg(F.min("blbl").alias("label"))
        )

    # r11 optimization: every ACTION evaluates a PAIR of propagation
    # rounds and the convergence test compares the pair's second round
    # against its first (labels are monotone, so "one full round changed
    # nothing" is the fixpoint test wherever it appears). Typical dup
    # clusters are bucket-cliques: round 0 assigns bucket-mins, round 1
    # confirms — previously 2 scheduling waves + 2 collects, now ONE
    # (measured: the loop's wall time is stage-scheduling-bound at any
    # per-round data size; chains still converge, at 2 label hops per
    # wave, bounded by 2*max_iter rounds).
    labels = None
    for it in range(max_iter):
        l0 = _prop(labels).withColumnRenamed("label", "__l0")
        l1 = (
            memb.join(
                memb.join(l0, "id")
                .groupBy("band", "bucket")
                .agg(F.min("__l0").alias("blbl")),
                ["band", "bucket"],
            )
            .groupBy("id")
            .agg(F.min("blbl").alias("label"))
        )
        new_labels = l1.join(l0, "id").persist()
        n_changed = (
            new_labels.agg(
                F.sum((F.col("label") != F.col("__l0")).cast("long"))
            ).collect()[0][0]
            or 0
        )
        if labels is not None:
            labels.unpersist()
        labels = new_labels.select("id", "label")
        if n_changed == 0:
            break
    else:
        memb.unpersist()
        # refuse rather than return a silently-unconverged clustering
        # (same class as the graph.py round-10 stress-twin find)
        raise RuntimeError(
            f"minhash label propagation did not converge in {2 * max_iter} "
            "rounds — raise max_iter (component diameter exceeds it)")
    memb.unpersist()
    # re-attach zero-shingle docs as singleton clusters (keep_id = own id).
    # Plain column-pruned id scan — the heavy-operator spread() fan-out
    # would only add a shuffle of the id column here (r11).
    ids = df.select(F.col(id_col).alias("id"))
    return (
        ids.join(labels, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            F.coalesce(F.col("label"), F.col("id")).alias("keep_id"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

N_BITS = 48  # SimHash width: fits safely in a signed long when packed
N_CHUNKS = 4
CHUNK_BITS = N_BITS // N_CHUNKS


def _token_hash(tk: Column, portable: bool) -> Column:
    """Per-token 60-bit hash. ``portable=True`` (default for
    fingerprinting) derives it from md5 — an engine-independent
    function every SQL engine ships, so signatures are REPRODUCIBLE
    outside Spark (re-computable by a downstream DuckDB/Trino/PG
    consumer, and oracle-checkable). ``portable=False`` uses xxhash64 —
    ~3x cheaper per token, but the values are Spark-specific."""
    if portable:
        return F.conv(F.substring(F.md5(tk), 1, 15), 16, 10).cast("long")
    return F.xxhash64(tk)


def _simhash_bits(text: Column | str, portable: bool = True) -> Column:
    """Array of 48 sign bits: bit j = 1 iff sum over token hashes of
    (+1 if hash-bit j set else -1) is positive.

    Single aggregate pass: one 48-counter accumulator updated per token
    (zip_with), instead of 48 separate aggregate traversals of the token
    array — ~2x faster and one array walk regardless of bit width."""
    toks = F.array_distinct(tokens(text))
    hashes = F.transform(toks, lambda tk: _token_hash(tk, portable))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), N_BITS),
        lambda acc, h: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(N_BITS - 1)),
            lambda x, j: x + F.when(F.getbit(h, j) == 1, 1).otherwise(-1),
        ),
    )
    return F.transform(
        votes,
        lambda v: F.when(v > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
    )


def _pack_bits(bits: Column, start: Column | int, n: int) -> Column:
    """Fold n bits (from 1-based ``start``) into a long: acc*2 + bit.
    No shift-by-column (Spark's shiftleft only takes literal counts)."""
    return F.aggregate(
        F.slice(bits, start, n),
        F.lit(0).cast("long"),
        lambda acc, bit: acc * 2 + bit,
    )


def simhash48(text: Column | str, portable: bool = True) -> Column:
    """48-bit SimHash signature packed into a long."""
    return _pack_bits(_simhash_bits(text, portable), 1, N_BITS)


def hamming(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    portable: bool = True,
) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance <= max_hamming.

    Candidate generation: split the 48-bit signature into 4 12-bit chunks;
    any pair within hamming<=3 must agree on >=1 chunk (pigeonhole), so an
    equi-join on (chunk_idx, chunk_value) finds all candidates without an
    all-pairs scan.

    ``portable=True`` uses the md5-derived token hash (_token_hash):
    fingerprints are engine-independent — a downstream consumer can
    recompute/verify them without Spark, and the whole operator is
    DuckDB-oracle-checkable. Pass ``portable=False`` for the ~3x
    cheaper xxhash64 when signatures never leave this engine.
    """
    if max_hamming >= N_CHUNKS:
        # the pigeonhole guarantee needs strictly more chunks than the
        # hamming budget: a pair differing by one bit in EVERY chunk
        # shares no (chunk, val) key and would silently go missing
        raise ValueError(
            f"max_hamming must be < {N_CHUNKS} (one agreeing chunk is "
            "only guaranteed below the chunk count); raise N_CHUNKS for "
            "larger radii"
        )
    # bits in their own projection: the array is packed 5x below (full sig
    # + 4 chunks), and CollapseProject keeps a non-cheap multi-referenced
    # expression materialized once per row rather than inlining 5 copies.
    # (r12 tested and REJECTED: moving the vote/sign/pack stage to one
    # numpy pass per Arrow batch, srp_buckets-style — parity-identical,
    # but interleaved A/B at sf0.1 measured the signature pass 0.48 s JVM
    # vs 0.98 s Arrow (the JVM-side tokenize+md5 dominates and the
    # fixture's 1-3 scan tasks leave the worker roundtrip unamortized),
    # and a 10x-corpus rerun on 32 partitions was a wash, 1.20 vs 1.16 s.
    # The r11 sweep's 5.9 s entry that motivated the experiment
    # re-measured at 1.03 s isolated on the unchanged tree — co-tenant
    # phase noise, not a plan defect.)
    sig = (
        spread(df)
        # zero-token docs carry no signal: every vote is 0, so all
        # empties would share sig=0 and pair with hamming 0 — exclude
        # them (exact_dedup owns identical-empty handling)
        .where(F.array_size(tokens(F.col(text_col))) > 0)
        .select(
            F.col(id_col).alias("id"),
            _simhash_bits(F.col(text_col), portable).alias("__bits"),
        )
        .select(
            "id",
            _pack_bits(F.col("__bits"), 1, N_BITS).alias("sig"),
            F.transform(
                F.sequence(F.lit(0), F.lit(N_CHUNKS - 1)),
                lambda c: _pack_bits(F.col("__bits"), c * CHUNK_BITS + 1, CHUNK_BITS),
            ).alias("chunks"),
        )
        # read by BOTH sides of the candidate self-join — without this the
        # whole signature pass runs twice
        .persist()
    )
    chunked = sig.select(
        "id",
        "sig",
        F.posexplode("chunks").alias("chunk", "val"),
    )
    a = chunked.select(F.col("id").alias("a"), F.col("sig").alias("sig_a"), "chunk", "val")
    b = chunked.select(F.col("id").alias("b"), F.col("sig").alias("sig_b"), "chunk", "val")
    return (
        a.join(b, ["chunk", "val"])
        .where(F.col("a") < F.col("b"))
        # hamming is an 8-byte xor+popcount on columns already in the join
        # output — filter BEFORE dropDuplicates so the dedup shuffle only
        # carries true matches (<= 4 copies each), not every hot-chunk
        # candidate (quadratic in bucket size)
        .withColumn("hamming", hamming(F.col("sig_a"), F.col("sig_b")))
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["a", "b"])
        .select("a", "b", "hamming")
    )
