"""Self-validation for the rows-only datapipe operators (the ones the
driver checks rows-only because they have no cross-engine oracle):
MinHash LSH, SimHash, LSH ANN, multimodal byte stats, langid, approx NDV.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def embeds(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_minhash_lsh_recall_vs_exact(docs):
    """Every high-Jaccard pair (>=0.85 exact) must be surfaced by the
    banded LSH with estimated jaccard >= 0.6 (s-curve center ~0.55)."""
    from gpdb_spark.datapipe.dedup import jaccard_pairs, minhash_lsh_pairs

    exact = {
        (r.a, r.b): r.jaccard
        for r in jaccard_pairs(docs, ngram=1, threshold=0.85).collect()
    }
    approx = {
        (r.a, r.b) for r in minhash_lsh_pairs(docs, threshold=0.6).collect()
    }
    assert exact, "fixture should contain high-similarity token-set pairs"
    recall = len(set(exact) & approx) / len(exact)
    assert recall >= 0.95, f"minhash LSH recall too low: {recall}"


def test_minhash_estimate_tracks_exact(docs):
    """Estimated Jaccard from signature agreement should track exact
    Jaccard within 0.2 on average for surfaced pairs."""
    from gpdb_spark.datapipe.dedup import jaccard_pairs, minhash_lsh_pairs

    exact = {
        (r.a, r.b): r.jaccard
        for r in jaccard_pairs(docs, ngram=1, threshold=0.5).collect()
    }
    est = {
        (r.a, r.b): r.est_jaccard
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    common = set(exact) & set(est)
    assert len(common) > 10
    mae = sum(abs(exact[p] - est[p]) for p in common) / len(common)
    assert mae < 0.15, f"minhash estimate MAE too high: {mae}"


def test_minhash_clusters_consistent_with_pairs(docs):
    """Cluster labels must be (a) idempotent representatives (every keep_id
    is its own cluster's min doc_id) and (b) consistent with the pairs
    formulation: both endpoints of any high-confidence LSH pair land in the
    same cluster."""
    from gpdb_spark.datapipe.dedup import minhash_dedup_clusters, minhash_lsh_pairs

    labels = {
        r.doc_id: r.keep_id for r in minhash_dedup_clusters(docs).collect()
    }
    # every doc labeled; representative is a member of its own cluster
    assert len(labels) == docs.count()
    for doc, rep in labels.items():
        assert labels[rep] == rep, f"rep {rep} of {doc} is not a fixpoint"
        assert rep <= doc
    # pairs → same cluster (banding is identical, so this must hold
    # transitively)
    for r in minhash_lsh_pairs(docs, threshold=0.6).limit(2000).collect():
        assert labels[r.a] == labels[r.b]


def test_simhash_finds_near_identical(docs, spark):
    """Inject exact duplicates -> SimHash distance 0 pairs must include
    them; all reported pairs must satisfy the hamming bound."""
    from gpdb_spark.datapipe.dedup import simhash_pairs

    base = docs.limit(20)
    dupes = base.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "lang", "source", "n_chars")
    test_df = docs.unionByName(dupes)
    pairs = simhash_pairs(test_df, max_hamming=3).collect()
    got = {(r.a, r.b) for r in pairs if r.hamming == 0}
    want = {
        (r.doc_id, r.doc_id + 1_000_000) for r in base.select("doc_id").collect()
    }
    assert want <= got, f"missing exact-dup pairs: {want - got}"
    assert all(r.hamming <= 3 for r in pairs)


def test_lsh_ann_recall(embeds):
    """SRP-LSH top-5 must recover >=70% of brute-force top-5 (measured
    ~0.94 with 16 tables x 4 planes on the random fixture)."""
    from gpdb_spark.datapipe.similarity import brute_force_topk, lsh_topk

    q = embeds.where(F.col("vec_id") < 20)
    bf = {
        (r.query_id, r.corpus_id)
        for r in brute_force_topk(embeds, q, k=5).collect()
    }
    ap = {
        (r.query_id, r.corpus_id)
        for r in lsh_topk(embeds, q, k=5, tables=16, planes_per_table=4).collect()
    }
    recall = len(bf & ap) / len(bf)
    assert recall >= 0.7, f"LSH ANN recall too low: {recall}"


def test_ivf_ann_recall(embeds):
    """IVF probing 8 of 16 cells must recover >=70% of brute-force top-5
    while scanning ~half the corpus per query. (The fixture is isotropic
    gaussian noise — the worst case for a coarse quantizer; real embedding
    corpora cluster and need far fewer probes for the same recall.)"""
    from gpdb_spark.datapipe.similarity import brute_force_topk, ivf_topk

    q = embeds.where(F.col("vec_id") < 20)
    bf = {
        (r.query_id, r.corpus_id)
        for r in brute_force_topk(embeds, q, k=5).collect()
    }
    got = {
        (r.query_id, r.corpus_id)
        for r in ivf_topk(embeds, q, k=5, n_centroids=16, n_probe=8).collect()
    }
    recall = len(bf & got) / len(bf)
    assert recall >= 0.7, f"IVF recall too low: {recall}"


def test_brute_force_topk_is_exact(embeds):
    """Spot-check the distributed top-k against a numpy argsort on the
    driver for one query vector."""
    from gpdb_spark.datapipe.similarity import brute_force_topk

    rows = embeds.collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    qid = min(vecs)
    qv = vecs[qid] / np.linalg.norm(vecs[qid])
    sims = {
        vid: float(np.dot(qv, v / np.linalg.norm(v)))
        for vid, v in vecs.items()
        if vid != qid
    }
    want = [
        vid
        for vid, _ in sorted(sims.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:5]
    ]
    q = embeds.where(F.col("vec_id") == qid)
    got = [
        r.corpus_id
        for r in brute_force_topk(embeds, q, k=5).orderBy("rnk").collect()
    ]
    assert got == want


def test_multimodal_byte_stats(docs):
    """mapInPandas featurizer values must equal a driver-side numpy
    recompute (entropy, histogram, byte counts)."""
    from gpdb_spark.datapipe.multimodal import attach_binary, byte_stats

    sample = docs.limit(10)
    got = {r.media_id: r for r in byte_stats(attach_binary(sample)).collect()}
    for r in sample.collect():
        payload = r.text.encode("utf-8")
        arr = np.frombuffer(payload, dtype=np.uint8)
        counts = np.bincount(arr, minlength=256).astype(np.float64)
        p = counts[counts > 0] / arr.size
        want_entropy = round(float(-(p * np.log2(p)).sum()), 6)
        g = got[r.doc_id]
        assert g.n_bytes == len(payload)
        assert math.isclose(g.entropy, want_entropy, abs_tol=1e-9)
        assert list(g.histogram16) == list(
            counts.reshape(16, 16).sum(axis=1).astype(np.int64)
        )


def test_multimodal_decode_stub():
    from gpdb_spark.datapipe.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"abc")
    img = decode_image(b"abc", fake=True)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8
    # deterministic
    assert (decode_image(b"abc", fake=True) == img).all()


def test_langid_structure(docs):
    from gpdb_spark.datapipe.text import langid_scores, STOPWORDS

    out = langid_scores(docs.limit(50))
    rows = out.collect()
    codes = set(STOPWORDS)
    assert all(r.lang_pred in codes for r in rows)
    # argmax consistency
    for r in rows:
        best = max(codes, key=lambda c: (r[f"score_{c}"], -ord(c[0])))
        assert r[f"score_{r.lang_pred}"] == r[f"score_{best}"]


def test_jaccard_df_cutoff_bounds_candidates(spark):
    """A near-universal shingle must not explode the candidate-pair count:
    with the document-frequency cutoff, one hot token shared by ALL docs
    produces ZERO candidate pairs (its posting list is dropped), keeping
    the inverted-index join O(n) instead of O(n^2) — the 100 TB skew
    mitigation the docstring promises."""
    from gpdb_spark.datapipe.dedup import jaccard_pairs

    n = 60
    rows = [(i, f"the unique{i}") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # without the cutoff the universal token pairs every doc with every
    # other: the quadratic blowup
    assert jaccard_pairs(df, threshold=0.0).count() == n * (n - 1) // 2
    # with it, the hot posting list is dropped and nothing intersects
    assert (
        jaccard_pairs(df, threshold=0.0, max_df_frac=0.1).count() == 0
    )
    # exact-parity mode (None): each pair shares only "the", jaccard
    # = 1/3, so a 0.4 threshold still filters them all
    assert jaccard_pairs(df, threshold=0.4).count() == 0


def test_approx_count_distinct_error(spark, sf_dir):
    from gpdb_spark.registry import QUERIES
    import gpdb_spark.queries  # noqa: F401

    rows = QUERIES["approx_count_distinct_hll"](spark, sf_dir).collect()
    for r in rows:
        assert r.exact_nd_part > 0
        assert r.hll_within_2pct, f"HLL estimate outside 2% tolerance: {r}"


def test_recursive_cte_union_all_and_distinct(spark):
    from gpdb_spark.operators.recursive import recursive_cte

    seed = spark.range(0, 1).select(F.col("id").cast("int").alias("n"))
    out = recursive_cte(
        seed,
        lambda prev: prev.where(F.col("n") < 5).select((F.col("n") + 1).alias("n")),
    )
    assert sorted(r.n for r in out.collect()) == [0, 1, 2, 3, 4, 5]

    # distinct mode: step generates overlaps, must still converge
    out2 = recursive_cte(
        seed,
        lambda prev: prev.select(((F.col("n") + 1) % 4).alias("n")),
        distinct=True,
    )
    assert sorted(r.n for r in out2.collect()) == [0, 1, 2, 3]

    with pytest.raises(RuntimeError):
        recursive_cte(
            seed,
            lambda prev: prev.select((F.col("n") + 1).alias("n")),
            max_iterations=3,
        )


def test_blocked_topk_matches_jvm_topk(spark, sf_dir):
    """The BLAS-blocked exact top-k must agree with the JVM-expression
    formulation (identical ordering rule; cos equal to 1e-6)."""
    from gpdb_spark.datapipe.similarity import (
        brute_force_topk,
        brute_force_topk_blocked,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 20)
    a = {
        (r.query_id, r.corpus_id): r.cos
        for r in brute_force_topk(emb, q, k=5).collect()
    }
    b = {
        (r.query_id, r.corpus_id): r.cos
        for r in brute_force_topk_blocked(emb, q, k=5).collect()
    }
    overlap = set(a) & set(b)
    assert len(overlap) >= 0.95 * len(a)  # boundary ties may differ
    for key in overlap:
        assert abs(a[key] - b[key]) < 2e-6, (key, a[key], b[key])


def test_embed_neardup_clusters_match_union_find(spark, sf_dir):
    """components_from_edges == union-find ground truth on the same pairs."""
    from gpdb_spark.registry import QUERIES
    import gpdb_spark.queries  # noqa: F401

    pairs = [
        (r["a"], r["b"])
        for r in QUERIES["embed_cosine_pairs"](spark, sf_dir)
        .where("cos >= 0.35")
        .collect()
    ]
    got = {
        r["vec_id"]: r["component"]
        for r in QUERIES["embed_neardup_clusters"](spark, sf_dir).collect()
    }

    parent: dict[int, int] = {v: v for v in got}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min member id, matching min-label propagation
    members: dict[int, list[int]] = {}
    for v in parent:
        members.setdefault(find(v), []).append(v)
    want = {v: min(ms) for root, ms in members.items() for v in ms}
    assert got == want
    assert len(set(got.values())) < len(got)  # some real merging happened


def test_line_dedup_keep_first_policy(spark):
    """keep_first=True keeps exactly one copy (smallest doc, pos);
    default C4 policy drops all copies of a corpus-duplicated line."""
    from gpdb_spark.datapipe.lines import dedup_lines_across_corpus

    docs = spark.createDataFrame(
        [(1, "shared\nunique-a"), (2, "shared\nunique-b"), (3, "unique-c")],
        ["doc_id", "text"],
    )
    c4 = {r["doc_id"]: r["text"] for r in dedup_lines_across_corpus(docs).collect()}
    assert c4 == {1: "unique-a", 2: "unique-b", 3: "unique-c"}
    kf = {
        r["doc_id"]: r["text"]
        for r in dedup_lines_across_corpus(docs, keep_first=True).collect()
    }
    assert kf == {1: "shared\nunique-a", 2: "unique-b", 3: "unique-c"}


def test_contamination_flags_exact(spark):
    from gpdb_spark.datapipe.lines import contamination_flags

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "totally different words here")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in contamination_flags(docs, ["x alpha beta gamma y"], n=3).collect()
    }
    assert got == {1: (1, True), 2: (0, False)}


def test_canonicalize_url_policy(spark):
    """datapipe/urls.py canonicalization policy edge cases."""
    from gpdb_spark.datapipe.urls import canonicalize_url

    cases = [
        # scheme/host fold + default port + fragment
        ("HTTP://WWW.Ex.COM:80/A/b#frag", "http://www.ex.com/A/b"),
        # https default port dropped, non-default kept
        ("https://ex.com:443/p", "https://ex.com/p"),
        ("https://ex.com:8443/p", "https://ex.com:8443/p"),
        # tracking params out, rest sorted; trailing slash dropped
        (
            "http://ex.com/a/?z=1&utm_source=tw&a=2&fbclid=xyz",
            "http://ex.com/a?a=2&z=1",
        ),
        # root path slash kept; empty query omitted
        ("http://ex.com/?utm_campaign=c", "http://ex.com/"),
        # review regressions: empty path == root (RFC 3986 §6.2.3) —
        # the most common crawl duplicate pair collapses
        ("http://ex.com", "http://ex.com/"),
        # fbclid/gclid match by EXACT name; gclidtype is legitimate
        (
            "http://ex.com/p?gclidtype=x&id=1&gclid=abc",
            "http://ex.com/p?gclidtype=x&id=1",
        ),
        # unparseable URL canonicalizes to ITSELF (no shared NULL group)
        ("mailto:a@b.com", "mailto:a@b.com"),
        ("not a url", "not a url"),
    ]
    df = spark.createDataFrame(cases, "url string, want string")
    rows = df.select(
        canonicalize_url("url").alias("got"), "want"
    ).collect()
    for r in rows:
        assert r.got == r.want, (r.got, r.want)


class TestLmQuality:
    def test_scores_are_finite_and_lower_for_natural_text(self, spark):
        """A doc made of corpus-frequent bigrams must score lower
        (more likely) than a doc of unique junk tokens."""
        from gpdb_spark.datapipe.lm import lm_quality, train_bigram_lm

        base = [(f"d{i}", "the cat sat on the mat and the dog ran") for i in range(20)]
        docs = spark.createDataFrame(
            base + [("junk", "zq1 xv9 qqj kkz pwy vvx bbn mmq")],
            "doc_id string, text string",
        )
        vocab, bi = train_bigram_lm(docs, "text", vocab_size=1000, max_bigrams=1000)
        out = {r.doc_id: r for r in lm_quality(docs, vocab, bi, vocab_size=1000).collect()}
        assert out["d0"].avg_nll_milli < out["junk"].avg_nll_milli
        assert out["d0"].n_pairs == 9
        assert all(r.nll_sum_micro > 0 for r in out.values())

    def test_short_docs_excluded(self, spark):
        from gpdb_spark.datapipe.lm import lm_quality, train_bigram_lm

        docs = spark.createDataFrame(
            [("a", "one two three"), ("b", "single"), ("c", "")],
            "doc_id string, text string",
        )
        vocab, bi = train_bigram_lm(docs, "text", vocab_size=10, max_bigrams=10)
        ids = {r.doc_id for r in lm_quality(docs, vocab, bi, vocab_size=10).collect()}
        assert ids == {"a"}

    def test_vocab_cutoff_is_deterministic(self, spark):
        """Ties at the vocab boundary break on word order — same model
        every run regardless of partitioning."""
        from gpdb_spark.datapipe.lm import train_bigram_lm

        docs = spark.createDataFrame(
            [("a", "aa bb cc dd ee ff"), ("b", "aa bb cc dd ee ff")],
            "doc_id string, text string",
        )
        v1, _ = train_bigram_lm(docs, "text", vocab_size=3)
        v2, _ = train_bigram_lm(docs.repartition(7), "text", vocab_size=3)
        assert sorted(r.w for r in v1.collect()) == sorted(r.w for r in v2.collect()) == ["aa", "bb", "cc"]


def test_ivf_flat_recall(embeds):
    """The untrained flat quantizer probing 8/16 cells must still
    recover >=60% of brute-force top-5 on the random fixture (trained
    centroids do better on clustered corpora; ids are geometry-blind
    here, so this is the floor)."""
    from gpdb_spark.datapipe.similarity import brute_force_topk, ivf_topk_flat

    q = embeds.where(F.col("vec_id") < 20)
    bf = {
        (r.query_id, r.corpus_id)
        for r in brute_force_topk(embeds, q, k=5).collect()
    }
    ap = {
        (r.query_id, r.corpus_id)
        for r in ivf_topk_flat(embeds, q, k=5, n_centroids=16, n_probe=8).collect()
    }
    recall = len(bf & ap) / len(bf)
    assert recall >= 0.6, f"flat IVF recall too low: {recall}"


class TestDupSpans:
    def test_alignment_independent_detection(self, spark):
        """Two docs share a 40-token run at DIFFERENT offsets — content
        anchoring must flag spans in both (a fixed-stride grid would
        miss out-of-phase copies)."""
        from gpdb_spark.datapipe.spans import dup_spans

        shared = " ".join(f"tok{i}" for i in range(40))
        docs = spark.createDataFrame(
            [
                ("a", "lead in words " + shared + " tail"),
                ("b", "x " + shared + " different ending here"),
                ("c", " ".join(f"uniq{i}" for i in range(60))),
            ],
            "doc_id string, text string",
        )
        out = {r.doc_id: r for r in dup_spans(docs, window=16, anchor_mod=4).collect()}
        assert out["a"].n_dup_spans > 0 and out["b"].n_dup_spans > 0
        assert out["c"].n_dup_spans == 0
        assert list(out["a"].dup_starts) == sorted(out["a"].dup_starts)

    def test_short_docs_have_no_spans(self, spark):
        from gpdb_spark.datapipe.spans import dup_spans

        docs = spark.createDataFrame(
            [("s", "only five tokens right here"),
             ("t", " ".join(f"w{i}" for i in range(30)))],
            "doc_id string, text string",
        )
        ids = {r.doc_id for r in dup_spans(docs, window=16, anchor_mod=4).collect()}
        assert "s" not in ids  # < window tokens -> no anchored spans

    def test_stays_jvm_side(self, spark):
        from gpdb_spark.datapipe.spans import dup_spans

        docs = spark.createDataFrame(
            [("a", " ".join(f"w{i}" for i in range(30)))],
            "doc_id string, text string",
        )
        plan = dup_spans(docs)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_domain_mix_hits_target_weights(docs, spark):
    """mix_to_weights: output proportions approach the targets, the
    binding domain is never oversampled, and reruns are identical."""
    from gpdb_spark.datapipe.sample import mix_to_weights

    w = {"en": 0.5, "de": 0.25, "fr": 0.25}
    out = mix_to_weights(docs.select("doc_id", "lang"), "lang", w, "doc_id")
    got = {r.lang: r.n for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    src = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(got) <= set(w)
    # binding domain keeps ~everything; others downsample toward targets
    total = sum(got.values())
    for lang, frac in w.items():
        if lang in got:
            assert got[lang] <= src[lang]
            assert abs(got[lang] / total - frac) < 0.15  # hash-sample variance
    rerun = mix_to_weights(docs.select("doc_id", "lang"), "lang", w, "doc_id")
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in rerun.collect())


def test_ivf_trained_portable_recall_and_plan(embeds):
    """The oracled trained-IVF twin must (a) reach the same recall bar
    as the numpy-trained path and (b) assign corpus cells via a
    BROADCAST of the bounded centroid relation — never a shuffle of the
    corpus for the quantizer, and no cartesian product anywhere."""
    from gpdb_spark.datapipe.similarity import (
        brute_force_topk,
        ivf_topk_trained_portable,
    )

    q = embeds.where(F.col("vec_id") < 20)
    res = ivf_topk_trained_portable(
        embeds, q, k=5, n_centroids=16, n_probe=8, iters=2, sample_size=256
    )
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan

    bf = {
        (r.query_id, r.corpus_id)
        for r in brute_force_topk(embeds, q, k=5).collect()
    }
    got = {(r.query_id, r.corpus_id) for r in res.collect()}
    recall = len(bf & got) / len(bf)
    assert recall >= 0.7, f"trained-portable IVF recall too low: {recall}"


def test_resize_nearest_math():
    """Nearest-neighbor resize is pure index sampling: known 4x4 -> 2x2."""
    import numpy as np

    from gpdb_spark.datapipe.multimodal import resize_nearest

    img = np.arange(4 * 4 * 3).reshape(4, 4, 3)
    small = resize_nearest(img, 2, 2)
    # out[r,c] = in[2r, 2c]
    assert (small == img[[0, 2]][:, [0, 2]]).all()
    # identity resize
    assert (resize_nearest(img, 4, 4) == img).all()


def test_image_features_deterministic_and_empty(spark):
    """decode(fake)->resize->featurize is a pure function of the bytes;
    empty payloads give all-zero features (the degenerate-doc class)."""
    from gpdb_spark.datapipe.multimodal import attach_binary, image_features

    df = spark.createDataFrame(
        [(1, "abcdef" * 40), (2, ""), (3, "xyz")], "doc_id long, text string"
    )
    out = {r.media_id: r for r in image_features(attach_binary(df)).collect()}
    assert out[2].mean_r_milli == 0 and out[2].pixel_checksum == 0
    out2 = {r.media_id: r for r in image_features(attach_binary(df)).collect()}
    assert {k: tuple(v) for k, v in out.items()} == {
        k: tuple(v) for k, v in out2.items()
    }
    # sanity: means are (sum*1000)//16 of real sampled bytes
    assert 0 < out[1].mean_r_milli < 256_000


def test_frame_manifest_shapes(spark):
    """Frame manifest: nf = bytes*fps//rate rows per doc, exact
    centisecond times, zero rows for too-short payloads."""
    from gpdb_spark.datapipe.multimodal import attach_binary, frame_manifest

    df = spark.createDataFrame(
        [(1, "a" * 250), (2, "ab"), (3, "")], "doc_id long, text string"
    )
    rows = frame_manifest(attach_binary(df), bytes_per_s=100, fps=2).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append((r.frame_idx, r.t_centis))
    assert sorted(by_id[1]) == [(0, 0), (1, 50), (2, 100), (3, 150), (4, 200)]
    assert 2 not in by_id and 3 not in by_id


def test_quantize_zero_vector_and_scale(spark):
    """Review regression: the all-zero vector gets zero codes /
    scale_micro 0 / sse 0 via an explicit branch (an epsilon guard made
    scale_micro overflow BIGINT — Spark clamps, DuckDB raises)."""
    from gpdb_spark.datapipe.quantize import quantize_int8, quantize_stats

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [0.5, -1.0, 0.25])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in quantize_stats(df).collect()}
    assert rows[1].q8 == [0, 0, 0]
    assert rows[1].scale_micro == 0 and rows[1].sse_nano == 0
    assert rows[2].q8 == [64, -127, 32]  # floor(x*127 + .5)
    assert rows[2].scale_micro == 127_000_000
    q = df.select("vec_id", quantize_int8("embedding").alias("q")).collect()
    assert {r.vec_id: r.q for r in q}[1] == [0, 0, 0]


class TestSemDedup:
    def test_prune_invariants(self, embeds, spark):
        """Greedy-by-centroid-rank prune: rnk 1 is never dropped; every
        dropped member is tau-similar to some higher-ranked bucket-mate;
        kept members have no tau-similar HIGHER-RANKED mate (lower-ranked
        tau-pairs are allowed — the drop lands on the lower rank)."""
        from gpdb_spark.datapipe.similarity import semdedup_prune, dec_dot, dec_norm
        from gpdb_spark.registry import fr

        res = semdedup_prune(embeds, "embedding", dim=64, planes=4, tau=0.35)
        rows = res.collect()
        assert len(rows) == embeds.count()
        by_id = {r.vec_id: r for r in rows}
        assert all(not r.dropped for r in rows if r.rnk == 1)
        assert 0 < sum(r.dropped for r in rows) < len(rows)

        # recompute the tau pair graph independently (exact decimal cosine)
        e = embeds.select("vec_id", "embedding")
        a = e.selectExpr("vec_id as a", "embedding as va")
        b = e.selectExpr("vec_id as b", "embedding as vb")
        import pyspark.sql.functions as F

        pairs = (
            a.join(b, F.col("a") < F.col("b"))
            .withColumn(
                "pc",
                fr(
                    dec_dot(F.col("va"), F.col("vb")).cast("double")
                    / (dec_norm(F.col("va")) * dec_norm(F.col("vb"))),
                    5,
                ),
            )
            .where(F.col("pc") >= 0.35)
            .select("a", "b")
            .collect()
        )
        sim = [
            (p.a, p.b)
            for p in pairs
            if by_id[p.a].bucket == by_id[p.b].bucket
        ]
        for x, y in sim:
            hi, lo = sorted((x, y), key=lambda v: by_id[v].rnk)
            assert by_id[lo].dropped, (
                f"{lo} is tau-similar to higher-ranked {hi} but kept"
            )
        dropped_ok = {lo for x, y in sim
                      for lo in [max((x, y), key=lambda v: by_id[v].rnk)]}
        for r in rows:
            if r.dropped:
                assert r.vec_id in dropped_ok, (
                    f"{r.vec_id} dropped without a higher-ranked tau-mate"
                )


class TestDsir:
    def test_target_docs_score_higher(self, docs, spark):
        """DSIR importance weights separate the target domain from the
        rest: the mean weight of source='src0' docs beats the rest, the
        majority of target docs clear the 0 threshold, and scoring is
        deterministic (same fit -> identical weights)."""
        import pyspark.sql.functions as F
        from gpdb_spark.datapipe.dsir import dsir_select, fit_log_ratios, dsir_weights

        res = dsir_select(docs, docs.where(F.col("source") == "src0"))
        j = res.join(docs.select("doc_id", "source"), "doc_id")
        means = {
            r.is_tgt: r.m
            for r in j.groupBy((F.col("source") == "src0").alias("is_tgt"))
            .agg(F.avg("weight").alias("m"))
            .collect()
        }
        assert means[True] > means[False] + 1.0
        tgt = j.where(F.col("source") == "src0")
        assert tgt.where("selected").count() > tgt.count() * 0.6
        n_sel = res.where("selected").count()
        assert 0 < n_sel < res.count()

        lr = fit_log_ratios(docs, docs.where(F.col("source") == "src0"))
        again = dsir_weights(docs, lr).select("doc_id", "weight")
        assert res.select("doc_id", "weight").subtract(again).count() == 0

    def test_zero_token_doc_scores_zero(self, spark):
        from gpdb_spark.datapipe.dsir import dsir_weights

        d = spark.createDataFrame(
            [(1, "alpha beta"), (2, "   ")], "doc_id long, text string"
        )
        out = {r.doc_id: r for r in dsir_weights(d, {b: 0.5 for b in range(256)}).collect()}
        assert out[2].n_features == 0 and out[2].weight == 0.0
        assert out[1].n_features == 3  # 2 unigrams + 1 bigram
        assert abs(out[1].weight - 1.5) < 1e-9


class TestFilterCascade:
    def test_provenance_is_first_failing_stage(self, spark, sf_dir):
        """drop_reason must equal the first stage whose pass_* column is
        False, in declaration order, and kept == all pass."""
        from gpdb_spark.datapipe.cascade import filter_cascade

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        rows = filter_cascade(docs).collect()
        order = ["lang", "min_tokens", "max_tokens", "ttr", "rep_2gram",
                 "stopwords"]
        assert len(rows) == docs.count()
        seen_reasons = set()
        for r in rows:
            fails = [s for s in order if not r[f"pass_{s}"]]
            assert r.kept == (not fails)
            assert r.drop_reason == (fails[0] if fails else None)
            seen_reasons.add(r.drop_reason)
        # the fixture must actually exercise the cascade: kept docs AND
        # at least two distinct drop reasons
        assert None in seen_reasons and len(seen_reasons) >= 3

    def test_degenerate_docs_fail_min_tokens(self, spark):
        from gpdb_spark.datapipe.cascade import filter_cascade

        d = spark.createDataFrame(
            [(1, None, "en"), (2, "   \t \n ", "en"), (3, "word", "en")],
            "doc_id long, text string, lang string",
        )
        out = {r.doc_id: r for r in filter_cascade(d).collect()}
        for k in (1, 2, 3):
            assert out[k].drop_reason == "min_tokens" and not out[k].kept

    def test_custom_stage_list_is_respected(self, spark):
        import pyspark.sql.functions as F
        from gpdb_spark.datapipe.cascade import filter_cascade

        d = spark.createDataFrame(
            [(1, "a b c d e f", "en"), (2, "a b", "en")],
            "doc_id long, text string, lang string",
        )
        stages = [("exactly_two", lambda _: F.col("n_tokens") == 2)]
        out = {r.doc_id: r for r in filter_cascade(d, stages).collect()}
        assert not out[1].kept and out[1].drop_reason == "exactly_two"
        assert out[2].kept and out[2].drop_reason is None


def test_components_long_chain_converges(spark):
    """Round-10 stress-twin find: a chain-shaped component longer than
    the old max_iter=20 silently kept wrong labels. Pointer doubling
    converges in O(log diameter) and exhaustion now raises."""
    from gpdb_spark.datapipe.graph import components_from_edges

    n = 120  # diameter 119 >> the old 20-round cap
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a long, b long")
    out = components_from_edges(nodes, edges).collect()
    assert all(r.component == 0 for r in out)
    assert len(out) == n


def test_minhash_clusters_match_unionfind_ground_truth(spark, sf_dir):
    """r11 optimization gate: the LP loop now evaluates a PAIR of
    propagation rounds per action and convergence-checks the second
    round. Validate the full operator against an independent union-find
    transitive closure of the ACTUAL banded bucket graph (covers every
    component shape the fixture produces, chains included)."""
    from gpdb_spark.catalog import spread
    from gpdb_spark.datapipe.dedup import (
        _banded,
        minhash_dedup_clusters,
        minhash_from_hashes,
        shingle_hashes,
    )
    from gpdb_spark.registry import t

    d = t(spark, sf_dir, "documents")
    k, bands = 64, 16
    sig = (
        spread(d)
        .select(
            F.col("doc_id").alias("id"),
            shingle_hashes(F.col("text"), 1, False).alias("__sh"),
        )
        .where(F.array_size(F.col("__sh")) > 0)
        .select("id", minhash_from_hashes(F.col("__sh"), k, False).alias("sig"))
    )
    memb = _banded(sig, k, bands, False).collect()

    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    by_bucket: dict = {}
    for r in memb:
        by_bucket.setdefault((r.band, r.bucket), []).append(r.id)
    for ids in by_bucket.values():
        for other in ids[1:]:
            union(ids[0], other)

    expected = {}
    for r in memb:
        expected[r.id] = find(r.id)
    got = {
        r.doc_id: r.keep_id
        for r in minhash_dedup_clusters(d, k=k, bands=bands).collect()
    }
    for doc, keep in expected.items():
        assert got[doc] == keep, (doc, got[doc], keep)
    # zero-shingle docs (absent from memb) are singletons
    for doc, keep in got.items():
        if doc not in expected:
            assert keep == doc


def test_brute_force_blocked_refuses_oversized_query_set(embeds):
    """r12 (VERDICT r11 #5): the blocked kernel collects the query set
    driver-side; past max_queries it must refuse loudly instead of
    silently OOMing the driver."""
    from gpdb_spark.datapipe.similarity import brute_force_topk_blocked

    q = embeds.limit(12)
    with pytest.raises(ValueError, match="max_queries"):
        brute_force_topk_blocked(embeds, q, k=3, max_queries=10)
    # under the bound the guard is inert
    ok = brute_force_topk_blocked(embeds, q.limit(3), k=3, max_queries=10)
    assert ok.count() > 0
