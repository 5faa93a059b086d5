"""Behavioral tests for the corpus→training-batches operators
(datapipe/chunking.py, datapipe/quantize.py): boundary math, the
two-level prefix sum vs a serial reference, shuffle determinism,
quantization round-trip — plus the scale-shape plan gates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gpdb_spark.datapipe import chunking as C
from gpdb_spark.datapipe import quantize as Q
from gpdb_spark.registry import t


def test_chunks_reconstruct_document(spark):
    texts = ["", "a", "x" * 255, "y" * 256, "z" * 257, "abcdefghij" * 100]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    )
    out = C.chunk_documents(df, size=256, overlap=32)
    rows = out.orderBy("doc_id", "chunk_idx").collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, s in enumerate(texts):
        chunks = by_doc[i]
        # first chunk + the non-overlapping tail of each later chunk
        rebuilt = chunks[0]["chunk_text"] + "".join(
            c["chunk_text"][32:] for c in chunks[1:]
        )
        assert rebuilt == s
        # every chunk except the last is full-size; starts advance by step
        for j, c in enumerate(chunks):
            assert c["chunk_start"] == j * 224 + 1
            if j < len(chunks) - 1:
                assert c["chunk_len"] == 256


def test_chunking_is_shuffle_free(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.repeat(F.lit("ab "), 200).alias("text")
    )
    plan = C.chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


@pytest.mark.parametrize("bucket_size", [3, 7, 4096])
def test_prefix_sum_matches_serial(spark, bucket_size):
    import random

    rnd = random.Random(7)
    vals = [(i, rnd.randint(0, 50)) for i in range(200)]
    rnd.shuffle(vals)  # arrival order != key order
    df = spark.createDataFrame(vals, "k long, v long").repartition(8)
    out = C.prefix_sum(df, "k", "v", "cum", bucket_size=bucket_size)
    got = {r["k"]: r["cum"] for r in out.collect()}
    acc = 0
    for k, v in sorted(vals):
        assert got[k] == acc
        acc += v


def test_pack_assignments_conserve_and_order(spark):
    df = spark.createDataFrame(
        [(i, 100 + (i * 37) % 900) for i in range(100)], "doc_id long, n long"
    )
    out = C.pack_assignments(df, "n", budget=1000).orderBy("doc_id").collect()
    acc = 0
    for r in out:
        assert r["tok_offset"] == acc
        assert r["bin_start"] == acc // 1000
        assert r["bin_end"] == (acc + r["n_tokens"] - 1) // 1000
        assert r["bin_start"] <= r["bin_end"]
        acc += r["n_tokens"]


def test_shuffle_shards_deterministic_permutation(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id")
    a = C.shuffle_shards(d, seed="42", n_shards=4)
    rows = a.collect()
    assert len(rows) == d.count()
    # per-shard positions are dense 1..n
    per = {}
    for r in rows:
        per.setdefault(r["shard"], []).append(r["position"])
    for shard, ps in per.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # same seed → identical assignment; different seed → different order
    b = {r["doc_id"]: (r["shard"], r["position"]) for r in a.collect()}
    assert b == {r["doc_id"]: (r["shard"], r["position"]) for r in rows}
    c = C.shuffle_shards(d, seed="43", n_shards=4)
    cm = {r["doc_id"]: (r["shard"], r["position"]) for r in c.collect()}
    assert cm != b


def test_quantize_roundtrip_error_small(spark, sf_dir):
    d = t(spark, sf_dir, "embeddings")
    out = Q.quantize_stats(d).collect()
    assert len(out) == d.count()
    for r in out[:50]:
        assert all(-127 <= q <= 127 for q in r["q8"])
        # absmax element maps to ±127
        assert max(abs(q) for q in r["q8"]) == 127
        # reconstruction SSE per dim is tiny relative to int8 step size
        dim = len(r["q8"])
        scale = r["scale_micro"] / 1e6
        mse = r["sse_nano"] / 1e9 / dim
        assert mse <= (1.0 / scale) ** 2  # well under one quant step²


def test_pack_manifest_covers_every_token_exactly_once(spark, sf_dir):
    """Bin spans must partition each doc's tokens: ranges within a doc
    are contiguous from 0 to n_tokens, and within a bin sum to <= budget
    except where a single doc overflows it."""
    from gpdb_spark.registry import QUERIES
    import gpdb_spark.queries  # noqa: F401

    rows = QUERIES["datapipe_pack_manifest"](spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["bin_id"], r["tok_from"], r["tok_to"]))
    for doc, spans in by_doc.items():
        spans.sort()
        assert spans[0][1] == 0
        for (b0, f0, t0), (b1, f1, t1) in zip(spans, spans[1:]):
            assert b1 == b0 + 1 and f1 == t0  # contiguous, no gap/overlap
    # per-bin totals: every bin except possibly the last is exactly full
    per_bin = {}
    for r in rows:
        per_bin[r["bin_id"]] = per_bin.get(r["bin_id"], 0) + (r["tok_to"] - r["tok_from"])
    last = max(per_bin)
    for b, tot in per_bin.items():
        assert tot == 2048 or b == last
