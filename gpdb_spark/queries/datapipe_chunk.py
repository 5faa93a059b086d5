"""Chunking / packing / shuffle / quantization queries — the
"corpus → training batches" tail of the data pipeline (net-new vs the
reference, SURVEY.md §7 training-data mandate).

Every query here is fully JVM-side (no Python UDFs) and carries an exact
DuckDB oracle: integer arithmetic throughout, or floor-scaled integers
after IEEE-identical double math (registry.py determinism policy).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gpdb_spark.registry import query, t
from gpdb_spark.datapipe import chunking as C
from gpdb_spark.datapipe import quantize as Q
from gpdb_spark.datapipe import text as T

_SIZE, _OVERLAP, _STEP = 256, 32, 224
_BUDGET = 2048
_SHARDS = 8


@query(
    "text_chunk_documents",
    oracle=f"""
    SELECT doc_id, CAST(i AS INT) AS chunk_idx,
           CAST((i-1)*{_STEP}+1 AS INT) AS chunk_start,
           substr(text, CAST((i-1)*{_STEP}+1 AS INT), {_SIZE}) AS chunk_text,
           CAST(length(substr(text, CAST((i-1)*{_STEP}+1 AS INT), {_SIZE})) AS INT)
             AS chunk_len
    FROM (
      SELECT doc_id, text,
             unnest(generate_series(1,
               CASE WHEN length(text) <= {_SIZE} THEN 1
                    ELSE CAST(1 + (length(text) - {_SIZE} + {_STEP - 1})
                              // {_STEP} AS INT) END)) AS i
      FROM documents
    ) g
    """,
)
def text_chunk_documents(spark, sf_dir):
    """Sliding-window char chunks (size 256, overlap 32) — the RAG /
    pretraining chunker. flatMap shape: sequence → posexplode →
    substring, zero shuffle (datapipe/chunking.py)."""
    d = t(spark, sf_dir, "documents")
    return C.chunk_documents(d, size=_SIZE, overlap=_OVERLAP)


@query(
    "datapipe_pack_sequences",
    # list_filter mirrors T.tokens (which drops empty strings — DuckDB's
    # unfiltered split returns [''] i.e. 1 token for whitespace-only
    # text); greatest(n_tokens, 1) mirrors pack_assignments' bin_end
    # guard for zero-token docs (negative integer division floors in
    # DuckDB but truncates in Spark).
    oracle=f"""
    SELECT doc_id, n_tokens, cum_before AS tok_offset,
           cum_before // {_BUDGET} AS bin_start,
           (cum_before + greatest(n_tokens, 1) - 1) // {_BUDGET} AS bin_end
    FROM (
      SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_before
      FROM (
        SELECT doc_id,
               CAST(len(list_filter(
                 string_split_regex(trim(lower(text)), '\\s+'),
                 x -> x <> '')) AS BIGINT)
                 AS n_tokens
        FROM documents
      ) tok
    ) cum
    """,
)
def datapipe_pack_sequences(spark, sf_dir):
    """GPT-style concat-and-split packing: global token prefix sum in
    doc_id order, cut every 2048 tokens; per doc its offset and the
    first/last training sequence it spans. The prefix sum is the
    two-level bucket formulation (chunking.prefix_sum) — the only
    narrow stage touches one row per 4096-doc bucket, never a global
    sort. Oracle: DuckDB's exact global window cumsum."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.array_size(T.tokens("text")).cast("long").alias("n_tokens")
    )
    return C.pack_assignments(d, "n_tokens", budget=_BUDGET)


def _hex4(expr: str) -> str:
    """DuckDB integer parse of the first 4 md5 hex digits (exact)."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substr({expr}, {p}, 1)) - 1)"
        f" * {16 ** (4 - p)}"
        for p in range(1, 5)
    )


@query(
    "datapipe_shuffle_shards",
    oracle=f"""
    SELECT doc_id, sort_key, shard,
           CAST(row_number() OVER (PARTITION BY shard
                                   ORDER BY sort_key, doc_id) AS INT)
             AS position
    FROM (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':42') AS sort_key,
             CAST(({_hex4("md5(CAST(doc_id AS VARCHAR) || ':42')")})
                  % {_SHARDS} AS INT) AS shard
      FROM documents
    ) k
    """,
)
def datapipe_shuffle_shards(spark, sf_dir):
    """Deterministic global training shuffle: md5(id:seed) sort key,
    16-bit-prefix shard, per-shard rank. Engine-portable (md5 family) so
    the exact training order is reproducible outside Spark."""
    d = t(spark, sf_dir, "documents").select("doc_id")
    return C.shuffle_shards(d, seed="42", n_shards=_SHARDS).select(
        "doc_id", "sort_key", "shard", "position"
    )


@query(
    "embed_quantize_int8",
    # q8 is compared as a joined string — list cells are unhashable in
    # the driver canonicalizer's pandas sort (the r03 ERR); the raw
    # array form stays available via quantize.quantize_stats directly.
    # the all-zero-vector branch (amax = 0) mirrors quantize_stats:
    # zero codes / scale_micro 0 / sse 0 — an explicit CASE, not an
    # epsilon guard (127/epsilon floor-scaled overflows BIGINT, where
    # Spark's cast clamps but DuckDB raises)
    oracle="""
    SELECT vec_id,
           CASE WHEN amax > 0 THEN
             array_to_string(list_transform(emb, x -> CAST(greatest(-127, least(127,
               floor(CAST(x AS DOUBLE) * scale + 0.5))) AS INT)), ',')
           ELSE array_to_string(list_transform(emb, x -> 0), ',') END AS q8,
           CASE WHEN amax > 0 THEN CAST(floor(scale * 1e6) AS BIGINT)
                ELSE 0 END AS scale_micro,
           CASE WHEN amax > 0 THEN
             CAST(list_aggregate(list_transform(generate_series(1, len(emb)),
               i -> CAST(floor(
                 (CAST(emb[i] AS DOUBLE)
                  - CAST(greatest(-127, least(127,
                      floor(CAST(emb[i] AS DOUBLE) * scale + 0.5))) AS DOUBLE)
                    / scale)
                 * (CAST(emb[i] AS DOUBLE)
                  - CAST(greatest(-127, least(127,
                      floor(CAST(emb[i] AS DOUBLE) * scale + 0.5))) AS DOUBLE)
                    / scale)
                 * 1e9) AS BIGINT)), 'sum') AS BIGINT)
           ELSE 0 END AS sse_nano
    FROM (
      SELECT vec_id, emb, amax, 127.0 / amax AS scale
      FROM (
        SELECT vec_id, embedding AS emb,
               list_aggregate(
                 list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max')
                 AS amax
        FROM embeddings
      ) a
    ) s
    """,
)
def embed_quantize_int8(spark, sf_dir):
    """Symmetric absmax int8 quantization + reconstruction SSE — all JVM
    array lambdas; per-element nano-floored errors summed as integers so
    the SSE is summation-order-independent (datapipe/quantize.py). The
    q8 codes are compared as a ','-joined string for the driver hasher."""
    d = t(spark, sf_dir, "embeddings")
    s = Q.quantize_stats(d)
    return s.select(
        "vec_id",
        F.array_join(
            F.transform(F.col("q8"), lambda x: x.cast("string")), ","
        ).alias("q8"),
        "scale_micro",
        "sse_nano",
    )


@query(
    "vocab_pair_counts",
    oracle="""
    SELECT pair, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT unnest(list_transform(generate_series(1, len(tok) - 1),
                    i -> tok[i] || ' ' || tok[i+1])) AS pair
      FROM (
        SELECT list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                           x -> x <> '') AS tok
        FROM documents
      ) d
    ) p
    GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT 50
    """,
)
def vocab_pair_counts(spark, sf_dir):
    """BPE-style adjacent-pair frequency count (the inner loop of
    merge-based tokenizer induction) — zip_with over shifted slices,
    explode, count, total-order top-50. One shuffle (the count);
    map-side partial aggregation bounds it by distinct pairs."""
    d = t(spark, sf_dir, "documents")
    tok = T.tokens("text")
    # slice length clamps to >= 0: Spark's slice throws on a negative
    # length, which a zero-token (empty/whitespace-only) doc would hit
    n = F.greatest(F.array_size(tok) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(tok, 1, n),
        F.slice(tok, 2, n),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        d.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(50)
    )


@query(
    "datapipe_pack_manifest",
    oracle=f"""
    SELECT CAST(b AS BIGINT) AS bin_id, doc_id,
           CAST(greatest(0, b * {_BUDGET} - tok_offset) AS BIGINT) AS tok_from,
           CAST(least(n_tokens, (b + 1) * {_BUDGET} - tok_offset) AS BIGINT)
             AS tok_to
    FROM (
      SELECT doc_id, n_tokens, cum_before AS tok_offset,
             unnest(generate_series(
                 CAST(cum_before // {_BUDGET} AS BIGINT),
                 CAST((cum_before + greatest(n_tokens, 1) - 1) // {_BUDGET}
                      AS BIGINT)))
               AS b
      FROM (
        SELECT doc_id, n_tokens,
               COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cum_before
        FROM (
          SELECT doc_id,
                 CAST(len(list_filter(
                   string_split_regex(trim(lower(text)), '\\s+'),
                   x -> x <> '')) AS BIGINT) AS n_tokens
          FROM documents
        ) tok
      ) cum
    ) spans
    """,
)
def datapipe_pack_manifest(spark, sf_dir):
    """The packed-batch MANIFEST — what a training pipeline actually
    writes: for every (training sequence, document) incidence, the token
    sub-range of the doc that lands in that bin. Derived from
    pack_assignments by exploding each doc over the bins it spans
    (sequence -> posexplode, pure JVM); a reader joins this against the
    corpus to materialize fixed-length sequences. Rows =
    sum(bins spanned) ~ n_docs + total_tokens/budget."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.array_size(T.tokens("text")).cast("long").alias("n_tokens")
    )
    a = C.pack_assignments(d, "n_tokens", budget=_BUDGET)
    b = F.explode(F.sequence(F.col("bin_start"), F.col("bin_end"))).alias("bin_id")
    return a.select("doc_id", "n_tokens", "tok_offset", b).select(
        F.col("bin_id").cast("long"),
        "doc_id",
        F.greatest(F.lit(0), F.col("bin_id") * _BUDGET - F.col("tok_offset"))
        .cast("long")
        .alias("tok_from"),
        F.least(
            F.col("n_tokens"),
            (F.col("bin_id") + 1) * _BUDGET - F.col("tok_offset"),
        )
        .cast("long")
        .alias("tok_to"),
    )
