"""Text-analysis queries over the documents fixture (north-star operators:
token stats, quality scoring, term frequencies, fingerprints, language-ID).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gpdb_spark.registry import query, t
from gpdb_spark.datapipe import text as T


@query(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS INT) AS n_tokens,
           CAST(len(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))) AS INT)
             AS n_distinct,
           round(CAST(len(list_distinct(string_split_regex(trim(lower(text)), '\\s+')))
                      AS DOUBLE)
                 / greatest(len(string_split_regex(trim(lower(text)), '\\s+')), 1), 6)
             AS ttr
    FROM documents
    """,
)
def text_token_stats(spark, sf_dir):
    """Token counting + type-token ratio, JVM-side split/distinct."""
    d = t(spark, sf_dir, "documents")
    toks = T.tokens("text")
    n = F.array_size(toks)
    nd = F.array_size(F.array_distinct(toks))
    return d.select(
        "doc_id",
        n.cast("int").alias("n_tokens"),
        nd.cast("int").alias("n_distinct"),
        F.round(nd.cast("double") / F.greatest(n, F.lit(1)), 6).alias("ttr"),
    )


@query(
    "text_quality_score",
    oracle="""
    SELECT doc_id, n_chars_o AS n_chars, n_tokens, mean_word_len, stop_ratio,
           floor((0.4 * least(n_tokens / 50.0, 1.0)
                 + 0.4 * stop_ratio
                 + 0.2 * least(mean_word_len / 8.0, 1.0)) * 1000000) / 1000000
             AS quality
    FROM (
        SELECT doc_id,
               length(text) AS n_chars_o,
               CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS INT) AS n_tokens,
               floor((CAST(len(replace(lower(text), ' ', '')) AS DOUBLE)
                     / greatest(len(string_split_regex(trim(lower(text)), '\\s+')), 1))
                     * 1000000) / 1000000
                 AS mean_word_len,
               floor((CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                          x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x)))
                          AS DOUBLE)
                     / greatest(len(string_split_regex(trim(lower(text)), '\\s+')), 1))
                     * 1000000) / 1000000
                 AS stop_ratio
        FROM documents
    ) f
    """,
)
def text_quality_score(spark, sf_dir):
    """Composite quality score from length/stopword/word-shape features —
    the standard pretraining-corpus filter, fully declarative.

    NB: uses floor-scaling (floor(x*1e6)/1e6) instead of round(): these
    ratios of small integers sit exactly on decimal-rounding tie points,
    where Spark (BigDecimal HALF_UP) and DuckDB (float-multiply nearbyint)
    disagree; floor over identical IEEE inputs is deterministic."""

    def det6(c):
        return F.floor(c * 1000000) / 1000000

    d = t(spark, sf_dir, "documents")
    toks = T.tokens("text")
    n_tok = F.array_size(toks)
    mean_wl = det6(
        F.length(F.replace(F.lower(F.col("text")), F.lit(" "), F.lit("")))
        .cast("double")
        / F.greatest(n_tok, F.lit(1))
    )
    sw = F.array(*[F.lit(w) for w in T.STOPWORDS["en"]])
    stop_ratio = det6(
        F.size(F.filter(toks, lambda x: F.array_contains(sw, x))).cast("double")
        / F.greatest(n_tok, F.lit(1))
    )
    quality = det6(
        0.4 * F.least(n_tok / F.lit(50.0), F.lit(1.0))
        + 0.4 * stop_ratio
        + 0.2 * F.least(mean_wl / F.lit(8.0), F.lit(1.0))
    )
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tok.cast("int").alias("n_tokens"),
        mean_wl.alias("mean_word_len"),
        stop_ratio.alias("stop_ratio"),
        quality.alias("quality"),
    )


@query(
    "text_top_terms",
    oracle="""
    SELECT term, CAST(n AS BIGINT) AS n FROM (
        SELECT term, count(*) AS n
        FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
              FROM documents) x
        WHERE term <> ''
        GROUP BY term
    ) g
    ORDER BY n DESC, term
    LIMIT 20
    """,
)
def text_top_terms(spark, sf_dir):
    """Corpus term frequency top-20 — tsvector-lite inverted index shape
    (explode -> count -> top-k), the tsrank.c analog."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(T.tokens("text")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "term")
        .limit(20)
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
               string_split_regex(trim(lower(text)), '\\s+'))), ' ')) AS fp,
           CAST(len(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))) AS INT)
             AS n_distinct
    FROM documents
    """,
)
def text_fingerprint(spark, sf_dir):
    """Order-insensitive content fingerprint (md5 of sorted distinct token
    set) — canonical-form dedup key."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.fingerprint("text").alias("fp"),
        F.array_size(F.array_distinct(T.tokens("text"))).cast("int").alias("n_distinct"),
    )


@query(
    "text_lang_distribution",
    oracle="""
    SELECT lang, source_bucket, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(CAST(sum(n_chars) AS DOUBLE) / count(*), 4) AS avg_chars
    FROM (SELECT lang, CASE WHEN length(source) > 4 THEN 'long' ELSE 'short' END
            AS source_bucket, n_chars FROM documents) d
    GROUP BY lang, source_bucket
    """,
)
def text_lang_distribution(spark, sf_dir):
    """Corpus composition stats by language/source."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select(
            "lang",
            F.when(F.length("source") > 4, "long").otherwise("short").alias(
                "source_bucket"
            ),
            "n_chars",
        )
        .groupBy("lang", "source_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.round(
                F.sum("n_chars").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_chars"),
        )
    )


@query("text_langid_heuristic")
def text_langid_heuristic(spark, sf_dir):
    """Language-ID heuristic scores + argmax prediction. Rows-only (the
    scoring matrix isn't worth duplicating in SQL); tests/test_datapipe.py
    asserts structure and determinism."""
    d = t(spark, sf_dir, "documents")
    out = T.langid_scores(d)
    return out.select(
        "doc_id", "lang", "lang_pred", *[f"score_{c}" for c in sorted(T.STOPWORDS)]
    )


@query("multimodal_byte_stats")
def multimodal_byte_stats(spark, sf_dir):
    """Binary-column pipeline: documents -> binary payload -> Arrow-batched
    mapInPandas featurizer (entropy + byte histogram). Rows-only; exact
    values re-checked in tests/test_datapipe.py against numpy on the
    driver."""
    from gpdb_spark.datapipe.multimodal import attach_binary, byte_stats

    d = t(spark, sf_dir, "documents")
    media = attach_binary(d)
    stats = byte_stats(media)
    return stats.select(
        "media_id",
        "n_bytes",
        "entropy",
        F.array_join(
            F.transform(F.col("histogram16"), lambda v: v.cast("string")), ","
        ).alias("hist_csv"),
    )


@query(
    "datapipe_hash_split",
    # deterministic md5-prefix split: the identical expression runs in
    # DuckDB, so assignment parity is checked value-for-value
    oracle="""
    WITH s AS (
        SELECT lang,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || 'v1'), 1, 8)
                         < 'e6666666'
                    THEN 'train' ELSE 'valid' END AS split
        FROM documents
    )
    SELECT lang, split, count(*) AS n
    FROM s GROUP BY lang, split
    """,
)
def datapipe_hash_split(spark, sf_dir):
    """Deterministic train/valid split (datapipe/sample.py hash_split):
    assignment is a pure function of doc_id — reproducible across runs,
    engines and cluster sizes, unlike seeded df.sample. Narrow projection
    + one count aggregation; no extra shuffle for the assignment."""
    from gpdb_spark.datapipe.sample import hash_split

    d = t(spark, sf_dir, "documents")
    return (
        hash_split(d, "doc_id", train_frac=0.9, salt="v1")
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n"))
    )
