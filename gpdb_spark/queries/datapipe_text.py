"""Text-analysis queries over the documents fixture (north-star operators:
token stats, quality scoring, term frequencies, fingerprints, language-ID).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gpdb_spark.registry import fr, query, t
from gpdb_spark.datapipe import text as T


@query(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')) AS INT) AS n_tokens,
           CAST(len(list_distinct(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> ''))) AS INT)
             AS n_distinct,
           (floor(CAST(len(list_distinct(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')))
                      AS DOUBLE)
                 / greatest(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')), 1)
                 * 1e6) / 1e6) AS ttr
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
        fr(nd.cast("double") / F.greatest(n, F.lit(1)), 6).alias("ttr"),
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
               CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')) AS INT) AS n_tokens,
               floor((CAST(len(replace(lower(text), ' ', '')) AS DOUBLE)
                     / greatest(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')), 1))
                     * 1000000) / 1000000
                 AS mean_word_len,
               floor((CAST(len(list_filter(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> ''),
                                          x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x)))
                          AS DOUBLE)
                     / greatest(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')), 1))
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
        FROM (SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')) AS term
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
           md5(coalesce(array_to_string(list_sort(list_distinct(
               list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> ''))), ' '), '')) AS fp,
           CAST(len(list_distinct(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> ''))) AS INT)
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
           (floor(CAST(sum(n_chars) AS DOUBLE) / count(*) * 1e4) / 1e4) AS avg_chars
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
            fr(
                F.sum("n_chars").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_chars"),
        )
    )


def _langid_oracle() -> str:
    """DuckDB oracle generated from the SAME stopword table the engine
    uses — per-language hit-rate as floor-ppm integers (rounding-free
    comparison) and argmax with alphabetical tiebreak."""
    from gpdb_spark.datapipe.text import STOPWORDS

    langs = sorted(STOPWORDS)

    def ppm(code: str) -> str:
        sw = "[" + ", ".join(f"'{w}'" for w in sorted(STOPWORDS[code])) + "]"
        return (
            f"CAST(floor(CAST(len(list_filter(toks, x -> "
            f"list_contains({sw}, x))) AS DOUBLE) * 1000000 / "
            f"greatest(len(toks), 1)) AS BIGINT)"
        )

    score_cols = ", ".join(f"{ppm(c)} AS score_{c}_ppm" for c in langs)
    best = "greatest(" + ", ".join(f"score_{c}_ppm" for c in langs) + ")"
    pred = (
        "CASE "
        + " ".join(
            f"WHEN score_{c}_ppm = {best} THEN '{c}'" for c in langs
        )
        + " END"
    )
    return f"""
    WITH tk AS (
        SELECT doc_id, lang,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS toks
        FROM documents
    ), scored AS (
        SELECT doc_id, lang, {score_cols} FROM tk
    )
    SELECT doc_id, lang, {pred} AS lang_pred,
           {", ".join(f"score_{c}_ppm" for c in langs)}
    FROM scored
    """


@query("text_langid_heuristic", oracle=_langid_oracle())
def text_langid_heuristic(spark, sf_dir):
    """Language-ID heuristic: per-language stopword hit-rate (floor-ppm
    integers — rounding-free across engines) + argmax prediction with
    alphabetical tiebreak. Was rows-only through round 2; now oracled
    against the same scoring matrix generated into DuckDB SQL.
    tests/test_datapipe.py additionally asserts structure/determinism
    of the double-valued T.langid_scores API."""
    d = t(spark, sf_dir, "documents")
    toks = T.tokens("text")
    n = F.greatest(F.array_size(toks), F.lit(1))
    langs = sorted(T.STOPWORDS)
    sel = [F.col("doc_id"), F.col("lang"), toks.alias("_toks")]
    base = d.select(*sel)
    def _hits(sw_col):
        return F.size(
            F.filter(F.col("_toks"), lambda x: F.array_contains(sw_col, x))
        )

    for code in langs:
        sw = F.array(*[F.lit(w) for w in sorted(T.STOPWORDS[code])])
        hits = _hits(sw)
        nn = F.greatest(F.array_size(F.col("_toks")), F.lit(1))
        base = base.withColumn(
            f"score_{code}_ppm",
            F.floor(hits.cast("double") * 1000000.0 / nn).cast("bigint"),
        )
    _ = n
    scores = [F.col(f"score_{c}_ppm") for c in langs]
    best = F.greatest(*scores)
    pred = F.lit(None).cast("string")
    for code in reversed(langs):
        pred = F.when(F.col(f"score_{code}_ppm") == best, F.lit(code)).otherwise(
            pred
        )
    return base.select(
        "doc_id",
        "lang",
        pred.alias("lang_pred"),
        *[f"score_{c}_ppm" for c in langs],
    )


@query(
    "multimodal_byte_stats",
    # The payload is the document's utf-8 bytes (ASCII fixture text), so
    # DuckDB can recompute every stat from characters: per-byte >>4
    # bucketing for the 16-bin histogram and Shannon entropy over the
    # 256-bin distribution. Entropy compares as floor(e*1000) — an
    # integer immune to FP rounding-mode differences (summation-order
    # ULP noise would need to land within ~1e-12 of a milli boundary to
    # flip it). The raw double entropy stays available on the API
    # (BYTES_STATS_SCHEMA) and is numpy-parity-tested.
    # text is ASCII-sanitized identically on both sides (bytes outside
    # printable-ASCII+whitespace -> '?') so DuckDB's character walk and
    # the engine's byte walk agree by construction on ANY corpus
    oracle="""
    WITH ch AS (
        SELECT doc_id, strlen(s) AS n,
               list_filter(string_split(s, ''), c -> c <> '') AS chars
        FROM (SELECT doc_id,
                     regexp_replace(text, '[^\\t\\n\\r -~]', '?', 'g') AS s
              FROM documents) d
    )
    SELECT doc_id AS media_id,
           CAST(n AS BIGINT) AS n_bytes,
           CAST(floor(coalesce(list_sum(list_transform(
               list_transform(list_distinct(chars),
                   c -> len(list_filter(chars, x -> x = c))),
               k -> -(CAST(k AS DOUBLE) / n)
                    * log2(CAST(k AS DOUBLE) / n))), 0) * 1000)
               AS BIGINT) AS entropy_milli,
           array_to_string(list_transform(generate_series(0, 15),
               b -> CAST(len(list_filter(chars, c -> ord(c) // 16 = b))
                         AS VARCHAR)), ',') AS hist_csv
    FROM ch
    """,
)
def multimodal_byte_stats(spark, sf_dir):
    """Binary-column pipeline: documents -> binary payload -> Arrow-batched
    mapInPandas featurizer (entropy + byte histogram). Was rows-only
    through round 2; now oracled — DuckDB recomputes byte stats from the
    same utf-8 payload characters (see oracle note on the floor-milli
    entropy discipline)."""
    from gpdb_spark.datapipe.multimodal import attach_binary, byte_stats

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace(F.col("text"), r"[^\t\n\r -~]", "?").alias("text"),
    )
    media = attach_binary(d)
    stats = byte_stats(media)
    return stats.select(
        "media_id",
        "n_bytes",
        "entropy_milli",
        F.array_join(
            F.transform(F.col("histogram16"), lambda v: v.cast("string")), ","
        ).alias("hist_csv"),
    )


@query(
    "multimodal_image_features",
    # The fake decoder is a PURE function of the payload bytes (first
    # min(len,192) bytes tiled to 192, reshaped 8x8x3), and the resize
    # is nearest-neighbor index sampling — so DuckDB re-derives every
    # sampled pixel from the same ASCII payload: byte at flat index
    # (48r + 6c + ch) mod min(L,192), 0 for empty payloads. Means are
    # (sum*1000) // 16 exact integers.
    # the payload is ASCII-sanitized IDENTICALLY on both sides (any
    # byte outside printable-ASCII+whitespace -> '?') so DuckDB's
    # character indexing and the engine's byte indexing agree by
    # construction — the comparison doesn't depend on the corpus
    # happening to be ASCII
    oracle="""
    WITH d AS (
      SELECT doc_id, regexp_replace(text, '[^\\t\\n\\r -~]', '?', 'g') AS text
      FROM documents
    ),
    dl AS (
      SELECT doc_id, text, least(octet_length(encode(text)), 192) AS L
      FROM d
    ),
    px AS (
      SELECT doc_id, ch,
             CASE WHEN L = 0 THEN 0
                  ELSE ord(substr(text, ((48*r + 6*c + ch) % L) + 1, 1))
             END AS v
      FROM dl,
           (SELECT unnest(generate_series(0, 3)) AS r) rr,
           (SELECT unnest(generate_series(0, 3)) AS c) cc,
           (SELECT unnest(generate_series(0, 2)) AS ch) chh
    )
    SELECT doc_id AS media_id,
           CAST(sum(CASE WHEN ch = 0 THEN v ELSE 0 END) * 1000 // 16 AS BIGINT)
               AS mean_r_milli,
           CAST(sum(CASE WHEN ch = 1 THEN v ELSE 0 END) * 1000 // 16 AS BIGINT)
               AS mean_g_milli,
           CAST(sum(CASE WHEN ch = 2 THEN v ELSE 0 END) * 1000 // 16 AS BIGINT)
               AS mean_b_milli,
           CAST(sum(v) AS BIGINT) AS pixel_checksum
    FROM px GROUP BY doc_id
    """,
)
def multimodal_image_features(spark, sf_dir):
    """Image pipeline plumbing end to end: binary payload -> decode
    (deterministic fake — the one stubbed step, codec libs absent) ->
    REAL nearest-neighbor resize -> per-channel features, Arrow-batched
    mapInPandas (datapipe/multimodal.py image_features). ORACLED, not
    just smoke-tested: the fake decode is a pure byte function, so the
    oracle re-derives every sampled pixel value from the payload. The
    payload is ASCII-sanitized identically on both sides (see oracle
    note) so byte-vs-character indexing cannot diverge on non-ASCII
    corpora; the image_features OPERATOR itself is byte-true."""
    from gpdb_spark.datapipe.multimodal import attach_binary, image_features

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace(F.col("text"), r"[^\t\n\r -~]", "?").alias("text"),
    )
    return image_features(attach_binary(d))


@query(
    "multimodal_frame_manifest",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(unnest(generate_series(0, nf - 1)) AS INT) AS frame_idx,
           CAST(unnest(generate_series(0, nf - 1)) * 50 AS BIGINT) AS t_centis
    FROM (
      SELECT doc_id, (octet_length(encode(text)) * 2) // 100 AS nf
      FROM documents
    ) d
    WHERE nf > 0
    """,
)
def multimodal_frame_manifest(spark, sf_dir):
    """Video frame-extraction manifest (datapipe/multimodal.py
    frame_manifest): one row per frame to decode at 2 fps, duration
    derived from payload size (stand-in for container bitrate
    metadata). Pure JVM sequence/posexplode — zero shuffle; exact
    integer centisecond times. The manifest is what a 100 TB video
    pipeline shuffles/schedules; the per-frame codec decode is the
    stubbed plug-in point."""
    from gpdb_spark.datapipe.multimodal import attach_binary, frame_manifest

    d = t(spark, sf_dir, "documents")
    return frame_manifest(attach_binary(d), bytes_per_s=100, fps=2)


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


@query(
    "text_repetition_quality",
    # integer-exact comparison: corpus-level repetition = 1 -
    # sum(distinct)/sum(total) is derived from the BIGINT sums the oracle
    # reproduces with DuckDB list ops; the high-rep flag 2*distinct <
    # total is integer math on both sides
    oracle=r"""
    WITH tk AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'),
                           x -> x <> '') AS t
        FROM documents
    ), g AS (
        SELECT doc_id, len(t) AS n_tok,
               len(list_distinct(t)) AS n_tok_d,
               list_transform(generate_series(1, len(t)-1),
                              i -> t[i] || ' ' || t[i+1]) AS g2,
               list_transform(generate_series(1, len(t)-2),
                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS g3
        FROM tk
    )
    SELECT count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS tok_total,
           CAST(sum(n_tok_d) AS BIGINT) AS tok_distinct,
           CAST(sum(len(g2)) AS BIGINT) AS g2_total,
           CAST(sum(len(list_distinct(g2))) AS BIGINT) AS g2_distinct,
           CAST(sum(len(g3)) AS BIGINT) AS g3_total,
           CAST(sum(len(list_distinct(g3))) AS BIGINT) AS g3_distinct,
           CAST(sum(CASE WHEN 2 * len(list_distinct(g2)) < len(g2)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high_rep
    FROM g
    """,
)
def text_repetition_quality(spark, sf_dir):
    """Gopher-style within-document repetition signals: duplicate token /
    2-gram / 3-gram mass and a high-repetition flag (repeated-2-gram
    fraction > 1/2). N-grams are built with transform/slice higher-order
    functions — one scan, one aggregate, zero Python (datapipe/text.py
    ngrams/dup_ngram_fraction)."""
    d = t(spark, sf_dir, "documents")
    # r11 (guide §1.2): tokenize ONCE per row and build both n-gram
    # arrays from the materialized token/gram columns (staged selects —
    # CollapseProject keeps non-cheap multi-referenced arrays in their
    # own projection), instead of re-deriving tokens inside every
    # measure. high_rep = dup_ngram_fraction(2) > 0.5 is restated as
    # integer math on the already-computed sizes: 1 - d/t > 0.5 iff
    # 2d < t for counts below 2^52 (equality d/t = 0.5 falls on the
    # false side either way) — the oracle already uses this spelling.
    staged = d.select(T.tokens("text").alias("tk")).select(
        F.col("tk"),
        T._ngrams_of(F.col("tk"), 2).alias("g2"),
        T._ngrams_of(F.col("tk"), 3).alias("g3"),
    )
    per_doc = staged.select(
        F.array_size("tk").alias("n_tok"),
        F.array_size(F.array_distinct("tk")).alias("n_tok_d"),
        F.array_size("g2").alias("n_g2"),
        F.array_size(F.array_distinct("g2")).alias("n_g2_d"),
        F.array_size("g3").alias("n_g3"),
        F.array_size(F.array_distinct("g3")).alias("n_g3_d"),
    ).withColumn(
        "high_rep", (F.lit(2) * F.col("n_g2_d") < F.col("n_g2")).cast("long")
    )
    return per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("tok_total"),
        F.sum("n_tok_d").alias("tok_distinct"),
        F.sum("n_g2").alias("g2_total"),
        F.sum("n_g2_d").alias("g2_distinct"),
        F.sum("n_g3").alias("g3_total"),
        F.sum("n_g3_d").alias("g3_distinct"),
        F.sum("high_rep").alias("n_high_rep"),
    )


@query(
    "text_pii_redaction",
    # PII is injected deterministically from doc_id, then scrubbed; the
    # oracle applies the identical regex chain (RE2 and Java regex agree
    # on this pattern subset) and re-counts
    oracle=r"""
    WITH injected AS (
        SELECT doc_id,
               text || ' contact user' || doc_id ||
               '@mail.example.com or 10.' || (doc_id % 256) ||
               '.0.1 call 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               AS full_text
        FROM documents
    ), red AS (
        SELECT doc_id, full_text,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(full_text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
               '\+?\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g'),
             '\b\d{3}-\d{2}-\d{4}\b', '<ID>', 'g') AS redacted
        FROM injected
    )
    SELECT count(*) AS n_docs,
        CAST(sum(len(regexp_extract_all(full_text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT) AS email_hits,
        CAST(sum(len(regexp_extract_all(redacted, '<EMAIL>'))) AS BIGINT) AS email_tags,
        CAST(sum(len(regexp_extract_all(redacted, '<IP>'))) AS BIGINT) AS ip_tags,
        CAST(sum(len(regexp_extract_all(redacted, '<PHONE>'))) AS BIGINT) AS phone_tags,
        CAST(sum(length(redacted)) AS BIGINT) AS redacted_chars
    FROM red
    """,
)
def text_pii_redaction(spark, sf_dir):
    """Training-data PII scrubbing: emails / IPv4s / phone-shaped numbers
    replaced by typed tags via a JVM regexp_replace chain (datapipe/
    text.py redact_pii). PII is synthesized per-doc (the fixture corpus
    is clean), so every pattern fires and the audit counts are
    non-trivial."""
    d = t(spark, sf_dir, "documents")
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0.1 call 555-867-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("full_text"),
    )
    red = injected.select(
        "full_text", T.redact_pii("full_text").alias("redacted")
    )
    return red.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(T.pii_hit_count("full_text", "email")).alias("email_hits"),
        F.sum(F.regexp_count(F.col("redacted"), F.lit("<EMAIL>"))).alias("email_tags"),
        F.sum(F.regexp_count(F.col("redacted"), F.lit("<IP>"))).alias("ip_tags"),
        F.sum(F.regexp_count(F.col("redacted"), F.lit("<PHONE>"))).alias("phone_tags"),
        F.sum(F.length("redacted")).alias("redacted_chars"),
    )


def _thr(frac):
    from gpdb_spark.datapipe.sample import _hex_threshold

    return _hex_threshold(frac)


@query(
    "datapipe_stratified_cap",
    # thresholds are generated by the same _hex_threshold the engine
    # uses, so the oracle can't drift from the implementation
    oracle=None,  # set below once _thr is available at import time
)
def datapipe_stratified_cap(spark, sf_dir):
    """Stratified deterministic sampling + per-group cap
    (datapipe/sample.py): per-language keep fractions (the
    quality/language rebalancing step of a training pipeline) followed by
    an at-most-30-docs-per-source cap (crawl per-domain cap). Both are
    pure functions of doc_id: reproducible across runs/engines/cluster
    sizes. One narrow scan + one window shuffle on source + final count
    agg — the minimal shuffle count for this op."""
    from gpdb_spark.datapipe.sample import cap_per_group, stratified_sample

    d = t(spark, sf_dir, "documents")
    s = stratified_sample(
        d, "doc_id", "lang",
        {"en": 0.8, "de": 0.5, "fr": 0.25}, default_frac=0.1, salt="s1",
    )
    capped = cap_per_group(s, "source", "doc_id", k=30, salt="c1")
    return (
        capped.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n"))
    )


from gpdb_spark.registry import ORACLE as _ORACLE  # noqa: E402

_ORACLE["datapipe_stratified_cap"] = " ".join(
    f"""
    WITH s AS (
        SELECT doc_id, lang, source
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR) || 's1'), 1, 8) <
              CASE lang WHEN 'en' THEN '{_thr(0.8)}'
                        WHEN 'de' THEN '{_thr(0.5)}'
                        WHEN 'fr' THEN '{_thr(0.25)}'
                        ELSE '{_thr(0.1)}' END
    ), capped AS (
        SELECT lang, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || 'c1'), 1, 8),
                            doc_id) AS rn
        FROM s
    )
    SELECT lang, source, count(*) AS n
    FROM capped WHERE rn <= 30 GROUP BY lang, source
    """.split()
)


@query(
    "text_line_dedup",
    # multi-line text derived deterministically (newline before each
    # 'the') so the line granularity is real; C4 policy: a line occurring
    # 2+ times anywhere in the corpus is dropped from every document
    oracle="""
    WITH src AS (
        SELECT doc_id, replace(text, ' the ', chr(10) || 'the ') AS text
        FROM documents WHERE doc_id < 400
    ), l AS (
        SELECT doc_id, s.i AS pos, s.x AS ln
        FROM (
            SELECT doc_id,
                   unnest(list_transform(string_split(text, chr(10)),
                                         (x, i) -> {'i': i, 'x': x})) AS s
            FROM src
        )
    ), freq AS (
        SELECT ln, count(*) AS n FROM l GROUP BY ln
    ), m AS (
        SELECT l.doc_id, l.pos, l.ln, freq.n = 1 AS keep
        FROM l JOIN freq USING (ln)
    )
    SELECT doc_id,
           COALESCE(array_to_string(list_transform(
               list_sort(list({'pos': pos, 'ln': ln}) FILTER (WHERE keep)),
               s -> s.ln), chr(10)), '') AS text,
           CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_lines_kept,
           CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_lines_dropped
    FROM m GROUP BY doc_id
    """,
)
def text_line_dedup(spark, sf_dir):
    """Cross-corpus line-level dedup (C4's duplicated-line removal — a
    granularity BELOW the document dedup family): explode lines with
    positions, one global line-frequency aggregation, drop every line
    occurring 2+ times anywhere, reassemble documents in original order.
    Two shuffles total (line-key agg + doc-key reassembly), no pairwise
    work — the 100 TB shape. datapipe/lines.py."""
    from gpdb_spark.datapipe.lines import dedup_lines_across_corpus

    d = (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 400)
        .withColumn("text", F.replace(F.col("text"), F.lit(" the "), F.lit("\nthe ")))
    )
    return dedup_lines_across_corpus(d)


_BENCH_TEXTS = [
    "window merge spark merge batch",
    "a table window key batch",
    "this phrase appears nowhere in the corpus at all",
]


def _bench_grams(n=3):
    from gpdb_spark.datapipe.lines import _py_ngrams

    return sorted({g for t in _BENCH_TEXTS for g in _py_ngrams(t, n)})


@query(
    "text_contamination",
    oracle=None,  # assembled below from the same benchmark gram list
)
def text_contamination(spark, sf_dir):
    """Benchmark decontamination: flag documents whose word 3-grams
    intersect the benchmark set (the eval-leakage filter every training
    pipeline runs). The benchmark gram set folds into the plan as one
    literal array — a pure map over the corpus scan, no join, no
    shuffle. datapipe/lines.py::contamination_flags."""
    from gpdb_spark.datapipe.lines import contamination_flags

    d = t(spark, sf_dir, "documents")
    return contamination_flags(d, _BENCH_TEXTS, n=3)


from gpdb_spark.registry import ORACLE as _ORACLE2  # noqa: E402

_ORACLE2["text_contamination"] = " ".join(
    f"""
    WITH tk AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')
                 AS toks
        FROM documents
    ), g AS (
        SELECT doc_id,
               CASE WHEN len(toks) >= 3 THEN
                   list_distinct(list_transform(
                       generate_series(1, len(toks) - 2),
                       i -> array_to_string(toks[i:i+2], ' ')))
               ELSE [] END AS grams
        FROM tk
    )
    SELECT doc_id,
           CAST(len(grams) AS INT) AS n_grams,
           CAST(len(list_intersect(grams, {_bench_grams()!r})) AS INT) AS n_hits,
           len(list_intersect(grams, {_bench_grams()!r})) > 0 AS contaminated
    FROM g
    """.replace("'", "'").split()
)


@query(
    "text_url_canonical_dedup",
    # URLs are synthesized deterministically from doc fields (fixtures
    # carry no URL column), so the canonical form is analytically known:
    # the oracle asserts GROUND TRUTH — uppercase scheme/host fold, :80
    # default-port drop, trailing-slash drop, #fragment drop, utm_*
    # tracking-param removal, and param sort must all collapse the
    # variants to 'http://example.com/<src>/page<k>?a=<m>&b=2'.
    oracle="""
    SELECT 'http://example.com/d' || CAST(doc_id % 10 AS VARCHAR) || '/page'
               || CAST(doc_id % 7 AS VARCHAR)
               || '?a=' || CAST(doc_id % 3 AS VARCHAR) || '&b=2'
               AS canonical_url,
           count(*) AS n_dups,
           min(doc_id) AS keep_id
    FROM documents
    WHERE doc_id < 300
    GROUP BY 1
    """,
)
def text_url_canonical_dedup(spark, sf_dir):
    """Canonical-URL dedup (datapipe/urls.py): the crawl pipeline's
    cheapest dedup tier — scheme/host fold, default-port + fragment +
    tracking-param + trailing-slash normalization, sorted params, then
    one 2-stage groupBy. All JVM expressions (parse_url + array
    lambdas); the projection fuses into the scan."""
    from gpdb_spark.datapipe.urls import url_dedup

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    url = F.concat(
        F.lit("HTTP://Example.COM"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/d"),
        (F.col("doc_id") % 10).cast("string"),
        F.lit("/page"),
        (F.col("doc_id") % 7).cast("string"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=x&b=2&a="),
        (F.col("doc_id") % 3).cast("string"),
        F.lit("#frag"),
    )
    return url_dedup(
        d.select("doc_id", url.alias("url")), "url", "doc_id"
    )


@query(
    "text_lm_quality",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, w FROM (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        FROM documents
      ) u WHERE w <> ''
    ),
    uni AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
    vocab AS (SELECT w, c FROM uni ORDER BY c DESC, w LIMIT 50000),
    docs AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         x -> x <> '') AS arr
      FROM documents
    ),
    pairs AS (
      SELECT doc_id, pz[1] AS w1, pz[2] AS w2 FROM (
        SELECT doc_id, unnest(list_zip(arr[:-2], arr[2:])) AS pz
        FROM docs WHERE len(arr) >= 2
      ) z
    ),
    bi AS (
      SELECT p.w1, p.w2, count(*) AS c
      FROM pairs p
      JOIN vocab v1 ON p.w1 = v1.w
      JOIN vocab v2 ON p.w2 = v2.w
      GROUP BY p.w1, p.w2 ORDER BY c DESC, p.w1, p.w2 LIMIT 500000
    ),
    lp AS (
      SELECT p.doc_id,
             CAST(floor(1000000.0 * ln((coalesce(b.c, 0) + 1.0)
                                       / (coalesce(u.c, 0) + 50000.0)))
                  AS BIGINT) AS lp
      FROM pairs p
      LEFT JOIN bi b ON p.w1 = b.w1 AND p.w2 = b.w2
      LEFT JOIN vocab u ON p.w1 = u.w
    ),
    agg AS (
      SELECT doc_id, count(*) AS n_pairs,
             CAST(-sum(lp) AS BIGINT) AS nll_sum_micro
      FROM lp GROUP BY doc_id
    )
    SELECT doc_id, n_pairs, nll_sum_micro,
           CAST(floor(nll_sum_micro / (1000.0 * n_pairs)) AS BIGINT)
               AS avg_nll_milli
    FROM agg
    """,
)
def text_lm_quality(spark, sf_dir):
    """Bigram-LM perplexity-proxy quality scoring (CCNet pipeline
    stage; datapipe/lm.py): train a bounded bigram model on the corpus
    (top-V unigrams, top-B bigrams — deterministic cutoffs), then score
    every document's average negative log-likelihood via BROADCAST
    model joins (the corpus stream never shuffles for the model; the
    only shuffles are the two training aggregations and the per-doc
    sum). Per-pair log-probs floor-scale to integer micro-nats before
    the exact integer sum, making the engine comparison rounding-free.
    At 100 TB: model size is capped by construction; training prunes
    junk pairs with a broadcast vocab semi-join before the bigram
    shuffle."""
    from gpdb_spark.datapipe.lm import lm_quality, train_bigram_lm

    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    vocab, bi = train_bigram_lm(d, "text")
    return lm_quality(d, vocab, bi, "doc_id", "text")


def _dupspan_oracle() -> str:
    from gpdb_spark.queries.datapipe_dedup import _hex15

    return f"""
    WITH docs AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS tk
      FROM documents
    ),
    tokpos AS (
      SELECT doc_id, unnest(tk) AS w,
             unnest(generate_series(1, len(tk))) AS i
      FROM docs
    ),
    anch AS (
      SELECT t.doc_id, t.i
      FROM tokpos t JOIN docs d ON d.doc_id = t.doc_id
      WHERE (CAST({_hex15("md5(w)")} AS BIGINT) % 4) = 0
        AND t.i <= len(d.tk) - 16 + 1
    ),
    spans AS (
      SELECT a.doc_id, a.i AS start,
             md5(array_to_string(
                 d.tk[CAST(a.i AS INT):CAST(a.i + 15 AS INT)], ' ')) AS h
      FROM anch a JOIN docs d ON d.doc_id = a.doc_id
    ),
    dup AS (SELECT h FROM spans GROUP BY h HAVING count(*) > 1),
    fl AS (SELECT s.doc_id, s.start FROM spans s JOIN dup USING (h)),
    tot AS (SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY doc_id),
    agg AS (
      SELECT doc_id, count(*) AS n_dup_spans,
             list(start ORDER BY start) AS dup_starts
      FROM fl GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_spans,
           coalesce(a.n_dup_spans, 0) AS n_dup_spans,
           coalesce(array_to_string(a.dup_starts, ','), '') AS dup_starts
    FROM tot t LEFT JOIN agg a ON a.doc_id = t.doc_id
    """


@query("text_dup_spans", oracle=_dupspan_oracle())
def text_dup_spans(spark, sf_dir):
    """ExactSubstr-style duplicate-span detection (Lee et al. 2022,
    arXiv:2107.06499) with winnowing content-defined anchors
    (datapipe/spans.py): per doc, how many anchored 16-token windows
    are duplicated anywhere in the corpus, and where. All JVM
    expressions; the portable md5 hash family makes DuckDB re-derive
    anchors, window hashes, the duplicate set and the per-doc report
    end to end. dup_starts is compared as a ','-joined string (array
    cells are unhashable in the driver canonicalizer — the r03 ERR);
    the raw array form stays available via spans.dup_spans directly."""
    from gpdb_spark.datapipe.spans import dup_spans

    d = t(spark, sf_dir, "documents")
    s = dup_spans(d, window=16, anchor_mod=4)
    return s.select(
        "doc_id",
        "n_spans",
        "n_dup_spans",
        F.array_join(
            F.transform(F.col("dup_starts"), lambda x: x.cast("string")), ","
        ).alias("dup_starts"),
    )


def _mix_oracle() -> str:
    from gpdb_spark.queries.datapipe_dedup import _hex15

    hex8 = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {p}, 1)) - 1)"
        f" * {16 ** (8 - p)}"
        for p in range(1, 9)
    )
    return f"""
    WITH counts AS (
      SELECT lang, count(*) AS n FROM documents GROUP BY lang
    ),
    w AS (SELECT * FROM (VALUES ('en', 0.5), ('de', 0.2), ('fr', 0.15),
                                 ('es', 0.1), ('zh', 0.05)) v(lang, w)),
    cw AS (SELECT c.lang, c.n, w.w FROM counts c JOIN w ON c.lang = w.lang),
    tmin AS (SELECT min(n / w) AS t FROM cw),
    fr AS (SELECT lang, (w * t) / n AS frac FROM cw, tmin)
    SELECT d.doc_id, d.lang
    FROM documents d JOIN fr ON d.lang = fr.lang
    WHERE CAST({hex8} AS BIGINT)
          < CAST(floor(frac * 4294967296.0) AS BIGINT)
    """


@query("datapipe_domain_mix", oracle=_mix_oracle())
def datapipe_domain_mix(spark, sf_dir):
    """Deterministic domain-mixture sampling to target language weights
    (sample.mix_to_weights — DoReMi-style static mixing): the binding
    domain keeps everything, the rest downsample by md5-prefix
    threshold, with counts / binding-min / fractions all computed
    in-plan (no driver collect). DuckDB re-derives the counts, the
    binding minimum, each fraction and every per-row keep decision."""
    from gpdb_spark.datapipe.sample import mix_to_weights

    d = t(spark, sf_dir, "documents").select("doc_id", "lang")
    w = {"en": 0.5, "de": 0.2, "fr": 0.15, "es": 0.1, "zh": 0.05}
    return mix_to_weights(d, "lang", w, key_col="doc_id")


@query(
    "dedup_best_representative",
    # which duplicate to KEEP: real pipelines choose by quality, not by
    # min-id. Cluster key = opening-boilerplate fingerprint (md5 of the
    # first 2 tokens — shared crawl boilerplate openings collide);
    # representative = quality argmax, doc_id tiebreak, via a window so
    # the tiebreak is total in both engines.
    oracle="""
    WITH q AS (
        SELECT doc_id,
               md5(coalesce(array_to_string(list_slice(
                   list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> ''), 1, 2), ' '), ''))
                 AS cluster_key,
               CAST(floor((0.4 * least(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')) / 50.0, 1.0)
                     + 0.4 * (CAST(len(list_filter(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> ''),
                                x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x))) AS DOUBLE)
                              / greatest(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')), 1))
                     + 0.2 * least((CAST(len(replace(lower(text), ' ', '')) AS DOUBLE)
                              / greatest(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')), 1)) / 8.0, 1.0))
                     * 1000000) AS BIGINT) AS q_ppm
        FROM documents
    ), ranked AS (
        SELECT cluster_key, doc_id, q_ppm,
               count(*) OVER (PARTITION BY cluster_key) AS n_members,
               row_number() OVER (PARTITION BY cluster_key
                                  ORDER BY q_ppm DESC, doc_id) AS r
        FROM q
    )
    SELECT cluster_key, CAST(n_members AS BIGINT) AS n_members,
           doc_id AS keep_doc_id, q_ppm AS rep_quality_ppm
    FROM ranked WHERE r = 1 AND n_members > 1
    """,
)
def dedup_best_representative(spark, sf_dir):
    """Representative selection for duplicate clusters — the keep-policy
    knob of a dedup stage: per cluster (opening-boilerplate fingerprint)
    keep the highest-quality member (doc_id tiebreak). One groupBy-free
    pass: quality computed in-plan, window argmax on the cluster key —
    the same policy plugs into any of the near-dup cluster operators
    (minhash/simhash/cosine components)."""
    from pyspark.sql.window import Window

    d = t(spark, sf_dir, "documents")
    toks = T.tokens("text")
    n_tok = F.array_size(toks)
    sw = F.array(*[F.lit(w) for w in T.STOPWORDS["en"]])
    stop_ratio = F.size(F.filter(toks, lambda x: F.array_contains(sw, x))).cast(
        "double"
    ) / F.greatest(n_tok, F.lit(1))
    mean_wl = F.length(
        F.replace(F.lower(F.col("text")), F.lit(" "), F.lit(""))
    ).cast("double") / F.greatest(n_tok, F.lit(1))
    q_ppm = F.floor(
        (
            0.4 * F.least(n_tok / F.lit(50.0), F.lit(1.0))
            + 0.4 * stop_ratio
            + 0.2 * F.least(mean_wl / F.lit(8.0), F.lit(1.0))
        )
        * 1000000
    ).cast("long")
    scored = d.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.slice(toks, 1, 2))).alias("cluster_key"),
        q_ppm.alias("q_ppm"),
    )
    wc = Window.partitionBy("cluster_key")
    wr = Window.partitionBy("cluster_key").orderBy(
        F.desc("q_ppm"), "doc_id"
    )
    return (
        scored.withColumn("n_members", F.count(F.lit(1)).over(wc).cast("long"))
        .withColumn("r", F.row_number().over(wr))
        .where((F.col("r") == 1) & (F.col("n_members") > 1))
        .select(
            "cluster_key",
            "n_members",
            F.col("doc_id").alias("keep_doc_id"),
            F.col("q_ppm").alias("rep_quality_ppm"),
        )
    )


@query(
    "datapipe_dsir_select",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS tk
        FROM documents
    ),
    feats AS (
        SELECT doc_id, source,
               list_concat(tk, CASE WHEN len(tk) > 1
                   THEN list_transform(range(1, len(tk)),
                                       i -> tk[i] || ' ' || tk[i+1])
                   ELSE [] END) AS fs
        FROM toks
    ),
    occ AS (
        SELECT doc_id, source,
               ((strpos('0123456789abcdef', substr(md5(f), 1, 1)) - 1) * 16
                + (strpos('0123456789abcdef', substr(md5(f), 2, 1)) - 1)) AS b
        FROM (SELECT doc_id, source, unnest(fs) AS f FROM feats)
    ),
    tcnt AS (SELECT b, count(*) AS c FROM occ WHERE source = 'src0' GROUP BY b),
    rcnt AS (SELECT b, count(*) AS c FROM occ GROUP BY b),
    tot AS (SELECT (SELECT count(*) FROM occ WHERE source = 'src0') AS tt,
                   (SELECT count(*) FROM occ) AS tr),
    ratios AS (
        SELECT g.b,
               floor((ln((coalesce(t.c, 0) + 1) / CAST(tt + 256 AS DOUBLE))
                      - ln((coalesce(r.c, 0) + 1) / CAST(tr + 256 AS DOUBLE)))
                     * 1e9) / 1e9 AS lr
        FROM (SELECT unnest(range(0, 256)) AS b) g
        LEFT JOIN tcnt t USING (b) LEFT JOIN rcnt r USING (b), tot
    ),
    weights AS (
        SELECT o.doc_id,
               CAST(count(*) AS INT) AS n_features,
               floor(CAST(sum(CAST(r.lr AS DECIMAL(30,15))) AS DOUBLE)
                     * 1e6) / 1e6 AS weight
        FROM occ o JOIN ratios r USING (b)
        GROUP BY o.doc_id
    )
    SELECT d.doc_id,
           coalesce(w.n_features, 0) AS n_features,
           coalesce(w.weight, 0.0) AS weight,
           (coalesce(w.weight, 0.0) >= 0.0) AS selected
    FROM documents d LEFT JOIN weights w USING (doc_id)
    """,
)
def datapipe_dsir_select(spark, sf_dir):
    """DSIR data selection (Xie et al. 2023, arXiv:2302.03169): fit
    hashed unigram+bigram multinomials for a target domain (source =
    'src0') vs the raw corpus, then keep documents whose importance
    log-weight is >= 0 (more target-like than raw-average). The whole
    pipeline — md5 feature hashing, Laplace-smoothed log-ratios floored
    to 1e-9, exact-decimal per-doc folds — is engine-reproducible, so
    the oracle recomputes fit AND scoring in SQL. 100 TB shape in
    datapipe/dsir.py: two B-row fit aggregations, O(B) bounded collect,
    zero-shuffle scoring pass via a broadcast literal MAP."""
    from gpdb_spark.datapipe.dsir import dsir_select

    d = t(spark, sf_dir, "documents")
    return dsir_select(
        d, d.where(F.col("source") == "src0"), buckets=256
    ).select("doc_id", "n_features", "weight", "selected")


@query(
    "datapipe_filter_cascade",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS tk
        FROM documents
    ),
    stats AS (
        SELECT doc_id, lang,
               CAST(len(tk) AS INT) AS n_tokens,
               CAST(len(list_distinct(tk)) AS INT) AS n_distinct,
               CASE WHEN len(tk) >= 2
                    THEN list_transform(range(1, len(tk)),
                                        i -> tk[i] || ' ' || tk[i+1])
                    ELSE [] END AS g2,
               CAST(len(list_filter(tk, x -> x IN
                    ('the','a','of','and','to','in','is','that','it','for')))
                    AS INT) AS n_stopwords
        FROM toks
    ),
    verdicts AS (
        SELECT doc_id, n_tokens,
               coalesce(lang = 'en', false) AS pass_lang,
               (n_tokens >= 5) AS pass_min_tokens,
               (n_tokens <= 2000) AS pass_max_tokens,
               (n_distinct * 2 >= n_tokens) AS pass_ttr,
               ((len(g2) - len(list_distinct(g2))) * 5 <= len(g2))
                   AS pass_rep_2gram,
               (n_stopwords * 25 >= n_tokens) AS pass_stopwords
        FROM stats
    )
    SELECT doc_id, n_tokens, pass_lang, pass_min_tokens, pass_max_tokens,
           pass_ttr, pass_rep_2gram, pass_stopwords,
           CASE WHEN NOT pass_lang THEN 'lang'
                WHEN NOT pass_min_tokens THEN 'min_tokens'
                WHEN NOT pass_max_tokens THEN 'max_tokens'
                WHEN NOT pass_ttr THEN 'ttr'
                WHEN NOT pass_rep_2gram THEN 'rep_2gram'
                WHEN NOT pass_stopwords THEN 'stopwords'
                ELSE NULL END AS drop_reason,
           (pass_lang AND pass_min_tokens AND pass_max_tokens AND pass_ttr
            AND pass_rep_2gram AND pass_stopwords) AS kept
    FROM verdicts
    """,
)
def datapipe_filter_cascade(spark, sf_dir):
    """C4/Gopher-style quality-filter cascade with first-fail
    provenance (Raffel et al. 2020 §2.2; Rae et al. 2021 A.1.1): six
    ordered gates — declared language, token-count window, type-token
    ratio, duplicate-2-gram mass, stopword floor — each emitted as an
    attribute column plus the Dolma-style ``drop_reason``/``kept``
    verdict. Every threshold is an integer cross-multiplication, so the
    whole cascade is float-free and bit-identical cross-engine; the
    plan is a single zero-shuffle projection over the scan (100 TB
    shape + gate: datapipe/cascade.py, tests/test_plans.py)."""
    from gpdb_spark.datapipe.cascade import filter_cascade

    return filter_cascade(t(spark, sf_dir, "documents"))
