"""Full-text search queries (tsvector/tsquery/ts_rank parity —
src/backend/utils/adt/tsvector.c, tsquery.c, tsrank.c) over the documents
fixture, via the inverted-postings scale path in
gpdb_spark.functions.fulltext.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gpdb_spark.registry import query, t
from gpdb_spark.functions import fulltext as FT

# DuckDB tokenizer mirroring datapipe.text.tokens (lowercase, split \s+,
# drop empties)
_TOKS = (
    "SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok"
    " FROM documents"
)


@query(
    "fulltext_match_all",
    oracle=f"""
    WITH toks AS ({_TOKS}), tf AS (
        SELECT doc_id, tok FROM toks WHERE tok IN ('spark', 'vector')
        GROUP BY doc_id, tok
    )
    SELECT doc_id FROM tf GROUP BY doc_id HAVING count(*) = 2
    """,
)
def fulltext_match_all(spark, sf_dir):
    """tsquery AND: documents matching 'spark & vector'."""
    d = t(spark, sf_dir, "documents")
    return FT.ts_match(d, ["spark", "vector"], mode="all")


@query(
    "fulltext_match_any",
    oracle=f"""
    WITH toks AS ({_TOKS})
    SELECT DISTINCT doc_id FROM toks WHERE tok IN ('spark', 'vector')
    """,
)
def fulltext_match_any(spark, sf_dir):
    """tsquery OR: documents matching 'spark | vector'."""
    d = t(spark, sf_dir, "documents")
    return FT.ts_match(d, ["spark", "vector"], mode="any")


@query(
    "fulltext_rank",
    oracle=f"""
    WITH toks AS ({_TOKS}), tf AS (
        SELECT doc_id, tok, count(*) AS tf FROM toks
        WHERE tok IN ('hash', 'join', 'merge') GROUP BY doc_id, tok
    )
    SELECT doc_id,
           CAST(round(sum(CAST(tf / (tf + 1.0) AS DECIMAL(25,6))), 6)
                AS DOUBLE) AS rank
    FROM tf GROUP BY doc_id
    """,
)
def fulltext_rank(spark, sf_dir):
    """ts_rank-lite: saturation-weighted term frequency sum for the query
    ('hash', 'join', 'merge')."""
    d = t(spark, sf_dir, "documents")
    return FT.ts_rank(d, ["hash", "join", "merge"])


@query(
    "fulltext_headline",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                           x -> x <> '') AS tk
        FROM documents
    ), hit AS (
        SELECT doc_id, tk, list_position(tk, 'vector') AS p FROM toks
    )
    SELECT doc_id,
           array_to_string(tk[greatest(p - 3, 1) : greatest(p - 3, 1) + 6], ' ')
               AS headline
    FROM hit WHERE p IS NOT NULL AND p > 0
    """,
)
def fulltext_headline(spark, sf_dir):
    """ts_headline-lite: 7-token snippet around the first 'vector' hit."""
    d = t(spark, sf_dir, "documents")
    return FT.ts_headline(d, "vector", window=3)


@query(
    "fulltext_rank_cd",
    oracle="""
    WITH tk AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')
                 AS toks
        FROM documents
    ), pos AS (
        SELECT doc_id,
               list_filter(list_transform(toks,
                   (x, i) -> CASE WHEN x = 'hash' THEN i END),
                   v -> v IS NOT NULL) AS p0,
               list_filter(list_transform(toks,
                   (x, i) -> CASE WHEN x = 'join' THEN i END),
                   v -> v IS NOT NULL) AS p1
        FROM tk
    ), spans AS (
        SELECT doc_id,
               list_min(flatten(list_transform(p0,
                   a -> list_transform(p1,
                   b -> greatest(a, b) - least(a, b) + 1)))) AS minspan
        FROM pos WHERE len(p0) > 0 AND len(p1) > 0
    )
    SELECT doc_id, CAST(minspan AS INT) AS minspan,
           (floor(1.0 / minspan * 1e6) / 1e6) AS rank_cd
    FROM spans
    """,
)
def fulltext_rank_cd(spark, sf_dir):
    """Cover-density proximity rank — ts_rank_cd (tsrank.c calc_rank_cd)
    for the query 'hash' AND 'join': 1/minimal-cover-width over the
    per-term position lists from the inverted postings table. The DuckDB
    oracle re-derives positions with indexed list lambdas (its 1-based i
    vs posexplode's 0-based cancels in the span width)."""
    d = t(spark, sf_dir, "documents")
    return FT.ts_rank_cd(d, ["hash", "join"])


@query(
    "fulltext_tsquery_boolean",
    # same boolean over DuckDB list_contains — independent evaluation of
    # the identical query tree
    oracle="""
    WITH tk AS (
        SELECT doc_id,
               list_distinct(list_filter(
                   string_split_regex(lower(text), '\\s+'), x -> x <> ''))
                 AS toks
        FROM documents
    )
    SELECT doc_id FROM tk
    WHERE (list_contains(toks, 'hash') AND
           (list_contains(toks, 'join') OR list_contains(toks, 'merge')))
          AND NOT list_contains(toks, 'error')
    """,
)
def fulltext_tsquery_boolean(spark, sf_dir):
    """Full boolean tsquery: ``hash & (join | merge) & !error``
    (tsquery.c makepol grammar; TS_execute evaluation) compiled to one
    per-row boolean filter — single scan, zero shuffle."""
    d = t(spark, sf_dir, "documents")
    return FT.ts_match_query(d, "hash & (join | merge) & !error")


@query(
    "fulltext_weighted_rank",
    # title = first 6 whitespace tokens of the text (deterministic field
    # derivation both engines perform identically); weights A=1.0 (title)
    # and D=0.1 (body) — tsrank.c's default weight vector endpoints
    oracle="""
    WITH fields AS (
        SELECT doc_id,
               array_to_string(list_filter(string_split_regex(lower(text), '\\s+'),
                   x -> x <> '')[1:6], ' ') AS title,
               text AS body
        FROM documents
    ), toks AS (
        SELECT doc_id, 1.0 AS w, unnest(list_filter(
            string_split_regex(lower(title), '\\s+'), x -> x <> '')) AS tok
        FROM fields
        UNION ALL
        SELECT doc_id, 0.1 AS w, unnest(list_filter(
            string_split_regex(lower(body), '\\s+'), x -> x <> '')) AS tok
        FROM fields
    ), tf AS (
        SELECT doc_id, w, tok, count(*) AS tf
        FROM toks WHERE tok IN ('hash', 'join', 'merge')
        GROUP BY doc_id, w, tok
    )
    SELECT doc_id,
           CAST(round(sum(CAST(w * tf / (tf + 1.0) AS DECIMAL(25,6))), 6)
                AS DOUBLE) AS rank
    FROM tf GROUP BY doc_id
    """,
)
def fulltext_weighted_rank(spark, sf_dir):
    """setweight('A' title / 'D' body) + ts_rank with the weight vector
    (tsrank.c calc_rank, default {0.1,0.2,0.4,1.0}): the title field —
    derived as the first 6 tokens — outranks body occurrences 10:1."""
    d = t(spark, sf_dir, "documents")
    from gpdb_spark.datapipe.text import tokens as _tokens

    fields = d.select(
        "doc_id",
        F.array_join(F.slice(_tokens(F.col("text")), 1, 6), " ").alias("title"),
        F.col("text").alias("body"),
    )
    return FT.ts_rank_weighted(
        fields, ["hash", "join", "merge"], [("title", 1.0), ("body", 0.1)]
    )


@query(
    "fulltext_tfidf_rank",
    # tf-idf ranked retrieval: idf = ln(N/df) per query lexeme (corpus
    # statistic, one tiny aggregation), score = sum tf*idf. floor-12 the
    # idf (log ulp portability) and tf*idf terms, exact decimal sum, so
    # the ranking is engine-reproducible (registry determinism policy).
    oracle=f"""
    WITH toks AS ({_TOKS}),
    nd AS (SELECT count(*) AS n FROM documents),
    tf AS (
        SELECT doc_id, tok, count(*) AS tf FROM toks
        WHERE tok IN ('hash', 'join', 'merge') GROUP BY doc_id, tok
    ),
    idf AS (
        SELECT tok,
               floor(ln(CAST(nd.n AS DOUBLE) / count(DISTINCT doc_id))
                     * 1e12) / 1e12 AS idf
        FROM tf, nd GROUP BY tok, nd.n
    )
    SELECT f.doc_id,
           CAST(sum(CAST(floor(f.tf * i.idf * 1e12) / 1e12
                         AS DECIMAL(30,15))) AS DOUBLE) AS tfidf
    FROM tf f JOIN idf i USING (tok)
    GROUP BY f.doc_id
    """,
)
def fulltext_tfidf_rank(spark, sf_dir):
    """tf-idf ranked retrieval for the query ('hash','join','merge') —
    the corpus-statistics rank beside the saturation rank
    (fulltext_rank) and the proximity rank (fulltext_rank_cd). The idf
    relation is |query lexemes| rows (broadcast); scoring is one keyed
    aggregation over the postings."""
    d = t(spark, sf_dir, "documents")
    terms = ["hash", "join", "merge"]
    n_docs = d.count()
    p = FT.postings(d, "text", "doc_id").where(F.col("lexeme").isin(terms))
    idf = (
        p.groupBy("lexeme")
        .agg(F.count_distinct("id").alias("df"))
        .select(
            "lexeme",
            (
                F.floor(
                    F.log(F.lit(float(n_docs)) / F.col("df")) * F.lit(1e12)
                )
                / F.lit(1e12)
            ).alias("idf"),
        )
    )
    # r11: floor-12 term as a LONG fixed point + registry.xsum split-long
    # sum — value-identical to the DECIMAL(30,15) cast/sum (tf*idf is
    # O(10), so u has <= 14 significant digits; xsum docstring).
    from gpdb_spark.registry import xsum

    return (
        p.join(F.broadcast(idf), "lexeme")
        .select(
            F.col("id").alias("doc_id"),
            F.floor(F.col("tf") * F.col("idf") * F.lit(1e12)).alias("term"),
        )
        .groupBy("doc_id")
        .agg(xsum(F.col("term"), 12).cast("double").alias("tfidf"))
    )


@query(
    "fulltext_dicts",
    # oracle mirrors the two dictionaries independently: xsyn expansion
    # as a per-token CASE into lists (same rules, re-derived), dict_int
    # as substr/length arithmetic
    oracle="""
    WITH tk AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                           x -> x <> '') AS toks,
               CAST(length(text) AS VARCHAR) AS len_tok
        FROM documents WHERE doc_id <= 120
    ), ex AS (
        SELECT doc_id, toks, len_tok,
               flatten(list_transform(toks, t -> CASE
                   WHEN t = 'fast' THEN ['fast', 'quick', 'rapid']
                   WHEN t = 'spark' THEN ['spark', 'flame']
                   ELSE [t] END)) AS etoks
        FROM tk
    )
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_before,
           CAST(len(etoks) AS INT) AS n_after,
           list_contains(etoks, 'quick') AS syn_match,
           CASE WHEN length(len_tok) > 3 THEN substr(len_tok, 1, 3)
                ELSE len_tok END AS len_trunc,
           CASE WHEN length(len_tok) > 3 THEN NULL ELSE len_tok END
               AS len_reject
    FROM ex
    """,
)
def fulltext_dicts(spark, sf_dir):
    """Text-search dictionaries (contrib/dict_xsyn xsyn_lexize,
    contrib/dict_int intdict_lexize): synonym expansion of the token
    stream through a plan-time literal rule map ('fast' -> quick/rapid,
    'spark' -> flame) so querying a synonym matches the headword, and
    integer-token normalization (maxlen truncate vs rejectlong) applied
    to the document-length digit token. All JVM map/flatten/transform
    HOFs, zero shuffle."""
    from gpdb_spark.datapipe.text import tokens as _tokens
    from gpdb_spark.functions.fulltext import dict_int_lexize, expand_xsyn

    rules = {"fast": ["quick", "rapid"], "spark": ["flame"]}
    d = t(spark, sf_dir, "documents").where(F.col("doc_id") <= 120)
    src = d.select(
        "doc_id",
        _tokens(F.col("text")).alias("toks"),
        F.length("text").cast("string").alias("len_tok"),
    )
    e = src.withColumn("etoks", expand_xsyn(F.col("toks"), rules))
    return e.select(
        "doc_id",
        F.array_size("toks").alias("n_before"),
        F.array_size("etoks").alias("n_after"),
        F.array_contains("etoks", "quick").alias("syn_match"),
        dict_int_lexize("len_tok", maxlen=3).alias("len_trunc"),
        dict_int_lexize("len_tok", maxlen=3, rejectlong=True).alias(
            "len_reject"
        ),
    )
