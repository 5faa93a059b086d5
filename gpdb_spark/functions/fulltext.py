"""Full-text search: tsvector/tsquery-lite on Spark.

Reference: the tsvector type (lexemes + positions,
src/backend/utils/adt/tsvector.c), tsquery matching (tsquery.c, AND/OR
over lexemes) and ranking (tsrank.c — term-frequency based rank with
optional document-length normalization). GPDB has no distributed inverted
index; text search runs as a per-row filter.

Spark-first design: the scale path is an explicit *inverted postings
table* — ``postings()`` explodes (doc, lexeme, tf, positions) once, and
matching/ranking become relational ops on it (filter + groupBy keyed by
lexeme/doc). That shape shuffles O(matched postings), never O(corpus),
and the postings table can be written out bucketed by lexeme for
repeated-query workloads (the industrial inverted-index layout).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gpdb_spark.registry import fr

from gpdb_spark.catalog import spread
from gpdb_spark.datapipe.text import tokens


def to_tsvector(text: Column | str) -> Column:
    """tsvector as a column: sorted array<struct<lexeme,tf>>.

    Parity/display form (tsvector.c's lexeme+count view). Quadratic in
    per-document distinct terms, so use ``postings()`` — the relational
    form — for corpus-scale matching instead.
    """
    toks = tokens(text)
    return F.transform(
        F.array_sort(F.array_distinct(toks)),
        lambda lex: F.struct(
            lex.alias("lexeme"),
            F.size(F.filter(toks, lambda t: t == lex)).alias("tf"),
        ),
    )


def postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Inverted postings: (id, lexeme, tf, positions). One shuffle keyed
    by (id, lexeme); downstream ops join/filter on lexeme."""
    return (
        spread(df).select(
            F.col(id_col).alias("id"),
            F.posexplode(tokens(F.col(text_col))).alias("pos", "lexeme"),
        )
        .groupBy("id", "lexeme")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.array_sort(F.collect_list("pos")).alias("positions"),
        )
    )


def ts_match(
    df: DataFrame,
    terms: Sequence[str],
    mode: str = "all",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """tsquery match: docs whose text contains ALL (``t1 & t2``) or ANY
    (``t1 | t2``) of the lexemes. Returns distinct ids.

    Planned as: postings filtered to the query lexemes (predicate reaches
    the scan), then a doc-keyed count — shuffle volume is only the
    postings of the query terms. Terms are lowercased at entry (the
    postings tokenizer lowercases the corpus — ts_headline and
    parse_tsquery already normalize; these must match)."""
    terms = [t.lower() for t in terms]
    p = postings(df, text_col, id_col).where(F.col("lexeme").isin(list(terms)))
    hits = p.groupBy("id").agg(F.count_distinct("lexeme").alias("nhit"))
    if mode == "all":
        hits = hits.where(F.col("nhit") == len(set(terms)))
    return hits.select(F.col("id").alias(id_col))


def ts_rank(
    df: DataFrame,
    terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """tsrank.c-style term-frequency rank: sum over matched query lexemes
    of tf/(tf+1) (the reference's word-frequency saturation), as an exact
    decimal sum so ranking is reproducible across engines."""
    terms = [t.lower() for t in terms]
    p = postings(df, text_col, id_col).where(F.col("lexeme").isin(list(terms)))
    rank = F.round(
        F.sum(
            (F.col("tf") / (F.col("tf") + F.lit(1.0))).cast("decimal(25,6)")
        ),
        6,
    ).cast("double")
    return p.groupBy("id").agg(rank.alias("rank")).select(
        F.col("id").alias(id_col), "rank"
    )


def ts_headline(
    df: DataFrame,
    term: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 3,
) -> DataFrame:
    """ts_headline-lite: for docs containing ``term``, the snippet of
    ``window`` tokens around the first occurrence."""
    toks = tokens(F.col(text_col))
    first = F.array_position(toks, term.lower())
    snippet = F.array_join(
        F.slice(
            toks,
            F.greatest(first - window, F.lit(1)),
            2 * window + 1,
        ),
        " ",
    )
    return df.where(first > 0).select(
        F.col(id_col), snippet.alias("headline")
    )


def ts_rank_cd(
    df: DataFrame,
    terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cover-density proximity rank (tsrank.c calc_rank_cd): documents
    where the query terms occur close together rank above documents where
    they are scattered. Computed as 1 / minimal-cover-width, the leading
    term of calc_rank_cd's cover sum (the reference's full sum walks
    every cover; the minimal cover dominates and keeps the expression
    closed-form).

    Shape: the postings join prunes to documents containing ALL query
    terms first; the cover search is then a per-row expression over the
    per-term position lists (product of per-doc term frequencies — small
    by construction for query terms). No extra shuffle beyond postings'.
    """
    terms = [t.lower() for t in terms]
    p = postings(df, text_col, id_col).where(F.col("lexeme").isin(list(terms)))
    aggs = [
        F.max(F.when(F.col("lexeme") == term, F.col("positions"))).alias(
            f"__p{i}"
        )
        for i, term in enumerate(terms)
    ]
    g = p.groupBy("id").agg(*aggs)
    for i in range(len(terms)):
        g = g.where(F.col(f"__p{i}").isNotNull())
    cols = [F.col(f"__p{i}") for i in range(len(terms))]

    def rec(vars_, idx):
        if idx == len(cols):
            return F.greatest(*vars_) - F.least(*vars_) + F.lit(1)
        return F.transform(cols[idx], lambda v: rec(vars_ + [v], idx + 1))

    spans = rec([], 0)
    for _ in range(len(cols) - 1):
        spans = F.flatten(spans)
    minspan = F.array_min(spans)
    return g.select(
        F.col("id").alias(id_col),
        minspan.cast("int").alias("minspan"),
        fr(F.lit(1.0) / minspan, 6).alias("rank_cd"),
    )


# -- tsquery text parser (tsquery.c makepol/gettoken_query) -----------------


def parse_tsquery(q: str):
    """Parse tsquery text — ``&`` AND, ``|`` OR, ``!`` NOT, parentheses
    (src/backend/utils/adt/tsquery.c's recursive-descent makepol, minus
    prefix-match ``:*`` and weights). Returns a nested tuple AST:
    ('and', l, r) | ('or', l, r) | ('not', x) | ('term', lexeme)."""
    import re as _re

    toks = _re.findall(r"[()&|!]|[^\s()&|!]+", q)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        pos += 1
        return toks[pos - 1]

    def atom():
        t = take()
        if t == "(":
            e = or_expr()
            if peek() == ")":
                take()
            return e
        if t == "!":
            return ("not", atom())
        return ("term", t.lower())

    def and_expr():
        left = atom()
        while peek() == "&":
            take()
            left = ("and", left, atom())
        return left

    def or_expr():
        left = and_expr()
        while peek() == "|":
            take()
            left = ("or", left, and_expr())
        return left

    ast = or_expr()
    if pos != len(toks):
        raise ValueError(f"trailing tokens in tsquery: {toks[pos:]}")
    return ast


def tsquery_terms(ast) -> set[str]:
    if ast[0] == "term":
        return {ast[1]}
    if ast[0] == "not":
        return tsquery_terms(ast[1])
    return tsquery_terms(ast[1]) | tsquery_terms(ast[2])


def ts_match_query(
    df: DataFrame,
    tsquery: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``to_tsvector(text) @@ to_tsquery(q)`` for the full boolean
    tsquery grammar. Evaluated per row over the token array (one scan,
    no shuffle: the boolean tree compiles to nested array_contains —
    matching the reference's TS_execute evaluator walking the query
    tree, tsvector_op.c) — the right shape when the predicate is one
    filter among many; postings-based ts_match remains the
    inverted-index path for repeated standing queries."""
    ast = parse_tsquery(tsquery)
    toks = F.array_distinct(tokens(F.col(text_col)))

    def compile_(node):
        kind = node[0]
        if kind == "term":
            return F.array_contains(toks, node[1])
        if kind == "not":
            return ~compile_(node[1])
        l, r = compile_(node[1]), compile_(node[2])
        return (l & r) if kind == "and" else (l | r)

    return df.where(compile_(ast)).select(F.col(id_col))


def ts_rank_weighted(
    df: DataFrame,
    terms: Sequence[str],
    weighted_cols: Sequence[tuple[str, float]],
    id_col: str = "doc_id",
) -> DataFrame:
    """setweight + weighted ts_rank (tsrank.c: the {D,C,B,A} weight
    vector, default {0.1, 0.2, 0.4, 1.0}): lexemes from different
    document fields carry different weights — title hits outrank body
    hits. ``weighted_cols``: (text_column, weight) pairs, e.g.
    [("title", 1.0), ("body", 0.1)].

    Shape: one postings pass per field (each pruned to the query terms
    at the scan), weight attached as a literal, a single 2-stage
    aggregation sums w * tf/(tf+1) per doc. Decimal-exact so ranking
    reproduces across engines."""
    terms = [t.lower() for t in terms]
    parts = []
    for col, w in weighted_cols:
        p = postings(df, col, id_col).where(F.col("lexeme").isin(list(terms)))
        parts.append(p.withColumn("__w", F.lit(float(w))))
    allp = parts[0]
    for extra in parts[1:]:
        allp = allp.unionAll(extra)
    rank = F.round(
        F.sum(
            (F.col("__w") * F.col("tf") / (F.col("tf") + F.lit(1.0))).cast(
                "decimal(25,6)"
            )
        ),
        6,
    ).cast("double")
    return allp.groupBy("id").agg(rank.alias("rank")).select(
        F.col("id").alias(id_col), "rank"
    )


def dict_int_lexize(
    tok: Column | str, maxlen: int = 6, rejectlong: bool = False
) -> Column:
    """contrib/dict_int (dict_int.c intdict_lexize): normalize integer
    tokens — digits longer than ``maxlen`` are truncated (default, like
    the module's maxlen=6) or rejected to NULL (rejectlong=true).
    Non-digit tokens pass through unchanged (the dictionary only fires
    on int/uint token types)."""
    t = F.col(tok) if isinstance(tok, str) else tok
    is_int = t.rlike("^[0-9]+$")
    too_long = F.length(t) > maxlen
    if rejectlong:
        return F.when(is_int & too_long, F.lit(None)).otherwise(t)
    return F.when(is_int & too_long, F.substring(t, 1, maxlen)).otherwise(t)


def expand_xsyn(
    toks: Column,
    rules: dict[str, list[str]],
    keeporig: bool = True,
    matchsynonyms: bool = False,
) -> Column:
    """contrib/dict_xsyn (dict_xsyn.c xsyn_lexize): expand each token
    through the synonym rules. Per dict_xsyn.c:240 a rule line's
    HEADWORD is emitted only when keeporig=true; the synonyms are
    always emitted — and with matchsynonyms=true a synonym token
    lexizes to the SAME group as its headword (not a reshuffled one).
    The rule map is a plan-time literal (broadcast-free constant
    folding); expansion is one flatten(transform(...)) — JVM, no
    shuffle."""
    expanded: dict[str, list[str]] = {}
    for word, syns in rules.items():
        group = ([word] if keeporig else []) + list(syns)
        expanded[word] = group
        if matchsynonyms:
            for s in syns:
                expanded.setdefault(s, group)
    pairs = []
    for word, group in expanded.items():
        pairs.append(F.lit(word))
        pairs.append(F.array(*[F.lit(g) for g in group]))
    m = F.create_map(*pairs) if pairs else F.create_map()
    return F.flatten(
        F.transform(
            toks,
            lambda t: F.coalesce(F.element_at(m, t), F.array(t)),
        )
    )
