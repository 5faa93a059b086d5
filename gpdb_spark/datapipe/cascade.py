"""Composable document-filter cascade with per-stage provenance — the
C4 (Raffel et al. 2020, arXiv:1910.10683 §2.2) / Gopher (Rae et al.
2021, arXiv:2112.11446 A.1.1) / Dolma-style cleaning pass a training
pipeline runs before dedup: every document flows through an ordered
list of quality gates, each gate is recorded as an attribute column,
and a dropped document carries WHICH gate dropped it (first-fail
provenance) so corpus-curation decisions stay auditable.

Design constraints, in priority order:

1. **Integer-exact predicates.** Every threshold is expressed as an
   integer cross-multiplication (``distinct*2 >= n`` instead of
   ``distinct/n >= 0.5``), so the cascade never touches a float and is
   bit-identical in any engine — the repo's float-determinism doctrine
   taken to its limit: no floats to discipline at all.
2. **One projection, zero shuffles.** All stage statistics (token
   count, distinct tokens, 2-gram repetition, stopword occurrences)
   are hoisted into a single stats projection over one tokenization
   (invariant hoisting: the token array is computed once and shared),
   and the stage predicates + provenance fold are plain column
   expressions over it. At 100 TB the cascade is a map over the scan —
   it pipelines with the parquet read and costs zero exchanges
   [gate: tests/test_plans.py].
3. **Composable.** ``filter_cascade`` takes any ordered list of
   (name, builder) stages; ``default_stages`` is the C4/Gopher preset.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gpdb_spark.datapipe.text import STOPWORDS, tokens

# A stage is (name, builder); the builder sees the stats projection and
# returns a boolean pass/fail Column. NULL never escapes a stage: the
# cascade coalesces every verdict to False (a document we cannot assess
# is a document we drop, with provenance).
Stage = tuple[str, Callable[[DataFrame], Column]]


def doc_stats(
    df: DataFrame, text_col: str = "text", lang: str = "en"
) -> DataFrame:
    """Hoist the per-document statistics every stage reads: one
    tokenization, integer counts only. NULL text = zero tokens (the
    empty document, which the min-length gate then drops)."""
    tk = tokens(F.coalesce(F.col(text_col), F.lit("")))
    d = df.withColumn("_tk", tk)
    n = F.array_size(F.col("_tk"))
    g2 = F.when(
        n >= 2,
        F.zip_with(
            F.slice(F.col("_tk"), 1, (n - 1).cast("int")),
            F.slice(F.col("_tk"), 2, (n - 1).cast("int")),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return (
        d.withColumn("n_tokens", n.cast("int"))
        .withColumn(
            "n_distinct", F.array_size(F.array_distinct(F.col("_tk"))).cast("int")
        )
        .withColumn("_g2", g2)
        .withColumn("n_2grams", F.array_size(F.col("_g2")).cast("int"))
        .withColumn(
            "n_dup_2grams",
            (
                F.array_size(F.col("_g2"))
                - F.array_size(F.array_distinct(F.col("_g2")))
            ).cast("int"),
        )
        .withColumn(
            "n_stopwords",
            F.size(
                F.filter(F.col("_tk"), lambda x: F.array_contains(sw, x))
            ).cast("int"),
        )
        .drop("_tk", "_g2")
    )


def default_stages(
    lang: str = "en",
    min_tokens: int = 5,
    max_tokens: int = 2000,
) -> list[Stage]:
    """The C4/Gopher preset, ordered the way C4 applies them: declared
    language, length window, lexical diversity (type-token ratio >=
    1/2), within-document repetition (duplicate 2-gram mass <= 1/5,
    Gopher's dup-n-gram family), stopword floor (>= 1/25 of tokens,
    C4's 'contains an English stopword' gate generalized to a rate).
    Every ratio is an integer cross-multiplication."""
    return [
        ("lang", lambda d: F.col("lang") == lang),
        ("min_tokens", lambda d: F.col("n_tokens") >= min_tokens),
        ("max_tokens", lambda d: F.col("n_tokens") <= max_tokens),
        ("ttr", lambda d: F.col("n_distinct") * 2 >= F.col("n_tokens")),
        (
            "rep_2gram",
            lambda d: F.col("n_dup_2grams") * 5 <= F.col("n_2grams"),
        ),
        (
            "stopwords",
            lambda d: F.col("n_stopwords") * 25 >= F.col("n_tokens"),
        ),
    ]


def filter_cascade(
    df: DataFrame,
    stages: list[Stage] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str = "en",
) -> DataFrame:
    """Run the cascade: per-stage pass booleans (attribute columns, the
    Dolma attribute/filter split), ``drop_reason`` = name of the FIRST
    failing stage (NULL when kept), ``kept`` = all stages pass.

    Single zero-shuffle projection; drop the booleans and filter on
    ``kept`` for the production path, keep them for curation audits."""
    stages = default_stages(lang) if stages is None else stages
    d = doc_stats(df, text_col, lang)
    out_cols: list[Column] = [F.col(id_col), F.col("n_tokens")]
    verdicts: list[tuple[str, Column]] = []
    for name, builder in stages:
        v = F.coalesce(builder(d), F.lit(False))
        verdicts.append((name, v))
        out_cols.append(v.alias(f"pass_{name}"))
    reason = F.lit(None).cast("string")
    for name, v in reversed(verdicts):
        reason = F.when(~v, F.lit(name)).otherwise(reason)
    kept = F.lit(True)
    for _, v in verdicts:
        kept = kept & v
    return d.select(*out_cols, reason.alias("drop_reason"), kept.alias("kept"))
