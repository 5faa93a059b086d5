"""Exact duplicate-SPAN detection across a corpus (the ExactSubstr
dedup of Lee et al. 2022, "Deduplicating Training Data Makes Language
Models Better" — arXiv:2107.06499), Spark-shaped.

A true distributed suffix array is impractical at 100 TB; the
production-practical equivalent is window hashing with CONTENT-DEFINED
anchors (winnowing, Schleimer et al. SIGMOD 2003): a window of
``window`` tokens is hashed only where it starts at an *anchor* — a
token whose own hash is ≡ 0 (mod ``anchor_mod``). Because anchors are
chosen by token content, two copies of the same long substring anchor
at the SAME tokens in both documents regardless of their positions, so
matching windows hash identically — fixed-stride grids cannot
guarantee that (the copies' strides are out of phase). Any duplicated
run of ≥ window + O(anchor_mod) tokens contains an anchored window
with high probability (expected anchor gap = anchor_mod tokens).

Scale shape:

- span generation is a per-row JVM expression (transform + filter over
  the token array) — no UDF, linear in tokens, ~1/anchor_mod windows
  per token;
- the only shuffles are the window-hash groupBy (count > 1 = duplicated
  content) and the per-doc aggregation — both keyed, AQE-skew tolerant;
- hashes are the portable md5-derived family (dedup._token_hash), so
  span fingerprints are engine-reproducible and the whole operator is
  DuckDB-oracle-checked end to end.

Output flags spans (doc, start, hash) rather than rewriting text: the
cut/keep policy (drop doc, cut span, keep first copy) is a separate
cheap join against these flags, as in the reference pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gpdb_spark.catalog import spread
from gpdb_spark.datapipe.text import tokens


def _tok_mod(tk: Column, mod: int) -> Column:
    """Portable 60-bit md5-derived token hash mod ``mod`` (same family
    as dedup._token_hash — kept inline so the anchor rule is visible)."""
    return F.conv(F.substring(F.md5(tk), 1, 15), 16, 10).cast("long") % mod


def dup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 16,
    anchor_mod: int = 4,
) -> DataFrame:
    """Per-document duplicated-span report: ``n_spans`` anchored windows
    considered, ``n_dup_spans`` of them whose content appears elsewhere
    in the corpus (or again in the same document), ``dup_starts`` the
    sorted 1-based token offsets of those windows."""
    toks = tokens(text_col)
    d = spread(df).select(F.col(id_col).alias("_id"), toks.alias("_tk"))
    n = F.array_size(F.col("_tk"))
    # explicit emptiness guard: Spark's sequence(1, 0) counts DOWN
    positions = F.when(
        n >= window, F.sequence(F.lit(1), n - window + 1)
    ).otherwise(F.array().cast("array<int>"))
    anchors = F.filter(
        positions,
        lambda i: _tok_mod(F.element_at(F.col("_tk"), i), anchor_mod) == 0,
    )
    spans = d.select(
        "_id",
        F.explode(
            F.transform(
                anchors,
                lambda i: F.struct(
                    i.alias("start"),
                    F.md5(
                        F.array_join(F.slice(F.col("_tk"), i, window), " ")
                    ).alias("h"),
                ),
            )
        ).alias("s"),
    ).select("_id", F.col("s.start").alias("start"), F.col("s.h").alias("h"))

    dup = (
        spans.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .select("h", F.lit(1).alias("__dup"))
    )
    # LEFT join + ONE per-doc aggregation serves both the totals and
    # the duplicate stats — the naive three-branch formulation (dup /
    # flagged / totals) re-tokenizes and re-hashes the whole corpus
    # three times; this shape reads the span stream twice (once for the
    # duplicate-hash set, once through the join), the minimum without
    # caching a corpus-sized relation.
    flagged = spans.join(dup, "h", "left")
    return flagged.groupBy("_id").agg(
        F.count(F.lit(1)).alias("__n_spans"),
        F.count("__dup").alias("__n_dup"),
        F.sort_array(
            F.collect_list(F.when(F.col("__dup") == 1, F.col("start")))
        ).alias("__starts"),
    ).select(
        F.col("_id").alias(id_col),
        F.col("__n_spans").alias("n_spans"),
        F.col("__n_dup").alias("n_dup_spans"),
        F.col("__starts").alias("dup_starts"),
    )
