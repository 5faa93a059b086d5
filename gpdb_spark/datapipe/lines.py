"""Line-level corpus operations — the C4-style cleanup steps that run
BELOW document granularity.

Reference point: the reference engine has no analog (it stops at SQL
rows); these are the operations a 100 TB web-text pipeline needs and the
fixture `documents` table exercises. Both are single-shuffle shapes:

- ``dedup_lines_across_corpus``: C4's "discard every line that appears
  more than once in the corpus" (three-sentence-span rule simplified to
  lines). Explode lines with positions -> global line-hash frequency
  (one 2-stage agg) -> keep lines passing the policy -> reassemble text
  ordered by original position (one groupBy on doc_id). Shuffle cost:
  2x O(total lines), keyed by line-hash then doc — no pairwise
  comparison anywhere.

- ``contamination_flags``: benchmark decontamination — flag documents
  whose word n-grams intersect a (small) benchmark n-gram set, shipped
  as one literal array; the test is a per-row array_intersect — zero
  shuffle, codegen-friendly, the shape that scans 100 TB once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gpdb_spark.catalog import spread
from gpdb_spark.datapipe.text import ngrams


def dedup_lines_across_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_first: bool = False,
) -> DataFrame:
    """Remove corpus-duplicated lines from every document.

    ``keep_first=False`` is the C4 policy (a line appearing in 2+ docs
    is dropped from ALL of them); ``keep_first=True`` keeps the single
    occurrence with the smallest (doc_id, position).

    Returns (id, text, n_lines_kept, n_lines_dropped).
    """
    lines = spread(df).select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    freq = lines.groupBy("line").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.struct("id", "pos")).alias("first_at"),
    )
    joined = lines.join(freq, "line")
    if keep_first:
        keep = (F.col("n") == 1) | (
            (F.col("first_at.id") == F.col("id"))
            & (F.col("first_at.pos") == F.col("pos"))
        )
    else:
        keep = F.col("n") == 1
    marked = joined.withColumn("__keep", keep)
    return (
        marked.groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__keep"), F.struct("pos", "line")
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("text"),
            F.sum(F.col("__keep").cast("long")).alias("n_lines_kept"),
            F.sum((~F.col("__keep")).cast("long")).alias("n_lines_dropped"),
        )
        .select(F.col("id").alias(id_col), "text", "n_lines_kept", "n_lines_dropped")
    )


def contamination_flags(
    df: DataFrame,
    benchmark_texts: list[str],
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag documents sharing any word n-gram with the benchmark set.

    Returns (id, n_grams, n_hits, contaminated). The benchmark n-gram
    set is built driver-side from the given texts (benchmarks are small
    by definition — thousands of grams, not corpus-scale) and folded
    into the plan as ONE literal array: broadcast semantics with no
    join, no shuffle — the decontamination pass is a pure map over the
    corpus scan."""
    bench_grams = sorted(
        {g for t in benchmark_texts for g in _py_ngrams(t, n)}
    )
    bench = F.array(*[F.lit(g) for g in bench_grams])
    doc_grams = F.array_distinct(ngrams(F.col(text_col), n))
    hits = F.size(F.array_intersect(doc_grams, bench))
    return spread(df).select(
        F.col(id_col).alias(id_col),
        F.coalesce(F.size(doc_grams), F.lit(0)).alias("n_grams"),
        F.coalesce(hits, F.lit(0)).alias("n_hits"),
        F.coalesce(hits > 0, F.lit(False)).alias("contaminated"),
    )


def _py_ngrams(text: str, n: int) -> list[str]:
    """Driver-side mirror of datapipe.text.ngrams' tokenization (lower +
    whitespace split) for building the benchmark gram set."""
    toks = [t for t in text.lower().split() if t]
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
