"""N-gram language-model quality scoring (CCNet/KenLM-style perplexity
proxy) for training-data pipelines.

Beyond-reference capability (SURVEY.md §7 phase 6): the reference's
text surface stops at tsvector/ts_rank (tsrank.c); LLM corpus curation
additionally filters on LM perplexity (CCNet: Wenzek et al. 2020,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data" — five-gram KenLM; here a bigram model with add-one backoff,
which is the same pipeline shape at a fraction of the state).

100 TB design:

- **The model is bounded by construction** — top-``vocab_size`` unigrams
  and top-``max_bigrams`` bigrams (deterministic count-desc, word-asc
  cutoff). Both fit comfortably in executor memory, so scoring joins
  BROADCAST the model and the corpus stream never shuffles for them.
- **Training** is two hash aggregations (unigram count, bigram count) —
  the same 2-stage partial-agg shape as any groupBy; the bigram count
  is pre-filtered by a broadcast vocab semi-join so junk-token pairs
  never enter the shuffle.
- **Scoring** is explode -> broadcast-join -> per-doc sum: linear in
  token count, partial-aggregated map-side on doc_id.
- **Determinism**: per-token log-probs are floor-scaled to integer
  micro-nats BEFORE the order-independent integer sum, so engine
  comparison is rounding-free (the registry's DECIMAL discipline,
  applied to logs).

Everything is JVM column expressions — no Python in the row path
(gate: tests/test_plans.py no-UDF check + broadcast assertion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from gpdb_spark.datapipe.text import tokens

# ONE definition of the nominal vocabulary size: the add-one smoothing
# denominator V must equal the vocab_size the model was trained with —
# training and scoring share this default so the pair cannot silently
# diverge (pass the same explicit value to BOTH if you customize it).
# V is deliberately the NOMINAL cutoff, not vocab.count(): add-one over
# a fixed event space keeps scores comparable across corpora that
# under-fill the cutoff, and derivation would cost an extra action.
DEFAULT_VOCAB_SIZE = 50_000


def _pairs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) adjacent-token pairs, JVM-side: zip the token array
    with itself shifted by one, explode."""
    toks = tokens(text_col)
    # guard: slice length must be >= 0 for empty/1-token docs
    n = F.greatest(F.array_size(toks) - 1, F.lit(0))
    zipped = F.arrays_zip(
        F.slice(toks, 1, n).alias("w1"),
        F.slice(toks, 2, n).alias("w2"),
    )
    return (
        df.select(F.col(id_col).alias("_id"), F.explode(zipped).alias("p"))
        .select("_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def train_bigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = DEFAULT_VOCAB_SIZE,
    max_bigrams: int = 500_000,
) -> tuple[DataFrame, DataFrame]:
    """Count-based bigram LM: returns (vocab, bigrams) where vocab is
    the top-``vocab_size`` unigrams (w, c) and bigrams the
    top-``max_bigrams`` pairs (w1, w2, c) with both words in vocab.
    Cutoffs are totally ordered (count desc, word asc) so the trained
    model is deterministic under any partitioning."""
    tok = docs.select(F.explode(tokens(text_col)).alias("w"))
    uni = tok.groupBy("w").agg(F.count("*").alias("c"))
    vocab = uni.orderBy(F.desc("c"), "w").limit(vocab_size)

    pr = _pairs(docs, docs.columns[0], text_col)
    v1 = broadcast(vocab.select(F.col("w").alias("w1")))
    v2 = broadcast(vocab.select(F.col("w").alias("w2")))
    bi = (
        pr.join(v1, "w1").join(v2, "w2")
        .groupBy("w1", "w2").agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "w1", "w2")
        .limit(max_bigrams)
    )
    return vocab, bi


def lm_quality(
    docs: DataFrame,
    vocab: DataFrame,
    bigrams: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = DEFAULT_VOCAB_SIZE,
) -> DataFrame:
    """Per-document average negative log-likelihood under the bigram
    model with add-one smoothing:

        P(w2 | w1) = (c(w1,w2) + 1) / (c(w1) + V)

    (OOV w1 has c=0 — the uniform backoff row.) ``vocab_size`` MUST
    equal the value the model was trained with (shared default:
    DEFAULT_VOCAB_SIZE) — a mismatched V silently skews every score.
    Output per doc:
    ``n_pairs``, ``nll_sum_micro`` (integer micro-nats, exact
    order-independent sum of floor-scaled per-pair logs) and
    ``avg_nll_milli`` (milli-nats, floor-scaled). Lower = more natural
    under the corpus model; filter high-perplexity docs above a
    threshold. Docs with <2 tokens have no pairs and are excluded
    (CCNet drops them too)."""
    pr = _pairs(docs, id_col, text_col)
    bi = broadcast(bigrams.select("w1", "w2", F.col("c").alias("cb")))
    un = broadcast(vocab.select(F.col("w").alias("w1"), F.col("c").alias("cu")))
    V = float(vocab_size)
    logp = F.log(
        (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(1.0))
        / (F.coalesce(F.col("cu"), F.lit(0)) + F.lit(V))
    )
    scored = (
        pr.join(bi, ["w1", "w2"], "left")
        .join(un, ["w1"], "left")
        .select("_id", F.floor(logp * F.lit(1_000_000.0)).alias("lp"))
        .groupBy("_id")
        .agg(F.count("*").alias("n_pairs"), (-F.sum("lp")).alias("nll_sum_micro"))
    )
    return scored.select(
        F.col("_id").alias(id_col),
        "n_pairs",
        "nll_sum_micro",
        F.floor(
            F.col("nll_sum_micro") / (F.lit(1000.0) * F.col("n_pairs"))
        ).cast("bigint").alias("avg_nll_milli"),
    )
