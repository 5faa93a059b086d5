"""Multinomial Naive Bayes text classifier — train AND score as pure
declarative aggregation (the fastText-style corpus classifier of a
pretraining pipeline: language ID, quality tiers, domain routing).

Train: one explode + one (label, token) count — the classic inverted
model build, fully partial-aggregatable. Score: document tokens join
the broadcast model, per-(doc, label) sum of floored log-likelihood
terms, window argmax. At 100 TB the model relation is |labels| x |vocab|
(tiny next to the corpus) and broadcasts; the corpus is touched twice
(train, score), each time with one keyed shuffle.

Determinism: log() can differ by 1 ulp between libms, so every log term
is floor-truncated to 12 decimals before the exact DECIMAL sum
(same doctrine as operators/graph_rank.py); the emitted columns carry
no raw floats — just the argmax label — so the result is
engine-reproducible and the DuckDB oracle replays the identical
train+score pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gpdb_spark.datapipe.text import tokens
from gpdb_spark.registry import fx, xsum

DEC30 = "decimal(30,15)"


def _floor12(c):
    return F.floor(c * F.lit(1e12)) / F.lit(1e12)


def nb_classify(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train on (text, label), re-score every document; returns
    (id, label, pred, is_correct). Laplace smoothing alpha=1."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("label"),
        F.explode(tokens(text_col)).alias("tok"),
    ).where(F.col("tok") != "").persist()

    counts = toks.groupBy("label", "tok").agg(F.count(F.lit(1)).alias("n"))
    totals = toks.groupBy("label").agg(F.count(F.lit(1)).alias("total"))
    vocab_n = toks.select("tok").distinct().count()  # scalar V in the plan
    n_docs = df.count()
    priors = (
        df.groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn(
            "log_prior",
            _floor12(F.log(F.col("n_docs").cast("double") / F.lit(float(n_docs)))),
        )
        .select("label", "log_prior")
    )
    # model: log p(tok | label), smoothed; unseen tokens fall back to
    # log(1/(total+V)) via the per-label default. r11 (guide §1.2): the
    # floor-12 terms ride as LONG fixed points (registry.fx) and the
    # per-(doc,label) sum runs as registry.xsum's primitive split-long
    # sums — value-identical to casting floor(x*1e12)/1e12 to
    # DECIMAL(30,15) and decimal-summing (|log terms| < 40, so u has
    # <= 14 significant digits; see xsum's docstring), with no per-row
    # decimal allocation in the (doc token x label) hot path.
    model = (
        counts.join(totals, "label")
        .select(
            F.col("label").alias("m_label"),
            "tok",
            fx(
                F.log(
                    (F.col("n") + 1).cast("double")
                    / (F.col("total") + vocab_n).cast("double")
                ),
                12,
            ).alias("log_p"),
        )
    )
    default = totals.select(
        F.col("label").alias("m_label"),
        fx(
            F.log(F.lit(1.0) / (F.col("total") + vocab_n).cast("double")), 12
        ).alias("log_default"),
    )
    # every (doc token, candidate label) pair; left join model for seen
    scored = (
        toks.crossJoin(F.broadcast(default))
        .join(
            F.broadcast(model),
            ["m_label", "tok"],
            "left",
        )
        .select(
            "id",
            "label",
            "m_label",
            F.coalesce(F.col("log_p"), F.col("log_default")).alias("term"),
        )
        .groupBy("id", "label", "m_label")
        .agg(xsum(F.col("term"), 12).alias("loglik"))
        .join(F.broadcast(priors.withColumnRenamed("label", "m_label")), "m_label")
        .withColumn(
            "score", F.col("loglik") + F.col("log_prior").cast(DEC30)
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), "m_label")
    return (
        scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select(
            F.col("id").alias(id_col),
            F.col("label").alias(label_col),
            F.col("m_label").alias("pred"),
            (F.col("m_label") == F.col("label")).alias("is_correct"),
        )
    )
