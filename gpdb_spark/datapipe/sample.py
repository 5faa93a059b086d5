"""Deterministic sampling / split assignment for training-data pipelines.

Random sampling (``df.sample``) is seed- and partitioning-dependent, so a
re-run or a repartition silently changes the training set. Hash-based
assignment is the production-standard alternative: each row's fate is a
pure function of its key, so splits are reproducible across runs,
engines, and cluster sizes, and rows added later don't reshuffle earlier
assignments. All pure JVM expressions (md5/substring/compare — codegen),
no shuffle at all: the split column is a narrow projection.

The hash compare is done LEXICALLY on a hex prefix (not modulo on a
parsed int), which makes the exact same expression portable to any
engine with md5() — the DuckDB oracle reproduces it verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hex_threshold(frac: float) -> str:
    """8-hex-digit threshold such that P(md5_prefix < thr) = frac."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {frac}")
    return format(min(int(frac * 16**8), 16**8 - 1), "08x")


def _key_hash(key: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8)


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows keyed by ``key_col``.
    ``salt`` decorrelates independent samples over the same keys."""
    return df.where(
        _key_hash(F.col(key_col), salt) < F.lit(_hex_threshold(fraction))
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    train_frac: float = 0.9,
    salt: str = "",
    col_name: str = "split",
) -> DataFrame:
    """Append a train/valid assignment column — the held-out-split
    operator every training pipeline needs, reproducible by key."""
    return df.withColumn(
        col_name,
        F.when(
            _key_hash(F.col(key_col), salt)
            < F.lit(_hex_threshold(train_frac)),
            F.lit("train"),
        ).otherwise(F.lit("valid")),
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_frac: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (df.sampleBy without the seed/
    partitioning dependence): each stratum keeps its own fraction of
    keys. The per-stratum thresholds fold into ONE when-chain expression
    (fine for the enum-sized strata of real pipelines — language, source,
    quality bucket); the scan stays a narrow projection with the filter
    pushed down, no shuffle, no join.
    """
    thr = F.lit(_hex_threshold(default_frac))
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(_hex_threshold(frac))
        ).otherwise(thr)
    return df.where(_key_hash(F.col(key_col), salt) < thr)


def cap_per_group(
    df: DataFrame, group_col: str, key_col: str, k: int, salt: str = ""
) -> DataFrame:
    """Keep a deterministic at-most-k subset per group (the per-source /
    per-domain document cap every crawl pipeline applies). Selection
    order is the key's salted hash, so the kept set is stable across
    runs and insensitive to input order; one hash-partitioned window
    (rank <= k), the same shuffle a groupBy on ``group_col`` costs.
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(_key_hash(F.col(key_col), salt), F.col(key_col))
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def mix_to_weights(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Deterministic domain-mixture sampling: downsample each domain so
    the output matches the target ``weights`` (the data-mixing stage of
    pretraining pipelines — cf. DoReMi, Xie et al. 2023, static-weight
    variant). The achievable total is set by the binding domain
    (min n_d / w_d — nothing is ever oversampled); per-domain keep
    fractions follow as (w_d * T) / n_d.

    Fully distributed: domain counts and the binding minimum are
    computed in-plan (one groupBy + a 1-row broadcast — no driver
    collect), and the per-row keep decision is the md5-prefix threshold
    of hash_sample, with the threshold computed from the in-plan
    fraction (32-bit integer compare). Same-keyed reruns return the
    identical sample; domains absent from ``weights`` are dropped."""
    pairs: list = []
    for dname, w in sorted(weights.items()):
        pairs += [F.lit(dname), F.lit(float(w))]
    wmap = F.create_map(*pairs)
    counts = (
        df.groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_w", F.element_at(wmap, F.col(domain_col)))
        .where(F.col("_w").isNotNull())
    )
    tmin = counts.agg(F.min(F.col("_n") / F.col("_w")).alias("_t"))
    fr = counts.crossJoin(F.broadcast(tmin)).select(
        F.col(domain_col),
        ((F.col("_w") * F.col("_t")) / F.col("_n")).alias("_frac"),
    )
    keyed = F.conv(
        _key_hash(F.col(key_col), salt), 16, 10
    ).cast("long")
    return (
        df.join(F.broadcast(fr), domain_col)
        .where(keyed < F.floor(F.col("_frac") * F.lit(4294967296.0)).cast("long"))
        .drop("_frac")
    )
