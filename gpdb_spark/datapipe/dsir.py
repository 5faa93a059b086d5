"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): score every raw document by how much more likely its
hashed n-gram features are under a target-domain distribution than under
the raw-corpus distribution, then keep the high-scoring tail.

The classifier is two multinomials over a hashed feature space
(unigrams + bigrams -> B buckets): log w(doc) = sum over the doc's
feature occurrences of ln p_target(b) - ln p_raw(b), with Laplace
smoothing. The paper resamples with Gumbel noise; this implementation
is the deterministic variant (threshold / top-k on the exact weight) so
every keep decision is reproducible and oracle-checkable.

Scale design (100 TB):
- fitting = two B-row aggregations (map-side combine; B ~ 10^4 real,
  256 here) — the only shuffles, and they carry B rows per partition.
- the fitted log-ratio table is O(B), collected to the driver
  (bounded, documented) and re-broadcast as a literal MAP expression,
  so the scoring pass is a zero-shuffle per-row map: tokenize ->
  bucket (md5, engine-portable) -> map lookup -> exact-decimal fold.
  No Python in either pass; everything stays in codegen.
- ln() is applied once per bucket at fit time and floored to 1e-9
  BEFORE broadcasting, so per-doc sums add identical doubles in every
  engine (the repo's float-determinism doctrine applied to logs).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gpdb_spark.datapipe.text import tokens
from gpdb_spark.registry import fr

DEC30 = "decimal(30,15)"


def hashed_features(text: Column | str, buckets: int = 256) -> Column:
    """Unigram + bigram occurrences hashed into [0, buckets) via the
    first two hex digits of md5 (engine-portable; 256 native buckets,
    reduced mod ``buckets``). Multiplicity is kept — these are counts,
    not a set."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(F.coalesce(c, F.lit("")))  # NULL text = zero features,
    # matching the oracle's LEFT JOIN + coalesce(weight, 0) contract
    n = F.array_size(toks)
    bigrams = F.when(
        n > 1,
        F.zip_with(
            F.slice(toks, 1, (n - 1).cast("int")),
            F.slice(toks, 2, (n - 1).cast("int")),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(toks, bigrams)
    return F.transform(
        feats,
        lambda s: (F.conv(F.substring(F.md5(s), 1, 2), 16, 10).cast("int")
                   % buckets),
    )


def _bucket_counts(
    df: DataFrame, text_col: str, buckets: int, feats_col: str | None = None
) -> dict[int, int]:
    """Per-bucket occurrence counts, collected (bounded: <= buckets
    rows). ``feats_col`` names an already-materialized feature-array
    column to reuse instead of re-deriving features from the text."""
    f = (
        F.col(feats_col)
        if feats_col
        else hashed_features(F.col(text_col), buckets)
    )
    rows = (
        df.select(F.explode(f).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    return {r.b: r.c for r in rows}


def fit_log_ratios(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    buckets: int = 256,
) -> dict[int, float]:
    """Fit the per-bucket importance log-ratio
    ln((t_b + 1)/(T + B)) - ln((r_b + 1)/(R + B)) from the target and
    raw corpora. Two B-row aggregations; the result is O(B) and is
    collected to the driver (bounded by construction — B is a model
    hyperparameter, not data-dependent). Logs are computed driver-side
    (C libm, matching DuckDB's ln for the oracle) and floored to 1e-9
    so the broadcast constants are engine-identical."""

    tc, rc = _bucket_counts(target, text_col, buckets), _bucket_counts(
        raw, text_col, buckets
    )
    return _ratios_from_counts(tc, rc, buckets)


def _ratios_from_counts(
    tc: dict[int, int], rc: dict[int, int], buckets: int
) -> dict[int, float]:
    """Laplace-smoothed log-ratio per bucket, floored to 1e-9 — the ONE
    place this discipline lives (fit_log_ratios and dsir_select both
    call it, so the smoothing/floor math cannot drift between them)."""
    tot_t, tot_r = sum(tc.values()), sum(rc.values())
    out = {}
    for b in range(buckets):
        lr = math.log((tc.get(b, 0) + 1) / (tot_t + buckets)) - math.log(
            (rc.get(b, 0) + 1) / (tot_r + buckets)
        )
        out[b] = math.floor(lr * 1e9) / 1e9
    return out


def dsir_weights(
    raw: DataFrame,
    log_ratios: dict[int, float],
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 256,
    feats_col: str | None = None,
) -> DataFrame:
    """Score every raw document: exact-decimal fold of the fitted
    log-ratio over the doc's feature occurrences (zero-shuffle pass;
    the ratio table rides along as a literal MAP inside codegen).
    Returns (id, n_features, weight) with weight floored to 1e-6."""
    # r11 (guide §1.2): the decimal fold ran interpreted DECIMAL add/cast
    # per FEATURE. fit_log_ratios floors every ratio to 1e-9, so each map
    # value is EXACTLY K·1e-9 (K = an int64 with ~11 digits, recovered
    # here without any float rounding: repr is the shortest decimal image
    # and the value is a scale-9 decimal by construction, so
    # dec15(v) == K·1e-9 too). The per-feature fold then becomes
    # primitive long adds of K, and the exact Σ·10^-9 is reassembled
    # once per ROW (dec(20,0)/dec(10,0) -> scale-11 decimal: exact) —
    # value-identical to the old DEC30 fold. Overflow headroom: |K| <=
    # ~6e10, int64 holds ~1.5e8 features per document.
    from decimal import ROUND_HALF_UP, Decimal

    u_ratios = {
        b: int(
            Decimal(repr(float(v)))
            .scaleb(9)
            .quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )
        for b, v in log_ratios.items()
    }
    ratio_map = F.create_map(
        *[F.lit(x) for b, v in sorted(u_ratios.items()) for x in (b, v)]
    )
    if feats_col:
        d = raw.withColumn("_f", F.col(feats_col))
    else:
        d = raw.withColumn("_f", hashed_features(F.col(text_col), buckets))
    u = F.aggregate(
        F.col("_f"),
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.element_at(ratio_map, b),
    )
    w = (u.cast("decimal(20,0)") / F.lit(10**9)).cast("double")
    return d.select(
        F.col(id_col),
        F.array_size(F.col("_f")).cast("int").alias("n_features"),
        fr(w, 6).alias("weight"),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 256,
    threshold: float = 0.0,
) -> DataFrame:
    """End-to-end DSIR selection: fit on (raw, target), score raw, keep
    docs whose importance weight clears ``threshold`` (0 = more
    target-like than raw-average). Deterministic twin of the paper's
    Gumbel-top-k resample."""
    # r11: feature extraction (tokenize + bigrams + md5 bucketing) is
    # the pipeline's per-row cost and the raw corpus needs it TWICE —
    # once for the fit counts, once for scoring. Materialize the raw
    # feature arrays once and feed both consumers (MEMORY_AND_DISK,
    # LRU-evictable: degrades to recompute, never OOMs; the target
    # corpus is fit-only and keeps its single pass).
    featured = raw.withColumn(
        "__dsir_f", hashed_features(F.col(text_col), buckets)
    ).persist()
    tc = _bucket_counts(target, text_col, buckets)
    rc = _bucket_counts(featured, text_col, buckets, feats_col="__dsir_f")
    lr = _ratios_from_counts(tc, rc, buckets)
    scored = dsir_weights(
        featured, lr, id_col, text_col, buckets, feats_col="__dsir_f"
    )
    return scored.withColumn("selected", F.col("weight") >= threshold)
