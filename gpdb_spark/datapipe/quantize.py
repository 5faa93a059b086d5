"""Embedding quantization — int8 absmax, the storage/serving compression
step of an embedding pipeline (store 4x fewer bytes, rescale on read).

Pure JVM array lambdas (transform / aggregate / array_max) so the whole
pass stays in codegen — no Python in the hot path. Determinism doctrine
(registry.py): every compared float is floor-scaled to an integer AFTER
IEEE-identical double arithmetic, so DuckDB reproduces the exact values.

Degenerate vectors: an all-zero vector has no meaningful scale —
``quantize_stats`` emits all-zero codes with ``scale_micro = 0`` and
``sse_nano = 0`` (an explicit branch, NOT a tiny-epsilon guard: a
127/epsilon scale floor-scaled to micro overflows BIGINT, where Spark's
non-ANSI double→long cast clamps but DuckDB raises — exactly the
cross-engine divergence this module exists to prevent).

Scale shape: per-row map, no shuffle; at 100 TB the operator is
scan-bound and the int8 output writes ~4x fewer parquet bytes. The
per-row cost is O(dim): ``quantize_stats`` projects ``amax``/``scale``
as real columns BEFORE the element lambdas, because Spark does not
hoist loop-invariant aggregate subtrees out of higher-order-function
bodies — an inlined ``array_max`` inside ``transform`` re-evaluates
per element, turning the pass O(dim²) per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def absmax(vec: Column | str) -> Column:
    """max(|x_i|) over the vector, in double."""
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))


def _q_codes(v: Column, scale: Column) -> Column:
    """int8 codes under a given scale column: floor(x*scale + 0.5)
    (round-half-up — engine-agreed .5 ties), clipped to [-127, 127]."""
    return F.transform(
        v,
        lambda x: F.greatest(
            F.lit(-127),
            F.least(
                F.lit(127),
                F.floor(x.cast("double") * scale + F.lit(0.5)).cast("int"),
            ),
        ),
    )


def quantize_int8(vec: Column | str) -> Column:
    """Symmetric absmax int8 codes; an all-zero vector yields all-zero
    codes. Convenience single-expression form — it inlines the absmax
    aggregate into the element lambda (O(dim²) per row); use
    ``quantize_stats`` (which projects the scale first) in hot paths."""
    v = F.col(vec) if isinstance(vec, str) else vec
    amax = absmax(v)
    zero = F.transform(v, lambda x: F.lit(0))
    scale = F.when(amax > 0, F.lit(127.0) / amax).otherwise(F.lit(1.0))
    return F.when(amax > 0, _q_codes(v, scale)).otherwise(zero)


def quantize_stats(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-vector quantization quality report: the int8 codes, the
    dequant scale (micro-scaled integer), and the reconstruction MSE
    (nano-scaled integer; per-element floor then exact integer sum, so
    the value is summation-order-independent across engines)."""
    # amax/scale as REAL columns (one evaluation per row), then
    # referenced inside the element lambdas as plain attributes
    # the division sits inside the valid branch: ANSI mode (Spark 4
    # default) throws on divide-by-zero, and CaseWhen only evaluates
    # the taken branch per row
    d = df.select(
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        absmax(F.col(vec_col)).alias("_amax"),
    ).withColumn(
        "_scale",
        F.when(F.col("_amax") > 0, F.lit(127.0) / F.col("_amax")).otherwise(
            F.lit(1.0)
        ),
    )
    v, scale, valid = F.col("_v"), F.col("_scale"), F.col("_amax") > 0
    q = _q_codes(v, scale)
    # per-element squared error, nano-floored BEFORE the sum: integer
    # addition is associative, double addition is not.
    err = F.aggregate(
        F.zip_with(
            v,
            q,
            lambda x, qi: F.floor(
                F.pow(x.cast("double") - qi.cast("double") / scale, F.lit(2.0))
                * F.lit(1e9)
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, e: acc + e,
    )
    zero_codes = F.transform(v, lambda x: F.lit(0))
    return d.select(
        F.col(id_col),
        F.when(valid, q).otherwise(zero_codes).alias("q8"),
        F.when(valid, F.floor(scale * F.lit(1e6)).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        .alias("scale_micro"),
        F.when(valid, err).otherwise(F.lit(0).cast("long")).alias("sse_nano"),
    )
