"""Embedding quantization — int8 absmax, the storage/serving compression
step of an embedding pipeline (store 4x fewer bytes, rescale on read).

Pure JVM array lambdas (transform / aggregate / array_max) so the whole
pass stays in codegen — no Python in the hot path. Determinism doctrine
(registry.py): every compared float is floor-scaled to an integer AFTER
IEEE-identical double arithmetic, so DuckDB reproduces the exact values.

Scale shape: per-row map, no shuffle; at 100 TB the operator is
scan-bound and the int8 output writes ~4x fewer parquet bytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def absmax(vec: Column | str) -> Column:
    """max(|x_i|) over the vector, in double."""
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))


def _scale(amax: Column) -> Column:
    """Dequant scale with an all-zero-vector guard: amax=0 would give
    scale=Inf and q=floor(0*Inf+0.5)=floor(NaN), where Spark floor(NaN)=0
    but DuckDB keeps NaN — cross-engine divergence. greatest(amax, 1e-300)
    is exact for every non-degenerate vector (any |x|>=1e-300 dominates)
    and makes the zero vector quantize to all-zero codes everywhere."""
    return F.lit(127.0) / F.greatest(amax, F.lit(1e-300))


def quantize_int8(vec: Column | str) -> Column:
    """Symmetric absmax int8: q_i = floor(x_i * 127/amax + 0.5), clipped
    to [-127,127]. floor(+0.5) (round-half-up) is used instead of
    engine-native round so every engine agrees on .5 ties."""
    v = F.col(vec) if isinstance(vec, str) else vec
    scale = _scale(absmax(v))
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


def quantize_stats(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-vector quantization quality report: the int8 codes, the
    dequant scale (micro-scaled integer), and the reconstruction MSE
    (nano-scaled integer; per-element floor then exact integer sum, so
    the value is summation-order-independent across engines)."""
    v = F.col(vec_col)
    scale = _scale(absmax(v))
    q = quantize_int8(v)
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
    return df.select(
        F.col(id_col),
        q.alias("q8"),
        F.floor(scale * F.lit(1e6)).cast("long").alias("scale_micro"),
        err.alias("sse_nano"),
    )
