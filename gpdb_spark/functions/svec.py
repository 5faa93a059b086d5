"""GPDB sparse vectors (gpcontrib/gp_sparse_vector: sparse_vector.c,
operators.c — svec_dot :144, l2norm :455, svec_plus :351) re-expressed as
struct<indices:array<int>, values:array<double>> with pure Catalyst
column expressions.

The reference stores run-length-encoded sparse vectors and evaluates
ops serially per row; here each op is a JVM higher-order-function
expression (map_zip_with / aggregate), so it codegens and scales with
partitions. Indices are kept sorted 1-based (matching SQL array
position).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(30,15)"


def svec_from_dense(dense: Column, threshold: float = 0.0) -> Column:
    """Sparsify a dense array: keep |x| > threshold entries as
    (1-based index, value)."""
    idx = F.sequence(F.lit(1), F.array_size(dense))
    pairs = F.filter(
        F.zip_with(
            idx, dense, lambda i, v: F.struct(i.alias("i"), v.cast("double").alias("v"))
        ),
        lambda p: F.abs(p["v"]) > threshold,
    )
    return F.struct(
        F.transform(pairs, lambda p: p["i"]).alias("indices"),
        F.transform(pairs, lambda p: p["v"]).alias("values"),
    )


def _as_map(sv: Column) -> Column:
    return F.map_from_arrays(sv["indices"], sv["values"])


def svec_nnz(sv: Column) -> Column:
    return F.array_size(sv["indices"])


def svec_dot(a: Column, b: Column) -> Column:
    """Sparse dot product: iterate the smaller support via map lookup —
    exact decimal accumulation (order-independent)."""
    bm = _as_map(b)
    prods = F.zip_with(
        a["indices"],
        a["values"],
        lambda i, v: (F.coalesce(F.element_at(bm, i), F.lit(0.0)) * v).cast(DEC),
    )
    return F.aggregate(
        prods, F.lit(0).cast(DEC), lambda acc, p: (acc + p).cast(DEC)
    ).cast("double")


def svec_l2norm(sv: Column) -> Column:
    sq = F.transform(sv["values"], lambda v: (v * v).cast(DEC))
    return F.sqrt(
        F.aggregate(sq, F.lit(0).cast(DEC), lambda a, x: (a + x).cast(DEC)).cast(
            "double"
        )
    )


def svec_plus(a: Column, b: Column) -> Column:
    """Element-wise sum over the union of supports (svec_plus)."""
    merged = F.map_zip_with(
        _as_map(a),
        _as_map(b),
        lambda k, x, y: F.coalesce(x, F.lit(0.0)) + F.coalesce(y, F.lit(0.0)),
    )
    keys = F.array_sort(F.map_keys(merged))
    return F.struct(
        keys.alias("indices"),
        F.transform(keys, lambda k: F.element_at(merged, k)).alias("values"),
    )


def svec_to_dense(sv: Column, dim: Column | int) -> Column:
    m = _as_map(sv)
    dim = F.lit(dim) if not isinstance(dim, Column) else dim
    return F.transform(
        F.sequence(F.lit(1), dim),
        lambda i: F.coalesce(F.element_at(m, i), F.lit(0.0)),
    )
