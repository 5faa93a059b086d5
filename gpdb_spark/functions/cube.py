"""cube — n-dimensional points/boxes (reference: contrib/cube/cube.c:
cube_a_f8_f8 constructors, cube_contains/cube_overlap predicates,
cube_union/cube_inter, cube_distance, cube_dim/ll_coord/ur_coord,
cube_enlarge). The GiST index machinery (g_cube_*) is n/a — Spark has
no secondary indexes; predicates evaluate as scan filters, which is
also how the reference runs them without an index.

Representation: ``struct(lo: array<double>, hi: array<double>)`` —
cube.c's NDBOX (coords[dim] LL then UR, normalized so lo <= hi per
dimension). A point is lo == hi. Every operation is a JVM
zip_with/aggregate HOF — codegen-resident, no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def cube(lo: Column | str, hi: Column | str | None = None) -> Column:
    """cube(array) point, or cube(array, array) box (cube_a_f8 /
    cube_a_f8_f8). Coordinates normalized per dimension (cube.c
    cube_a_f8_f8 swaps so LL <= UR)."""
    lo = _c(lo)
    hi = lo if hi is None else _c(hi)
    lo_d = F.transform(lo, lambda v: v.cast("double"))
    hi_d = F.transform(hi, lambda v: v.cast("double"))
    return F.struct(
        F.zip_with(lo_d, hi_d, lambda a, b: F.least(a, b)).alias("lo"),
        F.zip_with(lo_d, hi_d, lambda a, b: F.greatest(a, b)).alias("hi"),
    )


def cube_dim(c: Column | str) -> Column:
    """cube_dim: number of dimensions."""
    return F.array_size(_c(c)["lo"])


def cube_ll_coord(c: Column | str, n: int) -> Column:
    """cube_ll_coord(c, n): n-th (1-based) lower-left coordinate.
    Out-of-range n returns 0 like cube.c cube_ll_coord (try_element_at:
    ANSI element_at would throw on mixed-dimensionality data)."""
    return F.coalesce(F.try_element_at(_c(c)["lo"], F.lit(n)), F.lit(0.0))


def cube_ur_coord(c: Column | str, n: int) -> Column:
    return F.coalesce(F.try_element_at(_c(c)["hi"], F.lit(n)), F.lit(0.0))


def cube_is_point(c: Column | str) -> Column:
    c = _c(c)
    return F.aggregate(
        F.zip_with(c["lo"], c["hi"], lambda a, b: (a == b).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    ) == F.array_size(c["lo"])


def _all_dims(pairs: Column) -> Column:
    """AND-fold an array<boolean> (true on empty, like cube.c loops)."""
    return F.aggregate(
        pairs, F.lit(True), lambda acc, x: acc & F.coalesce(x, F.lit(False))
    )


def _pad_pair(a: Column, b: Column) -> tuple[Column, Column, Column, Column]:
    """Zero-pad both cubes to their common dimensionality before any
    binary op. cube.c treats the missing dimensions of the
    lower-dimensional cube as zeroes everywhere (cube_contains_v0's
    excess-dim zero check, cube_union_v0's Min(0,..)/Max(0,..) arms,
    distance over absent coords) — zip_with alone pads with NULL, which
    coalesced to FALSE in predicates and mis-evaluated mixed-dim data
    (round-5 review finding). Returns (a_lo, a_hi, b_lo, b_hi)."""
    n = F.greatest(F.array_size(a["lo"]), F.array_size(b["lo"]))

    def pad(arr: Column) -> Column:
        k = F.greatest(n - F.array_size(arr), F.lit(0))
        return F.concat(arr, F.array_repeat(F.lit(0.0), k))

    return pad(a["lo"]), pad(a["hi"]), pad(b["lo"]), pad(b["hi"])


def cube_contains(a: Column | str, b: Column | str) -> Column:
    """a @> b (cube_contains): every b dimension inside a.

    cube_contains_v0 is ASYMMETRIC about excess dimensions: the
    containee's (b's) excess dims must be exactly zero, but the
    CONTAINER's excess dims are ignored ("can't care less about the
    excess dimensions of (a)") — zero-padding both sides wrongly
    required a higher-dimensional container to span 0 in its excess
    dims (round-5 advice finding). Fitting a to exactly dim(b) —
    truncate when longer, zero-pad when shorter — reproduces the
    reference: a-excess dims drop out, and a b-excess dim must satisfy
    0 <= b_lo <= b_hi <= 0, i.e. be exactly zero, which is
    cube_contains_v0's LL==0 && UR==0 check."""
    a, b = _c(a), _c(b)
    db = F.array_size(b["lo"])

    def fit(arr: Column) -> Column:
        sliced = F.slice(arr, F.lit(1), F.least(F.array_size(arr), db))
        k = F.greatest(db - F.array_size(arr), F.lit(0))
        return F.concat(sliced, F.array_repeat(F.lit(0.0), k))

    return _all_dims(
        F.zip_with(fit(a["lo"]), b["lo"], lambda al, bl: al <= bl)
    ) & _all_dims(F.zip_with(fit(a["hi"]), b["hi"], lambda ah, bh: ah >= bh))


def cube_contained(a: Column | str, b: Column | str) -> Column:
    """a <@ b (cube_contained)."""
    return cube_contains(b, a)


def cube_overlap(a: Column | str, b: Column | str) -> Column:
    """a && b (cube_overlap): intervals intersect in every dimension
    (missing dimensions are zero-width [0,0] intervals, per cube.c)."""
    a, b = _c(a), _c(b)
    alo, ahi, blo, bhi = _pad_pair(a, b)
    return _all_dims(
        F.zip_with(alo, bhi, lambda al, bh: al <= bh)
    ) & _all_dims(F.zip_with(blo, ahi, lambda bl, ah: bl <= ah))


def cube_union(a: Column | str, b: Column | str) -> Column:
    """cube_union: bounding box of both (cube_union_v0 runs
    Min(0,..)/Max(0,..) over the dims only one side has — identical to
    zero-padding the shorter cube first)."""
    a, b = _c(a), _c(b)
    alo, ahi, blo, bhi = _pad_pair(a, b)
    return F.struct(
        F.zip_with(alo, blo, lambda x, y: F.least(x, y)).alias("lo"),
        F.zip_with(ahi, bhi, lambda x, y: F.greatest(x, y)).alias("hi"),
    )


def cube_inter(a: Column | str, b: Column | str) -> Column:
    """cube_inter: per-dim lo = Max(lo_a, lo_b), hi = Min(hi_a, hi_b) —
    exactly cube.c's formulation, which for DISJOINT inputs returns a
    non-normalized pseudo-box (lo > hi) rather than swapping."""
    a, b = _c(a), _c(b)
    alo, ahi, blo, bhi = _pad_pair(a, b)
    return F.struct(
        F.zip_with(alo, blo, lambda x, y: F.greatest(x, y)).alias("lo"),
        F.zip_with(ahi, bhi, lambda x, y: F.least(x, y)).alias("hi"),
    )


def cube_distance(a: Column | str, b: Column | str) -> Column:
    """cube_distance: euclidean distance between closest points of the
    two boxes (per-dim gap = distance between intervals, 0 if they
    overlap — cube.c distance_1D; absent dims contribute the distance
    to 0, matching cube.c's zero treatment)."""
    a, b = _c(a), _c(b)
    alo, ahi, blo, bhi = _pad_pair(a, b)
    gap_sq_lo = F.zip_with(
        alo, bhi, lambda al, bh: F.greatest(al - bh, F.lit(0.0))
    )
    gap_sq_hi = F.zip_with(
        blo, ahi, lambda bl, ah: F.greatest(bl - ah, F.lit(0.0))
    )
    gap = F.zip_with(gap_sq_lo, gap_sq_hi, lambda x, y: F.greatest(x, y))
    return F.sqrt(
        F.aggregate(gap, F.lit(0.0), lambda acc, g: acc + g * g)
    )


def cube_enlarge(c: Column | str, r: float) -> Column:
    """cube_enlarge(c, r): grow (or shrink, r < 0) every dimension by r;
    shrinking clamps at the midpoint (cube.c cube_enlarge)."""
    c = _c(c)
    mid = F.zip_with(c["lo"], c["hi"], lambda a, b: (a + b) / 2)
    lo = F.zip_with(
        F.transform(c["lo"], lambda v: v - F.lit(float(r))),
        mid,
        lambda v, m: F.least(v, m),
    )
    hi = F.zip_with(
        F.transform(c["hi"], lambda v: v + F.lit(float(r))),
        mid,
        lambda v, m: F.greatest(v, m),
    )
    return F.struct(lo.alias("lo"), hi.alias("hi"))
