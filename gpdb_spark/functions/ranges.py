"""PG range types (src/backend/utils/adt/rangetypes.c) as typed structs.

A range value is ``struct<lo, hi, lo_inc boolean, hi_inc boolean>``:
NULL lo/hi = unbounded (PG's infinite bound), and emptiness is the
derived predicate lo > hi, or lo = hi without both bounds inclusive —
matching range_cmp_bounds semantics without carrying a separate flag
(PG canonicalizes discrete ranges instead; continuous semantics here).

Operators covered: ``@>`` element / range containment, ``&&`` overlap,
``*`` intersection, lower/upper/isempty accessors. Everything is a pure
JVM column expression (codegen-friendly, no UDF). For JOINs keyed on a
range predicate, pair these with operators/range_join.py — the binned
equi-join is the 100 TB shape; these functions then serve as the exact
residual filter.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def range_make(
    lo: Column, hi: Column, bounds: str = "[)"
) -> Column:
    """Construct a range value; ``bounds`` is one of [) (] [] ()."""
    if bounds not in ("[)", "(]", "[]", "()"):
        raise ValueError(f"bad bounds spec {bounds!r}")
    return F.struct(
        lo.alias("lo"),
        hi.alias("hi"),
        F.lit(bounds[0] == "[").alias("lo_inc"),
        F.lit(bounds[1] == "]").alias("hi_inc"),
    )


def range_is_empty(r: Column) -> Column:
    """PG isempty(r): lo > hi, or lo = hi unless both bounds inclusive.
    Unbounded sides are never empty."""
    finite = r.lo.isNotNull() & r.hi.isNotNull()
    return finite & (
        (r.lo > r.hi) | ((r.lo == r.hi) & ~(r.lo_inc & r.hi_inc))
    )


def range_lower(r: Column) -> Column:
    """lower(r) — NULL when empty or unbounded."""
    return F.when(~range_is_empty(r), r.lo)


def range_upper(r: Column) -> Column:
    """upper(r) — NULL when empty or unbounded."""
    return F.when(~range_is_empty(r), r.hi)


def _lower_before_upper(a: Column, b: Column) -> Column:
    """a's lower bound is before b's upper bound (strictly, or touching
    with both bounds inclusive) — the half-test of overlap."""
    return (
        a.lo.isNull()
        | b.hi.isNull()
        | (a.lo < b.hi)
        | ((a.lo == b.hi) & a.lo_inc & b.hi_inc)
    )


def range_overlaps(a: Column, b: Column) -> Column:
    """a && b (range_overlaps): share at least one point."""
    return (
        ~range_is_empty(a)
        & ~range_is_empty(b)
        & _lower_before_upper(a, b)
        & _lower_before_upper(b, a)
    )


def range_contains_elem(r: Column, x: Column) -> Column:
    """r @> x (range_contains_elem)."""
    above_lo = r.lo.isNull() | (x > r.lo) | ((x == r.lo) & r.lo_inc)
    below_hi = r.hi.isNull() | (x < r.hi) | ((x == r.hi) & r.hi_inc)
    return ~range_is_empty(r) & x.isNotNull() & above_lo & below_hi


def _lower_covers(a: Column, b: Column) -> Column:
    """a's lower bound is at-or-before b's (inclusive-aware): every point
    above b's lower is above a's."""
    return a.lo.isNull() | (
        b.lo.isNotNull()
        & ((a.lo < b.lo) | ((a.lo == b.lo) & (a.lo_inc | ~b.lo_inc)))
    )


def _upper_covers(a: Column, b: Column) -> Column:
    return a.hi.isNull() | (
        b.hi.isNotNull()
        & ((a.hi > b.hi) | ((a.hi == b.hi) & (a.hi_inc | ~b.hi_inc)))
    )


def range_contains(a: Column, b: Column) -> Column:
    """a @> b (range containment). Empty b is contained in anything
    (including empty a) — rangetypes.c range_contains_internal."""
    return range_is_empty(b) | (
        ~range_is_empty(a) & _lower_covers(a, b) & _upper_covers(a, b)
    )


def range_intersect(a: Column, b: Column) -> Column:
    """a * b (range_intersect): the overlap as a range; an empty-range
    struct (lo=hi, exclusive) when they don't overlap."""
    lo_from_a = b.lo.isNull() | (
        a.lo.isNotNull() & ((a.lo > b.lo) | ((a.lo == b.lo) & ~a.lo_inc))
    )
    hi_from_a = b.hi.isNull() | (
        a.hi.isNotNull() & ((a.hi < b.hi) | ((a.hi == b.hi) & ~a.hi_inc))
    )
    lo = F.when(lo_from_a, a.lo).otherwise(b.lo)
    lo_inc = F.when(lo_from_a, a.lo_inc).otherwise(b.lo_inc)
    hi = F.when(hi_from_a, a.hi).otherwise(b.hi)
    hi_inc = F.when(hi_from_a, a.hi_inc).otherwise(b.hi_inc)
    empty = ~range_overlaps(a, b)
    zero = F.coalesce(a.lo, a.hi, b.lo, b.hi)
    return F.struct(
        F.when(empty, zero).otherwise(lo).alias("lo"),
        F.when(empty, zero).otherwise(hi).alias("hi"),
        F.when(empty, F.lit(False)).otherwise(lo_inc).alias("lo_inc"),
        F.when(empty, F.lit(False)).otherwise(hi_inc).alias("hi_inc"),
    )
