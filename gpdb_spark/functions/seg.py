"""seg — line segments / float intervals with fuzzy-boundary input
(reference: contrib/seg/seg.c seg_contains:524, seg_overlap:548,
seg_left:568/seg_right:576, seg_over_left/seg_over_right,
seg_union/seg_inter, seg_size:679 (Abs(upper-lower)), seg_center:171,
seg_cmp:696 (lower boundary first, then upper); grammar
contrib/seg/segparse.y:66-123 — ``a (+-) d`` plus/minus, ``a .. b``
closed range, ``a ..`` / ``.. b`` half-open (HUGE_VAL bound), bare
``a`` point, and ``<`` / ``>`` / ``~`` boundary extension markers).

Representation: ``struct(lower: double, upper: double)``. seg.c stores
float4 plus per-boundary significant-digit counts and extension flags
that affect only display (seg_out) and the deep cmp tie-break between
*equal* numeric boundaries; here segments compare on their numeric
boundaries (the cmp primary keys) and the display-precision machinery
is out of scope, documented. Half-open bounds use IEEE ±Infinity
exactly like seg.c's HUGE_VAL. Everything is a JVM expression —
regexp parse + arithmetic inside whole-stage codegen, no UDF, no
shuffle; at 100 TB these run as per-row map work pushed to the scan.

Deliberate divergence: segparse.y raises on swapped boundaries
(``5 .. 2``); a per-row JVM expression can't ereport, so seg_in
returns NULL for malformed or swapped input (the ``try_`` convention
used across this repo's parsers), and callers that need the strict
behavior assert ``seg_in(x).isNotNull()``.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_NUM = r"[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?"
# a boundary may carry a <, > or ~ extension marker (segparse.y:125-142);
# the marker changes display/tie-break only, never the stored value
_BND = rf"[<>~]?\s*({_NUM})"


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def make_seg(lower: Column | str, upper: Column | str | None = None) -> Column:
    """Constructor from numeric bounds (a point when ``upper`` is
    omitted). Bounds are NOT swapped — seg.c never normalizes either;
    swapped input is rejected at parse time."""
    lo = _c(lower).cast("double")
    hi = lo if upper is None else _c(upper).cast("double")
    return F.struct(lo.alias("lower"), hi.alias("upper"))


def seg_in(text: Column | str) -> Column:
    """Parse the seg literal grammar (segparse.y range productions):
    ``a(+-)d``, ``a .. b``, ``a ..``, ``.. b``, ``a``. NULL on
    malformed or swapped input (see module docstring)."""
    s = F.trim(_c(text))
    num = lambda g: g.cast("double")  # noqa: E731

    plumin = rf"^{_BND}\s*\(\+-\)\s*({_NUM})$"
    closed = rf"^{_BND}\s*\.\.\s*{_BND}$"
    lopen = rf"^{_BND}\s*\.\.$"
    ropen = rf"^\.\.\s*{_BND}$"
    point = rf"^{_BND}$"

    pm_c = num(F.regexp_extract(s, plumin, 1))
    pm_d = num(F.regexp_extract(s, plumin, 2))
    cl_a = num(F.regexp_extract(s, closed, 1))
    cl_b = num(F.regexp_extract(s, closed, 2))
    lo_a = num(F.regexp_extract(s, lopen, 1))
    ro_b = num(F.regexp_extract(s, ropen, 1))
    pt_a = num(F.regexp_extract(s, point, 1))

    inf = F.lit(float("inf"))
    return (
        F.when(s.rlike(plumin), make_seg(pm_c - pm_d, pm_c + pm_d))
        .when(
            s.rlike(closed),
            # segparse.y:83 swapped-boundaries ereport -> NULL here
            F.when(cl_a <= cl_b, make_seg(cl_a, cl_b)),
        )
        .when(s.rlike(lopen), make_seg(lo_a, inf))
        .when(s.rlike(ropen), make_seg(-inf, ro_b))
        .when(s.rlike(point), make_seg(pt_a, pt_a))
    )


def seg_lower(s: Column | str) -> Column:
    return _c(s)["lower"]


def seg_upper(s: Column | str) -> Column:
    return _c(s)["upper"]


def seg_center(s: Column | str) -> Column:
    """seg_center (seg.c:171): midpoint of the boundaries."""
    s = _c(s)
    return (s["lower"] + s["upper"]) / F.lit(2.0)


def seg_size(s: Column | str) -> Column:
    """seg_size (seg.c:679): Abs(upper - lower)."""
    s = _c(s)
    return F.abs(s["upper"] - s["lower"])


def seg_contains(a: Column | str, b: Column | str) -> Column:
    """a @> b (seg.c:524): a.lower <= b.lower AND a.upper >= b.upper."""
    a, b = _c(a), _c(b)
    return (a["lower"] <= b["lower"]) & (a["upper"] >= b["upper"])


def seg_contained(a: Column | str, b: Column | str) -> Column:
    """a <@ b (seg.c:530)."""
    return seg_contains(b, a)


def seg_overlap(a: Column | str, b: Column | str) -> Column:
    """a && b (seg.c:548) — verbatim boundary logic: one segment's
    upper reaches past the other's while its lower stays inside."""
    a, b = _c(a), _c(b)
    return ((a["upper"] >= b["upper"]) & (a["lower"] <= b["upper"])) | (
        (b["upper"] >= a["upper"]) & (b["lower"] <= a["upper"])
    )


def seg_left(a: Column | str, b: Column | str) -> Column:
    """a << b (seg.c:568): strictly left — a.upper < b.lower."""
    return _c(a)["upper"] < _c(b)["lower"]


def seg_right(a: Column | str, b: Column | str) -> Column:
    """a >> b (seg.c:576): strictly right — a.lower > b.upper."""
    return _c(a)["lower"] > _c(b)["upper"]


def seg_over_left(a: Column | str, b: Column | str) -> Column:
    """a &< b: does not extend to the right of b (a.upper <= b.upper)."""
    return _c(a)["upper"] <= _c(b)["upper"]


def seg_over_right(a: Column | str, b: Column | str) -> Column:
    """a &> b: does not extend to the left of b (a.lower >= b.lower)."""
    return _c(a)["lower"] >= _c(b)["lower"]


def seg_union(a: Column | str, b: Column | str) -> Column:
    """seg_union: [min lower, max upper] — the bounding segment (for
    disjoint inputs this spans the gap, exactly as seg.c does)."""
    a, b = _c(a), _c(b)
    return F.struct(
        F.least(a["lower"], b["lower"]).alias("lower"),
        F.greatest(a["upper"], b["upper"]).alias("upper"),
    )


def seg_inter(a: Column | str, b: Column | str) -> Column:
    """seg_inter: [max lower, min upper]. Disjoint inputs yield the
    same inverted (lower > upper) pseudo-segment seg.c returns — not
    NULL — so downstream seg_size goes through Abs like the original."""
    a, b = _c(a), _c(b)
    return F.struct(
        F.greatest(a["lower"], b["lower"]).alias("lower"),
        F.least(a["upper"], b["upper"]).alias("upper"),
    )


def seg_cmp(a: Column | str, b: Column | str) -> Column:
    """seg_cmp numeric core (seg.c:696): lower boundary first, then
    upper. The sigd/extension tie-breaks between numerically equal
    boundaries are display-precision machinery, out of scope (module
    docstring)."""
    a, b = _c(a), _c(b)
    return (
        F.when(a["lower"] < b["lower"], F.lit(-1))
        .when(a["lower"] > b["lower"], F.lit(1))
        .when(a["upper"] < b["upper"], F.lit(-1))
        .when(a["upper"] > b["upper"], F.lit(1))
        .otherwise(F.lit(0))
    )


def seg_same(a: Column | str, b: Column | str) -> Column:
    """a = b (seg.c:540): seg_cmp == 0."""
    return seg_cmp(a, b) == F.lit(0)


def seg_lt(a: Column | str, b: Column | str) -> Column:
    return seg_cmp(a, b) < F.lit(0)


def seg_le(a: Column | str, b: Column | str) -> Column:
    return seg_cmp(a, b) <= F.lit(0)


def seg_gt(a: Column | str, b: Column | str) -> Column:
    return seg_cmp(a, b) > F.lit(0)


def seg_ge(a: Column | str, b: Column | str) -> Column:
    return seg_cmp(a, b) >= F.lit(0)


def seg_contains_scalar(a: Column | str, x: Column | str) -> Column:
    """seg @> float (seg.c:998 seg_contains_int/float4/float8):
    point containment."""
    a, x = _c(a), _c(x).cast("double")
    return (a["lower"] <= x) & (a["upper"] >= x)
