"""Geometric types: point, box, circle, polygon (geo_ops.c).

Reference: PG's 2-D geometric types and operators
(src/backend/utils/adt/geo_ops.c) — point `<->` distance, box `@>`
contains / `&&` overlap / area / center, circle containment and
distance, polygon `@>` point via winding test.

Spark-first mapping: each geometric value is a plain struct column —
``point`` = struct(x double, y double), ``box`` = struct(high point,
low point) (normalized on construction exactly like box_construct),
``circle`` = struct(center point, r double), ``polygon`` =
array<point>.  Every operator is a pure JVM column expression
(whole-stage codegen, no Python); point-in-polygon runs the standard
ray-crossing test as an ``aggregate`` fold over the vertex array —
O(vertices) per row, fully distributed, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# -- constructors -----------------------------------------------------------

def point(x: Column, y: Column) -> Column:
    """point '(x,y)' (geo_ops.c point_in)."""
    return F.struct(x.cast("double").alias("x"), y.cast("double").alias("y"))


def box(p1: Column, p2: Column) -> Column:
    """box '((x1,y1),(x2,y2))' — normalized so high >= low per axis,
    matching box_construct/box_fill."""
    return F.struct(
        F.struct(
            F.greatest(p1.x, p2.x).alias("x"), F.greatest(p1.y, p2.y).alias("y")
        ).alias("high"),
        F.struct(
            F.least(p1.x, p2.x).alias("x"), F.least(p1.y, p2.y).alias("y")
        ).alias("low"),
    )


def circle(center: Column, r: Column) -> Column:
    """circle '<(x,y),r>' (circle_in)."""
    return F.struct(center.alias("center"), r.cast("double").alias("r"))


def polygon(points: Column) -> Column:
    """polygon from an array<struct<x,y>> of vertices."""
    return points


# -- point operators --------------------------------------------------------

def pt_distance(a: Column, b: Column) -> Column:
    """point <-> point (point_distance): euclidean distance."""
    return F.sqrt(F.pow(a.x - b.x, 2) + F.pow(a.y - b.y, 2))


def pt_add(a: Column, b: Column) -> Column:
    """point + point (point_add): translate."""
    return point(a.x + b.x, a.y + b.y)


def pt_sub(a: Column, b: Column) -> Column:
    return point(a.x - b.x, a.y - b.y)


# -- box operators ----------------------------------------------------------

def box_contains_pt(b: Column, p: Column) -> Column:
    """box @> point (box_contain_pt): closed bounds, like on_pb."""
    return (
        (p.x <= b.high.x) & (p.x >= b.low.x) & (p.y <= b.high.y) & (p.y >= b.low.y)
    )


def box_contains_box(a: Column, b: Column) -> Column:
    """box @> box (box_contain)."""
    return (
        (a.high.x >= b.high.x)
        & (a.low.x <= b.low.x)
        & (a.high.y >= b.high.y)
        & (a.low.y <= b.low.y)
    )


def box_overlap(a: Column, b: Column) -> Column:
    """box && box (box_overlap): closed-interval overlap on both axes."""
    return (
        (a.high.x >= b.low.x)
        & (b.high.x >= a.low.x)
        & (a.high.y >= b.low.y)
        & (b.high.y >= a.low.y)
    )


def box_area(b: Column) -> Column:
    """area(box) (box_area) = width * height."""
    return (b.high.x - b.low.x) * (b.high.y - b.low.y)


def box_center(b: Column) -> Column:
    """center(box) (box_center)."""
    return point((b.high.x + b.low.x) / 2, (b.high.y + b.low.y) / 2)


# -- circle operators -------------------------------------------------------

def circle_contains_pt(c: Column, p: Column) -> Column:
    """circle @> point (circle_contain_pt): distance(center,p) <= r."""
    return pt_distance(c.center, p) <= c.r


def circle_area(c: Column) -> Column:
    """area(circle) (circle_area) = pi*r^2."""
    return F.lit(float(__import__("math").pi)) * c.r * c.r


def circle_distance(a: Column, b: Column) -> Column:
    """circle <-> circle (circle_distance): center gap minus radii,
    floored at 0 for overlapping circles."""
    return F.greatest(pt_distance(a.center, b.center) - a.r - b.r, F.lit(0.0))


# -- polygon ----------------------------------------------------------------

def poly_contains_pt(poly: Column, p: Column) -> Column:
    """polygon @> point — ray-crossing parity test (geo_ops.c
    point_inside): cast a ray in +x, count edge crossings; odd = inside.
    Pure ``aggregate`` fold over zip(vertices, rotate(vertices)):
    executes JVM-side per row, O(n_vertices), scale-independent."""
    edges = F.zip_with(
        poly,
        F.concat(F.slice(poly, 2, 1_000_000), F.slice(poly, 1, 1)),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )

    def crosses(e: Column) -> Column:
        # edge straddles the horizontal line through p, and the
        # intersection point lies right of p
        straddle = (e.a.y > p.y) != (e.b.y > p.y)
        x_int = e.a.x + (p.y - e.a.y) / (e.b.y - e.a.y) * (e.b.x - e.a.x)
        return straddle & (x_int > p.x)

    n_cross = F.aggregate(
        edges,
        F.lit(0),
        lambda acc, e: acc + F.when(crosses(e), 1).otherwise(0),
    )
    return n_cross % 2 == 1
