"""earthdistance — great-circle distance (reference:
contrib/earthdistance/earthdistance.c:106 geo_distance on
EARTH_RADIUS = 3958.747716 statute miles; earthdistance--1.1.sql
earth_distance(ll_to_earth(..)) on earth() = 6378168 m).

THE single haversine implementation: the `earth_distance_funcs` query,
the SQL-callable `earth_distance`/`geo_distance` registrations
(sql_registry), and any future caller all build from here, so the
engine-side formula cannot fork (the DuckDB oracle keeps its own
independent derivation on purpose — that's what makes it an oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

EARTH_RADIUS_M = 6378168.0  # earthdistance--1.1.sql earth()
EARTH_RADIUS_MILES = 3958.747716  # earthdistance.c EARTH_RADIUS


def haversine(
    lat1: Column,
    lon1: Column,
    lat2: Column,
    lon2: Column,
    radius: float = EARTH_RADIUS_M,
) -> Column:
    """Great-circle arc between two (lat, lon) points on a sphere of
    ``radius`` — pure JVM sin/cos/asin, codegen-resident. The least(1,
    sqrt(h)) clamp guards antipodal rounding (sqrt(h) marginally > 1)."""
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    h = F.pow(F.sin(dlat), 2) + (
        F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(F.sin(dlon), 2)
    )
    return 2.0 * radius * F.asin(F.least(F.lit(1.0), F.sqrt(h)))


def earth_distance(lat1, lon1, lat2, lon2) -> Column:
    """earth_distance(ll_to_earth(lat1,lon1), ll_to_earth(lat2,lon2))
    in meters."""
    return haversine(lat1, lon1, lat2, lon2, EARTH_RADIUS_M)


def geo_distance(lat1, lon1, lat2, lon2) -> Column:
    """point <@> point (geo_distance) in statute miles."""
    return haversine(lat1, lon1, lat2, lon2, EARTH_RADIUS_MILES)
