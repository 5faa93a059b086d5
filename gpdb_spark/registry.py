"""Query registry + deterministic-aggregation helpers.

Every implemented operator from SURVEY.md §2 registers a named query
(Callable[(SparkSession, sf_dir)] -> DataFrame) and, when SQL-expressible,
an equivalent ANSI-SQL oracle string for DuckDB. ``__spark_entry__``
re-exports the two dicts.

Determinism policy
------------------
The driver hash-compares Spark results against DuckDB values. Floating-point
aggregation order differs between engines (Spark partial aggregation /
DuckDB segment trees), so raw ``sum(double)`` is not reproducible at the
ulp level. Every summed measure is therefore cast to ``DECIMAL(25,6)``
*inside* the aggregate: the per-row double arithmetic is IEEE-identical in
both engines, the decimal sum is exact (order-independent), and the final
round+cast back to double is deterministic. This mirrors how the reference
treats money as exact ``numeric`` (src/backend/utils/adt/numeric.c) rather
than float.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Union

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

ColumnOrName = Union[Column, str]

DEC = "decimal(25,6)"


def query(name: str, oracle: str | None = None):
    """Register a query (and optional DuckDB oracle SQL) under ``name``."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = " ".join(oracle.split())
        return fn

    return deco


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


# ---------------------------------------------------------------------------
# deterministic aggregate builders (Spark side)
# ---------------------------------------------------------------------------

def dsum(c: ColumnOrName, n: int = 2) -> Column:
    """Order-independent sum of a double measure, rounded to n digits."""
    return F.round(F.sum(_col(c).cast(DEC)), n).cast("double")


def davg(c: ColumnOrName, n: int = 6) -> Column:
    """Order-independent average: exact decimal sum / count, in doubles."""
    return fr(F.sum(_col(c).cast(DEC)).cast("double") / F.count(F.lit(1)), n)


def fr(c: ColumnOrName, n: int = 6) -> Column:
    """Engine-portable deterministic "round" of a FINITE double: truncate
    to n digits as floor(x*10^n)/10^n. Unlike round(double, n) — where
    Spark rounds the shortest decimal repr HALF_UP while DuckDB rounds
    the binary-scaled value (round(0.285d,2): Spark 0.29, DuckDB 0.28) —
    both engines evaluate this formula with the identical IEEE ops, so
    the result is bit-identical whenever the input double is. Do NOT use
    on values that can be NaN (Spark floor(NaN) is 0, DuckDB keeps NaN).
    Pair with ``ofr`` on the oracle side."""
    s = float(10**n)
    return F.floor(_col(c) * F.lit(s)) / F.lit(s)


def dwsum(c: ColumnOrName, n: int = 2) -> Column:
    """Windowed variant of dsum — apply ``.over(w)`` to ``F.sum`` yourself:
    use ``F.sum(wdec(col)).over(w)`` then ``wround``. Kept for symmetry."""
    return dsum(c, n)


def wdec(c: ColumnOrName) -> Column:
    """Cast a measure to exact decimal for use inside window aggregates."""
    return _col(c).cast(DEC)


def wround(c: Column, n: int = 2) -> Column:
    """Round+cast a windowed decimal aggregate back to double."""
    return F.round(c, n).cast("double")


# ---------------------------------------------------------------------------
# deterministic aggregate builders (oracle SQL side)
# ---------------------------------------------------------------------------

def osum(expr: str, n: int = 2) -> str:
    return f"CAST(round(sum(CAST(({expr}) AS DECIMAL(25,6))), {n}) AS DOUBLE)"


def oavg(expr: str, n: int = 6) -> str:
    return ofr(
        f"CAST(sum(CAST(({expr}) AS DECIMAL(25,6))) AS DOUBLE) / count(*)", n
    )


def ofr(expr: str, n: int = 6) -> str:
    """Oracle-side twin of ``fr``: floor-truncate a finite double to n
    digits with the same IEEE ops Spark runs."""
    return f"(floor(({expr}) * 1e{n}) / 1e{n})"


def owsum(expr: str, over: str, n: int = 2) -> str:
    """Windowed deterministic sum for the oracle."""
    return (
        f"CAST(round(sum(CAST(({expr}) AS DECIMAL(25,6))) OVER {over}, {n})"
        " AS DOUBLE)"
    )


# ---------------------------------------------------------------------------
# table access
# ---------------------------------------------------------------------------

def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from gpdb_spark.catalog import load_table

    return load_table(spark, sf_dir, name)
