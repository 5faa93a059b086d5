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

# --- split-long exact sum (optimization round r11) -------------------------
# sum(cast(x AS DECIMAL(25,6))) dominated the aggregation queries: Spark's
# double->decimal cast goes through BigDecimal.valueOf(Double.toString(x))
# and the decimal sum buffer allocates per row — measured ~0.33 s per
# measure per 600 k rows on one core (q01 carried 6 of them). The measures
# fed to dsum/davg are money/quantity columns (<=2 decimal digits, or
# products of a few such columns — <=6 exact decimal digits, magnitudes
# < 1e13 in 6dp-unscaled units), so the per-row conversion
# round(x * 1e6) -> long is VALUE-IDENTICAL to the decimal cast (the double
# error of the product, <1e-9 absolute, never reaches the 5e-7 rounding
# boundary of an exact <=6dp value). The sum itself then runs as THREE
# primitive long sums of bounded digit slices (h:1e8.., m:1e4..1e7, l:..1e3)
# — each slice sum stays far inside int64 up to ~1e14 rows (vs a single
# long sum of u, which would silently wrap near 1e7 rows x 1e12 — the
# 100 TB hazard) — and the exact total is reassembled in decimal once per
# GROUP, where the old rounding discipline (round HALF_UP / cast double)
# applies unchanged. Values are bit-identical to the previous formulation
# on every fixture family (verified vs the DuckDB oracle, which still
# computes sum(CAST(x AS DECIMAL(25,6)))); only the per-row engine cost
# changes (~2.5x cheaper, guide §1.2 "per-task work").

_U = 1_000_000          # 6dp fixed-point scale
_SPLIT_H = 100_000_000  # digit-slice factors: u = h*1e8 + m*1e4 + l
_SPLIT_M = 10_000


def _usplit(c: Column) -> tuple[Column, Column, Column]:
    """6dp-unscaled long of a tame double measure, split into three
    bounded digit slices (floor division keeps 0 <= m,l < slice even for
    negative u, so each slice sum is bounded by rows x slice).

    The half-up is primitive (sign*floor(|x|+0.5)) instead of F.round's
    BigDecimal.valueOf path (~180 ns/row/measure saved). For |x| < 2^51
    the two agree exactly: shortest-repr rounding can only differ from
    value rounding when the value and its shortest repr straddle a K.5
    boundary, impossible below 2^52 where K.5 is itself representable;
    and x+0.5 is exact below 2^51. Our 6dp-unscaled domain is < 1e13."""
    x = c * _U
    u = F.when(x < 0, -F.floor(-x + 0.5)).otherwise(F.floor(x + 0.5)).cast(
        "long"
    )
    h = F.floor(u / F.lit(float(_SPLIT_H))).cast("long")
    r = u - h * F.lit(_SPLIT_H)
    m = F.floor(r / F.lit(float(_SPLIT_M))).cast("long")
    lo = r - m * F.lit(_SPLIT_M)
    return h, m, lo


def _usum(c: Column) -> Column:
    """Exact DECIMAL(38,6) sum of the measure = (1e8*Σh + 1e4*Σm + Σl)/1e6,
    reassembled once per group. NULL-correct: h/m/l are null together, so
    the three sums skip the same rows and a null-only group stays null."""
    h, m, lo = _usplit(c)
    total = (
        F.sum(h).cast("decimal(28,0)") * _SPLIT_H
        + F.sum(m).cast("decimal(28,0)") * _SPLIT_M
        + F.sum(lo).cast("decimal(28,0)")
    )
    # exact rescale to 6dp: decimal division by 1e6 (scale >= 6 -> exact)
    return total / F.lit(_U)


def fx(c: ColumnOrName, digits: int) -> Column:
    """``floor(c * 10^digits)`` as a long — the fixed-point image of the
    floor-truncation discipline used by the iterative operators
    (``_floor(c, digits) == fx(c, digits) / 10^digits`` wherever
    ``|c| * 10^digits < 2^53``, which every caller's domain satisfies;
    F.floor on a double already returns LongType)."""
    return F.floor(_col(c) * F.lit(float(10**digits)))


def xsum(u: ColumnOrName, digits: int) -> Column:
    """Exact decimal sum ``Σ u_i · 10^-digits`` of a LONG fixed-point
    column — the split-long replacement (see the module comment above
    ``_usplit``) for the iterative-ML/graph discipline
    ``sum((u/10^digits as double).cast(DECIMAL(p,15)))``: that old chain
    recovers exactly ``u·10^-digits`` per term (u has <= 15 significant
    digits in every caller's domain, so the double division is the
    nearest double and the shortest-repr decimal cast round-trips), so
    summing the integers and rescaling ONCE per group is value-identical
    while the per-row work becomes three primitive long sums.

    The rescale is exact by construction: /1e6 yields quotient scale 6
    (Spark decimal division result scale >= 6), the downcast to
    DECIMAL(28,6) bounds the claimed precision so the second division
    keeps scale >= digits. Slice sums stay inside int64 up to ~1e14 rows
    x the callers' bounded |u| — far beyond any deployment's group size;
    the decimal reassembly itself cannot wrap."""
    uc = _col(u)
    h = F.floor(uc / F.lit(float(_SPLIT_H))).cast("long")
    r = uc - h * F.lit(_SPLIT_H)
    m = F.floor(r / F.lit(float(_SPLIT_M))).cast("long")
    lo = r - m * F.lit(_SPLIT_M)
    total = (
        F.sum(h).cast("decimal(28,0)") * _SPLIT_H
        + F.sum(m).cast("decimal(28,0)") * _SPLIT_M
        + F.sum(lo).cast("decimal(28,0)")
    )
    if digits <= 6:
        return total / F.lit(10**digits)
    q6 = (total / F.lit(_U)).cast("decimal(28,6)")
    return q6 / F.lit(10 ** (digits - 6))


def dsum(c: ColumnOrName, n: int = 2) -> Column:
    """Order-independent sum of a double measure, rounded to n digits.
    Same value as round(sum(cast(c AS DECIMAL(25,6))), n) — see _usum."""
    return F.round(_usum(_col(c)), n).cast("double")


def davg(c: ColumnOrName, n: int = 6) -> Column:
    """Order-independent average: exact decimal sum / count, in doubles."""
    return fr(_usum(_col(c)).cast("double") / F.count(F.lit(1)), n)


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
