"""orafce — Oracle-compatibility function pack shipped with the reference.

Reference: /root/reference/gpcontrib/orafce/ (datefce.c: add_months
last-day rule, next_day, months_between, trunc(date, fmt); others.c:
nvl/nvl2/decode/lnnvl/nanvl; charlen.c + plvstr.c: instr/listagg
variants).

Spark realization: every function is a builtin or a tiny expression —
no UDFs. The one real semantic delta vs Spark's own builtins is Oracle's
add_months last-day rule (Feb 28 + 1 mo = Mar 31), implemented
explicitly below.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def nvl(a: Column, b: Column) -> Column:
    return F.coalesce(a, b)


def nvl2(x: Column, not_null_val: Column, null_val: Column) -> Column:
    return F.when(x.isNotNull(), not_null_val).otherwise(null_val)


def decode(expr: Column, *pairs_and_default) -> Column:
    """Oracle DECODE(expr, k1, v1, k2, v2, ..., default). NULL matches
    NULL (Oracle decode treats NULL = NULL as a match — eqNullSafe)."""
    args = list(pairs_and_default)
    default = args.pop() if len(args) % 2 else F.lit(None)
    c = None
    for k, v in zip(args[::2], args[1::2]):
        cond = expr.eqNullSafe(k)
        c = F.when(cond, v) if c is None else c.when(cond, v)
    return default if c is None else c.otherwise(default)


def lnnvl(cond: Column) -> Column:
    """TRUE when cond is FALSE or NULL (others.c lnnvl)."""
    return ~F.coalesce(cond, F.lit(False))


def nanvl(x: Column, fallback: Column) -> Column:
    return F.when(F.isnan(x), fallback).otherwise(x)


def add_months_ora(d: Column, n: Column | int) -> Column:
    """Oracle add_months (datefce.c ora_add_months): if ``d`` is the last
    day of its month, the result is the last day of the target month
    (Feb 28 + 1 = Mar 31). Spark's own add_months keeps the day number
    (= Mar 28), so the rule is applied explicitly."""
    base = F.add_months(d, n)
    return F.when(d == F.last_day(d), F.last_day(base)).otherwise(base)


def next_day(d: Column, dayname: str) -> Column:
    """First ``dayname`` strictly after d — Spark's next_day has exactly
    the Oracle contract (datefce.c ora_next_day)."""
    return F.next_day(d, dayname)


def months_between(d1: Column, d2: Column) -> Column:
    """Oracle months_between, UNROUNDED (roundOff=False): Spark's default
    pre-rounds to 8 digits HALF_UP, which breaks the engine-portable
    floor-truncation discipline (registry.fr) the query layer applies —
    the oracle floors the raw value, so Spark must too.
    31-day-month fraction + same-day/both-last-day integer rule."""
    return F.months_between(d1, d2, roundOff=False)


def instr(s: Column, sub: str, start: int = 1) -> Column:
    """plvstr.c instr with a start position (nth-occurrence form omitted:
    no query surface needs it and a loop would leave codegen)."""
    return F.locate(sub, s, start)


def listagg(col: Column, sep: str = ",") -> Column:
    """listagg within group — deterministic ordered form
    (array_join(array_sort(collect_list(...)))), the aggregation contract
    GPDB's gp_legacy_string_agg also documents as order-sensitive."""
    return F.array_join(F.array_sort(F.collect_list(col)), sep)
