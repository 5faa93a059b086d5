"""PostgreSQL-dialect helpers closing the PG <-> Spark builtin gaps.

These are the "genuinely custom" dialect items from SURVEY.md §7:

- NULL ordering: PG sorts NULLs as largest (NULLS LAST on ASC, NULLS FIRST
  on DESC — reference comparators in src/backend/utils/sort/tuplesort.c);
  Spark defaults to the opposite. ``pg_asc``/``pg_desc`` emit the explicit
  variants so every translated ORDER BY keeps PG semantics.
- Integer division: PG ``/`` on ints truncates; Spark SQL ``/`` returns
  double. ``int_div`` maps to Spark's ``div``.
- ``string_agg(expr, sep ORDER BY ...)`` (src/backend/utils/adt/varlena.c)
  with a deterministic ordering guarantee, built from
  collect_list(struct) -> array_sort -> join, which keeps the whole
  aggregation JVM-side (no UDF, partial-aggregatable).
- ``generate_series`` (src/backend/utils/adt/int.c) -> sequence + explode.
- ``to_char`` minimal PG->Java pattern translation
  (src/backend/utils/adt/formatting.c).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def pg_asc(c: Column | str) -> Column:
    """ASC with PG null ordering (NULLS LAST)."""
    c = F.col(c) if isinstance(c, str) else c
    return c.asc_nulls_last()


def pg_desc(c: Column | str) -> Column:
    """DESC with PG null ordering (NULLS FIRST)."""
    c = F.col(c) if isinstance(c, str) else c
    return c.desc_nulls_first()


def int_div(a: Column | str, b: Column | str) -> Column:
    """PG integer division: truncates toward zero (int4div semantics,
    src/backend/utils/adt/int.c). Spark SQL ``/`` would return double;
    the ``div`` operator matches PG."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    al, bl = a.cast("long"), b.cast("long")
    # a % b follows the dividend's sign in both PG and Spark, so
    # (a - a % b) is exactly divisible and the division truncates toward 0.
    return ((al - al % bl) / bl).cast("long")


def string_agg(value: Column | str, sep: str, order_by: Column | str | None = None) -> Column:
    """PG string_agg with ORDER BY determinism.

    collect_list is order-nondeterministic across partitions, so we carry the
    sort key in a struct, array_sort (struct comparison is field-order), then
    project the value out and join. All JVM-side, partial-aggregatable.
    """
    value = F.col(value) if isinstance(value, str) else value
    key = value if order_by is None else (
        F.col(order_by) if isinstance(order_by, str) else order_by
    )
    pairs = F.array_sort(F.collect_list(F.struct(key.alias("k"), value.alias("v"))))
    return F.array_join(F.transform(pairs, lambda p: p["v"]), sep)


def array_agg_ordered(value: Column | str, order_by: Column | str | None = None) -> Column:
    """PG array_agg(x ORDER BY k) — deterministic collect."""
    value = F.col(value) if isinstance(value, str) else value
    key = value if order_by is None else (
        F.col(order_by) if isinstance(order_by, str) else order_by
    )
    pairs = F.array_sort(F.collect_list(F.struct(key.alias("k"), value.alias("v"))))
    return F.transform(pairs, lambda p: p["v"])


def generate_series(spark: SparkSession, start: int, stop: int, step: int = 1) -> DataFrame:
    """PG generate_series(start, stop, step) as a DataFrame with column n.

    Distributed: spark.range partitions the series across the cluster
    (vs. a driver-side list)."""
    return spark.range(start, stop + (1 if step > 0 else -1), step).select(
        F.col("id").alias("n")
    )


_TO_CHAR_MAP = [
    ("YYYY", "yyyy"),
    ("YY", "yy"),
    ("MM", "MM"),
    ("DD", "dd"),
    ("HH24", "HH"),
    ("HH12", "hh"),
    ("MI", "mm"),
    ("SS", "ss"),
    ("MS", "SSS"),
    ("Month", "MMMM"),
    ("Mon", "MMM"),
    ("Day", "EEEE"),
    ("Dy", "EEE"),
]


def to_char(ts: Column | str, pg_pattern: str) -> Column:
    """PG to_char(timestamp, pattern) — translates the common PG format
    tokens (formatting.c) to Java SimpleDateFormat tokens for date_format."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    fmt = pg_pattern
    for pg, java in _TO_CHAR_MAP:
        fmt = fmt.replace(pg, java)
    return F.date_format(ts, fmt)


def age_parts(a: Column | str, b: Column | str) -> Column:
    """PG ``age(a, b)`` decomposed to struct<years,months,days>
    (timestamp_age, reference src/backend/utils/adt/timestamp.c): field-wise
    year/month/day differences, negative days borrow one month using the
    length of the EARLIER date's month (hence age('1997-02-28',
    '1997-01-31') = 28 days, not 1 month), negative months borrow one
    year. DuckDB's age() follows the same algorithm, so this is
    oracle-comparable per component."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    y = F.year(a) - F.year(b)
    m = F.month(a) - F.month(b)
    d = F.dayofmonth(a) - F.dayofmonth(b)
    dim_b = F.dayofmonth(F.last_day(b))  # days in b's month
    borrow_d = d < 0
    d1 = F.when(borrow_d, d + dim_b).otherwise(d)
    m1 = F.when(borrow_d, m - 1).otherwise(m)
    borrow_m = m1 < 0
    return F.struct(
        F.when(borrow_m, y - 1).otherwise(y).alias("years"),
        F.when(borrow_m, m1 + 12).otherwise(m1).alias("months"),
        d1.alias("days"),
    )


def ts_overlaps(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    """PG ``(s1, e1) OVERLAPS (s2, e2)`` (overlaps_timestamp, reference
    src/backend/utils/adt/timestamp.c): endpoints normalized so start <=
    end, then half-open comparison; equal starts overlap (covers the
    zero-length point-interval case)."""
    l1, g1 = F.least(s1, e1), F.greatest(s1, e1)
    l2, g2 = F.least(s2, e2), F.greatest(s2, e2)
    return (
        F.when(l1 > l2, l1 < g2).when(l2 > l1, l2 < g1).otherwise(F.lit(True))
    )
