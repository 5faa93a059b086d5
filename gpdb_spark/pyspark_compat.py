"""Driver-side fetch shim for a PySpark type gap.

PySpark 4.1's ``YearMonthIntervalType.fromInternal`` raises
NotImplementedError, so any query whose OUTPUT column is a year-month
interval (``interval '1 year'``, ``interval '999' month``, a sum of
month intervals, ...) crashes at ``collect()`` even though the JVM
computed the value fine and every arithmetic/comparison use works.
The reference renders those values as interval text (interval_out,
/root/reference/src/backend/utils/adt/timestamp.c): ``'1 year 2
mons'``. This shim does the same at the driver boundary: the
collected Python value for a year-month-interval column is PG's text
rendering. JVM-side semantics (timestamp arithmetic, ordering,
storage) are untouched — the shim only converts the driver-bound
representation stock PySpark refuses to convert at all.

CalendarIntervalType (mixed month+day+time, e.g. ``interval '1 mon 3
days'``) stays unfetchable: Pyrolite ships an attribute-less shell
object for it, so there is nothing to render from — collecting one
keeps stock PySpark's loud NotImplementedError. Mixed intervals work
in arithmetic; only a bare top-level mixed-interval column refuses.
"""
from __future__ import annotations

from pyspark.sql import types as _T


def ym_interval_out(months: int) -> str:
    """PG interval_out for a pure year-month value: ``'1 year 2
    mons'``, singular exactly on +1 (timestamp.c AddVerboseIntPart's
    ``value == 1`` test — '-1' is plural), zero renders '00:00:00'."""
    if months is None:
        return None
    years, mons = int(months) // 12, int(months) % 12
    if months < 0:  # C division truncates toward zero
        years, mons = -(-int(months) // 12), -(-int(months) % 12)
    parts = []
    if years:
        parts.append(f"{years} year" + ("" if years == 1 else "s"))
    if mons:
        parts.append(f"{mons} mon" + ("" if mons == 1 else "s"))
    return " ".join(parts) if parts else "00:00:00"


def install() -> None:
    """Idempotently patch YearMonthIntervalType.fromInternal."""
    if getattr(_T.YearMonthIntervalType, "_gpdb_spark_ym_shim", False):
        return
    _T.YearMonthIntervalType.fromInternal = (
        lambda self, months: ym_interval_out(months)
    )
    _T.YearMonthIntervalType._gpdb_spark_ym_shim = True
