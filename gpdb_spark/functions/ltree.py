"""ltree — hierarchical label-path type (contrib/ltree).

Reference: /root/reference/contrib/ltree/ (ltree_io.c dotted-label
format; ltree_op.c: nlevel, subltree, subpath, index, lca, ``@>``/``<@``
ancestor tests; lquery matching ``~`` in lquery_op.c).

Spark realization: a path is a dotted string of labels
(``[a-z0-9_]+``); every operator is a split/slice/regexp expression.
lquery support covers the label / ``*`` (any number of labels) subset —
the constant pattern is compiled to an anchored regex driver-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def nlevel(p: Column) -> Column:
    return F.size(F.split(p, r"\."))


def subpath(p: Column, offset: int, length: int) -> Column:
    """subpath(ltree, offset, len) — 0-based like the reference."""
    return F.array_join(F.slice(F.split(p, r"\."), offset + 1, length), ".")


def subltree(p: Column, start: int, end: int) -> Column:
    """subltree(ltree, start, end) — labels [start, end), 0-based."""
    return subpath(p, start, end - start)


def index(p: Column, sub: Column) -> Column:
    """index(a, b): position of b's label sequence in a (0-based, -1 when
    absent) — via label-array position of the first match over offsets."""
    labels = F.split(p, r"\.")
    sub_labels = F.split(sub, r"\.")
    n, m = F.size(labels), F.size(sub_labels)
    # upper bound clamped to >=1 (Spark's sequence(1,0) would DESCEND);
    # a too-long sub still compares false at offset 1, yielding -1
    offsets = F.filter(
        F.sequence(F.lit(1), F.greatest(n - m + 1, F.lit(1))),
        lambda i: F.slice(labels, i, m) == sub_labels,
    )
    return F.coalesce(F.try_element_at(offsets, F.lit(1)) - 1, F.lit(-1))


def is_ancestor(a: Column, b: Column) -> Column:
    """``a @> b`` — a is an ancestor of (or equal to) b."""
    return (a == b) | b.startswith(F.concat(a, F.lit(".")))


def lca(a: Column, b: Column) -> Column:
    """Longest common ancestor of two paths ('' when none)."""
    la, lb = F.split(a, r"\."), F.split(b, r"\.")
    n = F.least(F.size(la), F.size(lb))
    common = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: F.slice(la, 1, i) == F.slice(lb, 1, i),
    )
    k = F.coalesce(F.try_element_at(common, F.lit(-1)), F.lit(0))
    return F.array_join(F.slice(la, 1, k), ".")


def lquery_regex(lquery: str) -> str:
    """Compile the label / ``*`` subset of lquery to an anchored regex
    (lquery_op.c semantics: ``*`` matches any number of labels, including
    zero). Works for both Spark rlike and the DuckDB oracle (RE2-safe:
    non-capturing groups only)."""
    parts = lquery.split(".")
    out = []
    for part in parts:
        if part == "*":
            out.append("(?:[a-z0-9_]+(?:\\.|$))*")
        else:
            out.append(part + "(?:\\.|$)")
    # each piece consumes its own trailing dot-or-end, so just anchor
    return "^" + "".join(out) + "$"
