"""hstore — key/value pairs in a single value (contrib/hstore).

Reference: /root/reference/contrib/hstore/ (hstore_io.c text format
``"k"=>"v", ...``; hstore_op.c operators: ``->`` fetch, ``?`` exists,
``||`` concat with right-operand override, delete, akeys/avals/each,
hstore_to_json).

Spark realization: ``MapType(string, string)`` — the type GPDB itself
lacks (SURVEY.md §1.2 notes hstore is not shipped in the core catalog but
lives in contrib). Parsing and every operator are JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hstore_parse(col: Column) -> Column:
    """Parse the hstore text format into a map. Accepts optional double
    quotes around keys/values and whitespace around ``=>`` / ``,``
    (hstore_io.c's lexer); backslash escapes are out of scope."""
    normalized = F.regexp_replace(col, r'\s*=>\s*', "\x01")
    normalized = F.regexp_replace(normalized, r'\s*,\s*', "\x02")
    normalized = F.regexp_replace(normalized, '"', "")
    return F.str_to_map(normalized, F.lit("\x02"), F.lit("\x01"))


def fetch(m: Column, key: str) -> Column:
    """``h -> 'k'`` (NULL when absent — element_at on maps is NULL-safe
    under non-ANSI fetch via try_element_at)."""
    return F.try_element_at(m, F.lit(key))


def exists(m: Column, key: str) -> Column:
    """``h ? 'k'``"""
    return F.map_contains_key(m, key)


def concat(a: Column, b: Column) -> Column:
    """``a || b`` with hstore's right-wins override: keys of ``a`` that
    also appear in ``b`` are dropped before the merge (map_concat itself
    rejects duplicates under the default dedup policy, so the override is
    explicit rather than config-dependent)."""
    a_only = F.map_filter(a, lambda k, _: ~F.map_contains_key(b, k))
    return F.map_concat(a_only, b)


def delete(m: Column, key: str) -> Column:
    """``h - 'k'``"""
    return F.map_filter(m, lambda k, _: k != F.lit(key))


def akeys(m: Column) -> Column:
    """Sorted key array (PG's akeys returns storage order; sorted here for
    a deterministic cross-engine contract)."""
    return F.array_sort(F.map_keys(m))


def avals_by_key(m: Column) -> Column:
    """Values ordered by sorted key (same determinism note as akeys)."""
    return F.transform(akeys(m), lambda k: m[k])


def to_json_sorted(m: Column) -> Column:
    """hstore_to_json with canonical (sorted-key) member order, built
    explicitly so both engines can derive the identical string."""
    members = F.transform(
        akeys(m),
        lambda k: F.concat(F.lit('"'), k, F.lit('":"'), m[k], F.lit('"')),
    )
    return F.concat(F.lit("{"), F.array_join(members, ","), F.lit("}"))
