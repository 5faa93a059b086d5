"""fuzzystrmatch — phonetic + edit-distance matching.

Reference: /root/reference/contrib/fuzzystrmatch/fuzzystrmatch.c
(levenshtein :212, levenshtein_less_equal :260, soundex `_soundex` :73,
difference :156). metaphone/dmetaphone are documented as out of scope
(no Spark builtin; a Python UDF would put a per-row interpreter in what
is otherwise a codegen path).

Spark realization: `levenshtein` and `soundex` are JVM builtins;
`difference` (count of position-wise matching soundex code characters,
0-4) is a small expression over the two soundex codes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def levenshtein(a: Column, b: Column, threshold: int | None = None) -> Column:
    """Edit distance; with threshold, PG's levenshtein_less_equal contract
    (Spark returns -1 when the distance exceeds the bound, letting the
    engine bail out of the DP early — same early-exit the C code does)."""
    if threshold is None:
        return F.levenshtein(a, b)
    return F.levenshtein(a, b, threshold)


_SOUNDEX_TABLE = "01230120022455012623010202"


def soundex(col: Column) -> Column:
    """PG soundex (fuzzystrmatch.c:73 `_soundex`), built as expressions:
    keep letters, map through the code table, collapse adjacent duplicate
    codes, drop vowels-class codes (0), first letter + 3 codes rpad '0'.

    NOT Spark's builtin soundex: that one implements the refined American
    variant where h/w are skipped without separating (Ashcraft -> A261);
    PG's table assigns h/w code 0 so they separate (Ashcraft -> A226),
    and PG skips non-letters without resetting the previous code."""
    letters = F.upper(F.regexp_replace(col, "[^a-zA-Z]", ""))
    mapped = F.translate(letters, "ABCDEFGHIJKLMNOPQRSTUVWXYZ", _SOUNDEX_TABLE)
    collapsed = F.regexp_replace(mapped, r"(\d)\1+", "$1")
    code = F.concat(
        F.substring(letters, 1, 1),
        F.substring(
            F.replace(F.substring(collapsed, 2, 1 << 30), F.lit("0"), F.lit("")),
            1,
            3,
        ),
    )
    return F.when(F.length(letters) == 0, F.lit("")).otherwise(
        F.rpad(code, 4, "0")
    )


def duck_soundex(expr: str) -> str:
    """DuckDB mirror of the PG soundex algorithm (RE2 lacks
    backreferences, so adjacent-duplicate collapse is a replace chain —
    6 rounds halve runs, covering runs up to 64 codes)."""
    letters = f"upper(regexp_replace({expr}, '[^a-zA-Z]', '', 'g'))"
    mapped = (
        f"translate({letters}, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', "
        f"'{_SOUNDEX_TABLE}')"
    )
    collapsed = mapped
    for _ in range(6):
        for d in "0123456":
            collapsed = f"replace({collapsed},'{d}{d}','{d}')"
    return (
        f"CASE WHEN {letters} = '' THEN '' ELSE "
        f"rpad(substr({letters}, 1, 1) || "
        f"substr(replace(substr({collapsed}, 2), '0', ''), 1, 3), 4, '0') END"
    )


def duck_difference(ea: str, eb: str) -> str:
    sa, sb = duck_soundex(ea), duck_soundex(eb)
    return (
        "("
        + " + ".join(
            f"CAST(substr({sa}, {i}, 1) = substr({sb}, {i}, 1) AS INT)"
            for i in range(1, 5)
        )
        + ")"
    )


def difference(a: Column, b: Column) -> Column:
    """Number of positionally matching characters between the two soundex
    codes (0-4), fuzzystrmatch.c:156."""
    sa, sb = soundex(a), soundex(b)
    out = F.lit(0)
    for i in range(1, 5):
        out = out + (F.substring(sa, i, 1) == F.substring(sb, i, 1)).cast("int")
    return out
