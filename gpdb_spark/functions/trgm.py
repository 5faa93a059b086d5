"""pg_trgm — character-trigram text similarity.

Reference: /root/reference/contrib/pg_trgm/trgm_op.c (generate_trgm,
cnt_sml; KEEPONLYALNUM + IGNORECASE defaults) and trgm.h (padding rule:
each word is blank-padded with two leading and one trailing space before
trigram extraction, so a word of length n yields n+1 trigrams).

Spark realization: everything is a JVM-side array expression
(split/filter/transform/sequence/substring + array_distinct/intersect/
union) — codegen-friendly, no Python in the path. At 100 TB this matters:
similarity() between two columns is a per-row expression with zero
shuffle; the trigram *join* path (near-duplicate search over a corpus)
must NOT be all-pairs — see queries/contrib_text.py::trgm_neardup_pairs
which reuses the inverted-index + df-cutoff shape of datapipe/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# PG default threshold for the % operator (trgm_op.c: similarity_threshold)
SIMILARITY_THRESHOLD = 0.3


def _words(col: Column) -> Column:
    """KEEPONLYALNUM word extraction: lowercase, split on non-alnum."""
    return F.filter(
        F.split(F.lower(col), "[^a-z0-9]+"), lambda w: w != F.lit("")
    )


def show_trgm(col: Column) -> Column:
    """Sorted distinct trigram array of a string (show_trgm).

    Per word w: pad to ``'  ' + w + ' '`` and slide a width-3 window —
    positions 1 .. length(w)+1 (n+1 trigrams for a length-n word,
    matching trgm.h's LPADDING=2 / RPADDING=1).
    """
    per_word = F.transform(
        _words(col),
        lambda w: F.transform(
            F.sequence(F.lit(1), F.length(w) + F.lit(1)),
            lambda i: F.substring(
                F.concat(F.lit("  "), w, F.lit(" ")), i, F.lit(3)
            ),
        ),
    )
    return F.array_sort(F.array_distinct(F.flatten(per_word)))


def similarity(a: Column, b: Column) -> Column:
    """Trigram-set Jaccard (trgm_op.c cnt_sml): shared / (|a|+|b|-shared).

    NULL-safe on empty sets the way PG is: similarity of two trigram-less
    strings is 0 (guarded division).
    """
    ta, tb = show_trgm(a), show_trgm(b)
    inter = F.size(F.array_intersect(ta, tb)).cast("double")
    union = F.size(F.array_union(ta, tb)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def is_similar(a: Column, b: Column, threshold: float = SIMILARITY_THRESHOLD) -> Column:
    """The ``%`` operator: similarity >= threshold (default 0.3)."""
    return similarity(a, b) >= F.lit(threshold)


# DuckDB oracle mirrors (same construction in DuckDB's list dialect), used
# by queries/contrib_text.py so the SQL stays next to the semantics.
def duck_trgm(expr: str) -> str:
    # NOTE: the registry collapses whitespace in oracle SQL, so the
    # 2-space pad must be spelled as two single-space literals.
    return (
        "list_sort(list_distinct(flatten(list_transform("
        f"list_filter(string_split_regex(lower({expr}), '[^a-z0-9]+'), w -> w != ''), "
        "w -> list_transform(generate_series(1, length(w) + 1), "
        "i -> substring(' ' || ' ' || w || ' ', i, 3))))))"
    )


def duck_similarity(ea: str, eb: str) -> str:
    ta, tb = duck_trgm(ea), duck_trgm(eb)
    return (
        f"CASE WHEN len(list_distinct(list_concat({ta}, {tb}))) > 0 THEN "
        f"CAST(len(list_intersect({ta}, {tb})) AS DOUBLE) / "
        f"len(list_distinct(list_concat({ta}, {tb}))) ELSE 0.0 END"
    )
