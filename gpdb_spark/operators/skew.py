"""Skew-aware join: explicit salting for pathological hot keys.

The reference redistributes on the join key and a hot key melts one
segment (its docs advise re-DISTRIBUTing the table); Spark's AQE skew
join splits oversized partitions at runtime, which covers most cases.
This operator is the explicit, deterministic fallback for EXTREME skew
(one key = half the table) or for joins under configs where AQE can't
apply (e.g. a required sort order):

- fact side: each row gets a random salt in [0, salt).
- dim side: replicated ``salt`` times (explode), so (key, salt) keys are
  uniformly spread across salt x partitions.

Shuffle volume: fact unchanged, dim x salt (dims are small — that's why
they're the replicated side). Result is identical to the unsalted join
for inner/left/semi/anti; right/full are rejected (an unmatched
replicated-dim row would be preserved once per replica).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with the hot-key pressure spread over ``salt`` buckets.
    ``on`` columns must exist on both sides (dim is the replicated side)."""
    on = [on] if isinstance(on, str) else list(on)
    if how in ("right", "rightouter", "right_outer", "full", "outer",
               "fullouter", "full_outer"):
        # the dim side is REPLICATED salt times: an unmatched dim key
        # would survive once per replica under right/full preservation,
        # yielding salt duplicates instead of one row. These joins
        # belong on the unsalted path (the preserved side is the small
        # one anyway — no hot-key pressure to spread).
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched "
            "replicated-dim rows would duplicate; use a plain join "
            "(the dim side is small) or swap the sides"
        )
    f = fact.withColumn(
        "__salt", (F.rand(seed=7) * salt).cast("int")
    )
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = f.join(d, on + ["__salt"], how)
    return out.drop("__salt")
