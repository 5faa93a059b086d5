"""Sequence / nextval analog: dense 1..N id assignment, distributed.

The reference's sequences (upstream PG, SURVEY.md §1.1) hand out ids from
a single catalog object — a serialization point an MPP engine already
pays for only at id-allocation granularity. Spark analog options:
``monotonically_increasing_id`` (sparse, partition-encoded — fine when
only uniqueness matters) or this dense assignment for nextval parity.

Scale shape: per-partition row_number (no cross-partition data movement)
+ a partition-count side pass (tiny: one row per partition) collected to
the driver to compute prefix offsets, broadcast back as a literal map.
This is the classic zipWithIndex formulation expressed in DataFrame ops —
the only driver traffic is O(num_partitions) longs, never rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def add_sequence(df: DataFrame, col_name: str = "seq", start: int = 1) -> DataFrame:
    """Append a dense sequence column start..start+N-1. Ordering within
    the sequence follows (partition, arrival) order — like nextval,
    values are unique and dense but carry no semantic order."""
    # persist BEFORE the two actions: the counts job and the final
    # projection job otherwise recompute the plan independently, and any
    # nondeterminism upstream (rand() filters, sample(), a changed file
    # listing) would desynchronize offsets from row numbers — the same
    # pinning the classic zipWithIndex requires
    d = df.withColumn("__pid", F.spark_partition_id()).persist()
    w = Window.partitionBy("__pid").orderBy(F.monotonically_increasing_id())
    d = d.withColumn("__rn", F.row_number().over(w))
    counts = {
        r["__pid"]: r["n"]
        for r in d.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        ),
        F.col("__pid"),
    )
    res = (
        d.withColumn(col_name, (off_expr + F.col("__rn") - 1).cast("long"))
        .drop("__pid", "__rn")
    )
    # Freeze the assignment, then RELEASE the input cache: the bare
    # persist leaked one pinned copy of the (arbitrarily large) input
    # per call for the session lifetime (round-5 review finding), and
    # an unpersist alone would let later actions recompute the lineage
    # and desynchronize ids. localCheckpoint(eager) materializes the
    # result once with truncated lineage — ids are final, the cache is
    # freed now, and the checkpoint storage is reclaimed by the context
    # cleaner when the returned frame is dropped.
    res = res.localCheckpoint(eager=True)
    d.unpersist(blocking=False)
    return res
