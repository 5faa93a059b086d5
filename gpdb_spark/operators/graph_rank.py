"""PageRank over an edge DataFrame — iterative graph analytics expressed
as a fixed number of declarative join+aggregate rounds.

Determinism doctrine: ranks are floor-truncated to 9 decimals after every
update and per-edge contributions to 12 decimals before the DECIMAL sum,
so every intermediate is an exact decimal, every sum order-independent,
and the whole fixpoint reproducible bit-for-bit by any SQL engine — the
DuckDB oracle unrolls the same iterations as a CTE chain.

Scale shape (100 TB graph): per iteration one shuffle keyed on dst (the
contribution aggregation) plus ONE dangling-mass scalar to the driver
(the same bounded per-round driver traffic class as the IRLS/label-prop
convergence checks). That eager 1-row collect is what lets each round's
rank cache be released as soon as the next round is materialized — with
a fully lazy loop nothing materializes until the caller's single
action, so every round's cache would have to survive to the end
(one full rank table per round; fatal at the 10-20 iterations
production runs pick). Iteration count is fixed (power iteration
converges geometrically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gpdb_spark.registry import fx, xsum

D = 0.85  # damping


def _floor(c, n):
    s = float(10**n)
    return F.floor(c * F.lit(s)) / F.lit(s)


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
) -> DataFrame:
    """Ranks for every node appearing in ``edges`` (either side), with
    uniform init, damping 0.85, and dangling mass redistributed
    uniformly. Returns (node, rank)."""
    # (r11 tested and rejected: hash-partitioning e by src once so the
    # per-round rank join reuses the cached partitioning — interleaved
    # A/B was a wash, because AQE broadcasts the slim rank/outdeg sides
    # and the cached edge table is never re-exchanged anyway.)
    e = edges.select(src, dst).distinct().persist()
    nodes = (
        e.select(F.col(src).alias("node"))
        .union(e.select(F.col(dst).alias("node")))
        .distinct()
        .persist()
    )
    n_total = nodes.count()  # scalar: drives literal 1/N in the plan
    outdeg = e.groupBy(src).agg(F.count(F.lit(1)).alias("deg")).persist()
    # the set of dangling nodes (no out-edges) is static across
    # iterations — derive it once, not per round
    dangling_nodes = (
        nodes.join(outdeg.withColumnRenamed(src, "node"), "node", "left_anti")
        .persist()
    )

    pr = nodes.withColumn("rank", _floor(F.lit(1.0) / n_total, 9))
    prev = None
    for _ in range(iterations):
        # each round's ranks are consumed TWICE (contributions + dangling
        # mass); without a persist the lineage re-derives round i-1 for
        # both consumers and the DAG doubles per iteration.
        pr = pr.persist()
        # r11 (guide §1.2): the per-edge floor-12 contribution rides as a
        # LONG fixed point and the per-dst sum runs as registry.xsum's
        # primitive split-long sums — value-identical to the previous
        # _floor(...,12).cast(decimal(28,15)) decimal sum (rank/deg <= 1,
        # so u <= 1e12 always has <= 15 significant digits; xsum docs),
        # with no per-row decimal allocation in the round's hot join.
        contribs = (
            e.join(pr.withColumnRenamed("node", src), src)
            .join(outdeg, src)
            .select(
                F.col(dst).alias("node"),
                fx(F.col("rank") / F.col("deg"), 12).alias("c"),
            )
            .groupBy("node")
            .agg(xsum(F.col("c"), 12).cast("double").alias("contrib"))
        )
        dangling = (
            pr.join(dangling_nodes, "node")
            .agg(F.sum(F.col("rank").cast("decimal(28,15)")).cast("double").alias("dm"))
        )
        # dangling mass is materialized eagerly (1 row) so round i-1's
        # cache can be released before building round i — at 10-20
        # production iterations, leaving every round cached accumulates
        # one full rank table per round in executor memory.
        dangling = F.broadcast(
            pr.sparkSession.createDataFrame(dangling.collect(), dangling.schema)
        )
        if prev is not None:
            prev.unpersist()
        prev = pr
        pr = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                _floor(
                    F.lit((1.0 - D) / n_total)
                    + F.lit(D)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.coalesce(F.col("dm"), F.lit(0.0)) / n_total
                    ),
                    9,
                ).alias("rank"),
            )
        )
    # the LAST round's cache (prev) must survive: the returned plan is
    # lazy and reads it. The static relations (e / nodes / outdeg /
    # dangling_nodes) stay cached for the caller's single evaluation —
    # bounded at O(edges) total, unlike the per-round leak fixed above.
    return pr
