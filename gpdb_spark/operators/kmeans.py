"""Lloyd's k-means with a deterministic, engine-reproducible iteration —
the trained-quantizer complement to the flat IVF coarse quantizer
(datapipe/similarity.ivf_topk_flat) and the third member of the
in-database ML set (linregr_multi / logregr_irls / kmeans).

Determinism doctrine (same as operators/graph_rank.py): centroid values
are floor-truncated to 9 decimals after every mean, per-pair squared
distances to 12 decimals before the DECIMAL sum — every intermediate is
an exact decimal, every sum order-independent, so the whole fixpoint is
bit-reproducible and the DuckDB oracle unrolls the identical iterations.

Scale shape: vectors live in LONG form (vec_id, dim, value) — the MPP
formulation with no arrays in the hot path. Per iteration: one broadcast
join against the k*dim centroid relation (k*dim rows — tiny), one
(vec_id, cid)-keyed partial-aggregated distance sum, one window argmin,
one (cid, dim)-keyed mean. No driver collect anywhere; centroids stay
distributed (broadcast by Catalyst because the relation is small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gpdb_spark.registry import fx, xsum

DEC30 = "decimal(30,15)"


def _floor(c, n):
    s = float(10**n)
    return F.floor(c * F.lit(s)) / F.lit(s)


def explode_long(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vid, i, x) long form — the MPP layout the Lloyd rounds run on."""
    return df.select(
        F.col(id_col).alias("vid"),
        F.posexplode(vec_col).alias("pos", "x_raw"),
    ).select(
        "vid", (F.col("pos") + 1).alias("i"), F.col("x_raw").cast("double").alias("x")
    )


def assign_cells(e: DataFrame, cent: DataFrame, n: int = 1) -> DataFrame:
    """Top-``n`` nearest centroids per vector by exact-decimal squared
    distance (floor-12 per-element terms, DECIMAL sum — the engine-
    reproducible metric of the Lloyd rounds). ``e`` is (vid, i, x) long
    form, ``cent`` is (cid, i, val); returns (vid, cid, r)."""
    # r11 (guide §1.2): the floor-12 squared-distance term rides as a
    # LONG fixed point and the per-(vid,cid) sum runs as registry.xsum's
    # primitive split-long sums — value-identical to the previous
    # _floor(d*d,12).cast(DECIMAL(30,15)) decimal sum (d² is bounded by
    # the embedding domain, u < 1e15 keeps <= 15 significant digits; see
    # xsum's docstring). This is the k x dim-fanout hot path of every
    # Lloyd round: no per-row decimal allocation left.
    d = F.col("x") - F.col("val")
    dist = (
        e.join(F.broadcast(cent), "i")
        .select("vid", "cid", fx(d * d, 12).alias("sq"))
        .groupBy("vid", "cid")
        .agg(xsum(F.col("sq"), 12).cast("double").alias("dist"))
    )
    w = Window.partitionBy("vid").orderBy("dist", "cid")
    return (
        dist.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= n)
        .select("vid", "cid", "r")
    )


def lloyd_rounds(
    e: DataFrame, cent: DataFrame, iterations: int
) -> tuple[DataFrame, DataFrame]:
    """``iterations`` Lloyd rounds over (vid, i, x) from init centroids
    (cid, i, val). Returns (assignments, final centroids); every mean is
    floor-9, every distance term floor-12 — bit-reproducible."""
    assigned = None
    for _ in range(iterations):
        assigned = assign_cells(e, cent, 1).select("vid", "cid")
        cent = (
            assigned.join(e, "vid")
            .groupBy("cid", "i")
            .agg(
                _floor(
                    F.sum(F.col("x").cast(DEC30)).cast("double")
                    / F.count(F.lit(1)),
                    9,
                ).alias("val")
            )
        )
    return assigned, cent


def kmeans_assign(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    iterations: int = 2,
) -> DataFrame:
    """Returns (id, cluster) after ``iterations`` Lloyd rounds starting
    from the k lowest-id vectors (deterministic init). Clusters that
    lose all members drop out (matching plain Lloyd)."""
    e = explode_long(df, id_col, vec_col).persist()

    # init = the k LOWEST ids, whatever the id space (a `vid < k` filter
    # would under-select for 1-based ids). Global top-k on the distinct
    # id set — Catalyst plans orderBy+limit as TakeOrderedAndProject
    # (per-partition top-k then a k-row merge), not a full sort.
    init_ids = e.select("vid").distinct().orderBy("vid").limit(k)
    cent = e.join(F.broadcast(init_ids), "vid").select(
        F.col("vid").alias("cid"), "i", _floor(F.col("x"), 9).alias("val")
    )
    assigned, _ = lloyd_rounds(e, cent, iterations)
    return assigned.select(F.col("vid").alias(id_col), F.col("cid").alias("cluster"))
