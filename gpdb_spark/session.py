"""SparkSession factory tuned for the engine.

The reference engine's executor-side machinery (spill-aware hash agg/join,
external sort, motion interconnect — SURVEY.md §4.3) is delegated to Spark
built-ins; what we own here is configuration policy:

- AQE on (runtime re-plan ≈ ORCA's cost-based alternatives, plus skew-join
  handling the reference lacks).
- shuffle partitions sized from the env (local test boxes are small; a real
  cluster run overrides via ``SPARK_GRAFT_SHUFFLE`` / submit conf).
- session timezone pinned to UTC so timestamp semantics are stable and match
  the DuckDB oracle.
- Arrow enabled for the pandas-UDF operators (dedup / similarity / text).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "gpdb_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with engine defaults.

    Settings chosen for 100TB-scale behavior, testable on local[N]:
    adaptive execution coalesces small shuffle partitions and rewrites skewed
    joins at runtime; broadcast threshold is left at Spark's default so AQE
    can promote small sides (REPLICATED-table semantics are expressed
    explicitly via ``broadcast()`` in gpdb_spark.storage instead).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
