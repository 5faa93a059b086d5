"""gpdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of open-gpdb/gpdb (Greenplum).

This is NOT a port of the reference C/C++ engine. The mapping (SURVEY.md):

- coordinator (QD) -> Spark driver; segments (QE) -> executors/tasks
- Motion (redistribute/broadcast/gather) -> shuffle exchange / broadcast
- legacy planner + ORCA -> Catalyst + AQE
- AO/AOCS columnar storage -> Parquet
- gp_distribution_policy (DISTRIBUTED BY / REPLICATED) -> repartition /
  bucketBy / broadcast (see gpdb_spark.storage)

Everything is expressed through the DataFrame / Spark SQL API so Catalyst
keeps predicate pushdown, column pruning, partial aggregation and join
strategy selection. Python touches the hot path only through Arrow-batched
pandas UDFs (dedup / similarity / multimodal operators).
"""

__version__ = "0.1.0"

from gpdb_spark import pyspark_compat as _pyspark_compat

_pyspark_compat.install()  # ym-interval outputs fetch as PG interval text

from gpdb_spark.session import get_spark
from gpdb_spark.catalog import FIXTURE_TABLES, load_table, register_fixture_views
from gpdb_spark.engine import Engine

__all__ = [
    "Engine",
    "get_spark",
    "FIXTURE_TABLES",
    "load_table",
    "register_fixture_views",
    "__version__",
]
