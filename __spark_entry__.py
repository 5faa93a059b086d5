"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 shape) on sf0.001.
``queries()`` / ``oracle_sql()`` are populated from gpdb_spark.registry —
every implemented operator from SURVEY.md §2 registers there (see
gpdb_spark/queries/*).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from gpdb_spark.registry import QUERIES
    import gpdb_spark.queries  # noqa: F401 — populates the registry

    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from gpdb_spark.registry import QUERIES
    import gpdb_spark.queries  # noqa: F401

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for the
    non-SQL-expressible ops — minhash/simhash/LSH/streaming — which the
    driver checks rows-only and pytest self-validates)."""
    from gpdb_spark.registry import ORACLE
    import gpdb_spark.queries  # noqa: F401

    return dict(ORACLE)
