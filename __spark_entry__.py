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


# The driver samples the first N entries of queries() for its DuckDB
# CORRECTNESS check (~50 per round). Round-9 head: never-checked
# round-9 queries, then the r03-era rows, then the oldest r04 rows.
# Everything else keeps its r04-r08 green row and sorts last.
DRIVER_PRIORITY: list[str] = [
    # round-9 head: the two never-driver-checked round-9 queries
    # (enum declared order, geo table columns), then the 24 rows
    # whose latest green is still round 3, then the oldest round-4
    # rows — freshness floor target moves to r04-r05 (VERDICT r08
    # Next #7)
    "pg_enum_order",
    "pg_geo_column_ops",
    "datapipe_domain_mix",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "distinct_ordered_aggs",
    "embed_ann_ivf_flat",
    "embed_ann_lsh",
    "embed_ann_topk_blocked",
    "events_retention_cohorts",
    "fuzzy_metaphone",
    "join_notin_nullaware",
    "logregr_irls",
    "multimodal_byte_stats",
    "pgcrypto_hmac",
    "plpgsql_control_flow",
    "plpgsql_function",
    "recursive_cte_series",
    "setop_intersect_all",
    "tablefunc_crosstab",
    "text_langid_heuristic",
    "text_lm_quality",
    "text_url_canonical_dedup",
    "values_scan",
    "window_frame_exclude_groups",
    "array_any_all_ops",
    "array_funcs",
    "conditional_funcs",
    "cte_shared_scan",
    "date_funcs",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "embed_ann_ivf",
    "embed_ann_topk",
    "embed_centroids",
    "embed_norms",
    "embed_quantize_int8",
    "events_asof_join",
    "events_linear_interpolate",
    "events_sessionize",
    "events_time_buckets",
    "events_type_pivot",
    "fulltext_rank",
    "int_division_pg",
    "interval_age_overlaps",
    "join_range_binned",
    "json_each_explode",
    "json_funcs",
    "mapreduce_yaml",
]


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in DRIVER_PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from gpdb_spark.registry import QUERIES
    import gpdb_spark.queries  # noqa: F401

    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for the
    non-SQL-expressible ops — minhash/simhash/LSH/streaming — which the
    driver checks rows-only and pytest self-validates)."""
    from gpdb_spark.registry import ORACLE
    import gpdb_spark.queries  # noqa: F401

    return _ordered(dict(ORACLE))
