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
# CORRECTNESS check (~50 per round). Round-10 head, per VERDICT r09
# Next #1 (standing rule: any row red at its latest driver check leads
# the head): pg_dst_interval_arith first (fixed in r9, sim-green, but
# the r9 rotation never re-sampled it — latest driver row is the r8
# red), then the one remaining r03-era row, all 21 r04-era rows, and
# the oldest r05 rows — freshness floor moves to r05.
DRIVER_PRIORITY: list[str] = [
    # stale-red re-attestation (VERDICT r09 What's-wrong #1)
    "pg_dst_interval_arith",
    # (the one r03-era ledger row, dedup_minhash_clusters_portable, was
    # renamed to dedup_minhash_clusters in r05 — its successor is below)
    # the 21 r04-era rows
    "multimodal_frame_manifest",
    "multimodal_image_features",
    "pg_format_quote_split",
    "pg_unnest_ordinality_array_agg",
    "pgcrypto_armor",
    "pgcrypto_crypt",
    "pgcrypto_pgp",
    "plpgsql_case_foreach",
    "plpgsql_cursor",
    "recursive_cte_graph",
    "regexp_like_funcs",
    "setop_union_mixed",
    "string_funcs",
    "table_function_scatter",
    "text_dup_spans",
    "text_fingerprint",
    "text_quality_score",
    "text_token_stats",
    "tz_offset_convert",
    "udaf_grouped_agg",
    "unpivot_stack",
    # oldest r05 rows (alphabetical) to fill the ~50-sample
    "array_funcs2",
    "complex_arith",
    "cube_ops",
    "datapipe_pack_sequences",
    "dblink_query",
    "dedup_minhash_clusters",
    "distinct_dropdup",
    "embed_cosine_pairs",
    "events_sliding_window",
    "events_tumbling_window",
    "fulltext_dicts",
    "fulltext_headline",
    "fulltext_match_all",
    "fulltext_match_any",
    "generate_series_agg",
    "generate_series_timestamp",
    "hypothetical_set_aggs",
    "isn_check_digits",
    "join_cross",
    "json_build_agg",
    "limit_offset",
    "mapinpandas_filter",
    "mapreduce_pipeline",
    "math_funcs",
    "matrix_sum_agg",
    "merge_append_ordered",
    "pg_cast_bal",
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
