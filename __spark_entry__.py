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
# CORRECTNESS check (~50 per round). Round-8 head (VERDICT r07 Next
# #3): the three new round-8 queries (never checked), then the 24 rows
# whose latest green is still round 2, then the round-3-era rows —
# freshness floor target r04. Everything else keeps its r04-r07 green
# row and sorts last.
DRIVER_PRIORITY: list[str] = [
    # never-driver-checked round-8 queries first (DST interval
    # arithmetic, geometry literal algebra, enum front door, zone
    # fold discipline, numeric scale algebra, interval field
    # fidelity)
    "pg_dst_interval_arith",
    "pg_geometry_literals",
    "pg_enum_ops",
    "pg_zone_fold_discipline",
    "pg_numeric_scale_algebra",
    "pg_interval_field_fidelity",
    # freshness rotation (VERDICT r07 Next #3): the 24 rows whose
    # latest driver check is still round 2 ...
    "trgm_similarity",
    "trgm_neardup_pairs",
    "fuzzy_match_funcs",
    "fuzzy_phonetic",
    "unaccent_citext",
    "orafce_funcs",
    "earth_distance_funcs",
    "pgcrypto_digest",
    "hstore_funcs",
    "ltree_funcs",
    "connectby_tree",
    "intarray_ops",
    "pg_array_slice",
    "inet6_funcs",
    "pg_int_division",
    "pg_json_arrows",
    "pg_recursive_series",
    "pg_to_char_patterns",
    "geometry_ops",
    "money_type_funcs",
    "xml_funcs",
    "pg_array_dow_syntax",
    "pg_to_char_numeric",
    "misc_type_funcs",
    # ... then the round-3-era rows (floor moves to r04 as the
    # driver's ~50-row sample walks this head)
    "embed_neardup_clusters",
    "pg_lateral_subquery",
    "pg_jsonb_ops",
    "pg_jsonb_funcs",
    "pg_overlaps_predicate",
    "pg_at_time_zone",
    "pg_multidim_arrays",
    "text_chunk_documents",
    "datapipe_pack_manifest",
    "datapipe_shuffle_shards",
    "vocab_pair_counts",
    "linregr_multi",
    "text_bpe_encode",
    "graph_pagerank",
    "kmeans_lloyd",
    "text_nb_langid",
    "approx_percentile_sketch",
    "fulltext_tfidf_rank",
    "dedup_best_representative",
    "events_funnel",
    "events_retention_cohorts",
    "logregr_irls",
    "plpgsql_function",
    "plpgsql_control_flow",
    "pgcrypto_hmac",
    "fuzzy_metaphone",
    "tablefunc_crosstab",
    "text_lm_quality",
    "datapipe_domain_mix",
    "embed_ann_topk_blocked",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "embed_ann_lsh",
    "embed_ann_ivf_flat",
    "text_url_canonical_dedup",
    "text_langid_heuristic",
    "multimodal_byte_stats",
    "distinct_ordered_aggs",
    "window_frame_exclude_groups",
    "join_notin_nullaware",
    "setop_intersect_all",
    "values_scan",
    "recursive_cte_series",
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
