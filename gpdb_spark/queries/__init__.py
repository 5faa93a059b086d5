"""Importing this package populates gpdb_spark.registry.QUERIES / ORACLE."""

from gpdb_spark.queries import (  # noqa: F401
    tpch,
    olap_group,
    olap_window,
    relational,
    scalar_funcs,
    events,
    datapipe_text,
    datapipe_dedup,
    datapipe_embed,
    programmability,
    fulltext,
    reshape_types,
    dialect_queries,
    contrib_text,
    contrib_funcs,
    contrib_types,
    datapipe_chunk,
    datapipe_bpe,
    datapipe_nb,
    ml,
)
