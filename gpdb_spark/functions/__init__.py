from gpdb_spark.functions.pg import (
    pg_asc,
    pg_desc,
    int_div,
    string_agg,
    array_agg_ordered,
    generate_series,
    to_char,
)

__all__ = [
    "pg_asc",
    "pg_desc",
    "int_div",
    "string_agg",
    "array_agg_ordered",
    "generate_series",
    "to_char",
]
