"""SQL-front-door queries: PostgreSQL-dialect text through
gpdb_spark.dialect.pg_sql on the Spark side; the SAME PG text is the
DuckDB oracle (DuckDB speaks the PG dialect), so these check the whole
translate->execute pipeline end-to-end (the reference's gram.y ->
executor path, SURVEY.md §3.1).
"""

from __future__ import annotations

from gpdb_spark.registry import ORACLE, QUERIES


def _pg_query(name: str, sql: str, oracle: str | None = None) -> None:
    def run(spark, sf_dir, _sql=sql):
        from gpdb_spark.dialect import pg_sql

        return pg_sql(spark, _sql, sf_dir)

    QUERIES[name] = run
    ORACLE[name] = " ".join((oracle or sql).split())


_pg_query(
    "pg_casts_and_regex",
    """
    SELECT c_custkey::int8 AS k,
           c_acctbal::numeric(12,2) AS bal,
           (c_name ~ '.*00[0-9]2.*') AS name_match
    FROM customer
    WHERE c_mktsegment ~* 'building' OR c_custkey::int4 < 10
    """,
    # DuckDB has no ~* operator; (?i) inline flag is the equivalent
    oracle="""
    SELECT c_custkey::int8 AS k,
           c_acctbal::numeric(12,2) AS bal,
           (c_name ~ '.*00[0-9]2.*') AS name_match
    FROM customer
    WHERE c_mktsegment ~ '(?i)building' OR c_custkey::int4 < 10
    """,
)

_pg_query(
    "pg_order_nulls_limit",
    """
    SELECT nullif(n_regionkey, 2) AS rk, n_name
    FROM nation
    ORDER BY rk, n_name
    LIMIT 7
    """,
)

_pg_query(
    "pg_generate_series_lateral",
    """
    SELECT r.r_regionkey, g.n, r.r_regionkey * g.n AS product
    FROM region r, generate_series(1, 4) AS g(n)
    WHERE g.n <= r.r_regionkey + 1
    """,
)

_pg_query(
    "pg_string_agg_window",
    """
    SELECT n_regionkey,
           string_agg(n_name, '|' ORDER BY n_name) AS names,
           count(*)::int8 AS n
    FROM nation
    GROUP BY n_regionkey
    """,
)

_pg_query(
    "pg_quoted_idents_case",
    """
    SELECT n_name AS "Nation Name",
           CASE WHEN n_regionkey::int4 % 2 = 0 THEN 'even' ELSE 'odd' END
               AS "parity"
    FROM nation
    WHERE n_name !~ '^Z'
    """,
)


_pg_query(
    "pg_filter_distinct_on_combo",
    """
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F')::int8 AS n_done,
           max(o_totalprice)::numeric(14,2) AS top_price
    FROM orders
    WHERE o_orderdate >= '1996-01-01'::timestamp
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
