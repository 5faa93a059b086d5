"""SQL-callable registrations of the contrib function packs.

A reference user's SQL scripts call ``unaccent(...)``, ``soundex(...)``,
``crypt(...)`` etc. as FUNCTIONS IN SQL TEXT — until round 5 those were
Python-Column-API-only here, so ``Engine.sql("SELECT unaccent(t) ...")``
failed with UNRESOLVED_ROUTINE. This module closes the front door gap:

- Expression-backed functions register as Spark **SQL UDFs**
  (``CREATE TEMPORARY FUNCTION name(args) RETURN <expr>``): the body is
  obtained by building the existing Column implementation against the
  parameter names and serializing the ANALYZED expression back to SQL,
  so there is exactly ONE implementation — the SQL surface cannot drift
  from the Python API — and calls stay in Catalyst/codegen (no Python).
- Functions whose Column form cannot serialize (higher-order lambdas
  print as ``namedlambdavariable()`` which does not re-parse; struct
  literals drop field aliases) or that are inherently Python (crypt's
  key-stretching pandas UDF, the metaphone rule automaton) register as
  Python UDFs — SQL-callable, documented slow path, still Arrow-batched
  where the implementation already was.

Each registration is attempt-and-verify: CREATE + a golden probe SELECT
compared to the expected value; a failed probe drops the function and
records the name in the returned ``skipped`` list instead of breaking
the session. Registered once per SparkSession (Engine calls this).

Reference: contrib/unaccent, contrib/fuzzystrmatch (fuzzystrmatch.c
_soundex:73 — the PG table variant, NOT Spark's builtin refined
American soundex, which this registration deliberately shadows inside
the engine session), contrib/earthdistance (earthdistance.c:106
geo_distance in statute miles; earth_distance meters on earth() =
6378168), contrib/pgcrypto (crypt), uuid-ossp (uuid_generate_v3 md5
form), PG core inet accessors (network.c) and pg_size_pretty
(dbsize.c).
"""

from __future__ import annotations

import pandas as pd  # module-level on purpose: pandas_udf resolves the
# stringified (future-annotations) type hints of the crypt UDF in THIS
# module's globals — a function-local import raises NameError there

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def _body_sql(df: DataFrame, col: Column) -> str:
    """Serialize a Column built over df's columns to parseable SQL via
    the analyzed plan (alias stripped)."""
    return (
        df.select(col.alias("__o"))
        ._jdf.queryExecution()
        .analyzed()
        .expressions()
        .apply(0)
        .children()
        .apply(0)
        .sql()
    )


def _haversine(lat1, lon1, lat2, lon2, radius: float) -> Column:
    """Great-circle distance (same formula as earth_distance_funcs)."""
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    h = F.pow(F.sin(dlat), 2) + (
        F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(F.sin(dlon), 2)
    )
    return 2.0 * radius * F.asin(F.least(F.lit(1.0), F.sqrt(h)))


def _specs():
    """(name, [(param, sqltype)...], builder, probe_sql, expected)."""
    from gpdb_spark.functions import misc_types as M
    from gpdb_spark.functions.fuzzy import difference, soundex
    from gpdb_spark.functions.unaccent import unaccent

    c = F.col
    return [
        (
            "unaccent",
            [("t", "STRING")],
            lambda: unaccent(c("t")),
            "SELECT unaccent('Héllo Café à ß')",
            "Hello Cafe a S",
        ),
        (
            # Spark refuses to shadow its builtin soundex with a SQL
            # UDF (CANNOT_REPLACE_NON_SQL_UDF_WITH_SQL_UDF), so the PG
            # table variant registers as pg_soundex and the dialect
            # rewrites PG SQL's soundex(...) calls to it.
            "pg_soundex",
            [("t", "STRING")],
            lambda: soundex(c("t")),
            "SELECT pg_soundex('Ashcraft')",
            "A226",
        ),
        (
            "difference",
            [("a", "STRING"), ("b", "STRING")],
            lambda: difference(c("a"), c("b")),
            "SELECT difference('Anne', 'Ann')",
            4,
        ),
        (
            # fuzzystrmatch levenshtein_less_equal(a, b, k): PG returns
            # the real distance when <= k, else "some value > k" — the
            # documented contract callers rely on is only the <= k
            # comparison, which Spark's bounded 3-arg levenshtein (-1
            # past the threshold) satisfies after mapping -1 to k+1.
            # Raw SQL body: the Python API requires a foldable
            # threshold, but the SQL builtin takes the k parameter.
            "levenshtein_less_equal",
            [("a", "STRING"), ("b", "STRING"), ("k", "INT")],
            "CASE WHEN levenshtein(a, b, k) < 0 THEN k + 1 "
            "ELSE levenshtein(a, b, k) END",
            "SELECT levenshtein_less_equal('kitten', 'sitting', 2)",
            3,
        ),
        (
            "pg_size_pretty",
            [("sz", "BIGINT")],
            lambda: M.pg_size_pretty(c("sz")),
            "SELECT pg_size_pretty(CAST(3170893824 AS BIGINT))",
            "3024 MB",
        ),
        (
            "masklen",
            [("i", "STRING")],
            lambda: M.inet_masklen(c("i")),
            "SELECT masklen('192.168.1.5/24')",
            24,
        ),
        (
            "host",
            [("i", "STRING")],
            lambda: M.inet_host(c("i")),
            "SELECT host('192.168.1.5/24')",
            "192.168.1.5",
        ),
        (
            "network",
            [("i", "STRING")],
            lambda: M.inet_network(c("i")),
            "SELECT network('192.168.1.5/24')",
            "192.168.1.0/24",
        ),
        (
            "broadcast",
            [("i", "STRING")],
            lambda: M.inet_broadcast(c("i")),
            "SELECT broadcast('192.168.1.5/24')",
            "192.168.1.255/24",
        ),
        (
            "uuid_generate_v3",
            [("name", "STRING")],
            lambda: M.uuid_v3(c("name")),
            "SELECT substr(uuid_generate_v3('x'), 15, 1)",
            "3",  # version nibble
        ),
        (
            "earth_distance",
            [
                ("lat1", "DOUBLE"),
                ("lon1", "DOUBLE"),
                ("lat2", "DOUBLE"),
                ("lon2", "DOUBLE"),
            ],
            lambda: _haversine(
                c("lat1"), c("lon1"), c("lat2"), c("lon2"), 6378168.0
            ),
            "SELECT CAST(earth_distance(0.0, 0.0, 0.0, 0.0) AS BIGINT)",
            0,
        ),
        (
            "geo_distance",
            [
                ("lat1", "DOUBLE"),
                ("lon1", "DOUBLE"),
                ("lat2", "DOUBLE"),
                ("lon2", "DOUBLE"),
            ],
            lambda: _haversine(
                c("lat1"), c("lon1"), c("lat2"), c("lon2"), 3958.747716
            ),
            "SELECT CAST(geo_distance(30.0, -90.0, 30.0, -90.0) AS BIGINT)",
            0,
        ),
    ]


def register_pg_functions(spark: SparkSession) -> dict:
    """Register the SQL-callable contrib surface on this session.
    Idempotent per session; returns {'registered': [...], 'skipped':
    [...]} (skipped = body did not survive the serialize/probe
    round-trip on this Spark version — the Python Column API remains
    the supported form for those)."""
    done = getattr(spark, "_gp_sql_functions", None)
    if done is not None:
        return done

    registered: list[str] = []
    skipped: list[str] = []
    created: list[tuple[str, str, object]] = []  # (name, probe, want)
    for name, params, build, probe, want in _specs():
        sig = ", ".join(f"{p} {t}" for p, t in params)
        try:
            if isinstance(build, str):
                body = build  # raw SQL body (builtin-only composition)
            else:
                df = spark.createDataFrame([], sig)
                body = _body_sql(df, build())
            spark.sql(
                f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({sig}) "
                f"RETURN {body}"
            )
            created.append((name, probe, want))
        except Exception:
            try:
                spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {name}")
            except Exception:
                pass
            skipped.append(name)
    # ONE batched probe job for every created function (a per-function
    # probe would cost a Spark job each on the first front-door call)
    if created:
        cols = ", ".join(
            f"({p.split('SELECT ', 1)[1]}) AS c{i}"
            for i, (_, p, _) in enumerate(created)
        )
        try:
            row = list(spark.sql(f"SELECT {cols}").collect()[0])
        except Exception:
            # one bad body poisons the batch — fall back to per-function
            # probes so the rest still register
            row = []
            for name, probe, want in created:
                try:
                    row.append(spark.sql(probe).collect()[0][0])
                except Exception:
                    row.append(object())  # never equals want
        for i, (name, _, want) in enumerate(created):
            if row[i] == want:
                registered.append(name)
            else:
                try:
                    spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {name}")
                except Exception:
                    pass
                skipped.append(name)

    # inherently-Python surfaces: SQL-callable via Python UDF (crypt is
    # per-row CPU by its key-stretching contract and was already a
    # pandas UDF; metaphone is the rule automaton, row-at-a-time)
    try:
        from gpdb_spark.functions.crypt_md5 import md5_crypt

        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def _crypt(pw: pd.Series, salt: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    None if p is None or s is None else md5_crypt(p, s)
                    for p, s in zip(pw, salt)
                ]
            )

        spark.udf.register("crypt", _crypt)
        registered.append("crypt")
    except Exception:
        skipped.append("crypt")
    try:
        from gpdb_spark.functions.metaphone import metaphone

        spark.udf.register(
            "metaphone",
            lambda w, n: None if w is None else metaphone(w, n or 4),
            "string",
        )
        registered.append("metaphone")
    except Exception:
        skipped.append("metaphone")

    result = {"registered": registered, "skipped": skipped}
    spark._gp_sql_functions = result
    return result
