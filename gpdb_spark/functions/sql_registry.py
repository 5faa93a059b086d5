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


def _specs():
    """(name, [(param, sqltype)...], builder, probe_sql, expected)."""
    from gpdb_spark.functions import misc_types as M
    from gpdb_spark.functions.earth import (
        EARTH_RADIUS_M,
        EARTH_RADIUS_MILES,
        haversine,
    )
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
            lambda: haversine(
                c("lat1"), c("lon1"), c("lat2"), c("lon2"), EARTH_RADIUS_M
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
            lambda: haversine(
                c("lat1"), c("lon1"), c("lat2"), c("lon2"), EARTH_RADIUS_MILES
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
        import re as _re

        def _probe_expr(p: str) -> str:
            m = _re.match(r"(?is)^\s*SELECT\s+(.*)$", p)
            if not m:  # malformed spec: keep it probing standalone
                raise ValueError(f"probe must start with SELECT: {p!r}")
            return m.group(1)

        try:
            cols = ", ".join(
                f"({_probe_expr(p)}) AS c{i}"
                for i, (_, p, _) in enumerate(created)
            )
        except ValueError:
            cols = None
        try:
            if cols is None:
                raise ValueError("per-function probe fallback")
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
        from gpdb_spark.functions.crypt_md5 import crypt_batch_udf

        spark.udf.register("crypt", crypt_batch_udf())
        registered.append("crypt")
    except Exception:
        skipped.append("crypt")
    try:
        from gpdb_spark.functions.metaphone import metaphone

        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def _metaphone(w: pd.Series, n: pd.Series) -> pd.Series:
            # PG rejects max_length < 1 with an error (metaphone.c
            # checks the arg); raising aborts the query, same as PG
            out = []
            for word, k in zip(w, n):
                if word is None or k is None:
                    out.append(None)
                    continue
                if int(k) < 1:
                    raise ValueError(
                        "metaphone: output length must be > 0"
                    )
                out.append(metaphone(word, int(k)))
            return pd.Series(out)

        spark.udf.register("metaphone", _metaphone)
        registered.append("metaphone")
    except Exception:
        skipped.append("metaphone")

    try:
        # gen_salt('md5') completes the crypt idiom in SQL. PG's
        # px_gen_salt draws from strong random per CALL — a SQL-UDF
        # rand() body would freeze its seed at registration and repeat
        # within a row, so this one is a Python UDF over secrets
        # (salt generation is rare; the slow path is irrelevant).
        from gpdb_spark.functions.crypt_md5 import _ITOA64

        def _gen_salt(scheme):
            if scheme is None:
                return None  # STRICT, like pgcrypto's gen_salt
            if scheme.lower() != "md5":
                raise ValueError(
                    f"gen_salt: unsupported type {scheme!r} "
                    "(md5-crypt is the implemented scheme)"
                )
            import secrets

            body = secrets.token_bytes(8)
            return "$1$" + "".join(_ITOA64[b & 0x3F] for b in body)

        # VOLATILE like PG's declaration: without asNondeterministic,
        # Catalyst dedups identical gen_salt calls into ONE evaluation
        # (two columns get the same salt) and may re-evaluate across a
        # projection/filter split with different results — silently
        # breaking the stored-hash verify idiom (review finding)
        spark.udf.register(
            "gen_salt",
            F.udf(_gen_salt, "string").asNondeterministic(),
        )
        registered.append("gen_salt")
    except Exception:
        skipped.append("gen_salt")

    result = {"registered": registered, "skipped": skipped}
    spark._gp_sql_functions = result
    return result
