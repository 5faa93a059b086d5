"""Programmability surface (SURVEY.md §2.10): table functions with
SCATTER BY, user-defined aggregates, Arrow-batched UDFs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from gpdb_spark.registry import query, t


@query(
    "table_function_scatter",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CASE WHEN mx = mn THEN 0.5
                ELSE floor((o_totalprice - mn) / (mx - mn) * 1e6) / 1e6
                END AS scaled
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               min(o_totalprice) OVER (PARTITION BY o_custkey) AS mn,
               max(o_totalprice) OVER (PARTITION BY o_custkey) AS mx
        FROM orders
    ) x
    """,
)
def table_function_scatter(spark, sf_dir):
    """Enhanced table function over table input with SCATTER BY
    (nodeTableFunction.c:278, gram.y:14056): per-customer min-max
    scaling. SCATTER BY o_custkey hash-partitions the input so every
    customer lands whole in one partition; the function then sees Arrow
    batches of its scattered slice and vectorizes the per-group min/max
    with one pandas groupby-transform per BATCH — not one pandas frame
    per group, which the round-5 timing audit measured at 22 s for the
    ~10k tiny customer groups at sf0.1 (per-group applyInPandas
    overhead dominates when groups are small; the batch form is 4x
    faster and is the shape that survives a 100 TB key count).

    min/max are exact (no summation), so the pandas arithmetic is
    IEEE-identical to the oracle's window SQL."""
    import numpy as np

    from gpdb_spark.operators.table_function import table_function

    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")

    def scale(batches):
        # The function must see its COMPLETE scattered slice before the
        # per-group stats (nodeTableFunction's contract: one QE consumes
        # its whole scattered input) — Arrow hands the partition as
        # ~10k-row batches and a customer can span batch boundaries, so
        # concatenate first. Memory bound = one partition, the same
        # contract the reference QE has with its slice.
        pdfs = [p for p in batches if not p.empty]
        if not pdfs:
            return
        pdf = pd.concat(pdfs) if len(pdfs) > 1 else pdfs[0]
        g = pdf.groupby("o_custkey").o_totalprice
        mn, mx = g.transform("min"), g.transform("max")
        rng = (mx - mn).to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            scaled = np.where(
                rng == 0.0,
                0.5,
                np.floor(
                    (pdf.o_totalprice.to_numpy() - mn.to_numpy())
                    / rng * 1e6
                ) / 1e6,
            )
        yield pd.DataFrame(
            {
                "o_custkey": pdf.o_custkey,
                "o_orderkey": pdf.o_orderkey,
                "scaled": scaled,
            }
        )

    return table_function(
        o,
        scale,
        "o_custkey long, o_orderkey long, scaled double",
        scatter_by=["o_custkey"],
    )


@query(
    "udaf_grouped_agg",
    oracle="""
    SELECT c_mktsegment,
           round(max(c_acctbal) - min(c_acctbal), 6) AS bal_range,
           count(*) AS n
    FROM customer GROUP BY c_mktsegment
    """,
)
def udaf_grouped_agg(spark, sf_dir):
    """CREATE AGGREGATE analog (pg_aggregate.h transition/combine fns):
    a pandas GROUPED_AGG UDAF. The function must be algebraic
    (combine-safe) exactly like aggcombinefn demands; range = max-min is
    exact under any partial/final split."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def bal_range(v: pd.Series) -> float:
        return float(v.max() - v.min())

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        # Spark forbids mixing GROUPED_AGG pandas UDFs with built-in
        # aggregates in one agg(), so count(*) is also a pandas UDAF here.
        return int(len(v))

    c = t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.round(bal_range("c_acctbal"), 6).alias("bal_range"),
        n_rows("c_custkey").alias("n"),
    )


@query(
    "udtf_function_scan",
    oracle="""
    SELECT n_nationkey, g.n AS n, g.n * g.n AS sq
    FROM nation,
         (SELECT unnest(generate_series(1, 3)) AS n) g
    WHERE g.n <= n_nationkey + 1
    """,
)
def udtf_function_scan(spark, sf_dir):
    """FunctionScan / set-returning function in FROM (nodeFunctionscan.c:378)
    via a Spark 4 Python UDTF in a LATERAL join — each input row fans out
    into a variable-length series (RETURNS SETOF analog)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="n: int, sq: int")
    class Series:
        def eval(self, start: int, stop: int):
            for n in range(start, stop + 1):
                yield (n, n * n)

    spark.udtf.register("gp_series_udtf", Series)
    nation = t(spark, sf_dir, "nation")
    nation.createOrReplaceTempView("_udtf_nation")
    return spark.sql(
        """
        SELECT v.n_nationkey, s.n, s.sq
        FROM _udtf_nation v,
             LATERAL gp_series_udtf(
                 1, CAST(least(v.n_nationkey + 1, 3) AS INT)) s
        """
    )


@query(
    "mapinpandas_filter",
    oracle="""
    SELECT doc_id, n_chars FROM documents
    WHERE n_chars % 2 = 0 AND lang = 'en'
    """,
)
def mapinpandas_filter(spark, sf_dir):
    """mapInPandas over scattered input (SCATTER RANDOMLY) — the
    streaming-batch ETL shape: arbitrary per-batch python, Arrow transfer,
    schema-stable output."""
    from gpdb_spark.operators.table_function import table_function

    d = t(spark, sf_dir, "documents").select("doc_id", "n_chars", "lang")

    def keep_even_en(batches):
        for pdf in batches:
            out = pdf[(pdf.n_chars % 2 == 0) & (pdf.lang == "en")]
            yield out[["doc_id", "n_chars"]]

    return table_function(
        d, keep_even_en, "doc_id long, n_chars long", num_partitions=8
    )


@query(
    "mapreduce_pipeline",
    oracle="""
    WITH mapped AS (
        SELECT lang, n_chars // 100 AS bucket FROM documents
        WHERE n_chars >= 200
    )
    SELECT lang, bucket, count(*) AS count_bucket
    FROM mapped GROUP BY lang, bucket
    """,
)
def mapreduce_pipeline(spark, sf_dir):
    """gpMapReduce-style declarative pipeline (gpcontrib/gpmapreduce):
    MAP = python row transform (mapInPandas), REDUCE = builtin COUNT by
    key (JVM groupBy). The MAP stage's integer division matches PG/DuckDB
    semantics via floor-div on non-negative ints."""
    from gpdb_spark.operators.mapreduce import run_mapreduce

    d = t(spark, sf_dir, "documents").select("lang", "n_chars")

    def map_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        keep = pdf[pdf.n_chars >= 200]
        return pd.DataFrame(
            {"lang": keep.lang, "bucket": keep.n_chars // 100}
        )

    return run_mapreduce(
        d,
        {
            "map": {"fn": map_fn, "schema": "lang string, bucket long"},
            "reduce": {"keys": ["lang", "bucket"], "builtin": {"bucket": "count"}},
        },
    )


@query(
    "external_program_scan",
    # each of the 4 "segments" emits its own shard of 0..39 — the
    # command-pipe external source (url_execute.c; EXECUTE external
    # tables). DuckDB oracle: the same series from generate_series.
    oracle="""
    SELECT unnest(generate_series(0, 39)) AS n,
           unnest(generate_series(0, 39)) % 4 AS seg
    """,
)
def external_program_scan(spark, sf_dir):
    """CREATE EXTERNAL TABLE ... EXECUTE 'cmd': the command runs once per
    segment executor-side with GP_SEGMENT_ID set, emitting its shard
    (operators/external.py read_external_program; reference
    src/backend/access/external/url_execute.c)."""
    from pyspark.sql.types import LongType, StructField, StructType

    from gpdb_spark.operators.external import read_external_program

    schema = StructType(
        [StructField("n", LongType()), StructField("seg", LongType())]
    )
    cmd = (
        'i=$GP_SEGMENT_ID; while [ $i -le 39 ]; '
        'do echo "$i,$GP_SEGMENT_ID"; i=$((i+4)); done'
    )
    return read_external_program(spark, cmd, schema, n_segments=4).good


@query(
    "foreign_scan_fdw",
    # oracle sees the same nation rows directly (the FDW round-trips
    # them through the foreign server without loss)
    oracle="""
    SELECT r.r_name, count(*) AS n_nations,
           CAST(sum(n.n_nationkey) AS BIGINT) AS key_sum
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE n.n_nationkey >= 5 AND n.n_name LIKE '%A%'
    GROUP BY r.r_name
    """,
)
def foreign_scan_fdw(spark, sf_dir):
    """ForeignScan through a real FDW: nation is served from a *foreign*
    SQLite database via the Spark 4 Python Data Source API with
    postgres_fdw-style remote filter pushdown (>=, LIKE-contains are
    deparsed to the remote WHERE), then joined to the local parquet
    region table (reference: ExecForeignScan nodeForeignscan.c:89,
    contrib/postgres_fdw deparse.c)."""
    import os
    import tempfile

    from gpdb_spark.operators.foreign import (
        create_sqlite_table,
        read_foreign_table,
    )

    # materialize the 25-row nation table as the "remote server" side —
    # bounded driver work, fixture-scale only (a real deployment points
    # at an existing foreign database instead)
    rows = [
        r.asDict()
        for r in t(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .collect()
    ]
    db = os.path.join(tempfile.mkdtemp(prefix="gpdb_fdw_"), "remote.db")
    create_sqlite_table(db, "nation", rows)

    n = read_foreign_table(spark, db, "nation", num_partitions=2).where(
        (F.col("n_nationkey") >= 5) & F.col("n_name").contains("A")
    )
    r = t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.sum("n_nationkey").alias("key_sum"),
        )
    )


@query(
    "gp_skew_report",
    # identical md5-bucket + exact-integer-moments formulation in SQL
    oracle="""
    WITH seg AS (
        SELECT CAST(CAST(concat('0x', substr(md5(CAST(l_suppkey AS VARCHAR)), 1, 8))
                    AS BIGINT) % 32 AS INT) AS segment,
               count(*) AS n
        FROM lineitem GROUP BY 1
    ), s AS (
        SELECT CAST(sum(n) AS BIGINT) AS total_rows,
               count(*) AS segments_used,
               CAST(min(n) AS BIGINT) AS min_rows,
               CAST(max(n) AS BIGINT) AS max_rows,
               CAST(sum(n * n) AS BIGINT) AS ss
        FROM seg
    )
    SELECT total_rows, segments_used, min_rows, max_rows,
           (floor(100.0 * sqrt(CAST(ss AS DOUBLE) / segments_used
                 - (CAST(total_rows AS DOUBLE) / segments_used)
                   * (CAST(total_rows AS DOUBLE) / segments_used))
                 / (CAST(total_rows AS DOUBLE) / segments_used) * 1e4) / 1e4)
             AS skcoeff,
           (floor((1.0 - (CAST(total_rows AS DOUBLE) / segments_used)
                 / max_rows) * 1e4) / 1e4) AS siffraction
    FROM s
    """,
)
def gp_skew_report(spark, sf_dir):
    """gp_toolkit.gp_skew_coefficients / gp_skew_idle_fractions: per-
    segment row-count skew for a DISTRIBUTED BY (l_suppkey) layout —
    CV percent + idle fraction, from exact integer moments
    (plans/gp_toolkit.py)."""
    from gpdb_spark.plans.gp_toolkit import skew_report

    li = t(spark, sf_dir, "lineitem")
    return skew_report(li, ["l_suppkey"], n_segments=32)


@query(
    "plpgsql_function",
    oracle="""
    SELECT o_custkey,
           count(*) AS cnt,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))), 2) AS DOUBLE)
               AS total_price
    FROM orders
    WHERE o_totalprice < 200000.0
    GROUP BY o_custkey
    HAVING count(*) >= 1
    ORDER BY cnt DESC, o_custkey
    LIMIT 50
    """,
)
def plpgsql_function(spark, sf_dir):
    """PL/pgSQL set-returning function (src/pl/plpgsql/src/pl_exec.c
    plpgsql_exec_function; pl_gram.y): DECLARE + IF + RETURN QUERY, with
    arguments substituted as planner parameters. Control flow runs on
    the driver (the reference's coordinator-only interpreter); the
    RETURN QUERY statement executes distributed through the engine's
    SQL front door. min_orders=0 exercises the IF raising the threshold
    to 1 — the oracle inlines the post-branch value."""
    from gpdb_spark.engine import Engine

    eng = Engine(spark, sf_dir)
    eng.create_function("""
    CREATE FUNCTION big_customers(min_orders int, price_cap double precision)
    RETURNS TABLE(o_custkey bigint, cnt bigint, total_price double precision) AS $fn$
    DECLARE
      threshold int := min_orders;
    BEGIN
      IF threshold < 1 THEN
        threshold := 1;
      END IF;
      RETURN QUERY
        SELECT o_custkey, count(*) AS cnt,
               CAST(round(sum(CAST(o_totalprice AS decimal(25,6))), 2)
                    AS double precision) AS total_price
        FROM orders
        WHERE o_totalprice < price_cap
        GROUP BY o_custkey
        HAVING count(*) >= threshold
        ORDER BY cnt DESC, o_custkey
        LIMIT 50;
    END;
    $fn$ LANGUAGE plpgsql""")
    return eng.call("big_customers", 0, 200000.0)


@query(
    "plpgsql_control_flow",
    oracle="""
    SELECT n_name, n_regionkey,
           (SELECT CAST(sum(n_regionkey) AS BIGINT) FROM nation) AS region_sum,
           CAST(233 AS BIGINT) AS fib13
    FROM nation
    ORDER BY n_name
    """,
)
def plpgsql_control_flow(spark, sf_dir):
    """PL/pgSQL control flow (pl_exec.c exec_stmt_while /
    exec_stmt_fors / exec_stmt_assign): a WHILE loop computes F(13)=233
    driver-side on the arithmetic fast path (no Spark job per
    iteration), a FOR-IN-query loop streams a distributed aggregate's
    rows with toLocalIterator (exec_stmt_fors' coordinator cursor), and
    the final RETURN QUERY inlines both accumulators as constants —
    which the DuckDB oracle recomputes in SQL."""
    from gpdb_spark.engine import Engine

    eng = Engine(spark, sf_dir)
    eng.create_function("""
    CREATE FUNCTION nation_flow()
    RETURNS TABLE(n_name text, n_regionkey bigint, region_sum bigint, fib13 bigint) AS $fn$
    DECLARE
      total bigint := 0;
      i int := 1;
      fib_a bigint := 0;
      fib_b bigint := 1;
      tmp bigint;
      rec record;
    BEGIN
      WHILE i <= 12 LOOP
        tmp := fib_a + fib_b;
        fib_a := fib_b;
        fib_b := tmp;
        i := i + 1;
      END LOOP;
      FOR rec IN SELECT n_regionkey FROM nation LOOP
        total := total + rec.n_regionkey;
      END LOOP;
      RETURN QUERY
        SELECT n_name, CAST(n_regionkey AS bigint) AS n_regionkey,
               CAST(total AS bigint) AS region_sum,
               CAST(fib_b AS bigint) AS fib13
        FROM nation ORDER BY n_name;
    END;
    $fn$ LANGUAGE plpgsql""")
    return eng.call("nation_flow")


@query(
    "plpgsql_case_foreach",
    # fizzbuzz via searched CASE, a simple CASE region label, and a
    # FOREACH sum over an int array — the oracle re-derives all three
    # declaratively
    oracle="""
    SELECT n_nationkey,
           CASE WHEN n_nationkey % 15 = 0 THEN 'fizzbuzz'
                WHEN n_nationkey % 3 = 0 THEN 'fizz'
                WHEN n_nationkey % 5 = 0 THEN 'buzz'
                ELSE CAST(n_nationkey AS VARCHAR) END AS label,
           CASE WHEN n_regionkey IN (0, 1) THEN 'americas-ish'
                WHEN n_regionkey IN (2, 3) THEN 'eurasia-ish'
                ELSE 'other' END AS zone,
           CAST(10 + 20 + 30 AS BIGINT) AS arr_sum
    FROM nation
    ORDER BY n_nationkey
    """,
)
def plpgsql_case_foreach(spark, sf_dir):
    """PL/pgSQL CASE statement (searched + simple forms,
    pl_exec.c:113 exec_stmt_case) and FOREACH-over-array
    (pl_exec.c:125 exec_stmt_foreach_a) — round 3's last documented
    interpreter gaps. The searched CASE runs per row inside a
    FOR-IN-query loop on the driver's arithmetic fast path; the simple
    CASE exercises the comma-list membership rewrite; FOREACH folds a
    literal array. RETURN NEXT accumulates the rows (the function's
    tuplestore)."""
    from gpdb_spark.engine import Engine

    eng = Engine(spark, sf_dir)
    eng.create_function("""
    CREATE FUNCTION case_foreach_demo()
    RETURNS TABLE(n_nationkey int, label text, zone text, arr_sum bigint) AS $fn$
    DECLARE
      total bigint := 0;
      x int;
      lbl text;
      zn text;
      rec record;
    BEGIN
      FOREACH x IN ARRAY ARRAY[10, 20, 30] LOOP
        total := total + x;
      END LOOP;
      FOR rec IN SELECT n_nationkey, n_regionkey FROM nation ORDER BY n_nationkey LOOP
        CASE
          WHEN rec.n_nationkey % 15 = 0 THEN lbl := 'fizzbuzz';
          WHEN rec.n_nationkey % 3 = 0 THEN lbl := 'fizz';
          WHEN rec.n_nationkey % 5 = 0 THEN lbl := 'buzz';
          ELSE lbl := rec.n_nationkey::text;
        END CASE;
        CASE rec.n_regionkey
          WHEN 0, 1 THEN zn := 'americas-ish';
          WHEN 2, 3 THEN zn := 'eurasia-ish';
          ELSE zn := 'other';
        END CASE;
        RETURN NEXT (rec.n_nationkey, lbl, zn, total);
      END LOOP;
    END;
    $fn$ LANGUAGE plpgsql""")
    return eng.call("case_foreach_demo")


_WORDCOUNT_YML = """
%YAML 1.1
---
VERSION:         1.0.0.1

DEFINE:
  - INPUT:
      NAME:      book
      TABLE:     documents
      COLUMNS:
        - "text AS value"

  - MAP:
      NAME:      wordsplit_python
      FUNCTION:  |
        for word in value.split():
          yield [word, 1]
      LANGUAGE:   python
      OPTIMIZE:   STRICT IMMUTABLE
      PARAMETERS: value text
      RETURNS:
        - key text
        - value integer

EXECUTE:
  - RUN:
      SOURCE:    book
      MAP:       wordsplit_python
      REDUCE:    SUM
"""


@query(
    "mapreduce_yaml",
    # python str.split() drops empties and splits on runs of any
    # whitespace — exactly list_filter(string_split_regex(.., '\\s+'))
    oracle="""
    SELECT w AS key, CAST(count(*) AS BIGINT) AS sum_value
    FROM (SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                                    x -> x <> '')) AS w
          FROM documents) t
    GROUP BY key
    """,
)
def mapreduce_yaml(spark, sf_dir):
    """gpMapReduce YAML front door (gpcontrib/gpmapreduce/demo/
    2_wordcount.yml): the reference's wordcount document — INPUT table,
    python MAP yielding (word, 1), builtin SUM reducer — parsed by
    operators/mapreduce_yaml.run_yaml and compiled onto the
    mapInPandas + JVM-groupBy pipeline of operators/mapreduce.py. The
    MAP is the Arrow-batched slow path by definition (user python); the
    reduce shuffle is a native 2-stage hash aggregate."""
    from gpdb_spark.operators.mapreduce_yaml import run_yaml

    return run_yaml(
        spark,
        _WORDCOUNT_YML,
        tables={"documents": t(spark, sf_dir, "documents")},
    )


@query(
    "plpgsql_cursor",
    oracle="""
    SELECT r_regionkey,
           (SELECT CAST(sum(n_nationkey) AS BIGINT) FROM nation n
            WHERE n.n_regionkey = r.r_regionkey) AS nation_sum,
           (SELECT CAST(count(*) AS BIGINT) FROM nation n
            WHERE n.n_regionkey = r.r_regionkey) AS n_fetched
    FROM region r ORDER BY r_regionkey
    """,
)
def plpgsql_cursor(spark, sf_dir):
    """PL/pgSQL cursors (pl_exec.c exec_stmt_open/_fetch/_close) —
    round 4 closes the interpreter's last deferred statement family: a
    bound parameterized cursor is OPENed once per region inside a
    FOR-IN-query loop, drained with FETCH..INTO under EXIT WHEN NOT
    FOUND, and CLOSEd; per-region sums and fetch counts accumulate via
    RETURN NEXT. Rows stream partition-at-a-time (toLocalIterator), so
    driver memory stays bounded no matter the cursor's result size."""
    from gpdb_spark.engine import Engine

    eng = Engine(spark, sf_dir)
    eng.create_function("""
    CREATE FUNCTION region_cursor_sums()
    RETURNS TABLE(r_regionkey bigint, nation_sum bigint, n_fetched bigint) AS $fn$
    DECLARE
      nc CURSOR (k int) FOR
        SELECT n_nationkey FROM nation WHERE n_regionkey = k
        ORDER BY n_nationkey;
      rec record;
      v bigint;
      total bigint;
      cnt bigint;
    BEGIN
      FOR rec IN SELECT r_regionkey FROM region ORDER BY r_regionkey LOOP
        total := 0;
        cnt := 0;
        OPEN nc(rec.r_regionkey);
        LOOP
          FETCH nc INTO v;
          EXIT WHEN NOT found;
          total := total + v;
          cnt := cnt + 1;
        END LOOP;
        CLOSE nc;
        RETURN NEXT (rec.r_regionkey, total, cnt);
      END LOOP;
    END;
    $fn$ LANGUAGE plpgsql""")
    return eng.call("region_cursor_sums")


@query(
    "plpgsql_forc_move",
    oracle="""
    SELECT r.r_regionkey AS rk,
           (SELECT n_name FROM nation n WHERE n.n_regionkey = r.r_regionkey
            ORDER BY n_nationkey LIMIT 1) AS first_name,
           (SELECT n_name FROM nation n WHERE n.n_regionkey = r.r_regionkey
            ORDER BY n_nationkey LIMIT 1 OFFSET 1) AS second_name,
           (SELECT CAST(count(*) AS BIGINT) FROM nation n
            WHERE n.n_regionkey = r.r_regionkey) AS n_nations
    FROM region r ORDER BY r_regionkey
    """,
)
def plpgsql_forc_move(spark, sf_dir):
    """PL/pgSQL FOR-over-cursor + MOVE (pl_exec.c exec_stmt_forc;
    exec_stmt_fetch is_move) — the interpreter's last deferred cursor
    forms: a bound parameterized cursor drives a FOR rec IN cur(args)
    loop (opened and auto-closed by the loop), and a second pass OPENs
    it, MOVEs past the first row, FETCHes the second. Streaming stays
    partition-at-a-time on the coordinator."""
    from gpdb_spark.engine import Engine

    eng = Engine(spark, sf_dir)
    eng.create_function("""
    CREATE FUNCTION forc_move_demo()
    RETURNS TABLE(rk bigint, first_name text, second_name text,
                  n_nations bigint) AS $fn$
    DECLARE
      nc CURSOR (k int) FOR
        SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = k
        ORDER BY n_nationkey;
      reg record;
      rec record;
      cnt bigint;
      fname text;
    BEGIN
      FOR reg IN SELECT r_regionkey FROM region ORDER BY r_regionkey LOOP
        cnt := 0;
        fname := NULL;
        FOR rec IN nc(reg.r_regionkey) LOOP
          IF cnt = 0 THEN
            fname := rec.n_name;
          END IF;
          cnt := cnt + 1;
        END LOOP;
        OPEN nc(reg.r_regionkey);
        MOVE nc;
        FETCH nc INTO rec;
        CLOSE nc;
        RETURN NEXT (reg.r_regionkey, fname, rec.n_name, cnt);
      END LOOP;
    END;
    $fn$ LANGUAGE plpgsql""")
    return eng.call("forc_move_demo")


@query(
    "plpgsql_scroll_fetch",
    oracle="""
    SELECT r.r_regionkey AS rk,
           (SELECT n_name FROM nation n WHERE n.n_regionkey = r.r_regionkey
            ORDER BY n_nationkey LIMIT 1) AS first_name,
           (SELECT n_name FROM nation n WHERE n.n_regionkey = r.r_regionkey
            ORDER BY n_nationkey DESC LIMIT 1) AS last_name,
           (SELECT n_name FROM nation n WHERE n.n_regionkey = r.r_regionkey
            ORDER BY n_nationkey DESC LIMIT 1 OFFSET 1) AS second_last,
           (SELECT CAST(count(*) AS BIGINT) FROM nation n
            WHERE n.n_regionkey = r.r_regionkey) AS n_walked
    FROM region r ORDER BY r_regionkey
    """,
)
def plpgsql_scroll_fetch(spark, sf_dir):
    """PL/pgSQL SCROLL cursors + backward FETCH directions
    (pl_gram.y read_fetch_direction; pl_exec.c exec_stmt_fetch over a
    scrollable portal — the round-5 declared gap, now closed): per
    region, a SCROLL cursor fetches LAST, PRIOR, FIRST, then re-walks
    the whole result backward (LAST + PRIOR-until-BOF) to count rows.
    SCROLL retains the fetched rows coordinator-side (the reference's
    scrollable-portal tuplestore does the same materialization); the
    per-region result here is dimension-sized, so the buffer is O(25)."""
    from gpdb_spark.engine import Engine

    eng = Engine(spark, sf_dir)
    eng.create_function("""
    CREATE FUNCTION scroll_fetch_demo()
    RETURNS TABLE(rk bigint, first_name text, last_name text,
                  second_last text, n_walked bigint) AS $fn$
    DECLARE
      nc SCROLL CURSOR (k int) FOR
        SELECT n_name FROM nation WHERE n_regionkey = k
        ORDER BY n_nationkey;
      reg record;
      v text;
      firstn text;
      lastn text;
      secondl text;
      cnt bigint;
    BEGIN
      FOR reg IN SELECT r_regionkey FROM region ORDER BY r_regionkey LOOP
        OPEN nc(reg.r_regionkey);
        FETCH LAST FROM nc INTO lastn;
        FETCH PRIOR FROM nc INTO secondl;
        FETCH FIRST FROM nc INTO firstn;
        FETCH LAST FROM nc INTO v;
        cnt := 0;
        WHILE found LOOP
          cnt := cnt + 1;
          FETCH PRIOR FROM nc INTO v;
        END LOOP;
        CLOSE nc;
        RETURN NEXT (reg.r_regionkey, firstn, lastn, secondl, cnt);
      END LOOP;
    END;
    $fn$ LANGUAGE plpgsql""")
    return eng.call("scroll_fetch_demo")


@query(
    "dblink_query",
    # oracle mirrors the remote work locally: the dblink_exec-inserted
    # sentinel row is the UNION ALL constant; remote GROUP BY + local
    # broadcast join reproduce exactly
    oracle="""
    SELECT r.r_name, CAST(g.cnt AS BIGINT) AS cnt, g.first_name
    FROM (SELECT n_regionkey, count(*) AS cnt, min(n_name) AS first_name
          FROM (SELECT n_nationkey, n_name, n_regionkey FROM nation
                UNION ALL SELECT 99, 'ZZTEST', 0) n
          GROUP BY n_regionkey) g
    JOIN region r ON g.n_regionkey = r.r_regionkey
    """,
)
def dblink_query(spark, sf_dir):
    """dblink front door (contrib/dblink/dblink.c): dblink_connect a
    named connection, dblink_exec remote DML (INSERT a sentinel row),
    then dblink(conn, sql) ships an arbitrary remote aggregate query —
    the whole GROUP BY runs on the remote engine, exactly dblink's
    contract (vs foreign_scan_fdw's table-granular pushdown scan) — and
    the record stream joins a local broadcast dimension. Single remote
    cursor = single input partition, the reference's own
    coordinator-only execution shape."""
    import os
    import tempfile

    from gpdb_spark.operators.dblink import (
        dblink,
        dblink_connect,
        dblink_disconnect,
        dblink_exec,
        dblink_get_connections,
    )
    from gpdb_spark.operators.foreign import create_sqlite_table

    rows = [
        r.asDict()
        for r in t(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .collect()
    ]
    db = os.path.join(tempfile.mkdtemp(prefix="gpdb_dblink_"), "remote.db")
    create_sqlite_table(db, "nation", rows)

    if "nat_conn" in dblink_get_connections():
        dblink_disconnect("nat_conn")
    dblink_connect("nat_conn", f"dbname={db}")
    status = dblink_exec(
        "nat_conn", "INSERT INTO nation VALUES (99, 'ZZTEST', 0)"
    )
    assert status == "INSERT 0 1", status

    g = dblink(
        spark,
        "nat_conn",
        "SELECT n_regionkey, COUNT(*) AS cnt, MIN(n_name) AS first_name "
        "FROM nation GROUP BY n_regionkey",
        schema="n_regionkey long, cnt long, first_name string",
    )
    r = t(spark, sf_dir, "region")
    return (
        g.join(F.broadcast(r), g.n_regionkey == r.r_regionkey)
        .select("r_name", "cnt", "first_name")
    )
