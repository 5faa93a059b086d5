"""gpMapReduce YAML front door (operators/mapreduce_yaml.py) — parse
the reference's document format (gpcontrib/gpmapreduce/demo/*.yml) and
compile it to the mapInPandas + JVM-groupBy pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gpdb_spark.operators.mapreduce_yaml import run_yaml

WORDCOUNT = """
DEFINE:
  - INPUT:
      NAME: src
      TABLE: docs
      COLUMNS: ["txt AS value"]
  - MAP:
      NAME: wordsplit
      FUNCTION: |
        for word in value.split():
          yield [word, 1]
      LANGUAGE: python
      PARAMETERS: value text
      RETURNS:
        - key text
        - value integer
EXECUTE:
  - RUN:
      SOURCE: src
      MAP: wordsplit
      REDUCE: SUM
"""


def test_wordcount_yaml(spark):
    docs = spark.createDataFrame(
        [("a b a",), ("b  c",), ("",)], "txt string"
    )
    out = run_yaml(spark, WORDCOUNT, tables={"docs": docs})
    got = {r.key: r.sum_value for r in out.collect()}
    assert got == {"a": 2, "b": 2, "c": 1}


def test_identity_reduce_and_file_input(spark, tmp_path):
    """FILE input (seghost:path prefixes dropped) + REDUCE: IDENTITY —
    the 1_grep.yml shape, with the perl map swapped for python."""
    p = tmp_path / "log.txt"
    p.write_text("GET /a HTTP\nPOST /b HTTP\nGET /c HTTP\n")
    doc = f"""
DEFINE:
  - INPUT:
      NAME: logs
      FILE:
        - somehost:{p}
  - MAP:
      NAME: grep_get
      FUNCTION: |
        if value.startswith('GET '):
          yield [key, value]
      LANGUAGE: python
      PARAMETERS: key text, value text
      RETURNS:
        - key text
        - value text
EXECUTE:
  - RUN:
      SOURCE: logs
      MAP: grep_get
      REDUCE: IDENTITY
"""
    out = run_yaml(spark, doc)
    vals = sorted(r.value for r in out.collect())
    assert vals == ["GET /a HTTP", "GET /c HTTP"]


def test_perl_map_raises(spark):
    doc = """
DEFINE:
  - INPUT:
      NAME: src
      TABLE: docs
  - MAP:
      NAME: m
      FUNCTION: "return [];"
      LANGUAGE: perl
      PARAMETERS: value text
      RETURNS: ["key text"]
EXECUTE:
  - RUN:
      SOURCE: src
      MAP: m
      REDUCE: IDENTITY
"""
    docs = spark.createDataFrame([("x",)], "value string")
    with pytest.raises(NotImplementedError, match="perl"):
        run_yaml(spark, doc, tables={"docs": docs}).collect()


def test_builtin_reducer_stays_jvm_side(spark):
    """The SUM reduce must plan as a native hash aggregate (2-stage,
    map-side partial) — only the MAP is python."""
    docs = spark.createDataFrame([("a b",)], "txt string")
    out = run_yaml(
        spark, WORDCOUNT.replace("TABLE: docs", "TABLE: docs"), tables={"docs": docs}
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    # exactly one python eval (the MAP), none after the shuffle
    assert plan.count("ArrowEvalPython") + plan.count("BatchEvalPython") <= 1


def test_list_parameters_and_string_returns(spark):
    """Review regression: PARAMETERS as a YAML list and RETURNS as one
    comma string must both parse (either shape, either field)."""
    doc = """
DEFINE:
  - INPUT:
      NAME: src
      TABLE: docs
      COLUMNS: ["txt AS value"]
  - MAP:
      NAME: m
      FUNCTION: |
        for w in value.split():
          yield [w, 1]
      LANGUAGE: python
      PARAMETERS:
        - value text
      RETURNS: "key text, value integer"
EXECUTE:
  - RUN:
      SOURCE: src
      MAP: m
      REDUCE: SUM
"""
    docs = spark.createDataFrame([("a a b",)], "txt string")
    got = {r.key: r.sum_value for r in run_yaml(spark, doc, tables={"docs": docs}).collect()}
    assert got == {"a": 2, "b": 1}


def test_query_input(spark):
    """Review regression: INPUT QUERY (documented) runs as Spark SQL
    over the provided tables registered as temp views."""
    doc = """
DEFINE:
  - INPUT:
      NAME: src
      QUERY: "SELECT upper(txt) AS value FROM docs WHERE txt <> 'skip'"
  - MAP:
      NAME: m
      FUNCTION: |
        yield [value, 1]
      LANGUAGE: python
      PARAMETERS: value text
      RETURNS:
        - key text
        - value integer
EXECUTE:
  - RUN:
      SOURCE: src
      MAP: m
      REDUCE: COUNT
"""
    docs = spark.createDataFrame([("x",), ("skip",), ("x",)], "txt string")
    got = {r.key: r.count_value for r in run_yaml(spark, doc, tables={"docs": docs}).collect()}
    assert got == {"X": 2}


def test_query_input_does_not_clobber_session_views(spark):
    """ADVICE regression: a session temp view sharing a name with a
    caller-supplied YAML table must survive the job — captured and
    restored, not clobbered; a name we introduced is dropped again."""
    doc = """
DEFINE:
  - INPUT:
      NAME: src
      QUERY: "SELECT txt AS value FROM docs JOIN other ON 1=1"
  - MAP:
      NAME: m
      FUNCTION: |
        yield [value, 1]
      LANGUAGE: python
      PARAMETERS: value text
      RETURNS:
        - key text
        - value integer
EXECUTE:
  - RUN:
      SOURCE: src
      MAP: m
      REDUCE: SUM
"""
    # pre-existing session view named "docs" with DIFFERENT content
    spark.createDataFrame([("session",)], "marker string") \
        .createOrReplaceTempView("docs")
    assert not spark.catalog.tableExists("other")

    docs = spark.createDataFrame([("yaml",)], "txt string")
    other = spark.createDataFrame([(1,)], "one int")
    out = run_yaml(spark, doc, tables={"docs": docs, "other": other})
    assert {r.key: r.sum_value for r in out.collect()} == {"yaml": 1}

    # session view restored with its original content...
    assert [r.marker for r in spark.table("docs").collect()] == ["session"]
    # ...and the view the job introduced is gone again
    assert not spark.catalog.tableExists("other")
    spark.catalog.dropTempView("docs")


def test_query_input_does_not_shadow_persistent_table(spark):
    """Review regression: a PERSISTENT catalog table sharing a name
    with a YAML input must not end up shadowed by a frozen temp-view
    snapshot — the job's temp view is dropped, not 'restored'."""
    doc = """
DEFINE:
  - INPUT:
      NAME: src
      QUERY: "SELECT txt AS value FROM mr_perm"
  - MAP:
      NAME: m
      FUNCTION: |
        yield [value, 1]
      LANGUAGE: python
      PARAMETERS: value text
      RETURNS:
        - key text
        - value integer
EXECUTE:
  - RUN:
      SOURCE: src
      MAP: m
      REDUCE: SUM
"""
    spark.sql("DROP TABLE IF EXISTS mr_perm")
    spark.createDataFrame([("stored",)], "txt string") \
        .write.saveAsTable("mr_perm")
    try:
        yaml_df = spark.createDataFrame([("yaml",)], "txt string")
        out = run_yaml(spark, doc, tables={"mr_perm": yaml_df})
        assert {r.key for r in out.collect()} == {"yaml"}
        # no temp view left shadowing the real table
        assert not any(
            t.name == "mr_perm" and t.isTemporary
            for t in spark.catalog.listTables()
        )
        assert [r.txt for r in spark.table("mr_perm").collect()] == [
            "stored"
        ]
    finally:
        spark.sql("DROP TABLE IF EXISTS mr_perm")
