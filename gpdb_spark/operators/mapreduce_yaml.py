"""gpMapReduce YAML front door — parse the reference's document format
and compile it onto operators/mapreduce.run_mapreduce.

Reference: gpcontrib/gpmapreduce/demo/2_wordcount.yml (and 1_grep.yml)
— a YAML document with VERSION / DEFINE / EXECUTE sections. DEFINE
declares INPUTs (tables/queries/files), MAPs (row -> rows functions
with PARAMETERS and RETURNS), REDUCEs; EXECUTE names a RUN with
SOURCE / MAP / REDUCE. gpmapreduce compiles this to SQL + UDFs and runs
it across all segments; here the same document compiles to a DataFrame
pipeline (mapInPandas for MAP, JVM groupBy for the builtin reducers).

Supported subset (the demo surface):

- INPUT: ``TABLE`` (fixture table name) with optional ``COLUMNS``
  (selectExpr list), or ``QUERY`` is accepted as a raw Spark SQL string
  against registered tables. ``FILE`` inputs map to ``spark.read.text``
  (the ``seghost:path`` prefix is dropped — Spark's reader parallelizes
  by split, the analog of gpfdist's per-segment files); the file path
  rides in as ``key`` when the MAP declares two parameters.
- MAP: ``LANGUAGE: python`` only (the reference also ships perl —
  documented out of scope, raises). ``FUNCTION`` is the python body,
  ``PARAMETERS`` the input columns, ``RETURNS`` the output columns as
  ``name pgtype`` pairs. The body is a generator: each ``yield [a, b]``
  emits one output row, exactly the reference's python MAP protocol.
- REDUCE: the builtin reducers SUM / COUNT / MIN / MAX / AVG (keyed by
  every output column except the last, which is the value — the
  (key, value) convention of the demos) and IDENTITY (pass-through).
  Custom TRANSITION/FINALIZE reducers are out of scope here; the
  programmatic API (operators/mapreduce.py ``reduce.fn``) covers them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PG_TO_SPARK = {
    "text": "string",
    "varchar": "string",
    "integer": "int",
    "int": "int",
    "int4": "int",
    "bigint": "long",
    "int8": "long",
    "smallint": "short",
    "float8": "double",
    "double": "double",
    "float4": "float",
    "real": "float",
    "numeric": "decimal(38,18)",
    "boolean": "boolean",
    "bool": "boolean",
}


def _name_type_pairs(spec) -> list[str]:
    """Normalize PARAMETERS / RETURNS to a list of 'name pgtype'
    strings — both YAML shapes are accepted (a list of entries, like
    the reference demos' RETURNS, or one comma-separated string, like
    their PARAMETERS)."""
    if isinstance(spec, str):
        return [p.strip() for p in spec.split(",") if p.strip()]
    return [str(p).strip() for p in spec]


def _schema_of(returns) -> str:
    cols = []
    for r in _name_type_pairs(returns):
        parts = r.split(None, 1)
        if len(parts) != 2:
            raise ValueError(
                f"gpmapreduce RETURNS entry needs 'name type': {r!r}"
            )
        name, pg = parts
        cols.append(f"{name} {_PG_TO_SPARK.get(pg.strip().lower(), 'string')}")
    return ", ".join(cols)


def _compile_map(define: dict):
    """Compile a python MAP FUNCTION body into a per-batch pandas fn.
    The body sees its PARAMETERS as locals and yields per-output-row
    lists — the reference's PL/Python MAP calling convention."""
    lang = str(define.get("LANGUAGE", "python")).lower()
    if lang != "python":
        raise NotImplementedError(
            f"gpmapreduce MAP language {lang!r}: only python is supported "
            "(the reference's perl maps have no container runtime here)"
        )
    params = [
        p.split()[0]
        for p in _name_type_pairs(define.get("PARAMETERS", "value text"))
    ]
    body = define["FUNCTION"]
    src = "def __map({}):\n".format(", ".join(params)) + "".join(
        "    " + line + "\n" for line in body.splitlines()
    )
    ns: dict = {}
    exec(src, {"__builtins__": __builtins__}, ns)  # noqa: S102 — user spec code, same trust level as a UDF
    fn = ns["__map"]
    schema = _schema_of(define["RETURNS"])
    out_cols = [r.split()[0] for r in _name_type_pairs(define["RETURNS"])]

    def batch_fn(pdf):
        import pandas as pd

        rows = []
        for tup in pdf[params].itertuples(index=False, name=None):
            rows.extend(fn(*tup))
        return pd.DataFrame(rows, columns=out_cols)

    return batch_fn, schema, out_cols


def run_yaml(
    spark: SparkSession,
    doc: dict | str,
    tables: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Run a gpmapreduce YAML document (text or pre-parsed dict).
    ``tables`` resolves INPUT TABLE names to DataFrames."""
    try:
        import yaml
    except ImportError as exc:  # pragma: no cover — baked into container
        raise NotImplementedError("PyYAML unavailable") from exc

    if isinstance(doc, str):
        doc = yaml.safe_load(doc)
    defines = {}
    for entry in doc.get("DEFINE", []):
        for kind, d in entry.items():
            defines[d["NAME"]] = (kind, d)

    runs = [r["RUN"] for r in doc.get("EXECUTE", []) if "RUN" in r]
    if len(runs) != 1:
        raise NotImplementedError("exactly one EXECUTE RUN is supported")
    run = runs[0]

    kind, src = defines[run["SOURCE"]]
    if kind != "INPUT":
        raise NotImplementedError(f"RUN SOURCE must be an INPUT, got {kind}")
    if "TABLE" in src:
        name = src["TABLE"]
        if not tables or name not in tables:
            raise KeyError(f"gpmapreduce INPUT table {name!r} not provided")
        df = tables[name]
        if "COLUMNS" in src:
            df = df.selectExpr(*src["COLUMNS"])
    elif "QUERY" in src:
        # QUERY runs as Spark SQL against the provided tables,
        # registered as temp views (gpmapreduce INPUT ... QUERY).
        # A same-named temp view already live in the session (e.g. an
        # Engine fixture view) must NOT be clobbered as a side effect of
        # one YAML job: capture its analyzed plan first and restore it
        # (or drop ours) after planning the query.
        # only TEMP views are captured/restored — a persistent catalog
        # table must NOT get a frozen temp-view snapshot installed over
        # it (the snapshot would shadow later inserts); for those names
        # the temp view we create below is simply dropped again
        temp_names = {
            t.name for t in spark.catalog.listTables() if t.isTemporary
        }
        saved: dict = {}
        for tname in tables or {}:
            if tname in temp_names:
                saved[tname] = spark.table(tname)
        try:
            for tname, tdf in (tables or {}).items():
                tdf.createOrReplaceTempView(tname)
            df = spark.sql(src["QUERY"])
            # force analysis NOW, while our views are registered — the
            # returned plan must not depend on the restored bindings
            df.schema
        finally:
            for tname in tables or {}:
                if tname in saved:
                    saved[tname].createOrReplaceTempView(tname)
                else:
                    spark.catalog.dropTempView(tname)
    elif "FILE" in src:
        # gpmapreduce FILE entries are 'hostname:/path' (every segment
        # host reads its own file; Spark readers are already parallel,
        # so the host part drops). A URI scheme ('file://', 'hdfs://',
        # 's3a://') is NOT a hostname — pass those through intact.
        import re as _re

        def _strip_host(p: str) -> str:
            p = str(p)
            if _re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", p):
                return p  # URI — scheme stays
            return p.split(":", 1)[-1]

        paths = [_strip_host(p) for p in src["FILE"]]
        df = spark.read.text(paths)
        df = df.select(
            F.input_file_name().alias("key"), F.col("value").cast("string")
        )
    else:
        raise NotImplementedError("INPUT needs TABLE, QUERY or FILE")

    spec: dict = {}
    if "MAP" in run:
        mk, md = defines[run["MAP"]]
        if mk != "MAP":
            raise NotImplementedError(f"RUN MAP must be a MAP, got {mk}")
        fn, schema, out_cols = _compile_map(md)
        spec["map"] = {"fn": fn, "schema": schema}
    else:
        out_cols = df.columns

    reduce_name = str(run.get("REDUCE", "IDENTITY"))
    builtin = reduce_name.lower()
    if builtin != "identity":
        if builtin not in ("sum", "count", "min", "max", "avg"):
            raise NotImplementedError(
                f"gpmapreduce REDUCE {reduce_name!r}: builtins + IDENTITY "
                "only (custom TRANSITION reducers: use the programmatic "
                "operators/mapreduce.py API)"
            )
        keys, value = out_cols[:-1], out_cols[-1]
        spec["reduce"] = {"keys": keys, "builtin": {value: builtin}}

    from gpdb_spark.operators.mapreduce import run_mapreduce

    return run_mapreduce(df, spec)
