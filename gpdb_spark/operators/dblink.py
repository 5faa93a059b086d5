"""dblink — ad-hoc cross-database queries from the engine.

Reference: contrib/dblink/dblink.c — ``dblink_connect(name, connstr)``,
``dblink(conn, sql)`` returning SETOF record, ``dblink_exec`` for remote
DML, ``dblink_disconnect``, ``dblink_get_connections``. In GPDB dblink
executes on the coordinator over a single libpq connection (dblink.c
header comment: no segment parallelism) — so the honest Spark shape is a
ONE-partition DataSourceV2 scan whose ``read()`` runs the remote SQL on
an executor (NOT a driver-side collect: rows stream through the normal
task machinery, join/agg above it distribute as usual).

The concrete remote engine is SQLite (stdlib, serverless — same choice
as operators/foreign.py's FDW, which handles the table-granular,
filter-pushdown scan path; dblink is the arbitrary-SQL front door).
Connection strings accept PG form ``dbname=/path/file.db`` (extra
key=value pairs ignored) or a bare path.

Schema inference: the remote cursor's column names plus a bounded
type-sniff of the first rows (LIMIT 20, O(1) driver work at plan time) —
dblink's "AS t(col type, ...)" alias clause equivalent; pass
``schema=`` to pin it explicitly like the SQL form does.
"""

from __future__ import annotations

import math
import re
import sqlite3
from contextlib import closing
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# named connections, driver-side (dblink.c keeps them in a per-backend
# hash table "remoteConns" — same lifetime: the Spark driver process)
_CONNECTIONS: dict[str, str] = {}


def _resolve_path(conn: str) -> str:
    """'dbname=/x/y.db host=...' or bare path -> sqlite file path.

    A string is a libpq-style connstring only if EVERY whitespace token
    is key=value (PQconnectdb's conninfo grammar) — a bare substring
    test on '=' misclassified hive-style paths like '/data/run=5/x.db'
    as connstrings and rejected them (round-5 review finding)."""
    if conn in _CONNECTIONS:
        conn = _CONNECTIONS[conn]
    parts = conn.split()
    if parts and all(
        "=" in p and re.match(r"^\w+=", p) and not p.startswith("/")
        for p in parts
    ):
        for part in parts:
            k, _, v = part.partition("=")
            if k == "dbname":
                return v
        raise ValueError(f"connection string {conn!r} has no dbname=")
    return conn


def dblink_connect(name: str, connstr: str) -> str:
    """dblink_connect(text, text) — register a named connection."""
    if name in _CONNECTIONS:
        raise ValueError(f"duplicate connection name {name!r}")
    _resolve_path(connstr)  # validate shape early
    _CONNECTIONS[name] = connstr
    return "OK"


def dblink_disconnect(name: str) -> str:
    if name not in _CONNECTIONS:
        raise ValueError(f"connection {name!r} not found")
    del _CONNECTIONS[name]
    return "OK"


def dblink_get_connections() -> list[str]:
    return sorted(_CONNECTIONS)


_SNIFF = 20


def _sniff(path: str, sql: str) -> tuple[StructType, list[tuple], bool]:
    """One remote probe: returns (schema, first rows, complete). Probes
    _SNIFF+1 rows so ``complete`` is exact — a complete result is served
    directly from these rows and the remote SQL never runs again
    (dblink() was executing every unpinned query twice: once in the
    plan-time schema sniff, once in the executor read — round-5 review
    finding)."""
    with closing(sqlite3.connect(path)) as conn:
        cur = conn.execute(f"SELECT * FROM ({sql}) LIMIT {_SNIFF + 1}")
        names = [d[0] for d in cur.description]
        rows = cur.fetchall()
    complete = len(rows) <= _SNIFF
    return _widen_schema(names, rows), rows, complete


def _sniff_schema(path: str, sql: str) -> StructType:
    return _sniff(path, sql)[0]


def _widen_schema(names: list[str], rows: list[tuple]) -> StructType:
    """Widening sniff over ALL probed rows (not just the first non-NULL:
    SQLite columns are dynamically typed, so 1 followed by 2.5 is legal
    and must widen to double; any str/num mix degrades to string)."""
    fields = []
    for i, name in enumerate(names):
        kinds: set = set()
        for r in rows:
            v = r[i]
            if v is None:
                continue
            if isinstance(v, bool) or isinstance(v, int):
                kinds.add("int")
            elif isinstance(v, float):
                kinds.add("float")
            elif isinstance(v, (bytes, bytearray)):
                kinds.add("bin")
            else:
                kinds.add("str")
        if kinds == {"int"}:
            ty = LongType()
        elif kinds and kinds <= {"int", "float"}:
            ty = DoubleType()
        elif kinds == {"bin"}:
            ty = BinaryType()
        else:  # str, mixed with str/bin, or all-NULL
            ty = StringType()
        fields.append(StructField(name, ty))
    return StructType(fields)


def _coerce_row(row: tuple, schema: StructType) -> tuple:
    """Coerce one remote row onto the declared schema — the schema is a
    sniff (or caller pin), while SQLite storage classes can vary per
    row, and Spark's Python data-source conversion is strict."""
    out = []
    for v, f in zip(row, schema.fields):
        if v is None:
            out.append(None)
        elif isinstance(f.dataType, LongType):
            if isinstance(v, float) and not v.is_integer():
                # a float past the 20-row sniff horizon: int(v) would
                # silently truncate — refuse loudly; the caller can pin
                # schema="... double" (dblink's AS t(col type) clause)
                raise ValueError(
                    f"dblink: column {f.name!r} sniffed as bigint but "
                    f"remote row holds non-integral {v!r}; pin the "
                    "schema (e.g. schema='... double')"
                )
            out.append(int(v))
        elif isinstance(f.dataType, DoubleType):
            out.append(float(v))
        elif isinstance(f.dataType, StringType):
            out.append(v if isinstance(v, str) else str(v))
        elif isinstance(f.dataType, BinaryType):
            out.append(bytes(v))
        else:
            out.append(v)
    return tuple(out)


class _Whole(InputPartition):
    pass


class DblinkReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.path = options["path"]
        self.sql = options["sql"]
        self.out_schema = schema

    def partitions(self):
        # one remote cursor, like the reference's single libpq conn
        return [_Whole(0)]

    def read(self, partition) -> Iterator[tuple]:
        with closing(sqlite3.connect(self.path)) as conn:
            cur = conn.execute(self.sql)
            while True:
                rows = cur.fetchmany(10_000)
                if not rows:
                    break
                for r in rows:
                    yield _coerce_row(r, self.out_schema)


class DblinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "dblink"

    def schema(self) -> StructType:
        return _sniff_schema(self.options["path"], self.options["sql"])

    def reader(self, schema: StructType) -> DblinkReader:
        return DblinkReader(schema, dict(self.options))


def _register(spark: SparkSession) -> None:
    if not getattr(spark, "_dblink_registered", False):
        spark.dataSource.register(DblinkDataSource)
        spark._dblink_registered = True


def dblink(
    spark: SparkSession,
    conn: str,
    sql: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """dblink(conn, sql) -> DataFrame — the SELECT * FROM dblink(...)
    AS t(...) form. ``conn`` is a named connection or a connection
    string; ``schema`` pins the record shape (else it is sniffed).

    Execution discipline: a pinned schema runs the remote SQL exactly
    once (in the executor read). Unpinned, the driver probes once; a
    result that fits the probe is returned AS those rows (one remote
    execution total), and a larger one pins the probed schema so the
    plan-time schema() callback never re-runs the query — the full SQL
    executes once in the reader, plus the bounded LIMIT probe."""
    _register(spark)
    path = _resolve_path(conn)
    if schema is None:
        sniffed, rows, complete = _sniff(path, sql)
        if complete:
            # keep the one-partition shape of the remote-cursor contract
            return spark.createDataFrame(
                [_coerce_row(r, sniffed) for r in rows], sniffed
            ).coalesce(1)
        schema = sniffed
    reader = (
        spark.read.format("dblink")
        .option("path", path)
        .option("sql", sql)
        .schema(schema)
    )
    return reader.load()


def dblink_exec(conn: str, sql: str) -> str:
    """dblink_exec(conn, sql) — run remote DML/DDL, return a PG-style
    command status string (dblink.c dblink_exec)."""
    path = _resolve_path(conn)
    with closing(sqlite3.connect(path)) as c:
        cur = c.execute(sql)
        c.commit()
        n = cur.rowcount if cur.rowcount is not None else 0
    verb = sql.strip().split(None, 1)[0].upper()
    if verb == "INSERT":
        return f"INSERT 0 {n}"
    if verb in ("UPDATE", "DELETE"):
        return f"{verb} {n}"
    return verb


# --------------------------------------------------------------------------
# remote cursors (dblink.c dblink_open/dblink_fetch/dblink_close): an
# explicitly user-paced remote cursor — each fetch returns at most n rows
# through the coordinator, exactly the reference's bounded semantics
# --------------------------------------------------------------------------

_CURSORS: dict[tuple[str, str], object] = {}
_CURSOR_DBS: dict[tuple[str, str], object] = {}
_CURSOR_SCHEMAS: dict[tuple[str, str], StructType] = {}
# rows prefetched from the LIVE cursor for schema widening, served back
# before new fetches (single remote execution — see dblink_open)
_CURSOR_BUF: dict[tuple[str, str], list] = {}


def dblink_open(conn: str, cursor: str, sql: str) -> str:
    """dblink_open(conn, curname, sql) — open a remote cursor. The
    record schema is fixed HERE, widened over the live cursor's first
    rows (buffered and served back on fetch — ONE remote execution), so
    every subsequent fetch of this cursor returns the same schema —
    including batches where a column is all-NULL."""
    key = (conn, cursor)
    if key in _CURSORS:
        raise ValueError(f"cursor {cursor!r} already open on {conn!r}")
    path = _resolve_path(conn)
    db = sqlite3.connect(path)
    try:
        cur = db.execute(sql)
        # a cursor must return rows: DML/DDL has no description. Close
        # WITHOUT commit so sqlite's implicit transaction rolls the
        # statement back — no side effect escapes the failed open
        # (review finding: the bare description access was an opaque
        # TypeError after the DML had already run)
        if cur.description is None:
            raise ValueError(
                f"dblink_open: cursor SQL must return rows, got {sql!r}"
            )
        # widen the schema from the live cursor's first rows and keep
        # them buffered for the first fetches — the separate LIMIT
        # probe ran the remote SQL twice (round-5 review finding)
        head = cur.fetchmany(_SNIFF + 1)
        names = [d[0] for d in cur.description]
    except Exception:
        db.close()
        raise
    _CURSOR_SCHEMAS[key] = _widen_schema(names, head)
    _CURSOR_BUF[key] = list(head)
    _CURSORS[key] = cur
    _CURSOR_DBS[key] = db
    return "OK"


def dblink_fetch(spark: SparkSession, conn: str, cursor: str, n: int):
    """dblink_fetch(conn, curname, n) -> DataFrame of the next <= n rows.
    Driver transfer is bounded by the caller's n (the PG contract —
    FETCH count is explicit); rows become a DataFrame so downstream
    joins/aggs distribute."""
    key = (conn, cursor)
    if key not in _CURSORS:
        raise ValueError(f"cursor {cursor!r} is not open on {conn!r}")
    cur = _CURSORS[key]
    schema = _CURSOR_SCHEMAS[key]
    buf = _CURSOR_BUF.get(key, [])
    take, _CURSOR_BUF[key] = buf[:n], buf[n:]
    if len(take) < n:
        take += cur.fetchmany(n - len(take))
    rows = [_coerce_row(r, schema) for r in take]
    return spark.createDataFrame(rows, schema=schema)


def dblink_close(conn: str, cursor: str) -> str:
    key = (conn, cursor)
    if key not in _CURSORS:
        raise ValueError(f"cursor {cursor!r} is not open on {conn!r}")
    _CURSORS.pop(key)
    _CURSOR_SCHEMAS.pop(key, None)
    _CURSOR_BUF.pop(key, None)
    _CURSOR_DBS.pop(key).close()
    return "OK"


# --------------------------------------------------------------------------
# catalog + SQL-builder helpers (dblink.c dblink_get_pkey,
# dblink_build_sql_insert/_delete/_update)
# --------------------------------------------------------------------------


def dblink_get_pkey(conn: str, table: str) -> list[tuple[int, str]]:
    """dblink_get_pkey: (position, column) pairs of the remote table's
    primary key (dblink.c:1517; here via sqlite PRAGMA table_info)."""
    with closing(sqlite3.connect(_resolve_path(conn))) as db:
        info = db.execute(
            f"PRAGMA table_info({_quote_ident(table)})"
        ).fetchall()
    if not info:
        raise ValueError(f"remote table {table!r} not found")
    pk = sorted((row[5], row[1]) for row in info if row[5])
    return [(i + 1, name) for i, (_, name) in enumerate(pk)]


def _quote_ident(name: str) -> str:
    """Double-quote an identifier, doubling embedded quotes — the
    quote_ident discipline dblink.c applies to every interpolated
    table/column name (round-6 advice: bare f'"{name}"' produced
    malformed/injected SQL for names containing '"')."""
    return '"' + str(name).replace('"', '""') + '"'


def _quote_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):  # before int: bool IS an int subclass
        return "1" if v else "0"  # portable (sqlite < 3.23 lacks TRUE)
    if isinstance(v, (bytes, bytearray)):
        return "X'" + bytes(v).hex() + "'"  # blob literal
    if isinstance(v, float):
        if not math.isfinite(v):
            raise ValueError(f"non-finite float {v!r} has no SQL literal")
        return repr(v)
    if isinstance(v, int):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def dblink_build_sql_insert(
    table: str, cols: list[str], values: list
) -> str:
    """dblink_build_sql_insert (dblink.c:1641, simplified to explicit
    column/value lists): INSERT statement text for the remote side."""
    if len(cols) != len(values):
        raise ValueError("cols and values length mismatch")
    collist = ", ".join(_quote_ident(c) for c in cols)
    vallist = ", ".join(_quote_lit(v) for v in values)
    return f"INSERT INTO {_quote_ident(table)} ({collist}) VALUES ({vallist})"


def dblink_build_sql_delete(
    table: str, pkey_cols: list[str], pkey_values: list
) -> str:
    """dblink_build_sql_delete (dblink.c:1732): DELETE by primary key."""
    if len(pkey_cols) != len(pkey_values):
        raise ValueError("pkey cols and values length mismatch")
    where = " AND ".join(
        f"{_quote_ident(c)} = {_quote_lit(v)}"
        for c, v in zip(pkey_cols, pkey_values)
    )
    return f"DELETE FROM {_quote_ident(table)} WHERE {where}"


def dblink_build_sql_update(
    table: str,
    pkey_cols: list[str],
    pkey_values: list,
    assignments: dict,
) -> str:
    """dblink_build_sql_update (dblink.c:1809): UPDATE by primary key."""
    if len(pkey_cols) != len(pkey_values):
        raise ValueError("pkey cols and values length mismatch")
    sets = ", ".join(
        f"{_quote_ident(c)} = {_quote_lit(v)}" for c, v in assignments.items()
    )
    where = " AND ".join(
        f"{_quote_ident(c)} = {_quote_lit(v)}"
        for c, v in zip(pkey_cols, pkey_values)
    )
    return f"UPDATE {_quote_ident(table)} SET {sets} WHERE {where}"
