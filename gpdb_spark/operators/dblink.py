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

import sqlite3
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
    """'dbname=/x/y.db host=...' or bare path -> sqlite file path."""
    if conn in _CONNECTIONS:
        conn = _CONNECTIONS[conn]
    if "=" in conn:
        for part in conn.split():
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


def _sniff_schema(path: str, sql: str) -> StructType:
    with sqlite3.connect(path) as conn:
        cur = conn.execute(f"SELECT * FROM ({sql}) LIMIT 20")
        names = [d[0] for d in cur.description]
        rows = cur.fetchall()
    fields = []
    for i, name in enumerate(names):
        ty = StringType()
        for r in rows:
            v = r[i]
            if v is None:
                continue
            if isinstance(v, int):
                ty = LongType()
            elif isinstance(v, float):
                ty = DoubleType()
            elif isinstance(v, (bytes, bytearray)):
                ty = BinaryType()
            break
        fields.append(StructField(name, ty))
    return StructType(fields)


class _Whole(InputPartition):
    pass


class DblinkReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.path = options["path"]
        self.sql = options["sql"]

    def partitions(self):
        # one remote cursor, like the reference's single libpq conn
        return [_Whole(0)]

    def read(self, partition) -> Iterator[tuple]:
        with sqlite3.connect(self.path) as conn:
            cur = conn.execute(self.sql)
            while True:
                rows = cur.fetchmany(10_000)
                if not rows:
                    break
                yield from rows


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
    string; ``schema`` pins the record shape (else it is sniffed)."""
    _register(spark)
    reader = (
        spark.read.format("dblink")
        .option("path", _resolve_path(conn))
        .option("sql", sql)
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load()


def dblink_exec(conn: str, sql: str) -> str:
    """dblink_exec(conn, sql) — run remote DML/DDL, return a PG-style
    command status string (dblink.c dblink_exec)."""
    path = _resolve_path(conn)
    with sqlite3.connect(path) as c:
        cur = c.execute(sql)
        c.commit()
        n = cur.rowcount if cur.rowcount is not None else 0
    verb = sql.strip().split(None, 1)[0].upper()
    if verb == "INSERT":
        return f"INSERT 0 {n}"
    if verb in ("UPDATE", "DELETE"):
        return f"{verb} {n}"
    return verb
