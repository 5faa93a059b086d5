"""ForeignScan — foreign data wrapper over an external SQL engine.

Reference: ForeignScan executes a query against a *remote* data source
through an FDW (`ExecForeignScan`, nodeForeignscan.c:89), with
postgres_fdw-style pushdown: the planner hands the wrapper quals it can
evaluate remotely, and the wrapper emits a remote SQL statement so only
surviving rows cross the wire (contrib/postgres_fdw deparse.c).

Spark-first mapping: the Spark 4 **Python Data Source API**
(`pyspark.sql.datasource`) is the DataSourceV2 surface — `pushFilters`
receives Catalyst's pushable conjuncts, `partitions()` declares the
parallel splits, and each `read(partition)` runs remotely on an
executor. The concrete wrapper here targets SQLite (stdlib `sqlite3`,
no server needed) but the filter→SQL deparser and range-partition
scheme are exactly what a JDBC/postgres FDW would use:

- **Filter pushdown**: =, <, <=, >, >=, IN, IS [NOT] NULL,
  LIKE-prefix/suffix/contains are deparsed to a parameterized remote
  WHERE clause; anything else is left for Spark to evaluate (the
  `pushFilters` contract: yield unsupported filters back).
- **Parallel splits**: the remote table is range-partitioned on
  ``rowid`` (min/max probed once at plan time — O(1) driver work), one
  remote query per split, so a 1000-executor cluster issues 1000
  bounded remote scans instead of one giant one.
- **Column pruning**: the scan only SELECTs the declared schema's
  columns (Python DS API prunes at the schema level).

Scale note: the sqlite file must be on storage reachable from the
executors (shared FS). For a networked database the same class shape
applies with a connection URL instead of a path.
"""

from __future__ import annotations

import os
import sqlite3
from contextlib import closing
from typing import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_SQLITE_TYPE_MAP = {
    "INTEGER": LongType(),
    "INT": LongType(),
    "BIGINT": LongType(),
    "REAL": DoubleType(),
    "FLOAT": DoubleType(),
    "DOUBLE": DoubleType(),
    "NUMERIC": DoubleType(),
    "TEXT": StringType(),
    "BLOB": BinaryType(),
}


def _sqlite_schema(path: str, table: str) -> StructType:
    with closing(sqlite3.connect(path)) as conn:
        info = conn.execute(f'PRAGMA table_info("{table}")').fetchall()
    if not info:
        raise ValueError(f"foreign table {table!r} not found in {path}")
    fields = []
    for _cid, name, decl, _notnull, _dflt, _pk in info:
        base = (decl or "TEXT").split("(")[0].strip().upper()
        fields.append(StructField(name, _SQLITE_TYPE_MAP.get(base, StringType())))
    return StructType(fields)


def _deparse(f: Filter) -> tuple[str, list] | None:
    """Deparse one pushable conjunct to (parameterized SQL, params).

    The remote-deparse analog of postgres_fdw's deparseExpr: only
    operators whose remote semantics provably match are shipped; the
    rest stay local (returning None keeps the filter Spark-side).
    """
    if isinstance(f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)):
        if len(f.attribute) != 1 or f.value is None:
            return None
        op = {
            EqualTo: "=",
            GreaterThan: ">",
            GreaterThanOrEqual: ">=",
            LessThan: "<",
            LessThanOrEqual: "<=",
        }[type(f)]
        return f'"{f.attribute[0]}" {op} ?', [f.value]
    if isinstance(f, In):
        if len(f.attribute) != 1 or any(v is None for v in f.value):
            return None
        marks = ", ".join("?" for _ in f.value)
        return f'"{f.attribute[0]}" IN ({marks})', list(f.value)
    if isinstance(f, IsNull) and len(f.attribute) == 1:
        return f'"{f.attribute[0]}" IS NULL', []
    if isinstance(f, IsNotNull) and len(f.attribute) == 1:
        return f'"{f.attribute[0]}" IS NOT NULL', []
    if isinstance(f, (StringStartsWith, StringEndsWith, StringContains)):
        if len(f.attribute) != 1:
            return None
        esc = f.value.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
        pat = {
            StringStartsWith: esc + "%",
            StringEndsWith: "%" + esc,
            StringContains: "%" + esc + "%",
        }[type(f)]
        return f'"{f.attribute[0]}" LIKE ? ESCAPE \'\\\'', [pat]
    return None


class _RowidRange(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo = lo
        self.hi = hi


class SQLiteReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.path = options["path"]
        self.table = options["table"]
        self.n_parts = int(options.get("numpartitions", 4))
        self.columns = [f.name for f in schema.fields]
        self.where: list[str] = []
        self.params: list = []

    def pushFilters(self, filters: Sequence[Filter]) -> Iterator[Filter]:
        for f in filters:
            deparsed = _deparse(f)
            if deparsed is None:
                yield f  # unsupported → Spark evaluates it post-scan
            else:
                sql, params = deparsed
                self.where.append(sql)
                self.params.extend(params)

    def partitions(self) -> Sequence[InputPartition]:
        with closing(sqlite3.connect(self.path)) as conn:
            row = conn.execute(
                f'SELECT MIN(rowid), MAX(rowid) FROM "{self.table}"'
            ).fetchone()
        lo, hi = row
        if lo is None:
            return [_RowidRange(0, -1)]
        n = max(1, min(self.n_parts, hi - lo + 1))
        step = (hi - lo + 1 + n - 1) // n
        return [
            _RowidRange(lo + i * step, min(hi, lo + (i + 1) * step - 1))
            for i in range(n)
        ]

    def read(self, partition: _RowidRange) -> Iterator[tuple]:
        cols = ", ".join(f'"{c}"' for c in self.columns)
        clauses = ["rowid BETWEEN ? AND ?"] + self.where
        sql = (
            f'SELECT {cols} FROM "{self.table}" '
            f"WHERE {' AND '.join(clauses)} ORDER BY rowid"
        )
        with closing(sqlite3.connect(self.path)) as conn:
            cur = conn.execute(sql, [partition.lo, partition.hi, *self.params])
            while True:
                rows = cur.fetchmany(10_000)
                if not rows:
                    break
                yield from rows


class SQLiteDataSource(DataSource):
    """``spark.read.format("sqlite_fdw").option("path", ...).option("table", ...)``"""

    @classmethod
    def name(cls) -> str:
        return "sqlite_fdw"

    def schema(self) -> StructType:
        return _sqlite_schema(self.options["path"], self.options["table"])

    def reader(self, schema: StructType) -> SQLiteReader:
        return SQLiteReader(schema, dict(self.options))


def register_fdw(spark: SparkSession) -> None:
    """CREATE FOREIGN DATA WRAPPER — idempotent per session."""
    if not getattr(spark, "_sqlite_fdw_registered", False):
        # runtime SQL conf; required for DataSourceReader.pushFilters
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        spark.dataSource.register(SQLiteDataSource)
        spark._sqlite_fdw_registered = True


def read_foreign_table(
    spark: SparkSession, path: str, table: str, num_partitions: int = 4
) -> DataFrame:
    """CREATE FOREIGN TABLE ... SERVER sqlite OPTIONS (...) + SELECT."""
    register_fdw(spark)
    return (
        spark.read.format("sqlite_fdw")
        .option("path", path)
        .option("table", table)
        .option("numPartitions", str(num_partitions))
        .load()
    )


def create_sqlite_table(path: str, table: str, rows: list[dict]) -> None:
    """Test/demo helper: materialize rows into a sqlite file (the 'remote
    server' side of the FDW)."""
    if not rows:
        raise ValueError("need at least one row to infer the remote schema")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cols = list(rows[0].keys())

    def decl(v) -> str:
        if isinstance(v, bool) or isinstance(v, int):
            return "INTEGER"
        if isinstance(v, float):
            return "REAL"
        if isinstance(v, (bytes, bytearray)):
            return "BLOB"
        return "TEXT"

    ddl = ", ".join(f'"{c}" {decl(rows[0][c])}' for c in cols)
    with closing(sqlite3.connect(path)) as conn:
        conn.execute(f'DROP TABLE IF EXISTS "{table}"')
        conn.execute(f'CREATE TABLE "{table}" ({ddl})')
        conn.executemany(
            f'INSERT INTO "{table}" VALUES ({", ".join("?" for _ in cols)})',
            [tuple(r[c] for c in cols) for r in rows],
        )
        conn.commit()
