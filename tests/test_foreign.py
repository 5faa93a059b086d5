"""ForeignScan / FDW via the Spark 4 Python Data Source API.

Reference behavior: ExecForeignScan (nodeForeignscan.c:89) with
postgres_fdw-style remote qual pushdown (contrib/postgres_fdw).
"""

import pytest

from gpdb_spark.operators.foreign import (
    create_sqlite_table,
    read_foreign_table,
)


@pytest.fixture(scope="module")
def fdw_db(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fdw") / "remote.db")
    rows = [
        dict(id=i, name=f"name_{i:03d}", val=i * 0.5, tag=None if i % 10 == 0 else f"t{i % 3}")
        for i in range(500)
    ]
    create_sqlite_table(path, "items", rows)
    return path, rows


def test_foreign_scan_roundtrip(spark, fdw_db):
    path, rows = fdw_db
    df = read_foreign_table(spark, path, "items", num_partitions=4)
    assert df.count() == len(rows)
    assert [f.name for f in df.schema.fields] == ["id", "name", "val", "tag"]
    # parallel splits: rowid ranges → one task each
    assert df.rdd.getNumPartitions() == 4
    got = {r.id: (r.name, r.val, r.tag) for r in df.collect()}
    for r in rows:
        assert got[r["id"]] == (r["name"], r["val"], r["tag"])


def test_foreign_filter_pushdown(spark, fdw_db):
    path, rows = fdw_db
    df = read_foreign_table(spark, path, "items", num_partitions=2)
    q = df.where(
        (df.id >= 100)
        & (df.id < 200)
        & df.name.startswith("name_1")
        & df.tag.isNotNull()
    )
    expected = [
        r
        for r in rows
        if 100 <= r["id"] < 200
        and r["name"].startswith("name_1")
        and r["tag"] is not None
    ]
    assert q.count() == len(expected)
    # all conjuncts are deparsable → the optimized plan absorbs the
    # Filter node into the scan entirely (remote WHERE evaluation)
    optimized = q._jdf.queryExecution().optimizedPlan().toString()
    assert "Filter" not in optimized


def test_foreign_unsupported_filter_stays_local(spark, fdw_db):
    path, rows = fdw_db
    df = read_foreign_table(spark, path, "items", num_partitions=2)
    # modulo is not deparsable — Spark must evaluate it post-scan
    q = df.where("id % 7 = 0 and id > 50")
    expected = [r for r in rows if r["id"] % 7 == 0 and r["id"] > 50]
    assert q.count() == len(expected)
    optimized = q._jdf.queryExecution().optimizedPlan().toString()
    assert "Filter" in optimized  # the local residual


def test_foreign_in_and_string_ops(spark, fdw_db):
    path, rows = fdw_db
    df = read_foreign_table(spark, path, "items", num_partitions=3)
    q = df.where(df.tag.isin("t1", "t2") & df.name.endswith("7"))
    expected = [
        r
        for r in rows
        if r["tag"] in ("t1", "t2") and r["name"].endswith("7")
    ]
    assert q.count() == len(expected)


def test_foreign_like_escape_semantics(spark):
    """'%' and '_' inside a pushed contains() pattern must be escaped —
    a literal underscore match must not degrade to LIKE's any-char."""
    import tempfile, os

    path = os.path.join(tempfile.mkdtemp(), "esc.db")
    create_sqlite_table(
        path,
        "t",
        [dict(id=1, s="a_b"), dict(id=2, s="axb"), dict(id=3, s="a%b")],
    )
    df = read_foreign_table(spark, path, "t", num_partitions=1)
    assert [r.id for r in df.where(df.s.contains("_")).collect()] == [1]
    assert [r.id for r in df.where(df.s.contains("%")).collect()] == [3]


def test_foreign_empty_table(spark):
    import tempfile, os, sqlite3

    path = os.path.join(tempfile.mkdtemp(), "empty.db")
    create_sqlite_table(path, "t", [dict(id=1, s="x")])
    with sqlite3.connect(path) as conn:
        conn.execute("DELETE FROM t")
        conn.commit()
    df = read_foreign_table(spark, path, "t")
    assert df.count() == 0


# ---------------------------------------------------------------- dblink


def test_dblink_basic_and_schema_sniff(spark, fdw_db):
    from gpdb_spark.operators.dblink import dblink

    path, rows = fdw_db
    df = dblink(
        spark, path, "SELECT id, name, val FROM items WHERE id < 10"
    )
    got = sorted((r.id, r.name, r.val) for r in df.collect())
    assert got == [(i, f"name_{i:03d}", i * 0.5) for i in range(10)]
    # sniffed types: int -> long, float -> double, text -> string
    kinds = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert kinds == {"id": "bigint", "name": "string", "val": "double"}


def test_dblink_arbitrary_remote_sql(spark, fdw_db):
    """The whole aggregate runs remotely — dblink ships SQL, not tables."""
    from gpdb_spark.operators.dblink import dblink

    path, _ = fdw_db
    df = dblink(
        spark,
        f"dbname={path}",
        "SELECT tag, COUNT(*) AS n, SUM(val) AS s FROM items "
        "WHERE tag IS NOT NULL GROUP BY tag",
    )
    assert df.rdd.getNumPartitions() == 1  # single remote cursor
    got = {r.tag: (r.n, r.s) for r in df.collect()}
    assert set(got) == {"t0", "t1", "t2"}
    assert sum(n for n, _ in got.values()) == 450  # 500 minus 50 NULL-tag


def test_dblink_named_connections_and_exec(spark, tmp_path):
    from gpdb_spark.operators.dblink import (
        dblink,
        dblink_connect,
        dblink_disconnect,
        dblink_exec,
        dblink_get_connections,
    )
    from gpdb_spark.operators.foreign import create_sqlite_table

    path = str(tmp_path / "side.db")
    create_sqlite_table(path, "kv", [dict(k=1, v="a"), dict(k=2, v="b")])

    assert dblink_connect("side", f"dbname={path}") == "OK"
    assert "side" in dblink_get_connections()
    with pytest.raises(ValueError):
        dblink_connect("side", f"dbname={path}")  # duplicate name

    assert dblink_exec("side", "INSERT INTO kv VALUES (3, 'c')") == (
        "INSERT 0 1"
    )
    assert dblink_exec("side", "UPDATE kv SET v = 'z' WHERE k <= 2") == (
        "UPDATE 2"
    )
    got = sorted(
        (r.k, r.v)
        for r in dblink(spark, "side", "SELECT k, v FROM kv").collect()
    )
    assert got == [(1, "z"), (2, "z"), (3, "c")]

    assert dblink_disconnect("side") == "OK"
    assert "side" not in dblink_get_connections()
    with pytest.raises(ValueError):
        dblink_disconnect("side")


def test_dblink_explicit_schema_and_empty_result(spark, fdw_db):
    from gpdb_spark.operators.dblink import dblink

    path, _ = fdw_db
    df = dblink(
        spark, path, "SELECT id, name FROM items WHERE id < 0",
        schema="id long, name string",
    )
    assert df.collect() == []
    assert [f.name for f in df.schema.fields] == ["id", "name"]


def test_dblink_remote_cursor_paced_fetch(spark, fdw_db):
    """dblink_open/fetch/close (dblink.c:378,558,473): explicitly paced
    remote cursor; each fetch bounded by the caller's n."""
    from gpdb_spark.operators.dblink import (
        dblink_close,
        dblink_fetch,
        dblink_open,
    )

    path, _ = fdw_db
    assert dblink_open(path, "c1", "SELECT id FROM items ORDER BY id") == "OK"
    with pytest.raises(ValueError, match="already open"):
        dblink_open(path, "c1", "SELECT 1")

    first = [r.id for r in dblink_fetch(spark, path, "c1", 3).collect()]
    assert first == [0, 1, 2]
    second = [r.id for r in dblink_fetch(spark, path, "c1", 2).collect()]
    assert second == [3, 4]
    # drain: fetch more than remain, then EOF fetch is empty
    rest = dblink_fetch(spark, path, "c1", 10_000).collect()
    assert len(rest) == 495
    assert dblink_fetch(spark, path, "c1", 5).collect() == []

    assert dblink_close(path, "c1") == "OK"
    with pytest.raises(ValueError, match="not open"):
        dblink_close(path, "c1")
    with pytest.raises(ValueError, match="not open"):
        dblink_fetch(spark, path, "c1", 1)


def test_dblink_pkey_and_sql_builders(tmp_path):
    """dblink_get_pkey + dblink_build_sql_insert/_delete/_update
    (dblink.c:1517,1641,1732,1809)."""
    import sqlite3 as s3

    from gpdb_spark.operators.dblink import (
        dblink_build_sql_delete,
        dblink_build_sql_insert,
        dblink_build_sql_update,
        dblink_exec,
        dblink_get_pkey,
    )

    path = str(tmp_path / "pk.db")
    with s3.connect(path) as db:
        db.execute(
            "CREATE TABLE t (a INTEGER, b TEXT, c REAL, PRIMARY KEY (a, b))"
        )
        db.execute("INSERT INTO t VALUES (1, 'x', 0.5)")
        db.commit()

    assert dblink_get_pkey(path, "t") == [(1, "a"), (2, "b")]
    with pytest.raises(ValueError, match="not found"):
        dblink_get_pkey(path, "missing")

    ins = dblink_build_sql_insert("t", ["a", "b", "c"], [2, "it's", None])
    assert ins == (
        "INSERT INTO \"t\" (\"a\", \"b\", \"c\") "
        "VALUES (2, 'it''s', NULL)"
    )
    upd = dblink_build_sql_update("t", ["a", "b"], [1, "x"], {"c": 9.0})
    dele = dblink_build_sql_delete("t", ["a", "b"], [2, "it's"])

    # the generated SQL actually runs against the remote side
    assert dblink_exec(path, ins) == "INSERT 0 1"
    assert dblink_exec(path, upd) == "UPDATE 1"
    assert dblink_exec(path, dele) == "DELETE 1"
    with s3.connect(path) as db:
        assert db.execute("SELECT a, b, c FROM t").fetchall() == [(1, "x", 9.0)]


def test_dblink_quote_ident_escapes_embedded_quotes(tmp_path):
    """Round-6 advice regression: table/column names containing '"' must
    be escaped by doubling (dblink.c uses quote_ident) — bare f'"{name}"'
    produced malformed/injected SQL. The generated statements must both
    LOOK right and actually run against a remote table whose identifiers
    embed a double quote."""
    import sqlite3 as s3

    from gpdb_spark.operators.dblink import (
        dblink_build_sql_delete,
        dblink_build_sql_insert,
        dblink_build_sql_update,
        dblink_exec,
        dblink_get_pkey,
    )

    path = str(tmp_path / "quoted.db")
    with s3.connect(path) as db:
        db.execute(
            'CREATE TABLE "we""ird" ("a""x" INTEGER PRIMARY KEY, b TEXT)'
        )
        db.commit()

    assert dblink_get_pkey(path, 'we"ird') == [(1, 'a"x')]
    ins = dblink_build_sql_insert('we"ird', ['a"x', "b"], [1, "v"])
    assert ins == (
        'INSERT INTO "we""ird" ("a""x", "b") VALUES (1, \'v\')'
    )
    upd = dblink_build_sql_update('we"ird', ['a"x'], [1], {"b": "w"})
    dele = dblink_build_sql_delete('we"ird', ['a"x'], [1])
    assert dblink_exec(path, ins) == "INSERT 0 1"
    assert dblink_exec(path, upd) == "UPDATE 1"
    assert dblink_exec(path, dele) == "DELETE 1"


def test_dblink_fetch_stable_schema_with_nulls(spark, tmp_path):
    """Review regression: the cursor's record schema is fixed at open
    (probe), so a batch whose column is all-NULL still builds, and
    successive fetches share one schema."""
    from gpdb_spark.operators.dblink import (
        dblink_close,
        dblink_fetch,
        dblink_open,
    )
    from gpdb_spark.operators.foreign import create_sqlite_table

    path = str(tmp_path / "nulls.db")
    create_sqlite_table(
        path, "t",
        [dict(k=1, v="a"), dict(k=2, v=None), dict(k=3, v=None)],
    )
    dblink_open(path, "c", "SELECT k, v FROM t ORDER BY k")
    b1 = dblink_fetch(spark, path, "c", 1)
    b2 = dblink_fetch(spark, path, "c", 2)  # v all-NULL in this batch
    assert b1.schema == b2.schema
    assert [r.v for r in b2.collect()] == [None, None]
    dblink_close(path, "c")


def test_dblink_sniff_widens_mixed_storage_classes(spark, tmp_path):
    """Review regression: SQLite columns are dynamically typed — int
    then float must widen to double (scanning ALL probed rows, not the
    first non-NULL), and the reader coerces rows onto the schema."""
    import sqlite3 as s3

    from gpdb_spark.operators.dblink import dblink

    path = str(tmp_path / "mixed.db")
    with s3.connect(path) as db:
        db.execute("CREATE TABLE m (x NUMERIC, y TEXT)")
        db.executemany(
            "INSERT INTO m VALUES (?, ?)",
            [(1, None), (2.5, "b"), (3, "c")],
        )
        db.commit()
    df = dblink(spark, path, "SELECT x, y FROM m ORDER BY rowid")
    assert df.schema["x"].dataType.simpleString() == "double"
    assert [r.x for r in df.collect()] == [1.0, 2.5, 3.0]


def test_dblink_quote_lit_edge_types(tmp_path):
    """Review regression: bool (an int subclass), bytes, and
    non-finite floats in the SQL builders."""
    import sqlite3 as s3

    import pytest as _pytest

    from gpdb_spark.operators.dblink import (
        dblink_build_sql_insert,
        dblink_exec,
    )

    path = str(tmp_path / "lit.db")
    with s3.connect(path) as db:
        db.execute("CREATE TABLE t (b INTEGER, blob BLOB, f REAL)")
        db.commit()
    ins = dblink_build_sql_insert("t", ["b", "blob", "f"],
                                  [True, b"\x01\xff", 0.5])
    assert "X'01ff'" in ins and "(1, " in ins
    assert dblink_exec(path, ins) == "INSERT 0 1"
    with s3.connect(path) as db:
        assert db.execute("SELECT b, blob, f FROM t").fetchall() == [
            (1, b"\x01\xff", 0.5)
        ]
    with _pytest.raises(ValueError, match="non-finite"):
        dblink_build_sql_insert("t", ["f"], [float("inf")])


def test_dblink_bare_path_with_equals_sign(tmp_path):
    """Round-5 review regression: hive-style directory names contain
    '=', which the substring connstring test misread as a connection
    string and rejected."""
    import sqlite3

    from gpdb_spark.operators.dblink import _resolve_path

    d = tmp_path / "run=5"
    d.mkdir()
    p = str(d / "side.db")
    sqlite3.connect(p).close()
    assert _resolve_path(p) == p
    assert _resolve_path("dbname=/x/y.db host=h") == "/x/y.db"


def test_dblink_single_execution(spark, tmp_path):
    """Round-5 review fix: an unpinned dblink() must execute the remote
    SQL exactly once when the result fits the probe, and at most
    once-plus-bounded-probe when it doesn't (was: full double
    execution via the plan-time schema sniff)."""
    import sqlite3

    from gpdb_spark.operators.dblink import dblink

    p = str(tmp_path / "exec_count.db")
    with sqlite3.connect(p) as c:
        c.execute("CREATE TABLE t (v INTEGER)")
        c.executemany("INSERT INTO t VALUES (?)", [(i,) for i in range(50)])
        # a side-effect counter incremented per execution via a trigger
        # isn't possible for SELECT; instead assert the small-result
        # path returns local rows (no data source scan node)
        c.commit()
    small = dblink(spark, p, "SELECT count(*) AS n FROM t")
    assert "dblink" not in small._jdf.queryExecution().executedPlan().toString()
    assert small.collect()[0].n == 50
    big = dblink(spark, p, "SELECT v FROM t")
    assert big.count() == 50  # > probe horizon: served by the reader


def test_dblink_cursor_prefetch_buffer_order(spark, tmp_path):
    """Round-5 review fix: the cursor schema is widened from the LIVE
    cursor's prefetched head (one remote execution); fetches must drain
    that buffer first and cross into fresh rows without gap or reorder."""
    import sqlite3

    from gpdb_spark.operators.dblink import (
        dblink_close,
        dblink_fetch,
        dblink_open,
    )

    p = str(tmp_path / "cur.db")
    with sqlite3.connect(p) as c:
        c.execute("CREATE TABLE t (v INTEGER)")
        c.executemany("INSERT INTO t VALUES (?)", [(i,) for i in range(50)])
        c.commit()
    dblink_open(p, "c1", "SELECT v FROM t ORDER BY v")
    a = [r.v for r in dblink_fetch(spark, p, "c1", 10).collect()]
    b = [r.v for r in dblink_fetch(spark, p, "c1", 30).collect()]
    c_ = [r.v for r in dblink_fetch(spark, p, "c1", 30).collect()]
    dblink_close(p, "c1")
    assert a == list(range(10))
    assert b == list(range(10, 40))   # crosses the 21-row prefetch buffer
    assert c_ == list(range(40, 50))  # exhausted tail


def test_dblink_open_rejects_dml_without_side_effect(spark, tmp_path):
    """Round-5 review regression: non-row-returning cursor SQL must
    fail with a clear error AND roll back (close without commit) so the
    failed open leaves no remote side effect."""
    import sqlite3

    import pytest

    from gpdb_spark.operators.dblink import dblink_open

    p = str(tmp_path / "dml.db")
    with sqlite3.connect(p) as c:
        c.execute("CREATE TABLE t (v INTEGER)")
        c.commit()
    with pytest.raises(ValueError, match="must return rows"):
        dblink_open(p, "c1", "INSERT INTO t VALUES (1)")
    with sqlite3.connect(p) as c:
        assert c.execute("SELECT count(*) FROM t").fetchone()[0] == 0
