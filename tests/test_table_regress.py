"""Round-9 table-backed regress machinery (VERDICT r08 What's-missing
#1 / Next #4): geo-typed table columns with canonical-text storage and
UDF-routed runtime operators, ALTER TYPE ADD VALUE with pg_enum.c
sortorder assignment, and the dialect passes the table files needed
(OFFSET-before-LIMIT, ORDER BY USING, IN (VALUES ...), regtype).

The full conformance numbers live in tools/pg_table_probe.py (runs the
reference's own point/box/lseg/path/circle/enum/select/limit files
end-to-end against expected/*.out); these tests pin the mechanisms so
a regression fails fast in pytest.
"""

import pytest


class TestDialectTablePasses:
    def test_offset_before_limit(self, spark):
        from gpdb_spark.dialect import translate

        q = translate(
            "SELECT unique1 FROM t ORDER BY unique1 OFFSET 990 LIMIT 5")
        assert "LIMIT 5 OFFSET 990" in q

    def test_order_by_using(self):
        from gpdb_spark.dialect import translate

        q = translate("SELECT a FROM t ORDER BY a using >, b using <")
        assert "DESC" in q and "ASC" in q and "using" not in q.lower()

    def test_in_values(self, spark):
        from gpdb_spark.dialect import translate

        r = spark.sql(translate(
            "SELECT 1 AS x WHERE (1,1) in (values (1,1), (20,0))"
        )).collect()
        assert r[0][0] == 1

    def test_regtype_drops(self):
        from gpdb_spark.dialect import translate

        q = translate("SELECT 'rainbow'::regtype AS t")
        assert "regtype" not in q.lower()

    def test_generate_series_bare_alias_names_column(self, spark):
        from gpdb_spark.dialect import translate

        # parse_relation.c: a bare SRF table alias names the column
        r = spark.sql(translate(
            "SELECT n FROM generate_series(1, 3) AS n ORDER BY n"
        )).collect()
        assert [x[0] for x in r] == [1, 2, 3]


class TestGeoTableColumns:
    @pytest.fixture()
    def eng(self, spark, tmp_path, monkeypatch):
        from gpdb_spark.dialect import reset_geo_columns
        from gpdb_spark.engine import Engine

        monkeypatch.chdir(tmp_path)
        reset_geo_columns()
        return Engine(spark)

    def test_point_table_end_to_end(self, eng):
        eng.sql("CREATE TABLE pt9_tbl (f1 point)")
        eng.sql("INSERT INTO pt9_tbl VALUES ('(0.0,0.0)'), "
                "('(-10.0,0.0)'), ('(5.1, 34.5)')")
        # storage image is canonical (point_out)
        rows = {r[0] for r in eng.sql("SELECT f1 FROM pt9_tbl").collect()}
        assert rows == {"(0,0)", "(-10,0)", "(5.1,34.5)"}
        # runtime operator over the column (geo_ops.c point_left)
        left = eng.sql(
            "SELECT f1 FROM pt9_tbl WHERE f1 << '(0.0, 0.0)'"
        ).collect()
        assert [r[0] for r in left] == ["(-10,0)"]
        # coordinate subscript + distance to a typed constant
        d = eng.sql(
            "SELECT f1[0] AS x, f1 <-> point '(0,0)' AS dist "
            "FROM pt9_tbl WHERE f1[0] > 1"
        ).collect()
        assert d[0][0] == 5.1 and abs(d[0][1] - 34.874919354745465) < 1e-9

    def test_bad_point_insert_refuses(self, eng):
        eng.sql("CREATE TABLE pt9b_tbl (f1 point)")
        with pytest.raises(Exception, match="invalid input|point"):
            eng.sql("INSERT INTO pt9b_tbl VALUES ('asdfasdf')")
        with pytest.raises(Exception, match="invalid input|point"):
            eng.sql("INSERT INTO pt9b_tbl VALUES ('(10.0 10.0)')")
        assert eng.sql("SELECT count(*) AS n FROM pt9b_tbl"
                       ).collect()[0][0] == 0

    def test_box_area_ops_over_column(self, eng):
        eng.sql("CREATE TABLE box9_tbl (f1 box)")
        eng.sql("INSERT INTO box9_tbl VALUES ('(2,2),(0,0)'), "
                "('(3,3),(1,1)')")
        r = eng.sql(
            "SELECT area(f1) AS a FROM box9_tbl WHERE f1 = box "
            "'(4,1),(0,0)' ORDER BY a"
        ).collect()
        # both boxes have area 4 = the probe box's area (box_eq:751)
        assert [x[0] for x in r] == [4.0, 4.0]


class TestEnumAlterType:
    def test_sortorder_assignment(self, spark):
        from gpdb_spark.engine import Engine

        eng = Engine(spark)
        eng.sql("CREATE TYPE planets9 AS ENUM ('venus','earth','mars')")
        eng.sql("ALTER TYPE planets9 ADD VALUE 'uranus'")
        eng.sql("ALTER TYPE planets9 ADD VALUE 'mercury' BEFORE 'venus'")
        eng.sql("ALTER TYPE planets9 ADD VALUE 'saturn' BEFORE 'uranus'")
        eng.sql("ALTER TYPE planets9 ADD VALUE 'jupiter' AFTER 'mars'")
        eng.sql("ALTER TYPE planets9 ADD VALUE 'neptune' AFTER 'uranus'")
        rows = eng.sql(
            "SELECT enumlabel, enumsortorder FROM pg_enum "
            "WHERE enumtypid = 'planets9'::regtype ORDER BY 2"
        ).collect()
        # pg_enum.c AddEnumLabel: ends get +/-1, middles the midpoint
        assert [(r[0], r[1]) for r in rows] == [
            ("mercury", 0.0), ("venus", 1.0), ("earth", 2.0),
            ("mars", 3.0), ("jupiter", 3.25), ("saturn", 3.5),
            ("uranus", 4.0), ("neptune", 5.0),
        ]

    def test_float4_renumber(self, spark):
        from gpdb_spark.engine import Engine

        eng = Engine(spark)
        eng.sql("CREATE TYPE insenum9 AS ENUM ('L1', 'L2')")
        for i in range(1, 31):
            eng.sql(f"ALTER TYPE insenum9 ADD VALUE 'i{i}' BEFORE 'L2'")
        rows = eng.sql(
            "SELECT enumlabel, enumsortorder FROM pg_enum "
            "WHERE enumtypid = 'insenum9'::regtype ORDER BY 2"
        ).collect()
        # regress enum.sql: at least 20 splits before the float4
        # renumber, after which the prefix is integer 1..20
        prefix = [(r[0], r[1]) for r in rows[:21]]
        assert prefix[0] == ("L1", 1.0)
        assert prefix[1:21] == [
            (f"i{k}", float(k + 1)) for k in range(1, 21)
        ]

    def test_duplicate_label_refuses(self, spark):
        from gpdb_spark.engine import Engine

        eng = Engine(spark)
        eng.sql("CREATE TYPE dup9 AS ENUM ('a','b')")
        with pytest.raises(Exception, match="already exists"):
            eng.sql("ALTER TYPE dup9 ADD VALUE 'a'")
        # IF NOT EXISTS swallows it
        eng.sql("ALTER TYPE dup9 ADD VALUE IF NOT EXISTS 'a'")
