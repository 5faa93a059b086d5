"""PL/pgSQL subset interpreter (src/pl/plpgsql: pl_gram.y grammar,
pl_exec.c executor): control flow on the driver, every SQL statement
distributed — the reference's coordinator/segment split."""

from __future__ import annotations

import pytest

from gpdb_spark.engine import Engine
from gpdb_spark.plpgsql import PlPgSqlError

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark, SF)


def test_scalar_function_loop_and_if(eng):
    eng.create_function("""
    CREATE FUNCTION fact(n int) RETURNS bigint AS $$
    DECLARE
      r bigint := 1;
      i int;
    BEGIN
      IF n < 0 THEN
        RAISE EXCEPTION 'negative input %', n;
      END IF;
      FOR i IN 2..n LOOP
        r := r * i;
      END LOOP;
      RETURN r;
    END;
    $$ LANGUAGE plpgsql""")
    assert eng.call("fact", 6) == 720
    assert eng.call("fact", 0) == 1
    with pytest.raises(PlPgSqlError, match="negative input -2"):
        eng.call("fact", -2)


def test_while_exit_continue(eng):
    eng.create_function("""
    CREATE FUNCTION sum_odd(n int) RETURNS bigint AS $$
    DECLARE
      total bigint := 0;
      i int := 0;
    BEGIN
      WHILE TRUE LOOP
        i := i + 1;
        EXIT WHEN i > n;
        CONTINUE WHEN i % 2 = 0;
        total := total + i;
      END LOOP;
      RETURN total;
    END;
    $$ LANGUAGE plpgsql""")
    assert eng.call("sum_odd", 10) == 25  # 1+3+5+7+9


def test_table_function_return_query(eng):
    eng.create_function("""
    CREATE FUNCTION nations_of(rname text) RETURNS TABLE(n_name text, n_nationkey bigint) AS $$
    BEGIN
      RETURN QUERY
        SELECT n.n_name, n.n_nationkey
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = rname
        ORDER BY n.n_name;
    END;
    $$ LANGUAGE plpgsql""")
    df = eng.call("nations_of", "ASIA")
    rows = df.collect()
    assert [r.n_name for r in rows] == sorted(r.n_name for r in rows)
    assert len(rows) == 5
    assert df.columns == ["n_name", "n_nationkey"]


def test_for_in_query_and_return_next(eng):
    eng.create_function("""
    CREATE FUNCTION region_sizes() RETURNS TABLE(r_regionkey bigint, n bigint) AS $$
    DECLARE
      rec record;
    BEGIN
      FOR rec IN SELECT n_regionkey, count(*) AS c FROM nation GROUP BY n_regionkey ORDER BY n_regionkey LOOP
        RETURN NEXT (rec.n_regionkey, rec.c);
      END LOOP;
    END;
    $$ LANGUAGE plpgsql""")
    rows = eng.call("region_sizes").collect()
    assert len(rows) == 5
    assert all(r.n == 5 for r in rows)


def test_select_into_and_found(eng):
    eng.create_function("""
    CREATE FUNCTION biggest_nation() RETURNS text AS $$
    DECLARE
      nm text;
      k bigint;
    BEGIN
      SELECT n_name, n_nationkey INTO nm, k
      FROM nation ORDER BY n_nationkey DESC LIMIT 1;
      IF NOT FOUND THEN
        RETURN 'none';
      END IF;
      RETURN nm;
    END;
    $$ LANGUAGE plpgsql""")
    out = eng.call("biggest_nation")
    assert isinstance(out, str) and len(out) > 0


def test_do_block_notices_and_dynamic_execute(eng):
    notices = eng.do("""
    DO $$
    DECLARE
      n bigint;
      tbl text := 'region';
    BEGIN
      EXECUTE 'SELECT count(*) FROM ' || tbl INTO n;
      RAISE NOTICE 'rows=%', n;
    END;
    $$""")
    assert notices == ["NOTICE: rows=5"]


def test_exception_block_recovers(eng):
    eng.create_function("""
    CREATE FUNCTION safe_div(a int, b int) RETURNS text AS $$
    BEGIN
      BEGIN
        IF b = 0 THEN
          RAISE EXCEPTION 'division by zero';
        END IF;
        RETURN 'ok';
      EXCEPTION WHEN OTHERS THEN
        RETURN 'caught: ' || sqlerrm;
      END;
    END;
    $$ LANGUAGE plpgsql""")
    assert eng.call("safe_div", 1, 1) == "ok"
    assert eng.call("safe_div", 1, 0) == "caught: division by zero"


def test_dml_and_get_diagnostics(eng, tmp_path):
    eng.create_table(
        "pl_t",
        eng.spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string"),
        str(tmp_path / "pl_t"),
        distributed_by=("k",),
    )
    eng.create_function("""
    CREATE FUNCTION bump(cutoff int) RETURNS bigint AS $$
    DECLARE
      n bigint;
    BEGIN
      UPDATE pl_t SET v = 'x' WHERE k > cutoff;
      GET DIAGNOSTICS n = ROW_COUNT;
      RETURN n;
    END;
    $$ LANGUAGE plpgsql""")
    assert eng.call("bump", 1) == 2
    assert eng.table("pl_t").where("v = 'x'").count() == 2


def test_run_script_routes_plpgsql(eng):
    rows = eng.run_script("""
    CREATE OR REPLACE FUNCTION twice(x int) RETURNS bigint AS $fn$
    BEGIN
      RETURN x * 2;
    END;
    $fn$ LANGUAGE plpgsql;
    DO $$ BEGIN RAISE NOTICE 'script ran'; END; $$;
    SELECT 1 AS one;
    """)
    assert rows[0].one == 1
    assert eng.call("twice", 21) == 42
    assert "NOTICE: script ran" in eng.notices()


def test_elsif_chain_and_reverse_for(eng):
    eng.create_function("""
    CREATE FUNCTION classify(x int) RETURNS text AS $$
    BEGIN
      IF x < 0 THEN
        RETURN 'neg';
      ELSIF x = 0 THEN
        RETURN 'zero';
      ELSIF x < 10 THEN
        RETURN 'small';
      ELSE
        RETURN 'big';
      END IF;
    END;
    $$ LANGUAGE plpgsql""")
    assert [eng.call("classify", v) for v in (-1, 0, 5, 50)] == [
        "neg", "zero", "small", "big"]
    eng.create_function("""
    CREATE FUNCTION countdown(n int) RETURNS text AS $$
    DECLARE
      acc text := '';
      i int;
    BEGIN
      FOR i IN REVERSE n..1 LOOP
        acc := acc || i;
      END LOOP;
      RETURN acc;
    END;
    $$ LANGUAGE plpgsql""")
    assert eng.call("countdown", 3) == "321"


def test_case_statement_searched_and_simple(eng):
    """exec_stmt_case (pl_exec.c:113): searched CASE picks the first
    true arm; simple CASE matches the selector against comma-lists."""
    eng.create_function("""
    CREATE FUNCTION fizz(n int) RETURNS text AS $$
    DECLARE out text;
    BEGIN
      CASE
        WHEN n % 15 = 0 THEN out := 'fizzbuzz';
        WHEN n % 3 = 0 THEN out := 'fizz';
        WHEN n % 5 = 0 THEN out := 'buzz';
        ELSE out := n::text;
      END CASE;
      RETURN out;
    END;
    $$ LANGUAGE plpgsql""")
    assert [eng.call("fizz", v) for v in (15, 9, 10, 7)] == [
        "fizzbuzz", "fizz", "buzz", "7"]
    eng.create_function("""
    CREATE FUNCTION simple_case(n int) RETURNS text AS $$
    BEGIN
      CASE n
        WHEN 1, 2 THEN RETURN 'low';
        WHEN 3 THEN RETURN 'mid';
        ELSE RETURN 'high';
      END CASE;
    END;
    $$ LANGUAGE plpgsql""")
    assert [eng.call("simple_case", v) for v in (1, 2, 3, 9)] == [
        "low", "low", "mid", "high"]


def test_case_not_found_raises(eng):
    """No matching arm and no ELSE = CASE_NOT_FOUND (exec_stmt_case)."""
    eng.create_function("""
    CREATE FUNCTION case_nf(n int) RETURNS text AS $$
    BEGIN
      CASE n WHEN 1 THEN RETURN 'one'; END CASE;
    END;
    $$ LANGUAGE plpgsql""")
    assert eng.call("case_nf", 1) == "one"
    import pytest as _pytest
    from gpdb_spark.plpgsql import PlPgSqlError
    with _pytest.raises(PlPgSqlError, match="case not found"):
        eng.call("case_nf", 2)


def test_foreach_array(eng):
    """exec_stmt_foreach_a (pl_exec.c:125): element iteration with
    EXIT/CONTINUE; empty array = zero iterations; NULL array errors."""
    eng.create_function("""
    CREATE FUNCTION sum_arr() RETURNS bigint AS $$
    DECLARE
      total bigint := 0;
      x int;
    BEGIN
      FOREACH x IN ARRAY ARRAY[1, 2, 3, 4, 5] LOOP
        CONTINUE WHEN x = 2;
        EXIT WHEN x = 5;
        total := total + x;
      END LOOP;
      RETURN total;
    END;
    $$ LANGUAGE plpgsql""")
    assert eng.call("sum_arr") == 1 + 3 + 4


def test_cursor_open_fetch_close(eng):
    """Bound parameterized cursor + FETCH INTO + FOUND + CLOSE
    (pl_exec.c exec_stmt_open/_fetch/_close)."""
    eng.create_function("""
    CREATE FUNCTION sum_region(rk int) RETURNS bigint AS $$
    DECLARE
      c CURSOR (k int) FOR
        SELECT n_nationkey FROM nation WHERE n_regionkey = k
        ORDER BY n_nationkey;
      v bigint;
      total bigint := 0;
    BEGIN
      OPEN c(rk);
      LOOP
        FETCH c INTO v;
        EXIT WHEN NOT found;
        total := total + v;
      END LOOP;
      CLOSE c;
      RETURN total;
    END;
    $$ LANGUAGE plpgsql""")
    import duckdb as _d  # independent expected value

    want = _d.sql(
        "SELECT sum(n_nationkey) FROM "
        "read_parquet('/root/testdata/sf0.001/nation.parquet') "
        "WHERE n_regionkey = 2"
    ).fetchone()[0]
    assert eng.call("sum_region", 2) == want


def test_refcursor_open_for(eng):
    """Unbound refcursor bound at OPEN ... FOR; exhausted FETCH nulls
    the target and clears FOUND; double-OPEN and FETCH-closed error."""
    eng.create_function("""
    CREATE FUNCTION first_two() RETURNS text AS $$
    DECLARE
      rc refcursor;
      nm text;
      acc text := '';
    BEGIN
      OPEN rc FOR SELECT n_name FROM nation ORDER BY n_nationkey LIMIT 2;
      FETCH NEXT FROM rc INTO nm;
      acc := acc || nm;
      FETCH rc INTO nm;
      acc := acc || ',' || nm;
      FETCH rc INTO nm;
      IF NOT found THEN
        acc := acc || ',<end>';
      END IF;
      CLOSE rc;
      RETURN acc;
    END;
    $$ LANGUAGE plpgsql""")
    out = eng.call("first_two")
    assert out.endswith(",<end>") and out.count(",") == 2

    from gpdb_spark.plpgsql import PlPgSqlError
    import pytest as _pytest

    eng.create_function("""
    CREATE FUNCTION fetch_closed() RETURNS int AS $$
    DECLARE c refcursor; v int;
    BEGIN
      FETCH c INTO v;
      RETURN v;
    END;
    $$ LANGUAGE plpgsql""")
    with _pytest.raises(PlPgSqlError, match="not open"):
        eng.call("fetch_closed")


def test_case_negative_modulo_uses_sql_semantics(eng):
    """Review regression: Python % floors (sign of divisor) but SQL %
    truncates (sign of dividend) — a negative operand must not take the
    driver fast path into the wrong CASE arm."""
    eng.create_function("""
    CREATE FUNCTION mod_sign(v int) RETURNS text AS $$
    BEGIN
      CASE
        WHEN v % 2 = 1 THEN RETURN 'odd+';
        WHEN v % 2 = -1 THEN RETURN 'odd-';
        ELSE RETURN 'even';
      END CASE;
    END;
    $$ LANGUAGE plpgsql""")
    assert eng.call("mod_sign", 3) == "odd+"
    assert eng.call("mod_sign", -3) == "odd-"  # SQL: -3 % 2 = -1
    assert eng.call("mod_sign", -4) == "even"


def test_end_case_extra_whitespace(eng):
    """Review regression: 'END  CASE' / 'END\\nLOOP' terminators with
    arbitrary whitespace must strip cleanly."""
    eng.create_function("""
    CREATE FUNCTION ws_term(v int) RETURNS int AS $$
    DECLARE r int := 0;
    BEGIN
      CASE WHEN v > 0 THEN r := 1;
           ELSE r := -1;
      END
      CASE;
      WHILE r < 3 LOOP
        r := r + 1;
      END  LOOP;
      RETURN r;
    END;
    $$ LANGUAGE plpgsql""")
    assert eng.call("ws_term", 5) == 3


def test_fetch_record_target_and_count_mismatch(eng):
    """Review regression: a single record target receives the whole row
    (rec.field works afterwards); a scalar-count mismatch errors."""
    eng.create_function("""
    CREATE FUNCTION rec_fetch() RETURNS text AS $$
    DECLARE
      c CURSOR FOR SELECT n_nationkey, n_name FROM nation
                   ORDER BY n_nationkey LIMIT 1;
      rec record;
    BEGIN
      OPEN c;
      FETCH c INTO rec;
      CLOSE c;
      RETURN rec.n_name || ':' || rec.n_nationkey;
    END;
    $$ LANGUAGE plpgsql""")
    out = eng.call("rec_fetch")
    assert ":" in out and out.split(":")[1].isdigit()

    from gpdb_spark.plpgsql import PlPgSqlError
    import pytest as _pytest

    eng.create_function("""
    CREATE FUNCTION bad_fetch() RETURNS int AS $$
    DECLARE
      c CURSOR FOR SELECT n_nationkey FROM nation LIMIT 1;
      a int; b int;
    BEGIN
      OPEN c;
      FETCH c INTO a, b;
      RETURN a;
    END;
    $$ LANGUAGE plpgsql""")
    with _pytest.raises(PlPgSqlError, match="target"):
        eng.call("bad_fetch")

    eng.create_function("""
    CREATE FUNCTION args_on_plain() RETURNS int AS $$
    DECLARE
      c CURSOR FOR SELECT n_nationkey FROM nation LIMIT 1;
      v int;
    BEGIN
      OPEN c(42);
      FETCH c INTO v;
      RETURN v;
    END;
    $$ LANGUAGE plpgsql""")
    with _pytest.raises(PlPgSqlError, match="no arguments"):
        eng.call("args_on_plain")


def test_for_over_cursor_and_auto_close(eng):
    """FOR rec IN bound_cursor(args) (exec_stmt_forc): the loop opens
    the cursor, streams rows, and closes it on exit — including EXIT —
    so a second pass can re-open it."""
    eng.create_function("""
    CREATE FUNCTION forc_names(rk int) RETURNS text AS $$
    DECLARE
      c CURSOR (k int) FOR
        SELECT n_name FROM nation WHERE n_regionkey = k
        ORDER BY n_name;
      rec record;
      acc text := '';
    BEGIN
      FOR rec IN c(rk) LOOP
        acc := acc || rec.n_name || ';';
      END LOOP;
      -- re-open immediately: proves the FOR loop closed it
      FOR rec IN c(rk) LOOP
        acc := acc || '+';
        EXIT;
      END LOOP;
      -- and EXIT also closed it
      FOR rec IN c(rk) LOOP
        acc := acc || '!';
        EXIT;
      END LOOP;
      RETURN acc;
    END;
    $$ LANGUAGE plpgsql""")
    out = eng.call("forc_names", 2)
    assert out.endswith(";+!")
    assert out.count(";") == 5  # 5 nations per region


def test_for_over_cursor_already_open_errors(eng):
    """PG: 'cursor ... already in use' when FOR tries to open an open
    cursor (exec_stmt_forc -> exec_stmt_open path)."""
    eng.create_function("""
    CREATE FUNCTION forc_clash() RETURNS int AS $$
    DECLARE
      c CURSOR FOR SELECT r_regionkey FROM region;
      rec record;
    BEGIN
      OPEN c;
      FOR rec IN c LOOP
      END LOOP;
      RETURN 1;
    END;
    $$ LANGUAGE plpgsql""")
    with pytest.raises(PlPgSqlError, match="already in use"):
        eng.call("forc_clash")


def test_move_skips_and_sets_found(eng):
    """MOVE advances without returning (exec_stmt_fetch is_move):
    skip 2, fetch 3rd; MOVE past the end clears FOUND."""
    eng.create_function("""
    CREATE FUNCTION third_region() RETURNS text AS $$
    DECLARE
      c CURSOR FOR SELECT r_name FROM region ORDER BY r_regionkey;
      v text;
      tail int := 0;
    BEGIN
      OPEN c;
      MOVE c;
      MOVE NEXT FROM c;
      FETCH c INTO v;
      -- 2 rows remain: MOVE twice more succeeds, third clears FOUND
      MOVE c; MOVE c;
      MOVE c;
      IF NOT found THEN
        tail := 1;
      END IF;
      CLOSE c;
      RETURN v || ':' || tail;
    END;
    $$ LANGUAGE plpgsql""")
    name = eng.call("third_region")
    import duckdb as _d

    want = _d.sql(
        "SELECT r_name FROM read_parquet("
        "'/root/testdata/sf0.01/region.parquet') "
        "ORDER BY r_regionkey LIMIT 1 OFFSET 2"
    ).fetchone()[0]
    assert name == f"{want}:1"


def test_move_on_closed_cursor_errors(eng):
    eng.create_function("""
    CREATE FUNCTION move_closed() RETURNS int AS $$
    DECLARE
      c CURSOR FOR SELECT 1;
    BEGIN
      MOVE c;
      RETURN 1;
    END;
    $$ LANGUAGE plpgsql""")
    with pytest.raises(PlPgSqlError, match="not open"):
        eng.call("move_closed")


def test_eval_constant_fast_paths_skip_spark(eng):
    """String literals ('' escapes, ::text cast), NULL, int ::text, and
    int IN-lists must evaluate without a Spark job — each miss costs a
    whole one-row job inside interpreter loops (round-5 timing audit:
    a 25-row FOR loop spent ~100 s on literal assignments)."""
    from gpdb_spark.plpgsql import Interpreter

    it = Interpreter(eng)

    class _Boom:
        def sql(self, q, *a, **k):  # any SQL fallback fails the test
            raise AssertionError(f"fast path missed, ran SQL: {q}")

    it.engine = _Boom()
    assert it.eval("'fizzbuzz'", {}) == "fizzbuzz"
    assert it.eval("'it''s'", {}) == "it's"
    assert it.eval("'x'::text", {}) == "x"
    assert it.eval("NULL", {}) is None
    assert it.eval("25::text", {}) == "25"
    assert it.eval("(2) IN (0, 1)", {}) is False
    assert it.eval("(1) IN (0, 1)", {}) is True
    assert it.eval("3 % 15 = 0", {}) is False

    it.engine = eng  # single-element IN isn't a Python tuple -> SQL path
    assert bool(it.eval("(5) IN (5)", {})) is True

def test_scroll_cursor_backward_directions(eng):
    """SCROLL cursor honors the full read_fetch_direction set:
    PRIOR/FIRST/LAST/ABSOLUTE/RELATIVE, including negative ABSOLUTE
    (from the end) and RELATIVE 0 (re-fetch current), with the SQL
    position model (before-first / on-row / after-last)."""
    eng.create_function("""
    CREATE FUNCTION scroll_walk() RETURNS text AS $$
    DECLARE
      c SCROLL CURSOR FOR
        SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 5;
      v int;
      acc text := '';
    BEGIN
      OPEN c;
      FETCH LAST FROM c INTO v;        -- 4
      acc := v::text;
      FETCH PRIOR FROM c INTO v;       -- 3
      acc := acc || ',' || v;
      FETCH ABSOLUTE 1 FROM c INTO v;  -- 0
      acc := acc || ',' || v;
      FETCH ABSOLUTE -2 FROM c INTO v; -- 3 (second from end)
      acc := acc || ',' || v;
      FETCH RELATIVE -1 FROM c INTO v; -- 2
      acc := acc || ',' || v;
      FETCH RELATIVE 0 FROM c INTO v;  -- 2 again, position unchanged
      acc := acc || ',' || v;
      FETCH FIRST FROM c INTO v;       -- 0
      acc := acc || ',' || v;
      -- walk past either end: targets nulled, FOUND cleared
      FETCH PRIOR FROM c INTO v;
      IF NOT found AND v IS NULL THEN acc := acc || ',<bof>'; END IF;
      FETCH LAST FROM c INTO v;
      FETCH NEXT FROM c INTO v;
      IF NOT found THEN acc := acc || ',<eof>'; END IF;
      -- after-last: PRIOR comes back to the last row
      FETCH PRIOR FROM c INTO v;
      acc := acc || ',' || v;
      CLOSE c;
      RETURN acc;
    END;
    $$ LANGUAGE plpgsql""")
    assert eng.call("scroll_walk") == "4,3,0,3,2,2,0,<bof>,<eof>,4"


def test_move_forward_backward_counts(eng):
    """MOVE-only count forms (FORWARD/BACKWARD n|ALL): FOUND reflects
    the processed count (exec_stmt_fetch is_move), and FORWARD -n is
    BACKWARD n."""
    eng.create_function("""
    CREATE FUNCTION move_counts() RETURNS text AS $$
    DECLARE
      c SCROLL CURSOR FOR
        SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 6;
      v int;
      acc text := '';
    BEGIN
      OPEN c;
      MOVE FORWARD 3 FROM c;           -- on row 3
      FETCH RELATIVE 0 FROM c INTO v;  -- nationkey 2
      acc := v::text;
      MOVE BACKWARD 2 FROM c;          -- on row 1
      FETCH RELATIVE 0 FROM c INTO v;  -- nationkey 0
      acc := acc || ',' || v;
      MOVE FORWARD ALL FROM c;         -- after last, processed 5 > 0
      IF found THEN acc := acc || ',fwd_all'; END IF;
      MOVE FORWARD 1 FROM c;           -- nothing left
      IF NOT found THEN acc := acc || ',empty'; END IF;
      MOVE BACKWARD ALL FROM c;        -- before first, processed 6
      IF found THEN acc := acc || ',bwd_all'; END IF;
      MOVE FORWARD -1 FROM c;          -- == BACKWARD 1: already at BOF
      IF NOT found THEN acc := acc || ',bof'; END IF;
      CLOSE c;
      RETURN acc;
    END;
    $$ LANGUAGE plpgsql""")
    assert eng.call("move_counts") == "2,0,fwd_all,empty,bwd_all,bof"


def test_no_scroll_cursor_rejects_backward(eng):
    """A NO SCROLL cursor stays streaming: forward ABSOLUTE works, any
    backward movement raises the reference's 'cursor can only scan
    forward' error."""
    eng.create_function("""
    CREATE FUNCTION fwd_abs() RETURNS int AS $$
    DECLARE
      c CURSOR FOR SELECT n_nationkey FROM nation ORDER BY n_nationkey;
      v int;
    BEGIN
      OPEN c;
      FETCH ABSOLUTE 4 FROM c INTO v;
      CLOSE c;
      RETURN v;
    END;
    $$ LANGUAGE plpgsql""")
    assert eng.call("fwd_abs") == 3

    eng.create_function("""
    CREATE FUNCTION bad_prior() RETURNS int AS $$
    DECLARE
      c NO SCROLL CURSOR FOR SELECT n_nationkey FROM nation;
      v int;
    BEGIN
      OPEN c;
      FETCH NEXT FROM c INTO v;
      FETCH PRIOR FROM c INTO v;
      RETURN v;
    END;
    $$ LANGUAGE plpgsql""")
    with pytest.raises(PlPgSqlError, match="can only scan forward"):
        eng.call("bad_prior")


def test_fetch_count_form_rejected(eng):
    """pl_gram.y rejects FETCH directions that return multiple rows
    (FORWARD n / ALL are MOVE-only)."""
    with pytest.raises(PlPgSqlError, match="cannot return multiple rows"):
        eng.create_function("""
        CREATE FUNCTION bad_fetch() RETURNS int AS $$
        DECLARE
          c CURSOR FOR SELECT 1;
          v int;
        BEGIN
          OPEN c;
          FETCH FORWARD 2 FROM c INTO v;
          RETURN v;
        END;
        $$ LANGUAGE plpgsql""")
        eng.call("bad_fetch")


def test_open_refcursor_scroll_for(eng):
    """OPEN ref SCROLL FOR query makes the ad-hoc cursor scrollable."""
    eng.create_function("""
    CREATE FUNCTION ref_scroll() RETURNS text AS $$
    DECLARE
      rc refcursor;
      v int;
      acc text := '';
    BEGIN
      OPEN rc SCROLL FOR SELECT n_nationkey FROM nation
        ORDER BY n_nationkey LIMIT 3;
      FETCH LAST FROM rc INTO v;
      acc := v::text;
      FETCH FIRST FROM rc INTO v;
      acc := acc || ',' || v;
      CLOSE rc;
      RETURN acc;
    END;
    $$ LANGUAGE plpgsql""")
    assert eng.call("ref_scroll") == "2,0"

def test_foreach_slice(eng):
    """FOREACH ... SLICE n (exec_stmt_foreach_a, pl_exec.c:2222): SLICE 1
    over a 2-D array yields rows; the default (SLICE 0) flattens to
    elements; SLICE equal to ndim yields the whole array once; SLICE
    beyond ndim raises the reference's range error."""
    eng.create_function("""
    CREATE FUNCTION slice_rows() RETURNS text AS $$
    DECLARE
      m int[][] := ARRAY[ARRAY[1,2,3], ARRAY[4,5,6]];
      row int[];
      v int;
      acc text := '';
      total int := 0;
    BEGIN
      FOREACH row SLICE 1 IN ARRAY m LOOP
        acc := acc || '[' || array_length(row, 1)::text || ']';
      END LOOP;
      FOREACH v IN ARRAY m LOOP
        total := total + v;
      END LOOP;
      FOREACH row SLICE 2 IN ARRAY m LOOP
        acc := acc || 'whole';
      END LOOP;
      RETURN acc || ':' || total;
    END;
    $$ LANGUAGE plpgsql""")
    assert eng.call("slice_rows") == "[3][3]whole:21"

    eng.create_function("""
    CREATE FUNCTION slice_range() RETURNS int AS $$
    DECLARE
      a int[] := ARRAY[1,2];
      x int[];
    BEGIN
      FOREACH x SLICE 2 IN ARRAY a LOOP
      END LOOP;
      RETURN 0;
    END;
    $$ LANGUAGE plpgsql""")
    with pytest.raises(PlPgSqlError, match="out of the valid range"):
        eng.call("slice_range")

def test_fetch_forward_from_and_move_bare_forms(eng):
    """Round-6 review regressions: FETCH FORWARD FROM c (no count) is
    FETCH NEXT — the direction parser must not eat FROM/IN as a count
    expression; MOVE accepts the bare-count and bare-ALL spellings
    (read_fetch_direction's returns_multiple_rows forms); FOREACH over
    an empty array runs zero iterations and SLICE n>0 over it is out of
    range (ARR_NDIM of '{}' is 0)."""
    eng.create_function("""
    CREATE FUNCTION fwd_from() RETURNS text AS $$
    DECLARE
      c SCROLL CURSOR FOR
        SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 5;
      v int;
      acc text := '';
    BEGIN
      OPEN c;
      FETCH FORWARD FROM c INTO v;   -- == NEXT
      acc := v::text;
      MOVE FORWARD IN c;             -- == NEXT, no count
      MOVE 2 FROM c;                 -- bare count
      FETCH RELATIVE 0 FROM c INTO v;
      acc := acc || ',' || v;
      MOVE ALL FROM c;               -- bare ALL
      IF found THEN acc := acc || ',all'; END IF;
      CLOSE c;
      RETURN acc;
    END;
    $$ LANGUAGE plpgsql""")
    assert eng.call("fwd_from") == "0,3,all"

    eng.create_function("""
    CREATE FUNCTION empty_foreach() RETURNS int AS $$
    DECLARE
      a int[] := ARRAY[]::int[];
      v int;
      n int := 0;
    BEGIN
      FOREACH v IN ARRAY a LOOP
        n := n + 1;
      END LOOP;
      RETURN n;
    END;
    $$ LANGUAGE plpgsql""")
    assert eng.call("empty_foreach") == 0

    eng.create_function("""
    CREATE FUNCTION empty_slice() RETURNS int AS $$
    DECLARE
      a int[] := ARRAY[]::int[];
      x int[];
    BEGIN
      FOREACH x SLICE 1 IN ARRAY a LOOP
      END LOOP;
      RETURN 0;
    END;
    $$ LANGUAGE plpgsql""")
    with pytest.raises(PlPgSqlError, match="valid range 0..0"):
        eng.call("empty_slice")
