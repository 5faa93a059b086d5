"""tsvector/tsquery type layer + time-of-day front door (round 7).

Every pinned value below is taken from the reference's own regress
goldens (src/test/regress/expected/tstypes.out, horology.out) — the
full files are swept by tools/pg_golden_probe.py (tstypes: 106/106
GOLD_AGREE); these tests keep the load-bearing semantics from
regressing without paying a probe run per pytest.
"""

from __future__ import annotations

import pytest

from gpdb_spark.functions.tstypes import (
    TSSyntaxError,
    legacy_crc32,
    numnode,
    parse_tsquery,
    parse_tsvector,
    pg_float4_text,
    render_tsquery,
    render_tsvector,
    to_tsvector_simple,
    ts_match,
    ts_rank,
    ts_rank_cd,
    tsq_and,
    tsq_not,
    tsq_or,
    tsquery_cmp,
    tsvector_concat,
    tsvector_setweight,
    tsvector_strip,
)


@pytest.mark.parametrize("inp,expected", [
    ("1", "'1'"),
    (" 1 ", "'1'"),
    ("1 2", "'1' '2'"),
    ("'1 2'", "'1 2'"),
    ("'1 \\'2'3", "'1 ''2' '3'"),
    ("'1 \\'2' ' 3' 4 ", "' 3' '1 ''2' '4'"),
    # backslash escapes + byte-order sort + output doubling
    (r"'\\as' ab\c ab\\c AB\\\c ab\\\\c",
     r"'AB\\c' '\\as' 'ab\\\\c' 'ab\\c' 'abc'"),
    # '*' is weight A in tsvector input; D renders bare; numeric sort
    ("w:12B w:13* w:12,5,6 a:1,3* a:3 w asd:1dc asd zxc:81,567,222A",
     "'a':1,3A 'asd':1C 'w':5,6,12B,13A 'zxc':81,222A,567"),
])
def test_tsvector_in_out(inp, expected):
    assert render_tsvector(parse_tsvector(inp)) == expected


def test_tsvector_concat_shifts_right_positions():
    a = parse_tsvector("a:3A b:2a")
    b = parse_tsvector("ba:1234 a:1B")
    assert render_tsvector(tsvector_concat(a, b)) == \
        "'a':3A,4B 'b':2A 'ba':1237"


def test_setweight_and_strip():
    v = parse_tsvector(
        "w:12B w:13* w:12,5,6 a:1,3* a:3 w asd:1dc asd zxc:81,567,222A")
    assert render_tsvector(tsvector_setweight(v, "c")) == \
        "'a':1C,3C 'asd':1C 'w':5C,6C,12C,13C 'zxc':81C,222C,567C"
    assert render_tsvector(tsvector_strip(v)) == "'a' 'asd' 'w' 'zxc'"
    with pytest.raises(TSSyntaxError):
        tsvector_setweight(v, "x")


@pytest.mark.parametrize("inp,expected", [
    ("!1", "!'1'"),
    ("!(!1|!2)", "!( !'1' | !'2' )"),
    ("1&(2)", "'1' & '2'"),
    ("!(1&2)", "!( '1' & '2' )"),
    ("1|2&3", "'1' | '2' & '3'"),
    ("(1|2)&3", "( '1' | '2' ) & '3'"),
    # OR parenthesizes itself unless root; AND never does (infix())
    ("1|2|4|5|6", "( ( ( '1' | '2' ) | '4' ) | '5' ) | '6'"),
    ("1|(2|(4|(5|6)))", "'1' | ( '2' | ( '4' | ( '5' | '6' ) ) )"),
    ("1&2&4&5&6", "'1' & '2' & '4' & '5' & '6'"),
    ("1&(2&(4&(5|!6)))", "'1' & '2' & '4' & ( '5' | !'6' )"),
    # modifiers: prefix ':*' first, weights in A,B,C,D order
    ("a:* & nbb:*ac | doo:a* | goo",
     "( 'a':* & 'nbb':*AC | 'doo':*A ) | 'goo'"),
])
def test_tsquery_in_out(inp, expected):
    assert render_tsquery(parse_tsquery(inp)) == expected


def test_tsquery_combinators():
    q = parse_tsquery
    assert render_tsquery(tsq_and(q("foo & bar"), q("asd"))) == \
        "'foo' & 'bar' & 'asd'"
    assert render_tsquery(tsq_or(q("foo & bar"), q("asd & fg"))) == \
        "'foo' & 'bar' | 'asd' & 'fg'"
    assert render_tsquery(tsq_or(q("foo & bar"), tsq_not(q("asd & fg")))) \
        == "'foo' & 'bar' | !( 'asd' & 'fg' )"


def test_tsquery_compare():
    """CompareTSQ: item count first, then operand bytes, then the
    inverted-op tree walk (tstypes.out's four < probes)."""
    q = parse_tsquery
    assert tsquery_cmp(q("a"), q("b & c")) < 0
    assert tsquery_cmp(q("a | f"), q("b & c")) < 0
    assert tsquery_cmp(q("a | ff"), q("b & c")) > 0
    assert tsquery_cmp(q("a | f | g"), q("b & c")) > 0
    assert tsquery_cmp(q("a & b"), q("a & b")) == 0
    assert numnode(q("new & york | qwery")) == 5


def test_legacy_crc32_signed_image():
    # deterministic, matches itself; equality only for equal words
    assert legacy_crc32(b"a") != legacy_crc32(b"b")
    assert legacy_crc32(b"word") == legacy_crc32(b"word")
    assert -(2**31) <= legacy_crc32(b"zxc") < 2**31


@pytest.mark.parametrize("query,expected", [
    ("d:AC & ca", True),
    ("d:AC & ca:B", True),
    ("d:AC & ca:C", False),
    ("d:AC & ca:CB", True),
    ("d:AC & c:*C", False),
    ("d:AC & c:*CB", True),
])
def test_ts_match_weights_and_prefix(query, expected):
    tsv = parse_tsvector("a b:89  ca:23A,64b d:34c")
    assert ts_match(tsv, parse_tsquery(query)) is expected


def test_ts_match_prefix_and_stripped():
    assert not ts_match(parse_tsvector("supernova"), parse_tsquery("super"))
    assert ts_match(parse_tsvector("supernova"), parse_tsquery("super:*"))
    # stripped entries match weighted operands (checkcondition_str)
    assert ts_match(parse_tsvector("w"), parse_tsquery("w:A"))
    # NOT over an empty/absent lexeme
    assert ts_match(to_tsvector_simple(""), parse_tsquery("!foo"))
    assert ts_match(to_tsvector_simple("x y q y"), parse_tsquery("!foo"))


def test_to_tsvector_simple_positions():
    assert render_tsvector(to_tsvector_simple("x y q y")) == \
        "'q':3 'x':1 'y':2,4"


@pytest.mark.parametrize("vec,query,expected", [
    (" a:1 s:2C d g", "a | s", "0.0911891"),
    (" a:1 sa:2C d g", "a | s", "0.0303964"),
    (" a:1 sa:2C d g", "a | sa:*", "0.0911891"),
    (" a:1 s:2B d g", "a | s", "0.151982"),
    (" a:1 s:2 d g", "a | s", "0.0607927"),
    (" a:1 s:2C d g", "a & s", "0.140153"),
    (" a:1 s:2B d g", "a & s", "0.198206"),
    (" a:1 s:2 d g", "a & s", "0.0991032"),
])
def test_ts_rank_float4_images(vec, query, expected):
    got = pg_float4_text(ts_rank(parse_tsvector(vec), parse_tsquery(query)))
    assert got == expected


@pytest.mark.parametrize("vec,query,expected", [
    (" a:1 s:2C d g", "a | s", "0.3"),
    (" a:1 sa:2C d g", "a | s", "0.1"),
    (" a:1 sa:3C sab:2c d g", "a | sa:*", "0.5"),
    (" a:1 s:2B d g", "a | s", "0.5"),
    (" a:1 s:2 d g", "a | s", "0.2"),
    (" a:1 s:2C d g", "a & s", "0.133333"),
    (" a:1 s:2B d g", "a & s", "0.16"),
    (" a:1 s:2 d g", "a & s", "0.1"),
])
def test_ts_rank_cd_float4_images(vec, query, expected):
    got = pg_float4_text(
        ts_rank_cd(parse_tsvector(vec), parse_tsquery(query)))
    assert got == expected


def test_ts_syntax_errors_are_loud():
    for bad in ("a:0", "a:", "!", "1|", "(1", "a b:1x2"):
        with pytest.raises(TSSyntaxError):
            parse_tsquery(bad) if any(c in bad for c in "!|&(") \
                else parse_tsvector(bad)


# ------------------------------------------------------- dialect folds
def test_dialect_ts_fold_translations():
    from gpdb_spark.dialect import translate

    assert translate("SELECT '1 2'::tsvector") == "SELECT '''1'' ''2'''"
    assert translate(
        "SELECT 'a b'::tsvector @@ 'a & b' AS m") == "SELECT TRUE AS m"
    assert translate("SELECT numnode('a|b'::tsquery) AS n") == \
        "SELECT 3 AS n"
    with pytest.raises(ValueError):
        translate("SELECT 'a:0'::tsvector")


def test_dialect_time_fold_translations():
    from gpdb_spark.dialect import translate

    assert translate("SELECT time '01:30' + interval '02:01' AS t") == \
        "SELECT TIME '03:31:00' AS t"
    assert translate("SELECT time '01:30' - interval '02:01' AS t") == \
        "SELECT TIME '23:29:00' AS t"
    assert translate("SELECT time '02:30' + interval '36:01' AS t") == \
        "SELECT TIME '14:31:00' AS t"
    # months drop out of time arithmetic (time_pl_interval)
    assert translate(
        "SELECT time '03:30' + interval '1 month 04:01' AS t") == \
        "SELECT TIME '07:31:00' AS t"
    assert translate("SELECT date '1991-02-03' - time '04:05:06' AS t") \
        == "SELECT timestamp '1991-02-02 19:54:54' AS t"
    assert "04:05:06.789" in translate(
        "SELECT time without time zone '040506.789+08'")
    for bad in (
        "SELECT time with time zone '01:30-08'",
        "SELECT '11:00-5'::timetz",
        "SELECT time '24:00'",
        "SELECT time '25:00'",
    ):
        with pytest.raises(ValueError):
            translate(bad)


def test_time_runtime_ops(spark):
    """Non-folded TIME paths run natively under the TimeType flag."""
    from gpdb_spark.dialect import pg_sql

    rows = pg_sql(
        spark,
        "SELECT (time '13:30:15' - time '01:00:00')::text AS d, "
        "extract(minute from time '13:30:15')::int8 AS m, "
        "('08:01:02'::time < time '09:00')::text AS lt",
    ).collect()
    assert rows[0]["m"] == 30
    assert rows[0]["lt"] == "true"
