"""Unit tests for GPDB-specific type modules: complex, sparse vectors,
full-text — the pieces not already covered by an oracle-checked query
(svec_dot / svec_plus / to_tsvector)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def svec_df(spark):
    from gpdb_spark.functions.svec import svec_from_dense

    data = [
        (1, [0.0, 2.0, 0.0, -3.0]),
        (2, [1.0, 0.0, 4.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(data, "id long, dense array<double>")
    return df.select("id", svec_from_dense(F.col("dense")).alias("sv"), "dense")


def test_svec_dot_matches_dense(svec_df):
    from gpdb_spark.functions.svec import svec_dot

    a = svec_df.where("id = 1").select(F.col("sv").alias("a")).first()
    rows = (
        svec_df.crossJoin(
            svec_df.where("id = 1").select(F.col("sv").alias("other"))
        )
        .select("id", svec_dot(F.col("sv"), F.col("other")).alias("d"))
        .collect()
    )
    got = {r.id: r.d for r in rows}
    # dense dots vs [0,2,0,-3]: id1 = 4+9 = 13, id2 = 0, id3 = 0
    assert got == {1: 13.0, 2: 0.0, 3: 0.0}


def test_svec_plus_and_to_dense(svec_df, spark):
    from gpdb_spark.functions.svec import svec_plus, svec_to_dense

    pair = (
        svec_df.where("id = 1")
        .select(F.col("sv").alias("a"))
        .crossJoin(svec_df.where("id = 2").select(F.col("sv").alias("b")))
    )
    out = pair.select(
        svec_to_dense(svec_plus(F.col("a"), F.col("b")), 4).alias("d")
    ).first()
    assert out.d == [1.0, 2.0, 4.0, -3.0]


def test_svec_empty_support(svec_df):
    from gpdb_spark.functions.svec import svec_l2norm, svec_nnz

    r = (
        svec_df.where("id = 3")
        .select(svec_nnz(F.col("sv")).alias("n"), svec_l2norm(F.col("sv")).alias("l2"))
        .first()
    )
    assert r.n == 0 and r.l2 == 0.0


def test_complex_identities(spark):
    from gpdb_spark.functions.complex import c_abs, c_arg, c_conj, c_make, c_mul

    df = spark.createDataFrame([(3.0, 4.0)], "re double, im double")
    z = c_make(F.col("re"), F.col("im"))
    r = df.select(
        c_abs(z).alias("mod"),
        c_mul(z, c_conj(z))["re"].alias("zzbar_re"),
        c_mul(z, c_conj(z))["im"].alias("zzbar_im"),
        c_arg(z).alias("arg"),
    ).first()
    assert r.mod == 5.0
    assert r.zzbar_re == 25.0 and r.zzbar_im == 0.0
    assert math.isclose(r.arg, math.atan2(4.0, 3.0))


def test_to_tsvector_counts(spark):
    from gpdb_spark.functions.fulltext import to_tsvector

    df = spark.createDataFrame([("the cat and the hat",)], "text string")
    out = df.select(to_tsvector(F.col("text")).alias("v")).first().v
    got = {r["lexeme"]: r["tf"] for r in out}
    assert got == {"the": 2, "cat": 1, "and": 1, "hat": 1}
    # sorted lexeme order
    assert [r["lexeme"] for r in out] == sorted(got)


def test_ts_match_modes(spark):
    from gpdb_spark.functions.fulltext import ts_match

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha delta"), (3, "beta")],
        "doc_id long, text string",
    )
    all_ids = {r.doc_id for r in ts_match(df, ["alpha", "beta"], "all").collect()}
    any_ids = {r.doc_id for r in ts_match(df, ["alpha", "beta"], "any").collect()}
    assert all_ids == {1}
    assert any_ids == {1, 2, 3}


def test_named_timezone_dst(spark):
    """from_utc_timestamp with a named zone must apply DST: the same UTC
    wall-clock maps to EST (-05) in January and EDT (-04) in July —
    checked against Python zoneinfo ground truth."""
    from datetime import datetime, timezone
    from zoneinfo import ZoneInfo

    rows = [(datetime(2024, 1, 15, 12, 0),), (datetime(2024, 7, 15, 12, 0),)]
    df = spark.createDataFrame(rows, "ts timestamp")
    got = [
        r.local
        for r in df.select(
            F.from_utc_timestamp("ts", "America/New_York").alias("local")
        ).orderBy("local").collect()
    ]
    want = sorted(
        ts.replace(tzinfo=timezone.utc)
        .astimezone(ZoneInfo("America/New_York"))
        .replace(tzinfo=None)
        for (ts,) in rows
    )
    assert got == want
    assert got[0].hour == 7 and got[1].hour == 8  # EST -5, EDT -4


def test_range_type_semantics(spark):
    """rangetypes.c edge semantics: emptiness, unbounded sides,
    inclusive/exclusive touching, intersection emptiness."""
    from gpdb_spark.functions import ranges as R

    df = spark.range(1)

    def val(col):
        return df.select(col.alias("v")).collect()[0].v

    def rng(lo, hi, bounds="[)"):
        mk = lambda x: F.lit(x).cast("double") if x is not None else F.lit(None).cast("double")
        return R.range_make(mk(lo), mk(hi), bounds)

    # emptiness: lo > hi, or lo = hi unless []
    assert val(R.range_is_empty(rng(5, 3)))
    assert val(R.range_is_empty(rng(4, 4, "[)")))
    assert not val(R.range_is_empty(rng(4, 4, "[]")))
    # unbounded sides are never empty and contain accordingly
    assert not val(R.range_is_empty(rng(None, 3)))
    assert val(R.range_contains_elem(rng(None, 3), F.lit(-1e9)))
    assert val(R.range_contains_elem(rng(3, None), F.lit(1e9)))
    # element containment honors bound inclusivity
    assert val(R.range_contains_elem(rng(1, 2, "[]"), F.lit(2.0)))
    assert not val(R.range_contains_elem(rng(1, 2, "[)"), F.lit(2.0)))
    # touching ranges overlap only when both touching bounds inclusive
    assert val(R.range_overlaps(rng(1, 2, "[]"), rng(2, 3, "[]")))
    assert not val(R.range_overlaps(rng(1, 2, "[)"), rng(2, 3, "[]")))
    # containment: empty contained in everything; unbounded contains all
    assert val(R.range_contains(rng(5, 3), rng(7, 6)))
    assert val(R.range_contains(rng(0, 10), rng(5, 3)))
    assert val(R.range_contains(rng(None, None), rng(-1e6, 1e6, "[]")))
    assert not val(R.range_contains(rng(0, 10, "[)"), rng(5, 10, "[]")))
    # intersection of disjoint ranges is empty; overlap keeps bounds
    assert val(R.range_is_empty(R.range_intersect(rng(0, 1), rng(2, 3))))
    inter = R.range_intersect(rng(0, 5, "[]"), rng(3, 9, "[)"))
    assert val(R.range_lower(inter)) == 3.0
    assert val(R.range_upper(inter)) == 5.0
    assert not val(R.range_is_empty(inter))


def test_misc_types_semantics(spark):
    """dbsize.c pg_size_pretty thresholds; network.c inet operators;
    varbit.c bit ops."""
    from gpdb_spark.functions import misc_types as M

    df = spark.range(1)

    def val(col):
        return df.select(col.alias("v")).collect()[0].v

    # pg_size_pretty: PG-documented outputs at the unit boundaries
    assert val(M.pg_size_pretty(F.lit(10239))) == "10239 bytes"
    assert val(M.pg_size_pretty(F.lit(10240))) == "10 kB"
    assert val(M.pg_size_pretty(F.lit(1536))) == "1536 bytes"
    assert val(M.pg_size_pretty(F.lit(1024 * 1024 * 21))) == "21 MB"
    assert val(M.pg_size_pretty(F.lit(5_368_709_120))) == "5120 MB"
    assert val(M.pg_size_pretty(F.lit(1024**4 * 3))) == "3072 GB"

    # inet
    assert val(M.inet_network(F.lit("10.1.2.3/24"))) == "10.1.2.0/24"
    assert val(M.inet_masklen(F.lit("10.1.2.3"))) == 32
    assert val(M.inet_host(F.lit("10.1.2.3/24"))) == "10.1.2.3"
    assert val(M.inet_broadcast(F.lit("10.1.0.0/16"))) == "10.1.255.255/16"
    assert val(
        M.inet_contained_in(F.lit("192.168.1.5"), F.lit("192.168.1.0/24"))
    )
    assert not val(
        M.inet_contained_in(F.lit("192.168.2.5"), F.lit("192.168.1.0/24"))
    )
    # << is strict: a net is not contained in itself
    assert not val(
        M.inet_contained_in(F.lit("192.168.1.0/24"), F.lit("192.168.1.0/24"))
    )

    # varbit (length 8): B'10110000' ops
    b = F.lit(0b10110000)
    assert val(M.bit_to_string(b, 8)) == "10110000"
    assert val(M.bit_not(b, 8)) == 0b01001111
    assert val(M.bit_shiftl(b, 2, 8)) == 0b11000000  # dropped high bits
    assert val(M.get_bit(b, 0, 8)) == 1
    assert val(M.get_bit(b, 3, 8)) == 1
    assert val(M.get_bit(b, 1, 8)) == 0
    assert val(M.set_bit(b, 7, 1, 8)) == 0b10110001
    assert val(M.bit_xor(b, F.lit(0b11111111), 8)) == 0b01001111


def test_geometry_semantics(spark):
    """geo_ops.c operator semantics on hand-checked fixtures."""
    from gpdb_spark.functions import geometry as G

    df = spark.range(1)
    P = lambda x, y: G.point(F.lit(float(x)), F.lit(float(y)))
    row = df.select(
        G.pt_distance(P(0, 0), P(3, 4)).alias("d"),
        G.box_area(G.box(P(5, 1), P(1, 3))).alias("area"),  # normalized
        G.box_contains_pt(G.box(P(0, 0), P(2, 2)), P(2, 2)).alias("on_corner"),
        G.box_contains_pt(G.box(P(0, 0), P(2, 2)), P(2.1, 2)).alias("outside"),
        G.box_overlap(G.box(P(0, 0), P(2, 2)), G.box(P(2, 2), P(3, 3))).alias("touch"),
        G.box_overlap(G.box(P(0, 0), P(2, 2)), G.box(P(2.5, 2.5), P(3, 3))).alias("apart"),
        G.box_contains_box(G.box(P(0, 0), P(4, 4)), G.box(P(1, 1), P(2, 2))).alias("bb"),
        G.circle_contains_pt(G.circle(P(0, 0), F.lit(5.0)), P(3, 4)).alias("on_rim"),
        G.circle_distance(
            G.circle(P(0, 0), F.lit(1.0)), G.circle(P(10, 0), F.lit(2.0))
        ).alias("cd"),
        G.circle_distance(
            G.circle(P(0, 0), F.lit(5.0)), G.circle(P(1, 0), F.lit(5.0))
        ).alias("cd_overlap"),
        G.pt_add(P(1, 2), P(3, 4)).alias("padd"),
    ).first()
    assert row.d == 5.0
    assert row.area == 8.0  # |5-1| * |3-1|
    assert row.on_corner and not row.outside
    assert row.touch and not row.apart
    assert row.bb
    assert row.on_rim  # closed boundary, distance == r
    assert row.cd == 7.0 and row.cd_overlap == 0.0
    assert (row.padd.x, row.padd.y) == (4.0, 6.0)


def test_polygon_ray_crossing(spark):
    """point_inside: concave polygon, points in the notch are outside."""
    from gpdb_spark.functions import geometry as G

    # U-shape: notch between x=2..4 above y=2
    verts = [(0, 0), (6, 0), (6, 5), (4, 5), (4, 2), (2, 2), (2, 5), (0, 5)]
    poly = F.array(
        *[G.point(F.lit(float(x)), F.lit(float(y))) for x, y in verts]
    )
    cases = [  # (x, y, expected_inside)
        (1.0, 4.0, True),   # left arm
        (5.0, 4.0, True),   # right arm
        (3.0, 4.0, False),  # inside the notch
        (3.0, 1.0, True),   # base below the notch
        (7.0, 1.0, False),  # right of everything
        (-1.0, -1.0, False),
    ]
    df = spark.createDataFrame([(x, y) for x, y, _ in cases], "x double, y double")
    got = df.select(
        "x", "y", G.poly_contains_pt(poly, G.point(F.col("x"), F.col("y"))).alias("i")
    ).collect()
    expected = {(x, y): e for x, y, e in cases}
    for r in got:
        assert r.i == expected[(r.x, r.y)], (r.x, r.y)


def test_money_semantics(spark):
    """cash.c: parse/format roundtrip, negatives, exact multiply."""
    from gpdb_spark.functions.misc_types import money_in, money_mul, money_out

    df = spark.createDataFrame(
        [("$1,234.56",), ("-$5.00",), ("($7.25)",), ("$0.01",), ("$ -3.50",)],
        "m string",
    )
    rows = df.select(money_in(F.col("m")).alias("cents")).collect()
    assert [r.cents for r in rows] == [123456, -500, -725, 1, -350]

    out = (
        spark.createDataFrame([(123456,), (-123456,), (5,), (0,)], "c long")
        .select(money_out(F.col("c")).alias("s"))
        .collect()
    )
    assert [r.s for r in out] == ["$1,234.56", "-$1,234.56", "$0.05", "$0.00"]

    mul = (
        spark.createDataFrame([(10,), (50,), (1000,)], "c long")
        .select(money_mul(F.col("c"), F.lit(0.075)).alias("t"))
        .collect()
    )
    # 0.75 -> 1 (half-up), 3.75 -> 4, 75 exact
    assert [r.t for r in mul] == [1, 4, 75]


def test_xml_escaping_and_xpath(spark):
    """xml.c escape_xml: & < > in content, quotes in attributes; xpath
    recovers the original value after unescaping."""
    from gpdb_spark.functions import xml as X

    df = spark.createDataFrame([('a<b>&"c"',)], "v string")
    doc = df.select(
        X.xmlelement(
            "t", {"a": F.col("v")}, X.xmltext(F.col("v"))
        ).alias("doc")
    )
    row = doc.first()
    assert row.doc == '<t a="a&lt;b&gt;&amp;&quot;c&quot;">a&lt;b&gt;&amp;"c"</t>'
    back = doc.select(X.xpath_string(F.col("doc"), F.lit("/t")).alias("s")).first()
    assert back.s == 'a<b>&"c"'
    # empty element form
    empty = spark.range(1).select(X.xmlelement("e").alias("d")).first()
    assert empty.d == "<e/>"
    # xmlforest drops NULL args
    forest = (
        spark.createDataFrame([("x", None)], "a string, b string")
        .select(X.xmlforest(a=F.col("a"), b=F.col("b")).alias("f"))
        .first()
    )
    assert forest.f == "<a>x</a>"


def test_ts_overlaps_null_endpoints(spark):
    """Review regression: all-NULL pair must yield NULL, not TRUE."""
    from pyspark.sql import functions as F

    from gpdb_spark.functions.pg import ts_overlaps

    df = spark.range(1)
    ts = lambda s: F.lit(s).cast("timestamp")  # noqa: E731
    r = df.select(
        ts_overlaps(ts(None), ts(None), ts("2020-01-01"), ts("2020-01-02"))
        .alias("nn"),
        ts_overlaps(ts("2020-01-01"), ts("2020-01-03"),
                    ts("2020-01-02"), ts("2020-01-04")).alias("yes"),
        ts_overlaps(ts("2020-01-01"), ts("2020-01-02"),
                    ts("2020-01-03"), ts("2020-01-04")).alias("no"),
        ts_overlaps(ts("2020-01-01"), ts("2020-01-01"),
                    ts("2020-01-01"), ts("2020-01-05")).alias("pt"),
    ).collect()[0]
    assert r.nn is None and r.yes and not r.no and r.pt


def test_age_parts_negative_direction(spark):
    """Review regression: a < b must mirror PG's uniformly-signed
    interval fields (age is antisymmetric)."""
    from pyspark.sql import functions as F

    from gpdb_spark.functions.pg import age_parts

    df = spark.range(1)
    d = lambda s: F.lit(s).cast("date")  # noqa: E731
    r = df.select(
        age_parts(d("2001-01-01"), d("2001-02-01")).alias("neg"),
        age_parts(d("2001-02-01"), d("2001-01-01")).alias("pos"),
        age_parts(d("2003-03-10"), d("2001-06-25")).alias("big"),
    ).collect()[0]
    assert (r.neg.years, r.neg.months, r.neg.days) == (0, -1, 0)
    assert (r.pos.years, r.pos.months, r.pos.days) == (0, 1, 0)
    assert (r.big.years, r.big.months, r.big.days) == (1, 8, 15)


def test_int_div_exact_past_2_53(spark):
    """Review regression: integral division must be exact beyond the
    double mantissa (the float formulation lost low bits)."""
    from pyspark.sql import functions as F

    from gpdb_spark.functions.pg import int_div

    r = spark.range(1).select(
        int_div(F.lit(1152921504606846977), F.lit(3)).alias("q"),
        int_div(F.lit(-7), F.lit(2)).alias("t"),  # truncates toward 0
    ).collect()[0]
    assert r.q == 384307168202282325
    assert r.t == -3


def test_ts_overlaps_single_null_matches_reference_branches(spark):
    """Round-5 review regression: the FULL overlaps_timestamp branch
    table — a single NULL endpoint makes the known one the START with
    an unknown end, so the result is TRUE when that start falls
    strictly inside the other interval, NULL when unresolvable, never
    a definite FALSE from a collapsed point."""
    from pyspark.sql import functions as F

    from gpdb_spark.functions.pg import ts_overlaps

    df = spark.range(1)
    ts = lambda s: F.lit(s).cast("timestamp")  # noqa: E731
    r = df.select(
        # (01-01, NULL) vs (01-02, 01-04): ts1 < ts2, te1 unknown -> NULL
        ts_overlaps(ts("2020-01-01"), ts(None),
                    ts("2020-01-02"), ts("2020-01-04")).alias("a"),
        # (01-03, NULL) vs (01-02, 01-04): ts1 inside [ts2,te2) -> TRUE
        ts_overlaps(ts("2020-01-03"), ts(None),
                    ts("2020-01-02"), ts("2020-01-04")).alias("b"),
        # (01-09, NULL) vs (01-02, 01-04): ts1 >= te2, te1 unknown -> NULL
        ts_overlaps(ts("2020-01-09"), ts(None),
                    ts("2020-01-02"), ts("2020-01-04")).alias("c"),
        # NULL start swaps: (NULL, 01-03) == start 01-03 -> TRUE
        ts_overlaps(ts(None), ts("2020-01-03"),
                    ts("2020-01-02"), ts("2020-01-04")).alias("d"),
        # equal starts with one unknown end -> NULL
        ts_overlaps(ts("2020-01-02"), ts(None),
                    ts("2020-01-02"), ts("2020-01-04")).alias("e"),
    ).collect()[0]
    assert r.a is None and r.b is True and r.c is None
    assert r.d is True and r.e is None


def test_age_parts_null_propagates(spark):
    """Round-5 review regression: greatest/least skip NULLs, so a NULL
    input collapsed to age=(0,0,0); PG age(NULL, x) is NULL."""
    from pyspark.sql import functions as F

    from gpdb_spark.functions.pg import age_parts

    df = spark.range(1)
    d = lambda s: F.lit(s).cast("date")  # noqa: E731
    r = df.select(
        age_parts(d(None), d("2020-01-01")).alias("a"),
        age_parts(d("2020-01-01"), d(None)).alias("b"),
    ).collect()[0]
    assert r.a.years is None and r.a.months is None and r.a.days is None
    assert r.b.years is None and r.b.months is None and r.b.days is None
