"""Semantics tests for the contrib function packs (pg_trgm,
fuzzystrmatch, unaccent, orafce, earthdistance, pgcrypto) against
golden values from the reference modules' documented examples.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from gpdb_spark.functions import fuzzy, orafce, trgm


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


class TestTrgm:
    def test_show_trgm_cat(self, spark):
        # pg_trgm docs: show_trgm('cat') = {"  c"," ca","at ","cat"}
        got = _one(spark, trgm.show_trgm(F.lit("cat")))
        assert got == ["  c", " ca", "at ", "cat"]

    def test_similarity_word_two_words(self, spark):
        # pg_trgm docs: similarity('word', 'two words') = 4/11
        got = _one(spark, trgm.similarity(F.lit("word"), F.lit("two words")))
        assert got == pytest.approx(4 / 11, abs=1e-9)

    def test_case_and_punct_folded(self, spark):
        a = _one(spark, trgm.show_trgm(F.lit("Cat, DOG!")))
        b = _one(spark, trgm.show_trgm(F.lit("cat dog")))
        assert a == b

    def test_pct_operator_threshold(self, spark):
        assert _one(spark, trgm.is_similar(F.lit("word"), F.lit("word"))) is True
        assert (
            _one(spark, trgm.is_similar(F.lit("word"), F.lit("completely")))
            is False
        )


class TestFuzzy:
    def test_soundex_goldens(self, spark):
        # fuzzystrmatch simple-table algorithm (h/w are code 0):
        cases = {
            "Anne": "A500",
            "Andrew": "A536",
            "Margaret": "M626",
            "Pfister": "P236",
            "Ashcraft": "A226",  # Spark's builtin variant would say A261
            "Cat dog!": "C320",  # non-letters skipped, not separating
            "": "",
        }
        for w, want in cases.items():
            assert _one(spark, fuzzy.soundex(F.lit(w))) == want, w

    def test_difference(self, spark):
        assert _one(spark, fuzzy.difference(F.lit("Anne"), F.lit("Ann"))) == 4
        assert _one(spark, fuzzy.difference(F.lit("Anne"), F.lit("Andrew"))) == 2

    def test_levenshtein_less_equal(self, spark):
        assert (
            _one(spark, fuzzy.levenshtein(F.lit("kitten"), F.lit("sitting"))) == 3
        )
        # bounded form returns -1 past the threshold (PG returns bound+1;
        # the sentinel contract is Spark's — both signal "exceeded")
        assert (
            _one(spark, fuzzy.levenshtein(F.lit("kitten"), F.lit("sitting"), 2))
            == -1
        )


class TestOrafce:
    def test_add_months_last_day_rule(self, spark):
        d = F.lit("1997-02-28").cast("date")
        got = _one(spark, orafce.add_months_ora(d, 1))
        assert str(got) == "1997-03-31"  # Oracle rule; Spark builtin: 03-28
        mid = F.lit("1997-02-14").cast("date")
        assert str(_one(spark, orafce.add_months_ora(mid, 1))) == "1997-03-14"

    def test_decode_null_matches_null(self, spark):
        expr = orafce.decode(
            F.lit(None).cast("int"),
            F.lit(None).cast("int"), F.lit("was-null"),
            F.lit("other"),
        )
        assert _one(spark, expr) == "was-null"

    def test_lnnvl(self, spark):
        assert _one(spark, orafce.lnnvl(F.lit(None).cast("boolean"))) is True
        assert _one(spark, orafce.lnnvl(F.lit(False))) is True
        assert _one(spark, orafce.lnnvl(F.lit(True))) is False


class TestCrypto:
    def test_sha1_sha512_golden(self, spark):
        s = "gpdb-spark"
        assert _one(spark, F.sha1(F.lit(s))) == hashlib.sha1(
            s.encode()
        ).hexdigest()
        assert _one(spark, F.sha2(F.lit(s), 512)) == hashlib.sha512(
            s.encode()
        ).hexdigest()

    def test_aes_roundtrip(self, spark):
        key = "0123456789abcdef"
        expr = F.aes_decrypt(
            F.aes_encrypt(F.lit("secret payload"), F.lit(key), F.lit("ECB")),
            F.lit(key),
            F.lit("ECB"),
        ).cast("string")
        assert _one(spark, expr) == "secret payload"


class TestEarthDistance:
    def test_haversine_known_distance(self, spark):
        # London (51.5074, -0.1278) to Paris (48.8566, 2.3522): ~343.5 km
        # on the earthdistance sphere (R = 6378168 m).
        lat1, lon1, lat2, lon2 = 51.5074, -0.1278, 48.8566, 2.3522
        r = 6378168.0
        h = (
            math.sin(math.radians(lat2 - lat1) / 2) ** 2
            + math.cos(math.radians(lat1))
            * math.cos(math.radians(lat2))
            * math.sin(math.radians(lon2 - lon1) / 2) ** 2
        )
        want = 2 * r * math.asin(math.sqrt(h))
        dlat = F.radians(F.lit(lat2) - F.lit(lat1)) / 2
        dlon = F.radians(F.lit(lon2) - F.lit(lon1)) / 2
        hh = F.pow(F.sin(dlat), 2) + (
            F.cos(F.radians(F.lit(lat1)))
            * F.cos(F.radians(F.lit(lat2)))
            * F.pow(F.sin(dlon), 2)
        )
        got = _one(spark, 2.0 * F.lit(r) * F.asin(F.least(F.lit(1.0), F.sqrt(hh))))
        assert got == pytest.approx(want, rel=1e-12)
        assert 330_000 < got < 350_000


class TestHstore:
    def test_parse_quoted_and_spaced(self, spark):
        from gpdb_spark.functions import hstore

        m = hstore.hstore_parse(F.lit('"a" => "1" , b=>2'))
        assert _one(spark, hstore.fetch(m, "a")) == "1"
        assert _one(spark, hstore.fetch(m, "b")) == "2"
        assert _one(spark, hstore.fetch(m, "zzz")) is None

    def test_concat_right_wins(self, spark):
        from gpdb_spark.functions import hstore

        a = hstore.hstore_parse(F.lit("k=>old, x=>1"))
        b = hstore.hstore_parse(F.lit("k=>new"))
        merged = hstore.concat(a, b)
        assert _one(spark, hstore.fetch(merged, "k")) == "new"
        assert _one(spark, F.array_join(hstore.akeys(merged), ",")) == "k,x"


class TestLtree:
    def test_path_ops(self, spark):
        from gpdb_spark.functions import ltree

        p = F.lit("top.science.astronomy.cosmology")
        assert _one(spark, ltree.nlevel(p)) == 4
        assert _one(spark, ltree.subpath(p, 1, 2)) == "science.astronomy"
        assert _one(spark, ltree.subltree(p, 0, 2)) == "top.science"
        assert _one(spark, ltree.index(p, F.lit("astronomy.cosmology"))) == 2
        assert _one(spark, ltree.index(p, F.lit("physics"))) == -1

    def test_ancestor_and_lca(self, spark):
        from gpdb_spark.functions import ltree

        a, b = F.lit("top.a"), F.lit("top.a.b.c")
        assert _one(spark, ltree.is_ancestor(a, b)) is True
        assert _one(spark, ltree.is_ancestor(b, a)) is False
        # prefix-string false positive guard: top.ab is NOT under top.a
        assert _one(spark, ltree.is_ancestor(a, F.lit("top.ab"))) is False
        assert (
            _one(spark, ltree.lca(F.lit("top.a.b.x"), F.lit("top.a.c.y")))
            == "top.a"
        )
        assert _one(spark, ltree.lca(F.lit("m.n"), F.lit("q.r"))) == ""

    def test_lquery(self, spark):
        from gpdb_spark.functions import ltree

        rx = ltree.lquery_regex("top.*.cosmology")
        df = spark.createDataFrame(
            [("top.science.astronomy.cosmology",), ("top.cosmology",),
             ("top.science.cosmology.history",)],
            ["p"],
        )
        got = [r["m"] for r in df.select(F.col("p").rlike(rx).alias("m")).collect()]
        assert got == [True, True, False]

    def test_index_sub_longer_than_path(self, spark):
        from gpdb_spark.functions import ltree

        got = _one(spark, ltree.index(F.lit("a.b"), F.lit("a.b.c.d")))
        assert got == -1


class TestTsquery:
    def test_parse_precedence(self, spark):
        from gpdb_spark.functions.fulltext import parse_tsquery

        # ! binds tightest, then &, then | (tsquery.c operator table)
        assert parse_tsquery("a | b & !c") == (
            "or", ("term", "a"), ("and", ("term", "b"), ("not", ("term", "c")))
        )
        assert parse_tsquery("(a | b) & c") == (
            "and", ("or", ("term", "a"), ("term", "b")), ("term", "c")
        )

    def test_match_query(self, spark):
        from gpdb_spark.functions.fulltext import ts_match_query

        docs = spark.createDataFrame(
            [(1, "hash join wins"), (2, "merge sort only"),
             (3, "hash merge error"), (4, "hash merge fine")],
            ["doc_id", "text"],
        )
        got = sorted(
            r["doc_id"]
            for r in ts_match_query(docs, "hash & (join | merge) & !error").collect()
        )
        assert got == [1, 4]


class TestInet6:
    def test_expand_goldens(self, spark):
        from gpdb_spark.functions import misc_types as MT

        cases = {
            "2001:db8::1": "2001:0db8:0000:0000:0000:0000:0000:0001",
            "::1": "0000:0000:0000:0000:0000:0000:0000:0001",
            "fe80::": "fe80:0000:0000:0000:0000:0000:0000:0000",
            "2001:0DB8:AAAA:1:2:3:4:5": "2001:0db8:aaaa:0001:0002:0003:0004:0005",
        }
        for raw, want in cases.items():
            assert _one(spark, MT.inet6_expand(F.lit(raw))) == want, raw

    def test_bit_level_containment(self, spark):
        from gpdb_spark.functions import misc_types as MT

        # /60 is not group-aligned: 2001:db8:0:00X0::/60 distinguishes
        # the 4th nibble of group 4
        net = F.lit("2001:db8:0:10::/60")
        assert _one(
            spark, MT.inet6_contains(net, F.lit("2001:db8:0:1f::1"))
        ) is True
        assert _one(
            spark, MT.inet6_contains(net, F.lit("2001:db8:0:20::1"))
        ) is False


class TestUnaccent:
    def test_rule_table_matches_reference_file(self):
        """The embedded 187-rule table must be byte-identical to
        contrib/unaccent/unaccent.rules (skipped if the reference tree
        is absent)."""
        import os

        import pytest as _pytest

        from gpdb_spark.functions.unaccent import UNACCENT_DST, UNACCENT_SRC

        path = "/root/reference/contrib/unaccent/unaccent.rules"
        if not os.path.exists(path):
            _pytest.skip("reference rules file unavailable")
        src, dst = [], []
        for line in open(path, encoding="utf-8"):
            line = line.rstrip("\n")
            if line.strip():
                a, b = line.split("\t")[:2]
                src.append(a)
                dst.append(b)
        assert "".join(src) == UNACCENT_SRC
        assert "".join(dst) == UNACCENT_DST

    def test_nfd_consistency(self):
        """Independent check: every rule whose source NFD-decomposes to
        an ascii base letter maps exactly to that base letter."""
        import unicodedata

        from gpdb_spark.functions.unaccent import UNACCENT_DST, UNACCENT_SRC

        checked = 0
        for a, b in zip(UNACCENT_SRC, UNACCENT_DST):
            d = unicodedata.normalize("NFD", a)
            if len(d) > 1 and d[0].isascii():
                assert d[0] == b, (a, b, d)
                checked += 1
        assert checked > 100  # the bulk of the table is NFD-checkable

    def test_unaccent_column_and_codegen(self, spark):
        from pyspark.sql import functions as F

        from gpdb_spark.functions.unaccent import unaccent

        df = spark.createDataFrame(
            [("naïve café",), ("Ærø ß Łódź",), (None,), ("plain",)],
            "t string",
        )
        got = [r.u for r in df.select(unaccent("t").alias("u")).collect()]
        assert got == ["naive cafe", "Aro S Lodz", None, "plain"]
        plan = (
            df.select(unaccent("t"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "EvalPython" not in plan

    def test_unaccent_sql_expr_brace_safe(self):
        """Review regression: expr containing braces must pass through
        verbatim (no str.format re-scan)."""
        from gpdb_spark.functions.unaccent import (
            UNACCENT_SRC,
            unaccent_sql_expr,
        )

        out = unaccent_sql_expr("replace(t, '{', '')")
        assert out.startswith("translate(replace(t, '{', ''), ")
        assert UNACCENT_SRC in out


    def test_unaccent_randomized_vs_str_translate(self, spark):
        """One batched job: 300 random strings mixing rule-table chars
        with ascii/none vs Python str.translate over the same table."""
        import random

        from pyspark.sql import functions as F

        from gpdb_spark.functions.unaccent import (
            UNACCENT_DST,
            UNACCENT_SRC,
            unaccent,
        )

        rng = random.Random(5)
        pool = UNACCENT_SRC + "abc XYZ 123 ß.œ-"
        rows = [
            (i, "".join(rng.choice(pool) for _ in range(rng.randrange(0, 40))))
            for i in range(300)
        ]
        tbl = str.maketrans(UNACCENT_SRC, UNACCENT_DST)
        df = spark.createDataFrame(rows, "i int, t string")
        got = df.select("i", "t", unaccent("t").alias("u")).collect()
        for r in got:
            assert r.u == r.t.translate(tbl), repr(r.t)
class TestIsn:
    def test_known_checksums(self, spark):
        """Real-world vectors: the classic EAN 4006381333931, ISBN10
        0306406152 (check 2), 097522980X ('X' = 10), and the Bookland
        conversion 0306406152 -> 9780306406157."""
        from pyspark.sql import functions as F

        from gpdb_spark.functions.isn import (
            ean13_check_digit,
            is_valid_ean13,
            is_valid_isbn10,
            isbn10_check_digit,
            isbn13_from_isbn10,
        )

        df = spark.range(1)
        r = df.select(
            ean13_check_digit(F.lit("400638133393")).alias("e"),
            is_valid_ean13(F.lit("4006381333931")).alias("ev"),
            is_valid_ean13(F.lit("4006381333932")).alias("ev_bad"),
            is_valid_ean13(F.lit("40063813339")).alias("ev_short"),
            is_valid_ean13(F.lit("40063813339ab")).alias("ev_alpha"),
            isbn10_check_digit(F.lit("030640615")).alias("i"),
            is_valid_isbn10(F.lit("0306406152")).alias("iv"),
            is_valid_isbn10(F.lit("097522980X")).alias("ivx"),
            is_valid_isbn10(F.lit("0975229801")).alias("ivx_bad"),
            isbn13_from_isbn10(F.lit("0306406152")).alias("b13"),
        ).collect()[0]
        assert r.e == 1 and r.ev and not r.ev_bad
        assert not r.ev_short and not r.ev_alpha
        assert r.i == "2" and r.iv and r.ivx and not r.ivx_bad
        assert r.b13 == "9780306406157"

    def test_isn_stays_jvm_side(self, spark):
        from pyspark.sql import functions as F

        from gpdb_spark.functions.isn import is_valid_ean13

        df = spark.range(4).select(
            F.lpad(F.col("id").cast("string"), 13, "0").alias("s")
        )
        plan = (
            df.select(is_valid_ean13("s"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "EvalPython" not in plan


    def test_isn_randomized_vs_python_reference(self, spark):
        """One batched job: 400 random digit bodies vs an independent
        pure-Python reimplementation of both checksum schemes."""
        import random

        from pyspark.sql import functions as F

        from gpdb_spark.functions.isn import (
            ean13_check_digit,
            isbn10_check_digit,
        )

        rng = random.Random(99)
        rows = [
            (
                i,
                "".join(rng.choice("0123456789") for _ in range(12)),
                "".join(rng.choice("0123456789") for _ in range(9)),
            )
            for i in range(400)
        ]

        def py_ean(b12: str) -> int:
            s = sum(int(c) * (1 if i % 2 == 0 else 3)
                    for i, c in enumerate(b12))
            return (10 - s % 10) % 10

        def py_isbn(b9: str) -> str:
            s = sum(int(c) * (10 - i) for i, c in enumerate(b9))
            w = (11 - s % 11) % 11
            return "X" if w == 10 else str(w)

        df = spark.createDataFrame(rows, "i int, b12 string, b9 string")
        got = df.select(
            "i", "b12", "b9",
            ean13_check_digit("b12").alias("e"),
            isbn10_check_digit("b9").alias("s"),
        ).collect()
        for r in got:
            assert r.e == py_ean(r.b12), r.b12
            assert r.s == py_isbn(r.b9), r.b9
class TestCube:
    def test_cube_semantics(self, spark):
        """cube.c semantics: constructor normalization (LL <= UR),
        containment/overlap, distance between disjoint boxes, union,
        non-normalized disjoint intersection, enlarge with midpoint
        clamp, point detection."""
        from pyspark.sql import functions as F

        from gpdb_spark.functions.cube import (
            cube,
            cube_contains,
            cube_dim,
            cube_distance,
            cube_enlarge,
            cube_inter,
            cube_is_point,
            cube_ll_coord,
            cube_overlap,
            cube_union,
            cube_ur_coord,
        )

        df = spark.range(1)
        a = cube(F.array(F.lit(0.0), F.lit(0.0)),
                 F.array(F.lit(2.0), F.lit(2.0)))
        # constructor normalizes swapped coords
        b = cube(F.array(F.lit(5.0), F.lit(1.0)),
                 F.array(F.lit(3.0), F.lit(0.0)))
        pt = cube(F.array(F.lit(1.0), F.lit(1.0)))
        r = df.select(
            cube_dim(a).alias("d"),
            cube_contains(a, pt).alias("a_has_pt"),
            cube_contains(pt, a).alias("pt_has_a"),
            cube_overlap(a, b).alias("ab_ov"),
            cube_distance(a, b).alias("dist"),
            cube_ll_coord(b, 1).alias("b_ll1"),  # normalized to 3.0
            cube_ur_coord(cube_union(a, b), 1).alias("u_ur1"),
            cube_ll_coord(cube_inter(a, b), 1).alias("i_ll1"),
            cube_ur_coord(cube_inter(a, b), 1).alias("i_ur1"),
            cube_is_point(pt).alias("is_pt"),
            cube_is_point(a).alias("a_is_pt"),
            cube_ll_coord(cube_enlarge(a, 0.5), 1).alias("e_ll1"),
            cube_ll_coord(cube_enlarge(a, -5.0), 1).alias("shrunk_ll1"),
        ).collect()[0]
        assert r.d == 2 and r.a_has_pt and not r.pt_has_a
        assert not r.ab_ov
        assert r.dist == 1.0  # x-gap 1, y overlaps
        assert r.b_ll1 == 3.0 and r.u_ur1 == 5.0
        # disjoint intersection is a pseudo-box (lo > hi), like cube.c
        assert r.i_ll1 == 3.0 and r.i_ur1 == 2.0
        assert r.is_pt and not r.a_is_pt
        assert r.e_ll1 == -0.5
        assert r.shrunk_ll1 == 1.0  # clamped at midpoint

    def test_cube_mixed_dimensionality_zero_pads(self, spark):
        """Round-5 review regression (cube.c parity): the
        lower-dimensional cube's missing coordinates are ZEROES
        (cube_contains_v0 excess-dim check, cube_union_v0 Min/Max(0,..)
        arms) — zip_with's NULL padding coalesced to FALSE and
        mis-evaluated every mixed-dim predicate."""
        from pyspark.sql import functions as F

        from gpdb_spark.functions.cube import (
            cube,
            cube_contains,
            cube_distance,
            cube_ll_coord,
            cube_overlap,
            cube_union,
            cube_ur_coord,
        )

        df = spark.range(1)
        box3 = cube(F.array(F.lit(-1.0), F.lit(-1.0), F.lit(-1.0)),
                    F.array(F.lit(2.0), F.lit(2.0), F.lit(2.0)))
        pt2 = cube(F.array(F.lit(1.0), F.lit(1.0)))
        far2 = cube(F.array(F.lit(9.0), F.lit(9.0)))
        r = df.select(
            # (1,1) == (1,1,0), inside [-1,2]^3 -> TRUE like cube.c
            cube_contains(box3, pt2).alias("has_pt"),
            cube_overlap(box3, pt2).alias("ov"),
            cube_contains(box3, far2).alias("has_far"),
            # union of 3D box and 2D point extends dim3 to cover 0
            cube_ll_coord(cube_union(box3, pt2), 3).alias("u3lo"),
            cube_ur_coord(cube_union(box3, pt2), 3).alias("u3hi"),
            # distance treats the missing dim as 0: gap only in x/y
            cube_distance(box3, far2).alias("dist"),
        ).collect()[0]
        assert r.has_pt and r.ov and not r.has_far
        assert r.u3lo == -1.0 and r.u3hi == 2.0
        assert abs(r.dist - (2 * 7.0 ** 2) ** 0.5) < 1e-12

    def test_cube_contains_ignores_container_excess_dims(self, spark):
        """Round-6 advice regression (cube_contains_v0): the CONTAINER's
        excess dimensions are ignored ("can't care less about the excess
        dimensions of (a)") — only the CONTAINEE's excess dims must be
        exactly zero. A 3D box spanning [5,6]^3 (excess dim excludes 0)
        still contains the 2D point (5.5, 5.5); the reverse containment
        requires the 3D containee's dim-3 to be exactly [0,0]."""
        from pyspark.sql import functions as F

        from gpdb_spark.functions.cube import cube, cube_contained, cube_contains

        df = spark.range(1)
        box3 = cube(F.array(F.lit(5.0), F.lit(5.0), F.lit(5.0)),
                    F.array(F.lit(6.0), F.lit(6.0), F.lit(6.0)))
        pt2 = cube(F.array(F.lit(5.5), F.lit(5.5)))
        # containee with nonzero excess dim: [5,6]^2 x [0.5, 0.5]
        box3_nz = cube(F.array(F.lit(5.0), F.lit(5.0), F.lit(0.5)),
                       F.array(F.lit(6.0), F.lit(6.0), F.lit(0.5)))
        # containee whose excess dim IS [0,0] inside a 2D container
        box3_z = cube(F.array(F.lit(5.0), F.lit(5.0), F.lit(0.0)),
                      F.array(F.lit(6.0), F.lit(6.0), F.lit(0.0)))
        box2 = cube(F.array(F.lit(4.0), F.lit(4.0)),
                    F.array(F.lit(7.0), F.lit(7.0)))
        r = df.select(
            cube_contains(box3, pt2).alias("box3_has_pt2"),
            cube_contained(pt2, box3).alias("pt2_in_box3"),
            cube_contains(pt2, box3).alias("pt2_has_box3"),
            cube_contains(box2, box3_nz).alias("box2_has_nz"),
            cube_contains(box2, box3_z).alias("box2_has_z"),
        ).collect()[0]
        # PG: cube('(5,5,5),(6,6,6)') @> cube('(5.5,5.5)') IS true
        assert r.box3_has_pt2 and r.pt2_in_box3
        assert not r.pt2_has_box3
        assert not r.box2_has_nz
        assert r.box2_has_z

    def test_cube_stays_jvm_side(self, spark):
        from pyspark.sql import functions as F

        from gpdb_spark.functions.cube import cube, cube_distance

        df = spark.range(8).select(
            F.array(F.col("id").cast("double")).alias("p")
        )
        plan = (
            df.select(cube_distance(cube("p"), cube("p")))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "EvalPython" not in plan


class TestTsDictionaries:
    def test_xsyn_keeporig_and_matchsynonyms(self, spark):
        """dict_xsyn.c option semantics: keeporig drops/keeps the
        headword; matchsynonyms makes synonyms map back to the group."""
        from pyspark.sql import functions as F

        from gpdb_spark.functions.fulltext import expand_xsyn

        df = spark.createDataFrame(
            [(["supernova", "x"],), (["sn", "y"],)], "toks array<string>"
        )
        rules = {"supernova": ["sn", "sne", "1987a"]}
        keep = df.select(
            expand_xsyn(F.col("toks"), rules).alias("e")
        ).collect()
        assert keep[0].e == ["supernova", "sn", "sne", "1987a", "x"]
        assert keep[1].e == ["sn", "y"]  # synonym not expanded by default

        nokeep = df.select(
            expand_xsyn(F.col("toks"), rules, keeporig=False).alias("e")
        ).collect()
        assert nokeep[0].e == ["sn", "sne", "1987a", "x"]

        # matchsynonyms: a synonym token lexizes to the SAME group as
        # its headword (dict_xsyn.c emits headword-if-keeporig + syns)
        msyn = df.select(
            expand_xsyn(F.col("toks"), rules, matchsynonyms=True).alias("e")
        ).collect()
        assert msyn[1].e == ["supernova", "sn", "sne", "1987a", "y"]

        # keeporig=false + matchsynonyms: no headword, synonyms only —
        # 'sn' still maps to a set CONTAINING 'sn'
        msyn2 = df.select(
            expand_xsyn(
                F.col("toks"), rules, keeporig=False, matchsynonyms=True
            ).alias("e")
        ).collect()
        assert msyn2[1].e == ["sn", "sne", "1987a", "y"]

    def test_dict_int_options(self, spark):
        from pyspark.sql import functions as F

        from gpdb_spark.functions.fulltext import dict_int_lexize

        df = spark.createDataFrame(
            [("1234567890",), ("123456",), ("abc123",), (None,)],
            "t string",
        )
        out = df.select(
            dict_int_lexize("t").alias("trunc"),
            dict_int_lexize("t", rejectlong=True).alias("rej"),
        ).collect()
        assert [r.trunc for r in out] == ["123456", "123456", "abc123", None]
        assert [r.rej for r in out] == [None, "123456", "abc123", None]

    def test_fulltext_terms_case_normalized(self, spark):
        """Review regression: mixed-case query terms must match the
        lowercased postings (ts_headline already normalized; the
        match/rank family must agree)."""
        from gpdb_spark.functions.fulltext import ts_match, ts_rank

        df = spark.createDataFrame(
            [(1, "Spark makes Joins fast"), (2, "nothing here")],
            "doc_id long, text string",
        )
        assert [r.doc_id for r in ts_match(df, ["Spark"]).collect()] == [1]
        assert [r.doc_id for r in ts_rank(df, ["JOINS"]).collect()] == [1]


class TestSeg:
    def test_seg_literal_grammar(self, spark):
        """segparse.y range productions: closed range, plus-minus,
        half-open with HUGE_VAL bound, bare point, extension markers
        stripped from the stored value, swapped boundaries -> NULL
        (the documented ereport divergence)."""
        from pyspark.sql import functions as F

        from gpdb_spark.functions.seg import seg_in, seg_lower, seg_upper

        cases = [
            ("1 .. 2", 1.0, 2.0),
            ("4.5..6.5", 4.5, 6.5),
            ("5(+-)0.3", 4.7, 5.3),
            ("5 (+-) 0.3", 4.7, 5.3),
            ("3 ..", 3.0, float("inf")),
            (".. 3", float("-inf"), 3.0),
            ("7", 7.0, 7.0),
            ("~3.5", 3.5, 3.5),           # approximate marker, value kept
            (">2 .. <5", 2.0, 5.0),       # boundary extensions stripped
            ("-1.5e1 .. -2", -15.0, -2.0),
            ("5 .. 2", None, None),       # swapped -> NULL, not ereport
            ("nonsense", None, None),
        ]
        df = spark.createDataFrame(
            [(i, s) for i, (s, _, _) in enumerate(cases)], "i int, s string"
        )
        got = {
            r.i: (r.lo, r.hi)
            for r in df.select(
                "i",
                seg_lower(seg_in("s")).alias("lo"),
                seg_upper(seg_in("s")).alias("hi"),
            ).collect()
        }
        for i, (s, lo, hi) in enumerate(cases):
            assert got[i] == (lo, hi), s

    def test_seg_randomized_vs_python_reference(self, spark):
        """One batched job: 300 random segment pairs vs an independent
        pure-Python transliteration of seg.c's boundary logic."""
        import random

        from pyspark.sql import functions as F

        from gpdb_spark.functions.seg import (
            make_seg,
            seg_cmp,
            seg_contains,
            seg_inter,
            seg_left,
            seg_lower,
            seg_over_left,
            seg_overlap,
            seg_size,
            seg_union,
            seg_upper,
        )

        rng = random.Random(7)
        rows = []
        for i in range(300):
            al = round(rng.uniform(-10, 10), 3)
            bl = round(rng.uniform(-10, 10), 3)
            rows.append(
                (i, al, round(al + rng.uniform(0, 5), 3),
                 bl, round(bl + rng.uniform(0, 5), 3))
            )
        df = spark.createDataFrame(
            rows, "i int, al double, ah double, bl double, bh double"
        )
        a, b = make_seg("al", "ah"), make_seg("bl", "bh")
        got = df.select(
            "i", "al", "ah", "bl", "bh",
            seg_contains(a, b).alias("con"),
            seg_overlap(a, b).alias("ov"),
            seg_left(a, b).alias("lt_strict"),
            seg_over_left(a, b).alias("ovl"),
            seg_cmp(a, b).alias("cmp"),
            seg_lower(seg_union(a, b)).alias("ulo"),
            seg_upper(seg_union(a, b)).alias("uhi"),
            seg_lower(seg_inter(a, b)).alias("ilo"),
            seg_size(seg_inter(a, b)).alias("isz"),
        ).collect()
        for r in got:
            assert r.con == (r.al <= r.bl and r.ah >= r.bh), r.i
            ov = ((r.ah >= r.bh and r.al <= r.bh)
                  or (r.bh >= r.ah and r.bl <= r.ah))
            assert r.ov == ov, r.i
            assert r.lt_strict == (r.ah < r.bl), r.i
            assert r.ovl == (r.ah <= r.bh), r.i
            cmp = (-1 if r.al < r.bl else 1 if r.al > r.bl
                   else -1 if r.ah < r.bh else 1 if r.ah > r.bh else 0)
            assert r.cmp == cmp, r.i
            assert r.ulo == min(r.al, r.bl) and r.uhi == max(r.ah, r.bh)
            assert r.ilo == max(r.al, r.bl), r.i
            assert abs(r.isz - abs(min(r.ah, r.bh) - max(r.al, r.bl))) < 1e-12

    def test_seg_stays_jvm_side(self, spark):
        """Parse + predicates are pure Catalyst expressions — no
        Python eval node may appear in the plan."""
        from pyspark.sql import functions as F

        from gpdb_spark.functions.seg import seg_in, seg_overlap, make_seg

        df = spark.range(8).select(
            F.concat(F.col("id").cast("string"), F.lit(" .. "),
                     (F.col("id") + 2).cast("string")).alias("s"),
            F.col("id").cast("double").alias("x"),
        )
        plan = df.select(
            seg_overlap(seg_in("s"), make_seg("x", "x")).alias("o")
        )._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


class TestNormalRand:
    def test_portable_tier_matches_python_md5_reference(self, spark):
        """The portable Irwin-Hall(12) deviates are reproduced exactly
        by an independent hashlib/float reimplementation (same md5
        strings, same IEEE op order)."""
        import hashlib

        from gpdb_spark.functions.tablefunc import normal_rand

        got = {r.i: r.val
               for r in normal_rand(spark, 50, 10.0, 2.0, seed=42).collect()}

        def py_val(i: int) -> float:
            s = 0.0
            for j in range(6):
                hx = hashlib.md5(f"42:{i}:{j}".encode()).hexdigest()
                s = s + (int(hx[0:13], 16) + 0.5) * 2.0 ** -52
                s = s + (int(hx[13:26], 16) + 0.5) * 2.0 ** -52
            return 10.0 + 2.0 * (s - 6.0)

        for i in range(50):
            assert got[i] == py_val(i), i

    def test_moments_both_tiers(self, spark):
        """Mean/stddev of 4000 deviates land near (mean, stddev) for
        the portable CLT tier AND the native randn tier."""
        from pyspark.sql import functions as F

        from gpdb_spark.functions.tablefunc import normal_rand

        for portable in (True, False):
            stats = (
                normal_rand(spark, 4000, 10.0, 2.0, seed=7, portable=portable)
                .agg(F.avg("val").alias("m"),
                     F.stddev_pop("val").alias("s"))
                .collect()[0]
            )
            assert abs(stats.m - 10.0) < 0.2, (portable, stats.m)
            assert abs(stats.s - 2.0) < 0.2, (portable, stats.s)

    def test_stays_jvm_side(self, spark):
        from gpdb_spark.functions.tablefunc import normal_rand

        plan = (
            normal_rand(spark, 100, 0.0, 1.0)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan

    def test_duckdb_oracle_matches_python_bit_exactly(self):
        """The DuckDB side of the portable tier must equal the hashlib
        reference PRE-truncation — the review found DECIMAL-typed
        literals silently shifting 5/50 rows by 1 ulp (masked by floor
        truncation until a value lands on a boundary). No Spark needed."""
        import hashlib

        import duckdb

        from gpdb_spark.functions.tablefunc import duck_normal_rand_sql

        got = dict(
            duckdb.sql(duck_normal_rand_sql(50, 10.0, 2.0, seed=42)).fetchall()
        )

        def py_val(i: int) -> float:
            s = 0.0
            for j in range(6):
                hx = hashlib.md5(f"42:{i}:{j}".encode()).hexdigest()
                s = s + (int(hx[0:13], 16) + 0.5) * 2.0 ** -52
                s = s + (int(hx[13:26], 16) + 0.5) * 2.0 ** -52
            return 10.0 + 2.0 * (s - 6.0)

        for i in range(50):
            assert got[i] == py_val(i), (i, got[i], py_val(i))
