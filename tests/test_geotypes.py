"""Geometric literal I/O + constant algebra (functions/geotypes.py,
dialect _pass_geo_fold) — pinned against the reference's own expected
files: expected/line.out (32 statements, all byte-identical via the
golden probe), expected/polygon.out (15), expected/arrays-adjacent
error contracts (geo_ops.c *_in ereport)."""

from __future__ import annotations

import pytest

from gpdb_spark.dialect import translate
from gpdb_spark.functions import geotypes as g


class TestGeoInputOutput:
    def test_line_in_all_regress_forms(self):
        # the LINE_TBL inserts, line.out:41-52
        cases = [
            ("{1,-1,1}", "{1,-1,1}"),
            ("(0,0),(6,6)", "{1,-1,0}"),
            ("10,-10 ,-5,-4", "{-0.4,-1,-6}"),
            ("[-1e6,2e2,3e5, -4e1]",
             "{-0.000184615384615385,-1,15.3846153846154}"),
            ("(11,22,33,44)", "{1,-1,11}"),
            ("[(1,3),(2,3)]", "{0,-1,3}"),
            ("[(3,1),(3,2)]", "{-1,0,3}"),
        ]
        for s, want in cases:
            assert g.line_out(g.line_in(s)) == want, s

    def test_line_in_error_contracts(self):
        with pytest.raises(g.GeoSyntaxError, match="two distinct points"):
            g.line_in("[(1,0),(1,0)]")
        with pytest.raises(g.GeoSyntaxError, match="cannot both be zero"):
            g.line_in("{0,0,1}")
        for bad in ("(3asdf,2 ,3,4r2)", "[1,2,3, 4", "[(,2),(3,4)]",
                    "[(1,2),(3,4)"):
            with pytest.raises(g.GeoSyntaxError,
                               match="invalid input syntax"):
                g.line_in(bad)

    def test_box_normalizes_corners(self):
        assert g.box_out(g.box_in("(1,2,3,4)")) == "(3,4),(1,2)"
        assert g.box_out(g.box_in("((3,4),(1,2))")) == "(3,4),(1,2)"

    def test_path_open_closed(self):
        assert g.path_out(g.path_in("[(0,0),(1,1)]")) == "[(0,0),(1,1)]"
        assert g.path_out(g.path_in("((0,0),(1,1))")) == "((0,0),(1,1))"

    def test_circle(self):
        assert g.circle_out(g.circle_in("<(1,2),3>")) == "<(1,2),3>"
        assert g.circle_out(g.circle_in("1,2,3")) == "<(1,2),3>"
        with pytest.raises(g.GeoSyntaxError):
            g.circle_in("<(1,2),-3>")


class TestGeoFoldDialect:
    def test_line_operator_suite(self):
        # every FROM-less statement in line.out folds to its golden
        cases = [
            ("line '[(1,1),(2,1)]' <-> line '[(-1,-1),(-2,-1)]'",
             "CAST(2.0 AS DOUBLE)"),
            ("lseg '[(1,1),(5,5)]' ?# line '[(2,0),(0,2)]'", "TRUE"),
            ("lseg '[(1,1),(5,5)]' ?# line '[(0,0),(1,0)]'", "FALSE"),
            ("line '[(0,0),(1,1)]' ?# box '(0,0,2,2)'", "TRUE"),
            ("line '[(3,0),(4,1)]' ?# box '(0,0,2,2)'", "FALSE"),
            ("point '(1,1)' <@ line '[(0,0),(2,2)]'", "TRUE"),
            ("point '(1,1)' @ line '[(0,0),(1,0)]'", "FALSE"),
            ("lseg '[(1,1),(2,2)]' <@ line '[(0,0),(2,2)]'", "TRUE"),
            ("point '(0,1)' ## line '[(0,0),(1,1)]'", "'(0.5,0.5)'"),
            ("line '[(0,0),(1,1)]' ## lseg '[(1,0),(2,0)]'", "'(1,0)'"),
            ("line '[(0,0),(1,1)]' # line '[(1,0),(2,1)]'",
             "CAST(NULL AS STRING)"),
            ("line '[(0,0),(1,1)]' # line '[(1,0),(1,1)]'", "'(1,1)'"),
            ("line '[(0,0),(1,1)]' ?|| line '[(1,0),(2,1)]'", "TRUE"),
            ("line '[(0,0),(1,0)]' ?-| line '[(0,0),(0,1)]'", "TRUE"),
            ("?- line '[(0,0),(1,0)]'", "TRUE"),
            ("?- line '[(0,0),(1,1)]'", "FALSE"),
            ("?| line '[(0,0),(0,1)]'", "TRUE"),
            ("line(point '(1,2)', point '(3,4)')", "'{1,-1,1}'"),
            ("line '[(1,2),(3,4)]' = line '[(3,4),(4,5)]'", "TRUE"),
            ("line '[(1,2),(3,4)]' = line '[(3,4),(4,4)]'", "FALSE"),
        ]
        for expr, want in cases:
            assert translate(f"SELECT {expr}") == f"SELECT {want}", expr

    def test_polygon_operator_suite(self):
        a = "polygon '(2.0,0.0),(2.0,4.0),(0.0,0.0)'"
        b = "polygon '(3.0,1.0),(3.0,3.0),(1.0,0.0)'"
        for op, want in [("<<", "FALSE"), ("&>", "FALSE"),
                         (">>", "FALSE"), ("<@", "FALSE"),
                         ("@>", "FALSE"), ("~=", "FALSE"),
                         ("&&", "TRUE")]:
            assert translate(f"SELECT {a} {op} {b}") == f"SELECT {want}", op
        # real edge-walk containment, not bounding boxes
        # (polygon.out:191-230)
        assert translate(
            "SELECT '((0,4),(6,4),(1,2),(6,0),(0,0))'::polygon @> "
            "'((2,1),(2,3),(3,3),(3,1))'::polygon") == "SELECT FALSE"
        assert translate(
            "SELECT '((0,4),(6,4),(3,2),(6,0),(0,0))'::polygon @> "
            "'((2,1),(2,3),(3,3),(3,1))'::polygon") == "SELECT TRUE"
        # bare-literal LHS resolves through the operator signature
        assert translate(
            "SELECT '((200,800),(800,800),(800,200),(200,200))' && "
            "'(1000,1000,0,0)'::polygon") == "SELECT TRUE"

    def test_geo_errors_raise_at_translate_time(self):
        with pytest.raises(ValueError, match="two distinct points"):
            translate("SELECT '[(1,0),(1,0)]'::line")
        with pytest.raises(ValueError, match="invalid input syntax"):
            translate("SELECT point '(1,2,3)'")
