"""XML type: generation + XPath extraction (xml.c / SQL/XML).

Reference: PG's xml type with xmlelement/xmlforest/xmlconcat/xmlagg
producers (src/backend/utils/adt/xml.c) and the xpath() extractor.

Spark-first mapping: XML values are strings; the producers are pure
string-concat column expressions with SQL/XML character escaping
(escape_xml in xml.c: & < > in content, plus quotes in attributes), and
extraction delegates to Spark's built-in JVM xpath functions
(``xpath_string``/``xpath_int``/...), which compile the XPath once per
task. Everything stays in whole-stage codegen; no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _escape_content(c: Column) -> Column:
    """escape_xml: & first, then < and > (xml.c map_sql_value_to_xml_value)."""
    out = F.regexp_replace(c.cast("string"), "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    return F.regexp_replace(out, ">", "&gt;")


def _escape_attr(c: Column) -> Column:
    out = _escape_content(c)
    return F.regexp_replace(out, '"', "&quot;")


def xmltext(c: Column) -> Column:
    """XMLTEXT: lift a text value into xml, escaping markup characters.
    PG's xmlelement escapes *non-xml-typed* content args exactly this
    way; xml-typed args pass through verbatim (xml.c xmlelement)."""
    return _escape_content(c)


def xmlelement(name: str, attrs: dict[str, Column] | None = None, *content: Column) -> Column:
    """XMLELEMENT(NAME name, XMLATTRIBUTES(...), content...).

    ``content`` columns are treated as already-xml (output of
    xmlelement/xmlforest/xmltext) and concatenated verbatim — wrap raw
    text in :func:`xmltext` to escape it, mirroring PG's type-driven
    escaping rule."""
    parts: list[Column] = [F.lit(f"<{name}")]
    for k, v in (attrs or {}).items():
        parts += [F.lit(f' {k}="'), _escape_attr(v), F.lit('"')]
    if content:
        parts.append(F.lit(">"))
        parts += list(content)
        parts.append(F.lit(f"</{name}>"))
    else:
        parts.append(F.lit("/>"))
    return F.concat(*parts)


def xmlforest(**cols: Column) -> Column:
    """XMLFOREST(col AS name, ...): one element per argument; NULL args
    are dropped (per SQL/XML), matching PG's xmlforest."""
    return F.concat(
        *[
            F.coalesce(
                F.concat(
                    F.lit(f"<{name}>"), _escape_content(c), F.lit(f"</{name}>")
                ),
                F.lit(""),
            )
            for name, c in cols.items()
        ]
    )


def xmlconcat(*xs: Column) -> Column:
    return F.concat(*xs)


def xmlagg(x: Column, order_by: Column) -> Column:
    """XMLAGG(x ORDER BY k): deterministic ordered concatenation via
    sorted struct collection — the array_agg ORDER BY discipline."""
    return F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct(order_by.alias("k"), x.alias("v")))),
            lambda s: s.v,
        ),
        "",
    )


# XPath extraction — Spark built-ins (JVM-side)
xpath_string = F.xpath_string
xpath_int = F.xpath_int
xpath_double = F.xpath_double
xpath_list = F.xpath  # returns array<string> like PG's xpath() xml[]
