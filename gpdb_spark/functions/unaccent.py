"""unaccent — contrib/unaccent text search dictionary as a scalar
function (reference: contrib/unaccent/unaccent.c unaccent_dict,
rules table contrib/unaccent/unaccent.rules).

The 9.4-era rules file is a pure 1:1 character map (187 rules — all
single char -> single char, including the multigraph sources AE/ss/oe
which THIS vintage maps to single letters: Æ->A, ß->S, œ->e, Ł->L), so
the faithful Spark shape is one JVM ``translate`` expression — fully
inside whole-stage codegen, no UDF, no shuffle.  The embedded table is
pinned against the reference rules file and against an independent
NFD-decomposition check in tests/test_contrib.py.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# contrib/unaccent/unaccent.rules, verbatim (187 1:1 rules)
UNACCENT_SRC = 'ÀÁÂÃÄÅÆàáâãäåæĀāĂăĄąÇçĆćĈĉĊċČčĎďĐđÈÉÊËèéêëĒēĔĕĖėĘęĚěĜĝĞğĠġĢģĤĥĦħĨÌÍÎÏìíîïĩĪīĬĭĮįİıĲĳĴĵĶķĸĹĺĻļĽľĿŀŁłÑñŃńŅņŇňŉŊŋÒÓÔÕÖòóôõöŌōŎŏŐőŒœØøŔŕŖŗŘřßŚśŜŝŞşŠšŢţŤťŦŧÙÚÛÜùúûüŨũŪūŬŭŮůŰűŲųŴŵÝýÿŶŷŸŹźŻżŽžёЁ'
UNACCENT_DST = 'AAAAAAAaaaaaaaAaAaAaCcCcCcCcCcDdDdEEEEeeeeEeEeEeEeEeGgGgGgGgHhHhIIIIIiiiiiIiIiIiIiIiJjKkkLlLlLlLlLlNnNnNnNnnNnOOOOOoooooOoOoOoEeOoRrRrRrSSsSsSsSsTtTtTtUUUUuuuuUuUuUuUuUuUuWwYyyYyYZzZzZzеЕ'


def unaccent(text: Column | str) -> Column:
    """unaccent(dict, text) with the default dictionary."""
    c = F.col(text) if isinstance(text, str) else text
    return F.translate(c, UNACCENT_SRC, UNACCENT_DST)


def unaccent_sql_expr(expr: str) -> str:
    """The same mapping as a DuckDB/ANSI translate() call — for oracle
    SQL construction. ``expr`` is inserted verbatim (braces included —
    no str.format re-scan)."""
    return "translate(" + expr + ", '" + UNACCENT_SRC + "', '" + UNACCENT_DST + "')"
