"""GPDB ``complex`` type (src/backend/utils/adt/complex_type.c) as
struct<re:double, im:double> + column functions.

All operations are plain Catalyst struct expressions — codegen-friendly,
no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def c_make(re: Column | float, im: Column | float) -> Column:
    re = F.lit(re) if not isinstance(re, Column) else re
    im = F.lit(im) if not isinstance(im, Column) else im
    return F.struct(
        re.cast("double").alias("re"), im.cast("double").alias("im")
    )


def c_add(a: Column, b: Column) -> Column:
    return c_make(a["re"] + b["re"], a["im"] + b["im"])


def c_sub(a: Column, b: Column) -> Column:
    return c_make(a["re"] - b["re"], a["im"] - b["im"])


def c_mul(a: Column, b: Column) -> Column:
    return c_make(
        a["re"] * b["re"] - a["im"] * b["im"],
        a["re"] * b["im"] + a["im"] * b["re"],
    )


def c_conj(a: Column) -> Column:
    return c_make(a["re"], -a["im"])


def c_abs(a: Column) -> Column:
    """Modulus |a| (complex_abs)."""
    return F.sqrt(a["re"] * a["re"] + a["im"] * a["im"])


def c_arg(a: Column) -> Column:
    """Argument/angle (radians)."""
    return F.atan2(a["im"], a["re"])
