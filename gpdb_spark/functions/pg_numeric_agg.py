"""Exact-numeric statistical aggregates (numeric.c do_numeric_accum +
numeric_stddev_internal, reference src/backend/utils/adt/numeric.c:4376).

PG computes variance/stddev over NUMERIC inputs in exact decimal
arithmetic with a data-dependent result scale chosen by
``select_div_scale`` (numeric.c): at least 16 significant digits, never
less than either operand's display scale.  Spark's stddev/var_* compute
in float8, which diverges from the golden text image in the 9th-12th
digit — the aggregates.sql GOLD_DIFF class (VERDICT r09 Next #3).

Conformance surface only: the rewrite fires under the engine front
door (numeric_agg=True) for statically numeric-typed operands; the
100 TB-scale path keeps Spark's built-in float8 aggregates.  The UDF
aggregates a collect_list of PG numeric TEXT images, so input display
scales (which drive the result scale) survive the trip.
"""
from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal, localcontext

NUMERIC_MIN_SIG_DIGITS = 16
NUMERIC_MAX_DISPLAY_SCALE = 1000


def _dscale(txt: str) -> int:
    return len(txt.split(".", 1)[1]) if "." in txt else 0


def _round_var(v: Decimal, rscale: int) -> Decimal:
    """round_var: rscale digits after the point, ties away from zero."""
    return v.quantize(Decimal(1).scaleb(-rscale), rounding=ROUND_HALF_UP)


def _weight_firstdigit(v: Decimal) -> tuple[int, int]:
    """Normalized base-10000 weight and first digit of a NumericVar
    (select_div_scale reads both to estimate the quotient weight)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    w = a.adjusted() // 4
    return w, int(a.scaleb(-4 * w))


def select_div_scale(var1: Decimal, ds1: int, var2: Decimal,
                     ds2: int) -> int:
    """numeric.c select_div_scale: >= 16 significant digits, >= either
    input's display scale."""
    w1, fd1 = _weight_firstdigit(var1)
    w2, fd2 = _weight_firstdigit(var2)
    qweight = w1 - w2
    if fd1 <= fd2:
        qweight -= 1
    rscale = NUMERIC_MIN_SIG_DIGITS - qweight * 4
    rscale = max(rscale, ds1, ds2, 0)
    return min(rscale, NUMERIC_MAX_DISPLAY_SCALE)


def pg_numeric_stddev(vals: list, mode: str) -> str | None:
    """numeric_stddev_internal over the collected PG text images.
    ``mode``: var_pop | var_samp | stddev_pop | stddev_samp."""
    texts = [v for v in (vals or []) if v is not None]
    if not texts:
        return None
    if any(t.lower() == "nan" for t in texts):
        return "NaN"
    sample = mode.endswith("_samp")
    variance = mode.startswith("var")
    with localcontext() as ctx:
        ctx.prec = 300
        xs = [Decimal(t) for t in texts]
        n = len(xs)
        if sample and n <= 1:
            return None
        ds = [_dscale(t) for t in texts]
        # do_numeric_accum: sumX dscale = max input dscale (add_var);
        # sumX2 accumulates full-precision squares (dscale doubles)
        sum_ds = max(ds)
        sumsq_ds = 2 * max(ds)
        sum_x = sum(xs)
        sum_x2 = sum(x * x for x in xs)
        vn = Decimal(n)
        # rscale for the two mul_var calls: vsumX.dscale * 2
        rscale = sum_ds * 2
        sq = _round_var(sum_x * sum_x, rscale)
        nx2 = _round_var(vn * sum_x2, rscale)
        num = nx2 - sq
        if num <= 0:
            # roundoff guard: make_result(&const_zero) renders "0"
            return "0"
        denom = vn * (vn - 1) if sample else vn * vn
        rscale = select_div_scale(num, rscale, denom, 0)
        var = _round_var(num / denom, rscale)
        if variance:
            return str(var)
        # sqrt_var of the ROUNDED variance, to the same rscale
        with localcontext() as sctx:
            sctx.prec = 300
            root = var.sqrt()
        return str(_round_var(root, rscale))


def pg_float4_out(v) -> str | None:
    """float4 -> numeric text image (float4_numeric goes through
    float4out's %.6g — tstypes.pg_float4_text is the one rendering)."""
    if v is None:
        return None
    from gpdb_spark.functions.tstypes import pg_float4_text

    return pg_float4_text(v)


def pg_float8_out(v) -> str | None:
    """float8 -> numeric text image (float8out shortest-roundtrip)."""
    if v is None:
        return None
    import math

    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    if v == 0.0 and math.copysign(1.0, v) < 0:
        return "-0"
    return repr(v) if v != int(v) or abs(v) >= 1e16 else str(int(v))


_MIN_NORMAL_F8 = 2.2250738585072014e-308
_MIN_NORMAL_F4 = 1.17549435e-38
_MAX_F4 = 3.4028234663852886e38


def pg_float_in(s, kind: str):
    """float8in/float4in (float.c): strtod with the ERANGE contract —
    an overflowing text errors, an underflowing-to-zero/denormal text
    errors, and the special spellings ([+-]NaN, [+-]Infinity, inf)
    parse case-insensitively.  Spark's CAST silently produces
    Infinity/0.0 and rejects '+NaN' (the float8.sql ERR_MISS class)."""
    import math
    import re as _re

    if s is None:
        return None
    t = s.strip()
    if _re.fullmatch(r"(?i)[+-]?nan", t):
        return float("nan")
    m = _re.fullmatch(r"(?i)([+-]?)(inf(inity)?)", t)
    if m:
        return float("-inf") if m.group(1) == "-" else float("inf")
    try:
        v = float(t)
    except ValueError:
        raise ValueError(
            f'invalid input syntax for type {kind}: "{s}"')
    # PG errors only when strtod's ERANGE coincides with a 0 or ±inf
    # result (float.c float8in) — nonzero DENORMALS are accepted (the
    # float8out/float8in roundtrip block in regress stores them)
    tname = "double precision" if kind == "float8" else "real"
    if math.isinf(v):
        raise ValueError(f'"{s}" is out of range for type {tname}')
    if v == 0.0 and _re.search(r"[1-9]", t.split("e")[0].split("E")[0]):
        raise ValueError(f'"{s}" is out of range for type {tname}')
    if kind == "float4":
        # float4in parses as double, then range-checks the float4
        # target: overflow past FLT_MAX, underflow when a nonzero
        # double rounds to float4 zero (float.c CHECKFLOATVAL)
        import struct

        if abs(v) > _MAX_F4:
            raise ValueError(f'"{s}" is out of range for type {tname}')
        if v != 0.0 and struct.unpack(
                "f", struct.pack("f", v))[0] == 0.0:
            raise ValueError(f'"{s}" is out of range for type {tname}')
    return v


def _worker_wrapper(fn_name: str):
    """Self-contained closure for the Python workers (same pattern as
    functions/geo_runtime.py): captures only strings, repairs sys.path
    (the worker has no /root/repo entry when the driver runs from
    another cwd — cloudpickle pickles module functions by reference),
    and re-imports this module worker-side."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    def wrapped(*args):
        import sys

        if repo not in sys.path:
            sys.path.insert(0, repo)
        from gpdb_spark.functions import pg_numeric_agg as m

        return getattr(m, fn_name)(*args)

    return wrapped


def register_numeric_agg_udfs(spark) -> None:
    if getattr(spark, "_pg_numeric_agg_registered", False):
        return
    from pyspark.sql.types import DoubleType, StringType

    spark.udf.register("pg_numeric_stddev",
                       _worker_wrapper("pg_numeric_stddev"),
                       StringType())
    spark.udf.register("pg_float4_numeric",
                       _worker_wrapper("pg_float4_out"), StringType())
    spark.udf.register("pg_float8_numeric",
                       _worker_wrapper("pg_float8_out"), StringType())
    spark.udf.register("pg_float_in",
                       _worker_wrapper("pg_float_in"), DoubleType())
    spark._pg_numeric_agg_registered = True
