"""GPDB ``complex`` type: literal input, output rendering, and the
constant operator algebra — a pure-Python reimplementation of the
reference's complex_type.c (src/backend/utils/adt/complex_type.c,
studied, not copied: this file re-derives the same published
semantics — naive componentwise arithmetic over C doubles, the
Euclidean integer-power loop, polar-form general power, %.15g part
rendering with an always-signed imaginary part — in Python).

Values are plain ``(re, im)`` float tuples. NaN equals NaN and
-0 equals 0 in comparisons (PG float8 comparison semantics); division
follows the naive formula, so a zero denominator yields NaN/Infinity
parts exactly as the C double arithmetic does. Used only by the
dialect's translate-time constant fold — column-valued complex math
stays on the Spark-native struct ops in functions/complex.py.
"""
from __future__ import annotations

import math
import re as _re

__all__ = [
    "complex_in", "complex_out", "c_add", "c_sub", "c_mul", "c_div",
    "c_neg", "c_eq", "c_abs", "c_arg", "c_conj", "c_pow", "c_sqrt",
    "c_cbrt", "c_ln", "c_exp", "dotproduct", "hashcomplex",
]

_NUM = (r"[+-]?(?:infinity|inf|nan"
        r"|\d+(?:\.\d*)?(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?)")


def _part_in(text: str, raw: str) -> float:
    t = text.strip().lower()
    sign = 1.0
    if t.startswith(("+", "-")):
        sign = -1.0 if t[0] == "-" else 1.0
        t = t[1:]
    if t in ("infinity", "inf"):
        return sign * math.inf
    if t == "nan":
        return math.nan
    v = float(t)
    if math.isinf(v) or (
        v == 0.0 and _re.search(r"[1-9]", t.split("e")[0].split("E")[0])
    ):
        # float8in's CHECKFLOATVAL: a finite literal must stay finite
        # and a nonzero one must not underflow to zero
        raise ValueError(
            f'"{raw}" is out of range for type complex')
    return sign * v


def complex_in(text: str) -> tuple[float, float]:
    """complex_in: '5', '3i', '5 + 3i', '6 - -7i',
    '-infinity + -infinityi', '9-10i' (whitespace-tolerant)."""
    s = text.strip()
    m = _re.fullmatch(rf"({_NUM})\s*([+-])\s*({_NUM})\s*i",
                      s, _re.IGNORECASE)
    if m:
        a = _part_in(m.group(1), text)
        b = _part_in(m.group(3), text)
        if m.group(2) == "-":
            b = -b
        return (a, b)
    m = _re.fullmatch(rf"({_NUM})\s*i", s, _re.IGNORECASE)
    if m:
        return (0.0, _part_in(m.group(1), text))
    m = _re.fullmatch(rf"({_NUM})", s, _re.IGNORECASE)
    if m:
        return (_part_in(m.group(1), text), 0.0)
    raise ValueError(
        f'invalid input syntax for type complex: "{text}"')


def _part_out(v: float) -> str:
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    if math.isnan(v):
        return "NaN"
    return "%.15g" % v


def complex_out(z: tuple[float, float]) -> str:
    """complex_out: 're ± |im|i' — the imaginary sign always prints,
    and a ZERO imaginary part keeps its own sign (sqrt branch cuts)."""
    a, b = z
    neg_im = (b < 0 or (b == 0 and math.copysign(1.0, b) < 0)) \
        and not math.isnan(b)
    mag = b if b == 0 else abs(b)
    if neg_im and b == 0:
        mag = 0.0
    return (f"{_part_out(a)} {'-' if neg_im else '+'} "
            f"{_part_out(mag)}i")


def c_add(x, y):
    return (x[0] + y[0], x[1] + y[1])


def c_sub(x, y):
    return (x[0] - y[0], x[1] - y[1])


def c_mul(x, y):
    return (x[0] * y[0] - x[1] * y[1], x[0] * y[1] + x[1] * y[0])


def _fdiv(num: float, den: float) -> float:
    """C double division where the denominator can be +0."""
    if den == 0.0:
        if math.isnan(num) or num == 0.0:
            return math.nan
        return math.copysign(math.inf, num)
    return num / den


def c_div(x, y):
    d = y[0] * y[0] + y[1] * y[1]
    return (_fdiv(x[0] * y[0] + x[1] * y[1], d),
            _fdiv(x[1] * y[0] - x[0] * y[1], d))


def c_neg(x):
    return (-x[0], -x[1])


def _feq(a: float, b: float) -> bool:
    """float8 comparison semantics: NaN equals NaN, -0 equals 0."""
    if math.isnan(a) or math.isnan(b):
        return math.isnan(a) and math.isnan(b)
    return a == b


def c_eq(x, y) -> bool:
    return _feq(x[0], y[0]) and _feq(x[1], y[1])


def c_abs(x) -> float:
    return math.hypot(x[0], x[1])


def c_arg(x) -> float:
    return math.atan2(x[1], x[0])


def c_conj(x):
    return (x[0], -x[1])


def _cpow_n(x, k: int):
    """The Euclidean square-and-multiply loop, step-for-step (the
    float rounding ORDER matters for = probes against power())."""
    if k == 0:
        return (1.0, 0.0)
    if k == 1:
        return x
    if k < 0:
        return c_div((1.0, 0.0), _cpow_n(x, -k))
    z = (1.0, 0.0)
    while k > 0:
        if k & 1:
            z = c_mul(z, x)
        if k == 1:
            break
        k >>= 1
        x = c_mul(x, x)
    return z


def c_pow(x, y):
    yr, yi = y
    if x[0] == 0.0 and x[1] == 0.0:
        if yi == 0.0:
            try:
                v = math.pow(0.0, yr)
            except ValueError:  # C pow(0, negative) = +inf
                v = math.inf
            return (v, 0.0)
        return (math.nan, math.nan)
    if yi == 0.0 and not math.isnan(yr) and not math.isinf(yr) \
            and yr == int(yr) and abs(int(yr)) <= 65536:
        return _cpow_n(x, int(yr))
    r = c_abs(x)
    i = c_arg(x)
    theta = i * yr
    if yi == 0.0:
        rho = math.pow(r, yr)
    else:
        lr = math.log(r)
        theta = lr * yi + theta
        rho = math.exp(lr * yr - i * yi)
    return (rho * math.cos(theta), rho * math.sin(theta))


def c_sqrt(x):
    return c_pow(x, (0.5, 0.0))


def c_cbrt(x):
    return c_pow(x, (1.0 / 3.0, 0.0))


def c_ln(x):
    r = c_abs(x)
    return (math.log(r) if r != 0 else -math.inf, c_arg(x))


def c_exp(x):
    rho = math.exp(x[0])
    return (rho * math.cos(x[1]), rho * math.sin(x[1]))


def dotproduct(x, y) -> float:
    return x[0] * y[0] + x[1] * y[1]


def hashcomplex(x) -> int:
    """Deterministic hash with hashcomplex's invariants: -0 hashes
    like 0 on either part (the regress probes compare hashcomplex
    against hashcomplex, so self-consistency is the contract)."""
    a = 0.0 if x[0] == 0.0 else x[0]
    b = 0.0 if x[1] == 0.0 else x[1]
    import struct
    import zlib

    return zlib.crc32(struct.pack("<dd", a, b))
