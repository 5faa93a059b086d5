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


def pg_numeric_sum_texts(vals: list, mode: str) -> str | None:
    """Exact SUM/AVG over collected unconstrained-numeric TEXT images
    (numeric.c numeric_sum / numeric_avg): sum keeps the max input
    dscale; avg divides by count at select_div_scale. Feeds the
    window rewrite for text-stored numeric columns — frame membership
    is Spark's (collect_list OVER the same window spec), only the
    arithmetic is exact decimal."""
    if vals is None:
        return None
    xs = [v for v in vals if v is not None]
    if not xs:
        return None
    if any(str(v).strip().lower() == "nan" for v in xs):
        return "NaN"
    with localcontext() as c:
        c.prec = 1000
        total = sum(Decimal(str(v)) for v in xs)
        ds = max(_dscale(str(v)) for v in xs)
        if mode == "sum":
            out = _round_var(total, ds)
        else:
            n = Decimal(len(xs))
            rscale = select_div_scale(total, ds, n, 0)
            out = _round_var(total / n, rscale)
    return f"{out:f}"


def pg_numeric_bin(op: str, a, b=None) -> str | None:
    """Exact numeric arithmetic over TEXT-stored numeric operands
    (numeric.c numeric_add/sub/mul/div/sqrt/ln/log/power, round/trunc
    /abs): result display scale follows numeric.c's selection —
    add/sub keep max(ds1, ds2), mul uses ds1+ds2, div uses
    select_div_scale, the transcendentals target ~16 significant
    digits past their integer weight (clamped to the operand dscale).
    Values are computed at precision 1000 so a scale-10 store (the
    numeric.sql typmod) sees exact digits."""
    if a is None or (b is None and op not in ("abs", "sqrt", "ln")):
        if op in ("abs", "sqrt", "ln") and a is None:
            return None
        if a is None or b is None:
            return None
    sa = str(a).strip()
    sb = str(b).strip() if b is not None else None
    if sa.lower() == "nan" or (sb is not None
                               and sb.lower() == "nan"):
        return "NaN"
    with localcontext() as c:
        c.prec = 1000
        x = Decimal(sa)
        ds1 = _dscale(sa)
        y = Decimal(sb) if sb is not None else None
        ds2 = _dscale(sb) if sb is not None else 0
        if op == "add":
            out = _round_var(x + y, max(ds1, ds2))
        elif op == "sub":
            out = _round_var(x - y, max(ds1, ds2))
        elif op == "mul":
            out = _round_var(x * y, ds1 + ds2)
        elif op == "div":
            if y == 0:
                raise ValueError("division by zero")
            rs = select_div_scale(x, ds1, y, ds2)
            out = _round_var(x / y, rs)
        elif op == "round":
            n = int(y)
            out = x.quantize(Decimal(1).scaleb(-min(n, 1000)),
                             rounding=ROUND_HALF_UP) \
                if n >= 0 else \
                x.quantize(Decimal(1).scaleb(-n),
                           rounding=ROUND_HALF_UP)
        elif op == "trunc":
            import decimal as _d2
            n = int(y)
            out = x.quantize(Decimal(1).scaleb(-n),
                             rounding=_d2.ROUND_DOWN)
        elif op == "abs":
            out = _round_var(abs(x), ds1)
        elif op == "sqrt":
            if x < 0:
                raise ValueError(
                    "cannot take square root of a negative number")
            r = x.sqrt()
            # numeric_sqrt: ~16 significant digits past the result's
            # integer weight, at least the operand's dscale
            w = r.adjusted() + 1 if r != 0 else 1
            rs = max(NUMERIC_MIN_SIG_DIGITS - w, ds1, 0)
            out = _round_var(r, rs)
        elif op == "ln":
            if x <= 0:
                raise ValueError(
                    "cannot take logarithm of a non-positive number")
            r = x.ln()
            w = r.adjusted() + 1 if r != 0 else 1
            rs = max(NUMERIC_MIN_SIG_DIGITS - w, ds1, 0)
            out = _round_var(r, rs)
        elif op == "log":
            # log(base, x) — numeric_log: scale targets min-sig past
            # weight, at least either operand's dscale
            if y is None or y <= 0 or x <= 0:
                raise ValueError(
                    "cannot take logarithm of a non-positive number")
            r = y.ln() / x.ln()
            w = r.adjusted() + 1 if r != 0 else 1
            rs = max(NUMERIC_MIN_SIG_DIGITS - w, ds1, ds2, 0)
            out = _round_var(r, rs)
        elif op == "pow":
            if x == 0 and y < 0:
                raise ValueError("zero raised to a negative power is "
                                 "undefined")
            r = (y * x.ln()).exp() if x > 0 else (
                Decimal(0) if x == 0 and y != 0 else x ** y)
            # numeric_power keeps at least 16 display decimals and
            # either operand's dscale (power(10,2) is
            # 100.0000000000000000 in PG)
            rs = max(NUMERIC_MIN_SIG_DIGITS, ds1, ds2)
            out = _round_var(r, rs)
        else:
            raise ValueError(f"unknown numeric op {op!r}")
        txt = f"{out:f}"
    if out == 0 and txt.startswith("-"):
        txt = txt[1:]
    return txt


def pg_numeric_cmp(a, b) -> int | None:
    """numeric comparison over text operands (cmp_numerics): NaN
    compares equal to NaN and greater than everything else."""
    if a is None or b is None:
        return None
    sa, sb = str(a).strip(), str(b).strip()
    na, nb = sa.lower() == "nan", sb.lower() == "nan"
    if na or nb:
        return 0 if na and nb else (1 if na else -1)
    with localcontext() as c:
        c.prec = 1000
        x, y = Decimal(sa), Decimal(sb)
        return -1 if x < y else (1 if x > y else 0)


def pg_num_fmt(val, pattern):
    """formatting.c NUM_processor, positional — the edge forms the
    expression-based renderer in functions/pg.py cannot carry:
    spaced-digit patterns ('S 9 9 9'), quoted literal text inside NUM
    patterns, mid-pattern SG, leading MI, TH/th ordinal suffixes, L
    under the C locale (empty currency). Conformance surface only —
    the dialect routes a pattern here only when the expression
    renderer's parser refuses it (int8.sql to_char_5..17)."""
    if val is None or pattern is None:
        return None
    # the dialect lexer ships E'' literals with doubled backslashes —
    # collapse to the decoded spelling ('\\"' -> '\"')
    p = str(pattern).replace("\\\\", "\\")
    toks: list[tuple] = []
    fm = False
    i = 0
    while i < len(p):
        c = p[i]
        if c == '"':
            # closing quote scan honors backslash escapes (\" is an
            # escaped quote INSIDE the literal — formatting.c)
            j = i + 1
            buf = []
            while j < len(p):
                if p[j] == "\\" and j + 1 < len(p):
                    buf.append(p[j + 1])
                    j += 2
                    continue
                if p[j] == '"':
                    break
                buf.append(p[j])
                j += 1
            toks.append(("lit", "".join(buf)))
            i = j + 1
            continue
        if c == "\\" and i + 1 < len(p):
            toks.append(("lit", p[i + 1]))
            i += 2
            continue
        if p[i:i + 4] in ("EEEE", "eeee"):
            toks.append(("eeee",))
            i += 4
            continue
        two = p[i:i + 2]
        if two in ("FM", "fm"):
            fm = True
            i += 2
            continue
        if two in ("TH", "th"):
            toks.append(("th", two == "TH"))
            i += 2
            continue
        if two.upper() == "SG":
            toks.append(("sg",))
            i += 2
            continue
        if two.upper() == "MI":
            toks.append(("mi",))
            i += 2
            continue
        if two.upper() == "PL":
            toks.append(("pl",))
            i += 2
            continue
        if two.upper() == "PR":
            toks.append(("pr",))
            i += 2
            continue
        if c in "Ss":
            toks.append(("s",))
            i += 1
            continue
        if c in "09":
            toks.append(("d", c))
            i += 1
            continue
        if c in "Gg,":
            toks.append(("sep", ","))
            i += 1
            continue
        if c in "Dd.":
            toks.append(("dec",))
            i += 1
            continue
        if c in "Ll":
            toks.append(("cur",))
            i += 1
            continue
        toks.append(("lit", c))
        i += 1
    pre = [t[1] for t in toks if t[0] == "d"]
    # split pre/post at the first dec token
    dec_at = next((k for k, t in enumerate(toks) if t[0] == "dec"),
                  None)
    if dec_at is not None:
        pre = [t[1] for t in toks[:dec_at] if t[0] == "d"]
        post_slots = [t[1] for t in toks[dec_at:] if t[0] == "d"]
    else:
        post_slots = []
    post = len(post_slots)
    if not pre:
        return None
    d = Decimal(str(val))
    neg = d < 0
    if any(t[0] == "eeee" for t in toks):
        # scientific notation (NUM_E): one int digit, `post` mantissa
        # decimals, two-digit signed exponent ('9.999EEEE' ->
        # '-2.493e+07'; zero is '0.000e+00')
        with localcontext() as c2:
            c2.prec = 1000
            a2 = abs(d)
            if a2 == 0:
                mant_txt = "0" + ("." + "0" * post if post else "")
                exp = 0
            else:
                exp = a2.adjusted()
                mant = a2.scaleb(-exp).quantize(
                    Decimal(1).scaleb(-post), rounding=ROUND_HALF_UP)
                if mant >= 10:
                    mant = (mant / 10).quantize(
                        Decimal(1).scaleb(-post),
                        rounding=ROUND_HALF_UP)
                    exp += 1
                mant_txt = f"{mant:f}"
        return ("-" if neg else ("" if fm else " ")) \
            + mant_txt + f"e{exp:+03d}"
    rounded = abs(d).quantize(
        Decimal(1).scaleb(-post), rounding=ROUND_HALF_UP)
    s = f"{rounded:f}"
    ip, dp = (s.split(".", 1) + [""])[:2] if "." in s else (s, "")
    dp = dp.ljust(post, "0")
    zstart = next((k for k, c2 in enumerate(pre) if c2 == "0"), None)
    if zstart is not None:
        ip = ip.zfill(len(pre) - zstart)
    elif ip == "0" and post > 0:
        # a value with no integer digits prints NO int-part zero in a
        # space-padded pattern ('.000...', numeric.out to_char_5);
        # FM keeps the single '0' (to_char_7's '0.') UNLESS the
        # decimals carry zero-fill slots (to_char_12's '.0')
        if not fm or "0" in post_slots:
            ip = ""
    overflow = len(ip) > len(pre)
    used_from = len(pre) - len(ip)
    first_d = next((k for k, t in enumerate(toks) if t[0] == "d"),
                   len(toks))
    has_pr = any(t[0] == "pr" for t in toks)
    # PR keeps the default sign slot (int8.out to_char_3: positive
    # rows lead with a space even at full digit width)
    explicit = any(t[0] in ("s", "sg", "mi") for t in toks)
    # pieces: (tag, text); tag 'sp' = swappable slot space
    pieces: list[list] = []
    signpos = None
    if not explicit:
        pieces.append(["signslot", ""])
        signpos = 0
    pre_i = 0
    post_i = 0
    seen_dec = False
    for k, t in enumerate(toks):
        kind = t[0]
        if kind == "dec":
            seen_dec = True
        if kind == "d" and pre_i < len(pre) and (dec_at is None
                                                or k < dec_at):
            if overflow:
                pieces.append(["text", "#"])
            elif pre_i < used_from:
                if not fm:
                    pieces.append(["sp", " "])
            else:
                pieces.append(["digit", ip[pre_i - used_from]])
            pre_i += 1
        elif kind == "d":
            pieces.append(["text", "#"] if overflow
                          else ["postdigit", dp[post_i],
                                post_slots[post_i]])
            post_i += 1
        elif kind == "sep":
            if overflow:
                pieces.append(["text", "#"])
            elif seen_dec:
                # post-decimal grouping always prints ('.000,000' —
                # numeric.out to_char_2); strip-eligible under FM
                pieces.append(["postsep", t[1]])
            elif pre_i > used_from:
                pieces.append(["text", t[1]])
            elif not fm:
                pieces.append(["sp", " "])
        elif kind == "dec":
            pieces.append(["dec", "#" if overflow else "."])
        elif kind == "lit":
            pieces.append(["text", t[1]])
        elif kind == "s":
            if k < first_d:
                signpos = len(pieces)
                pieces.append(["signslot", ""])
            else:
                pieces.append(["text", "-" if neg else "+"])
        elif kind == "sg":
            pieces.append(["text", "-" if neg else "+"])
        elif kind == "mi":
            if neg:
                pieces.append(["text", "-"])
            elif not fm:
                pieces.append(["sp", " "])
        elif kind == "pl":
            if not neg:
                pieces.append(["text", "+"])
            elif not fm:
                pieces.append(["sp", " "])
        elif kind == "pr":
            if neg:
                pieces.append(["text", ">"])
            elif not fm:
                pieces.append(["sp", " "])
        elif kind == "th":
            # TH "does not convert fractional numbers": a pattern
            # with decimal slots suppresses the suffix entirely
            # (numeric.out to_char_7)
            if not neg and post == 0:
                try:
                    iv = int(ip) if ip else 0
                except ValueError:
                    iv = 0
                last2 = iv % 100
                last1 = iv % 10
                if 11 <= last2 <= 13 or last1 not in (1, 2, 3):
                    sfx = "th"
                else:
                    sfx = {1: "st", 2: "nd", 3: "rd"}[last1]
                pieces.append(["text", sfx.upper() if t[1] else sfx])
        elif kind == "cur":
            # C locale: empty currency symbol, but the L slot still
            # holds one (swappable) space of width (int8.out to_char_13)
            if not fm:
                pieces.append(["sp", " "])
    # sign character floats right across slot spaces so it hugs the
    # first digit (NUM_processor sign placement); the vacated slots
    # stay spaces, preserving total width
    def _first_digit_at(frm):
        # the sign hugs the first emitted digit, crossing unused
        # slots AND literal text (int8.out to_char_16: the default
        # sign slot's space lands right before '456', after 'text')
        for j2 in range(frm, len(pieces)):
            if pieces[j2][0] in ("digit", "postdigit", "dec") \
                    or (pieces[j2][0] == "text"
                        and pieces[j2][1] == "#"):
                return j2
        return len(pieces)

    if signpos is not None:
        if has_pr:
            ch = "<" if neg else ("" if fm else " ")
        elif explicit:
            ch = "-" if neg else "+"
        else:
            ch = "-" if neg else ("" if fm else " ")
        del pieces[signpos]
        pieces.insert(_first_digit_at(signpos), ["sign", ch])
    elif has_pr and neg:
        # explicit sign present AND PR: '<' still floats to the digits
        pieces.insert(_first_digit_at(0), ["sign", "<"])
    if fm:
        # strip trailing zeros sitting in '9' decimal slots, together
        # with their interleaved literal spaces and group separators
        # ('FMS 9 9 . 9 9' of 74881 -> '+7 4 8 8 1 .' — the spaced
        # pattern strips whole ' 0' pairs, numeric.out to_char_19)
        blanked: list = []
        for k in range(len(pieces) - 1, -1, -1):
            pc = pieces[k]
            if pc[0] == "postdigit":
                if pc[1] == "0" and pc[2] == "9":
                    pc[1] = ""
                    for b in blanked:
                        b[1] = ""
                    blanked = []
                    continue
                break
            if pc[0] == "postsep" or (pc[0] == "text"
                                      and pc[1] == " "):
                blanked.append(pc)
                continue
            if pc[0] == "text" and pc[1] in ("TH", "th", "ST", "st",
                                             "ND", "nd", "RD", "rd",
                                             ">"):
                continue
            break
        # a fully-stripped decimal tail also drops the space(s)
        # between the '.' and the first (stripped) digit slot
        last_dec = next((k for k in range(len(pieces) - 1, -1, -1)
                         if pieces[k][0] == "dec"), None)
        if last_dec is not None and all(
                pc[1] == "" for pc in pieces[last_dec + 1:]
                if pc[0] in ("postdigit", "postsep")):
            for pc in pieces[last_dec + 1:]:
                if pc[0] == "text" and pc[1] == " ":
                    pc[1] = ""
    return "".join(pc[1] for pc in pieces)


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
    spark.udf.register("pg_num_fmt",
                       _worker_wrapper("pg_num_fmt"), StringType())
    spark.udf.register("pg_numeric_sum_texts",
                       _worker_wrapper("pg_numeric_sum_texts"),
                       StringType())
    spark.udf.register("pg_numeric_bin",
                       _worker_wrapper("pg_numeric_bin"), StringType())
    from pyspark.sql.types import IntegerType
    spark.udf.register("pg_numeric_cmp",
                       _worker_wrapper("pg_numeric_cmp"),
                       IntegerType())
    spark._pg_numeric_agg_registered = True
