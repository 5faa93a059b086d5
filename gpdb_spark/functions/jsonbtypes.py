"""jsonb value algebra for translate-time constant folding.

The reference's jsonb type canonicalizes on input (jsonb_util.c /
jsonfuncs.c): object keys sort by (length, byte order), duplicate keys
keep the LAST value, numbers become numerics rendered without
exponents, and the text output puts ", " between members and ": "
after keys. The json type, by contrast, preserves input text — the
fold renders json results with the same spacing discipline, which
matches the corpus's own spelling (documented approximation for
original-text preservation).

Operators implemented over parsed values (jsonb_op.c / jsonfuncs.c):
-> / ->> (field and element, negative indexes from the end), #> / #>>
(path arrays, NULL elements yield NULL), @> / <@ containment
(jsonb_contains: objects pairwise-recursive, arrays
exists-quantified, a scalar is contained in a top-level array), ? /
?| / ?& existence, || concat, - delete, jsonb_typeof,
jsonb_array_length, jsonb_extract_path(_text), jsonb_strip_nulls.
"""

from __future__ import annotations

import json
from decimal import Decimal


class JsonbError(ValueError):
    pass


_MISSING = object()


def parse(text: str, canonical: bool = True):
    """jsonb_in: strict parse; numbers as Decimal; objects keep the
    last duplicate key (dict semantics already do)."""
    def _no_const(s):
        raise JsonbError(f"invalid input syntax for type json: {s}")

    try:
        return json.loads(
            text, parse_float=Decimal, parse_int=Decimal,
            parse_constant=_no_const,
        )
    except JsonbError:
        raise
    except ValueError as exc:
        raise JsonbError(
            f"invalid input syntax for type json: {text[:50]}"
        ) from exc


def _num_text(d: Decimal) -> str:
    """numeric_out image: no exponent, input scale preserved."""
    s = format(d, "f")
    return s


def _key(k: str) -> tuple:
    b = k.encode("utf-8")
    return (len(b), b)


def render(v, sort_keys: bool = True) -> str:
    """jsonb text output: ", " separators, ": " after keys, keys in
    (length, byte) order; numbers via numeric_out."""
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, Decimal):
        return _num_text(v)
    if isinstance(v, str):
        return json.dumps(v, ensure_ascii=False)
    if isinstance(v, list):
        return "[" + ", ".join(render(e, sort_keys) for e in v) + "]"
    if isinstance(v, dict):
        keys = sorted(v, key=_key) if sort_keys else list(v)
        return "{" + ", ".join(
            f"{json.dumps(k, ensure_ascii=False)}: {render(v[k], sort_keys)}"
            for k in keys
        ) + "}"
    raise JsonbError(f"unrenderable json value: {v!r}")


def text_image(v) -> str | None:
    """The ->> / #>> image: strings unquoted, null -> SQL NULL,
    containers as their rendered text."""
    if v is None:
        return None
    if isinstance(v, str):
        return v
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, Decimal):
        return _num_text(v)
    return render(v)


def get_field(v, key):
    """-> with a text key (object field) or integer (array element,
    negative from the end). Returns _MISSING when absent."""
    if isinstance(key, int):
        if isinstance(v, list):
            idx = key if key >= 0 else len(v) + key
            if 0 <= idx < len(v):
                return v[idx]
        return _MISSING
    if isinstance(v, dict):
        return v.get(key, _MISSING)
    return _MISSING


def get_path(v, path: list):
    """#>: successive field/element steps; a NULL path element or a
    miss yields _MISSING. Array steps accept integer-looking text."""
    cur = v
    for p in path:
        if p is None:
            return _MISSING
        if isinstance(cur, list):
            try:
                step: object = int(p)
            except (TypeError, ValueError):
                return _MISSING
        else:
            step = p
        cur = get_field(cur, step)
        if cur is _MISSING:
            return _MISSING
    return cur


def contains(hay, needle) -> bool:
    """jsonb_contains (jsonb_op.c JsonbDeepContains)."""
    if isinstance(hay, dict) and isinstance(needle, dict):
        for k, nv in needle.items():
            if k not in hay or not contains(hay[k], nv):
                return False
        return True
    if isinstance(hay, list) and isinstance(needle, list):
        for ne in needle:
            if isinstance(ne, (dict, list)):
                if not any(
                    isinstance(he, type(ne)) and contains(he, ne)
                    for he in hay
                ):
                    return False
            elif not any(_scalar_eq(he, ne) for he in hay):
                return False
        return True
    if isinstance(hay, list) and not isinstance(needle, (dict, list)):
        # a top-level array contains a bare scalar
        return any(_scalar_eq(he, needle) for he in hay)
    return _scalar_eq(hay, needle) and not (
        isinstance(hay, (dict, list)) or isinstance(needle, (dict, list))
    )


def _scalar_eq(a, b) -> bool:
    if isinstance(a, (dict, list)) or isinstance(b, (dict, list)):
        return False
    if isinstance(a, bool) or isinstance(b, bool):
        return a is b
    if isinstance(a, Decimal) and isinstance(b, Decimal):
        return a == b
    return type(a) is type(b) and a == b


def exists(v, key: str) -> bool:
    """? operator: top-level object key or array string element."""
    if isinstance(v, dict):
        return key in v
    if isinstance(v, list):
        return any(isinstance(e, str) and e == key for e in v)
    return isinstance(v, str) and v == key


def typeof(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, Decimal):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    return "object"


def array_length(v) -> int:
    if not isinstance(v, list):
        raise JsonbError(
            "cannot get array length of a non-array"
            if not isinstance(v, dict)
            else "cannot get array length of a scalar"
        )
    return len(v)


def concat(a, b):
    """|| (jsonb_concat): object+object merge (right wins),
    array+array append, scalar/array promote to arrays."""
    if isinstance(a, dict) and isinstance(b, dict):
        out = dict(a)
        out.update(b)
        return out
    la = a if isinstance(a, list) else [a]
    lb = b if isinstance(b, list) else [b]
    return la + lb


def delete(v, key):
    """- operator: object key or array element/index removal."""
    if isinstance(key, int):
        if not isinstance(v, list):
            raise JsonbError("cannot delete from non-array")
        idx = key if key >= 0 else len(v) + key
        return [e for i, e in enumerate(v) if i != idx]
    if isinstance(v, dict):
        return {k: x for k, x in v.items() if k != key}
    if isinstance(v, list):
        return [e for e in v if not (isinstance(e, str) and e == key)]
    raise JsonbError("cannot delete from scalar")


def strip_nulls(v):
    if isinstance(v, dict):
        return {k: strip_nulls(x) for k, x in v.items() if x is not None}
    if isinstance(v, list):
        return [strip_nulls(e) for e in v]
    return v
