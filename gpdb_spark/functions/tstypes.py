"""tsvector / tsquery literal input, canonical output, and constant ops.

Faithful reimplementation of the reference's text-search *type* layer —
input parsing, canonical rendering, and the value-level operators — used
by the dialect to constant-fold `'...'::tsvector` / `'...'::tsquery`
expressions at translate time (the corpus-scale matching/ranking path is
relational: gpdb_spark/functions/fulltext.py postings()).

Reference behavior (studied, not copied):
- src/backend/utils/adt/tsvector_parser.c gettoken_tsvector — the input
  state machine: backslash escapes, '...' quoting with '' doubling,
  `:pos[,pos...]` lists where each position takes one optional weight
  char a/A/* -> A(3), b/B -> 2, c/C -> 1, d/D -> 0, positions capped at
  16383 (LIMITPOS), position 0 is a syntax error.
- src/backend/utils/adt/tsvector.c tsvectorin/tsvectorout — entries
  sorted by byte order, duplicates merged with uniquePos (sort by
  position; equal positions keep the higher weight; at most 256
  positions, stop at position 16383); output quotes every lexeme,
  doubling ' and \\, positions rendered :n[W] with weight D omitted.
- src/backend/utils/adt/tsquery.c gettoken_query/get_modifiers/makepol/
  infix — operators ! & | ( ), operand modifiers :[ABCDabcd*]* mapping
  to a weight bitmask (A=8,B=4,C=2,D=1) and prefix flag; makepol's
  operator stack makes & and ! bind immediately after a value while |
  collects left-associatively; infix() re-renders the parse tree with
  parentheses around every OR node that is not the root (or the direct
  child of a parenthesizing NOT) and !( ... ) around operator children
  of NOT.
- src/backend/utils/adt/tsquery_op.c CompareTSQ / tsquery_util.c
  QTNodeCompare — order by item count, then total value size, then a
  tree walk where *larger* type/oper codes sort FIRST (the comparisons
  are intentionally inverted in the reference), operands by legacy-CRC32
  then byte order; storage order puts the RIGHT subtree before the left,
  so the tree walk visits right children first.
- src/backend/utils/adt/tsvector_op.c tsvector_concat (right positions
  shifted by the left's max position), checkcondition_str/checkclass_str
  (@@ matching: a weighted query operand tests position weights only
  when the entry HAS positions; stripped entries match any weight),
  tsvector_setweight, tsvector_strip.
- src/include/utils/pg_crc.h INIT/COMP/FIN_LEGACY_CRC32 — the pre-9.5
  "bogus" CRC (normal-polynomial table with reflected-style code) that
  tsquery.c uses for operand valcrc.
"""

from __future__ import annotations

MAXENTRYPOS = 1 << 14  # tsvector.h
MAXNUMPOS = 256

# weight char <-> numeric (position weights: A=3..D=0)
_WCHAR_NUM = {"a": 3, "A": 3, "*": 3, "b": 2, "B": 2,
              "c": 1, "C": 1, "d": 0, "D": 0}
_NUM_WCHAR = {3: "A", 2: "B", 1: "C", 0: "D"}


class TSSyntaxError(ValueError):
    """Loud refusal matching the reference's ereport(SYNTAX_ERROR)."""


# ---------------------------------------------------------------- CRC32
# pg_crc.h legacy CRC: "normal" polynomial table (0x04C11DB7) driven with
# reflected-style code — not any standard CRC; required for QTNodeCompare
# operand ordering parity.
def _make_table() -> list[int]:
    tab = []
    for i in range(256):
        c = i << 24
        for _ in range(8):
            c = ((c << 1) ^ 0x04C11DB7 if c & 0x80000000 else c << 1)
            c &= 0xFFFFFFFF
        tab.append(c)
    return tab


_CRC_TABLE = _make_table()


def legacy_crc32(data: bytes) -> int:
    """Signed-int32 image of the legacy CRC (QueryOperand.valcrc)."""
    crc = 0xFFFFFFFF
    for b in data:
        idx = ((crc >> 24) ^ b) & 0xFF
        crc = (_CRC_TABLE[idx] ^ ((crc << 8) & 0xFFFFFFFF)) & 0xFFFFFFFF
    crc ^= 0xFFFFFFFF
    return crc - 0x100000000 if crc >= 0x80000000 else crc


# ------------------------------------------------------------- tsvector
# entry: (word, positions) with positions a tuple of (pos, weight) —
# empty tuple = stripped entry (no positions).

_TSQ_OPERATORS = set("!|&()")


def _gettoken(s: str, i: int, oprisdelim: bool):
    """gettoken_tsvector state machine. Returns (word, poslist, i) or
    None at end of input. poslist is None when no ':' position list
    followed the word (tsquery mode never parses positions)."""
    n = len(s)
    word: list[str] = []
    # WAITWORD
    while i < n:
        ch = s[i]
        if ch == "'":
            i += 1
            break
        if ch == "\\":
            i += 1
            if i >= n:
                raise TSSyntaxError(f"there is no escaped character: \"{s}\"")
            word.append(s[i])
            i += 1
            # WAITENDWORD
            return _endword(s, i, word, oprisdelim)
        if oprisdelim and ch in _TSQ_OPERATORS:
            raise TSSyntaxError(f"syntax error in tsquery: \"{s}\"")
        if not ch.isspace():
            word.append(ch)
            i += 1
            return _endword(s, i, word, oprisdelim)
        i += 1
    else:
        return None
    # WAITENDCMPLX — quoted word
    while True:
        if i >= n:
            raise TSSyntaxError(f"syntax error in ts string: \"{s}\"")
        ch = s[i]
        if ch == "'":
            if i + 1 < n and s[i + 1] == "'":  # WAITCHARCMPLX doubling
                word.append("'")
                i += 2
                continue
            i += 1
            if not word:
                raise TSSyntaxError(f"syntax error in ts string: \"{s}\"")
            if oprisdelim:
                return "".join(word), None, i
            # WAITPOSINFO
            if i < n and s[i] == ":":
                pos, i = _positions(s, i + 1)
                return "".join(word), pos, i
            return "".join(word), None, i
        if ch == "\\":
            i += 1
            if i >= n:
                raise TSSyntaxError(f"there is no escaped character: \"{s}\"")
            word.append(s[i])
            i += 1
            continue
        word.append(ch)
        i += 1


def _endword(s: str, i: int, word: list[str], oprisdelim: bool):
    n = len(s)
    while True:
        ch = s[i] if i < n else ""
        if ch == "\\":
            i += 1
            if i >= n:
                raise TSSyntaxError(f"there is no escaped character: \"{s}\"")
            word.append(s[i])
            i += 1
            continue
        if ch == "" or ch.isspace() or (oprisdelim and ch in _TSQ_OPERATORS):
            if not word:
                raise TSSyntaxError(f"syntax error in ts string: \"{s}\"")
            return "".join(word), None, i
        if ch == ":":
            if not word:
                raise TSSyntaxError(f"syntax error in ts string: \"{s}\"")
            if oprisdelim:
                return "".join(word), None, i
            pos, i = _positions(s, i + 1)
            return "".join(word), pos, i
        word.append(ch)
        i += 1


def _positions(s: str, i: int):
    """INPOSINFO/WAITPOSDELIM: digits with one optional weight char each,
    comma-separated."""
    n = len(s)
    out: list[tuple[int, int]] = []
    while True:
        j = i
        while j < n and s[j].isdigit():
            j += 1
        if j == i:
            raise TSSyntaxError(f"syntax error in tsvector: \"{s}\"")
        pos = min(int(s[i:j]), MAXENTRYPOS - 1)  # LIMITPOS
        if pos == 0:
            raise TSSyntaxError(f"wrong position info in tsvector: \"{s}\"")
        weight = 0
        i = j
        # WAITPOSDELIM accepts weight chars while the current weight is
        # still 0 (so '1dc' is legal and ends up C); a second NONZERO
        # weight is the syntax error.
        while i < n and s[i] in _WCHAR_NUM:
            if weight:
                raise TSSyntaxError(f"syntax error in tsvector: \"{s}\"")
            weight = _WCHAR_NUM[s[i]]
            i += 1
        out.append((pos, weight))
        if i < n and s[i] == ",":
            i += 1
            continue
        if i >= n or s[i].isspace():
            return out, i
        raise TSSyntaxError(f"syntax error in tsvector: \"{s}\"")


def _unique_pos(pos: list[tuple[int, int]]) -> tuple[tuple[int, int], ...]:
    """uniquePos: sort by position, keep the higher weight on duplicates,
    stop at MAXNUMPOS entries or position 16383."""
    if not pos:
        return ()
    pos = sorted(pos, key=lambda pw: pw[0])
    out = [pos[0]]
    for p, w in pos[1:]:
        if p != out[-1][0]:
            out.append((p, w))
            if len(out) >= MAXNUMPOS or p == MAXENTRYPOS - 1:
                break
        elif w > out[-1][1]:
            out[-1] = (p, w)
    return tuple(out)


def _key(word: str) -> bytes:
    return word.encode("utf-8")


def parse_tsvector(text: str) -> list[tuple[str, tuple[tuple[int, int], ...]]]:
    """tsvectorin: tokenize, sort by byte order, merge duplicates."""
    i = 0
    raw: list[tuple[str, list[tuple[int, int]]]] = []
    while True:
        tok = _gettoken(text, i, oprisdelim=False)
        if tok is None:
            break
        word, pos, i = tok
        raw.append((word, list(pos or [])))
    merged: dict[str, list[tuple[int, int]]] = {}
    for word, pos in raw:
        merged.setdefault(word, []).extend(pos)
    return [
        (w, _unique_pos(merged[w]))
        for w in sorted(merged, key=_key)
    ]


def _quote_lexeme(word: str) -> str:
    return "'" + word.replace("\\", "\\\\").replace("'", "''") + "'"


def render_tsvector(tsv) -> str:
    """tsvectorout: quoted lexemes, :pos[W] lists, weight D omitted."""
    parts = []
    for word, pos in tsv:
        s = _quote_lexeme(word)
        if pos:
            s += ":" + ",".join(
                f"{p}{_NUM_WCHAR[w] if w else ''}" for p, w in pos
            )
        parts.append(s)
    return " ".join(parts)


def tsvector_concat(a, b):
    """tsvector_op.c tsvector_concat: right-side positions shifted by the
    left's maximum position, then entry merge + uniquePos."""
    maxpos = max((p for _, pos in a for p, _ in pos), default=0)
    merged: dict[str, list[tuple[int, int]]] = {}
    for word, pos in a:
        merged.setdefault(word, []).extend(pos)
    for word, pos in b:
        shifted = [(min(p + maxpos, MAXENTRYPOS - 1), w) for p, w in pos]
        merged.setdefault(word, []).extend(shifted)
    return [(w, _unique_pos(merged[w])) for w in sorted(merged, key=_key)]


def tsvector_setweight(tsv, wchar: str):
    """tsvector_setweight: every position takes the given weight."""
    if wchar not in "ABCDabcd":
        raise TSSyntaxError(f"unrecognized weight: \"{wchar}\"")
    w = _WCHAR_NUM[wchar]
    return [(word, tuple((p, w) for p, _ in pos)) for word, pos in tsv]


def tsvector_strip(tsv):
    return [(word, ()) for word, _ in tsv]


def tsvector_length(tsv) -> int:
    return len(tsv)


# -------------------------------------------------------------- tsquery
# AST: ('val', word, weight_mask, prefix) / ('not', x) / ('and', l, r) /
# ('or', l, r).  weight_mask bits: A=8 B=4 C=2 D=1 (get_modifiers).

_QW_BIT = {"a": 8, "A": 8, "b": 4, "B": 4, "c": 2, "C": 2, "d": 1, "D": 1}


def parse_tsquery(text: str):
    """tsqueryin via makepol's operator stack (left-associative |, with
    & and ! reduced immediately after each value/close-paren)."""
    pos = [0]
    depth = [0]
    n = len(text)

    def tokens():
        """Replays gettoken_query: yields ('val', ...) / ('opr', op) /
        'open' / 'close'; tracks paren balance like state->count."""
        state = "waitoperand"
        while True:
            i = pos[0]
            while i < n and text[i].isspace():
                i += 1
            pos[0] = i
            if state == "waitoperand":
                if i >= n:
                    if depth[0]:
                        raise TSSyntaxError(
                            f"syntax error in tsquery: \"{text}\"")
                    return
                ch = text[i]
                if ch == "!":
                    pos[0] = i + 1
                    yield ("opr", "not")
                    continue
                if ch == "(":
                    pos[0] = i + 1
                    depth[0] += 1
                    yield "open"
                    continue
                if ch == ":":
                    raise TSSyntaxError(
                        f"syntax error in tsquery: \"{text}\"")
                tok = _gettoken(text, i, oprisdelim=True)
                if tok is None:
                    return
                word, _, i = tok
                # get_modifiers
                weight, prefix = 0, False
                if i < n and text[i] == ":":
                    i += 1
                    while i < n:
                        c = text[i]
                        if c in _QW_BIT:
                            weight |= _QW_BIT[c]
                        elif c == "*":
                            prefix = True
                        else:
                            break
                        i += 1
                pos[0] = i
                state = "waitoperator"
                yield ("val", word, weight, prefix)
                continue
            # waitoperator
            if i >= n:
                if depth[0]:
                    raise TSSyntaxError(
                        f"syntax error in tsquery: \"{text}\"")
                return
            ch = text[i]
            if ch == "&":
                pos[0] = i + 1
                state = "waitoperand"
                yield ("opr", "and")
            elif ch == "|":
                pos[0] = i + 1
                state = "waitoperand"
                yield ("opr", "or")
            elif ch == ")":
                pos[0] = i + 1
                depth[0] -= 1
                if depth[0] < 0:
                    raise TSSyntaxError(
                        f"syntax error in tsquery: \"{text}\"")
                yield "close"
            else:
                raise TSSyntaxError(f"syntax error in tsquery: \"{text}\"")

    tokit = tokens()

    def apply_op(out: list, op: str):
        if op == "not":
            if not out:
                raise TSSyntaxError(f"syntax error in tsquery: \"{text}\"")
            out.append(("not", out.pop()))
        else:
            if len(out) < 2:
                raise TSSyntaxError(f"syntax error in tsquery: \"{text}\"")
            right = out.pop()
            left = out.pop()
            out.append((op, left, right))

    def makepol(out: list):
        opstack: list[str] = []
        for tok in tokit:
            if tok == "open":
                makepol(out)
                while opstack and opstack[-1] in ("and", "not"):
                    apply_op(out, opstack.pop())
            elif tok == "close":
                while opstack:
                    apply_op(out, opstack.pop())
                return
            elif tok[0] == "opr":
                op = tok[1]
                if opstack and op == "or":
                    apply_op(out, "or")
                else:
                    opstack.append(op)
            else:  # value
                out.append(("val", tok[1], tok[2], tok[3]))
                while opstack and opstack[-1] in ("and", "not"):
                    apply_op(out, opstack.pop())
        while opstack:
            apply_op(out, opstack.pop())

    out: list = []
    makepol(out)
    if not out:
        raise TSSyntaxError(f"syntax error in tsquery: \"{text}\"")
    if len(out) != 1:
        raise TSSyntaxError(f"syntax error in tsquery: \"{text}\"")
    return out[0]


def _render_operand(node) -> str:
    _, word, weight, prefix = node
    s = _quote_lexeme(word)
    if weight or prefix:
        s += ":"
        if prefix:
            s += "*"
        for bit, ch in ((8, "A"), (4, "B"), (2, "C"), (1, "D")):
            if weight & bit:
                s += ch
    return s


def render_tsquery(node, first: bool = True) -> str:
    """tsquery.c infix(): OR wraps itself in parens unless `first`
    (root, or the operator child NOT already parenthesized)."""
    kind = node[0]
    if kind == "val":
        return _render_operand(node)
    if kind == "not":
        child = node[1]
        if child[0] == "val":
            return "!" + render_tsquery(child, False)
        return "!( " + render_tsquery(child, True) + " )"
    left = render_tsquery(node[1], False)
    right = render_tsquery(node[2], False)
    opch = "|" if kind == "or" else "&"
    s = f"{left} {opch} {right}"
    if kind == "or" and not first:
        s = f"( {s} )"
    return s


def tsq_and(a, b):
    return ("and", a, b)


def tsq_or(a, b):
    return ("or", a, b)


def tsq_not(a):
    return ("not", a)


def numnode(node) -> int:
    if node[0] == "val":
        return 1
    if node[0] == "not":
        return 1 + numnode(node[1])
    return 1 + numnode(node[1]) + numnode(node[2])


_OPER_CODE = {"not": 1, "and": 2, "or": 3}  # ts_type.h OP_*


def _qsize(node) -> int:
    return numnode(node)


def _opbytes(node) -> int:
    """Total operand byte length (+NUL each) — the VARSIZE tiebreaker."""
    if node[0] == "val":
        return len(node[1].encode("utf-8")) + 1
    if node[0] == "not":
        return _opbytes(node[1])
    return _opbytes(node[1]) + _opbytes(node[2])


def _node_cmp(a, b) -> int:
    """QTNodeCompare: operators before operands is decided by the type
    code (larger type sorts FIRST — reference inverts); operators by
    oper code (larger FIRST); storage puts right subtrees before left,
    so right children compare first."""
    a_opr = a[0] != "val"
    b_opr = b[0] != "val"
    if a_opr != b_opr:
        # QI_OPR=2 > QI_VAL=1; larger type -> -1
        return -1 if a_opr else 1
    if a_opr:
        ao, bo = _OPER_CODE[a[0]], _OPER_CODE[b[0]]
        if ao != bo:
            return -1 if ao > bo else 1
        if a[0] == "not":
            return _node_cmp(a[1], b[1])
        r = _node_cmp(a[2], b[2])  # right child stored first
        if r:
            return r
        return _node_cmp(a[1], b[1])
    ka, kb = _key(a[1]), _key(b[1])
    ca, cb = legacy_crc32(ka), legacy_crc32(kb)
    if ca != cb:
        return -1 if ca > cb else 1
    return -1 if ka < kb else (1 if ka > kb else 0)


def tsquery_cmp(a, b) -> int:
    """CompareTSQ: item count, then operand bytes, then tree order."""
    sa, sb = _qsize(a), _qsize(b)
    if sa != sb:
        return -1 if sa < sb else 1
    oa, ob = _opbytes(a), _opbytes(b)
    if oa != ob:
        return -1 if oa < ob else 1
    return _node_cmp(a, b)


# ------------------------------------------------------------ ranking
# src/backend/utils/adt/tsrank.c — calc_rank_or / calc_rank_and /
# calc_rank_cd with the default weight array {D=0.1, C=0.2, B=0.4,
# A=1.0} and method 0 (RANK_NO_NORM). Arithmetic runs at C float
# (float32) width where the reference does — numpy.float32 throughout,
# doubles only where the C expression promotes (the 1.64493406685 and
# sqrt/exp terms).

_DEF_WEIGHTS = (0.1, 0.2, 0.4, 1.0)  # indexed by position weight D..A


def _query_operands(query):
    """Prefix-order (right subtree first — the reference's storage
    order) operand nodes of a tsquery AST."""
    out = []

    def walk(node):
        if node[0] == "val":
            out.append(node)
        elif node[0] == "not":
            walk(node[1])
        else:
            walk(node[2])  # right stored first
            walk(node[1])

    walk(query)
    return out


def _find_entries(tsv, word: str, prefix: bool):
    """find_wordentry: matching entries (byte-prefix scan for prefix)."""
    if prefix:
        return [e for e in tsv if e[0].startswith(word)]
    return [e for e in tsv if e[0] == word]


def _sorted_uniq_operands(query):
    """SortAndUniqItems: operands sorted by byte order, dedup by word
    (the comparator looks at the string only)."""
    seen = set()
    out = []
    for node in sorted(_query_operands(query), key=lambda nd: _key(nd[1])):
        k = _key(node[1])
        if k in seen:
            continue
        seen.add(k)
        out.append(node)
    return out


def _word_distance(d: int):
    import math

    import numpy as np

    if d > 100:
        return np.float32(1e-30)
    return np.float32(1.0 / (1.005 + 0.05 * math.exp(d / 1.5 - 2)))


def _calc_rank_or(tsv, query):
    import numpy as np

    f = np.float32
    res = f(0.0)
    items = _sorted_uniq_operands(query)
    for node in items:
        _, word, _, prefix = node
        for _, pos in _find_entries(tsv, word, prefix):
            posv = pos if pos else ((0, 0),)  # POSNULL
            resj, wjm, jm = f(0.0), f(-1.0), 0
            for j, (_, w) in enumerate(posv):
                wp = f(_DEF_WEIGHTS[w])
                resj = f(resj + f(wp / f((j + 1) * (j + 1))))
                if wp > wjm:
                    wjm, jm = wp, j
            num = f(wjm + resj - f(wjm / f((jm + 1) * (jm + 1))))
            res = f(float(res) + float(num) / 1.64493406685)
    if items:
        res = f(res / f(len(items)))
    return res


def _calc_rank_and(tsv, query):
    import math

    import numpy as np

    f = np.float32
    items = _sorted_uniq_operands(query)
    if len(items) < 2:
        return _calc_rank_or(tsv, query)
    posnull = ((MAXENTRYPOS - 1, 0),)
    pos: list = [None] * len(items)
    res = f(-1.0)
    for i, node in enumerate(items):
        _, word, _, prefix = node
        for _, entpos in _find_entries(tsv, word, prefix):
            pos[i] = entpos if entpos else posnull
            for k in range(i):
                if pos[k] is None:
                    continue
                for pl, wl in pos[i]:
                    for pp, wp in pos[k]:
                        dist = abs(pl - pp)
                        if dist or (
                            pos[i] is posnull or pos[k] is posnull
                        ):
                            if not dist:
                                dist = MAXENTRYPOS
                            curw = f(math.sqrt(
                                float(f(_DEF_WEIGHTS[wl])
                                      * f(_DEF_WEIGHTS[wp])
                                      * _word_distance(dist))))
                            res = (
                                curw if res < 0
                                else f(1.0 - (1.0 - float(res))
                                       * (1.0 - float(curw)))
                            )
    return res


def ts_rank(tsv, query) -> float:
    """ts_rank(tsvector, tsquery) — default weights, no normalization;
    returns the float4 value (as a Python float of the float32)."""
    import numpy as np

    if not tsv or query is None:
        return 0.0
    res = (
        _calc_rank_and(tsv, query) if query[0] == "and"
        else _calc_rank_or(tsv, query)
    )
    if res < 0:
        res = np.float32(1e-20)
    return float(np.float32(res))


def _ts_execute_exists(query, exists: set, calcnot: bool) -> bool:
    kind = query[0]
    if kind == "val":
        return _key(query[1]) in exists
    if kind == "not":
        if calcnot:
            return not _ts_execute_exists(query[1], exists, calcnot)
        return True
    if kind == "and":
        return (_ts_execute_exists(query[1], exists, calcnot)
                and _ts_execute_exists(query[2], exists, calcnot))
    return (_ts_execute_exists(query[1], exists, calcnot)
            or _ts_execute_exists(query[2], exists, calcnot))


def ts_rank_cd(tsv, query) -> float:
    """ts_rank_cd(tsvector, tsquery) — cover-density rank (calc_rank_cd,
    method 0). Stripped entries are ignored (get_docrep skips
    positionless words)."""
    import numpy as np

    if not tsv or query is None:
        return 0.0
    invws = [1.0 / w for w in _DEF_WEIGHTS]
    # get_docrep: prefix-order operands, dedup by word, positions only
    doc: list[tuple[int, int, bytes]] = []  # (pos, wclass, word-key)
    seen: set[bytes] = set()
    for node in _query_operands(query):
        _, word, _, prefix = node
        k = _key(word)
        if k in seen:
            continue
        entries = _find_entries(tsv, word, prefix)
        if not entries:
            continue
        seen.add(k)
        for _, entpos in entries:
            for p, w in entpos:
                doc.append((p, w, k))
    if not doc:
        return 0.0
    doc.sort(key=lambda t: t[0])
    n = len(doc)

    wdoc = 0.0
    sumdist = 0.0
    prev_ext = 0.0
    nextent = 0
    scan = 0  # ext.pos
    while True:
        # Cover(): upper bound with calcnot=False
        exists: set[bytes] = set()
        q_pos, end_idx = 0, None
        i = scan
        while i < n:
            exists.add(doc[i][2])
            if _ts_execute_exists(query, exists, False):
                if doc[i][0] > q_pos:
                    q_pos = doc[i][0]
                    end_idx = i
                break
            i += 1
        if end_idx is None:
            break
        # lower bound with calcnot=True
        exists = set()
        p_pos, begin_idx = 0x7FFFFFFF, None
        i = end_idx
        while i >= scan:
            exists.add(doc[i][2])
            if _ts_execute_exists(query, exists, True):
                if doc[i][0] < p_pos:
                    begin_idx = i
                    p_pos = doc[i][0]
                break
            i -= 1
        if begin_idx is not None and p_pos <= q_pos:
            inv_sum = sum(invws[doc[j][1]]
                          for j in range(begin_idx, end_idx + 1))
            cpos = (end_idx - begin_idx + 1) / inv_sum
            n_noise = (q_pos - p_pos) - (end_idx - begin_idx)
            if n_noise < 0:
                n_noise = (end_idx - begin_idx) // 2
            wdoc += cpos / (1 + n_noise)
            cur_ext = (q_pos + p_pos) / 2.0
            if nextent > 0 and cur_ext > prev_ext:
                sumdist += 1.0 / (cur_ext - prev_ext)
            prev_ext = cur_ext
            nextent += 1
            scan = begin_idx + 1
        else:
            scan += 1
            if scan >= n:
                break
    return float(np.float32(wdoc))


def pg_float4_text(v: float) -> str:
    """float4out with extra_float_digits=0: %.6g."""
    s = f"{v:.6g}"
    return s


def to_tsvector_simple(text: str):
    """to_tsvector('simple', text): default parser word tokens through
    the simple dictionary (lowercase, no stopwords), 1-based positions.
    (ts_parse.c default parser reduced to \\w+ runs — covers the
    alphanumeric corpus; exotic token classes are out of scope.)"""
    import re as _re

    toks = [(m.group(0).lower(), i + 1)
            for i, m in enumerate(_re.finditer(r"\w+", text))]
    merged: dict[str, list[tuple[int, int]]] = {}
    for w, p in toks:
        merged.setdefault(w, []).append((min(p, MAXENTRYPOS - 1), 0))
    return [(w, _unique_pos(merged[w])) for w in sorted(merged, key=_key)]


# ------------------------------------------------------------- matching
def ts_match(tsv, query) -> bool:
    """@@ via TS_execute + checkcondition_str: weighted operands check
    position weights only when the entry has positions; prefix operands
    scan byte-prefix matches; NOT is evaluated logically."""
    def check_val(node) -> bool:
        _, word, weight, prefix = node
        for lex, pos in tsv:
            hit = (lex == word) if not prefix else lex.startswith(word)
            if not hit:
                continue
            if weight and pos:
                if any(weight & (1 << w) for _, w in pos):
                    return True
                continue
            return True
        return False

    def execute(node) -> bool:
        kind = node[0]
        if kind == "val":
            return check_val(node)
        if kind == "not":
            return not execute(node[1])
        if kind == "and":
            return execute(node[1]) and execute(node[2])
        return execute(node[1]) or execute(node[2])

    return execute(query)
