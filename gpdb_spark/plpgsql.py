"""PL/pgSQL subset interpreter (reference: src/pl/plpgsql/src/pl_gram.y
grammar, pl_exec.c executor, pl_comp.c compilation).

Architecture note — why a driver-side interpreter is the faithful
mapping: in the reference, PL/pgSQL control flow executes on the
*coordinator* (QD) only; every SQL statement inside the function body is
planned and dispatched to the segments (pl_exec.c ->
exec_run_select / SPI).  Row data never flows through the procedural
interpreter except where the program explicitly asks for it (SELECT
INTO, FOR-IN-query).  The Spark mapping is identical: control flow runs
on the driver, every SQL statement goes through ``Engine.sql`` /
``Engine.execute_dml`` and executes distributed.  FOR-IN-query loops
stream rows with ``toLocalIterator`` (partition-at-a-time, bounded
driver memory — the same cursor-style coordinator materialization
pl_exec.c uses for FOR loops, exec_stmt_fors).

Supported statement set (pl_gram.y productions):

- DECLARE section: ``name [CONSTANT] type [:= expr | DEFAULT expr]``
- assignment ``v := expr`` / ``v = expr`` (exec_stmt_assign)
- ``IF / ELSIF / ELSE / END IF`` (exec_stmt_if)
- ``WHILE cond LOOP`` (exec_stmt_while), bare ``LOOP``,
  ``EXIT [WHEN]`` / ``CONTINUE [WHEN]``
- ``FOR i IN [REVERSE] a..b [BY s] LOOP`` (exec_stmt_fori)
- ``FOR rec IN <query> LOOP`` (exec_stmt_fors) with ``rec.field``
- ``CASE [expr] WHEN ... THEN ... [ELSE ...] END CASE`` — searched and
  simple statement forms (exec_stmt_case), incl. the CASE_NOT_FOUND
  error when no arm matches and there is no ELSE
- ``FOREACH v [SLICE n] IN ARRAY expr LOOP`` (exec_stmt_foreach_a):
  element-wise by default (multi-dim arrays fully flattened, like
  array_create_iterator(arr, 0)); SLICE n yields depth-n subarrays;
  NULL array errors, empty array runs zero iterations
- cursors (exec_stmt_open / _fetch / _close): bound
  ``cur [SCROLL|NO SCROLL] CURSOR [(params)] FOR query`` declarations,
  ``refcursor`` + ``OPEN c [[NO] SCROLL] FOR query``,
  ``FETCH [direction [FROM|IN]] c INTO ...`` (sets FOUND; no row at the
  destination nulls the targets), ``CLOSE c`` — rows stream
  partition-at-a-time, same as FOR-IN-query. Directions
  (pl_gram.y read_fetch_direction): NEXT/PRIOR/FIRST/LAST/
  ABSOLUTE expr/RELATIVE expr/FORWARD/BACKWARD; backward movement
  requires SCROLL (which retains fetched rows coordinator-side, the
  scrollable-portal tuplestore analog) — a NO SCROLL cursor stays
  purely streaming and raises the reference's "cursor can only scan
  forward" error
- ``FOR rec IN bound_cursor [(args)] LOOP`` (exec_stmt_forc): opens the
  bound cursor, streams rows, closes it when the loop exits (EXIT
  included); errors if the cursor is already open
- ``MOVE [direction [FROM|IN]] c`` (exec_stmt_fetch with is_move):
  reposition without returning rows; sets FOUND from the processed
  count; adds the MOVE-only ``FORWARD/BACKWARD count|ALL`` forms
- ``RETURN expr`` / ``RETURN QUERY <sql>`` / ``RETURN NEXT (exprs)``
  (exec_stmt_return / _return_query / _return_next)
- ``SELECT ... INTO [STRICT] v, ... FROM ...`` (exec_stmt_execsql INTO)
- ``PERFORM <rest-of-select>``
- INSERT / UPDATE / DELETE (routed to Engine.execute_dml), sets FOUND
- ``EXECUTE <str-expr> [INTO v,...] [USING e,...]`` (exec_stmt_dynexecute)
- ``RAISE NOTICE/INFO/WARNING/EXCEPTION 'fmt %', args`` (exec_stmt_raise)
- nested ``BEGIN ... EXCEPTION WHEN OTHERS THEN ... END`` blocks
- ``GET DIAGNOSTICS v = ROW_COUNT``
- ``NULL;``

Expressions are PG-dialect SQL evaluated through the engine's dialect
(``SELECT (expr)``), with declared variables substituted as typed
literals — the same "parameterize the planner" model as pl_exec.c's
setup_param_list.  Pure integer/boolean arithmetic takes a driver-local
fast path (no Spark job) so tight counter loops don't pay a JVM
round-trip per iteration; any expression the fast path cannot prove
safe falls through to the SQL path.

Out of scope (documented): nested function definitions.
"""

from __future__ import annotations

import datetime
import decimal
import re
from dataclasses import dataclass, field

__all__ = ["PlPgSqlError", "PlFunction", "compile_function", "run_do", "call_function"]


class PlPgSqlError(Exception):
    """RAISE EXCEPTION surfaced to the caller (elog ERROR)."""


class _Return(Exception):
    def __init__(self, value=None):
        self.value = value


class _Exit(Exception):
    pass


class _Continue(Exception):
    pass


# ---------------------------------------------------------------------------
# lexing: top-level scanning that respects '...', "...", $tag$...$tag$, ()
# ---------------------------------------------------------------------------

_DOLLAR = re.compile(r"\$[A-Za-z_]*\$")


def _scan(s: str):
    """Yield (i, depth) for every top-level position; skips quoted
    regions entirely (their indices are not yielded)."""
    i, n, depth = 0, len(s), 0
    while i < n:
        c = s[i]
        if c == "'":
            j = i + 1
            while j < n:
                if s[j] == "'" and s[j + 1 : j + 2] == "'":
                    j += 2
                    continue
                if s[j] == "'":
                    break
                j += 1
            i = j + 1
            continue
        if c == '"':
            j = s.find('"', i + 1)
            i = (j if j != -1 else n) + 1
            continue
        if c == "$":
            m = _DOLLAR.match(s, i)
            if m:
                tag = m.group(0)
                j = s.find(tag, m.end())
                i = (j + len(tag)) if j != -1 else n
                continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        yield i, depth
        i += 1


def _strip_comments(s: str) -> str:
    out, skip_to = [], 0
    top = {i for i, _ in _scan(s)}
    i, n = 0, len(s)
    while i < n:
        if i in top and s[i] == "-" and s[i + 1 : i + 2] == "-":
            j = s.find("\n", i)
            i = j if j != -1 else n
            continue
        if i in top and s[i] == "/" and s[i + 1 : i + 2] == "*":
            j = s.find("*/", i + 2)
            i = (j + 2) if j != -1 else n
            continue
        out.append(s[i])
        i += 1
    return "".join(out)


def _split_stmts(s: str) -> list[str]:
    """Split on top-level ';' (string/paren aware)."""
    cuts = [i for i, d in _scan(s) if s[i] == ";" and d == 0]
    parts, prev = [], 0
    for c in cuts:
        parts.append(s[prev:c])
        prev = c + 1
    parts.append(s[prev:])
    return [p.strip() for p in parts if p.strip()]


_WORD = re.compile(r"[A-Za-z_][A-Za-z_0-9]*")


def _find_kw(s: str, kws: set[str], stop_case: bool = True) -> tuple[int, int, str]:
    """Find the first top-level keyword from ``kws`` in ``s`` that is not
    inside a CASE..END expression (so IF's THEN is never confused with a
    CASE WHEN..THEN in the condition). Returns (start, end, word-lower)
    or (-1, -1, '')."""
    case_depth = 0
    it = dict(_scan(s))
    i, n = 0, len(s)
    while i < n:
        if i in it and (s[i].isalpha() or s[i] == "_"):
            m = _WORD.match(s, i)
            w = m.group(0).lower()
            if stop_case and w == "case":
                case_depth += 1
            elif stop_case and w == "end" and case_depth > 0:
                case_depth -= 1
            elif w in kws and case_depth == 0:
                return i, m.end(), w
            i = m.end()
            continue
        i += 1
    return -1, -1, ""


def _first_word(s: str) -> str:
    m = _WORD.match(s.lstrip())
    return m.group(0).lower() if m else ""


def _two_words(s: str) -> str:
    ws = s.split(None, 2)
    return " ".join(w.lower() for w in ws[:2])


# ---------------------------------------------------------------------------
# parsing: chunk stream with pushback -> statement AST (nested tuples)
# ---------------------------------------------------------------------------


class _Stream:
    def __init__(self, chunks: list[str]):
        self.chunks = chunks
        self.i = 0

    def peek(self) -> str | None:
        return self.chunks[self.i] if self.i < len(self.chunks) else None

    def take(self) -> str:
        c = self.chunks[self.i]
        self.i += 1
        return c

    def push_remainder(self, text: str) -> None:
        """Push back the unconsumed tail of a just-taken chunk."""
        text = text.strip()
        if text:
            self.chunks.insert(self.i, text)


_BLOCK_STOPS = {"end", "end if", "end loop", "else", "elsif", "elseif",
                "exception", "when"}



def _after_kw(chunk: str, kw: str) -> str:
    """Chunk text after a leading (possibly multi-word) keyword,
    whitespace-insensitive — 'END  CASE' / 'END\nLOOP' strip cleanly
    (a char-count slice would leave garbage in the statement stream)."""
    pat = r"(?is)^\s*" + r"\s+".join(re.escape(w) for w in kw.split())
    return re.sub(pat, "", chunk, count=1)


def _parse_seq(st: _Stream, stops: set[str]) -> list:
    body = []
    while True:
        c = st.peek()
        if c is None:
            return body
        head2, head1 = _two_words(c), _first_word(c)
        if head2 in stops or head1 in stops:
            return body
        body.append(_parse_stmt(st))


def _parse_stmt(st: _Stream):
    c = st.take()
    w = _first_word(c)
    rest = c.lstrip()[len(w):].strip()

    if w == "if":
        return _parse_if(st, rest)
    if w == "while":
        i, j, _ = _find_kw(rest, {"loop"})
        cond = rest[:i].strip()
        st.chunks.insert(st.i, rest[j:].strip()) if rest[j:].strip() else None
        body = _parse_seq(st, {"end loop"})
        st.push_remainder(_after_kw(st.take(), "end loop"))
        return ("while", cond, body)
    if w == "for":
        i, j, _ = _find_kw(rest, {"loop"})
        header, tail = rest[:i].strip(), rest[j:].strip()
        if tail:
            st.chunks.insert(st.i, tail)
        body = _parse_seq(st, {"end loop"})
        st.push_remainder(_after_kw(st.take(), "end loop"))
        m = re.match(r"(?is)^([\w]+)\s+in\s+(reverse\s+)?(.*)$", header)
        var, rev, src = m.group(1).lower(), bool(m.group(2)), m.group(3).strip()
        rng = _top_split(src, "..")
        if len(rng) == 2:
            step = "1"
            by = _find_kw(rng[1], {"by"})
            hi = rng[1]
            if by[0] != -1:
                hi, step = rng[1][: by[0]].strip(), rng[1][by[1]:].strip()
            return ("forint", var, rng[0].strip(), hi.strip(), step, rev, body)
        return ("forquery", var, src, body)
    if w == "loop":
        if rest:
            st.chunks.insert(st.i, rest)
        body = _parse_seq(st, {"end loop"})
        st.push_remainder(_after_kw(st.take(), "end loop"))
        return ("loop", body)
    if w == "foreach":
        # FOREACH var [SLICE n] IN ARRAY expr LOOP ... END LOOP
        # (pl_gram.y stmt_foreach_a; executor exec_stmt_foreach_a,
        # pl_exec.c:2222). SLICE n iterates depth-n subarrays (n is an
        # integer constant, ICONST in the grammar); SLICE 0 == the
        # element-wise default.
        i, j, _ = _find_kw(rest, {"loop"})
        header, tail = rest[:i].strip(), rest[j:].strip()
        if tail:
            st.chunks.insert(st.i, tail)
        body = _parse_seq(st, {"end loop"})
        st.push_remainder(_after_kw(st.take(), "end loop"))
        m = re.match(
            r"(?is)^([\w]+)\s+(?:slice\s+(\d+)\s+)?in\s+array\s+(.*)$",
            header,
        )
        if not m:
            raise PlPgSqlError(f"plpgsql: bad FOREACH syntax: {header!r}")
        return ("foreach", m.group(1).lower(), int(m.group(2) or 0),
                m.group(3).strip(), body)
    if w == "case":
        # CASE statement, searched and simple forms (pl_gram.y stmt_case;
        # executor exec_stmt_case, pl_exec.c:113). Distinct from the CASE
        # *expression* (which only occurs inside assignments/SQL): the
        # statement form ends with END CASE and runs statement lists.
        i, j, _ = _find_kw(rest, {"when"})
        if i == -1:
            raise PlPgSqlError(f"plpgsql: CASE without WHEN: {rest[:40]!r}")
        selector = rest[:i].strip() if i > 0 else None
        st.chunks.insert(st.i, rest[i:].strip())
        arms, else_body, has_else = [], [], False
        while True:
            c2 = st.peek() or ""
            w2, w1 = _two_words(c2), _first_word(c2)
            if w1 == "when":
                c2 = st.take()
                r = c2.lstrip()[len("when"):].strip()
                i2, j2, _ = _find_kw(r, {"then"})
                cond = r[:i2].strip()
                tl = r[j2:].strip()
                if tl:
                    st.chunks.insert(st.i, tl)
                arms.append((cond, _parse_seq(st, {"when", "else", "end case"})))
                continue
            if w1 == "else":
                c2 = st.take()
                r = c2.lstrip()[len("else"):].strip()
                if r:
                    st.chunks.insert(st.i, r)
                has_else = True
                else_body = _parse_seq(st, {"end case"})
                continue
            if w2 == "end case":
                st.push_remainder(_after_kw(st.take(), "end case"))
                return ("case", selector, arms, else_body, has_else)
            raise PlPgSqlError(f"plpgsql: expected END CASE, got {c2[:40]!r}")
    if w == "begin":
        if rest:
            st.chunks.insert(st.i, rest)
        body = _parse_seq(st, {"end", "exception"})
        handlers = []
        if _first_word(st.peek() or "") == "exception":
            handlers = _parse_handlers(st)
        st.push_remainder(_after_kw(st.take(), "end"))
        return ("block", body, handlers)
    if w == "open":
        # OPEN bound_cur [(args)] | OPEN refcur [[NO] SCROLL] FOR query
        # (pl_gram.y stmt_open; executor exec_stmt_open, pl_exec.c)
        m = re.match(
            r"(?is)^(\w+)\s+(?:(no\s+scroll|scroll)\s+)?for\s+(.+)$", rest
        )
        if m:
            scroll = (m.group(2) or "").strip().lower() == "scroll"
            return ("open", m.group(1).lower(), None, m.group(3).strip(),
                    scroll)
        m = re.match(r"(?is)^(\w+)\s*(?:\((.*)\))?$", rest)
        if not m:
            raise PlPgSqlError(f"plpgsql: bad OPEN: {rest[:60]!r}")
        return ("open", m.group(1).lower(), m.group(2), None, None)
    if w == "fetch":
        # FETCH [direction [FROM|IN]] cur INTO v, ... (exec_stmt_fetch).
        # All pl_gram.y directions parse; backward-moving ones require a
        # SCROLL cursor at runtime, like the reference's portal check.
        m = re.match(r"(?is)^(.*?)\s+into\s+(.+)$", rest)
        if not m:
            raise PlPgSqlError(f"plpgsql: bad FETCH (no INTO): {rest[:60]!r}")
        dirn = _parse_fetch_direction(m.group(1), is_move=False)
        vars_ = [v.strip().lower() for v in _top_split(m.group(2), ",")]
        return ("fetch", dirn, vars_)
    if w == "close":
        return ("close", rest.strip().lower())
    if w == "move":
        # MOVE [direction [FROM|IN]] cur (pl_gram.y stmt_move; executor
        # is exec_stmt_fetch with is_move=true): reposition without
        # returning rows; FORWARD/BACKWARD count|ALL allowed (MOVE-only,
        # read_fetch_direction's check_FROM=false path).
        return ("move", _parse_fetch_direction(rest, is_move=True))
    if w == "exit" or w == "continue":
        m = re.match(r"(?is)^when\s+(.*)$", rest)
        return (w, m.group(1) if m else None)
    if w == "return":
        rw = _first_word(rest)
        if rw == "query":
            return ("return_query", rest[len("query"):].strip())
        if rw == "next":
            return ("return_next", rest[len("next"):].strip())
        return ("return", rest or None)
    if w == "raise":
        m = re.match(
            r"(?is)^(notice|info|warning|exception|debug|log)?\s*(.*)$", rest
        )
        level = (m.group(1) or "exception").lower()
        parts = _top_split(m.group(2), ",")
        fmt = parts[0].strip() if parts and parts[0].strip() else "''"
        return ("raise", level, fmt, [p.strip() for p in parts[1:]])
    if w == "perform":
        return ("perform", rest)
    if w in ("insert", "update", "delete"):
        return ("dml", c)
    if w == "execute":
        into_vars, using = [], []
        iu = _find_kw(rest, {"into", "using"})
        expr = rest
        while iu[0] != -1:
            expr, kw, tail = rest[: iu[0]].strip(), iu[2], rest[iu[1]:]
            nxt = _find_kw(tail, {"into", "using"})
            seg = tail[: nxt[0]] if nxt[0] != -1 else tail
            vals = [v.strip() for v in _top_split(seg, ",")]
            if kw == "into":
                into_vars = [v.lower() for v in vals]
            else:
                using = vals
            rest = expr + (" " + tail[nxt[0]:] if nxt[0] != -1 else "")
            iu = _find_kw(rest, {"into", "using"})
        return ("execute", expr, into_vars, using)
    if w == "get":
        m = re.match(r"(?is)^diagnostics\s+(\w+)\s*:?=\s*(\w+)$", rest)
        return ("getdiag", m.group(1).lower(), m.group(2).lower())
    if w == "null" and not rest:
        return ("null",)
    if w in ("select", "with"):
        iv = _find_kw(c, {"into"})
        if iv[0] != -1 and w == "select":
            tail = c[iv[1]:]
            fv = _find_kw(tail, {"from", "where", "order", "group", "limit"})
            seg = tail[: fv[0]] if fv[0] != -1 else tail
            seg = re.sub(r"(?is)^\s*strict\s+", "", seg)
            vars_ = [v.strip().lower() for v in _top_split(seg, ",")]
            sql = c[: iv[0]] + (tail[fv[0]:] if fv[0] != -1 else "")
            return ("select_into", sql, vars_)
        return ("perform_sql", c)
    m = re.match(r"(?is)^([\w.]+)\s*:?=\s*(.+)$", c)
    if m:
        return ("assign", m.group(1).lower(), m.group(2).strip())
    raise PlPgSqlError(f"plpgsql: cannot parse statement: {c[:80]!r}")


def _parse_if(st: _Stream, rest: str):
    i, j, _ = _find_kw(rest, {"then"})
    cond = rest[:i].strip()
    tail = rest[j:].strip()
    if tail:
        st.chunks.insert(st.i, tail)
    arms = []
    body = _parse_seq(st, {"end if", "else", "elsif", "elseif"})
    arms.append((cond, body))
    else_body = []
    while True:
        c = st.peek() or ""
        w2, w1 = _two_words(c), _first_word(c)
        if w1 in ("elsif", "elseif"):
            c = st.take()
            r = c.lstrip()[len(w1):].strip()
            i, j, _ = _find_kw(r, {"then"})
            cond = r[:i].strip()
            t = r[j:].strip()
            if t:
                st.chunks.insert(st.i, t)
            arms.append((cond, _parse_seq(st, {"end if", "else", "elsif", "elseif"})))
            continue
        if w1 == "else":
            c = st.take()
            r = c.lstrip()[len("else"):].strip()
            if r:
                st.chunks.insert(st.i, r)
            else_body = _parse_seq(st, {"end if"})
            continue
        if w2 == "end if":
            st.push_remainder(_after_kw(st.take(), "end if"))
            return ("if", arms, else_body)
        raise PlPgSqlError(f"plpgsql: expected END IF, got {c[:40]!r}")


def _parse_handlers(st: _Stream) -> list:
    """EXCEPTION WHEN <cond> THEN <stmts> [WHEN ...] — the handler list
    of a block (pl_gram.y exception_sect)."""
    c = st.take()  # starts with EXCEPTION
    r = c.lstrip()[len("exception"):].strip()
    if r:
        st.chunks.insert(st.i, r)
    handlers = []
    while _first_word(st.peek() or "") == "when":
        c = st.take()
        r = c.lstrip()[len("when"):].strip()
        i, j, _ = _find_kw(r, {"then"})
        cond = r[:i].strip().lower()
        t = r[j:].strip()
        if t:
            st.chunks.insert(st.i, t)
        body = _parse_seq(st, {"when", "end"})
        handlers.append((cond, body))
    return handlers


def _top_split(s: str, sep: str) -> list[str]:
    """Split on a top-level separator (string/paren aware)."""
    idx = dict(_scan(s))
    cuts, i, n = [], 0, len(s)
    while i < n:
        if i in idx and s.startswith(sep, i):
            # '..' must not match inside a number like 1.5
            cuts.append(i)
            i += len(sep)
            continue
        i += 1
    parts, prev = [], 0
    for c in cuts:
        parts.append(s[prev:c])
        prev = c + len(sep)
    parts.append(s[prev:])
    return parts


# ---------------------------------------------------------------------------
# block = [DECLARE decls] BEGIN stmts [EXCEPTION handlers] END
# ---------------------------------------------------------------------------


def _parse_body(body: str):
    chunks = _split_stmts(_strip_comments(body))
    st = _Stream(chunks)
    decls = []
    if _first_word(st.peek() or "") == "declare":
        c = st.take()
        r = c.lstrip()[len("declare"):].strip()
        if r:
            st.chunks.insert(st.i, r)
        while _first_word(st.peek() or "") != "begin":
            decls.append(st.take())
    block = _parse_stmt(st)  # the BEGIN..END block
    return decls, block


_DECL = re.compile(
    r"(?is)^(\w+)\s+(constant\s+)?([\w ]+?(?:\(\s*\d+(?:\s*,\s*\d+)?\s*\))?"
    r"(?:\[\])*)\s*(?:(?::=|default)\s+(.+))?$"
)

# bound cursor declaration: cur [NO SCROLL] CURSOR [(params)] FOR|IS query
# (pl_gram.y decl_cursor_query; pl_exec.c exec_stmt_open binds it)
_CURSOR_DECL = re.compile(
    r"(?is)^(\w+)\s+(?:(no\s+scroll|scroll)\s+)?cursor\s*"
    r"(?:\(([^)]*)\))?\s*(?:for|is)\s+(.+)$"
)

# FETCH/MOVE direction grammar (pl_gram.y read_fetch_direction):
# NEXT | PRIOR | FIRST | LAST | ABSOLUTE expr | RELATIVE expr |
# FORWARD | BACKWARD, plus the MOVE-only FORWARD/BACKWARD count|ALL
# forms. Count/position exprs are evaluated at runtime, like
# exec_stmt_fetch's expr_until_semi expressions. Groups: (simple-dir,
# abs/rel keyword, abs/rel expr, fwd/bwd keyword, fwd/bwd count, cursor).
# The negative lookaheads keep FROM/IN out of lazy count matches, and
# the (?=\s) after the bare-count arm stops it from splitting a plain
# cursor name. Groups: (simple, abs/rel kw, abs/rel expr, fwd/bwd kw,
# fwd/bwd count, bare ALL, bare count expr, cursor).
_FETCH_DIR = re.compile(
    r"(?is)^(?:(next|prior|first|last)"
    r"|(absolute|relative)\s+(.+?)"
    r"|(forward|backward)(?:\s+(all|(?!from\b|in\b).+?))?"
    r"|(all)"
    r"|((?!from\b|in\b)\S+(?:\s+\S+)*?)(?=\s)"
    r")?\s*(?:from\s+|in\s+)?(\w+)$"
)


def _parse_fetch_direction(text: str, is_move: bool) -> tuple:
    """-> (cursor, kind, count_expr|None). kinds: next/prior/first/last/
    absolute/relative/forward/backward/forward_n/backward_n/forward_all/
    backward_all; the multi-row forms (FORWARD/BACKWARD count|ALL, bare
    ALL, bare count — read_fetch_direction accepts all of them for MOVE)
    are MOVE-only: pl_gram.y rejects a FETCH whose direction
    returns_multiple_rows ("FETCH statement cannot return multiple
    rows")."""
    m = _FETCH_DIR.match(text.strip())
    if not m:
        what = "MOVE" if is_move else "FETCH"
        raise PlPgSqlError(f"plpgsql: bad {what} direction: {text[:60]!r}")
    simple, abskw, absexpr, fwdkw, fwdcount, allkw, barecount, cur = m.groups()
    cur = cur.lower()

    def multi_row_only():
        if not is_move:
            raise PlPgSqlError(
                "plpgsql: FETCH statement cannot return multiple rows"
            )

    if simple:
        return (cur, simple.lower(), None)
    if abskw:
        return (cur, abskw.lower(), absexpr.strip())
    if fwdkw:
        kind = fwdkw.lower()
        if fwdcount is None:
            return (cur, kind, None)  # FORWARD/BACKWARD == NEXT/PRIOR
        multi_row_only()
        if fwdcount.strip().lower() == "all":
            return (cur, kind + "_all", None)
        return (cur, kind + "_n", fwdcount.strip())
    if allkw:
        multi_row_only()
        return (cur, "forward_all", None)
    if barecount:
        multi_row_only()
        return (cur, "forward_n", barecount.strip())
    return (cur, "next", None)


class _Cursor:
    """A driver-side cursor: the query text plus, once OPENed, a
    partition-at-a-time iterator (toLocalIterator — the same bounded
    coordinator materialization the FOR-IN-query loop uses).

    Direction semantics (SCROLL row retention, streaming NO SCROLL,
    the position model, the forward-only error) live in ONE place —
    ``gpdb_spark.engine._Portal``, the SQL-level portal — which every
    OPEN wraps around its row iterator (round-6 review: the interpreter
    previously duplicated the whole DoPortalRunFetch state machine).
    ``it`` stays the raw iterator so FOR-over-cursor (exec_stmt_forc)
    can stream it directly; FETCH/MOVE go through ``portal``."""

    def __init__(
        self,
        query: str | None = None,
        params: list[str] | None = None,
        scroll: bool = False,
    ):
        self.query = query
        self.params = params or []
        self.scroll = scroll
        self.it = None  # open iff not None
        self.portal = None  # engine._Portal over ``it`` (FETCH/MOVE)


# ---------------------------------------------------------------------------
# interpreter
# ---------------------------------------------------------------------------

_FAST = re.compile(r"^[0-9+\-*%()<>=!., ]+$")
# constant fast paths (no Spark job): a quoted string literal with ''
# escapes (optionally ::text-cast), and an integer-literal ::text cast —
# the assignment staples of interpreter loops (lbl := 'fizz';
# s := n::text). Everything else still goes through SQL.
_STRLIT = re.compile(r"^'((?:[^']|'')*)'(?:\s*::\s*text)?$", re.IGNORECASE)
# unsigned only: PG's :: binds tighter than unary minus, so -7::text is
# -('7'::text) — an error — and must fall through to the SQL path
_INT_TEXT = re.compile(r"^(\d+)\s*::\s*text$", re.IGNORECASE)


@dataclass
class PlFunction:
    name: str
    argnames: list[str]
    argdefaults: list[str | None]
    returns: tuple  # ('scalar', type) | ('table', [(n,t),..]) | ('setof',t) | ('void',)
    decls: list = field(default_factory=list)
    block: tuple = ()


class Interpreter:
    def __init__(self, engine):
        self.engine = engine
        self.notices: list[str] = []

    # -- values <-> SQL literals (pl_exec.c exec_cast_value analog) ----------

    @staticmethod
    def _lit(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, (int, float, decimal.Decimal)):
            return str(v)
        if isinstance(v, list):
            # array-typed variable (e.g. a FOREACH SLICE subarray) back
            # into SQL as an array constructor, element-wise recursive
            return "ARRAY[" + ", ".join(Interpreter._lit(x) for x in v) + "]"
        if isinstance(v, datetime.datetime):
            return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
        if isinstance(v, datetime.date):
            return f"DATE '{v.isoformat()}'"
        s = str(v).replace("'", "''")
        return f"'{s}'"

    def _subst(self, expr: str, env: dict) -> str:
        """Substitute declared variables (and rec.field accesses) as
        typed literals at top level — setup_param_list's model, with
        literals instead of parameter markers (Catalyst constant-folds
        them, which is what a planner does with extern params)."""
        idx = dict(_scan(expr))
        out, i, n = [], 0, len(expr)
        while i < n:
            if i in idx and (expr[i].isalpha() or expr[i] == "_"):
                m = re.match(r"[\w]+(\.[\w]+)?", expr[i:])
                word = m.group(0)
                base = word.split(".")[0].lower()
                if base in env:
                    if "." in word:
                        rec = env[base]
                        fld = word.split(".")[1].lower()
                        try:
                            v = rec[fld] if isinstance(rec, dict) else getattr(rec, fld)
                        except (KeyError, AttributeError):
                            v = rec.asDict().get(fld) if hasattr(rec, "asDict") else None
                        out.append(self._lit(v))
                    else:
                        out.append(self._lit(env[base]))
                else:
                    out.append(word)
                i += len(word)
                continue
            out.append(expr[i])
            i += 1
        return "".join(out)

    def eval(self, expr: str, env: dict):
        e = self._subst(expr, env).strip()
        # constant fast paths first — each miss here is one whole Spark
        # job inside an interpreter loop (the round-5 timing audit found
        # a 25-row FOR loop spending ~100 s on literal assignments)
        m = _STRLIT.match(e)
        if m:
            return m.group(1).replace("''", "'")
        if e.upper() == "NULL":
            return None
        m = _INT_TEXT.match(e)
        if m:
            return m.group(1)
        # fast path: integer/boolean arithmetic without division (PG int
        # '/' truncates toward zero — don't risk a semantic mismatch).
        # IN over an int comma-list maps to Python membership (a
        # one-element right side isn't a tuple in Python -> TypeError ->
        # clean fall-through to the SQL path); a NULL selector keeps the
        # SQL path because the bare word NULL fails the charset probe.
        fe = re.sub(r"(?i)\btrue\b", " True ", e)
        fe = re.sub(r"(?i)\bfalse\b", " False ", fe)
        fe = re.sub(r"(?i)\band\b", " and ", fe)
        fe = re.sub(r"(?i)\bor\b", " or ", fe)
        fe = re.sub(r"(?i)\bnot\b", " not ", fe)
        fe = re.sub(r"(?i)\bin\b", " in ", fe)
        probe = re.sub(r"\b(True|False|and|or|not|in)\b", "", fe)
        # '%' is only fast-path-safe when no negative can occur: Python %
        # floors (sign of divisor) while SQL % truncates (sign of
        # dividend). With only + * % over nonnegative literals every
        # intermediate is nonnegative, so '-' anywhere demotes to SQL.
        if "%" in probe and "-" in probe:
            probe = "?"  # force the SQL path
        if _FAST.match(probe) and "." not in probe:
            py = re.sub(r"<>", "!=", fe)
            py = re.sub(r"(?<![<>!=])=(?![=])", "==", py)
            try:
                return eval(py, {"__builtins__": {}}, {})  # noqa: S307 — sanitized
            except Exception:
                pass
        row = self.engine.sql(f"SELECT ({e}) AS v").collect()[0]
        return row[0]

    def _truthy(self, expr: str, env: dict) -> bool:
        return bool(self.eval(expr, env))

    # -- statement execution -------------------------------------------------

    def run_block(self, decls: list, block, env: dict, collector=None):
        for d in decls:
            mc = _CURSOR_DECL.match(d.strip())
            if mc:
                params = [
                    p.strip().split()[0].lower()
                    for p in _top_split(mc.group(3) or "", ",")
                    if p.strip()
                ]
                scroll = (mc.group(2) or "").strip().lower() == "scroll"
                env[mc.group(1).lower()] = _Cursor(
                    mc.group(4).strip(), params, scroll=scroll
                )
                continue
            m = _DECL.match(d.strip())
            if not m:
                raise PlPgSqlError(f"plpgsql: bad declaration: {d!r}")
            name, typ, default = m.group(1).lower(), m.group(3), m.group(4)
            if typ.strip().lower() == "refcursor":
                env[name] = _Cursor()  # unbound; OPEN ... FOR binds it
                continue
            env[name] = self.eval(default, env) if default else None
        self.exec_stmt(block, env, collector)

    def _open_cursor(self, name, args, q, env, scroll=None) -> "_Cursor":
        """exec_stmt_open: bind args (or the refcursor's ad-hoc query),
        dispatch the SQL distributed, keep a streaming iterator on the
        coordinator. Shared by OPEN and FOR-over-cursor (exec_stmt_forc
        routes through the same portal-open path in the reference)."""
        cur = env.get(name)
        if not isinstance(cur, _Cursor):
            raise PlPgSqlError(f'"{name}" is not a cursor')
        if cur.it is not None:
            raise PlPgSqlError(f'cursor "{name}" already in use')
        if q is not None:
            if cur.params:
                raise PlPgSqlError(
                    f'cursor "{name}" is bound; OPEN FOR needs a refcursor'
                )
            cur.query = q
            cur.scroll = bool(scroll)  # OPEN ref [NO] SCROLL FOR query
        if cur.query is None:
            raise PlPgSqlError(f'cursor "{name}" has no query (OPEN FOR it)')
        sql = cur.query
        if args and args.strip() and not cur.params:
            raise PlPgSqlError(f'cursor "{name}" has no arguments')
        if cur.params:
            vals = (
                [self.eval(a, env) for a in _top_split(args, ",")]
                if args and args.strip()
                else []
            )
            if len(vals) != len(cur.params):
                raise PlPgSqlError(
                    f'cursor "{name}" takes {len(cur.params)} arguments'
                )
            penv = dict(env)
            penv.update(dict(zip(cur.params, vals)))
            sql = self._subst(sql, penv)
        else:
            sql = self._subst(sql, env)
        from gpdb_spark.engine import _Portal

        cur.it = iter(self.engine.sql(sql).toLocalIterator())
        cur.portal = _Portal(cur.it, cur.scroll)
        return cur

    def _cursor_seek(self, cur, kind, expr, env):
        """exec_stmt_fetch core: position ``cur`` per the FETCH/MOVE
        direction and return (row at the final position or None,
        processed). FOUND is processed != 0 for both FETCH and MOVE,
        exactly the reference's exec_stmt_fetch contract. All direction
        semantics (SCROLL buffer, streaming forward-only, position
        model) are the engine _Portal's — one implementation of
        DoPortalRunFetch for both the SQL and PL/pgSQL front doors."""
        n = None
        if expr is not None:
            v = self.eval(expr, env)
            if v is None:
                raise PlPgSqlError("FETCH/MOVE count must not be null")
            n = int(v)
        p = cur.portal
        try:
            if kind in ("next", "prior", "first", "last", "forward",
                        "backward"):
                rows = p.fetch(kind, 1)
            elif kind in ("absolute", "relative"):
                rows = p.fetch(kind, n)
            elif kind in ("forward_n", "backward_n",
                          "forward_all", "backward_all"):
                d = kind.split("_", 1)[0]
                return None, p.move(d, None if kind.endswith("_all") else n)
            else:
                raise PlPgSqlError(f"plpgsql: bad fetch direction {kind!r}")
        except ValueError as e:
            # _Portal's forward-only / bad-direction errors in the
            # interpreter's exception type
            raise PlPgSqlError(str(e)) from None
        return (rows[0] if rows else None), len(rows)

    def exec_seq(self, stmts, env, collector):
        for s in stmts:
            self.exec_stmt(s, env, collector)

    def exec_stmt(self, s, env, collector):  # noqa: C901 — statement switch
        op = s[0]
        if op == "assign":
            env[s[1]] = self.eval(s[2], env)
        elif op == "if":
            for cond, body in s[1]:
                if self._truthy(cond, env):
                    self.exec_seq(body, env, collector)
                    return
            self.exec_seq(s[2], env, collector)
        elif op == "while":
            while self._truthy(s[1], env):
                try:
                    self.exec_seq(s[2], env, collector)
                except _Exit:
                    break
                except _Continue:
                    continue
        elif op == "loop":
            while True:
                try:
                    self.exec_seq(s[1], env, collector)
                except _Exit:
                    break
                except _Continue:
                    continue
        elif op == "forint":
            var, lo, hi, step, rev, body = s[1:]
            lo_v, hi_v, st_v = (int(self.eval(x, env)) for x in (lo, hi, step))
            # REVERSE start..end counts DOWN from the first bound to the
            # second (pl_exec.c exec_stmt_fori reverse case)
            rng = range(lo_v, hi_v - 1, -st_v) if rev else range(lo_v, hi_v + 1, st_v)
            for v in rng:
                env[var] = v
                try:
                    self.exec_seq(body, env, collector)
                except _Exit:
                    break
                except _Continue:
                    continue
        elif op == "case":
            # exec_stmt_case: searched form evaluates each WHEN bool;
            # simple form evaluates the selector ONCE then tests
            # membership in each arm's comma-list (pl_gram.y rewrites
            # simple arms to `t_ IN (vals)` — mirrored here with the
            # materialized selector value as a literal). Falling out of
            # every arm without ELSE is the CASE_NOT_FOUND error.
            selector, arms, else_body, has_else = s[1:]
            sel_lit = self._lit(self.eval(selector, env)) if selector else None
            for cond, body in arms:
                test = f"({sel_lit}) IN ({cond})" if selector else cond
                if self._truthy(test, env):
                    self.exec_seq(body, env, collector)
                    return
            if has_else:
                self.exec_seq(else_body, env, collector)
                return
            raise PlPgSqlError("case not found")
        elif op == "foreach":
            # exec_stmt_foreach_a: iteration over an array value — SLICE
            # 0 (default) walks individual ELEMENTS (fully flattened for
            # multi-dim arrays, like array_create_iterator(arr, 0));
            # SLICE n yields successive depth-n subarrays. A NULL array
            # is an error ("FOREACH expression must not be null"); an
            # empty array runs zero iterations; SLICE beyond the array's
            # dimensionality raises the reference's range error.
            var, slice_n, expr, body = s[1:]
            arr = self.eval(expr, env)
            if arr is None:
                raise PlPgSqlError("FOREACH expression must not be null")
            arr = list(arr)
            # dimensionality by list-nesting depth; ONLY list counts —
            # Spark struct values surface as Row (a tuple subclass) and
            # must stay scalar elements, not an extra array dimension.
            # An EMPTY array has ndims 0 in PG (ARR_NDIM of '{}'), so
            # SLICE n>0 over it is out of range and the default form
            # runs zero iterations (round-6 review: the depth probe
            # reported 1 and SLICE 1 yielded the empty array once).
            ndim, probe = 0, arr
            while isinstance(probe, list) and probe:
                ndim += 1
                probe = probe[0]
            if slice_n > ndim:
                raise PlPgSqlError(
                    f"slice dimension ({slice_n}) is out of the valid "
                    f"range 0..{ndim}"
                )

            def _slices(a, depth):
                if depth == slice_n:
                    yield a
                    return
                for sub in a:
                    yield from _slices(sub, depth - 1)

            for v in (_slices(arr, ndim) if arr else ()):
                env[var] = v
                try:
                    self.exec_seq(body, env, collector)
                except _Exit:
                    break
                except _Continue:
                    continue
        elif op == "forquery":
            var, sql, body = s[1:]
            # FOR rec IN bound_cursor [(args)] — exec_stmt_forc: when the
            # source is a lone identifier naming a declared cursor, open
            # it, stream its rows, and close it when the loop exits
            # (pl_exec.c exec_stmt_forc closes the portal even on EXIT)
            mc = re.match(r"(?is)^(\w+)\s*(?:\((.*)\))?$", sql.strip())
            if mc and isinstance(env.get(mc.group(1).lower()), _Cursor):
                cur = self._open_cursor(
                    mc.group(1).lower(), mc.group(2), None, env
                )
                found = False
                try:
                    for row in cur.it:
                        found = True
                        env[var] = row
                        try:
                            self.exec_seq(body, env, collector)
                        except _Exit:
                            break
                        except _Continue:
                            continue
                finally:
                    cur.it = None
                env["found"] = found
                return
            df = self.engine.sql(self._subst(sql, env))
            found = False
            # partition-at-a-time streaming: bounded driver memory, the
            # coordinator-side cursor loop of exec_stmt_fors
            for row in df.toLocalIterator():
                found = True
                env[var] = row
                try:
                    self.exec_seq(body, env, collector)
                except _Exit:
                    break
                except _Continue:
                    continue
            env["found"] = found
        elif op == "open":
            self._open_cursor(s[1], s[2], s[3], env, scroll=s[4])
        elif op == "fetch":
            # exec_stmt_fetch: position per the direction, one row into
            # the targets; no row at the destination nulls the targets
            # and clears FOUND
            cname, kind, expr = s[1]
            cur = env.get(cname)
            if not isinstance(cur, _Cursor) or cur.it is None:
                raise PlPgSqlError(f'cursor "{cname}" is not open')
            row, processed = self._cursor_seek(cur, kind, expr, env)
            env["found"] = processed != 0
            if row is not None:
                vals = tuple(row)
                if len(s[2]) == 1 and len(vals) > 1:
                    # single record target takes the whole row
                    # (exec_stmt_fetch's row-typed target)
                    env[s[2][0]] = row
                elif len(s[2]) != len(vals):
                    raise PlPgSqlError(
                        f"FETCH has {len(s[2])} target(s) but the cursor "
                        f"returns {len(vals)} column(s)"
                    )
                else:
                    for name, v in zip(s[2], vals):
                        env[name] = v
            else:
                for name in s[2]:
                    env[name] = None
        elif op == "close":
            cur = env.get(s[1])
            if not isinstance(cur, _Cursor) or cur.it is None:
                raise PlPgSqlError(f'cursor "{s[1]}" is not open')
            cur.it = None
            cur.portal = None  # frees the SCROLL tuplestore buffer
        elif op == "move":
            # exec_stmt_fetch with is_move: reposition, discard rows,
            # set FOUND from the processed count — targets untouched
            cname, kind, expr = s[1]
            cur = env.get(cname)
            if not isinstance(cur, _Cursor) or cur.it is None:
                raise PlPgSqlError(f'cursor "{cname}" is not open')
            _, processed = self._cursor_seek(cur, kind, expr, env)
            env["found"] = processed != 0
        elif op == "exit":
            if s[1] is None or self._truthy(s[1], env):
                raise _Exit()
        elif op == "continue":
            if s[1] is None or self._truthy(s[1], env):
                raise _Continue()
        elif op == "return":
            raise _Return(self.eval(s[1], env) if s[1] else None)
        elif op == "return_query":
            if collector is None:
                raise PlPgSqlError("RETURN QUERY in non-set-returning function")
            collector.add_df(self.engine.sql(self._subst(s[1], env)))
        elif op == "return_next":
            if collector is None:
                raise PlPgSqlError("RETURN NEXT in non-set-returning function")
            expr = s[1].strip()
            if expr.startswith("(") and expr.endswith(")"):
                expr = expr[1:-1]
            vals = tuple(self.eval(e, env) for e in _top_split(expr, ","))
            collector.add_row(vals)
        elif op == "raise":
            fmt = self.eval(s[2], env) if s[2] else ""
            args = [self.eval(a, env) for a in s[3]]
            msg = str(fmt)
            for a in args:
                msg = msg.replace("%", "" if a is None else str(a), 1)
            if s[1] == "exception":
                raise PlPgSqlError(msg)
            self.notices.append(f"{s[1].upper()}: {msg}")
        elif op == "perform":
            n = self.engine.sql("SELECT " + self._subst(s[1], env)).limit(1).count()
            env["found"] = n > 0
        elif op == "perform_sql":
            self.engine.sql(self._subst(s[1], env)).limit(1).count()
        elif op == "select_into":
            rows = self.engine.sql(self._subst(s[1], env)).limit(2).collect()
            env["found"] = bool(rows)
            vals = tuple(rows[0]) if rows else (None,) * len(s[2])
            for name, v in zip(s[2], vals):
                env[name] = v
        elif op == "dml":
            n = self.engine.execute_dml(self._subst(s[1], env))
            env["found"], env["__row_count__"] = n > 0, n
        elif op == "execute":
            sql = str(self.eval(s[1], env))
            for k, u in enumerate(s[3], start=1):
                sql = sql.replace(f"${k}", self._lit(self.eval(u, env)))
            head = _first_word(sql)
            if head in ("insert", "update", "delete"):
                n = self.engine.execute_dml(sql)
                env["found"], env["__row_count__"] = n > 0, n
            else:
                rows = self.engine.sql(sql).limit(2).collect()
                env["found"] = bool(rows)
                if s[2]:
                    vals = tuple(rows[0]) if rows else (None,) * len(s[2])
                    for name, v in zip(s[2], vals):
                        env[name] = v
        elif op == "getdiag":
            if s[2] == "row_count":
                env[s[1]] = env.get("__row_count__", 0)
            else:
                raise PlPgSqlError(f"GET DIAGNOSTICS {s[2]} not supported")
        elif op == "block":
            try:
                self.exec_seq(s[1], env, collector)
            except (PlPgSqlError, Exception) as exc:  # noqa: BLE001
                if isinstance(exc, (_Return, _Exit, _Continue)):
                    raise
                for cond, body in s[2]:
                    if cond in ("others", "sqlstate '00000'") or cond == "others":
                        env["sqlerrm"] = str(exc)
                        self.exec_seq(body, env, collector)
                        return
                raise
        elif op == "null":
            pass
        else:  # pragma: no cover
            raise PlPgSqlError(f"plpgsql: unhandled op {op}")


class _SetCollector:
    """Accumulates RETURN QUERY DataFrames and RETURN NEXT rows
    (exec_stmt_return_query appends to the function's tuplestore)."""

    def __init__(self, engine, out_cols):
        self.engine = engine
        self.out_cols = out_cols  # [(name, pgtype), ...] or None
        self.dfs = []
        self.rows = []

    def add_df(self, df):
        self.dfs.append(df)

    def add_row(self, vals):
        self.rows.append(vals)

    def result(self):
        spark = self.engine.spark
        dfs = list(self.dfs)
        if self.rows:
            names = [c for c, _ in self.out_cols] if self.out_cols else None
            if names is None:
                raise PlPgSqlError("RETURN NEXT requires RETURNS TABLE")
            sch = ", ".join(
                f"{n} {_spark_type(t)}" for n, t in self.out_cols
            )
            dfs.append(spark.createDataFrame(self.rows, sch))
        if not dfs:
            if self.out_cols:
                sch = ", ".join(f"{n} {_spark_type(t)}" for n, t in self.out_cols)
                return spark.createDataFrame([], sch)
            raise PlPgSqlError("set-returning function returned no rows")
        out = dfs[0]
        if self.out_cols:
            names = [c for c, _ in self.out_cols]
            out = out.toDF(*names)
            for d in dfs[1:]:
                out = out.unionByName(d.toDF(*names))
        else:
            for d in dfs[1:]:
                out = out.union(d)
        return out


def _spark_type(pg: str) -> str:
    t = pg.strip().lower()
    base = re.sub(r"\(.*\)", "", t).strip()
    m = {
        "int": "int", "integer": "int", "int4": "int",
        "bigint": "bigint", "int8": "bigint",
        "smallint": "smallint", "int2": "smallint",
        "text": "string", "varchar": "string", "character varying": "string",
        "char": "string", "bpchar": "string", "name": "string",
        "bool": "boolean", "boolean": "boolean",
        "double precision": "double", "float8": "double", "real": "float",
        "numeric": "decimal(25,6)", "decimal": "decimal(25,6)",
        "date": "date", "timestamp": "timestamp",
        "timestamptz": "timestamp", "timestamp with time zone": "timestamp",
    }
    return m.get(base, "string")


# ---------------------------------------------------------------------------
# DDL surface: CREATE FUNCTION / DO / call
# ---------------------------------------------------------------------------

_CREATE_FN = re.compile(
    r"(?is)^\s*create\s+(?:or\s+replace\s+)?function\s+([\w.]+)\s*"
    r"\((.*?)\)\s*returns\s+(.*?)\s+as\s+(\$[A-Za-z_]*\$)(.*)"
)


def compile_function(ddl: str) -> PlFunction:
    """CREATE [OR REPLACE] FUNCTION ... LANGUAGE plpgsql (pl_comp.c
    do_compile): parse signature + body into a PlFunction."""
    m = _CREATE_FN.match(ddl)
    if not m:
        raise PlPgSqlError("plpgsql: cannot parse CREATE FUNCTION")
    name, params, rets, tag, tail = m.groups()
    end = tail.find(tag)
    body = tail[:end]
    argnames, argdefaults = [], []
    for p in _top_split(params, ","):
        p = p.strip()
        if not p:
            continue
        pm = re.match(r"(?is)^(\w+)\s+[\w ]+?(?:\(\d+(?:,\d+)?\))?"
                      r"\s*(?:(?:default|=)\s+(.+))?$", p)
        argnames.append(pm.group(1).lower())
        argdefaults.append(pm.group(2))
    rets = rets.strip()
    rl = rets.lower()
    if rl.startswith("table"):
        inner = rets[rets.index("(") + 1 : rets.rindex(")")]
        cols = []
        for c in _top_split(inner, ","):
            cn, ct = c.strip().split(None, 1)
            cols.append((cn.lower(), ct))
        returns = ("table", cols)
    elif rl.startswith("setof"):
        returns = ("setof", rets.split(None, 1)[1])
    elif rl == "void":
        returns = ("void",)
    else:
        returns = ("scalar", rets)
    decls, block = _parse_body(body)
    return PlFunction(name.lower(), argnames, argdefaults, returns, decls, block)


def call_function(engine, fn: PlFunction, *args):
    """Invoke a compiled function (pl_exec.c plpgsql_exec_function).
    Scalar/void functions return the Python value; TABLE/SETOF return a
    DataFrame."""
    interp = Interpreter(engine)
    env: dict = {"found": False}
    for i, name in enumerate(fn.argnames):
        if i < len(args):
            env[name] = args[i]
        elif fn.argdefaults[i] is not None:
            env[name] = interp.eval(fn.argdefaults[i], env)
        else:
            raise PlPgSqlError(f"missing argument {name}")
    is_set = fn.returns[0] in ("table", "setof")
    collector = _SetCollector(
        engine, fn.returns[1] if fn.returns[0] == "table" else None
    ) if is_set else None
    try:
        interp.run_block(fn.decls, fn.block, env, collector)
    except _Return as r:
        engine._pl_notices = getattr(engine, "_pl_notices", []) + interp.notices
        if is_set:
            return collector.result()
        return r.value
    engine._pl_notices = getattr(engine, "_pl_notices", []) + interp.notices
    if is_set:
        return collector.result()
    return None


_DO = re.compile(r"(?is)^\s*do\s+(?:language\s+plpgsql\s+)?(\$[A-Za-z_]*\$)(.*)")


def run_do(engine, stmt: str) -> list[str]:
    """DO $$ ... $$ anonymous block (commands/functioncmds.c
    ExecuteDoStmt). Returns the notices the block raised."""
    m = _DO.match(stmt)
    if not m:
        raise PlPgSqlError("plpgsql: cannot parse DO block")
    tag, tail = m.groups()
    body = tail[: tail.find(tag)]
    decls, block = _parse_body(body)
    interp = Interpreter(engine)
    try:
        interp.run_block(decls, block, {"found": False}, None)
    except _Return:
        pass
    engine._pl_notices = getattr(engine, "_pl_notices", []) + interp.notices
    return interp.notices
