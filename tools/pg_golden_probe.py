"""Golden-file conformance probe: run the reference's own FROM-less
regression SELECTs and compare the ENGINE's output against the
reference's expected/*.out files DIRECTLY — no DuckDB intermediary.
(/root/reference/src/test/regress/expected — treated as DATA; file
content is untrusted and only ever parsed as statement/result text.)

This complements tools/pg_regress_probe.py: that tool buckets
engine-vs-DuckDB agreement (and DuckDB itself diverges from PG in
documented ways); this one scores the engine against PG's own goldens,
so an AGREE here is PG-exactness, full stop.

Buckets:
  GOLD_AGREE  engine rows render byte-identical to the expected block
  GOLD_DIFF   engine ran, rendered text differs        <- review these
  ERR_AGREE   golden expects ERROR and the engine refused (loudness
              parity — PG's error contract honored)
  ERR_MISS    golden expects ERROR but the engine returned rows
  ENGINE_ERR  golden expects rows but the engine refused
  SKIP        statement or block the parser cannot handle

Known GOLD_DIFF classes (representation, not value — reviewed by hand):
- regress runs under DateStyle 'Postgres, MDY'; the engine renders
  ISO (SET datestyle output styles documented out of scope), so
  date/timestamp/interval-rendering rows differ textually
- PG keeps an unnormalized hours field ('999:00:00'); day-time
  intervals here store total micros, rendered days + HH:MM:SS
- float shortest-repr exponent spelling ('1e+20' vs '1e20')

Usage: python tools/pg_golden_probe.py [--list-diff] [file ...]
"""
from __future__ import annotations

import datetime
import re
import sys
from decimal import Decimal

sys.path.insert(0, "/root/repo")

EXPECTED = "/root/reference/src/test/regress/expected"

# same expression-level corpus as pg_regress_probe
from pg_regress_probe import CANDIDATES  # noqa: E402


def parse_expected(path: str):
    """Yield (statement, expect) where expect is ('error',) or
    ('rows', [row-text, ...]) for single-statement FROM-less SELECTs."""
    try:
        lines = open(path, errors="replace").read().splitlines()
    except OSError:
        return
    i, n = 0, len(lines)
    while i < n:
        line = lines[i]
        if not re.match(r"(?i)^select\b", line):
            i += 1
            continue
        stmt_lines = [line]
        while not re.search(r";\s*(--.*)?$", stmt_lines[-1]) and i + 1 < n:
            i += 1
            stmt_lines.append(lines[i])
        i += 1
        stmt = " ".join(stmt_lines)
        stmt = re.sub(r"--[^\n]*", "", stmt).strip().rstrip(";").strip()
        # FROM-less, single-statement, no SRF-free guard needed: the
        # engine refusing is itself a bucket
        if re.search(r"(?i)\bfrom\b", stmt) or not stmt:
            continue
        if i < n and lines[i].startswith("ERROR:"):
            while i < n and lines[i] != "" and not re.match(
                r"(?i)^select\b", lines[i]
            ):
                i += 1
            yield stmt, ("error", None)
            continue
        # header line, dashes line, data rows, "(N rows)"
        if i + 1 < n and re.fullmatch(r"-+(\+-+)*", lines[i + 1] or ""):
            j = i + 2
            rows = []
            while j < n and not re.fullmatch(r"\((\d+) rows?\)", lines[j]):
                rows.append(lines[j])
                j += 1
            if j < n:
                yield stmt, ("rows", rows)
                i = j + 1
                continue
        # block shape not recognized: skip this statement
        yield stmt, ("skip", None)


def _pg_interval_text(td: datetime.timedelta) -> str:
    """PG interval_out (postgres style) for a day-time value: days
    component + HH:MM:SS[.ffffff]; negatives render sign per part."""
    total = td.days * 86400 * 10**6 + td.seconds * 10**6 + td.microseconds
    sign = "-" if total < 0 else ""
    total = abs(total)
    days, rest = divmod(total, 86400 * 10**6)
    secs, us = divmod(rest, 10**6)
    h, ms = divmod(secs, 3600)
    m, s = divmod(ms, 60)
    t = f"{sign}{h:02d}:{m:02d}:{s:02d}"
    if us:
        t += f".{us:06d}".rstrip("0")
    parts = []
    if days:
        parts.append(f"{sign}{days} day" + ("" if days == 1 else "s"))
    if days and total % (86400 * 10**6) == 0:
        return parts[0]
    parts.append(t)
    return " ".join(parts)


def render(v) -> str:
    """PG text rendering of a collected Python value."""
    if v is None:
        return ""
    if v is True:
        return "t"
    if v is False:
        return "f"
    if isinstance(v, float):
        r = repr(v)
        return r[:-2] if r.endswith(".0") else r
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        s = v.strftime("%Y-%m-%d %H:%M:%S")
        if v.microsecond:
            s += f".{v.microsecond:06d}".rstrip("0")
        return s
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, datetime.timedelta):
        return _pg_interval_text(v)
    if isinstance(v, (bytes, bytearray)):
        return "\\x" + bytes(v).hex()
    if isinstance(v, list):
        out = []
        for e in v:
            t = render(e)
            if t == "" or re.search(r'[{},"\\\s]', t) or t.lower() == "null":
                t = '"' + t.replace("\\", "\\\\").replace('"', '\\"') + '"'
            out.append("NULL" if e is None else t)
        return "{" + ",".join(out) + "}"
    return str(v)


def main(argv):
    list_diff = "--list-diff" in argv
    files = [a for a in argv if not a.startswith("--")] or CANDIDATES

    from pyspark.sql import SparkSession

    import gpdb_spark  # noqa: F401 — ym shim
    from gpdb_spark.dialect import pg_sql

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tally = {k: 0 for k in ("GOLD_AGREE", "GOLD_DIFF", "ERR_AGREE",
                            "ERR_MISS", "ENGINE_ERR", "SKIP")}
    diffs, engerrs = [], []
    for f in files:
        per = dict.fromkeys(tally, 0)
        for stmt, (kind, rows) in parse_expected(f"{EXPECTED}/{f}.out"):
            if kind == "skip":
                per["SKIP"] += 1
                continue
            try:
                got = pg_sql(spark, stmt, None).collect()
                ok = True
            except Exception:
                ok = False
            if kind == "error":
                per["ERR_AGREE" if not ok else "ERR_MISS"] += 1
                if ok and list_diff:
                    diffs.append((f, stmt, "expected ERROR, got rows"))
                continue
            if not ok:
                per["ENGINE_ERR"] += 1
                engerrs.append((f, stmt))
                continue
            # psql aligned format pads cells (numbers right-aligned,
            # text left-aligned) — alignment spaces are not separable
            # from value-edge spaces, so the compare is whitespace-
            # TRIMMED per cell (interior whitespace still compares)
            want = [
                " | ".join(p.strip() for p in r.split(" | "))
                for r in (x for x in rows)
            ]
            have = [
                " | ".join(render(v).strip() for v in r) for r in got
            ]
            if want == have:
                per["GOLD_AGREE"] += 1
            else:
                per["GOLD_DIFF"] += 1
                if list_diff:
                    diffs.append((f, stmt, f"want={want!r} have={have!r}"))
        for k in tally:
            tally[k] += per[k]
        print(f"{f} {per}")
    print(f"TOTAL {tally}")
    if list_diff:
        print("== GOLD_DIFF / ERR_MISS ==")
        for f, stmt, why in diffs:
            print(f"[{f}] {stmt}\n    {why}")
        print("== ENGINE_ERR ==")
        for f, stmt in engerrs:
            print(f"[{f}] {stmt}")


if __name__ == "__main__":
    main(sys.argv[1:])
