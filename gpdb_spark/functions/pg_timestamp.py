"""Canonical-text TIMESTAMP(p) columns (the timestamp.sql surface).

Reference semantics: utils/adt/timestamp.c (timestamp_in,
AdjustTimestampForTypmod, timestamp_mi, timestamp_part) and
utils/adt/datetime.c (DecodeDateTime's field machine, EncodeDateTime)
plus utils/adt/formatting.c's DCH renderer for to_char.

Spark's TIMESTAMP cannot hold ±infinity or BC instants (and year-1
values cannot survive the PySpark collect path), so a column declared
``timestamp(p) without time zone`` stores the finished PG OUTPUT
image under the session DateStyle; the operator surface
(comparisons, subtraction, date_part, to_char) parses that image
back — the image is itself valid PG input, mirroring the dump/reload
property of the reference.  Scale note: this is a conformance
surface behind the engine front door; the 100 TB path keeps plain
``timestamp`` columns as native Spark TIMESTAMP (only an explicit
precision typmod opts a column in).
"""
from __future__ import annotations

import re
from dataclasses import dataclass

_MONTHS = {m.lower(): i + 1 for i, m in enumerate(
    ["January", "February", "March", "April", "May", "June", "July",
     "August", "September", "October", "November", "December"])}
_MON3 = {m[:3].lower(): v for m, v in _MONTHS.items()}
_DAYS = {d.lower() for d in
         ["Sunday", "Monday", "Tuesday", "Wednesday", "Thursday",
          "Friday", "Saturday"]}
_DAY3 = {d[:3] for d in _DAYS} | {"tues", "thur", "thurs"}
_MON_NAMES = ["January", "February", "March", "April", "May", "June",
              "July", "August", "September", "October", "November",
              "December"]
_DAY_NAMES = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
              "Saturday", "Sunday"]  # index = proleptic weekday()
_RM = ["I", "II", "III", "IV", "V", "VI", "VII", "VIII", "IX", "X",
       "XI", "XII"]

# zone abbreviations this vintage's tznames/Default recognizes enough
# of for the regress surface (the value is unused: timestamp WITHOUT
# time zone discards the displacement after validating it)
_KNOWN_ABBREVS = {
    "est", "edt", "cst", "cdt", "mst", "mdt", "pst", "pdt", "gmt",
    "utc", "z", "zulu", "ut", "bst", "cet", "cest", "eet", "eest",
    "jst", "kst", "ist", "nzdt", "nzst", "hst", "akst", "akdt",
    "wet", "west", "msk", "sat",
}


@dataclass
class TS:
    y: int          # astronomical year (1 BC = 0, 2 BC = -1)
    mo: int
    d: int
    hh: int = 0
    mi: int = 0
    ss: int = 0
    us: int = 0

    @property
    def era_bc(self) -> bool:
        return self.y < 1

    @property
    def disp_year(self) -> int:
        return self.y if self.y >= 1 else 1 - self.y


def _leap(a: int) -> bool:
    return a % 4 == 0 and (a % 100 != 0 or a % 400 == 0)


_MLEN = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


def _mlen(a: int, mo: int) -> int:
    if mo == 2 and _leap(a):
        return 29
    return _MLEN[mo - 1]


def days_before_year(a: int) -> int:
    """Proleptic-Gregorian days before Jan 1 of astronomical year
    ``a`` counted from 0001-01-01 (ordinal 1) — floor divisions keep
    it era-uniform."""
    y = a - 1
    return 365 * y + y // 4 - y // 100 + y // 400


def ordinal(ts: TS) -> int:
    n = days_before_year(ts.y)
    for m in range(1, ts.mo):
        n += _mlen(ts.y, m)
    return n + ts.d


def weekday(ts: TS) -> int:
    """0 = Monday (0001-01-01 was a Monday)."""
    return (ordinal(ts) - 1) % 7


def micros(ts: TS) -> int:
    """Microseconds since 2000-01-01 00:00:00 (PG's timestamp epoch),
    valid for BC values too."""
    d0 = days_before_year(2000) + 1  # ordinal of 2000-01-01
    days = ordinal(ts) - d0
    return ((days * 86400 + ts.hh * 3600 + ts.mi * 60 + ts.ss)
            * 1_000_000 + ts.us)


INF_KEY = 2 ** 62


def _err(v):
    raise ValueError(
        f'invalid input syntax for type timestamp: "{v}"')


def parse_ts(v: str, order: str = "mdy"):
    """DecodeDateTime's field machine over PG's flexible timestamp
    input.  Returns a TS, or the strings 'infinity'/'-infinity', or
    None for 'now'-class specials the CALLER must resolve.  Raises on
    invalid input, unknown zones, obsolete specials, and
    out-of-range fields — the timestamp.sql error contracts."""
    s = v.strip()
    low = s.lower()
    if low in ("infinity", "+infinity"):
        return "infinity"
    if low == "-infinity":
        return "-infinity"
    if low in ("invalid", "undefined", "current"):
        raise ValueError(
            f'date/time value "{low}" is no longer supported')
    if low == "epoch":
        return TS(1970, 1, 1)
    # ISO-8601 'T' separator joins date and time in one token
    s = re.sub(r"(\d)T(\d)", r"\1 \2", s)
    # tokenize: quoted-free field split on whitespace and commas
    raw = re.split(r"[\s,]+", s)
    raw = [t for t in raw if t]
    y = mo = d = None
    hh = mi = ss = us = 0
    have_time = False
    bc = False
    ampm = None
    special_day = None
    zone_seen = False
    y_digits = 0

    def claim_num(tok):
        nonlocal y, mo, d, y_digits
        n = int(tok)
        if len(tok) >= 3:
            if y is None:
                y, y_digits = n, len(tok)
                return
            _err(v)
        # two-or-fewer digits fill in DateOrder
        if order == "ymd":
            if y is None:
                y, y_digits = n, len(tok)
            elif mo is None:
                mo = n
            elif d is None:
                d = n
            else:
                _err(v)
        elif order == "dmy":
            if d is None:
                d = n
            elif mo is None:
                mo = n
            elif y is None:
                y, y_digits = n, len(tok)
            else:
                _err(v)
        else:
            if mo is None:
                mo = n
            elif d is None:
                d = n
            elif y is None:
                y, y_digits = n, len(tok)
            else:
                _err(v)

    i = 0
    while i < len(raw):
        tok = raw[i]
        tl = tok.lower()
        i += 1
        if tl in ("today", "yesterday", "tomorrow", "now"):
            special_day = tl
            continue
        if tl in ("bc", "b.c."):
            bc = True
            continue
        if tl in ("ad", "a.d."):
            continue
        if tl in ("am", "pm", "a.m.", "p.m."):
            ampm = tl[0]
            continue
        # time field HH:MM[:SS[.f]] with optional AM/PM suffix and
        # optional zone glued on
        m = re.match(
            r"^(\d{1,2}):(\d{2})(?::(\d{2})(\.\d+)?)?"
            r"(am|pm|AM|PM)?([+-]\d{1,2}(:?\d{2})?)?$", tok)
        if m:
            hh, mi = int(m.group(1)), int(m.group(2))
            ss = int(m.group(3) or 0)
            if m.group(4):
                frac = m.group(4)[1:][:6].ljust(6, "0")
                us = int(frac)
            if m.group(5):
                ampm = m.group(5)[0].lower()
            if m.group(6):
                off = m.group(6).lstrip("+-").replace(":", "")
                if int(off[:2]) > 15:
                    raise ValueError(
                        f'time zone displacement out of range: "{v}"')
            have_time = True
            continue
        # signed zone displacement (-08, +0800, -08:00, +7:00)
        m = re.match(r"^[+-]\d{1,2}(:?\d{2})?(:\d{2})?$", tok)
        if m and (have_time or y is not None):
            off = tok.lstrip("+-").replace(":", "")
            oh = int(off[:2]) if len(off) >= 2 else int(off)
            if oh > 15:
                raise ValueError(
                    f'time zone displacement out of range: "{v}"')
            zone_seen = True
            continue
        # negative year spelling ('-0097') reaches here with no time
        if re.match(r"^-\d+$", tok):
            raise ValueError(
                f'time zone displacement out of range: "{v}"')
        # POSIX zone (GMT+8, MST+7:00) / abbrev / IANA name
        m = re.match(r"^([A-Za-z]+)([+-]\d{1,2}(:\d{2})?)?$", tok)
        if m and not tok.isdigit():
            w = m.group(1).lower()
            if w in _MONTHS or w in _MON3:
                mm = _MONTHS.get(w) or _MON3.get(w)
                if mo is not None and d is None:
                    d, mo = mo, mm
                elif mo is None:
                    mo = mm
                else:
                    _err(v)
                continue
            if w in _DAYS or w in _DAY3:
                continue  # day names are decoration
            if w in _KNOWN_ABBREVS or m.group(2):
                zone_seen = True
                continue
            if "/" in tok or w not in _KNOWN_ABBREVS:
                # IANA zone name (possibly Area/City in ONE token)
                name = tok
                try:
                    from zoneinfo import ZoneInfo
                    ZoneInfo(name)
                    zone_seen = True
                    continue
                except Exception:
                    raise ValueError(
                        f'time zone "{tok}" not recognized') from None
        if "/" in tok and not tok[0].isdigit():
            try:
                from zoneinfo import ZoneInfo
                ZoneInfo(tok)
                zone_seen = True
                continue
            except Exception:
                raise ValueError(
                    f'time zone "{tok}" not recognized') from None
        # date-ish field: 1997-01-02, 1/8/1999, 1997.041, 19970210,
        # 97FEB10, 173201 (compact time), plain number
        if re.match(r"^\d+$", tok):
            if len(tok) == 6 and (y is not None or mo is not None) \
                    and not have_time:
                # compact HHMMSS once a date has been seen
                hh, mi, ss = int(tok[0:2]), int(tok[2:4]), int(tok[4:6])
                have_time = True
                continue
            if len(tok) >= 6:
                # run-together date [+ optional time handled above]
                y, mo, d = _date_triple(tok, order, v)
                y_digits = 4
                continue
            claim_num(tok)
            continue
        # compact alpha-month form (97FEB10 under ymd)
        m = re.match(r"^(\d{1,4})([A-Za-z]{3,9})(\d{1,2})$", tok)
        if m and (m.group(2).lower() in _MONTHS
                  or m.group(2)[:3].lower() in _MON3):
            mo = _MONTHS.get(m.group(2).lower()) \
                or _MON3[m.group(2)[:3].lower()]
            a_, b_ = int(m.group(1)), int(m.group(3))
            if order == "ymd" or len(m.group(1)) >= 3:
                y, y_digits = a_, len(m.group(1))
                d = b_
            else:
                d, y, y_digits = a_, b_, len(m.group(3))
            continue
        m = re.match(r"^(\d{1,4})\.(\d{3})$", tok)
        if m:
            # day-of-year form 1997.041
            y, y_digits = int(m.group(1)), len(m.group(1))
            doy = int(m.group(2))
            a = y
            if doy < 1 or doy > (366 if _leap(a) else 365):
                _err(v)
            mo = 1
            rem = doy
            while rem > _mlen(a, mo):
                rem -= _mlen(a, mo)
                mo += 1
            d = rem
            continue
        if re.match(r"^\d{4}\.\d+$", tok):
            _err(v)
        # delimited date triple (1997-01-02, 1/8/1999, 02-10-1997):
        # reuse the date-literal field machine under the session order
        if re.match(r"^[\dA-Za-z./-]+$", tok) and any(
                c.isdigit() for c in tok):
            y, mo, d = _date_triple(tok, order, v)
            y_digits = 4
            continue
        _err(v)
    del zone_seen
    if special_day is not None:
        if y is not None or mo is not None:
            _err(v)
        return (special_day, hh, mi, ss, us) if have_time \
            else (special_day, hh, mi, ss, us)
    if y is None or mo is None or d is None:
        _err(v)
    if y_digits <= 2 and not bc:
        y += 2000 if y < 70 else 1900
    if ampm == "p" and hh < 12:
        hh += 12
    elif ampm == "a" and hh == 12:
        hh = 0
    a = 1 - y if bc else y
    if bc and (y < 1 or y > 4713):
        raise ValueError(f'timestamp out of range: "{v}"')
    if not (1 <= mo <= 12) or not (1 <= d <= _mlen(a, mo)) \
            or hh > 24 or mi > 59 or ss > 60:
        raise ValueError(
            f'date/time field value out of range: "{v}"')
    return TS(a, mo, d, hh, mi, ss, us)


def _date_triple(tok: str, order: str, v: str):
    """Delimited/run-together date via the dialect's date-literal
    field machine, under the CALLER's DateOrder (the dialect global
    is per-process — the worker's copy must be aligned first)."""
    from gpdb_spark import dialect as _dlct

    old = _dlct._DATE_ORDER
    try:
        _dlct.set_date_order(order)
        body = _dlct._pg_date_literal(f"'{tok}'")[1:-1]
    finally:
        _dlct.set_date_order(old)
    mm2 = re.fullmatch(r"(\d{4})-(\d{2})-(\d{2})", body)
    if not mm2:
        _err(v)
    return (int(mm2.group(1)), int(mm2.group(2)), int(mm2.group(3)))


def round_typmod(ts: TS, p: int) -> TS:
    """AdjustTimestampForTypmod: round the microseconds to p digits
    (half-even, like TSROUND's rint), carrying into seconds."""
    if p >= 6:
        return ts
    q = 10 ** (6 - p)
    half = q // 2
    r = ts.us % q
    base = ts.us - r
    if r > half or (r == half and (base // q) % 2 == 1):
        base += q
    us = base
    ss, mi, hh, d, mo, y = ts.ss, ts.mi, ts.hh, ts.d, ts.mo, ts.y
    if us >= 1_000_000:
        us -= 1_000_000
        ss += 1
        if ss >= 60:
            ss -= 60
            mi += 1
        if mi >= 60:
            mi -= 60
            hh += 1
        if hh >= 24:
            hh -= 24
            d += 1
            if d > _mlen(y, mo):
                d = 1
                mo += 1
                if mo > 12:
                    mo = 1
                    y += 1
    return TS(y, mo, d, hh, mi, ss, us)


def ts_image(ts, p: int, style: str, order: str) -> str:
    """EncodeDateTime: the session-style output image (the stored
    canonical text). ``ts`` may be the infinity strings."""
    if isinstance(ts, str):
        return ts
    frac = ""
    if ts.us:
        frac = f".{ts.us:06d}".rstrip("0")
    yd = ts.disp_year
    era = " BC" if ts.era_bc else ""
    t = f"{ts.hh:02d}:{ts.mi:02d}:{ts.ss:02d}{frac}"
    if style == "postgres":
        dow = _DAY_NAMES[weekday(ts)][:3]
        mon = _MON_NAMES[ts.mo - 1][:3]
        if order == "dmy":
            return f"{dow} {ts.d:02d} {mon} {t} {yd:04d}{era}"
        return f"{dow} {mon} {ts.d:02d} {t} {yd:04d}{era}"
    if style == "sql":
        dpart = (f"{ts.d:02d}/{ts.mo:02d}/{yd:04d}"
                 if order == "dmy" else
                 f"{ts.mo:02d}/{ts.d:02d}/{yd:04d}")
        return f"{dpart} {t}{era}"
    if style == "german":
        return f"{ts.d:02d}.{ts.mo:02d}.{yd:04d} {t}{era}"
    return f"{yd:04d}-{ts.mo:02d}-{ts.d:02d} {t}{era}"


def ts_canon(p, style, order, now_iso, v):
    """The INSERT/COPY input function: parse, resolve specials
    against the (transaction-stable) ``now_iso`` wall clock, apply
    the typmod rounding, and return the output image."""
    if v is None:
        return None
    p = int(p) if p is not None else 6
    parsed = parse_ts(str(v), order)
    if isinstance(parsed, str):
        return parsed
    if isinstance(parsed, tuple):
        kind, hh, mi, ss, us = parsed
        m = re.fullmatch(
            r"(\d{4})-(\d{2})-(\d{2})[ T]"
            r"(\d{2}):(\d{2}):(\d{2})(\.\d+)?", now_iso)
        base = TS(int(m.group(1)), int(m.group(2)), int(m.group(3)),
                  int(m.group(4)), int(m.group(5)), int(m.group(6)),
                  int((m.group(7) or ".0")[1:].ljust(6, "0")[:6]))
        if kind == "now":
            ts = base
        else:
            shift = {"today": 0, "yesterday": -1, "tomorrow": 1}[kind]
            o = ordinal(TS(base.y, base.mo, base.d)) + shift
            ts = _from_ordinal(o, hh, mi, ss, us)
    else:
        ts = parsed
    ts = round_typmod(ts, p)
    return ts_image(ts, p, style, order)


def _from_ordinal(o: int, hh=0, mi=0, ss=0, us=0) -> TS:
    a = o * 400 // 146097 + 1
    while days_before_year(a + 1) < o:
        a += 1
    while days_before_year(a) >= o:
        a -= 1
    rem = o - days_before_year(a)
    mo = 1
    while rem > _mlen(a, mo):
        rem -= _mlen(a, mo)
        mo += 1
    return TS(a, mo, rem, hh, mi, ss, us)


def _parse_canon(text: str, order: str = "mdy"):
    """Parse a stored canonical image back (every style's image is
    valid PG input)."""
    return parse_ts(text, order)


def ts_key(text):
    """Total-order sort key (micros since 2000-01-01; ±2^62 for the
    infinities)."""
    if text is None:
        return None
    t = str(text).strip().lower()
    if t == "infinity":
        return INF_KEY
    if t == "-infinity":
        return -INF_KEY
    ts = _parse_canon(str(text))
    if isinstance(ts, (str, tuple)):
        return None
    return micros(ts)


def ts_sub(a_text, b_text, style="postgres_verbose"):
    """timestamp_mi: interval (days + time, never months) rendered in
    the given IntervalStyle."""
    if a_text is None or b_text is None:
        return None
    ka, kb = ts_key(a_text), ts_key(b_text)
    if ka is None or kb is None or abs(ka) == INF_KEY \
            or abs(kb) == INF_KEY:
        raise ValueError(
            "cannot subtract infinite timestamps")
    diff = ka - kb
    neg = diff < 0
    diff = abs(diff)
    days, rem = divmod(diff, 86400 * 1_000_000)
    hh, rem = divmod(rem, 3600 * 1_000_000)
    mi, rem = divmod(rem, 60 * 1_000_000)
    ss, us = divmod(rem, 1_000_000)
    if style == "postgres_verbose":
        parts = []
        if days:
            parts.append(f"{days} day" + ("s" if days != 1 else ""))
        if hh:
            parts.append(f"{hh} hour" + ("s" if hh != 1 else ""))
        if mi:
            parts.append(f"{mi} min" + ("s" if mi != 1 else ""))
        if ss or us:
            sv = f"{ss}" + (f".{us:06d}".rstrip("0") if us else "")
            plural = "" if (ss == 1 and not us) else "s"
            parts.append(f"{sv} sec{plural}")
        if not parts:
            return "@ 0"
        return "@ " + " ".join(parts) + (" ago" if neg else "")
    # postgres style
    sign = "-" if neg else ""
    out = []
    if days:
        out.append(f"{sign}{days} day" + ("s" if days != 1 else ""))
    t = f"{hh:02d}:{mi:02d}:{ss:02d}"
    if us:
        t += f".{us:06d}".rstrip("0")
    if hh or mi or ss or us or not days:
        out.append((sign if not days else "") + t)
    return " ".join(out)


def ts_part(field, text):
    """timestamp_part: this vintage returns 0 for the infinities."""
    if text is None or field is None:
        return None
    t = str(text).strip().lower()
    f = str(field).strip().lower()
    if t in ("infinity", "-infinity"):
        return 0.0
    ts = _parse_canon(str(text))
    if isinstance(ts, (str, tuple)):
        return None
    a = ts.y
    disp = ts.disp_year
    pgy = a if a >= 1 else a - 1  # PG's signed year (no year 0)
    if f == "year":
        return float(pgy)
    if f == "month":
        return float(ts.mo)
    if f == "day":
        return float(ts.d)
    if f == "hour":
        return float(ts.hh)
    if f == "minute":
        return float(ts.mi)
    if f in ("second", "sec"):
        return ts.ss + ts.us / 1e6
    if f == "quarter":
        return float((ts.mo - 1) // 3 + 1)
    if f in ("msec", "millisecond", "milliseconds"):
        return ts.ss * 1000.0 + ts.us / 1000.0
    if f in ("usec", "microsecond", "microseconds"):
        return ts.ss * 1e6 + ts.us
    if f == "dow":
        return float((weekday(ts) + 1) % 7)
    if f == "isodow":
        return float(weekday(ts) + 1)
    if f == "doy":
        return float(ordinal(ts) - days_before_year(a))
    if f == "week" or f == "isoyear":
        # ISO 8601 week: week 1 holds Jan 4
        o = ordinal(ts)
        wd = weekday(ts)
        thursday = o + (3 - wd)
        ay = a
        while days_before_year(ay + 1) < thursday:
            ay += 1
        while days_before_year(ay) >= thursday:
            ay -= 1
        if f == "isoyear":
            return float(ay if ay >= 1 else ay - 1)
        jan4 = days_before_year(ay) + 4
        week1_mon = jan4 - weekday(_from_ordinal(jan4))
        return float((o - week1_mon) // 7 + 1)
    if f == "decade":
        return float(a // 10)
    if f == "century":
        return float(-((disp + 99) // 100)) if a < 1 \
            else float((a + 99) // 100)
    if f == "millennium":
        return float(-((disp + 999) // 1000)) if a < 1 \
            else float((a + 999) // 1000)
    if f == "julian":
        # Julian day number: 2000-01-01 is J2451545
        d0 = days_before_year(2000) + 1
        jd = ordinal(ts) - d0 + 2451545
        return jd + (ts.hh * 3600 + ts.mi * 60 + ts.ss
                     + ts.us / 1e6) / 86400.0
    if f == "epoch":
        d0 = days_before_year(1970) + 1
        return ((ordinal(ts) - d0) * 86400.0 + ts.hh * 3600
                + ts.mi * 60 + ts.ss + ts.us / 1e6)
    raise ValueError(f'timestamp units "{field}" not recognized')


def _ordsuffix(n: int) -> str:
    last2, last1 = n % 100, n % 10
    if 11 <= last2 <= 13 or last1 not in (1, 2, 3):
        return "th"
    return {1: "st", 2: "nd", 3: "rd"}[last1]


def ts_tochar(text, fmt):
    """formatting.c DCH renderer over a canonical-text timestamp.
    The infinities render as an empty string (this vintage's
    behavior); BC values render their fields (year counts down)."""
    if text is None or fmt is None:
        return None
    t = str(text).strip().lower()
    if t in ("infinity", "-infinity"):
        return ""
    ts = _parse_canon(str(text))
    if isinstance(ts, (str, tuple)):
        return None
    out: list[str] = []
    f = str(fmt)
    # the dialect lexer ships E'' literals with doubled backslashes
    f = f.replace("\\\\", "\\")
    i = 0
    fm = False

    wd = weekday(ts)
    disp = ts.disp_year
    o = ordinal(ts)
    doy = o - days_before_year(ts.y)
    d0 = days_before_year(2000) + 1
    jd = o - d0 + 2451545
    # ISO week fields
    thursday = o + (3 - wd)
    ay = ts.y
    while days_before_year(ay + 1) < thursday:
        ay += 1
    while days_before_year(ay) >= thursday:
        ay -= 1
    jan4 = days_before_year(ay) + 4
    week1_mon = jan4 - weekday(_from_ordinal(jan4))
    iw = (o - week1_mon) // 7 + 1
    iddd = (iw - 1) * 7 + wd + 1
    iso_y = ay if ay >= 1 else 1 - ay

    def emit(s):
        out.append(s)

    while i < len(f):
        c = f[i]
        if c == '"':
            # escape-aware quoted-literal scan (\" stays a quote
            # INSIDE the literal — formatting.c)
            j = i + 1
            buf = []
            while j < len(f):
                if f[j] == "\\" and j + 1 < len(f):
                    buf.append(f[j + 1])
                    j += 2
                    continue
                if f[j] == '"':
                    break
                buf.append(f[j])
                j += 1
            emit("".join(buf))
            i = j + 1
            continue
        if c == "\\" and i + 1 < len(f):
            emit(f[i + 1])
            i += 2
            continue
        if f[i:i + 2] in ("FM", "fm"):
            fm = True  # applies to the next field (reset on match)
            i += 2
            continue
        matched = False
        for pat, fn in _DCH_TABLE:
            if f[i:i + len(pat)] == pat:
                piece = fn(ts, wd, disp, doy, jd, iw, iddd, iso_y, fm)
                i += len(pat)
                fm = False
                # TH/th ordinal postfix binds to this field's digits
                if f[i:i + 2] in ("TH", "th") and piece \
                        and piece[-1].isdigit():
                    piece = _apply_th(piece, f[i:i + 2] == "TH")
                    i += 2
                emit(piece)
                matched = True
                break
        if matched:
            continue
        emit(c)
        i += 1
    return "".join(out)


def _pad(s, w, fm):
    return s if fm else s.ljust(w)


def _n(v, w, fm):
    return str(v) if fm else f"{v:0{w}d}"


_DCH_TABLE: list = []


def _dch(pat):
    def reg(fn):
        _DCH_TABLE.append((pat, fn))
        return fn
    return reg


def _mon_idx(ts):
    return ts.mo - 1


# order matters: longest / most specific first
@_dch("DAY")
def _f_DAY(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return _pad(_DAY_NAMES[wd].upper(), 9, fm)


@_dch("Day")
def _f_Day(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return _pad(_DAY_NAMES[wd], 9, fm)


@_dch("day")
def _f_day(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return _pad(_DAY_NAMES[wd].lower(), 9, fm)


@_dch("DY")
def _f_DY(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return _DAY_NAMES[wd][:3].upper()


@_dch("Dy")
def _f_Dy(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return _DAY_NAMES[wd][:3]


@_dch("dy")
def _f_dy(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return _DAY_NAMES[wd][:3].lower()


@_dch("MONTH")
def _f_MONTH(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return _pad(_MON_NAMES[ts.mo - 1].upper(), 9, fm)


@_dch("Month")
def _f_Month(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return _pad(_MON_NAMES[ts.mo - 1], 9, fm)


@_dch("month")
def _f_month(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return _pad(_MON_NAMES[ts.mo - 1].lower(), 9, fm)


@_dch("MON")
def _f_MON(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return _MON_NAMES[ts.mo - 1][:3].upper()


@_dch("Mon")
def _f_Mon(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return _MON_NAMES[ts.mo - 1][:3]


@_dch("mon")
def _f_mon(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return _MON_NAMES[ts.mo - 1][:3].lower()


@_dch("RM")
def _f_RM(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return _pad(_RM[ts.mo - 1], 4, fm)


@_dch("rm")
def _f_rm(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return _pad(_RM[ts.mo - 1].lower(), 4, fm)


@_dch("Y,YYY")
def _f_YcYYY(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    s = f"{disp:04d}"
    return f"{s[:-3]},{s[-3:]}"


@_dch("YYYY")
def _f_YYYY(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return _n(disp, 4, fm)


@_dch("YYY")
def _f_YYY(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return str(disp % 1000) if fm else f"{disp % 1000:03d}"


@_dch("YY")
def _f_YY(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return str(disp % 100) if fm else f"{disp % 100:02d}"


@_dch("IYYY")
def _f_IYYY(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return _n(isoy, 4, fm)


@_dch("IYY")
def _f_IYY(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return str(isoy % 1000) if fm else f"{isoy % 1000:03d}"


@_dch("IY")
def _f_IY(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return str(isoy % 100) if fm else f"{isoy % 100:02d}"


@_dch("IW")
def _f_IW(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return _n(iw, 2, fm)


@_dch("IDDD")
def _f_IDDD(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return _n(iddd, 3, fm)


@_dch("ID")
def _f_ID(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return str(wd + 1)


@_dch("I")
def _f_I(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return str(isoy % 10)


@_dch("Y")
def _f_Y(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return str(disp % 10)


@_dch("CC")
def _f_CC(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    c = (disp + 99) // 100
    if ts.y < 1:
        c = -c
    return _n(c, 2, fm) if c >= 0 else str(c)


@_dch("Q")
def _f_Q(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return str((ts.mo - 1) // 3 + 1)


@_dch("MM")
def _f_MM(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return _n(ts.mo, 2, fm)


@_dch("WW")
def _f_WW(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return _n((doy - 1) // 7 + 1, 2, fm)


@_dch("W")
def _f_W(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return str((ts.d - 1) // 7 + 1)


@_dch("DDD")
def _f_DDD(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return _n(doy, 3, fm)


@_dch("DD")
def _f_DD(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return _n(ts.d, 2, fm)


@_dch("D")
def _f_D(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return str((wd + 1) % 7 + 1)


@_dch("J")
def _f_J(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return str(jd)


@_dch("HH24")
def _f_HH24(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return _n(ts.hh, 2, fm)


@_dch("HH12")
def _f_HH12(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return _n(ts.hh % 12 or 12, 2, fm)


@_dch("HH")
def _f_HH(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return _n(ts.hh % 12 or 12, 2, fm)


@_dch("MI")
def _f_MI(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return _n(ts.mi, 2, fm)


@_dch("SSSS")
def _f_SSSS(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return str(ts.hh * 3600 + ts.mi * 60 + ts.ss)


@_dch("SS")
def _f_SS(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return _n(ts.ss, 2, fm)


@_dch("MS")
def _f_MS(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return f"{ts.us // 1000:03d}"


@_dch("US")
def _f_US(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return f"{ts.us:06d}"


@_dch("A.D.")
def _f_AD(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return "B.C." if ts.era_bc else "A.D."


@_dch("a.d.")
def _f_ad(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return "b.c." if ts.era_bc else "a.d."


@_dch("AD")
def _f_AD2(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return "BC" if ts.era_bc else "AD"


@_dch("ad")
def _f_ad2(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return "bc" if ts.era_bc else "ad"


@_dch("BC")
def _f_BC(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return "BC" if ts.era_bc else "AD"


@_dch("bc")
def _f_bc(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return "bc" if ts.era_bc else "ad"


@_dch("B.C.")
def _f_BCdot(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return "B.C." if ts.era_bc else "A.D."


@_dch("b.c.")
def _f_bcdot(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return "b.c." if ts.era_bc else "a.d."


@_dch("P.M.")
def _f_PM(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return "P.M." if ts.hh >= 12 else "A.M."


@_dch("p.m.")
def _f_pm(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return "p.m." if ts.hh >= 12 else "a.m."


@_dch("A.M.")
def _f_AM(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return "P.M." if ts.hh >= 12 else "A.M."


@_dch("a.m.")
def _f_am(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return "p.m." if ts.hh >= 12 else "a.m."


@_dch("PM")
def _f_PM2(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return "PM" if ts.hh >= 12 else "AM"


@_dch("pm")
def _f_pm2(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return "pm" if ts.hh >= 12 else "am"


@_dch("AM")
def _f_AM2(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return "PM" if ts.hh >= 12 else "AM"


@_dch("am")
def _f_am2(ts, wd, disp, doy, jd, iw, iddd, isoy, fm):
    return "pm" if ts.hh >= 12 else "am"


# TH/th handled as a postfix over the PRECEDING numeric output
def _apply_th(out_piece: str, upper: bool) -> str:
    m = re.search(r"(\d+)$", out_piece)
    if not m:
        return out_piece
    sfx = _ordsuffix(int(m.group(1)))
    return out_piece + (sfx.upper() if upper else sfx)


def register_ts_udfs(spark) -> None:
    if getattr(spark, "_pg_ts_registered", False):
        return
    import os

    from pyspark.sql.types import (DoubleType, LongType, StringType)

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    def wrap(fn_name):
        def wrapped(*args):
            import sys
            if repo not in sys.path:
                sys.path.insert(0, repo)
            from gpdb_spark.functions import pg_timestamp as m
            return getattr(m, fn_name)(*args)
        return wrapped

    spark.udf.register("pg_ts_canon", wrap("ts_canon"), StringType())
    spark.udf.register("pg_ts_key", wrap("ts_key"), LongType())
    spark.udf.register("pg_ts_sub", wrap("ts_sub"), StringType())
    spark.udf.register("pg_ts_part", wrap("ts_part"), DoubleType())
    spark.udf.register("pg_ts_tochar", wrap("ts_tochar"),
                       StringType())
    spark._pg_ts_registered = True
