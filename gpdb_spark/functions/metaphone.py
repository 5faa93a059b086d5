"""Metaphone phonetic codes (reference: contrib/fuzzystrmatch
metaphone — Michael Kuhn's implementation of Lawrence Philips' 1990
algorithm; fuzzystrmatch.c `metaphone`).

The transformation rules are context-sensitive over a sliding window
(previous/next characters, word position), which does not decompose
into Spark column expressions the way soundex did — so the reference
implementation is plain Python, applied as an Arrow-batched pandas UDF
(``metaphone_udf``). This is the rare contrib function where leaving
codegen is the honest trade; it is not in any benched path, and the
UDF is vectorized per batch, not per row.

Rule set (Philips 1990, as in the reference's metaphone.c):

- initial exceptions: AE-/GN-/KN-/PN-/WR- drop the first letter,
  X- -> S, WH- -> W
- vowels are emitted only as the first character
- B silent after M (-MB-); C -> X before IA/H (except -SCH- -> K),
  S before I/E/Y, else K; D -> J before GE/GY/GI, else T;
  G silent in -GH- (when GH is not followed by a vowel) and -GN(ED),
  J before I/E/Y else K; H silent after vowel with no following vowel
  and after C/S/P/T/G; K silent after C; P -> F in PH; Q -> K;
  S -> X before H/IO/IA; T -> X before IO/IA, 0 (theta) in TH,
  silent in -TCH-; V -> F; W/Y silent unless followed by a vowel;
  X -> KS; Z -> S; adjacent duplicate letters collapse (except C).
"""

# NOTE: no `from __future__ import annotations` here — pandas_udf
# resolves the pd.Series type hints at decoration time, and stringified
# annotations with a function-local pandas import break that.
import pandas as pd

VOWELS = "AEIOU"


def metaphone(word: str, max_len: int = 4) -> str:
    """Pure-Python reference Metaphone, the per-word transcription."""
    w = "".join(ch for ch in word.upper() if ch.isalpha())
    if not w:
        return ""
    # initial-pair exceptions
    if w[:2] in ("AE", "GN", "KN", "PN", "WR"):
        w = w[1:]
    elif w[0] == "X":
        w = "S" + w[1:]
    elif w[:2] == "WH":
        w = "W" + w[2:]

    out: list[str] = []
    n = len(w)
    i = 0
    while i < n and len(out) < max_len:
        c = w[i]
        # '~' sentinel: never matches a letter class ('' would — the
        # empty string is "in" every string)
        prev = w[i - 1] if i > 0 else "~"
        nxt = w[i + 1] if i + 1 < n else "~"
        nxt2 = w[i + 2] if i + 2 < n else "~"

        # collapse adjacent duplicates (except C)
        if c == prev and c != "C":
            i += 1
            continue

        if c in VOWELS:
            if i == 0:
                out.append(c)
        elif c == "B":
            # silent after M (-MB-): dumb, thumb, gumbo — the reference's
            # documented vector metaphone('GUMBO', 4) = 'KM'
            if prev != "M":
                out.append("B")
        elif c == "C":
            if nxt == "I" and nxt2 == "A":
                out.append("X")
            elif nxt == "H":
                # -SCH- keeps the hard K; otherwise CH -> X
                out.append("K" if prev == "S" else "X")
            elif nxt in "IEY":
                out.append("S")
            else:
                out.append("K")
        elif c == "D":
            if nxt == "G" and nxt2 in "EYI":
                out.append("J")
                i += 1  # the G is consumed by the J
            else:
                out.append("T")
        elif c == "G":
            if nxt == "H":
                # GH silent unless followed by a vowel (night, taught)
                if nxt2 in VOWELS:
                    out.append("K")
                # else silent; the H is consumed either way
                i += 1
            elif nxt == "N":
                pass  # -GN(ED): silent
            elif nxt in "IEY":
                out.append("J")
            else:
                out.append("K")
        elif c == "H":
            if prev in VOWELS and nxt not in VOWELS:
                pass  # silent after vowel with no following vowel
            elif prev in "CSPTG":
                pass  # consumed by the preceding consonant rule
            else:
                out.append("H")
        elif c == "K":
            if prev != "C":
                out.append("K")
        elif c == "P":
            if nxt == "H":
                out.append("F")
                i += 1
            else:
                out.append("P")
        elif c == "Q":
            out.append("K")
        elif c == "S":
            if nxt == "H":
                out.append("X")
                i += 1
            elif nxt == "I" and nxt2 in "OA":
                out.append("X")
            else:
                out.append("S")
        elif c == "T":
            if nxt == "I" and nxt2 in "OA":
                out.append("X")
            elif nxt == "H":
                out.append("0")  # theta
                i += 1
            elif nxt == "C" and nxt2 == "H":
                pass  # -TCH-: T silent
            else:
                out.append("T")
        elif c == "V":
            out.append("F")
        elif c in "WY":
            if nxt in VOWELS:
                out.append(c)
        elif c == "X":
            out.append("K")
            if len(out) < max_len:
                out.append("S")
        elif c == "Z":
            out.append("S")
        elif c in "FJLMNR":
            out.append(c)
        i += 1
    return "".join(out)


def metaphone_udf(max_len: int = 4):
    """Arrow-batched pandas UDF form for DataFrame use:
    ``df.select(metaphone_udf()(F.col("name")))``."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _mp(s: pd.Series) -> pd.Series:
        return s.map(lambda x: metaphone(x, max_len) if x is not None else None)

    return _mp
