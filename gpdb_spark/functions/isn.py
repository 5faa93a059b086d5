"""isn — EAN13/ISBN product-number check digits (reference:
contrib/isn/isn.c `checkdig` (EAN13, mod-10 with 3-weighting) and
`weight_checkdig` (ISBN10, mod-11 positional weights)).

All pure JVM higher-order-function expressions over the digit string —
codegen-resident, zero Python, zero shuffle. Validation rejects
malformed input (wrong length / non-digits) as invalid rather than
erroring, matching the type-input behavior users see via `::ean13`
casts failing softly in `isn_weak` mode.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _digit_sum_ean(digits: Column, n: int) -> Column:
    """sum over first n chars: digit * (1 if even position else 3) —
    isn.c checkdig's check + 3*check3 accumulation (0-based pos)."""
    return F.aggregate(
        F.zip_with(
            F.slice(F.split(digits, ""), 1, n),
            F.sequence(F.lit(0), F.lit(n - 1)),
            lambda c, i: (F.ascii(c) - 48)
            * F.when(i % 2 == 0, F.lit(1)).otherwise(F.lit(3)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def ean13_check_digit(digits12: Column | str) -> Column:
    """Check digit (0-9) for a 12-digit EAN body (isn.c checkdig):
    (10 - weighted-sum mod 10) mod 10."""
    d = F.col(digits12) if isinstance(digits12, str) else digits12
    s = _digit_sum_ean(d, 12)
    return (10 - s % 10) % 10


def is_valid_ean13(ean: Column | str) -> Column:
    """Validate a full 13-digit EAN13 string (length, digits-only,
    check digit)."""
    e = F.col(ean) if isinstance(ean, str) else ean
    well_formed = e.rlike("^[0-9]{13}$")
    check = ean13_check_digit(F.substring(e, 1, 12))
    return F.when(
        well_formed, F.substring(e, 13, 1) == check.cast("string")
    ).otherwise(F.lit(False))


def isbn10_check_digit(digits9: Column | str) -> Column:
    """Check char ('0'-'9' or 'X') for a 9-digit ISBN body
    (isn.c weight_checkdig): weights 10..2, mod 11, 11-w, 10 -> 'X'."""
    d = F.col(digits9) if isinstance(digits9, str) else digits9
    s = F.aggregate(
        F.zip_with(
            F.slice(F.split(d, ""), 1, 9),
            F.sequence(F.lit(10), F.lit(2)),
            lambda c, w: (F.ascii(c) - 48) * w,
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    w = (11 - s % 11) % 11
    return F.when(w == 10, F.lit("X")).otherwise(w.cast("string"))


def is_valid_isbn10(isbn: Column | str) -> Column:
    i = F.col(isbn) if isinstance(isbn, str) else isbn
    well_formed = i.rlike("^[0-9]{9}[0-9X]$")
    return F.when(
        well_formed,
        F.substring(i, 10, 1) == isbn10_check_digit(F.substring(i, 1, 9)),
    ).otherwise(F.lit(False))


def isbn13_from_isbn10(isbn10: Column | str) -> Column:
    """ISBN10 -> ISBN13 (Bookland '978' prefix + EAN13 check digit) —
    isn.c's ISBN<->EAN13 hyphenation-free conversion."""
    i = F.col(isbn10) if isinstance(isbn10, str) else isbn10
    body12 = F.concat(F.lit("978"), F.substring(i, 1, 9))
    return F.concat(body12, ean13_check_digit(body12).cast("string"))
