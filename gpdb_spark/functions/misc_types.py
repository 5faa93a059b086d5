"""Misc PG type helpers: pg_size_pretty, IPv4 inet/cidr, bit strings.

Closing the SURVEY.md §2.9 "misc" tail with the practically-used subset:

- ``pg_size_pretty`` follows dbsize.c's exact halving algorithm
  (10*1024 threshold, >>9 then >>10 per unit, round-half-up via
  (size+1)/2), so outputs match PG byte-for-byte.
- inet/cidr (network.c) modeled on IPv4 as dotted-quad strings with an
  optional /masklen; address arithmetic runs on the packed uint32 —
  pure JVM expressions (codegen), no UDF.
- bit strings (varbit.c) modeled as (bits bigint, len<=64): the PG
  operators & | # ~ << >> plus get_bit/set_bit, with results masked to
  the declared length like varbit enforces.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# pg_size_pretty (src/backend/utils/adt/dbsize.c)
# ---------------------------------------------------------------------------

def pg_size_pretty(size: Column) -> Column:
    """bytes -> 'N bytes' / 'N kB' / 'N MB' / 'N GB' / 'N TB' with PG's
    exact thresholds and round-half-up."""
    limit = 10 * 1024
    b = size.cast("long")
    kb = F.shiftright(b, 9)  # size in half-kB units
    mb = F.shiftright(kb, 10)
    gb = F.shiftright(mb, 10)
    tb = F.shiftright(gb, 10)

    def half_up(c: Column) -> Column:
        return F.shiftright(c + 1, 1)

    return (
        F.when(F.abs(b) < limit, F.concat(b.cast("string"), F.lit(" bytes")))
        .when(
            F.abs(kb) < limit * 2,
            F.concat(half_up(kb).cast("string"), F.lit(" kB")),
        )
        .when(
            F.abs(mb) < limit * 2,
            F.concat(half_up(mb).cast("string"), F.lit(" MB")),
        )
        .when(
            F.abs(gb) < limit * 2,
            F.concat(half_up(gb).cast("string"), F.lit(" GB")),
        )
        .otherwise(F.concat(half_up(tb).cast("string"), F.lit(" TB")))
    )


# ---------------------------------------------------------------------------
# inet / cidr on IPv4 (src/backend/utils/adt/network.c)
# ---------------------------------------------------------------------------

def _addr_part(inet: Column) -> Column:
    return F.substring_index(inet, "/", 1)


def inet_masklen(inet: Column) -> Column:
    """masklen('10.0.0.0/24') = 24; bare addresses default to /32."""
    return F.when(
        inet.contains("/"),
        F.substring_index(inet, "/", -1).cast("int"),
    ).otherwise(F.lit(32))


def inet_host(inet: Column) -> Column:
    """host(inet): the address with any netmask stripped."""
    return _addr_part(inet)


def inet_to_long(inet: Column) -> Column:
    """Packed uint32 of the (host part of the) address."""
    a = F.split(_addr_part(inet), "\\.")
    return (
        F.element_at(a, 1).cast("long") * 16777216
        + F.element_at(a, 2).cast("long") * 65536
        + F.element_at(a, 3).cast("long") * 256
        + F.element_at(a, 4).cast("long")
    )


def long_to_inet(v: Column) -> Column:
    """Dotted-quad text of a packed uint32."""
    return F.concat_ws(
        ".",
        F.shiftright(v, 24).bitwiseAND(F.lit(255)).cast("string"),
        F.shiftright(v, 16).bitwiseAND(F.lit(255)).cast("string"),
        F.shiftright(v, 8).bitwiseAND(F.lit(255)).cast("string"),
        v.bitwiseAND(F.lit(255)).cast("string"),
    )


def _host_span(masklen: Column) -> Column:
    """2^(32-masklen) as a long (exact in double up to 2^32)."""
    return F.pow(F.lit(2.0), (F.lit(32) - masklen).cast("double")).cast(
        "long"
    )


def _mask_of(masklen: Column) -> Column:
    """uint32 netmask for a prefix length (0..32). Shift amounts must be
    Python ints in Spark's shiftleft, so the variable-length mask is
    built from an exact power of two instead."""
    return F.when(masklen <= 0, F.lit(0)).otherwise(
        F.lit(4294967296) - _host_span(masklen)
    )


def inet_network(inet: Column) -> Column:
    """network('10.1.2.3/24') = '10.1.2.0/24' (truncate to the prefix)."""
    ml = inet_masklen(inet)
    net = inet_to_long(inet).bitwiseAND(_mask_of(ml))
    return F.concat(long_to_inet(net), F.lit("/"), ml.cast("string"))


def inet_contained_in(addr: Column, cidr: Column) -> Column:
    """PG ``addr << cidr`` (is-contained-by, strict): the address falls
    inside the network and the address's prefix is LONGER than the
    network's (network.c network_sub)."""
    ml = inet_masklen(cidr)
    same_net = inet_to_long(addr).bitwiseAND(_mask_of(ml)) == inet_to_long(
        cidr
    ).bitwiseAND(_mask_of(ml))
    return same_net & (inet_masklen(addr) > ml)


def inet_broadcast(inet: Column) -> Column:
    """broadcast('10.1.0.0/16') = '10.1.255.255/16'."""
    ml = inet_masklen(inet)
    bc = inet_to_long(inet).bitwiseAND(_mask_of(ml)) + F.when(
        ml >= 32, F.lit(0)
    ).otherwise(_host_span(ml) - 1)
    return F.concat(long_to_inet(bc), F.lit("/"), ml.cast("string"))


# ---------------------------------------------------------------------------
# uuid (src/backend/utils/adt/uuid.c; uuid-ossp uuid_generate_v3)
# ---------------------------------------------------------------------------

def uuid_v3(name: Column) -> Column:
    """Name-based (md5) UUID, RFC 4122 version 3 — deterministic, so
    reproducible across engines/runs (unlike gen_random_uuid): md5 hex
    re-punctuated 8-4-4-4-12 with the version nibble forced to '3' and
    the variant nibble to one of 89ab. The variant mapping uses a
    string-position lookup instead of hex parsing so the identical
    expression runs on any SQL engine."""
    h = F.md5(name.cast("string"))
    variant = F.substring(
        F.lit("89ab89ab89ab89ab"),
        F.instr(F.lit("0123456789abcdef"), F.substring(h, 17, 1)),
        1,
    )
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.concat(F.lit("3"), F.substring(h, 14, 3)),
        F.concat(variant, F.substring(h, 18, 3)),
        F.substring(h, 21, 12),
    )


def is_uuid(c: Column) -> Column:
    """uuid_in validation (uuid.c) as a boolean."""
    return c.rlike(
        "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
        "-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
    )


# ---------------------------------------------------------------------------
# bit strings (src/backend/utils/adt/varbit.c) — (bits bigint, len<=64)
# ---------------------------------------------------------------------------

def _bit_mask(length: int) -> Column:
    if not 1 <= length <= 63:
        raise ValueError("bit string length must be 1..63")
    return F.lit((1 << length) - 1)


def bit_and(a: Column, b: Column, length: int) -> Column:
    return a.bitwiseAND(b).bitwiseAND(_bit_mask(length))


def bit_or(a: Column, b: Column, length: int) -> Column:
    return a.bitwiseOR(b).bitwiseAND(_bit_mask(length))


def bit_xor(a: Column, b: Column, length: int) -> Column:
    """PG ``#`` operator."""
    return a.bitwiseXOR(b).bitwiseAND(_bit_mask(length))


def bit_not(a: Column, length: int) -> Column:
    return a.bitwiseXOR(_bit_mask(length))


def bit_shiftl(a: Column, n: int, length: int) -> Column:
    """varbit << drops bits shifted past the declared length."""
    return F.shiftleft(a, n).bitwiseAND(_bit_mask(length))


def bit_shiftr(a: Column, n: int, length: int) -> Column:
    return F.shiftright(a.bitwiseAND(_bit_mask(length)), n)


def get_bit(a: Column, i: int, length: int) -> Column:
    """get_bit: index 0 is the LEFTMOST bit of the declared width
    (varbit.c bitgetbit)."""
    return F.shiftright(a, length - 1 - i).bitwiseAND(F.lit(1)).cast("int")


def set_bit(a: Column, i: int, v: int, length: int) -> Column:
    pos = length - 1 - i
    cleared = a.bitwiseAND(F.lit(((1 << length) - 1) ^ (1 << pos)))
    return cleared.bitwiseOR(F.lit(v << pos))


def bit_to_string(a: Column, length: int) -> Column:
    """Render as PG's bit-string text ('10110…', fixed width)."""
    return F.lpad(F.conv(a.cast("string"), 10, 2), length, "0")


# ---------------------------------------------------------------------------
# money (src/backend/utils/adt/cash.c): fixed-point currency as int64 cents
# ---------------------------------------------------------------------------

def money_in(s: Column) -> Column:
    """cash_in: parse '$1,234.56', '-$5.00', '($5.00)' to int64 cents.
    The reference stores money as a 64-bit integer count of fractional
    units; all arithmetic is exact integer math."""
    neg = s.rlike(r"^\s*[-(]") | s.rlike(r"^\s*\$\s*-")
    digits = F.regexp_replace(s, r"[^0-9.]", "")
    cents = F.round(digits.cast("decimal(26,4)") * 100, 0).cast("long")
    return F.when(neg, -cents).otherwise(cents)


def money_out(cents: Column) -> Column:
    """cash_out: int64 cents -> '-$1,234.56' (sign before the symbol,
    comma thousands grouping, always 2 decimals)."""
    body = F.format_number(
        F.abs(cents).cast("decimal(25,2)") / 100, 2
    )
    return F.concat(
        F.when(cents < 0, F.lit("-")).otherwise(F.lit("")), F.lit("$"), body
    )


def money_mul(cents: Column, factor: Column) -> Column:
    """money * numeric (cash_mul_flt8): exact decimal multiply then
    round-half-up back to cents."""
    return (
        F.round(cents.cast("decimal(26,6)") * factor.cast("decimal(26,6)"), 0)
        .cast("long")
    )


# -- IPv6 inet (network.c AF_INET6 branch) ----------------------------------


def inet6_expand(addr: Column) -> Column:
    """Canonical 8-group zero-padded IPv6 form: '2001:db8::1' ->
    '2001:0db8:0000:0000:0000:0000:0000:0001'. The '::' gap is filled
    with the missing zero groups; each group left-pads to 4 hex digits.
    Pure array expressions (split / array_repeat / concat / transform) —
    the canonical form makes =, <, sorting and prefix operations plain
    string ops, which is how the reference's binary ip_addr compare
    behaves (network.c network_cmp_internal)."""
    a = _addr_part(addr)
    has_gap = a.contains("::")
    left = F.filter(
        F.split(F.substring_index(a, "::", 1), ":"), lambda x: x != ""
    )
    right = F.when(
        has_gap,
        F.filter(
            F.split(F.substring_index(a, "::", -1), ":"), lambda x: x != ""
        ),
    ).otherwise(F.array().cast("array<string>"))
    groups = F.when(
        has_gap,
        F.concat(
            left,
            F.array_repeat(F.lit("0"), 8 - F.size(left) - F.size(right)),
            right,
        ),
    ).otherwise(F.split(a, ":"))
    return F.array_join(
        F.transform(groups, lambda g: F.lpad(F.lower(g), 4, "0")), ":"
    )


def inet6_masklen(addr: Column) -> Column:
    return F.when(
        addr.contains("/"),
        F.substring_index(addr, "/", -1).cast("int"),
    ).otherwise(F.lit(128))


def _inet6_bits(addr: Column) -> Column:
    """128-bit binary string of the canonical address (for prefix ops)."""
    groups = F.split(inet6_expand(addr), ":")
    return F.array_join(
        F.transform(
            groups,
            lambda g: F.lpad(F.conv(g, 16, 2), 16, "0"),
        ),
        "",
    )


def inet6_contains(cidr: Column, addr: Column) -> Column:
    """``cidr >> addr`` / ``addr << cidr`` (network_sub/sup): the
    address's first masklen bits equal the network's."""
    n = inet6_masklen(cidr)
    return F.substring(_inet6_bits(cidr), 1, n) == F.substring(
        _inet6_bits(addr), 1, n
    )


def inet6_same_family(a: Column, b: Column) -> Column:
    return a.contains(":") == b.contains(":")
