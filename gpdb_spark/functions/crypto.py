"""pgcrypto HMAC (reference: contrib/pgcrypto/pgp-mdc.c /
px-hmac.c `px_hmac_create`; SQL surface `hmac(data, key, type)` in
contrib/pgcrypto/pgcrypto.c:180 pg_hmac).

HMAC(K, m) = H((K' xor opad) || H((K' xor ipad) || m))  [RFC 2104]

The key-derived pads are *constants* for a fixed key, so the whole
construction compiles to JVM built-ins — two hash invocations over
binary concat with literal pad prefixes — and stays inside whole-stage
codegen: no Python in the loop, no UDF. Key preprocessing (hash keys
longer than the block, zero-pad to block size, xor with 0x36/0x5c)
happens driver-side in Python at plan-build time, exactly like a
planner constant-folding the key expression.

Digest coverage mirrors what Spark ships JVM-side: md5, sha1,
sha2-224/256/384/512 (pgcrypto's px_find_digest list minus the
OpenSSL-only extras)."""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

_BLOCK = 64  # md5/sha1/sha256 block size; sha384/512 use 128


def _pads(key: bytes, algo: str) -> tuple[bytes, bytes]:
    block = 128 if algo in ("sha384", "sha512") else _BLOCK
    if len(key) > block:
        key = hashlib.new(algo, key).digest()
    key = key.ljust(block, b"\x00")
    ipad = bytes(b ^ 0x36 for b in key)
    opad = bytes(b ^ 0x5C for b in key)
    return ipad, opad


def _digest(data: Column, algo: str) -> Column:
    """Hex digest of a binary column via the JVM builtin for ``algo``."""
    if algo == "md5":
        return F.md5(data)
    if algo == "sha1":
        return F.sha1(data)
    if algo.startswith("sha"):
        return F.lower(F.sha2(data, int(algo[3:])))
    raise ValueError(f"unsupported hmac digest: {algo}")


def hmac_hex(data: Column, key: bytes | str, algo: str = "sha256") -> Column:
    """encode(hmac(data, key, algo), 'hex') — pgcrypto's hmac() with the
    hex encoding PG users wrap it in. ``data`` may be string or binary;
    the key is a Python constant (the common case: one signing key per
    job), folded into literal pads."""
    if isinstance(key, str):
        key = key.encode()
    ipad, opad = _pads(key, algo)
    inner = F.unhex(_digest(F.concat(F.lit(ipad), data.cast("binary")), algo))
    return _digest(F.concat(F.lit(opad), inner), algo)


def reference_hmac_hex(data: bytes | str, key: bytes | str, algo: str) -> str:
    """Ground-truth HMAC via Python's independent stdlib implementation
    (RFC 2104), used to generate oracle constants and to pin the RFC
    2202/4231 test vectors in tests. (A pure-SQL DuckDB oracle is not
    possible: its md5/sha256 only accept VARCHAR, and HMAC's outer hash
    consumes raw digest bytes.)"""
    import hmac as _hmac

    if isinstance(data, str):
        data = data.encode()
    if isinstance(key, str):
        key = key.encode()
    return _hmac.new(key, data, algo).hexdigest()
