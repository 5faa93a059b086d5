"""pgcrypto raw cipher functions — ``encrypt``/``decrypt``/``encrypt_iv``/
``decrypt_iv`` (reference: contrib/pgcrypto/pgcrypto.c pg_encrypt,
pg_encrypt_iv; cipher lookup px.c px_find_cipher; AES vectors
contrib/pgcrypto/expected/rijndael.out).

PG semantics re-expressed on Spark's JVM ``aes_encrypt``/``aes_decrypt``
builtins (codegen-resident, zero Python in the row loop):

- cipher spec ``aes[-mode][/pad:alg]``: mode ``cbc`` (default) or
  ``ecb``; padding ``pkcs`` (default) or ``none``.
- the key is zero-padded UP to the next supported AES length
  (16/24/32 bytes) exactly like px_find_cipher (rijndael.out "key
  padding" cases); longer than 32 raises.
- the IV defaults to all-zero bytes; ``encrypt_iv`` zero-pads or
  truncates the caller's IV to the 16-byte block size (rijndael.out
  "iv" case: 'abcd' -> 'abcd' + 12 zero bytes).
- PG returns the raw ciphertext WITHOUT an IV prefix. Spark's CBC mode
  returns ``iv || ct``, so encrypt strips the 16-byte prefix and
  decrypt re-prepends it — both as JVM ``substring``/``concat`` over
  binary, still whole-stage-codegen.
- ``pad:none`` encryption uses the PKCS identity: for input that is an
  exact block multiple, CBC/ECB-PKCS output equals the unpadded
  ciphertext plus one final full-padding block — so NONE = PKCS
  truncated by 16 bytes (matches the FIPS-197 vectors in
  rijndael.out). pad:none decryption has no such identity on the JVM
  builtin and raises NotImplementedError (documented out of scope; PG
  users roundtrip with the default pkcs).

Determinism note: with the zero (or caller-fixed) IV, ciphertexts are
byte-identical to PG's — golden-pinned against rijndael.out in
tests/test_crypto.py.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_BLOCK = 16
_KEY_SIZES = (16, 24, 32)


def _parse_cipher(spec: str) -> tuple[str, str]:
    """'aes[-mode][/pad:alg]' -> (mode, pad). Raises on non-AES algos
    (the reference also ships 3des/blowfish/cast5 — out of scope here;
    refuse loudly rather than silently produce a different scheme)."""
    s = spec.strip().lower()
    pad = "pkcs"
    if "/" in s:
        s, _, opts = s.partition("/")
        for opt in opts.split("/"):
            k, _, v = opt.partition(":")
            if k != "pad":
                raise ValueError(f"unsupported cipher option {opt!r}")
            pad = v
    algo, _, mode = s.partition("-")
    mode = mode or "cbc"
    if algo not in ("aes", "rijndael"):
        raise ValueError(
            f"cipher {algo!r} not supported (aes only; 3des/bf/cast5 are "
            "documented out of scope)"
        )
    if mode not in ("cbc", "ecb"):
        raise ValueError(f"unsupported AES mode {mode!r}")
    if pad not in ("pkcs", "none"):
        raise ValueError(f"unsupported padding {pad!r}")
    return mode, pad


def _norm_key(key: bytes | str) -> bytes:
    kb = key.encode() if isinstance(key, str) else bytes(key)
    for size in _KEY_SIZES:
        if len(kb) <= size:
            return kb.ljust(size, b"\x00")
    raise ValueError(f"AES key longer than 32 bytes ({len(kb)})")


def _norm_iv(iv: bytes | str) -> bytes:
    ib = iv.encode() if isinstance(iv, str) else bytes(iv)
    return ib[:_BLOCK].ljust(_BLOCK, b"\x00")


def _check_block_multiple(data: Column) -> Column:
    """pad:none requires block-aligned input — PG errors, so do we.
    NULL rows must pass through untouched (PG encrypt is STRICT: NULL
    in, NULL out) — without the explicit isNull arm the NULL condition
    fell to otherwise() and raise_error aborted the whole query on any
    NULL row (round-5 review finding)."""
    return (
        F.when(data.isNull(), data)
        .when(F.octet_length(data) % _BLOCK == 0, data)
        .otherwise(
            F.raise_error(
                F.lit("encrypt(pad:none): data is not a multiple of 16 bytes")
            ).cast("binary")
        )
    )


def encrypt_iv(
    data: Column, key: bytes | str, iv: bytes | str, cipher: str = "aes"
) -> Column:
    """pgcrypto encrypt_iv(data, key, iv, type) -> bytea ciphertext."""
    mode, pad = _parse_cipher(cipher)
    kb, ib = _norm_key(key), _norm_iv(iv)
    d = data.cast("binary")
    if pad == "none":
        d = _check_block_multiple(d)
    if mode == "ecb":
        ct = F.aes_encrypt(d, F.lit(kb), F.lit("ECB"), F.lit("PKCS"))
    else:
        full = F.aes_encrypt(
            d, F.lit(kb), F.lit("CBC"), F.lit("PKCS"), F.lit(ib)
        )
        # Spark CBC output is iv || ct; PG returns ct only
        ct = full.substr(F.lit(_BLOCK + 1), F.octet_length(full))
    if pad == "none":
        # PKCS adds one full padding block on aligned input; drop it
        ct = ct.substr(F.lit(1), F.octet_length(ct) - _BLOCK)
    return ct


def encrypt(data: Column, key: bytes | str, cipher: str = "aes") -> Column:
    """pgcrypto encrypt(data, key, type): zero IV (pgcrypto.c pg_encrypt
    routes to the same cipher with an all-zero IV)."""
    return encrypt_iv(data, key, b"", cipher)


def decrypt_iv(
    data: Column, key: bytes | str, iv: bytes | str, cipher: str = "aes"
) -> Column:
    """pgcrypto decrypt_iv(data, key, iv, type) -> bytea plaintext."""
    mode, pad = _parse_cipher(cipher)
    if pad == "none":
        raise NotImplementedError(
            "decrypt(pad:none) is out of scope: the JVM builtin always "
            "strips PKCS padding; see module docstring"
        )
    kb, ib = _norm_key(key), _norm_iv(iv)
    d = data.cast("binary")
    if mode == "ecb":
        return F.aes_decrypt(d, F.lit(kb), F.lit("ECB"), F.lit("PKCS"))
    return F.aes_decrypt(
        F.concat(F.lit(ib), d), F.lit(kb), F.lit("CBC"), F.lit("PKCS")
    )


def decrypt(data: Column, key: bytes | str, cipher: str = "aes") -> Column:
    """pgcrypto decrypt(data, key, type): zero IV."""
    return decrypt_iv(data, key, b"", cipher)
