"""pgcrypto password hashing and symmetric encryption.

``crypt()`` / ``gen_salt()`` (reference: contrib/pgcrypto/pgcrypto.c
pg_crypt / pg_gen_salt, contrib/pgcrypto/crypt-md5.c) — the MD5-crypt
scheme (``$1$salt$hash``, Poul-Henning Kamp's public algorithm, the
same one glibc ships). Password hashing is *deliberately* CPU-bound
per row (1000 chained MD5 rounds — key stretching), so there is no
JVM-builtin formulation; the Spark shape is an Arrow-batched pandas
UDF: vectorized transfer, hashlib (C) per row, no shuffle — the right
plan for the auth-table scale this operator serves. DES/Blowfish
schemes (crypt-des.c / crypt-blowfish.c) are documented out of scope:
they need full cipher implementations with no JVM builtin and their
security value over md5-crypt is moot for an analytics engine.

``pgp_sym_encrypt`` / ``pgp_sym_decrypt`` (reference:
contrib/pgcrypto/pgp-encrypt.c, pgp-decrypt.c, pgp-s2k.c) — the
Spark-first re-expression: OpenPGP's iterated-salted S2K key
derivation (pgp-s2k.c calc_s2k_iter_salted: hash over repeated
salt||passphrase until the octet count is consumed) feeds Spark's
JVM-builtin ``aes_encrypt``/``aes_decrypt`` in GCM mode (random
96-bit IV per row, IV || ciphertext || tag layout — authenticated
encryption, stronger than PGP's CFB+MDC). The salt is a per-call
constant folded into the key at plan-build time (PG stores a random
per-row salt inside the OpenPGP packet; carrying one per row would
put key derivation in the row loop for no analytical benefit — the
difference is documented, not hidden). Everything stays inside
whole-stage codegen; no Python in the encrypt/decrypt path.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_ITOA64 = "./0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"


def _to64(v: int, n: int) -> str:
    """crypt's base64 variant: low 6 bits first (crypt-md5.c to64)."""
    out = []
    for _ in range(n):
        out.append(_ITOA64[v & 0x3F])
        v >>= 6
    return "".join(out)


def md5_crypt(password: str | bytes, salt: str | bytes) -> str:
    """Pure-Python reference MD5-crypt (crypt-md5.c px_crypt_md5),
    independent ground truth for the oracle and tests. ``salt`` must
    carry the '$1$' scheme prefix — '$1$salt' or a full '$1$salt$hash'
    (the standard crypt verify idiom: crypt(pw, stored) == stored).
    Bare salts raise: PG routes them to DES crypt (px-crypt.c), and
    hashing them under md5-crypt here would silently diverge."""
    pw = password.encode() if isinstance(password, str) else password
    s = salt.decode() if isinstance(salt, bytes) else salt
    if s.startswith("$") and not s.startswith("$1$"):
        # bcrypt ($2a$...), sha-crypt ($5$/$6$), etc.: refuse loudly —
        # silently hashing under the wrong scheme would make the verify
        # idiom reject CORRECT passwords with no diagnostic
        raise ValueError(
            f"crypt scheme {s.split('$')[1]!r} not supported: only the "
            "$1$ (md5-crypt) scheme is implemented (crypt-md5.c); "
            "DES/Blowfish/sha-crypt are documented out of scope"
        )
    if s.startswith("$1$"):
        s = s[3:]
    else:
        # PG routes EVERY bare salt (no '$' prefix) to traditional DES
        # crypt, which uses only the first 2 chars regardless of length
        # (px-crypt.c px_crypt) — so crypt(pw, 'abcdefgh') is a DES hash
        # in PG. Hashing it under md5-crypt here would be exactly the
        # silent wrong-scheme divergence the guard above exists to stop.
        raise ValueError(
            "bare salts select DES crypt (px-crypt.c, crypt-des.c) — "
            "not implemented; use gen_salt('md5') / a '$1$' salt"
        )
    s = s.split("$", 1)[0][:8]
    sb = s.encode()

    m = hashlib.md5(pw + b"$1$" + sb)
    mixin = hashlib.md5(pw + sb + pw).digest()
    for i in range(len(pw)):
        m.update(mixin[i % 16 : i % 16 + 1])
    i = len(pw)
    while i:
        m.update(b"\x00" if i & 1 else pw[0:1])
        i >>= 1
    final = m.digest()
    for r in range(1000):
        m2 = hashlib.md5()
        m2.update(pw if r & 1 else final)
        if r % 3:
            m2.update(sb)
        if r % 7:
            m2.update(pw)
        m2.update(final if r & 1 else pw)
        final = m2.digest()
    out = []
    for a, b, c in ((0, 6, 12), (1, 7, 13), (2, 8, 14), (3, 9, 15), (4, 10, 5)):
        out.append(_to64((final[a] << 16) | (final[b] << 8) | final[c], 4))
    out.append(_to64(final[11], 2))
    return f"$1${s}$" + "".join(out)


def crypt_batch_udf():
    """THE crypt pandas UDF — the single implementation behind both the
    Column API (``crypt``) and the SQL registration
    (sql_registry ``spark.udf.register("crypt", ...)``), so the two
    surfaces cannot drift. Built per call because pandas_udf requires
    an active session at decoration time."""

    @pandas_udf("string")
    def _crypt_batch(pw: pd.Series, s: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if p is None or sa is None else md5_crypt(p, sa)
                for p, sa in zip(pw, s)
            ]
        )

    return _crypt_batch


def crypt(password: Column | str, salt: Column | str) -> Column:
    """pgcrypto crypt(password, salt) for the '$1$' (md5-crypt) scheme.
    Verify idiom: ``crypt(pw, stored_hash) == stored_hash``. Arrow-
    batched pandas UDF."""
    p = F.col(password) if isinstance(password, str) else password
    s = F.col(salt) if isinstance(salt, str) else salt
    return crypt_batch_udf()(p, s)


def crypt_and_verify(password: Column | str, salt: Column | str) -> Column:
    """``struct<hashed, verify_ok>``: crypt() plus the standard verify
    idiom re-hash (crypt(pw, hashed) == hashed) in ONE pandas-UDF pass.

    r11 (guide §4.1): hash-then-verify spelled as two ``crypt`` Columns
    plans as two SEQUENTIAL ArrowEvalPython stages (the second's input
    depends on the first's output), paying the Python-worker round trip
    twice. Both calls run the same md5_crypt, so one batch pass computes
    the pair — same values, one Python stage."""
    p = F.col(password) if isinstance(password, str) else password
    s = F.col(salt) if isinstance(salt, str) else salt

    @pandas_udf("hashed string, verify_ok boolean")
    def _crypt_verify(pw: pd.Series, sa: pd.Series) -> pd.DataFrame:
        hashed, ok = [], []
        for p_, s_ in zip(pw, sa):
            if p_ is None or s_ is None:
                hashed.append(None)
                ok.append(None)
            else:
                h = md5_crypt(p_, s_)
                hashed.append(h)
                ok.append(md5_crypt(p_, h) == h)
        return pd.DataFrame({"hashed": hashed, "verify_ok": ok})

    return _crypt_verify(p, s)


def gen_salt_md5(seed: Column | None = None) -> Column:
    """pgcrypto gen_salt('md5') (crypt-gensalt.c _crypt_gensalt_md5_rn):
    '$1$' + 8 chars of the ./0-9A-Za-z alphabet. Default is
    nondeterministic (F.rand-backed, like PG's strong random); pass a
    ``seed`` column for a reproducible salt stream (md5-derived — the
    repo's portable-hash doctrine) so tests and oracles can pin salts."""
    if seed is None:
        r = F.md5(F.concat_ws(":", F.rand().cast("string"), F.rand().cast("string")))
    else:
        r = F.md5(seed.cast("string"))
    # 8 salt chars from 8 hex pairs: index = byte & 0x3f
    chars = [
        F.substring(
            F.lit(_ITOA64),
            (F.conv(F.substring(r, 1 + 2 * i, 2), 16, 10).cast("int") % 64) + 1,
            1,
        )
        for i in range(8)
    ]
    return F.concat(F.lit("$1$"), *chars)


# --------------------------------------------------------------------------
# pgp_sym_encrypt / pgp_sym_decrypt
# --------------------------------------------------------------------------

def s2k_key(passphrase: str | bytes, salt: bytes, count: int = 65536) -> bytes:
    """OpenPGP iterated-salted S2K (RFC 4880 §3.7.1.3; pgp-s2k.c
    calc_s2k_iter_salted): SHA-256 over (salt || passphrase) repeated
    until ``count`` octets are consumed; first 32 digest bytes = AES key.
    Computed once driver-side per call — a planner constant."""
    pw = passphrase.encode() if isinstance(passphrase, str) else passphrase
    block = salt + pw
    if count < len(block):
        count = len(block)
    h = hashlib.sha256()
    full, rem = divmod(count, len(block))
    h.update(block * full + block[:rem])
    return h.digest()


def pgp_sym_encrypt(
    data: Column | str, passphrase: str, salt: bytes = b"gpdb-spark"
) -> Column:
    """AES-256-GCM encrypt under the S2K-derived key; returns base64
    text (PG returns bytea — base64 is its canonical text transport via
    armor()/encode()). Random IV per row: ciphertexts are
    nondeterministic by design, like PG's."""
    d = F.col(data) if isinstance(data, str) else data
    key = s2k_key(passphrase, salt)
    return F.base64(
        F.aes_encrypt(d.cast("binary"), F.lit(key), F.lit("GCM"))
    )


def pgp_sym_decrypt(
    data: Column | str, passphrase: str, salt: bytes = b"gpdb-spark"
) -> Column:
    """Inverse of pgp_sym_encrypt; wrong passphrase fails the GCM tag
    (authenticated — PG's MDC check equivalent). Returns text."""
    d = F.col(data) if isinstance(data, str) else data
    key = s2k_key(passphrase, salt)
    return F.aes_decrypt(F.unbase64(d), F.lit(key), F.lit("GCM")).cast(
        "string"
    )


# --------------------------------------------------------------------------
# armor / dearmor (OpenPGP radix-64, RFC 4880 §6; pgp-armor.c)
# --------------------------------------------------------------------------

_CRC24_INIT = 0xB704CE
_CRC24_POLY = 0x1864CFB


def crc24(data: bytes) -> int:
    """OpenPGP CRC-24 (RFC 4880 §6.1; pgp-armor.c crc24) — reference
    implementation for the armor checksum line and the test vectors."""
    crc = _CRC24_INIT
    for b in data:
        crc ^= b << 16
        for _ in range(8):
            crc <<= 1
            if crc & 0x1000000:
                crc ^= _CRC24_POLY
    return crc & 0xFFFFFF


def armor(data: Column | str) -> Column:
    """pgcrypto armor(bytea): BEGIN/END PGP MESSAGE lines around the
    76-char-wrapped radix-64 body plus the '=XXXX' CRC-24 line.

    Spark shape: the body is pure JVM (base64 + a regexp line-wrap in
    codegen); ONLY the 3 CRC bytes go through an Arrow-batched pandas
    UDF (no JVM builtin exists for CRC-24) — the heavy part of the
    payload never leaves the JVM."""
    d = F.col(data) if isinstance(data, str) else data
    d = d.cast("binary")

    @pandas_udf("string")
    def _crc_b64(raw: pd.Series) -> pd.Series:
        import base64 as b64

        return pd.Series(
            [
                None
                if v is None
                else b64.b64encode(crc24(bytes(v)).to_bytes(3, "big")).decode()
                for v in raw
            ]
        )

    # Spark's base64 is the MIME codec: it already chunks at 76 with
    # \r\n — strip that, then apply the armor's own \n wrap
    b64 = F.regexp_replace(F.base64(d), "\r\n", "")
    body = F.regexp_replace(b64, "(.{76})", "$1\n")
    # when the body length is an exact multiple of 76 the wrap regex
    # leaves a trailing newline — strip it (NB Spark's rtrim removes
    # spaces only, so this must be a regexp)
    body = F.regexp_replace(body, "\n$", "")
    return F.concat(
        F.lit("-----BEGIN PGP MESSAGE-----\n\n"),
        body,
        F.lit("\n="),
        _crc_b64(d),
        F.lit("\n-----END PGP MESSAGE-----\n"),
    )


def dearmor(data: Column | str) -> Column:
    """pgcrypto dearmor(text) -> bytea: strip the armor frame and
    checksum line, decode the radix-64 body. (CRC verification is
    golden-tested via crc24(); like PG, the common read path trusts
    the frame.)"""
    d = F.col(data) if isinstance(data, str) else data
    # line-anchored strip: the -----...----- frame lines, then the
    # '=XXXX' CRC line (exactly 5 chars — a base64 body line can start
    # with '=' only as 1-2 padding chars, never 5), then all whitespace
    body = F.regexp_replace(d, r"(?m)^-----[^\n]*-----$", "")
    body = F.regexp_replace(body, r"(?m)^=[A-Za-z0-9+/=]{4}$", "")
    return F.unbase64(F.regexp_replace(body, r"\s", ""))
