"""Function-pack contribs shipped with the reference: orafce
(gpcontrib/orafce — Oracle compatibility), earthdistance
(contrib/earthdistance — great-circle distance), pgcrypto digests
(contrib/pgcrypto).

All realized as JVM expressions; see gpdb_spark/functions/orafce.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gpdb_spark.functions import orafce
from gpdb_spark.registry import fr, ofr, query, t

# DuckDB mirrors of the Oracle date rules (derivations in the orafce
# module docstrings): add_months last-day rule; months_between 31-day
# fraction with the same-day / both-last-day integer rule; next_day via
# dow arithmetic (DuckDB dayofweek: 0=Sunday ... Friday=5).
_DUCK_ADD_MONTHS = (
    "CAST(CASE WHEN d = last_day(d) THEN last_day(CAST(d + to_months(2) AS DATE)) "
    "ELSE CAST(d + to_months(2) AS DATE) END AS DATE)"
)
_DUCK_MONTHS_BETWEEN = (
    "(floor((CAST((year(DATE '1997-06-30') - year(d)) * 12 "
    "+ (month(DATE '1997-06-30') - month(d)) AS DOUBLE) "
    "+ CASE WHEN day(DATE '1997-06-30') = day(d) "
    "OR (DATE '1997-06-30' = last_day(DATE '1997-06-30') AND d = last_day(d)) "
    "THEN 0.0 ELSE (day(DATE '1997-06-30') - day(d)) / 31.0 END) * 1e8) / 1e8)"
)
_DUCK_NEXT_DAY = (
    "CAST(d + to_days(CAST(CASE WHEN (5 - dayofweek(d) + 7) % 7 = 0 THEN 7 "
    "ELSE (5 - dayofweek(d) + 7) % 7 END AS INT)) AS DATE)"
)


@query(
    "orafce_funcs",
    oracle=f"""
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'O'), 'X') AS status_nvl,
           CASE WHEN nullif(o_orderstatus, 'O') IS NOT NULL
                THEN 'closed' ELSE 'open' END AS status_nvl2,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1
                WHEN o_orderpriority = '2-HIGH' THEN 2 ELSE 0 END AS pri_decode,
           {_DUCK_ADD_MONTHS} AS plus2mo,
           CAST(last_day(d) AS DATE) AS eom,
           {_DUCK_NEXT_DAY} AS next_fri,
           {_DUCK_MONTHS_BETWEEN} AS mb,
           CAST(date_trunc('month', d) AS DATE) AS mon_trunc,
           CAST(strpos(o_orderpriority, '-') AS INT) AS dash_at,
           NOT coalesce(o_totalprice > 100000, FALSE) AS lnnvl_big,
           round(CASE WHEN isnan('NaN'::DOUBLE) THEN o_totalprice
                      ELSE 'NaN'::DOUBLE END, 2) AS nanvl_price
    FROM (SELECT *, CAST(o_orderdate AS DATE) AS d FROM orders)
    WHERE o_orderkey < 300
    """,
)
def orafce_funcs(spark, sf_dir):
    """orafce pack (gpcontrib/orafce): nvl/nvl2/decode/lnnvl/nanvl
    (others.c), add_months with the Oracle last-day rule, last_day,
    next_day, months_between, trunc(date,'MM') (datefce.c), instr
    (plvstr.c). listagg maps to the ordered string_agg discipline already
    covered by string_agg_ordered. Everything stays in whole-stage
    codegen — the one semantic delta vs Spark builtins (add_months
    last-day rule) is an explicit CASE."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 300)
    o = o.withColumn("d", F.col("o_orderdate").cast("date"))
    end = F.lit("1997-06-30").cast("date")
    return o.select(
        "o_orderkey",
        orafce.nvl(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("X")).alias(
            "status_nvl"
        ),
        orafce.nvl2(
            F.nullif(F.col("o_orderstatus"), F.lit("O")),
            F.lit("closed"),
            F.lit("open"),
        ).alias("status_nvl2"),
        orafce.decode(
            F.col("o_orderpriority"),
            F.lit("1-URGENT"), F.lit(1),
            F.lit("2-HIGH"), F.lit(2),
            F.lit(0),
        ).alias("pri_decode"),
        orafce.add_months_ora(F.col("d"), 2).alias("plus2mo"),
        F.last_day("d").alias("eom"),
        orafce.next_day(F.col("d"), "FRI").alias("next_fri"),
        fr(orafce.months_between(end, F.col("d")), 8).alias("mb"),
        F.trunc("d", "mon").alias("mon_trunc"),
        orafce.instr(F.col("o_orderpriority"), "-").cast("int").alias("dash_at"),
        orafce.lnnvl(F.col("o_totalprice") > 100000).alias("lnnvl_big"),
        F.round(
            orafce.nanvl(F.lit(float("nan")), F.col("o_totalprice")), 2
        ).alias("nanvl_price"),
    )


@query(
    "earth_distance_funcs",
    oracle="""
    WITH pts AS (
        SELECT n_nationkey, n_name,
               n_nationkey * CAST(7.3 AS DOUBLE) - 80.0 AS lat,
               n_nationkey * CAST(14.7 AS DOUBLE) - 170.0 AS lon
        FROM nation
    )
    SELECT a.n_nationkey, b.n_nationkey AS other_key,
           (floor(2.0 * 6378168.0 * asin(least(1.0, sqrt(
               pow(sin(radians(b.lat - a.lat) / 2), 2)
               + cos(radians(a.lat)) * cos(radians(b.lat))
                 * pow(sin(radians(b.lon - a.lon) / 2), 2)))) * 1e3) / 1e3)
             AS earth_m,
           (floor(2.0 * 3958.747716 * asin(least(1.0, sqrt(
               pow(sin(radians(b.lat - a.lat) / 2), 2)
               + cos(radians(a.lat)) * cos(radians(b.lat))
                 * pow(sin(radians(b.lon - a.lon) / 2), 2)))) * 1e3) / 1e3)
             AS geo_miles
    FROM pts a JOIN pts b ON b.n_nationkey = a.n_nationkey + 1
    """,
)
def earth_distance_funcs(spark, sf_dir):
    """earthdistance (contrib/earthdistance): earth_distance(ll_to_earth)
    great-circle meters on the sphere radius earth() = 6378168 m, and the
    point <@> operator (geo_distance, earthdistance.c:106) in statute
    miles with EARTH_RADIUS = 3958.747716. Haversine form of the same
    great-circle arc; coordinates synthesized deterministically from
    n_nationkey so both engines derive identical inputs."""
    from gpdb_spark.functions.earth import (
        EARTH_RADIUS_M,
        EARTH_RADIUS_MILES,
        haversine,
    )

    n = t(spark, sf_dir, "nation").select(
        "n_nationkey",
        (F.col("n_nationkey") * 7.3 - 80.0).alias("lat"),
        (F.col("n_nationkey") * 14.7 - 170.0).alias("lon"),
    )
    a, b = n.alias("a"), n.alias("b")
    args = (F.col("a.lat"), F.col("a.lon"), F.col("b.lat"), F.col("b.lon"))

    return (
        a.join(b, F.col("b.n_nationkey") == F.col("a.n_nationkey") + 1)
        .select(
            F.col("a.n_nationkey").alias("n_nationkey"),
            F.col("b.n_nationkey").alias("other_key"),
            fr(haversine(*args, EARTH_RADIUS_M), 3).alias("earth_m"),
            fr(haversine(*args, EARTH_RADIUS_MILES), 3).alias("geo_miles"),
        )
    )


@query(
    "pgcrypto_digest",
    oracle="""
    SELECT doc_id,
           md5(text) AS d_md5,
           sha256(text) AS d_sha256,
           lower(hex(encode(substr(text, 1, 16)))) AS hexed
    FROM documents WHERE doc_id < 40
    """,
)
def pgcrypto_digest(spark, sf_dir):
    """pgcrypto digest() family (contrib/pgcrypto/pgp-digest? px.c):
    md5/sha256 as lowercase hex (PG returns bytea; hex is the canonical
    text form). sha1/sha512 + hmac are covered by pytest golden tests
    (DuckDB lacks sha1/sha512); aes_encrypt/decrypt roundtrip likewise
    (ciphertext is key-dependent binary)."""
    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    return d.select(
        "doc_id",
        F.md5("text").alias("d_md5"),
        F.sha2(F.col("text"), 256).alias("d_sha256"),
        F.lower(F.hex(F.encode(F.substring("text", 1, 16), "utf-8"))).alias(
            "hexed"
        ),
    )


_DUCK_I6 = """
    CASE WHEN contains(ADDR, '::') THEN
        array_to_string(list_transform(list_concat(list_concat(
            list_filter(string_split(split_part(ADDR, '::', 1), ':'), x -> x <> ''),
            list_transform(generate_series(1,
                8 - len(list_filter(string_split(split_part(ADDR, '::', 1), ':'), x -> x <> ''))
                  - len(list_filter(string_split(split_part(ADDR, '::', 2), ':'), x -> x <> ''))),
                x -> '0')),
            list_filter(string_split(split_part(ADDR, '::', 2), ':'), x -> x <> '')),
            g -> lpad(lower(g), 4, '0')), ':')
    ELSE array_to_string(list_transform(string_split(ADDR, ':'),
            g -> lpad(lower(g), 4, '0')), ':') END
"""


def _duck_i6(expr: str) -> str:
    return _DUCK_I6.replace("ADDR", f"split_part({expr}, '/', 1)")


@query(
    "inet6_funcs",
    oracle=f"""
    WITH v(addr, net) AS (
        SELECT * FROM (VALUES
            ('2001:db8::1', '2001:db8::/32'),
            ('2001:0DB8:aaaa::42', '2001:db8::/32'),
            ('fe80::1%0', 'fe80::/16'),
            ('2001:db9::1', '2001:db8::/32'),
            ('::1', '::/16')) t
    )
    SELECT addr,
           {_duck_i6("replace(addr, '%0', '')")} AS canonical,
           CASE WHEN contains(net, '/')
                THEN CAST(split_part(net, '/', 2) AS INT) ELSE 128 END AS mlen,
           substr({_duck_i6("net")}, 1,
                  (CAST(split_part(net, '/', 2) AS INT) // 16) * 5 - 1)
             = substr({_duck_i6("replace(addr, '%0', '')")}, 1,
                  (CAST(split_part(net, '/', 2) AS INT) // 16) * 5 - 1)
             AS contained
    FROM v
    """,
)
def inet6_funcs(spark, sf_dir):
    """IPv6 inet (network.c AF_INET6): '::'-gap expansion to the
    canonical 8-group zero-padded form, masklen extraction, and ``>>``
    network containment (group-aligned masks here so the DuckDB oracle
    can mirror with string prefixes; the engine itself compares at bit
    granularity — bit-level masks are golden-tested in
    test_contrib.py)."""
    from gpdb_spark.functions import misc_types as MT

    rows = [
        ("2001:db8::1", "2001:db8::/32"),
        ("2001:0DB8:aaaa::42", "2001:db8::/32"),
        ("fe80::1%0", "fe80::/16"),
        ("2001:db9::1", "2001:db8::/32"),
        ("::1", "::/16"),
    ]
    v = spark.createDataFrame(rows, ["addr", "net"])
    clean = F.replace(F.col("addr"), F.lit("%0"), F.lit(""))
    return v.select(
        "addr",
        MT.inet6_expand(clean).alias("canonical"),
        MT.inet6_masklen(F.col("net")).alias("mlen"),
        MT.inet6_contains(F.col("net"), clean).alias("contained"),
    )


@query(
    "pgcrypto_hmac",
    oracle="""
    SELECT * FROM (VALUES
    ('m1', 'f04e57efdf50fe921daa2b5be476e947852647872513f6f34577f0347ecbc067', '297714171d5afcf6ff4bef2913b5db09'),
    ('m2', 'fbbc04f644ced89c13cf8144691b554f68dc2755ff40b28c8f4bd776fda59e64', '5ae4a931e2474704129539833891f67c'),
    ('m3', '03d76e1573c793ad504d22c7811d4aec521846be58c13b2b65781e10d3c1b0a3', '8243cf3827165607f294ac363b88b25c'),
    ('m4', '1b5e51ea19337aa7c26f91d70766cbd5fe0bb21608ce6544863ea34b7b53d9aa', '286986566ccbf4faabd16eef4e63f6d6'),
    ('m5', 'c765593283860af572880ffdb212cf8c68e21cb09de51ec76755e3b3a54bf2a1', 'd8b4ef8d3ac9ad5dc2544c15da881667'),
    ('m6', '0d3e0b6ce39f648f5b5746afc70993a5fa96813c7a9de4ae41f6570b3d6592bb', 'b0a3f4be824249a1c805ce238139c87d')
    ) AS v(mid, hmac_sha256, hmac_md5)
    """,
)
def pgcrypto_hmac(spark, sf_dir):
    """pgcrypto hmac(data, key, type) (contrib/pgcrypto/px-hmac.c,
    pgcrypto.c:180 pg_hmac): RFC 2104 construction as constant-folded
    pads + builtin sha2/md5 over binary concat — fully codegen-resident
    (gate: tests/test_crypto.py::test_hmac_stays_jvm_side). The oracle
    is ground truth: digests precomputed with Python's independent
    stdlib HMAC (RFC-vector-pinned in tests), since DuckDB's hash
    functions are VARCHAR-only and cannot chain raw digest bytes.
    Covers empty input, unicode (UTF-8 byte hashing), >block-size
    message, and embedded newline/tab."""
    from gpdb_spark.functions.crypto import hmac_hex

    key = b"gpdb-spark-signing-key"
    msgs = [
        ("m1", "what do ya want for nothing?"),
        ("m2", ""),
        ("m3", "The quick brown fox jumps over the lazy dog"),
        ("m4", "naive cafe éü中文"),
        ("m5", "A" * 200),
        ("m6", "line1\nline2\ttabbed"),
    ]
    df = spark.createDataFrame(msgs, "mid string, m string")
    return df.select(
        "mid",
        hmac_hex(F.col("m"), key, "sha256").alias("hmac_sha256"),
        hmac_hex(F.col("m"), key, "md5").alias("hmac_md5"),
    )


_METAPHONE_VECTORS = [
    ('GUMBO', 'KM'),
    ('Knight', 'NT'),
    ('Smith', 'SM0'),
    ('Philips', 'FLPS'),
    ('wright', 'RT'),
    ('school', 'SKL'),
    ('church', 'XRX'),
    ('banana', 'BNN'),
    ('judge', 'JJ'),
    ('Xavier', 'SFR'),
    ('light', 'LT'),
    ('question', 'KSXN'),
    ('Thompson', '0MPS'),
    ('dumb', 'TM'),
    ('thumb', '0M'),
    ('ghost', 'KST'),
    ('nation', 'NXN'),
    ('patio', 'PX'),
    ('science', 'SSNS'),
    ('ocean', 'OSN'),
    ('chemistry', 'XMST'),
    ('aggregate', 'AKRK'),
    ('whale', 'WL'),
    ('yellow', 'YL'),
    ('cycle', 'SKL'),
    ('czar', 'KSR'),
    ('pneumonia', 'NMN'),
    ('gnome', 'NM'),
    ('wrack', 'RK'),
    ('ax', 'AKS'),
    ('Schmidt', 'SKMT'),
    ('Jackson', 'JKSN'),
    ('Johnson', 'JNSN'),
    ('Williams', 'WLMS'),
    ('Brown', 'BRN'),
    ('Jones', 'JNS'),
    ('Garcia', 'KRX'),
    ('Miller', 'MLR'),
    ('Davis', 'TFS'),
    ('Rodriguez', 'RTRK'),
    ('Martinez', 'MRTN'),
    ('Anderson', 'ANTR'),
    ('Taylor', 'TLR'),
    ('Thomas', '0MS'),
    ('Moore', 'MR'),
    ('Martin', 'MRTN'),
    ('Lee', 'L'),
    ('Perez', 'PRS'),
    ('White', 'WT'),
    ('Harris', 'HRS'),
    ('Clark', 'KLRK'),
]


@query(
    "fuzzy_metaphone",
    oracle="""
    SELECT * FROM (VALUES

    ('GUMBO', 'KM'),    
    ('Knight', 'NT'),    
    ('Smith', 'SM0'),    
    ('Philips', 'FLPS'),    
    ('wright', 'RT'),    
    ('school', 'SKL'),    
    ('church', 'XRX'),    
    ('banana', 'BNN'),    
    ('judge', 'JJ'),    
    ('Xavier', 'SFR'),    
    ('light', 'LT'),    
    ('question', 'KSXN'),    
    ('Thompson', '0MPS'),    
    ('dumb', 'TM'),    
    ('thumb', '0M'),    
    ('ghost', 'KST'),    
    ('nation', 'NXN'),    
    ('patio', 'PX'),    
    ('science', 'SSNS'),    
    ('ocean', 'OSN'),    
    ('chemistry', 'XMST'),    
    ('aggregate', 'AKRK'),    
    ('whale', 'WL'),    
    ('yellow', 'YL'),    
    ('cycle', 'SKL'),    
    ('czar', 'KSR'),    
    ('pneumonia', 'NMN'),    
    ('gnome', 'NM'),    
    ('wrack', 'RK'),    
    ('ax', 'AKS'),    
    ('Schmidt', 'SKMT'),    
    ('Jackson', 'JKSN'),    
    ('Johnson', 'JNSN'),    
    ('Williams', 'WLMS'),    
    ('Brown', 'BRN'),    
    ('Jones', 'JNS'),    
    ('Garcia', 'KRX'),    
    ('Miller', 'MLR'),    
    ('Davis', 'TFS'),    
    ('Rodriguez', 'RTRK'),    
    ('Martinez', 'MRTN'),    
    ('Anderson', 'ANTR'),    
    ('Taylor', 'TLR'),    
    ('Thomas', '0MS'),    
    ('Moore', 'MR'),    
    ('Martin', 'MRTN'),    
    ('Lee', 'L'),    
    ('Perez', 'PRS'),    
    ('White', 'WT'),    
    ('Harris', 'HRS'),    
    ('Clark', 'KLRK')
    ) AS v(word, code)
    """,
)
def fuzzy_metaphone(spark, sf_dir):
    """fuzzystrmatch metaphone (Philips 1990 via Kuhn; see
    functions/metaphone.py for the rule set and the documented
    divergence choices). Context-sensitive sliding-window rules do not
    decompose into column expressions, so this is the one contrib
    function executed as an Arrow-batched pandas UDF. The oracle is the
    frozen transcription table generated from the reference rules (the
    documented PG vector metaphone('GUMBO',4)='KM' is pinned in
    tests/test_metaphone.py), so any regression in the rule engine
    hash-mismatches."""
    from gpdb_spark.functions.metaphone import metaphone_udf

    df = spark.createDataFrame(
        [(w,) for w, _ in _METAPHONE_VECTORS], "word string"
    )
    return df.select("word", metaphone_udf()(F.col("word")).alias("code"))


@query(
    "tablefunc_crosstab",
    oracle="""
    WITH src AS (
      SELECT n_regionkey AS rn, n_name AS cat, n_nationkey AS val,
             row_number() OVER (PARTITION BY n_regionkey ORDER BY n_name)
                 AS k
      FROM nation
    )
    SELECT rn,
           max(CASE WHEN k = 1 THEN val END) AS value_1,
           max(CASE WHEN k = 2 THEN val END) AS value_2,
           max(CASE WHEN k = 3 THEN val END) AS value_3,
           max(CASE WHEN k = 4 THEN val END) AS value_4,
           max(CASE WHEN k = 5 THEN val END) AS value_5
    FROM src GROUP BY rn
    """,
)
def tablefunc_crosstab(spark, sf_dir):
    """tablefunc crosstab positional form (tablefunc.c:692): pivot the
    (row_name, category, value) query into one row per row_name with
    values filled left-to-right in ORDER BY 1,2 order — Catalyst plans
    it as one 2-stage pivot aggregation. Completes tablefunc parity
    next to connectby."""
    from gpdb_spark.engine import Engine

    eng = Engine(spark, sf_dir)
    return eng.crosstab(
        "SELECT n_regionkey AS rn, n_name AS cat, n_nationkey AS val "
        "FROM nation ORDER BY 1, 2",
        n_categories=5,
    )


@query(
    "pgcrypto_crypt",
    # Ground-truth oracle: hash constants below verified byte-identical
    # to glibc's crypt(3) (the independent implementation of the same
    # public MD5-crypt algorithm; pinned again in
    # tests/test_crypto.py::test_md5_crypt_glibc_vectors). salt_gen
    # mirrors gen_salt_md5's md5-derived deterministic salt stream.
    oracle="""
    SELECT * FROM (VALUES
    ('p1', '$1$ab01cd23$RGoTF0c63zloh7xh.fCd.1', TRUE, '$1$gimkl0.t'),
    ('p2', '$1$xyz12345$nG8L8sKjhxmpbnvi/73uU1', TRUE, '$1$RaPPIbIA'),
    ('p3', '$1$s4ltS4lt$fy7/3BcLmjbHpXZa0ptsQ0', TRUE, '$1$v18cqIrC'),
    ('p4', '$1$qrstuvwx$LeOc0NDnflBmF/OI0sizA0', TRUE, '$1$HUyxLW1D'),
    ('p5', '$1$deadbeef$Mitbe9/C0L392IT.8.n6L/', TRUE, '$1$hGjsHUel'),
    ('p6', '$1$cafebabe$C/DKqKl6S0szQSSNPgL/e0', TRUE, '$1$40z74n6Z')
    ) AS v(mid, hashed, verify_ok, salt_gen)
    """,
)
def pgcrypto_crypt(spark, sf_dir):
    """pgcrypto crypt()/gen_salt() for the '$1$' MD5-crypt scheme
    (contrib/pgcrypto/pgcrypto.c pg_crypt, crypt-md5.c px_crypt_md5,
    crypt-gensalt.c): hash fixed passwords under fixed salts, prove the
    verify idiom crypt(pw, stored) == stored, and derive deterministic
    gen_salt('md5') salts from a seed column. Key stretching (1000
    chained MD5 rounds) is intrinsically per-row CPU work, so the
    operator is an Arrow-batched pandas UDF — the right Spark shape for
    an auth-table-scale input. Covers empty, unicode, >16-char, quote
    and symbol passwords."""
    from gpdb_spark.functions.crypt_md5 import crypt_and_verify, gen_salt_md5

    # salts carry the $1$ scheme prefix: PG routes BARE salts to DES
    # crypt (px-crypt.c uses the first 2 chars regardless of length),
    # so md5_crypt refuses them loudly rather than silently hashing
    # under the wrong scheme
    rows = [
        ("p1", "password", "$1$ab01cd23"),
        ("p2", "", "$1$xyz12345"),
        ("p3", "naïve café 中文", "$1$s4ltS4lt"),
        ("p4", "a" * 40, "$1$qrstuvwx"),
        ("p5", "it's a secret", "$1$deadbeef"),
        ("p6", "p@$$w0rd", "$1$cafebabe"),
    ]
    df = spark.createDataFrame(rows, "mid string, pw string, salt string")
    # r11: hash + verify-idiom re-hash in ONE pandas-UDF stage (was two
    # sequential ArrowEvalPython nodes) — see crypt_and_verify.
    hv = df.select(
        "mid", crypt_and_verify(F.col("pw"), F.col("salt")).alias("hv")
    )
    return hv.select(
        "mid",
        F.col("hv.hashed").alias("hashed"),
        F.col("hv.verify_ok").alias("verify_ok"),
        gen_salt_md5(F.col("mid")).alias("salt_gen"),
    )


@query(
    "pgcrypto_pgp",
    # The decrypted text and the exact ciphertext byte length are
    # deterministic (GCM layout: 12-byte IV || ct || 16-byte tag =
    # octet_length + 28) even though the ciphertext itself is random-IV
    # nondeterministic by design, like PG's per-row session key.
    oracle="""
    SELECT doc_id, text AS decrypted,
           CAST(octet_length(encode(text)) + 28 AS BIGINT) AS ct_bytes,
           TRUE AS tag_ok
    FROM documents WHERE doc_id <= 50
    """,
)
def pgcrypto_pgp(spark, sf_dir):
    """pgp_sym_encrypt/decrypt (contrib/pgcrypto/pgp-encrypt.c,
    pgp-decrypt.c, pgp-s2k.c): OpenPGP iterated-salted S2K key
    derivation feeding Spark's JVM aes_encrypt/aes_decrypt in GCM mode
    (authenticated — the MDC-check equivalent; wrong passphrase fails
    the tag, golden-tested). Encrypt and decrypt are pure JVM builtins
    over a constant-folded key — codegen-resident, no Python in the
    row loop."""
    from gpdb_spark.functions.crypt_md5 import (
        pgp_sym_decrypt,
        pgp_sym_encrypt,
    )

    phrase = "correct horse battery staple"
    d = (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id") <= 50)
        .select(
            "doc_id",
            "text",
            pgp_sym_encrypt(F.col("text"), phrase).alias("ct"),
        )
    )
    dec = pgp_sym_decrypt(F.col("ct"), phrase)
    return d.select(
        "doc_id",
        dec.alias("decrypted"),
        F.length(F.unbase64(F.col("ct"))).cast("long").alias("ct_bytes"),
        (dec == F.col("text")).alias("tag_ok"),
    )


@query(
    "pgcrypto_armor",
    # the CRC-24 line is masked in the compared text (DuckDB has no
    # CRC-24); its correctness is pinned by golden vectors + an
    # independent table-driven implementation in test_crypto.py. The
    # exact armored length (which includes the real CRC line) and the
    # dearmor roundtrip are compared unmasked.
    oracle="""
    SELECT doc_id,
           '-----BEGIN PGP MESSAGE-----' || chr(10) || chr(10)
           || rtrim(regexp_replace(base64(encode(text)),
                                   '(.{76})', '\\1' || chr(10), 'g'), chr(10))
           || chr(10) || '=CRC' || chr(10)
           || '-----END PGP MESSAGE-----' || chr(10) AS armored_masked,
           CAST(62 + length(base64(encode(text)))
                + greatest(length(base64(encode(text))) - 1, 0) // 76
                AS BIGINT) AS armored_len,
           TRUE AS roundtrip_ok
    FROM documents WHERE doc_id <= 40
    """,
)
def pgcrypto_armor(spark, sf_dir):
    """pgcrypto armor()/dearmor() (contrib/pgcrypto/pgp-armor.c; RFC
    4880 §6 radix-64): BEGIN/END frame, 76-char-wrapped base64 body,
    CRC-24 checksum line. The body wrap is pure JVM (base64 + regexp);
    only the 3 CRC bytes ride an Arrow-batched UDF. Compared: the
    CRC-masked armored text, the exact armored byte length (CRC line
    included), and the dearmor(armor(x)) == x roundtrip."""
    from gpdb_spark.functions.crypt_md5 import armor, dearmor

    d = (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id") <= 40)
        .select("doc_id", "text", armor(F.col("text")).alias("armored"))
    )
    return d.select(
        "doc_id",
        F.regexp_replace(
            F.col("armored"), r"\n=[A-Za-z0-9+/]{4}\n", "\n=CRC\n"
        ).alias("armored_masked"),
        F.length(F.col("armored").cast("binary")).cast("long").alias(
            "armored_len"
        ),
        (dearmor(F.col("armored")).cast("string") == F.col("text")).alias(
            "roundtrip_ok"
        ),
    )


@query(
    "pgcrypto_encrypt_raw",
    # Zero-IV AES-CBC is fully deterministic, so three independent facts
    # are compared: the decrypt(encrypt(x)) roundtrip, the exact PKCS
    # ciphertext length ((n//16 + 1)*16), and the zero-IV identity that
    # the first CBC block equals the first ECB block (CBC xors the first
    # block with the IV = zeros). Byte-exact ciphertexts are pinned
    # against contrib/pgcrypto/expected/rijndael.out in
    # tests/test_crypto.py::test_raw_cipher_rijndael_vectors.
    oracle="""
    SELECT doc_id, text AS decrypted,
           CAST((octet_length(encode(text)) // 16 + 1) * 16 AS BIGINT)
               AS ct_bytes,
           TRUE AS first_block_ecb_eq
    FROM documents WHERE doc_id <= 40
    """,
)
def pgcrypto_encrypt_raw(spark, sf_dir):
    """pgcrypto raw cipher functions encrypt()/decrypt(data, key, type)
    (contrib/pgcrypto/pgcrypto.c pg_encrypt/pg_decrypt; AES goldens
    contrib/pgcrypto/expected/rijndael.out): the non-PGP symmetric API
    — AES-CBC with PG's zero IV and zero-padded key, on Spark's JVM
    aes_encrypt/aes_decrypt builtins. Everything stays inside
    whole-stage codegen; no Python in the row loop."""
    from gpdb_spark.functions.crypt_raw import decrypt, encrypt

    key = "0123456789abcdef"
    d = (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id") <= 40)
        .select(
            "doc_id",
            "text",
            encrypt(F.col("text"), key, "aes").alias("ct"),
            encrypt(F.col("text"), key, "aes-ecb").alias("ct_ecb"),
        )
    )
    return d.select(
        "doc_id",
        decrypt(F.col("ct"), key, "aes").cast("string").alias("decrypted"),
        F.octet_length("ct").cast("long").alias("ct_bytes"),
        (
            F.substring(F.col("ct"), 1, 16)
            == F.substring(F.col("ct_ecb"), 1, 16)
        ).alias("first_block_ecb_eq"),
    )


@query(
    "unaccent_func",
    # Independent oracle: unaccent(accent(ascii_text)) must round-trip
    # to the ascii text itself (DuckDB predicts it with NO knowledge of
    # the rule table), plus a golden constant covering the multigraph
    # sources (Æ/ß/Ł/Œ/ё) hand-derived from unaccent.rules semantics.
    oracle="""
    SELECT doc_id,
           translate(regexp_replace(text, '[^\\x20-\\x7e]', '', 'g'),
                     'aeionc', 'áéîöñç') AS accented,
           regexp_replace(text, '[^\\x20-\\x7e]', '', 'g') AS unaccented,
           'Aro S Lodz Euf еЕ' AS gold
    FROM documents WHERE doc_id <= 100
    """,
)
def unaccent_func(spark, sf_dir):
    """contrib/unaccent (unaccent.c unaccent_dict; unaccent.rules): the
    9.4-era rule table is a pure 1:1 char map, so unaccent() is ONE JVM
    translate expression — codegen-resident, no UDF. The query accents
    ascii fixture text (a->á etc.), un-accents it back, and emits a
    golden covering the multigraph sources this vintage maps to single
    letters (Æ->A, ß->S, Ł->L, Œ->E, ё->е)."""
    from gpdb_spark.functions.unaccent import unaccent

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") <= 100)
    ascii_txt = F.regexp_replace(F.col("text"), r"[^\x20-\x7e]", "")
    acc = F.translate(ascii_txt, "aeionc", "áéîöñç")
    return d.select(
        "doc_id",
        acc.alias("accented"),
        unaccent(acc).alias("unaccented"),
        unaccent(F.lit("Ærø ß Łódź Œuf ёЁ")).alias("gold"),
    )


_EAN_SUM = " + ".join(
    f"CAST(substr(b12, {i}, 1) AS INT) * {1 if (i - 1) % 2 == 0 else 3}"
    for i in range(1, 13)
)
_ISBN_SUM = " + ".join(
    f"CAST(substr(b9, {i}, 1) AS INT) * {11 - i}" for i in range(1, 10)
)


@query(
    "isn_check_digits",
    # the oracle re-derives both checksum schemes as explicit positional
    # arithmetic — independent of the engine's HOF formulation
    oracle=f"""
    WITH src AS (
      SELECT p_partkey,
             lpad(CAST((p_partkey * 7919) % 1000000000000 AS VARCHAR),
                  12, '0') AS b12,
             lpad(CAST((p_partkey * 104729) % 1000000000 AS VARCHAR),
                  9, '0') AS b9
      FROM part WHERE p_partkey <= 300
    ), chk AS (
      SELECT p_partkey, b12, b9,
             (10 - ({_EAN_SUM}) % 10) % 10 AS ec,
             (11 - ({_ISBN_SUM}) % 11) % 11 AS iw
      FROM src
    )
    SELECT p_partkey,
           b12 || CAST(ec AS VARCHAR) AS ean13,
           TRUE AS ean_ok,
           FALSE AS ean_corrupt_ok,
           b9 || (CASE WHEN iw = 10 THEN 'X' ELSE CAST(iw AS VARCHAR) END)
               AS isbn10,
           TRUE AS isbn_ok,
           '978' || b9 || CAST(
             (10 - (CAST(substr('978' || b9, 1, 1) AS INT) * 1
                  + CAST(substr('978' || b9, 2, 1) AS INT) * 3
                  + CAST(substr('978' || b9, 3, 1) AS INT) * 1
                  + CAST(substr('978' || b9, 4, 1) AS INT) * 3
                  + CAST(substr('978' || b9, 5, 1) AS INT) * 1
                  + CAST(substr('978' || b9, 6, 1) AS INT) * 3
                  + CAST(substr('978' || b9, 7, 1) AS INT) * 1
                  + CAST(substr('978' || b9, 8, 1) AS INT) * 3
                  + CAST(substr('978' || b9, 9, 1) AS INT) * 1
                  + CAST(substr('978' || b9, 10, 1) AS INT) * 3
                  + CAST(substr('978' || b9, 11, 1) AS INT) * 1
                  + CAST(substr('978' || b9, 12, 1) AS INT) * 3) % 10) % 10
             AS VARCHAR) AS isbn13
    FROM chk
    """,
)
def isn_check_digits(spark, sf_dir):
    """contrib/isn (isn.c checkdig mod-10/3-weight EAN13,
    weight_checkdig mod-11 ISBN10): check-digit derivation, full-number
    validation (plus a corrupted-digit negative case), and the
    ISBN10 -> ISBN13 Bookland conversion. All JVM zip_with/aggregate
    HOFs — codegen, no shuffle; bodies synthesized deterministically
    from p_partkey so both engines derive identical inputs."""
    from gpdb_spark.functions.isn import (
        ean13_check_digit,
        is_valid_ean13,
        is_valid_isbn10,
        isbn10_check_digit,
        isbn13_from_isbn10,
    )

    p = t(spark, sf_dir, "part").where(F.col("p_partkey") <= 300)
    src = p.select(
        "p_partkey",
        F.lpad(
            ((F.col("p_partkey") * 7919) % 1000000000000).cast("string"),
            12, "0",
        ).alias("b12"),
        F.lpad(
            ((F.col("p_partkey") * 104729) % 1000000000).cast("string"),
            9, "0",
        ).alias("b9"),
    )
    ean = F.concat(
        F.col("b12"), ean13_check_digit("b12").cast("string")
    )
    # corrupt the LAST digit (+1 mod 10): always invalid
    corrupt = F.concat(
        F.col("b12"),
        ((ean13_check_digit("b12") + 1) % 10).cast("string"),
    )
    isbn = F.concat(F.col("b9"), isbn10_check_digit("b9"))
    return src.select(
        "p_partkey",
        ean.alias("ean13"),
        is_valid_ean13(ean).alias("ean_ok"),
        is_valid_ean13(corrupt).alias("ean_corrupt_ok"),
        isbn.alias("isbn10"),
        is_valid_isbn10(isbn).alias("isbn_ok"),
        isbn13_from_isbn10(isbn).alias("isbn13"),
    )


_CUBE_DIMS = []
for _d in (1, 2, 3):
    _CUBE_DIMS.append(dict(
        alo=f"(k * {_d} * 1.5 - 10.0)", ahi=f"(k * {_d} * 1.5 - 10.0 + {_d})",
        blo=f"(k2 * {_d} * 1.5 - 10.0)", bhi=f"(k2 * {_d} * 1.5 - 10.0 + {_d})",
    ))
_CUBE_GAPS = " + ".join(
    f"pow(greatest({d['alo']} - {d['bhi']}, {d['blo']} - {d['ahi']}, 0.0), 2)"
    for d in _CUBE_DIMS
)


@query(
    "cube_ops",
    # independent oracle: 3 dims as explicit scalar arithmetic (no list
    # machinery), same deterministic coordinate derivation from keys
    oracle=f"""
    WITH pts AS (
      SELECT n_nationkey AS k, n_nationkey + 1 AS k2
      FROM nation WHERE n_nationkey < 24
    )
    SELECT k,
           3 AS ndim,
           TRUE AS union_contains_a,
           ({_CUBE_DIMS[0]['alo']} <= {_CUBE_DIMS[0]['bhi']}
            AND {_CUBE_DIMS[0]['blo']} <= {_CUBE_DIMS[0]['ahi']})
           AND ({_CUBE_DIMS[1]['alo']} <= {_CUBE_DIMS[1]['bhi']}
            AND {_CUBE_DIMS[1]['blo']} <= {_CUBE_DIMS[1]['ahi']})
           AND ({_CUBE_DIMS[2]['alo']} <= {_CUBE_DIMS[2]['bhi']}
            AND {_CUBE_DIMS[2]['blo']} <= {_CUBE_DIMS[2]['ahi']})
             AS ab_overlap,
           (floor(sqrt({_CUBE_GAPS}) * 1e6) / 1e6) AS dist,
           least({_CUBE_DIMS[0]['alo']}, {_CUBE_DIMS[0]['blo']}) AS u_ll1,
           greatest({_CUBE_DIMS[2]['ahi']}, {_CUBE_DIMS[2]['bhi']}) AS u_ur3,
           greatest({_CUBE_DIMS[0]['alo']}, {_CUBE_DIMS[0]['blo']}) AS i_ll1,
           FALSE AS is_pt
    FROM pts
    """,
)
def cube_ops(spark, sf_dir):
    """contrib/cube (cube.c): n-dim boxes as struct(lo,hi) arrays with
    zip_with/aggregate HOF predicates — construction, @> containment
    (union must contain its input), && overlap, closest-point euclidean
    cube_distance (floor-truncated per float policy), union/intersection
    coordinates, cube_is_point. GiST ops are n/a (no secondary indexes:
    predicates run as scan filters, as the reference does unindexed)."""
    from gpdb_spark.functions.cube import (
        cube,
        cube_contains,
        cube_dim,
        cube_distance,
        cube_inter,
        cube_is_point,
        cube_ll_coord,
        cube_overlap,
        cube_union,
        cube_ur_coord,
    )

    n = t(spark, sf_dir, "nation").where(F.col("n_nationkey") < 24)
    k = F.col("n_nationkey").cast("double")
    k2 = k + 1

    def box(key):
        lo = F.array(*[key * d * 1.5 - 10.0 for d in (1, 2, 3)])
        hi = F.array(*[key * d * 1.5 - 10.0 + d for d in (1, 2, 3)])
        return cube(lo, hi)

    src = n.select(F.col("n_nationkey").alias("k"),
                   box(k).alias("a"), box(k2).alias("b"))
    u = cube_union("a", "b")
    return src.select(
        "k",
        cube_dim("a").alias("ndim"),
        cube_contains(u, F.col("a")).alias("union_contains_a"),
        cube_overlap("a", "b").alias("ab_overlap"),
        fr(cube_distance("a", "b"), 6).alias("dist"),
        cube_ll_coord(u, 1).alias("u_ll1"),
        cube_ur_coord(u, 3).alias("u_ur3"),
        cube_ll_coord(cube_inter("a", "b"), 1).alias("i_ll1"),
        cube_is_point("a").alias("is_pt"),
    )


# seg oracle: every boundary re-derived as scalar double arithmetic on
# the same key (a = [k, k+2.5] via the parsed ``k .. k+2.5`` literal,
# b = [1.3k-3, 1.3k-2] numeric, pm = parsed ``(k+1)(+-)0.5``, open =
# parsed ``.. k``); both engines run identical IEEE double ops, float
# outputs floor-truncated per repo policy.
_SEG_A_LO, _SEG_A_HI = "kd", "(kd + 2.5)"
_SEG_B_LO, _SEG_B_HI = "(kd * 1.3 - 3.0)", "(kd * 1.3 - 2.0)"


@query(
    "seg_ops",
    oracle=f"""
    WITH pts AS (
      SELECT n_nationkey AS k, CAST(n_nationkey AS DOUBLE) AS kd
      FROM nation WHERE n_nationkey < 25
    )
    SELECT k,
           {ofr(_SEG_A_LO)} AS a_lo,
           {ofr(_SEG_A_HI)} AS a_hi,
           {ofr('1.0')} AS pm_size,
           {ofr('(kd + 1.25)')} AS a_center,
           (({_SEG_A_HI} >= {_SEG_B_HI} AND {_SEG_A_LO} <= {_SEG_B_HI})
            OR ({_SEG_B_HI} >= {_SEG_A_HI} AND {_SEG_B_LO} <= {_SEG_A_HI}))
             AS ab_overlap,
           ({_SEG_A_HI} < {_SEG_B_LO}) AS a_left_of_b,
           ({_SEG_B_LO} <= kd AND {_SEG_B_HI} >= kd) AS b_has_k,
           ({_SEG_B_HI} <= kd) AS open_b,
           {ofr(f'least({_SEG_A_LO}, {_SEG_B_LO})')} AS u_lo,
           {ofr(f'greatest({_SEG_A_HI}, {_SEG_B_HI})')} AS u_hi,
           {ofr(f'greatest({_SEG_A_LO}, {_SEG_B_LO})')} AS i_lo,
           {ofr(f'abs(least({_SEG_A_HI}, {_SEG_B_HI})'
                f' - greatest({_SEG_A_LO}, {_SEG_B_LO}))')} AS i_sz,
           CASE WHEN {_SEG_A_LO} < {_SEG_B_LO} THEN -1
                WHEN {_SEG_A_LO} > {_SEG_B_LO} THEN 1
                WHEN {_SEG_A_HI} < {_SEG_B_HI} THEN -1
                WHEN {_SEG_A_HI} > {_SEG_B_HI} THEN 1
                ELSE 0 END AS cmp_ab,
           TRUE AS swapped_null
    FROM pts
    """,
)
def seg_ops(spark, sf_dir):
    """contrib/seg (seg.c, segparse.y): float intervals with the fuzzy
    literal grammar. Exercises the parser on column-derived literals
    (closed range ``a .. b``, plus-minus ``c(+-)d``, half-open
    ``.. b`` with an IEEE -Infinity bound, and the swapped-boundary
    NULL guard) plus the full predicate/arith set: overlap, strict
    left, scalar containment, containment by a half-open segment,
    union/intersection boundaries, Abs-based seg_size over the
    disjoint pseudo-segment, and the numeric seg_cmp core. All JVM
    regexp + arithmetic inside codegen — no UDF, no shuffle."""
    from gpdb_spark.functions.seg import (
        make_seg,
        seg_center,
        seg_cmp,
        seg_contains,
        seg_contains_scalar,
        seg_in,
        seg_inter,
        seg_left,
        seg_lower,
        seg_overlap,
        seg_size,
        seg_union,
        seg_upper,
    )

    n = t(spark, sf_dir, "nation").where(F.col("n_nationkey") < 25)
    k = F.col("n_nationkey")
    kd = k.cast("double")

    src = n.select(
        k.alias("k"),
        seg_in(
            F.concat(k.cast("string"), F.lit(" .. "), (kd + 2.5).cast("string"))
        ).alias("a"),
        make_seg(kd * 1.3 - 3.0, kd * 1.3 - 2.0).alias("b"),
        seg_in(F.concat((k + 1).cast("string"), F.lit("(+-)0.5"))).alias("pm"),
        seg_in(F.concat(F.lit(".. "), k.cast("string"))).alias("opn"),
    )
    return src.select(
        "k",
        fr(seg_lower("a")).alias("a_lo"),
        fr(seg_upper("a")).alias("a_hi"),
        fr(seg_size("pm")).alias("pm_size"),
        fr(seg_center("a")).alias("a_center"),
        seg_overlap("a", "b").alias("ab_overlap"),
        seg_left("a", "b").alias("a_left_of_b"),
        seg_contains_scalar(F.col("b"), F.col("k").cast("double")).alias("b_has_k"),
        seg_contains("opn", "b").alias("open_b"),
        fr(seg_lower(seg_union("a", "b"))).alias("u_lo"),
        fr(seg_upper(seg_union("a", "b"))).alias("u_hi"),
        fr(seg_lower(seg_inter("a", "b"))).alias("i_lo"),
        fr(seg_size(seg_inter("a", "b"))).alias("i_sz"),
        seg_cmp("a", "b").alias("cmp_ab"),
        seg_in(F.lit("5 .. 2")).isNull().alias("swapped_null"),
    )


def _normal_rand_oracle() -> str:
    from gpdb_spark.functions.tablefunc import duck_normal_rand_sql

    inner = duck_normal_rand_sql(500, 10.0, 2.0, seed=42)
    return f"SELECT i, {ofr('val')} AS val FROM ({inner}) q"


@query("tablefunc_normal_rand", oracle=_normal_rand_oracle())
def tablefunc_normal_rand(spark, sf_dir):
    """contrib/tablefunc normal_rand (tablefunc.c:174): n deviates from
    N(mean, stddev) as a function scan. Portable tier: seeded
    md5-derived Irwin-Hall(12) — both engines re-derive the identical
    column with exact IEEE +,*,/ only (module docstring documents the
    divergence from the reference's srandom Box-Muller, which no
    deterministic oracle can reproduce). Pure per-row map over a range
    generator: no source, no shuffle, no Python."""
    from gpdb_spark.functions.tablefunc import normal_rand

    return normal_rand(spark, 500, 10.0, 2.0, seed=42).select(
        "i", fr("val").alias("val")
    )
