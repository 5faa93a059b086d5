"""Text-matching contrib modules shipped with the reference:
pg_trgm (trigram similarity), fuzzystrmatch (levenshtein/soundex),
unaccent, citext — /root/reference/contrib/{pg_trgm,fuzzystrmatch,
unaccent,citext}/.

All queries are pure JVM expressions (no Python UDFs); the trigram
near-dup join uses the same inverted-index + document-frequency-cutoff
shape as datapipe/dedup.py so it holds at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gpdb_spark.functions import fuzzy, trgm
from gpdb_spark.registry import fr, query, t


@query(
    "trgm_similarity",
    oracle=f"""
    SELECT a.doc_id,
           CAST(len({trgm.duck_trgm("substr(a.text, 1, 40)")}) AS INT) AS n_trgm,
           array_to_string({trgm.duck_trgm("a.source")}, ',') AS src_trgms,
           (floor({trgm.duck_similarity("substr(a.text, 1, 40)", "substr(b.text, 1, 40)")}
                  * 1e6) / 1e6) AS sim_next,
           {trgm.duck_similarity("substr(a.text, 1, 40)", "substr(b.text, 1, 40)")} >= 0.3
             AS pct_match
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    WHERE a.doc_id < 60
    """,
)
def trgm_similarity(spark, sf_dir):
    """pg_trgm surface: show_trgm (trigram extraction with the
    2-leading/1-trailing blank padding of trgm.h), similarity()
    trigram-set Jaccard, and the % threshold operator (trgm_op.c
    cnt_sml, similarity_threshold=0.3). Adjacent-doc pairs via an
    equi-join keep the comparison a per-row expression."""
    d = t(spark, sf_dir, "documents")
    a = d.where(F.col("doc_id") < 60).alias("a")
    b = d.select(
        (F.col("doc_id") - 1).alias("join_id"), F.col("text").alias("btext")
    ).alias("b")
    sa = F.substring(F.col("a.text"), 1, 40)
    sb = F.substring(F.col("btext"), 1, 40)
    return (
        a.join(b, F.col("a.doc_id") == F.col("join_id"))
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.size(trgm.show_trgm(sa)).cast("int").alias("n_trgm"),
            F.array_join(trgm.show_trgm(F.col("a.source")), ",").alias("src_trgms"),
            fr(trgm.similarity(sa, sb), 6).alias("sim_next"),
            trgm.is_similar(sa, sb).alias("pct_match"),
        )
    )


@query(
    "trgm_neardup_pairs",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, {trgm.duck_trgm("substr(text, 1, 80)")} AS tg
        FROM documents WHERE doc_id < 150
    ), posts AS (
        SELECT doc_id, unnest(tg) AS trgm FROM docs
    ), keep AS (
        SELECT trgm FROM posts GROUP BY trgm HAVING count(*) <= 37
    ), fp AS (
        SELECT p.doc_id, p.trgm FROM posts p JOIN keep USING (trgm)
    ), sz AS (
        SELECT doc_id, count(*) AS n FROM fp GROUP BY doc_id
    ), pairs AS (
        SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared
        FROM fp x JOIN fp y ON x.trgm = y.trgm AND x.doc_id < y.doc_id
        GROUP BY 1, 2
    )
    SELECT a, b,
           (floor(CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) * 1e6) / 1e6) AS sim
    FROM pairs JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
    WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.45
    """,
)
def trgm_neardup_pairs(spark, sf_dir):
    """Trigram near-duplicate pairs — pg_trgm's ``%`` join, realized at
    corpus scale as an inverted-index equi-join on trigram (the shape a
    trigram GIN index gives the reference: contrib/pg_trgm/trgm_gin.c),
    NOT an all-pairs cross join.

    Scale shape: explode distinct trigrams -> drop ultra-frequent
    trigrams (df > 25% of the subset: boilerplate trigrams otherwise
    create one quadratic shuffle key — the same hazard + cutoff as
    datapipe/dedup.py jaccard_pairs) -> count shared trigrams per pair
    -> re-join per-doc FILTERED set sizes -> Jaccard >= threshold.
    Similarity is thus defined over the non-boilerplate trigram space on
    both sides of the comparison (sizes come from the filtered postings,
    so the metric stays a true Jaccard); the DuckDB oracle applies the
    identical cutoff. Only ids cross the pair shuffle — never trigram
    arrays."""
    d = (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 150)
        .select("doc_id", trgm.show_trgm(F.substring("text", 1, 80)).alias("trgms"))
    )
    n_docs = 150
    sh = d.select("doc_id", F.explode("trgms").alias("trgm"))
    keep = (
        sh.groupBy("trgm")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= int(0.25 * n_docs))
        .select("trgm")
    )
    sh = sh.join(keep, "trgm").persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    pairs = (
        sh.select(F.col("doc_id").alias("a"), "trgm")
        .join(sh.select(F.col("doc_id").alias("b"), "trgm"), "trgm")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        pairs.join(sizes.withColumnsRenamed({"doc_id": "a", "sz": "sza"}), "a")
        .join(sizes.withColumnsRenamed({"doc_id": "b", "sz": "szb"}), "b")
        .withColumn(
            "sim",
            F.col("shared").cast("double")
            / (F.col("sza") + F.col("szb") - F.col("shared")),
        )
        .where(F.col("sim") >= 0.45)
        .select("a", "b", fr(F.col("sim"), 6).alias("sim"))
    )


@query(
    "fuzzy_match_funcs",
    oracle="""
    SELECT n_nationkey,
           levenshtein(n_name, 'GERMANY') AS lev_full,
           CASE WHEN levenshtein(n_name, 'GERMANY') <= 3
                THEN levenshtein(n_name, 'GERMANY') ELSE -1 END AS lev_le3,
           levenshtein(lower(n_name), lower(r_name)) AS lev_region
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def fuzzy_match_funcs(spark, sf_dir):
    """fuzzystrmatch edit distance (fuzzystrmatch.c:212) + the bounded
    levenshtein_less_equal form (:260 — Spark's 3-arg levenshtein has the
    same early-exit -1 contract)."""
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "n_nationkey",
            fuzzy.levenshtein(F.col("n_name"), F.lit("GERMANY")).alias("lev_full"),
            fuzzy.levenshtein(F.col("n_name"), F.lit("GERMANY"), 3).alias("lev_le3"),
            fuzzy.levenshtein(F.lower("n_name"), F.lower("r_name")).alias(
                "lev_region"
            ),
        )
    )


@query(
    "fuzzy_phonetic",
    oracle=f"""
    WITH s AS (
        SELECT n_name AS w FROM nation
        UNION ALL
        SELECT unnest(['Anne', 'Andrew', 'Margaret', 'Pfister', 'Jackson',
                       'Tymczak', 'Ashcraft', 'Robert', 'Rupert', 'Cat dog!'])
    ), m AS (
        SELECT w, {fuzzy.duck_soundex("w")} AS sdx FROM s
    )
    SELECT w, sdx,
           CAST(substr(sdx, 1, 1) = 'A' AS INT) + CAST(substr(sdx, 2, 1) = '5' AS INT)
           + CAST(substr(sdx, 3, 1) = '0' AS INT) + CAST(substr(sdx, 4, 1) = '0' AS INT)
             AS diff_anne
    FROM m
    """,
)
def fuzzy_phonetic(spark, sf_dir):
    """fuzzystrmatch soundex (fuzzystrmatch.c:73 `_soundex`: code table
    01230120022455012623010202, adjacent-duplicate collapse, vowel-class
    codes dropped, rpad to 4) + difference() (:156, positionwise code
    match vs 'Anne' = A500). The DuckDB oracle re-derives the algorithm
    from the same table, so both engines are checked against the
    algorithm, not each other — including 'Ashcraft' (A226 here; Spark's
    builtin soundex would give the refined-variant A261) and 'Cat dog!'
    (non-letters skipped without separating: C320)."""
    n = t(spark, sf_dir, "nation").select(F.col("n_name").alias("w"))
    extra = spark.createDataFrame(
        [("Anne",), ("Andrew",), ("Margaret",), ("Pfister",), ("Jackson",),
         ("Tymczak",), ("Ashcraft",), ("Robert",), ("Rupert",), ("Cat dog!",)],
        ["w"],
    )
    s = n.unionAll(extra)
    return s.select(
        "w",
        fuzzy.soundex(F.col("w")).alias("sdx"),
        fuzzy.difference(F.col("w"), F.lit("Anne")).cast("int").alias("diff_anne"),
    )


@query(
    "unaccent_citext",
    oracle="""
    WITH v(raw, other) AS (
        SELECT * FROM (VALUES
            ('Hôtel Crémieux', 'HOTEL CREMIEUX'),
            ('Ångström', 'angstrom'),
            ('señor François', 'SENOR FRANCOIS'),
            ('naïve façade', 'NAIVE FACADE'),
            ('Zürich Øresund', 'zurich oresund')) t
    )
    SELECT raw,
           replace(replace(strip_accents(raw), 'ø', 'o'), 'Ø', 'O') AS unaccented,
           lower(replace(replace(strip_accents(raw), 'ø', 'o'), 'Ø', 'O'))
             = lower(replace(replace(strip_accents(other), 'ø', 'o'), 'Ø', 'O')) AS ci_eq,
           upper(replace(replace(strip_accents(raw), 'ø', 'o'), 'Ø', 'O')) AS ci_canon
    FROM v
    """,
)
def unaccent_citext(spark, sf_dir):
    """unaccent (contrib/unaccent — diacritic stripping via a translation
    dictionary; realized as a translate() over the Latin-1/Latin-Ext
    accent map) + citext case-insensitive equality (contrib/citext —
    realized as comparison under lower(), the same collation-free fold
    citextcmp performs)."""
    rows = [
        ("Hôtel Crémieux", "HOTEL CREMIEUX"),
        ("Ångström", "angstrom"),
        ("señor François", "SENOR FRANCOIS"),
        ("naïve façade", "NAIVE FACADE"),
        ("Zürich Øresund", "zurich oresund"),
    ]
    v = spark.createDataFrame(rows, ["raw", "other"])
    # accent map derived the way unaccent.rules is: NFD-decompose and keep
    # the base char, plus the non-decomposable letters PG's rules file maps
    # explicitly (ø). DuckDB's strip_accents is NFD-only, so the oracle
    # patches ø/Ø with replace().
    import unicodedata

    acc = "àáâãäåçèéêëìíîïñòóôõöøùúûüýÿÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖØÙÚÛÜÝ"
    special = {"ø": "o", "Ø": "O"}
    plain = "".join(
        special.get(ch, unicodedata.normalize("NFD", ch)[0]) for ch in acc
    )

    def unaccent(c):
        return F.translate(c, acc, plain)

    return v.select(
        "raw",
        unaccent(F.col("raw")).alias("unaccented"),
        (F.lower(unaccent(F.col("raw"))) == F.lower(unaccent(F.col("other")))).alias(
            "ci_eq"
        ),
        F.upper(unaccent(F.col("raw"))).alias("ci_canon"),
    )
