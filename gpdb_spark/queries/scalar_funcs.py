"""Scalar function families (SURVEY.md §2.9 — 2,620 catalog functions,
representative coverage per family).

Cross-engine notes baked into these queries (the PG-dialect hard parts
from SURVEY.md §7):
- double->int casts: PG/DuckDB round, Spark truncates — queries use
  explicit floor/round, never bare casts;
- `/` on integers: PG truncates, Spark returns double — explicit div
  (gpdb_spark.functions.pg.int_div);
- libm functions (exp/ln/sin) can differ by 1 ulp between JVM and C —
  results rounded to 6 digits.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gpdb_spark.registry import fr, query, t


@query(
    "string_funcs",
    oracle="""
    SELECT doc_id,
           upper(substr(text, 1, 12)) AS up12,
           lower(source) AS lsrc,
           length(text) AS len,
           CAST(strpos(text, 'table') AS INT) AS pos_table,
           trim('  ' || source || ' ') AS trimmed,
           lpad(lang, 5, '_') AS lang5,
           reverse(lang) AS gnal,
           repeat(lang, 3) AS lang3,
           replace(source, 'src', 'origin_') AS renamed,
           split_part(source, 'c', 2) AS after_c,
           substr(md5(text), 1, 8) AS md5_8,
           left(text, 5) AS l5, right(text, 5) AS r5,
           CAST(ascii(lang) AS INT) AS a0,
           concat(lang, ':', source) AS tagged
    FROM documents WHERE doc_id < 100
    """,
)
def string_funcs(spark, sf_dir):
    """String family (varlena.c, oracle_compat.c): case, substr, length,
    position, trim/pad, reverse/repeat/replace, split_part, md5, concat."""
    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.upper(F.substring("text", 1, 12)).alias("up12"),
        F.lower("source").alias("lsrc"),
        F.length("text").alias("len"),
        F.instr(F.col("text"), "table").cast("int").alias("pos_table"),
        F.trim(F.concat(F.lit("  "), F.col("source"), F.lit(" "))).alias("trimmed"),
        F.lpad("lang", 5, "_").alias("lang5"),
        F.reverse("lang").alias("gnal"),
        F.repeat("lang", 3).alias("lang3"),
        F.replace(F.col("source"), F.lit("src"), F.lit("origin_")).alias("renamed"),
        F.split_part(F.col("source"), F.lit("c"), F.lit(2)).alias("after_c"),
        F.substring(F.md5("text"), 1, 8).alias("md5_8"),
        F.left(F.col("text"), F.lit(5)).alias("l5"),
        F.right(F.col("text"), F.lit(5)).alias("r5"),
        F.ascii("lang").cast("int").alias("a0"),
        F.concat_ws(":", "lang", "source").alias("tagged"),
    )


@query(
    "regexp_like_funcs",
    oracle="""
    SELECT p_partkey,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS starred,
           regexp_extract(p_name, '[a-z]+') AS first_word,
           regexp_matches(p_name, 'w.dget') AS has_wdget,
           p_name LIKE '%bolt%' AS like_bolt,
           p_name ILIKE '%BOLT%' AS ilike_bolt,
           CAST(len(string_split_regex(p_name, '\\s+')) AS INT) AS n_words
    FROM part WHERE p_partkey < 300
    """,
)
def regexp_like_funcs(spark, sf_dir):
    """Regex family (regexp.c:640,798) + LIKE/ILIKE (like.c). NB: PG
    regexp_replace is first-match unless 'g' — Spark is always-global, so
    the oracle pins the 'g' flag."""
    p = t(spark, sf_dir, "part").where(F.col("p_partkey") < 300)
    return p.select(
        "p_partkey",
        F.regexp_replace("p_name", "[aeiou]", "*").alias("starred"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.col("p_name").rlike("w.dget").alias("has_wdget"),
        F.col("p_name").like("%bolt%").alias("like_bolt"),
        F.col("p_name").ilike("%BOLT%").alias("ilike_bolt"),
        F.array_size(F.split("p_name", r"\s+")).cast("int").alias("n_words"),
    )


@query(
    "math_funcs",
    oracle="""
    SELECT o_orderkey,
           abs(o_totalprice - 30000.0) AS dist,
           CAST(ceil(o_totalprice / 1000.0) AS BIGINT) AS kceil,
           CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS kfloor,
           (floor(o_totalprice * 1e1) / 1e1) AS r1,
           (floor(sqrt(o_totalprice) * 1e6) / 1e6) AS sq,
           (floor(ln(o_totalprice) * 1e6) / 1e6) AS lnp,
           (floor(log10(o_totalprice) * 1e6) / 1e6) AS lgp,
           (floor(power(o_totalprice, 0.25) * 1e6) / 1e6) AS p25,
           (floor(cbrt(o_totalprice) * 1e6) / 1e6) AS cb,
           (floor(exp(o_totalprice / 100000.0) * 1e6) / 1e6) AS ex,
           CAST(o_orderkey % 7 AS BIGINT) AS m7,
           CAST(sign(o_totalprice - 30000.0) AS DOUBLE) AS sgn,
           (floor(pi() * 2 * 1e6) / 1e6) AS tau,
           (floor(degrees(1.0) * 1e6) / 1e6) AS deg,
           (floor(sin(o_totalprice / 10000.0) * 1e6) / 1e6) AS sn,
           (floor(atan2(o_totalprice, 10000.0) * 1e6) / 1e6) AS at2,
           greatest(o_totalprice, 25000.0) AS hi,
           least(o_totalprice, 25000.0) AS lo
    FROM orders WHERE o_orderkey < 2000
    """,
)
def math_funcs(spark, sf_dir):
    """Math family (float.c, numeric.c, int.c): rounding, roots, logs,
    powers, trig, modulo, sign, greatest/least."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.abs(tp - 30000.0).alias("dist"),
        F.ceil(tp / 1000.0).alias("kceil"),
        F.floor(tp / 1000.0).alias("kfloor"),
        fr(tp, 1).alias("r1"),
        fr(F.sqrt(tp), 6).alias("sq"),
        fr(F.log(tp), 6).alias("lnp"),
        fr(F.log10(tp), 6).alias("lgp"),
        fr(F.pow(tp, 0.25), 6).alias("p25"),
        fr(F.cbrt(tp), 6).alias("cb"),
        fr(F.exp(tp / 100000.0), 6).alias("ex"),
        (F.col("o_orderkey") % 7).cast("long").alias("m7"),
        F.signum(tp - 30000.0).alias("sgn"),
        fr(F.lit(3.141592653589793) * 2, 6).alias("tau"),
        fr(F.degrees(F.lit(1.0)), 6).alias("deg"),
        fr(F.sin(tp / 10000.0), 6).alias("sn"),
        fr(F.atan2(tp, F.lit(10000.0)), 6).alias("at2"),
        F.greatest(tp, F.lit(25000.0)).alias("hi"),
        F.least(tp, F.lit(25000.0)).alias("lo"),
    )


@query(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS q_start,
           CAST(extract(year FROM o_orderdate) AS INT) AS yr,
           CAST(extract(month FROM o_orderdate) AS INT) AS mo,
           CAST(extract(day FROM o_orderdate) AS INT) AS dy,
           o_orderdate + INTERVAL 30 DAY AS plus30,
           o_orderdate - INTERVAL 2 MONTH AS minus2mo,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS INT)
             AS days_to_y2k,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS eom
    FROM orders WHERE o_orderkey < 1000
    """,
)
def date_funcs(spark, sf_dir):
    """Date/time family (timestamp.c:4561 date_trunc, date.c, datetime.c):
    truncation, extract, interval arithmetic, diffs, formatting
    (to_char -> date_format pattern translation, formatting.c)."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", d).alias("month_start"),
        F.date_trunc("quarter", d).alias("q_start"),
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dy"),
        (d + F.expr("INTERVAL 30 DAYS")).alias("plus30"),
        (d - F.expr("INTERVAL 2 MONTHS")).alias("minus2mo"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"), d)
        .cast("int")
        .alias("days_to_y2k"),
        F.date_format(d, "yyyy-MM-dd").alias("iso_day"),
        F.last_day(d.cast("date")).alias("eom"),
    )


@query(
    "conditional_funcs",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS band,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           nullif(c_nationkey, 0) AS nk_nz,
           greatest(c_acctbal, 0.0) AS bal_floor,
           least(c_acctbal, 1000.0) AS bal_cap,
           CASE WHEN c_acctbal IS NULL THEN 'null' ELSE 'set' END AS nullness
    FROM customer WHERE c_custkey < 500
    """,
)
def conditional_funcs(spark, sf_dir):
    """CASE / COALESCE / NULLIF / GREATEST / LEAST (execQual.c evaluation;
    Catalyst codegen here)."""
    c = t(spark, sf_dir, "customer").where(F.col("c_custkey") < 500)
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(bal < 0, "debt").when(bal < 5000, "low").otherwise("high").alias("band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER"))
        .alias("seg_or_other"),
        F.nullif(F.col("c_nationkey"), F.lit(0)).alias("nk_nz"),
        F.greatest(bal, F.lit(0.0)).alias("bal_floor"),
        F.least(bal, F.lit(1000.0)).alias("bal_cap"),
        F.when(bal.isNull(), "null").otherwise("set").alias("nullness"),
    )


@query(
    "int_division_pg",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey // 7 AS BIGINT) AS div7,
           CAST(o_orderkey % 7 AS BIGINT) AS mod7,
           CAST((0 - o_orderkey) // 7 AS BIGINT) AS negdiv7
    FROM orders WHERE o_orderkey < 1000
    """,
)
def int_division_pg(spark, sf_dir):
    """PG integer division semantics (int.c int4div): `/` truncates toward
    zero on ints — Spark SQL `/` would return double (SURVEY §7 hard part
    #1)."""
    from gpdb_spark.functions.pg import int_div

    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        int_div(k, F.lit(7)).alias("div7"),
        (k % 7).cast("long").alias("mod7"),
        int_div(-k, F.lit(7)).alias("negdiv7"),
    )


@query(
    "generate_series_agg",
    oracle="""
    SELECT CAST(n % 10 AS BIGINT) AS bucket,
           CAST(sum(n) AS BIGINT) AS total, count(*) AS cnt
    FROM generate_series(1, 100000) t(n)
    GROUP BY CAST(n % 10 AS BIGINT)
    """,
)
def generate_series_agg(spark, sf_dir):
    """generate_series (int.c SRF) -> spark.range: the series itself is
    partitioned across executors (vs a driver-side list)."""
    from gpdb_spark.functions.pg import generate_series

    s = generate_series(spark, 1, 100000)
    return (
        s.groupBy((F.col("n") % 10).cast("long").alias("bucket"))
        .agg(F.sum("n").cast("long").alias("total"), F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "json_funcs",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing_val,
           json_extract_string(props, '$.k') IS NOT NULL AS has_k
    FROM events WHERE event_id < 500
    """,
)
def json_funcs(spark, sf_dir):
    """JSON family (json.c, jsonfuncs.c:440 -> operators): extraction,
    typed cast, missing-path null semantics."""
    e = t(spark, sf_dir, "events").where(F.col("event_id") < 500)
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        k.alias("k_str"),
        k.cast("int").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
        k.isNotNull().alias("has_k"),
    )


@query(
    "json_build_agg",
    oracle="""
    SELECT event_type,
           json_extract_string(
             to_json({'t': event_type, 'n': count(*)}), '$.t') AS echo_type,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def json_build_agg(spark, sf_dir):
    """json_build_object / row_to_json (json.c:2035) — construct JSON from
    grouped values, then extract back out (round-trip)."""
    e = t(spark, sf_dir, "events")
    g = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    j = F.to_json(F.struct(F.col("event_type").alias("t"), F.col("n").alias("n")))
    return g.select(
        "event_type",
        F.get_json_object(j, "$.t").alias("echo_type"),
        "n",
    )


@query(
    "array_funcs",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
           list_contains(string_split(text, ' '), 'table') AS has_table,
           list_sort(list_distinct(string_split(text, ' ')))[1] AS first_tok,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], '|')
             AS first3
    FROM documents WHERE doc_id < 50
    """,
)
def array_funcs(spark, sf_dir):
    """Array family (arrayfuncs.c, array_userfuncs.c): construction from
    split, length, distinct, containment, sort, slice, array_to_string."""
    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    toks = F.split("text", " ")
    dtoks = F.array_sort(F.array_distinct(toks))
    return d.select(
        "doc_id",
        F.array_size(toks).cast("int").alias("n_tokens"),
        F.array_size(F.array_distinct(toks)).cast("int").alias("n_distinct"),
        F.array_contains(toks, "table").alias("has_table"),
        F.element_at(dtoks, 1).alias("first_tok"),
        F.array_join(F.slice(dtoks, 1, 3), "|").alias("first3"),
    )


@query(
    "width_bucket_func",
    oracle="""
    SELECT CAST(CASE
             WHEN c_acctbal < 0 THEN 0
             WHEN c_acctbal >= 10000 THEN 11
             ELSE floor(c_acctbal / 1000.0) + 1
           END AS BIGINT) AS bucket,
           count(*) AS n
    FROM customer GROUP BY 1
    """,
)
def width_bucket_func(spark, sf_dir):
    """width_bucket(x, 0, 10000, 10) (float.c) — histogram bucketing.
    DuckDB lacks the builtin, so the oracle spells out the same arithmetic."""
    c = t(spark, sf_dir, "customer")
    return (
        c.select(
            F.width_bucket(F.col("c_acctbal"), F.lit(0.0), F.lit(10000.0), F.lit(10))
            .cast("long")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "interval_age_overlaps",
    oracle="""
    SELECT o_orderkey,
           CAST(date_part('year',  age(DATE '2002-01-15', o_orderdate)) AS INT) AS age_y,
           CAST(date_part('month', age(DATE '2002-01-15', o_orderdate)) AS INT) AS age_m,
           CAST(date_part('day',   age(DATE '2002-01-15', o_orderdate)) AS INT) AS age_d,
           CASE WHEN o_orderdate > DATE '1997-01-01'
                THEN o_orderdate < DATE '1997-06-30'
                WHEN DATE '1997-01-01' > o_orderdate
                THEN DATE '1997-01-01' < o_orderdate + INTERVAL 90 DAY
                ELSE TRUE END AS in_h1_97
    FROM orders WHERE o_orderkey < 2000
    """,
)
def interval_age_overlaps(spark, sf_dir):
    """PG age() decomposition + OVERLAPS predicate (timestamp.c
    timestamp_age / overlaps_timestamp; SURVEY.md §2.9 date family).
    DuckDB's age() implements the same borrow algorithm, so components
    compare exactly; OVERLAPS has no DuckDB operator, so the oracle
    spells out the identical normalized comparison."""
    from gpdb_spark.functions.pg import age_parts, ts_overlaps

    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    d = F.col("o_orderdate")
    ref = F.lit("2002-01-15").cast("date")
    age = age_parts(ref, d)
    return o.select(
        "o_orderkey",
        age["years"].cast("int").alias("age_y"),
        age["months"].cast("int").alias("age_m"),
        age["days"].cast("int").alias("age_d"),
        ts_overlaps(
            d,
            F.date_add(d, 90),
            F.lit("1997-01-01").cast("date"),
            F.lit("1997-06-30").cast("date"),
        ).alias("in_h1_97"),
    )


@query(
    "tz_offset_convert",
    oracle="""
    SELECT event_id,
           ts + INTERVAL 330 MINUTE AS ts_ist,
           ts - INTERVAL 5 HOUR AS ts_est_std,
           CAST(extract(hour FROM ts + INTERVAL 330 MINUTE) AS INT) AS ist_hour
    FROM events WHERE event_id % 97 = 0
    """,
)
def tz_offset_convert(spark, sf_dir):
    """Session-timezone / AT TIME ZONE semantics (timestamp.c,
    SURVEY.md §7 'timestamp/timezone session semantics'): engine runs
    pinned to UTC; fixed-offset conversions are exact interval shifts in
    both engines. Named zones with DST are covered by
    tests/test_gp_types.py::test_named_timezone_dst against Python
    zoneinfo (DuckDB's session-TZ dependence makes them non-oracle-able)."""
    e = t(spark, sf_dir, "events").where(F.col("event_id") % 97 == 0)
    ist = F.from_utc_timestamp(F.col("ts"), "+05:30")
    return e.select(
        "event_id",
        ist.alias("ts_ist"),
        F.from_utc_timestamp(F.col("ts"), "-05:00").alias("ts_est_std"),
        F.hour(ist).alias("ist_hour"),
    )


@query(
    "string_funcs2",
    oracle="""
    SELECT doc_id,
           array_to_string(
             list_transform(string_split(replace(source, '_', ' '), ' '),
               w -> upper(w[1]) || lower(w[2:])), ' ') AS title_src,
           translate(lang, 'aeiou', '12345') AS lang_coded,
           substr(source, 1, 2) || 'XX' || substr(source, 5) AS overlaid
    FROM documents WHERE doc_id < 100
    """,
)
def string_funcs2(spark, sf_dir):
    """String family continued (oracle_compat.c initcap/translate;
    varlena.c overlay). DuckDB lacks initcap/overlay builtins, so the
    oracle spells out the equivalent expressions."""
    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.initcap(F.replace(F.col("source"), F.lit("_"), F.lit(" "))).alias(
            "title_src"
        ),
        F.translate(F.col("lang"), "aeiou", "12345").alias("lang_coded"),
        F.overlay(F.col("source"), F.lit("XX"), F.lit(3), F.lit(2)).alias(
            "overlaid"
        ),
    )


@query(
    "json_each_explode",
    oracle="""
    SELECT event_id, k,
           json_extract_string(props, '$.' || k) AS v
    FROM (
        SELECT event_id, props, unnest(json_keys(props)) AS k
        FROM events WHERE event_id % 101 = 0
    )
    """,
)
def json_each_explode(spark, sf_dir):
    """json_each — explode a JSON object into (key, value) rows
    (jsonfuncs.c each_worker; SURVEY.md §2.9 JSON family). Spark:
    from_json to map + explode; scalar values coerce to strings in both
    engines."""
    e = t(spark, sf_dir, "events").where(F.col("event_id") % 101 == 0)
    return e.select(
        "event_id",
        F.explode(F.from_json("props", "map<string,string>")).alias("k", "v"),
    )


@query(
    "generate_series_timestamp",
    oracle="""
    SELECT CAST(d AS TIMESTAMP) AS day_start,
           CAST(extract(dow FROM d) AS INT) AS dow
    FROM generate_series(TIMESTAMP '1997-01-01', TIMESTAMP '1997-12-31',
                         INTERVAL 1 DAY) t(d)
    """,
)
def generate_series_timestamp(spark, sf_dir):
    """generate_series over timestamps (timestamp.c SRF variant):
    sequence() + explode stays distributed after the explode. PG dow:
    Sunday=0; Spark dayofweek: Sunday=1."""
    s = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1997-01-01").cast("timestamp"),
                F.lit("1997-12-31").cast("timestamp"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day_start")
    )
    return s.select(
        "day_start",
        (F.dayofweek("day_start") - 1).cast("int").alias("dow"),
    )


@query(
    "regexp_split_ordinality",
    oracle="""
    SELECT doc_id,
           unnest(list_transform(string_split_regex(trim(text), '\\s+'),
                                 (x, i) -> {'ord': i, 'tok': x}),
                  recursive := true)
    FROM documents WHERE doc_id < 40
    """,
)
def regexp_split_ordinality(spark, sf_dir):
    """regexp_split_to_table + WITH ORDINALITY (regexp.c SRF,
    upstream-PG FunctionScan ordinality): posexplode gives the 1-based
    element position alongside the value."""
    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    return d.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("p", "tok"),
    ).select(
        "doc_id", (F.col("p") + 1).cast("long").alias("ord"), "tok"
    )


@query(
    "array_any_all_ops",
    oracle="""
    SELECT n_nationkey,
           (n_regionkey = ANY([0, 2, 4])) AS in_even_region,
           (n_nationkey < ALL([10, 15, 20])) AS lt_all,
           (n_nationkey = ANY(CAST([] AS BIGINT[]))) AS any_empty
    FROM nation
    """,
)
def array_any_all_ops(spark, sf_dir):
    """x = ANY(array) / x < ALL(array) quantified comparisons
    (arrayfuncs.c ANY/ALL; SURVEY.md §2.9 array family):
    array_contains / forall. Empty-array ANY is evaluated by the engine
    (array_contains over a typed empty array — false, never NULL, in
    both engines), not emitted as a constant."""
    n = t(spark, sf_dir, "nation")
    empty = F.array().cast("array<bigint>")
    return n.select(
        "n_nationkey",
        F.array_contains(
            F.array(F.lit(0), F.lit(2), F.lit(4)), F.col("n_regionkey")
        ).alias("in_even_region"),
        F.forall(
            F.array(F.lit(10), F.lit(15), F.lit(20)),
            lambda v: F.col("n_nationkey") < v,
        ).alias("lt_all"),
        F.coalesce(
            F.array_contains(empty, F.col("n_nationkey")), F.lit(False)
        ).alias("any_empty"),
    )


@query(
    "string_encode_funcs",
    # encode/decode (encode.c), chr (oracle_compat.c), regexp_count
    # (regexp.c), format (varlena.c text_format)
    oracle="""
    SELECT doc_id,
           to_base64(encode(substr(text, 1, 24))) AS b64,
           decode(from_base64(to_base64(encode(substr(text, 1, 12)))))
               AS roundtrip,
           lower(hex(encode(substr(lang, 1, 2)))) AS hex2,
           chr(65 + CAST(doc_id % 26 AS INT)) AS letter,
           len(regexp_extract_all(text, '[aeiou]')) AS n_vowels,
           format('{}#{}', lang, doc_id % 10) AS tagged
    FROM documents WHERE doc_id < 200
    """,
)
def string_encode_funcs(spark, sf_dir):
    """encode/decode base64+hex (encode.c), chr, regexp_count, format()
    (text_format) — Spark builtins; format maps to format_string with
    printf-style placeholders."""
    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.base64(F.substring("text", 1, 24).cast("binary")).alias("b64"),
        F.unbase64(
            F.base64(F.substring("text", 1, 12).cast("binary"))
        ).cast("string").alias("roundtrip"),
        F.lower(F.hex(F.substring("lang", 1, 2).cast("binary"))).alias(
            "hex2"
        ),
        F.chr(F.lit(65) + (F.col("doc_id") % 26)).alias("letter"),
        F.regexp_count("text", F.lit("[aeiou]")).cast("long").alias(
            "n_vowels"
        ),
        F.format_string("%s#%d", F.col("lang"), (F.col("doc_id") % 10))
        .alias("tagged"),
    )


@query(
    "array_funcs2",
    # arrayfuncs.c breadth: string_to_array, array_to_string,
    # array_position, array_remove, array_cat, cardinality
    oracle="""
    WITH a AS (
        SELECT doc_id,
               string_split_regex(trim(lower(substr(text, 1, 80))), '\\s+')
                   AS toks
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           array_to_string(toks[1:4], '|') AS first4,
           list_position(toks, 'the') AS pos_the,
           len(list_filter(toks, x -> x != 'the')) AS n_no_the,
           len(list_concat(toks[1:2], toks[1:2])) AS cat_len,
           len(toks) AS cardinality
    FROM a
    """,
)
def array_funcs2(spark, sf_dir):
    """Array family breadth (arrayfuncs.c): string_to_array -> split,
    array_to_string -> array_join, array_position, array_remove ->
    filter, array_cat -> concat, cardinality -> size."""
    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    toks = F.split(F.trim(F.lower(F.substring("text", 1, 80))), r"\s+")
    d = d.select("doc_id", toks.alias("toks"))
    tk = F.col("toks")
    return d.select(
        "doc_id",
        F.array_join(F.slice(tk, 1, 4), "|").alias("first4"),
        F.coalesce(
            F.array_position(tk, "the"), F.lit(0)
        ).alias("pos_the"),
        F.size(F.filter(tk, lambda x: x != "the")).cast("long").alias(
            "n_no_the"
        ),
        F.size(F.concat(F.slice(tk, 1, 2), F.slice(tk, 1, 2)))
        .cast("long")
        .alias("cat_len"),
        F.size(tk).cast("long").alias("cardinality"),
    )


@query(
    "json_populate_record",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           CAST(json_extract_string(props, '$.k') AS INT) % 7 AS k_mod,
           CAST(json_extract_string(props, '$.missing') AS INT) AS absent
    FROM events WHERE event_id < 500
    """,
)
def json_populate_record(spark, sf_dir):
    """json_populate_record / json_to_record (jsonfuncs.c:2046): parse a
    JSON object into a typed record in ONE pass — from_json with an
    explicit schema, rather than N get_json_object calls re-parsing the
    string per field. Missing keys yield typed NULLs, the PG contract."""
    e = t(spark, sf_dir, "events").where(F.col("event_id") < 500)
    rec = F.from_json(F.col("props"), "k int, missing int")
    return e.select(
        "event_id",
        rec["k"].alias("k"),
        (rec["k"] % 7).alias("k_mod"),
        rec["missing"].alias("absent"),
    )


@query(
    "quote_funcs",
    oracle="""
    SELECT n_nationkey,
           CASE WHEN regexp_matches(lower(n_name), '^[a-z_][a-z0-9_]*$')
                     AND lower(n_name) = n_name
                THEN n_name
                ELSE '"' || replace(n_name, '"', '""') || '"' END AS q_ident,
           '''' || replace(n_name, '''', '''''') || '''' AS q_literal,
           '''' || replace('it''s ' || n_name, '''', '''''') || '''' AS q_apos
    FROM nation
    """,
)
def quote_funcs(spark, sf_dir):
    """quote_ident / quote_literal (src/backend/utils/adt/quote.c):
    identifiers quote unless they are already lower-case simple names;
    literals single-quote with '' doubling. Pure string expressions."""
    n = t(spark, sf_dir, "nation")
    name = F.col("n_name")

    def quote_ident(c):
        simple = c.rlike("^[a-z_][a-z0-9_]*$") & (F.lower(c) == c)
        return F.when(simple, c).otherwise(
            F.concat(F.lit('"'), F.replace(c, F.lit('"'), F.lit('""')), F.lit('"'))
        )

    def quote_literal(c):
        return F.concat(
            F.lit("'"), F.replace(c, F.lit("'"), F.lit("''")), F.lit("'")
        )

    return n.select(
        "n_nationkey",
        quote_ident(name).alias("q_ident"),
        quote_literal(name).alias("q_literal"),
        quote_literal(F.concat(F.lit("it's "), name)).alias("q_apos"),
    )
