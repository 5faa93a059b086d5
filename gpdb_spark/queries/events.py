"""Time-series queries over the events table.

The reference is batch-only (SURVEY.md §2.11): its time-series surface is
window functions + linear_interpolate (interpolate.c) over ordered tables.
These queries cover that batch surface; the streaming capability extension
(real watermarks/session windows over an unbounded source) lives in
gpdb_spark.streaming and is exercised by tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gpdb_spark.registry import _usum, fr, DEC, dsum, oavg, osum, query, t

GAP_US = 30 * 60 * 1_000_000


@query(
    "events_time_buckets",
    oracle=f"""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
           event_type, count(*) AS n, {osum('value')} AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def events_time_buckets(spark, sf_dir):
    """Hourly bucketing via date_trunc (timestamp.c:4561)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("hour_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
    )


@query(
    "events_tumbling_window",
    oracle=f"""
    SELECT CAST(time_bucket(INTERVAL '15 minutes', ts) AS TIMESTAMP) AS window_start,
           count(*) AS n, {osum('value')} AS sum_value
    FROM events GROUP BY 1
    """,
)
def events_tumbling_window(spark, sf_dir):
    """Tumbling window via F.window — the Structured-Streaming-compatible
    form (same expression works under readStream; see gpdb_spark.streaming)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


@query(
    "events_sliding_window",
    oracle=f"""
    SELECT CAST(ws AS TIMESTAMP) AS window_start, event_type, count(*) AS n,
           {osum('value')} AS sum_value
    FROM (
        SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                       time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
               AS ws,
               event_type, value
        FROM events
    ) x
    GROUP BY 1, 2
    """,
)
def events_sliding_window(spark, sf_dir):
    """Sliding window (1h window, 30m slide): each event lands in 2
    windows. Spark's F.window(slideDuration) expands rows exactly like the
    oracle's unnest of the two aligned window starts."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


@query(
    "events_sessionize",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {GAP_US}
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, event_id, ts, value,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end,
           {osum('value')} AS sum_value
    FROM sessions GROUP BY user_id, session_id
    """,
)
def events_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-minute inactivity) — batch parity for
    session windows (gpdb_spark.operators.sessionize)."""
    from gpdb_spark.operators.sessionize import sessionize

    e = t(spark, sf_dir, "events")
    s = sessionize(e, "user_id", "ts", order_tiebreak="event_id", gap_minutes=30)
    return (
        s.groupBy("user_id", F.col("session_id").cast("long").alias("session_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            dsum("value").alias("sum_value"),
        )
    )


@query(
    "events_linear_interpolate",
    oracle=f"""
    WITH pts AS (
        SELECT user_id, event_id, ts, value, event_type,
               CASE WHEN event_type <> 'error'
                    THEN {{'x': CAST(epoch_us(ts) AS DOUBLE), 'y': value}} END AS pt,
               CAST(epoch_us(ts) AS DOUBLE) AS x
        FROM events WHERE user_id < 200
    ), nb AS (
        SELECT user_id, event_id, x, event_type, value,
               last_value(pt IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p0,
               first_value(pt IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS p1
        FROM pts
    )
    SELECT user_id, event_id,
           (floor(CASE
             WHEN p0 IS NULL AND p1 IS NULL THEN NULL
             WHEN p0 IS NULL THEN struct_extract(p1, 'y')
             WHEN p1 IS NULL THEN struct_extract(p0, 'y')
             WHEN struct_extract(p1, 'x') = struct_extract(p0, 'x')
               THEN struct_extract(p0, 'y')
             ELSE struct_extract(p0, 'y')
                  + (struct_extract(p1, 'y') - struct_extract(p0, 'y'))
                    * (x - struct_extract(p0, 'x'))
                    / (struct_extract(p1, 'x') - struct_extract(p0, 'x'))
           END * 1e6) / 1e6) AS value_interp
    FROM nb
    """,
)
def events_linear_interpolate(spark, sf_dir):
    """linear_interpolate (interpolate.c:253-546): treat 'error' events as
    missing and fill their value from the nearest non-error neighbors."""
    from gpdb_spark.operators.interpolate import linear_interpolate

    e = t(spark, sf_dir, "events").where(F.col("user_id") < 200)
    out = linear_interpolate(
        e,
        part_col="user_id",
        ts_col="ts",
        value_col="value",
        missing=F.col("event_type") == "error",
        order_tiebreak="event_id",
    )
    return out.select("user_id", "event_id", "value_interp")


@query(
    "events_type_pivot",
    oracle=f"""
    SELECT user_id,
           CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click_n,
           CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view_n,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase_n,
           CAST(round(sum(CASE WHEN event_type = 'purchase'
                     THEN CAST(value AS DECIMAL(25,6)) ELSE CAST(0 AS DECIMAL(25,6)) END),
                 2) AS DOUBLE) AS purchase_value
    FROM events WHERE user_id < 100
    GROUP BY user_id
    """,
)
def events_type_pivot(spark, sf_dir):
    """PIVOT (pivot.c pivot_accum analog) — df.groupBy().pivot() reshaped
    to fixed columns."""
    e = t(spark, sf_dir, "events").where(F.col("user_id") < 100)
    zero = F.lit(0).cast(DEC)
    return e.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("click_n"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("view_n"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchase_n"),
        F.round(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.col("value").cast(DEC)
                ).otherwise(zero)
            ),
            2,
        )
        .cast("double")
        .alias("purchase_value"),
    )


@query(
    "events_asof_join",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), views AS (
        SELECT user_id, ts, max(value) AS vvalue
        FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    )
    SELECT c.event_id, c.user_id, c.ts,
           round(v.vvalue, 6) AS view_value,
           v.ts AS ts_right
    FROM clicks c
    ASOF LEFT JOIN views v ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
)
def events_asof_join(spark, sf_dir):
    """As-of join (absent from the reference — SURVEY.md §2.3): each click
    paired with the user's latest view at-or-before it. One key-shuffle
    union + last(ignorenulls) window — no range-explosion; DuckDB's native
    ASOF JOIN is the oracle."""
    from gpdb_spark.operators.asof import asof_join

    e = t(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("vvalue"))
    )
    out = asof_join(clicks, views, on="ts", by="user_id")
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("vvalue"), 6).alias("view_value"),
        "ts_right",
    )


@query(
    "events_interval_join",
    oracle="""
    SELECT l.user_id, l.ts AS l_ts, r.ts AS r_ts,
           round(l.value, 6) AS l_value, round(r.value, 6) AS r_value
    FROM events l
    JOIN events r
      ON l.user_id = r.user_id
     AND l.event_type = 'click' AND r.event_type = 'purchase'
     AND r.ts >= l.ts
     AND r.ts <= l.ts + INTERVAL 15 MINUTE
    """,
)
def events_interval_join(spark, sf_dir):
    """Batch twin of the stream-stream interval join (click x purchase
    within 15 min per user, streaming/events_stream.py
    stream_stream_interval_join): equi-key on user_id carries the
    shuffle, the time bound is a residual filter — so this plans as a
    shuffled hash join, not a nested loop, and the identical condition
    bounds streaming join state via watermarks."""
    e = t(spark, sf_dir, "events")
    l = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("l_ts"), F.col("value").alias("lv")
    )
    r = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("r_user"),
        F.col("ts").alias("r_ts"),
        F.col("value").alias("rv"),
    )
    return (
        l.join(
            r,
            (F.col("user_id") == F.col("r_user"))
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 15 MINUTES")),
        )
        .select(
            "user_id",
            "l_ts",
            "r_ts",
            F.round("lv", 6).alias("l_value"),
            F.round("rv", 6).alias("r_value"),
        )
    )


@query(
    "events_gapfill_locf",
    # dense hourly axis per event_type over the global [min,max] bucket
    # range; empty buckets synthesized and LOCF-filled (leading gaps
    # stay NULL) — timescale-style time_bucket_gapfill + locf()
    oracle=f"""
    WITH actual AS (
        SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
               {oavg('value', 4)} AS value
        FROM events GROUP BY 1, 2
    ), bounds AS (
        SELECT CAST(min(date_trunc('hour', ts)) AS TIMESTAMP) AS lo,
               CAST(max(date_trunc('hour', ts)) AS TIMESTAMP) AS hi
        FROM events
    ), axis AS (
        SELECT p.event_type, CAST(g.b AS TIMESTAMP) AS bucket
        FROM (SELECT DISTINCT event_type FROM events) p
        CROSS JOIN (SELECT unnest(generate_series(
            (SELECT lo FROM bounds), (SELECT hi FROM bounds),
            INTERVAL '1 hour')) AS b) g
    )
    SELECT a.event_type, a.bucket,
           last_value(ac.value IGNORE NULLS) OVER (
               PARTITION BY a.event_type ORDER BY a.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
           ac.value IS NULL AS is_gap
    FROM axis a LEFT JOIN actual ac
      ON a.event_type = ac.event_type AND a.bucket = ac.bucket
    """,
)
def events_gapfill_locf(spark, sf_dir):
    """time_bucket + gapfill + LOCF as one declarative operator
    (operators/gapfill.py): dense bucket axis from sequence()+explode —
    no driver collect — LEFT JOIN actuals, window last(ignorenulls)
    fill. Output cardinality = |types| x |hours|, independent of input
    row count."""
    from gpdb_spark.operators.gapfill import time_bucket_gapfill

    e = t(spark, sf_dir, "events")
    return time_bucket_gapfill(
        e,
        part_col="event_type",
        ts_col="ts",
        measure=fr(
            # r11: split-long exact sum (same value as the DECIMAL(25,6) path)
            _usum(F.col("value")).cast("double") / F.count(F.lit(1)), 4
        ),
        width_seconds=3600,
        fill="locf",
    )


@query(
    "events_funnel",
    # ordered 3-stage funnel: first view -> first click strictly after
    # it -> first purchase strictly after that, per user; stage counts +
    # ppm conversion from the previous stage (integer math).
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t1
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t2
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ), counts AS (
        SELECT (SELECT count(*) FROM v) AS n1,
               (SELECT count(*) FROM c) AS n2,
               (SELECT count(*) FROM p) AS n3
    )
    SELECT stage, n_users, conv_ppm FROM (
        SELECT 1 AS stage, 'view' AS _s, n1 AS n_users,
               CAST(1000000 AS BIGINT) AS conv_ppm FROM counts
        UNION ALL
        SELECT 2, 'click', n2, CAST(n2 * 1000000 // greatest(n1, 1) AS BIGINT)
        FROM counts
        UNION ALL
        SELECT 3, 'purchase', n3, CAST(n3 * 1000000 // greatest(n2, 1) AS BIGINT)
        FROM counts
    ) s
    """,
)
def events_funnel(spark, sf_dir):
    """Ordered conversion funnel (view -> click -> purchase, strictly
    increasing timestamps per user) — the event-analytics staple.

    r11 replaced the 3-join/3-action shape with one collect_list
    aggregation; r12 (guide §5 bounded per-group state) removes the
    collect_list: a hot user (bot traffic) would grow one aggregation
    buffer without bound at 100 TB. The funnel first-hits are running
    minima, so ONE window pass (partition user_id, order ts, running
    frame — streaming O(1) state per group, partition rows spill-safe)
    derives them, and the per-user groupBy reuses the window's hash
    partitioning shuffle-free (§2.4): still one scan + one exchange.

    Value identity (strict inequalities make tie order irrelevant):
    v_min at a click row is the min view-ts over rows at-or-before it
    in ts order, so v_min < ts ⟺ t1 < ts — equal-ts views fail the
    strict test whether or not the frame includes them, and any view
    with ts' < ts sorts strictly earlier and is always included. The
    same argument gives c_min < ts ⟺ t2 < ts at purchase rows. The
    stage-k user set {t_k IS NOT NULL} is exactly the oracle's stage-k
    join output, and the ppm math is unchanged integer division."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_view = F.col("event_type") == "view"
    staged = (
        e.where(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "ts", "event_type")
        .withColumn("v_min", F.min(F.when(is_view, F.col("ts"))).over(w))
        .withColumn(
            "c_ok",
            (F.col("event_type") == "click") & (F.col("v_min") < F.col("ts")),
        )
        .withColumn("c_min", F.min(F.when(F.col("c_ok"), F.col("ts"))).over(w))
        .withColumn(
            "p_ok",
            (F.col("event_type") == "purchase")
            & (F.col("c_min") < F.col("ts")),
        )
        .groupBy("user_id")
        .agg(
            F.min(F.when(is_view, F.col("ts"))).alias("t1"),
            F.min(F.when(F.col("c_ok"), F.col("ts"))).alias("t2"),
            F.min(F.when(F.col("p_ok"), F.col("ts"))).alias("t3"),
        )
    )
    n1, n2, n3 = staged.agg(
        F.count("t1"), F.count("t2"), F.count("t3")
    ).collect()[0]
    rows = [
        (1, n1, 1000000),
        (2, n2, n2 * 1000000 // max(n1, 1)),
        (3, n3, n3 * 1000000 // max(n2, 1)),
    ]
    return spark.createDataFrame(rows, "stage int, n_users long, conv_ppm long")


@query(
    "events_retention_cohorts",
    # cohort = first-seen day; retention = distinct users active again
    # k days later, as ppm of the cohort (integer math)
    oracle="""
    WITH first_seen AS (
        SELECT user_id, CAST(min(date_trunc('day', ts)) AS TIMESTAMP) AS cohort
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT e.user_id, f.cohort,
               date_diff('day', f.cohort, date_trunc('day', e.ts)) AS day_k
        FROM events e JOIN first_seen f ON f.user_id = e.user_id
    ), sizes AS (
        SELECT cohort, count(*) AS cohort_n FROM first_seen GROUP BY cohort
    )
    SELECT a.cohort, CAST(a.day_k AS INT) AS day_k,
           CAST(count(*) AS BIGINT) AS active_users,
           CAST(count(*) * 1000000 // s.cohort_n AS BIGINT) AS retention_ppm
    FROM activity a JOIN sizes s ON s.cohort = a.cohort
    WHERE a.day_k <= 7
    GROUP BY a.cohort, a.day_k, s.cohort_n
    """,
)
def events_retention_cohorts(spark, sf_dir):
    """Cohort retention matrix (first-seen-day cohorts x day offset,
    ppm of cohort active on day k) — the second event-analytics staple
    next to the funnel. Two keyed aggregations + one broadcast-able
    cohort-size join; the matrix is |cohorts| x k rows regardless of
    event volume."""
    e = t(spark, sf_dir, "events")
    first = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d")
    ).groupBy("user_id").agg(F.min("d").alias("cohort"))
    activity = (
        e.select("user_id", F.date_trunc("day", F.col("ts")).alias("d"))
        .join(first, "user_id")
        .select(
            "user_id",
            "cohort",
            F.datediff(F.col("d"), F.col("cohort")).alias("day_k"),
        )
        .distinct()
    )
    sizes = first.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_n"))
    return (
        activity.where(F.col("day_k") <= 7)
        .groupBy("cohort", "day_k")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            F.col("day_k").cast("int"),
            F.col("active_users").cast("long"),
            F.expr("CAST(active_users * 1000000 DIV cohort_n AS BIGINT)").alias(
                "retention_ppm"
            ),
        )
    )
