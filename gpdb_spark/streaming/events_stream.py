"""Structured Streaming over the events schema — the capability extension
beyond the batch-only reference (SURVEY.md §2.11, §7 phase 6).

The batch queries in gpdb_spark/queries/events.py and these streaming
builders share window semantics: F.window / F.session_window produce the
same buckets in both modes, so batch results are the oracle for the
stream (tests/test_streaming.py runs availableNow triggers against the
parquet fixture and compares).

Scale notes: streaming aggregations keyed by (window, ...) shuffle on the
group key per microbatch; watermarks bound state size — without one,
window state grows forever. Session windows use Spark's native
session_window merge (state per user, merged on gap overlap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# events.parquet physical schema: ts is TIMESTAMP(NANOS) which Spark reads
# as long under the legacy conf (see gpdb_spark.catalog.load_table).
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # nanos-as-long
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """readStream over the events parquet directory with the same ts
    normalization as the batch reader (catalog.load_table): nanos-as-long
    fixtures get integer-division truncation to micros; NTZ-micros
    fixtures get a value-preserving cast under the UTC session TZ. The
    file's actual schema is probed with a metadata-only batch read because
    the streaming source requires an explicit schema."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probe = (
        spark.read.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    )
    reader = spark.readStream.schema(probe.schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # restrict to the events file — a bare sf_dir would ingest every
    # fixture table in the directory (their rows surface as null-ts junk);
    # the streaming file source requires a directory path, so filter by glob
    df = reader.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    ts_type = dict(probe.dtypes).get("ts")
    if ts_type == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_type != "timestamp":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def tumbling_counts(
    events: DataFrame, window: str = "15 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Tumbling-window counts with late-data bound — the streaming twin of
    queries/events.py::events_tumbling_window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows (gap-merged state) — streaming twin of the
    batch sessionize operator."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("user_id"),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
SESSION_STATE_SCHEMA = (
    "start long, last long, n long, sum_value double"
)


def stateful_sessions(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """Custom stateful streaming operator: gap-based sessionization with
    explicit per-user state via applyInPandasWithState — the
    capability-extension analog of a hand-written stateful executor node
    (the reference has none; SURVEY.md §2.11).

    Differs from the built-in session_window by carrying custom per-state
    aggregates and emitting ONLY finalized sessions: a session closes when
    a later event arrives past the gap, or when event-time timeout fires
    (watermark passed session end + gap) — so emitted rows are immutable,
    suitable for append-mode sinks at scale (state size = O(active users),
    bounded by the watermark).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdf_iter, state):
        user_id = key[0]
        if state.hasTimedOut:
            if state.exists:
                start, last, n, sv = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "session_start": [pd.Timestamp(start, unit="us")],
                        "session_end": [pd.Timestamp(last, unit="us")],
                        "n_events": [n],
                        "sum_value": [sv],
                    }
                )
            return

        rows = []
        if state.exists:
            start, last, n, sv = state.get
        else:
            start = last = n = None
            sv = 0.0
        for pdf in pdf_iter:
            pdf = pdf.sort_values("ts")
            for ts, value in zip(pdf["ts"], pdf["value"]):
                us = int(ts.value // 1000)  # pandas ns -> us
                if start is None:
                    start, last, n, sv = us, us, 1, float(value)
                elif us - last > gap_us:
                    rows.append((user_id, start, last, n, sv))
                    start, last, n, sv = us, us, 1, float(value)
                else:
                    # late (in-watermark) events can arrive with us <
                    # last when the state spans batches: extend the
                    # session bounds monotonically — moving `last`
                    # backwards would split sessions wrongly and could
                    # set a timeout timestamp below the watermark
                    # (Spark rejects that with IllegalArgumentException)
                    start = min(start, us)
                    last = max(last, us)
                    n, sv = n + 1, sv + float(value)
        if start is not None:
            state.update((start, last, n, sv))
            state.setTimeoutTimestamp((last + gap_us) // 1000)
        if rows:
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in rows],
                    "session_start": [pd.Timestamp(r[1], unit="us") for r in rows],
                    "session_end": [pd.Timestamp(r[2], unit="us") for r in rows],
                    "n_events": [r[3] for r in rows],
                    "sum_value": [r[4] for r in rows],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_OUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "update"
) -> None:
    """Drain an availableNow trigger into an in-memory sink (test/dev
    harness; production would writeStream to parquet/kafka)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_stream(
    df: DataFrame,
    keys: list[str] | tuple[str, ...],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup — the continuous-ingest twin of
    datapipe.dedup.exact_dedup (the reference has no streaming surface at
    all, SURVEY.md §2.11; its closest analog is re-reading external web
    tables).

    dropDuplicatesWithinWatermark keeps per-key state only inside the
    watermark horizon, so state is bounded by (ingest rate x watermark)
    instead of growing with the full corpus — the property that makes
    exactly-once dedup viable on an unbounded 100 TB/day feed. Duplicates
    arriving later than the watermark are a documented miss (same
    contract as any late-data window)."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    interval_seconds: int = 900,
    watermark: str = "1 hour",
    join_type: str = "inner",
) -> DataFrame:
    """Stream-stream join on user_id within a time bound: each left event
    pairs with right events in [left.ts, left.ts + interval].

    Both sides carry watermarks and the join condition bounds event time
    in BOTH directions, so Spark can expire join state once the watermark
    passes the interval — the state-bounding requirement for running a
    stream-stream join forever (without it, both sides buffer
    unboundedly). The reference has no streaming surface; its closest
    batch analog is the theta/interval join (SURVEY.md §2.3), whose batch
    form is this join's parity oracle in tests."""
    l = left.withWatermark("ts", watermark).select(
        F.col("user_id").alias("l_user"),
        F.col("ts").alias("l_ts"),
        F.col("event_type").alias("l_type"),
        F.col("value").alias("l_value"),
    )
    r = right.withWatermark("ts", watermark).select(
        F.col("user_id").alias("r_user"),
        F.col("ts").alias("r_ts"),
        F.col("event_type").alias("r_type"),
        F.col("value").alias("r_value"),
    )
    cond = (
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (
            F.col("r_ts")
            <= F.col("l_ts") + F.expr(f"INTERVAL {interval_seconds} SECONDS")
        )
    )
    return l.join(r, cond, join_type).select(
        F.col("l_user").alias("user_id"), "l_ts", "r_ts", "l_value", "r_value"
    )


def continuous_aggregate(
    agg_df,
    path: str,
    checkpoint: str,
    partition_col: str = "window_start",
):
    """Continuous aggregate / incrementally-maintained materialized view
    (the hypertable-rollup analog; reference matviews are full-refresh
    only, commands/matview.c — this is the streaming upgrade).

    ``agg_df`` must be a watermarked windowed aggregation in APPEND mode
    (windows emit exactly once, when finalized). Each microbatch writes
    its finalized windows into the parquet matview with DYNAMIC PARTITION
    OVERWRITE on ``partition_col``: re-delivery of a batch after a crash
    rewrites the same partitions with the same data, making the sink
    idempotent — end-to-end exactly-once without a transaction log.

    Scale shape: one partition directory per emitted window; readers of
    the matview get partition pruning on ``partition_col`` for free.
    """

    def write_batch(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        (
            batch_df.sparkSession.conf.set(
                "spark.sql.sources.partitionOverwriteMode", "dynamic"
            )
        )
        (
            batch_df.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(path)
        )

    return (
        agg_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
    )


def upsert_sink(
    stream_df,
    table,
    conflict_keys: list[str],
    checkpoint: str,
    update_cols: list[str] | None = None,
):
    """Streaming MERGE: each microbatch upserts into a keyed GpTable
    (storage.GpTable.upsert — the INSERT ON CONFLICT DO UPDATE rewrite),
    giving a continuously-maintained dimension/state table the reference
    can only build with batch DML.

    Exactly-once discipline: upsert IDEMPOTENCE is the recovery
    guarantee — a replayed batch re-applies the same keys with the same
    incoming values, a no-op on the final state. The in-memory
    ``applied`` set only short-circuits duplicate deliveries within one
    run; it does not survive restart (post-recovery correctness rests
    on idempotence alone) — foreachBatch's standard at-least-once ->
    effectively-once pattern. Per batch the work is one
    key-join rewrite; at scale the join is hash-partitioned on the
    conflict key, the same shuffle a batch MERGE costs.
    """
    applied: set[int] = set()

    def _apply(batch_df, batch_id: int) -> None:
        if batch_id in applied or batch_df.isEmpty():
            return
        table.upsert(
            batch_df.sparkSession,
            batch_df,
            conflict_keys,
            update_cols=update_cols,
        )
        applied.add(batch_id)

    return (
        stream_df.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(_apply)
    )


def lm_scored_stream(docs_stream: DataFrame, vocab: DataFrame, bigrams: DataFrame,
                     id_col: str = "doc_id", text_col: str = "text",
                     vocab_size: int | None = None) -> DataFrame:
    """Streaming LM quality scoring: incoming documents scored against a
    STATIC bigram model (datapipe/lm.py) — the stream-static broadcast
    join shape. The model side is bounded by construction (top-V/top-B),
    so each microbatch joins against a broadcast and the per-doc
    aggregation is contained within the batch (every doc arrives whole;
    no cross-batch state, no watermark needed). This is the online
    ingest-filtering half of the CCNet pipeline: train the model on the
    existing corpus offline, score new documents as they land.

    Returns a streaming DataFrame with (id, n_pairs, nll_sum_micro,
    avg_nll_milli) per document — identical values to the batch
    lm_quality (asserted in tests/test_streaming.py)."""
    from pyspark.sql.functions import broadcast

    from gpdb_spark.datapipe.lm import DEFAULT_VOCAB_SIZE, _pairs

    # the smoothing denominator MUST match the V the model was trained
    # with (lm.py: a mismatched V silently skews every score) — share
    # the batch default instead of hard-coding it
    if vocab_size is None:
        vocab_size = DEFAULT_VOCAB_SIZE
    pr = _pairs(docs_stream, id_col, text_col)
    bi = broadcast(bigrams.select("w1", "w2", F.col("c").alias("cb")))
    un = broadcast(vocab.select(F.col("w").alias("w1"), F.col("c").alias("cu")))
    logp = F.log(
        (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(1.0))
        / (F.coalesce(F.col("cu"), F.lit(0)) + F.lit(float(vocab_size)))
    )
    scored = (
        pr.join(bi, ["w1", "w2"], "left")
        .join(un, ["w1"], "left")
        .select("_id", F.floor(logp * F.lit(1_000_000.0)).alias("lp"))
        .groupBy("_id")
        .agg(F.count("*").alias("n_pairs"), (-F.sum("lp")).alias("nll_sum_micro"))
    )
    return scored.select(
        F.col("_id").alias(id_col),
        "n_pairs",
        "nll_sum_micro",
        F.floor(
            F.col("nll_sum_micro") / (F.lit(1000.0) * F.col("n_pairs"))
        ).cast("bigint").alias("avg_nll_milli"),
    )
