"""Structured Streaming parity: availableNow runs over the events fixture
must reproduce the batch window queries (which are themselves
oracle-checked against DuckDB)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gpdb_spark.catalog import load_table
from gpdb_spark.streaming.events_stream import (
    read_events_stream,
    run_to_memory,
    session_counts,
    sliding_counts,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_streaming_tumbling_matches_batch(spark, sf_dir, events_batch):
    stream = read_events_stream(spark, sf_dir)
    run_to_memory(tumbling_counts(stream), "t_tumble", output_mode="update")
    got = {
        (r.window_start, r.n)
        for r in spark.sql("select * from t_tumble").collect()
    }
    want = {
        (r.window_start, r.n)
        for r in (
            events_batch.groupBy(F.window("ts", "15 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("window_start"), "n")
        ).collect()
    }
    assert got == want


def test_streaming_sliding_matches_batch(spark, sf_dir, events_batch):
    stream = read_events_stream(spark, sf_dir)
    run_to_memory(sliding_counts(stream), "t_slide", output_mode="update")
    got = {
        (r.window_start, r.event_type, r.n)
        for r in spark.sql("select * from t_slide").collect()
    }
    want = {
        (r.window_start, r.event_type, r.n)
        for r in (
            events_batch.groupBy(
                F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n")
        ).collect()
    }
    assert got == want


def test_streaming_sessions_match_batch_sessionize(spark, sf_dir, events_batch):
    """session_window (streaming) and the lag/gap batch sessionizer must
    agree on the number of sessions per user."""
    from gpdb_spark.operators.sessionize import sessionize

    stream = read_events_stream(spark, sf_dir)
    # session_window aggregation rejects update mode (Spark 4):
    # STREAMING_OUTPUT_MODE.UNSUPPORTED_OPERATION — complete is the
    # supported replay-everything mode for this sink.
    run_to_memory(session_counts(stream), "t_sess", output_mode="complete")
    got = (
        spark.sql("select user_id, count(*) as n from t_sess group by user_id")
        .collect()
    )
    got_map = {r.user_id: r.n for r in got}

    batch = sessionize(events_batch, "user_id", "ts", "event_id", gap_minutes=30)
    want = (
        batch.groupBy("user_id")
        .agg(F.countDistinct("session_id").alias("n"))
        .collect()
    )
    want_map = {r.user_id: r.n for r in want}
    assert got_map == want_map


def test_stateful_sessions_match_batch(spark, sf_dir, events_batch):
    """The custom applyInPandasWithState sessionizer must agree with the
    batch lag/gap sessionizer on every session it finalizes (it emits only
    sessions closed by gap or timeout, so compare as a subset keyed by
    (user, start))."""
    from gpdb_spark.operators.sessionize import sessionize
    from gpdb_spark.streaming.events_stream import stateful_sessions

    stream = read_events_stream(spark, sf_dir)
    run_to_memory(
        stateful_sessions(stream, gap_minutes=30), "t_state_sess",
        output_mode="append",
    )
    got = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, round(r.sum_value, 6))
        for r in spark.sql("select * from t_state_sess").collect()
    }
    assert got, "stateful sessionizer emitted nothing"

    batch = sessionize(events_batch, "user_id", "ts", "event_id", gap_minutes=30)
    want = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, round(r.sum_value, 6))
        for r in (
            batch.groupBy("user_id", "session_id")
            .agg(
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("sum_value"),
            )
            .collect()
        )
    }
    for k, v in got.items():
        assert k in want, f"stateful session {k} not in batch sessions"
        assert want[k][:2] == v[:2], f"bounds differ for {k}: {want[k]} vs {v}"
        assert abs(want[k][2] - v[2]) < 1e-6


def test_watermark_drops_late_rows(spark, tmp_path):
    """A late row must not extend an already-finalized window in append
    mode. Watermark timing: Spark computes the new watermark at the END of
    each microbatch and applies it to the NEXT one, so the late row goes in
    batch 3 — two batches after the watermark-advancing 03:00 row."""
    import pandas as pd

    d = tmp_path / "stream_src"
    d.mkdir()
    base = pd.Timestamp("2024-01-01 00:00:00")

    def write(name, event_ids, offsets):
        pd.DataFrame(
            {
                "event_id": event_ids,
                "ts": [base + pd.Timedelta(o) for o in offsets],
                "user_id": [1] * len(event_ids),
                "event_type": ["view"] * len(event_ids),
                "value": [1.0] * len(event_ids),
                "props": ["{}"] * len(event_ids),
            }
        ).to_parquet(d / name, coerce_timestamps="us")

    # batch 1: fills the 00:00 window and advances event time to 03:00
    write("part-000.parquet", [1, 2, 3], ["0min", "10min", "3h"])
    # batch 2: any row; its planning still uses watermark 1970, but after
    # it the 02:00 watermark (03:00 - 1h) is in effect
    write("part-001.parquet", [4], ["3h5min"])
    # batch 3: the late 00:05 row — behind the 02:00 watermark, dropped
    write("part-002.parquet", [5, 6], ["5min", "3h10min"])

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {(r.ws.isoformat(), r.n) for r in spark.sql("select * from t_late").collect()}
    # the 00:00 window was finalized with 2 rows after batch 1's watermark
    # (02:00); the late 00:05 event in batch 2 must NOT appear as an update.
    assert ("2024-01-01T00:00:00", 2) in rows
    assert ("2024-01-01T00:00:00", 3) not in rows


def test_streaming_dedup_within_watermark(spark, tmp_path, events_batch):
    """Duplicates split across separate micro-batches (maxFilesPerTrigger=1)
    must still dedup via cross-batch state within the watermark."""
    from gpdb_spark.streaming.events_stream import dedup_stream, run_to_memory

    sub = events_batch.select("event_id", "user_id", "event_type", "ts").limit(2000)
    sub.coalesce(1).write.parquet(str(tmp_path / "in" / "a"))
    sub.coalesce(1).write.parquet(str(tmp_path / "in" / "b"))  # exact copy
    stream = (
        spark.readStream.schema(sub.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(tmp_path / "in"))
    )
    run_to_memory(
        dedup_stream(stream, ["event_id"]), "t_dedup", output_mode="append"
    )
    got = spark.sql("select count(*) as n from t_dedup").collect()[0].n
    want = sub.select("event_id").distinct().count()
    assert got == want


def test_stream_static_join(spark, sf_dir, events_batch):
    """Stream-to-static dimension join (the streaming twin of the
    REPLICATED-table broadcast join): per-batch hash join against the
    static side, no state required; result must match the batch join."""
    from gpdb_spark.streaming.events_stream import read_events_stream, run_to_memory

    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.1), ("purchase", 10.0)],
        "event_type string, weight double",
    )
    stream = read_events_stream(spark, sf_dir)
    joined = (
        stream.join(dim, "event_type")
        .groupBy("event_type")
        .agg(F.sum("weight").alias("total_w"), F.count(F.lit(1)).alias("n"))
    )
    run_to_memory(joined, "t_ssj", output_mode="complete")
    got = {
        (r.event_type, round(r.total_w, 6), r.n)
        for r in spark.sql("select * from t_ssj").collect()
    }
    want = {
        (r.event_type, round(r.total_w, 6), r.n)
        for r in events_batch.join(dim, "event_type")
        .groupBy("event_type")
        .agg(F.sum("weight").alias("total_w"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and len(got) == 3


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, events_batch):
    """Stream-stream interval join (clicks x purchases within 15 min per
    user) must equal the same join run in batch — watermarked state on
    both sides, time-bounded condition."""
    from gpdb_spark.streaming.events_stream import (
        read_events_stream,
        run_to_memory,
        stream_stream_interval_join,
    )

    stream = read_events_stream(spark, sf_dir)
    joined = stream_stream_interval_join(
        stream.where(F.col("event_type") == "click"),
        stream.where(F.col("event_type") == "purchase"),
    )
    run_to_memory(joined, "ss_join", output_mode="append")
    got = {
        (r.user_id, r.l_ts, r.r_ts, r.l_value, r.r_value)
        for r in spark.sql("select * from ss_join").collect()
    }

    b = events_batch
    l = b.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("l_user"), F.col("ts").alias("l_ts"),
        F.col("value").alias("l_value"),
    )
    r = b.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("r_user"), F.col("ts").alias("r_ts"),
        F.col("value").alias("r_value"),
    )
    want = {
        (x.l_user, x.l_ts, x.r_ts, x.l_value, x.r_value)
        for x in l.join(
            r,
            (F.col("l_user") == F.col("r_user"))
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 900 SECONDS")),
        ).collect()
    }
    assert got == want and len(got) > 0


def test_continuous_aggregate_matview(spark, tmp_path):
    """Streaming continuous aggregate: finalized windows land in a
    partitioned parquet matview exactly once; late rows behind the
    watermark never disturb written partitions; re-running from the
    same checkpoint does not duplicate."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from gpdb_spark.streaming.events_stream import continuous_aggregate

    d = tmp_path / "ca_src"
    d.mkdir()
    base = pd.Timestamp("2024-01-01 00:00:00")

    def write(name, event_ids, offsets, values):
        pd.DataFrame(
            {
                "event_id": event_ids,
                "ts": [base + pd.Timedelta(o) for o in offsets],
                "user_id": [1] * len(event_ids),
                "event_type": ["view"] * len(event_ids),
                "value": values,
                "props": ["{}"] * len(event_ids),
            }
        ).to_parquet(d / name, coerce_timestamps="us")

    write("p0.parquet", [1, 2], ["5min", "20min"], [1.0, 2.0])

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    src = spark.readStream.schema(schema).parquet(str(d))
    agg = (
        src.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.sum("value").alias("total"), F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w").start.alias("window_start"),
            "event_type",
            "total",
            "n",
        )
    )
    mv = str(tmp_path / "matview")
    ck = str(tmp_path / "ck")
    q = continuous_aggregate(agg, mv, ck).trigger(availableNow=True).start()
    q.awaitTermination(120)
    # hour 0 not finalized yet -> matview empty or missing
    import os

    # advance event time past hour 0 + watermark; hour 0 finalizes
    write("p1.parquet", [3], ["2h"], [5.0])
    q = continuous_aggregate(agg, mv, ck).trigger(availableNow=True).start()
    q.awaitTermination(120)
    got = {
        (r.window_start.isoformat(), r.event_type): (r.total, r.n)
        for r in spark.read.parquet(mv).collect()
    }
    assert got == {("2024-01-01T00:00:00", "view"): (3.0, 2)}

    # a late row for hour 0 (behind watermark) must not change the matview;
    # advancing further finalizes hour 2
    write("p2.parquet", [4, 5], ["25min", "4h"], [100.0, 7.0])
    q = continuous_aggregate(agg, mv, ck).trigger(availableNow=True).start()
    q.awaitTermination(120)
    got = {
        (r.window_start.isoformat(), r.event_type): (r.total, r.n)
        for r in spark.read.parquet(mv).collect()
    }
    assert got == {
        ("2024-01-01T00:00:00", "view"): (3.0, 2),
        ("2024-01-01T02:00:00", "view"): (5.0, 1),
    }


def test_streaming_upsert_sink(spark, sf_dir, tmp_path):
    """foreachBatch MERGE: the stream's running per-user aggregate is
    continuously upserted into a keyed GpTable; final table state equals
    the batch aggregate over the same data."""
    from pyspark.sql import functions as F

    from gpdb_spark.storage import GpTable
    from gpdb_spark.streaming.events_stream import read_events_stream, upsert_sink

    seed = spark.createDataFrame(
        [], "user_id long, n long, total double"
    )
    t = GpTable.create(
        seed, str(tmp_path / "user_state"), distributed_by=("user_id",)
    )
    events = read_events_stream(spark, sf_dir, max_files_per_trigger=1)
    agg = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(25,6)")), 6)
        .cast("double")
        .alias("total"),
    )
    q = upsert_sink(
        agg, t, ["user_id"], str(tmp_path / "ckpt")
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    from gpdb_spark.catalog import load_table

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(25,6)")), 6)
            .cast("double")
            .alias("total"),
        )
    )
    got = {r["user_id"]: (r["n"], r["total"]) for r in t.read(spark).collect()}
    want = {r["user_id"]: (r["n"], r["total"]) for r in batch.collect()}
    assert got == want


def test_streaming_lm_scores_match_batch(spark, sf_dir, tmp_path):
    """Documents streamed through lm_scored_stream against a static
    model must score identically to the batch lm_quality."""
    from gpdb_spark.datapipe.lm import lm_quality, train_bigram_lm
    from gpdb_spark.streaming.events_stream import lm_scored_stream, run_to_memory

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(50)
    )
    vocab, bi = train_bigram_lm(docs, "text")
    vocab, bi = vocab.cache(), bi.cache()
    batch = {r.doc_id: r for r in lm_quality(docs, vocab, bi).collect()}

    d = tmp_path / "docs_stream"
    docs.write.parquet(str(d))
    src = spark.readStream.schema(docs.schema).parquet(str(d))
    out = lm_scored_stream(src, vocab, bi)
    run_to_memory(out, "lm_scored", output_mode="complete")
    got = {r.doc_id: r for r in spark.table("lm_scored").collect()}
    assert set(got) == set(batch)
    for k in batch:
        assert (got[k].n_pairs, got[k].nll_sum_micro, got[k].avg_nll_milli) == (
            batch[k].n_pairs, batch[k].nll_sum_micro, batch[k].avg_nll_milli)


def test_streaming_chunker_matches_batch(spark, sf_dir):
    """Streamed chunk+quality-filter output must equal the batch operator
    applied to the same files (stateless pipeline => exact parity)."""
    from gpdb_spark.datapipe.chunking import chunk_documents
    from gpdb_spark.datapipe.text import quality_features
    from gpdb_spark.registry import t
    from gpdb_spark.streaming.docs_stream import (
        chunked_stream,
        read_documents_stream,
    )
    from gpdb_spark.streaming.events_stream import run_to_memory

    stream = read_documents_stream(spark, sf_dir)
    run_to_memory(chunked_stream(stream), "t_chunks", output_mode="append")
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_start"], r["chunk_text"])
        for r in spark.sql("SELECT * FROM t_chunks").collect()
    }
    batch_docs = t(spark, sf_dir, "documents")
    kept = (
        quality_features(batch_docs)
        .where(F.col("n_tokens") >= 5)
        .select("doc_id", "text")
    )
    want = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_start"], r["chunk_text"])
        for r in chunk_documents(kept).collect()
    }
    assert got == want and len(got) > 0


def test_stateful_sessions_late_event_keeps_bounds(spark, tmp_path):
    """Review regression: a late (in-watermark) out-of-order event must
    extend session bounds monotonically — never move `last` backwards
    (which split sessions and could set a timeout below the watermark)."""
    import pandas as pd

    import os as _os

    from gpdb_spark.streaming.events_stream import (
        run_to_memory,
        stateful_sessions,
    )

    src = str(tmp_path / "src")
    _os.makedirs(src)
    # one user; events arrive out of order inside one file/batch after
    # state exists: 10:00, 10:10 then a late 10:05, then 10:39 — the
    # 10:39 gap must be measured from last=10:10 (29 min < 30) so ALL
    # events are one session; the buggy code closed it at 10:05+30.
    df0 = pd.DataFrame(
        {
            "user_id": [1, 1],
            "ts": pd.to_datetime(["2024-01-01 10:00:00",
                                  "2024-01-01 10:10:00"]),
            "value": [1.0, 1.0],
        }
    )
    df0.to_parquet(f"{src}/b0.parquet", coerce_timestamps="us")
    df1 = pd.DataFrame(
        {
            "user_id": [1, 1],
            "ts": pd.to_datetime(["2024-01-01 10:05:00",
                                  "2024-01-01 10:39:00"]),
            "value": [1.0, 1.0],
        }
    )
    df1.to_parquet(f"{src}/b1.parquet", coerce_timestamps="us")

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    sessions = stateful_sessions(stream, gap_minutes=30, watermark="2 hours")
    run_to_memory(sessions, "late_sessions", output_mode="append")
    # nothing may be EMITTED yet (no session closed: all 4 events merge
    # into one open session) — the buggy version emitted a split session
    closed = spark.sql("SELECT * FROM late_sessions").collect()
    assert closed == [], closed
