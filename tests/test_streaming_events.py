"""Streaming event operators: watermarked windowed aggregation emits
exactly the batch-computable closed windows; applyInPandasWithState
sessionization's closed sessions reconcile with the batch lag-window twin
(closed + 1 open per active user == batch n_sessions)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rapidocr_spark.plans.events import ev_user_sessions
from rapidocr_spark.streaming.events import (
    read_event_stream, sessionize_stream, windowed_type_counts,
)

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


def _run_stream(df, tmp_path, name):
    out = str(tmp_path / f"{name}_out")
    ckpt = str(tmp_path / f"{name}_ckpt")
    q = (
        df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return out


def test_windowed_counts_match_batch_closed_windows(spark, tmp_path):
    in_dir = str(tmp_path / "ev_in")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    events.write.parquet(in_dir)

    stream = windowed_type_counts(read_event_stream(spark, in_dir))
    out = _run_stream(stream, tmp_path, "win")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }

    # batch twin over the same data; append mode emits only windows whose
    # end <= final watermark (max ts - 30 min)
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    batch = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias("s"),
        )
        .select(F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "event_type", "n", "s")
        .collect()
    )
    import datetime

    horizon = max_ts - datetime.timedelta(minutes=30)
    want = {
        (r["ws"], r["event_type"]): (r["n"], r["s"])
        for r in batch
        if r["we"] <= horizon
    }
    assert len(want) > 0
    assert got == want


def test_stateful_sessionize_reconciles_with_batch(spark, tmp_path):
    in_dir = str(tmp_path / "sess_in")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    events.write.parquet(in_dir)

    closed = sessionize_stream(read_event_stream(spark, in_dir))
    out = _run_stream(closed, tmp_path, "sess")
    rows = spark.read.parquet(out).collect()
    closed_per_user: dict[int, int] = {}
    for r in rows:
        closed_per_user[r["user_id"]] = closed_per_user.get(r["user_id"], 0) + 1
        assert r["session_end_sec"] >= r["session_start_sec"]
        assert r["n_events"] >= 1

    batch = {
        r["user_id"]: r["n_sessions"]
        for r in ev_user_sessions(spark, SF_DIR).collect()
    }
    assert len(batch) > 0
    # every active user has exactly one open tail left in state
    for user_id, n_sessions in batch.items():
        assert closed_per_user.get(user_id, 0) + 1 == n_sessions


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """The watermarked stream-stream interval join (single-batch regime)
    must emit exactly the batch interval-join relation."""
    from rapidocr_spark.streaming.events import interval_join_stream

    in_dir = str(tmp_path / "ssj_in")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    events.write.parquet(in_dir)

    stream = interval_join_stream(
        read_event_stream(spark, in_dir, max_files=1024),
        read_event_stream(spark, in_dir, max_files=1024),
    )
    out = _run_stream(stream, tmp_path, "ssj")
    got = {
        tuple(r)
        for r in spark.read.parquet(out)
        .select("user_id", "click_id", "purchase_id", "lat_us")
        .collect()
    }

    ev = events
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("cts"), F.col("event_id").alias("click_id")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts"), F.col("event_id").alias("purchase_id")
    )
    batch = {
        tuple(r)
        for r in c.join(
            p,
            (F.col("user_id") == F.col("pu"))
            & (F.col("pts") >= F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr("interval 1 hour")),
        )
        .select(
            "user_id",
            "click_id",
            "purchase_id",
            (F.unix_micros(F.col("pts").cast("timestamp")) - F.unix_micros(F.col("cts").cast("timestamp"))).cast("bigint").alias("lat_us"),
        )
        .collect()
    }
    assert got == batch and len(batch) > 0


def test_enrich_stream_multibatch_equals_batch(spark, tmp_path):
    """Stream-static enrichment is STATELESS: run it deliberately
    MULTI-BATCH (repartitioned 4-file source, maxFilesPerTrigger=1 — four
    micro-batches) and the result must equal the plain batch join exactly
    — the batch ≡ stream proof without the single-batch crutch (the
    st_extract_turns discipline applied to the join shape)."""
    from rapidocr_spark.streaming.events import enrich_stream

    in_dir = str(tmp_path / "enrich_in")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    events.repartition(4).write.parquet(in_dir)

    profiles = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("user_n_events"),
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("user_total_cents"),
    )
    stream = enrich_stream(read_event_stream(spark, in_dir, max_files=1), profiles)
    out = _run_stream(stream, tmp_path, "enrich")
    got = {
        tuple(r) for r in spark.read.parquet(out).collect()
    }
    want = {
        tuple(r)
        for r in events.select(
            F.col("event_id").cast("bigint"),
            "user_id",
            "event_type",
            F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
        )
        .join(F.broadcast(profiles), "user_id")
        .select(
            "event_id", "user_id", "event_type", "value_cents",
            F.col("user_n_events").cast("bigint"),
            F.col("user_total_cents").cast("bigint"),
            (F.col("value_cents") * F.col("user_n_events") > F.col("user_total_cents")),
        )
        .collect()
    }
    assert got == want and len(got) == events.count()
