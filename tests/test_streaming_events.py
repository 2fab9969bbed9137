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
