"""Streaming operators over the events stream — engine-added surface
(the reference is batch request/response only, SURVEY.md §2.9; round 1
deferred watermark/stateful work until the batch north rule was met).

Two canonical streaming shapes:

- ``windowed_type_counts``: watermarked tumbling-window aggregation
  (append mode — a window emits exactly once, when the watermark passes
  its end).  At scale this is the continuously-materialised rollup; state
  is bounded by (watermark horizon / window length) × |event_type|.
- ``sessionize_stream``: gap-based sessionization as a CUSTOM STATEFUL
  operator via ``applyInPandasWithState`` — per-user state carries the
  open session (start, last, n); a batch emits every session it can prove
  closed (next event > 30 min later) and leaves the open tail in state.
  The batch twin is plans/events.py:ev_user_sessions (lag window); the
  incremental semantics match: batch n_sessions = emitted closed + 1 open
  per active user.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StructField, StructType,
)

from ..plans.events import SESSION_GAP_SEC

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def read_event_stream(spark: SparkSession, input_dir: str, max_files: int = 16) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )


def windowed_type_counts(
    stream: DataFrame, window: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    """Tumbling-window per-type counts with late-data watermark; append
    mode legal (aggregation is behind the watermark)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


SESSION_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_sec", DoubleType()),
        StructField("session_end_sec", DoubleType()),
        StructField("n_events", IntegerType()),
    ]
)

SESSION_STATE = StructType(
    [
        StructField("start_sec", DoubleType()),
        StructField("last_sec", DoubleType()),
        StructField("n", IntegerType()),
    ]
)


def _sessionize_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        start, last, n = state.get
    else:
        start, last, n = None, None, 0
    ts: list[float] = []
    for pdf in pdfs:
        col = pd.to_datetime(pdf["ts"])
        ts.extend(t.timestamp() for t in col)
    ts.sort()
    closed: list[tuple[Any, ...]] = []
    for tv in ts:
        if last is None:
            start, last, n = tv, tv, 1
        elif tv - last > SESSION_GAP_SEC:
            closed.append((user_id, start, last, n))
            start, last, n = tv, tv, 1
        else:
            last, n = tv, n + 1
    state.update((start, last, n))
    if closed:
        yield pd.DataFrame(closed, columns=["user_id", "session_start_sec", "session_end_sec", "n_events"])


def sessionize_stream(stream: DataFrame) -> DataFrame:
    """Gap(30 min)-closed sessions per user, incremental (open tails stay
    in per-user state across triggers)."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn,
        outputStructType=SESSION_OUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream(stream: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming EXACT DEDUPLICATION: at-most-one record per
    (user_id, event_type, 1-minute window) — the at-least-once-upstream
    collapse every streaming ingest needs.  The dedup key contains the
    event-time window, so with the watermark Spark can EVICT state for
    windows older than the horizon: state is bounded by
    (watermark / 1 min) x |active keys|, not by stream length.  Only the
    KEY columns are emitted (which physical row of a duplicate group
    arrives first is nondeterministic; the key set is exact), so the
    batch oracle is a plain SELECT DISTINCT."""
    return (
        stream.withWatermark("ts", watermark)
        .withColumn("w", F.window("ts", "1 minute"))
        .dropDuplicates(["user_id", "event_type", "w"])
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "user_id",
            "event_type",
        )
    )


def interval_join_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    watermark: str = "30 minutes",
) -> DataFrame:
    """STREAM-STREAM interval join — the fourth canonical streaming shape
    (alongside windowed agg, stateful sessionization, dedup): purchases
    joined to the clicks they follow within 1 hour, per user.

    Both sides are watermarked and the join condition carries the
    event-time range, so Spark can bound BOTH state stores: a click is
    dropped from state once the purchase-side watermark passes
    click_ts + 1h, a purchase once the click-side watermark passes it —
    state is O(events in the watermark+horizon window), not O(stream).
    Output keys are the two unique event_ids and the exact integer-µs
    latency, so the batch twin is an equality oracle with no float or
    tie concerns."""
    c = (
        clicks.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    p = (
        purchases.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    j = c.join(
        p,
        F.expr(
            "c_user = p_user AND purchase_ts >= click_ts "
            "AND purchase_ts <= click_ts + interval 1 hour"
        ),
    )
    return j.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts"))
        .cast("bigint")
        .alias("lat_us"),
    )


def enrich_stream(stream: DataFrame, profiles: DataFrame) -> DataFrame:
    """STREAM-STATIC broadcast-enrichment join — the sixth canonical
    streaming shape (alongside windowed agg, stateful sessionization,
    dedup, stream-stream interval join, and the stateless extraction
    twin): every incoming event is enriched with its user's precomputed
    profile (a STATIC batch table broadcast to the stream), plus the
    derived above-user-average flag.

    A stream-static equi-join is STATELESS in Structured Streaming — no
    watermark, no state store; the static side is broadcast per
    micro-batch — so batch ≡ stream holds for ANY batching, and state is
    O(|profile table|) regardless of stream length.  The flag is pure
    bigint arithmetic (value_cents · n_events > total_cents ⇔
    value > mean) so the batch oracle is exact with no float division."""
    ev = stream.select(
        "event_id",
        "user_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    return ev.join(F.broadcast(profiles), "user_id").select(
        F.col("event_id").cast("bigint").alias("event_id"),
        "user_id",
        "event_type",
        "value_cents",
        F.col("user_n_events").cast("bigint").alias("user_n_events"),
        F.col("user_total_cents").cast("bigint").alias("user_total_cents"),
        (
            F.col("value_cents") * F.col("user_n_events")
            > F.col("user_total_cents")
        ).alias("above_user_avg"),
    )
