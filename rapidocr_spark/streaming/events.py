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
