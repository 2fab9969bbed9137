"""Distributed exact global ranking — no single-partition window.

``Window.orderBy(...)`` with no partitionBy funnels the whole table through
one task; at 100 TB that is THE classic scale-killer.  The standard
distributed formulation used here:

1. range-partition the rows on the sort key (each task holds one key range)
2. rank within each partition (a partitioned window — parallel)
3. count rows per partition (tiny aggregate) and broadcast the cumulative
   offsets back; global rank = offset(partition) + local rank

Exactness does not depend on where the range boundaries land, only on the
per-partition counts, so the sampling inside repartitionByRange cannot
change results (the sort key must be unique per row for a total order —
callers pass a tie-breaking key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _two_pass(
    df: DataFrame, order_cols: list[Column], agg_col: Column,
    num_partitions: int | None,
) -> tuple[DataFrame, DataFrame]:
    """Shared scaffolding of the two-pass primitives: (t, offsets) where
    t is the range-partitioned frame tagged with its partition id and
    offsets is the broadcast-ready cumulative per-partition aggregate
    (rank uses row counts, cumsum uses value sums — same merge).

    The persist is CORRECTNESS, not an optimisation: t feeds both the
    per-partition aggregate and the windowed branch, and an un-reused
    range exchange would re-sample boundaries with a different seed per
    branch — inconsistent _pid assignments would corrupt the offsets
    (the same reason RDD.zipWithIndex materialises its parent before
    counting)."""
    from .caching import track_persist

    p = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    t = track_persist(
        df.repartitionByRange(p, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    per_part = t.groupBy("_pid").agg(agg_col.alias("_a"))
    # cumulative offsets over ≤ p rows — a window over partition
    # AGGREGATES, not over the data
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_part.withColumn(
        "_off", F.coalesce(F.sum("_a").over(w_off), F.lit(0))
    ).select("_pid", "_off")
    return t, offsets


def with_global_rank(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add an exact 1-based global row_number over ``order_cols`` (which
    must form a total order) without any global window."""
    t, offsets = _two_pass(df, order_cols, F.count(F.lit(1)), num_partitions)
    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        t.withColumn("_rn", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.col("_off") + F.col("_rn")).cast("bigint"))
        .drop("_pid", "_rn", "_off")
    )


def with_global_cumsum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global running SUM of ``value_col`` in ``order_cols`` order
    (a total order) — the distributed SCAN primitive, same two-pass shape
    as with_global_rank but the broadcast offsets carry per-partition
    VALUE sums instead of row counts.  INTEGER values only: the exactness
    argument needs an associative sum (a float cumsum is summation-order-
    dependent and would also violate the no-order-dependent-float rule)."""
    t, offsets = _two_pass(df, order_cols, F.sum(value_col), num_partitions)
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        t.withColumn("_cs", F.sum(value_col).over(w_local))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_cs")).cast("bigint"))
        .drop("_pid", "_cs", "_off")
    )
