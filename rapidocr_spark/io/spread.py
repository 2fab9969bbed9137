"""Scan-parallelism guard for row-group-starved parquet inputs.

The bench/test corpora are written as ONE parquet file with ONE row group
per table (5000-50000 rows), and parquet scans can only split at row-group
boundaries — so every map-side computation over such a table (regex
quality scoring, per-token polynomial hashing, 64-dim cosine folds,
winnowing k-gram folds) runs in a SINGLE task no matter how many cores
the session has.  That is the classic "one huge unsplittable file" input
skew: fix it by repartitioning right after the read.

The repartition is SCALE-ADAPTIVE, mirroring operators/extract.py's
salt="auto" rule: it fires only when the scan's actual split count is
below the cluster's parallelism — a production-size table (many row
groups / many files) already scans wide, and a defensive exchange there
would move terabytes for nothing, so it is skipped.  The round-robin
exchange this adds for small inputs moves only megabytes and buys a
cores-fold speedup of every downstream map stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def spread_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet table; round-robin repartition to the session's
    parallelism ONLY when the scan cannot split wide enough by itself."""
    df = spark.read.parquet(path)
    try:
        cores = spark.sparkContext.defaultParallelism
        in_parts = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — e.g. Connect; keep the plain scan
        return df
    if in_parts < cores:
        return df.repartition(cores)
    return df
