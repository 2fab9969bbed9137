"""Transcript table ingestion — the engine's connector surface.

The reference ingests one image at a time from path/bytes/base64/multipart
(SURVEY.md §2.1 S1-S4); the engine's unit of ingestion is a TABLE of
transcript turns.  ``read_transcripts`` standardises that boundary:

- schema is ENFORCED, not inferred (an inferred-schema scan of 100 TB of
  JSON would read data twice and silently widen types);
- parquet is the fast path (columnar, predicate pushdown, column pruning);
  JSON-lines and CSV are supported for interchange — they parse through
  the same explicit schema so downstream plans are format-agnostic;
- malformed rows surface under ``columnNameOfCorruptRecord`` semantics in
  PERMISSIVE mode (default) or fail fast with mode='FAILFAST'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_STRUCT = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

_TS_FMT = "yyyy-MM-dd HH:mm:ss[.SSSSSS]"


def read_transcripts(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Load a transcripts table from ``path`` with the canonical schema.

    fmt: 'parquet' (columnar fast path) | 'orc' (the other pushdown-capable
    columnar format) | 'json' (JSON-lines) | 'csv' (header row, quoted
    fields).  All four return identical schemas, so
    ``extract_transcripts`` and every downstream plan run unchanged."""
    if fmt == "parquet":
        return spark.read.schema(TRANSCRIPT_STRUCT).parquet(path)
    if fmt == "orc":
        # the other columnar interchange format warehouses actually hold
        # (Hive lineage) — same pushdown/pruning story as parquet, same
        # enforced schema
        return spark.read.schema(TRANSCRIPT_STRUCT).orc(path)
    if fmt == "json":
        return (
            spark.read.schema(TRANSCRIPT_STRUCT)
            .option("mode", mode)
            .option("timestampFormat", _TS_FMT)
            .json(path)
        )
    if fmt == "csv":
        return (
            spark.read.schema(TRANSCRIPT_STRUCT)
            .option("header", True)
            .option("mode", mode)
            .option("timestampFormat", _TS_FMT)
            .option("multiLine", True)  # payloads embed newlines
            .option("escape", '"')
            # disambiguate NULL vs '' (CSV's classic hole): NULLs travel
            # as \N, so an empty field is an empty STRING
            .option("nullValue", "\\N")
            .csv(path)
        )
    raise ValueError(f"unknown transcript format {fmt!r} (parquet|orc|json|csv)")


def write_transcripts(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Interchange writer (test/export helper; production sinks are the
    checkpointed bucketed parquet in io/checkpoint.py)."""
    cols = [f.name for f in TRANSCRIPT_STRUCT.fields]
    out = df.select(*cols)
    if fmt == "parquet":
        out.write.mode("overwrite").parquet(path)
    elif fmt == "orc":
        out.write.mode("overwrite").orc(path)
    elif fmt == "json":
        out = out.withColumn("ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
        out.write.mode("overwrite").json(path)
    elif fmt == "csv":
        out = out.withColumn("ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
        out.write.mode("overwrite").option("header", True).option(
            "escape", '"'
        ).option("nullValue", "\\N").csv(path)
    else:
        raise ValueError(f"unknown transcript format {fmt!r}")
