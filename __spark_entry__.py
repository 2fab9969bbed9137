"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship run — the real extraction operator
  (rapidocr_spark.operators.extract) over the sf0.001 documents table
  wrapped as plain-payload transcript turns, rolled up per language.
- ``queries()``: every implemented operator from SURVEY.md §2 +
  the training-data pipeline library (dedup / similarity / text analysis /
  windows / TPC-H shapes), as (spark, sf_dir) callables.
- ``oracle_sql()``: exactly-equivalent DuckDB SQL for every
  SQL-expressible query (identical column names, DECIMAL money, the
  engine's own polynomial hash, left-fold float reductions, rounded
  doubles, UTC-string timestamps).  The det→cls→rec kernel queries
  (x_extract_turns, x_assemble_conversations) are genuinely
  non-SQL-expressible → rows-only checks.

NOTE: queries assume an UTC session (timestamps are rendered to strings);
the engine sets spark.sql.session.timeZone=UTC in its own entry points.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from rapidocr_spark.plans.shell import x_extract_docs_plain

    extracted = x_extract_docs_plain(spark, "/root/testdata/sf0.001")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "lang"
    )
    return (
        extracted.join(docs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
        .orderBy("lang")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from rapidocr_spark.plans.shell import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from rapidocr_spark.plans.shell import oracle_sql as _o

    return _o()
