"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship run — the real extraction operator
  (rapidocr_spark.operators.extract) over the sf0.001 documents table
  wrapped as plain-payload transcript turns, rolled up per language.
- ``queries()``: every implemented operator from SURVEY.md §2 +
  the training-data pipeline library (dedup / similarity / text analysis /
  windows / TPC-H shapes), as (spark, sf_dir) callables.
- ``oracle_sql()``: exactly-equivalent DuckDB SQL for EVERY query
  (identical column names, DECIMAL money, the engine's own polynomial
  hash, left-fold float reductions, rounded doubles, UTC-string
  timestamps).  The non-SQL chains — det→cls→rec extraction and the
  multimodal codecs — are gated the way the reference's own suite gates
  results (precomputed exact expectations, test_all_ort.py:22-27): the
  oracle reads committed expected-result parquet produced by the eager
  oracle kernels (fixtures/, staleness-tested) while the Spark side
  recomputes everything live through the distributed operators.

NOTE: every queries() callable pins spark.sql.session.timeZone=UTC itself
(plans/shell.py:_utc) — no reliance on entry() having mutated the session.
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
