"""Bucketing for co-located joins — the 100 TB fact⋈fact strategy: write
both tables bucketed on the join key and the join plans with NO exchange
(each bucket pair joins in place).  The checkpoint sink (io/checkpoint.py)
uses the same bucket-by-conv_id layout; this test proves the shuffle
actually disappears for a bucketed Spark-catalog table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # default warehouse dir (spark-warehouse/, gitignored) — the
    # warehouse location is a static config and cannot move mid-session
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_bucketed")
    )
    yield "li_bucketed", "orders_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = (
            spark.table(li_t)
            .join(spark.table(o_t), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must consume the bucketed layout directly: no
        # exchange below the SortMergeJoin (the only exchange allowed is the
        # one for the final groupBy re-aggregation)
        join_part = plan.split("SortMergeJoin")[-1]
        assert "Exchange" not in join_part, join_part[:1500]
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_join_shuffles_both_sides(spark):
    """Control: the same join over plain parquet exchanges both inputs."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") >= 2
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
