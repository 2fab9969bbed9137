"""Plan-quality assertions: the physical plans we'd want at 100 TB —
broadcast joins for dims, pushed filters at the scan, whole-stage codegen
on the light route (SURVEY.md §4)."""

from __future__ import annotations

import pytest

from rapidocr_spark.plans import relational

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q5_broadcasts_all_dims(spark):
    plan = _plan(relational.q5_region_volume(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 4  # cust, sup, nation, region
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") <= 1


def test_q6_pushes_filters_to_scan(spark):
    plan = _plan(relational.q6_forecast_revenue(spark, SF))
    assert "PushedFilters: [" in plan
    # the shipdate/discount/quantity predicates must reach the parquet scan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]


def test_q1_prunes_columns(spark):
    plan = _plan(relational.q1_pricing_summary(spark, SF))
    read = plan.split("ReadSchema:")[1][:400]
    assert "l_partkey" not in read and "l_suppkey" not in read  # pruned
    assert "l_quantity" in read


def test_q1_whole_stage_codegen(spark):
    df = relational.q1_pricing_summary(spark, SF)
    df.collect()  # AQE: codegen spans appear only in the finalised plan
    plan = _plan(df)
    # '*(n)' prefixes mark whole-stage-codegen spans in the final plan
    assert "*(1)" in plan and "*(2)" in plan
