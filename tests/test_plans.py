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


# ------------------------------------------------- round-2 plan assertions


def test_q19_derives_pushable_conjuncts(spark):
    """The disjunction mixes lineitem and part columns, so it cannot push
    whole — but Catalyst must still derive the per-table weakenings
    (quantity range on the lineitem scan, size bound on the part scan)."""
    plan = _plan(relational.q19_disjunctive_revenue(spark, SF))
    li_scan = [l for l in plan.splitlines() if "FileScan" in l and "l_quantity" in l]
    part_scan = [l for l in plan.splitlines() if "FileScan" in l and "p_size" in l]
    assert li_scan and "l_quantity" in li_scan[0].split("DataFilters")[1]
    assert part_scan and "p_size" in part_scan[0].split("DataFilters")[1]


def test_q16_anti_join_broadcast(spark):
    plan = _plan(relational.q16_supplier_part_counts(spark, SF))
    assert "LeftAnti" in plan
    assert plan.count("BroadcastHashJoin") >= 1


def test_quartiles_no_global_data_window(spark):
    """The ntile rewrite: the only unpartitioned window may run over the
    per-partition COUNTS (≤ defaultParallelism rows), never the data."""
    from rapidocr_spark.plans import events

    plan = _plan(events.ev_user_value_quartiles(spark, SF))
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            # data windows are partitioned by _pid; the offsets window
            # orders by _pid over the tiny counts frame
            assert "_pid" in line


def test_dedup_ngram_reuses_cached_shingles(spark):
    from rapidocr_spark.functions import dedup

    plan = _plan(dedup.dedup_ngram_jaccard(spark, SF))
    # persisted shingle frames: every consumer reads the cache, not the scan
    assert plan.count("InMemoryTableScan") >= 4


def test_knn_brute_broadcasts_query_set(spark):
    from rapidocr_spark.functions import similarity

    plan = _plan(similarity.knn_brute_cosine(spark, SF))
    assert ("BroadcastNestedLoopJoin" in plan) or ("BroadcastHashJoin" in plan)


def test_extraction_single_python_stage(spark):
    """The heavy route is ONE fused Arrow stage; the plain route never
    enters Python (no second python runner)."""
    from rapidocr_spark.operators.extract import extract_transcripts
    from rapidocr_spark.plans.shell import EXTRACT_CFG
    from rapidocr_spark.sources.transcripts import transcripts_df

    df = transcripts_df(spark, 3)
    plan = _plan(extract_transcripts(df, EXTRACT_CFG))
    # exactly ONE fused kernel-chain stage ("run"); the other MapInPandas
    # nodes are the synthetic generator source, which the union reads once
    # per branch (a parquet source would be two pruned scans)
    assert plan.count("MapInPandas run(") == 1, plan[:2000]
    assert plan.count("MapInPandas") <= 3
