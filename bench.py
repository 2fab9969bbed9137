#!/usr/bin/env python
"""Benchmark harness — run the headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; print ONE JSON line with per-query seconds.

Headline set:
- the extraction engine end-to-end (synthetic transcripts, fused
  det→cls→rec mapInPandas stage) — reported also as turns/sec, the
  north-rule throughput metric;
- representative relational / window / dedup / similarity queries.

Scaling evidence is produced by scripts/scaling.py — the whole process
tree is taskset-PINNED to exactly N CPUs and the same job runs at N vs 4N
cores with A/B-interleaved best-of-K attempts (local[N] alone lets
JVM/Arrow/GC threads spill beyond N cores and inflates the low side).
Both pinned pairs are recorded: BENCH_SCALING_2v8_pinned.json (0.925
efficiency) and BENCH_SCALING_4v16_pinned.json (0.62 — the shared host's
multiprocessing envelope, see BASELINE.md); BENCH_SCALING.json carries the
headline pair.
"""

from __future__ import annotations

import json
import os
import sys
import time


def build_spark(cpus: int, app: str = "rapidocr-spark-bench"):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # explicit split sizing: the bench corpora are sub-GB, so default
        # 128MB splits would starve the cores (at 100 TB the default is right)
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def bench_extraction(spark, n_convs: int, iterations: int = 2) -> tuple[float, int]:
    """Steady-state extraction throughput on synthetic transcripts.

    The corpus is generated distributed and cached first, and the Python
    workers are warmed with a small pass, so the timed section measures the
    engine's steady state — the regime that matters at 10^12-turn scale,
    where worker startup amortises to zero.  Best of `iterations` runs."""
    from pyspark.sql import functions as F

    from rapidocr_spark.operators.extract import extract_transcripts
    from rapidocr_spark.plans.shell import EXTRACT_CFG
    from rapidocr_spark.sources.transcripts import transcripts_df

    def run_once(frame) -> None:
        out = extract_transcripts(frame, EXTRACT_CFG)
        # a real sink-shaped action: aggregate everything (forces full compute)
        out.agg(
            F.count(F.lit(1)), F.sum("n_boxes"), F.sum("n_chars"), F.count("error")
        ).collect()

    df = transcripts_df(spark, n_convs).persist()
    n_turns = df.count()  # materialise the input outside the timed section
    # warm Python workers / JIT on EVERY partition (limit() would touch few)
    run_once(df.where(F.col("turn_idx") == 0))
    best = float("inf")
    for _ in range(iterations):
        t0 = time.time()
        run_once(df)
        best = min(best, time.time() - t0)
    df.unpersist()
    return best, n_turns


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[1])
    except (IndexError, ValueError):
        sf = 0.1
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from rapidocr_spark.plans.shell import queries

    q = queries()
    headline = [
        "q1_pricing_summary",
        "q4_order_priority",
        "q3_shipping_priority",
        "q5_region_volume",
        "q10_returned_items",
        "ev_user_sessions",
        "ev_hourly_top_type",
        "doc_token_stats",
        "doc_fingerprint",
        "dedup_ngram_jaccard",
        "minhash_signatures",
        "lsh_candidate_pairs",
        "simhash",
        "knn_brute_cosine",
        "ann_ivf_topk",
        "ann_recall_at_k",
        "dedup_embedding_cosine",
        "sketch_distinct_users",
        "ev_user_value_quartiles",
        "ann_bucket_sizes",
        "mm_decode_meta",
        "x_extract_docs_plain",
        # round-3 additions
        "ann_ivf_topk_l8",
        "ann_recall_l8",
        "x_extract_multilang",
        "ev_asof_click_attribution",
        "ev_range_join_follows",
        "ev_funnel_conversion",
        "doc_repetition_stats",
        "doc_split_assign",
        "doc_benchmark_overlap",
        # round-4 additions
        "doc_pii_scrub",
        "doc_url_normalize",
        # round-5 additions
        "mm_decode_real",
        "x_extract_most_angle",
        "x_extract_padded",
        "x_vis_boxes",
        "dedup_containment",
        "doc_lm_bigram_score",
        # round-6 additions: the serialized-ONNX chain, substring-span
        # dedup, the fine-cell 3-probe semantic prune, and the KLL-style
        # quantile sketch
        "x_extract_onnx",
        "dedup_substring_spans",
        "dedup_boilerplate_catalog",
        "dedup_semantic",
        "sketch_value_quantiles",
        # late round-6 additions: link-graph PageRank, tf-idf keyword
        # view, and the HLL + bloom-semi-join sketch completions
        "graph_pagerank",
        "doc_tfidf_top_terms",
        "sketch_hll_distinct",
        "sketch_bloom_semijoin",
        "ev_type_transitions",
        "ev_cohort_retention",
        "doc_chunk_spans",
        "doc_pack_shards",
        "ev_pivot_day_types",
        "ev_cube_day_type",
        "ev_hourly_gapfill",
        "dedup_fuzzy_prefix",
        "dedup_fuzzy_unicode",
        # round-7 additions: BPE training joins the headline now that
        # merge learning is one bounded-table stage (64 merges in ~0.6s
        # at sf0.1 vs the old 8-merges-in-24.8s job-per-merge shape);
        # the learned NB quality filter and domain-mixture sampling
        "doc_bpe_learn_merges",
        "doc_nb_quality_score",
        "doc_sample_mixture",
        "dedup_substring_coverage",
        "doc_bpe_apply",
    ]
    # warm the session (parquet reader init, codegen, python workers) so the
    # first timed query isn't charged for one-time JVM costs
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").agg({"l_quantity": "sum"}).collect()
    q["doc_token_stats"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    # warm the Python runners too (fork + imports, ~4s across 32 workers):
    # mapInPandas queries must not be charged for one-time worker startup
    q["mm_decode_meta"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    for name in headline:
        best = float("inf")
        for _ in range(2):  # best-of-2: the host shows 2-3x external-steal
            # variance; min is the engine's own cost.  Cache cleared per
            # attempt so a rerun can't reuse the previous attempt's
            # persisted intermediates (CacheManager matches logical plans).
            spark.catalog.clearCache()
            t0 = time.time()
            df = q[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)

    # 2× the round-1 corpus: at sf0.1 the timed section is then ~3s, enough
    # to dominate per-stage overhead on this noisy host (steady-state rate)
    n_convs = max(120, int(12000 * sf))
    ext_sec, n_turns = bench_extraction(spark, n_convs)
    times["x_extract_transcripts"] = round(ext_sec, 3)
    turns_per_sec = round(n_turns / ext_sec, 2) if ext_sec > 0 else 0.0

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "cpus": cpus,
                "extraction_turns": n_turns,
                "extraction_turns_per_sec": turns_per_sec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
