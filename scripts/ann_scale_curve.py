#!/usr/bin/env python
"""Time-vs-N curves for the ANN family (VERDICT r03 item 6).

The l8 Lloyd/PQ rows cost 6-8 s at sf0.1 on the local bench, which
invites misreading as O(N) data cost; in fact the dominant term is a
whole-stage-codegen JIT constant (the 64-wide Lloyd/ADC expression trees
compile once per plan, measured ~6 s even on 500 rows — see BASELINE.md).
This harness separates the constant from the data-dependent slope by
running each query at sf0.001 / sf0.01 / sf0.1 (500 / 500 / 5000
vectors), interleaved round-robin across scales and queries so external
host steal hits every cell equally, reporting per-cell best-of-N →
BENCH_ANN_SCALE.json.

Usage: python scripts/ann_scale_curve.py [rounds]
NEVER run other Spark work concurrently (CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

QUERIES = [
    "knn_brute_cosine",      # brute baseline: pure data slope, no big JIT
    "ann_ivf_cells_lloyd",   # Lloyd assignment (the JIT-heavy chain)
    "ann_ivf_topk_l8",       # Lloyd + probe-8 search
    "ann_recall_l8",         # + brute ground truth (gauge)
    "ann_pq_rerank",         # PQ ADC + exact re-rank
    "ann_ivfpq_rerank",      # composed IVF-PQ (the deployable shape)
]

SCALES = ["sf0.001", "sf0.01", "sf0.1"]


def probe_stats(spark, sf_dir: str) -> dict:
    """Adaptive-K probe-work evidence (VERDICT r04 item 2): the measured
    mean candidate count per query of the deployable l8 search, as a
    fraction of the corpus — with K = clamp(⌈√N⌉, 32, 4096) and fixed
    nprobe this fraction must FALL as N grows (nprobe/K ∝ 1/√N), where
    the old fixed K=32 held it at ~nprobe/32 forever."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from rapidocr_spark.functions.caching import release_tracked
    from rapidocr_spark.functions.similarity import (
        MAX_QUERIES, NPROBE_L8, QUERY_MOD, _assign_cells, _centroids_lloyd,
        _dot, _emb, _norm,
    )

    e = _emb(spark, sf_dir)
    cents = _centroids_lloyd(e)
    cells = _assign_cells(e, cents).select("vec_id", "cell")
    sizes = cells.groupBy("cell").agg(F.count(F.lit(1)).alias("cell_n"))
    q = e.where(
        (F.col("vec_id") % QUERY_MOD == 0)
        & (F.col("vec_id") < QUERY_MOD * MAX_QUERIES)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        _norm(F.col("embedding")).alias("_qn"),
    )
    cn = cents.select("cent_id", "ce", _norm(F.col("ce")).alias("_cn"))
    cent_cos = F.round(_dot(F.col("ce"), F.col("qe")) / (F.col("_cn") * F.col("_qn")), 6)
    wq = Window.partitionBy("query_id").orderBy(F.col("cos_c").desc(), F.col("cent_id"))
    qcells = (
        q.crossJoin(F.broadcast(cn))
        .select("query_id", "cent_id", cent_cos.alias("cos_c"))
        .withColumn("rk", F.row_number().over(wq))
        .where(F.col("rk") <= NPROBE_L8)
        .select("query_id", F.col("cent_id").alias("cell"))
    )
    per_q = qcells.join(sizes, "cell").groupBy("query_id").agg(F.sum("cell_n").alias("cand"))
    n = e.count()
    k = cents.count()
    row = per_q.agg(F.avg("cand").alias("m")).collect()[0]
    release_tracked()
    return {
        "n_vectors": n,
        "k_centroids": k,
        "nprobe": NPROBE_L8,
        "mean_candidates_per_query": round(float(row.m), 1),
        "mean_candidate_fraction": round(float(row.m) / n, 4),
    }


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    base = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")

    from bench import build_spark

    spark = build_spark(cpus, app="rapidocr-spark-ann-scale")
    spark.sparkContext.setLogLevel("ERROR")

    from rapidocr_spark.plans.shell import queries

    q = queries()
    # count vectors per scale (reported next to each curve point)
    n_vecs = {
        sf: spark.read.parquet(f"{base}/{sf}/embeddings.parquet").count()
        for sf in SCALES
    }
    # warmup: run the heaviest chain once at the smallest scale so JVM/
    # Arrow bring-up is not attributed to the first cell
    q["ann_ivf_topk_l8"](spark, f"{base}/sf0.001").write.format("noop").mode("overwrite").save()

    cells: dict[str, dict[str, list[float]]] = {n: {sf: [] for sf in SCALES} for n in QUERIES}
    for _ in range(rounds):
        for name in QUERIES:
            for sf in SCALES:  # interleaved: every cell once per round
                spark.catalog.clearCache()
                t0 = time.time()
                q[name](spark, f"{base}/{sf}").write.format("noop").mode("overwrite").save()
                cells[name][sf].append(round(time.time() - t0, 3))

    out = {
        "cpus": cpus,
        "rounds": rounds,
        "n_vectors": n_vecs,
        "adaptive_k_probe_stats": {
            sf: probe_stats(spark, f"{base}/{sf}") for sf in SCALES
        },
        "queries": {
            name: {
                sf: {"best": min(a), "attempts": a} for sf, a in per.items()
            }
            for name, per in cells.items()
        },
    }
    print(json.dumps(out))
    with open(
        os.path.join(os.path.dirname(__file__), "..", "BENCH_ANN_SCALE.json"), "w"
    ) as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
