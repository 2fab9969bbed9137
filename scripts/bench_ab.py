#!/usr/bin/env python
"""Interleaved best-of-N evidence for individual bench queries.

VERDICT r02 item 5: BENCH_r02 showed ann_bucket_sizes 1.67→4.25,
ann_ivf_topk 3.12→5.00, knn_brute_cosine 1.49→2.24 vs r01 with no
structural plan change — on a host with documented 2-3× external-steal
variance, single-shot timings cannot distinguish regression from noise.
This harness runs the named queries ROUND-ROBIN (every query once per
round, N rounds), so external load hits all queries equally, and reports
per-query best/median/all attempts → BENCH_ABLATION.json.

Usage: python scripts/bench_ab.py [rounds] [query ...]
NEVER run other Spark work concurrently (CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEFAULT_QUERIES = [
    "ann_bucket_sizes",
    "ann_ivf_topk",
    "knn_brute_cosine",
    "lsh_candidate_pairs",
]


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    names = sys.argv[2:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from bench import build_spark

    spark = build_spark(cpus, app="rapidocr-spark-bench-ab")
    spark.sparkContext.setLogLevel("ERROR")

    from rapidocr_spark.plans.shell import queries

    q = queries()
    # session warmup identical to bench.py
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").agg({"l_quantity": "sum"}).collect()
    q["doc_token_stats"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    q["mm_decode_meta"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    attempts: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(rounds):
        for n in names:  # interleaved: one attempt of each per round
            spark.catalog.clearCache()
            t0 = time.time()
            q[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            attempts[n].append(round(time.time() - t0, 3))

    out = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "rounds": rounds,
        "queries": {
            n: {
                "best": min(a),
                "median": sorted(a)[len(a) // 2],
                "attempts": a,
            }
            for n, a in attempts.items()
        },
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__), "..", "BENCH_ABLATION.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
