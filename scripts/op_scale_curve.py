#!/usr/bin/env python
"""Time-vs-N curves for the late-round-6 operator families.

Same methodology as ann_scale_curve.py: each query runs at
sf0.001 / sf0.01 / sf0.1, interleaved round-robin across scales and
queries so external host steal hits every cell equally, best-of-N per
cell → BENCH_OP_SCALE.json.  The events family spans a genuine 100×
row-count range (10³ → 10⁵ events; 1.5k → 150k orderkeys for the bloom
probe side), the documents family 10× (500 → 5000 docs), which
separates the per-plan constant (session/codegen/stage bring-up,
~0.3-1 s) from the data slope — the evidence that these plans are
O(N) in data with O(1) state, as their docstrings claim.

Usage: python scripts/op_scale_curve.py [rounds]
NEVER run other Spark work concurrently (CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

QUERIES = [
    "sketch_bloom_semijoin",   # orders+lineitem: 100x probe-side range
    "ev_type_transitions",     # events window + bounded groupBys
    "ev_hourly_gapfill",       # bounded grid + LOCF window
    "sketch_hll_distinct",     # O(m)-state sketch fold
    "graph_pagerank",          # 3 iterations, 10x docs range
    "doc_pack_shards",         # distributed prefix-sum scan
]
# override: OP_SCALE_QUERIES=a,b,c OP_SCALE_OUT=BENCH_OP_SCALE_R7.json
if os.environ.get("OP_SCALE_QUERIES"):
    QUERIES = os.environ["OP_SCALE_QUERIES"].split(",")
OUT_NAME = os.environ.get("OP_SCALE_OUT", "BENCH_OP_SCALE.json")

SCALES = ["sf0.001", "sf0.01", "sf0.1"]


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    base = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")

    from bench import build_spark

    spark = build_spark(cpus, app="rapidocr-spark-op-scale")
    spark.sparkContext.setLogLevel("ERROR")

    from rapidocr_spark.plans.shell import queries

    q = queries()
    sizes = {
        sf: {
            "events": spark.read.parquet(f"{base}/{sf}/events.parquet").count(),
            "documents": spark.read.parquet(f"{base}/{sf}/documents.parquet").count(),
            "lineitem": spark.read.parquet(f"{base}/{sf}/lineitem.parquet").count(),
        }
        for sf in SCALES
    }
    # warm the session so JVM/parquet bring-up is not billed to cell 1
    q["ev_type_transitions"](spark, f"{base}/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    cells: dict[str, dict[str, list[float]]] = {
        n: {sf: [] for sf in SCALES} for n in QUERIES
    }
    for _ in range(rounds):
        for name in QUERIES:
            for sf in SCALES:  # interleaved: every cell once per round
                spark.catalog.clearCache()
                t0 = time.time()
                q[name](spark, f"{base}/{sf}").write.format("noop").mode(
                    "overwrite"
                ).save()
                cells[name][sf].append(round(time.time() - t0, 3))

    out = {
        "cpus": cpus,
        "rounds": rounds,
        "table_rows": sizes,
        "queries": {
            name: {sf: {"best": min(a), "attempts": a} for sf, a in per.items()}
            for name, per in cells.items()
        },
    }
    path = os.path.join(os.path.dirname(__file__), "..", OUT_NAME)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["queries"]))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
