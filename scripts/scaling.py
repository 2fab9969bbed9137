#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule (BASELINE.json):
"throughput scaling efficiency >= 0.8 between N and 4N executors".

No real cluster exists in this sandbox (driver instruction), so the same
extraction job runs at two parallelism levels — local[N] and local[4N]
cores — over the IDENTICAL parquet corpus, in separate processes (fresh
JVM each).  Defaults N=4 → 4 vs 16 cores, both within this host's 16
physical cores (local[32] would only add hyperthread pairs, which share
execution units and cannot represent 4N independent executors).

Noise control: the corpus is generated ONCE and written to parquet (the
timed job reads it like a real table scan); per level the job is run in
`attempts` fresh JVMs interleaved A/B/A/B, workers warmed inside each JVM,
best-of-2 inside each attempt, and the per-level MINIMUM is used (the
sandbox host shows 2-3x run-to-run variance from external load).

    efficiency = (T_N / T_4N) / 4

Usage: python scripts/scaling.py [n_convs] [attempts]
Writes BENCH_SCALING.json at the repo root and prints a summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = "/tmp/rapidocr_spark_scaling_corpus"

GEN = r"""
import sys
from bench import build_spark
from rapidocr_spark.sources.transcripts import transcripts_df
n_convs, path = int(sys.argv[1]), sys.argv[2]
spark = build_spark(16, app="scaling-gen")
spark.sparkContext.setLogLevel("ERROR")
transcripts_df(spark, n_convs).write.mode("overwrite").parquet(path)
print("GENERATED", spark.read.parquet(path).count())
spark.stop()
"""

WORKER = r"""
import json, sys, time
from pyspark.sql import functions as F
from bench import build_spark
from rapidocr_spark.operators.extract import extract_transcripts
from rapidocr_spark.plans.shell import EXTRACT_CFG
cpus, path = int(sys.argv[1]), sys.argv[2]
spark = build_spark(cpus, app=f"scaling-{cpus}")
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.parquet(path).persist()
n = df.count()  # materialise the cache: the timed section is the engine, not the scan
def run_once(frame):
    out = extract_transcripts(frame, EXTRACT_CFG)
    out.agg(F.count(F.lit(1)), F.sum("n_boxes"), F.sum("n_chars"), F.count("error")).collect()
run_once(df.where(F.col("turn_idx") == 0))  # warm every partition's worker
best = 1e18
for _ in range(2):
    t0 = time.time(); run_once(df); best = min(best, time.time() - t0)
print("RESULT " + json.dumps({"cpus": cpus, "sec": best, "turns": n}))
spark.stop()
"""


def _sub(code: str, *args: str, pin_cpus: int = 0) -> str:
    cmd = [sys.executable, "-c", code, *args]
    if pin_cpus:
        # pin the WHOLE process tree (JVM + python workers) to an N-core
        # budget: local[N] alone caps task slots but lets JVM/Arrow/GC
        # threads spill onto extra cores, inflating the low-parallelism
        # side and understating scaling efficiency
        cmd = ["taskset", "-c", f"0-{pin_cpus - 1}"] + cmd
    out = subprocess.run(
        cmd,
        capture_output=True, text=True, cwd=ROOT, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith(("RESULT ", "GENERATED")):
            return line
    raise RuntimeError(f"subprocess failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    attempts = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    lo = int(os.environ.get("SCALE_LO", "4"))
    hi = 4 * lo
    print(_sub(GEN, str(n_convs), CORPUS), flush=True)

    best: dict[int, dict] = {}
    for i in range(attempts):
        for cpus in (lo, hi):
            r = json.loads(_sub(WORKER, str(cpus), CORPUS, pin_cpus=cpus)[len("RESULT "):])
            if cpus not in best or r["sec"] < best[cpus]["sec"]:
                best[cpus] = r
            print(f"attempt={i} cpus={cpus} sec={r['sec']:.2f} tps={r['turns']/r['sec']:.0f}", flush=True)

    r_lo, r_hi = best[lo], best[hi]
    eff = (r_lo["sec"] / r_hi["sec"]) / (hi / lo)
    result = {
        "cores_lo": lo, "cores_hi": hi, "n_turns": r_lo["turns"],
        "lo_sec": round(r_lo["sec"], 3),
        "hi_sec": round(r_hi["sec"], 3),
        "lo_turns_per_sec": round(r_lo["turns"] / r_lo["sec"], 2),
        "hi_turns_per_sec": round(r_hi["turns"] / r_hi["sec"], 2),
        "speedup": round(r_lo["sec"] / r_hi["sec"], 3),
        "scaling_efficiency": round(eff, 3),
        "attempts": attempts,
        "method": f"same extraction job over one parquet corpus, local[{lo}] vs local[{hi}] "
                  f"(N vs 4N cores within the 16 physical cores of this host), fresh JVM per "
                  f"attempt, A/B-interleaved attempts with per-level minimum, workers warmed, "
                  f"best-of-2 per JVM, process tree taskset-pinned to exactly N CPUs, "
                  f"timing excludes generation and startup",
    }
    with open(os.path.join(ROOT, "BENCH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
