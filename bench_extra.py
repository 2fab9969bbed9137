#!/usr/bin/env python
"""Round-8 optimization measurement harness (bench.py is FROZEN for the
driver's measurement — this file exists so the optimization work can time
individual queries, run more attempts, and dump physical plans without
touching the frozen harness).

Usage:
    python bench_extra.py [--sf-dir DIR] [--attempts N] [--explain DIR]
                          [query ...]

- Same session configuration as bench.py (master local[$SPARK_GRAFT_CPUS],
  shuffle partitions, arrow, split sizing) so numbers are comparable.
- Each query is timed with the noop sink (guide §1.4) best-of-N with
  spark.catalog.clearCache() per attempt, exactly like bench.py.
- --explain DIR writes <query>.txt with .explain("formatted") output.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--attempts", type=int, default=2)
    ap.add_argument("--explain", default=None, help="dir for explain('formatted') dumps")
    ap.add_argument("--out", default=None, help="write JSON result to this path too")
    ap.add_argument("queries", nargs="*", help="query names (default: bench.py headline set)")
    args = ap.parse_args()

    from bench import build_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(cpus, app="rapidocr-spark-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")

    from rapidocr_spark.plans.shell import queries

    q = queries()
    names = args.queries or list(q.keys())

    # same warmup as bench.py: parquet reader, codegen, python workers
    spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").agg({"l_quantity": "sum"}).collect()
    q["doc_token_stats"](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
    q["mm_decode_meta"](spark, args.sf_dir).write.format("noop").mode("overwrite").save()

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)

    times: dict[str, list[float]] = {}
    for name in names:
        if name not in q:
            print(f"!! unknown query {name}")
            continue
        if args.explain:
            spark.catalog.clearCache()
            df = q[name](spark, args.sf_dir)
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        attempts = []
        for _ in range(args.attempts):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            df = q[name](spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            attempts.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        times[name] = attempts
        print(json.dumps({"query": name, "best": min(attempts), "attempts": attempts}), flush=True)

    result = {
        "sf_dir": args.sf_dir,
        "cpus": cpus,
        "best": {k: min(v) for k, v in times.items()},
        "attempts": times,
        "total_best": round(sum(min(v) for v in times.values()), 3),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
