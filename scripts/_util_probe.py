"""Measure aggregate CPU utilisation of java+python during the timed
extraction at local[16] — is the job even using 16 cores?"""
import os
import subprocess
import threading
import time

from pyspark.sql import functions as F

from bench import build_spark
from rapidocr_spark.operators.extract import extract_transcripts
from rapidocr_spark.plans.shell import EXTRACT_CFG

CORPUS = "/tmp/rapidocr_spark_scaling_corpus"

samples = []
stop = False


def sampler():
    while not stop:
        out = subprocess.run(
            ["ps", "-eo", "comm,pcpu"], capture_output=True, text=True
        ).stdout
        total = 0.0
        for line in out.splitlines():
            parts = line.split()
            if len(parts) == 2 and parts[0] in ("java", "python", "python3", "python3.11"):
                try:
                    total += float(parts[1])
                except ValueError:
                    pass
        samples.append(total)
        time.sleep(0.5)


spark = build_spark(16, app="util-probe")
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.parquet(CORPUS).persist()
n = df.count()
print("cached partitions:", df.rdd.getNumPartitions(), "rows:", n, flush=True)


def run_once(frame):
    out = extract_transcripts(frame, EXTRACT_CFG)
    out.agg(F.count(F.lit(1)), F.sum("n_boxes"), F.sum("n_chars"), F.count("error")).collect()


run_once(df.where(F.col("turn_idx") == 0))
th = threading.Thread(target=sampler, daemon=True)
th.start()
t0 = time.time()
run_once(df)
dt = time.time() - t0
stop = True
time.sleep(0.6)
print(f"timed={dt:.2f}s tps={n/dt:.0f}")
print(f"cpu%% samples: mean={sum(samples)/max(len(samples),1):.0f} max={max(samples):.0f} (1600 == 16 cores busy)")
spark.stop()
