#!/usr/bin/env python
"""Oversubscription experiment for the mandated local[8]->local[32] pair.

Round-2 data showed Spark-at-32 collapsing (raw eff 0.145) while a bare
32-process mp control scaled 0.76 on the same input in the same steal
window.  The named structural suspect (SCALE.md §7): at local[32] the job
runs 64 runnable threads (32 JVM task threads + 32 forked Python workers)
on 32 cores, straddling the host's >16-busy-core throttle knee.

This script measures the untried fixes head-to-head, interleaved per rep
so all configs sample the same steal window:

  base32    local[32], task.cpus=1, 64 partitions   (status quo: 64 runnable)
  tc2_32    local[32], task.cpus=2, 32 partitions   (16 slots -> 32 runnable)
  tc2_32w4  local[32], task.cpus=2, 64 partitions   (16 slots, 4 waves)
  s16in32   local[16] pinned to all 32 cores, 32 partitions (16 pairs float)
  base8     local[8],  task.cpus=1, 16 partitions   (the N level, status quo)

Usage: python scripts/exp_oversub.py [reps]
       python scripts/exp_oversub.py --worker CPUS TASK_CPUS PARTS PARQUET
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(cpus: int, task_cpus: int, parts: int, parquet: str) -> None:
    from pyspark.sql import SparkSession

    from ocr_spark.pipeline import extract_transcripts

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.task.cpus", str(task_cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(parquet)

    def _force(d):
        d.write.format("noop").mode("overwrite").save()

    _force(extract_transcripts(df.limit(3000), salt=2, partitions=cpus))
    t0 = time.time()
    _force(extract_transcripts(df, salt=8, partitions=parts))
    dt = time.time() - t0
    spark.stop()
    print(json.dumps({"sec": round(dt, 2)}))


CONFIGS = [
    # name, pin_cores, local_n, task_cpus, partitions
    ("base8", 8, 8, 1, 16),
    ("base32", 32, 32, 1, 64),
    ("tc2_32", 32, 32, 2, 32),
    ("tc2_32w4", 32, 32, 2, 64),
    ("s16in32", 32, 16, 1, 32),
]


def main() -> None:
    if len(sys.argv) >= 6 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), sys.argv[5])
        return
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    parquet = os.path.join(REPO, ".bench", "transcripts_60000.parquet")
    with open(parquet + ".meta.json") as f:
        turns = json.load(f)["turns"]
    taskset = shutil.which("taskset")
    total = os.cpu_count() or 32
    results: dict[str, list[float]] = {name: [] for name, *_ in CONFIGS}
    for rep in range(reps):
        for name, pin, local_n, tc, parts in CONFIGS:
            pin_args = [taskset, "-c", f"{total - pin}-{total - 1}"] if taskset else []
            r = subprocess.run(
                pin_args
                + [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--worker",
                    str(local_n),
                    str(tc),
                    str(parts),
                    parquet,
                ],
                capture_output=True,
                text=True,
                timeout=1800,
            )
            if r.returncode != 0 or not r.stdout.strip():
                sys.stderr.write(f"{name} rep{rep} FAILED: {r.stderr[-400:]}\n")
                continue
            sec = float(json.loads(r.stdout.strip().splitlines()[-1])["sec"])
            results[name].append(sec)
            print(
                f"rep{rep} {name:9s} {sec:6.2f}s  {turns / sec:8.0f} turns/s",
                flush=True,
            )
    print("\n=== best-of per config ===")
    best = {n: min(v) for n, v in results.items() if v}
    for n, v in best.items():
        print(f"{n:9s} best {v:6.2f}s  {turns / v:8.0f} turns/s  all={results[n]}")
    if "base8" in best:
        for n, v in best.items():
            if n == "base8":
                continue
            eff = (turns / v) / (4 * (turns / best["base8"]))
            print(f"eff[8 -> {n}] = {eff:.3f}")


if __name__ == "__main__":
    main()
