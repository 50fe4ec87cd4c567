#!/usr/bin/env python
"""Is the residual Spark-vs-control gap a cold-JVM artifact?

The bench's mp control times ONLY the kernel over a pre-loaded DataFrame,
while each Spark rep is a FRESH JVM whose timed run follows a single
3000-row warmup — so parquet-scan/Arrow/codegen JIT may still be cold and
bill a fixed cost to the timed job that long-lived executors (the model
the bench explicitly adopts: "session startup and a small warmup job ...
are excluded — on a real cluster executors and their Python workers are
long-lived") never pay.

Variants, each a fresh pinned JVM running the SAME timed job
(salt="auto", reassemble="sorted", the benched at-scale shape):

  warm3k   — status quo: warmup = 3000-row job
  warm30k  — warmup = 30000-row job
  warmfull — warmup = the full job once (fully-warm executor model)

Interleaved reps so all variants sample each steal window; best-of and
all runs reported.

Usage: python scripts/exp_warmup.py [CPUS] [REPS]
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

VARIANTS = {"warm3k": 3000, "warm30k": 30000, "warmfull": -1}


def worker(cpus: int, warm: int, parquet: str) -> None:
    from bench import _force, _session
    from ocr_spark.pipeline import extract_transcripts

    spark = _session(cpus, shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(parquet)
    if warm == -1:
        _force(
            extract_transcripts(df, salt="auto", partitions=2 * cpus, reassemble="sorted")
        )
    else:
        _force(extract_transcripts(df.limit(warm), salt=2, partitions=cpus))
    t0 = time.time()
    _force(
        extract_transcripts(df, salt="auto", partitions=2 * cpus, reassemble="sorted")
    )
    print(json.dumps({"sec": round(time.time() - t0, 2)}))
    spark.stop()


def main() -> None:
    if len(sys.argv) >= 5 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
        return
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    parquet = os.path.join(REPO, ".bench", "transcripts_60000.parquet")
    assert os.path.exists(parquet), "run bench.py first to generate the corpus"
    taskset = shutil.which("taskset")
    total = os.cpu_count() or 32
    pin = [taskset, "-c", f"{total - cpus}-{total - 1}"] if taskset else []
    runs: dict[str, list[float]] = {v: [] for v in VARIANTS}
    for rep in range(reps):
        for name, warm in VARIANTS.items():
            r = subprocess.run(
                pin + [sys.executable, os.path.abspath(__file__), "--worker",
                       str(cpus), str(warm), parquet],
                capture_output=True, text=True, timeout=1800,
            )
            try:
                sec = float(json.loads(r.stdout.strip().splitlines()[-1])["sec"])
            except Exception:
                sys.stderr.write(f"{name} rep {rep} failed: {r.stderr[-300:]}\n")
                continue
            runs[name].append(sec)
            print(f"rep {rep} {name}: {sec}s", flush=True)
    print(json.dumps({
        "cpus": cpus,
        "best": {k: min(v) for k, v in runs.items() if v},
        "all": runs,
    }))


if __name__ == "__main__":
    main()
