#!/usr/bin/env python
"""Round-3 overhead knobs at local[32]: partition count x arrow batch."""
import json, os, shutil, subprocess, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def worker(parts, batch, parquet):
    from pyspark.sql import SparkSession
    from ocr_spark.pipeline import extract_transcripts
    spark = (SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(parquet)
    def _force(d): d.write.format("noop").mode("overwrite").save()
    _force(extract_transcripts(df.limit(3000), salt=2, partitions=32))
    t0 = time.time()
    _force(extract_transcripts(df, salt=8, partitions=parts))
    print(json.dumps({"sec": round(time.time() - t0, 2)}))
    spark.stop()

CONFIGS = [("p64_b10k", 64, 10000), ("p44_b10k", 44, 10000),
           ("p64_b20k", 64, 20000), ("p96_b10k", 96, 10000)]

def main():
    if len(sys.argv) >= 5 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]); return
    parquet = os.path.join(REPO, ".bench", "transcripts_60000.parquet")
    turns = json.load(open(parquet + ".meta.json"))["turns"]
    taskset = shutil.which("taskset")
    res = {n: [] for n, *_ in CONFIGS}
    for rep in range(2):
        for name, parts, batch in CONFIGS:
            pin = [taskset, "-c", "0-31"] if taskset else []
            r = subprocess.run(pin + [sys.executable, os.path.abspath(__file__),
                "--worker", str(parts), str(batch), parquet],
                capture_output=True, text=True, timeout=1800)
            if r.returncode != 0: print(name, "FAILED", r.stderr[-200:]); continue
            sec = float(json.loads(r.stdout.strip().splitlines()[-1])["sec"])
            res[name].append(sec)
            print(f"rep{rep} {name:9s} {sec:6.2f}s {turns/sec:8.0f} turns/s", flush=True)
    for n, v in res.items():
        if v: print(f"{n:9s} best {min(v):.2f}s all={v}")
if __name__ == "__main__":
    main()
