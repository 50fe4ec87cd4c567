#!/usr/bin/env python
"""Minimal spark-submit job: extract a transcripts parquet table.

    spark-submit --py-files dist/ocr_spark.zip scripts/run_extract.py \
        <input parquet> <output dir> [salt]

Writes three tables under <output dir>: ``extracted/`` (per-turn results,
reassembly window applied), ``metrics/`` (per-partition lineage counters),
``failures/`` (long-form failure spans).  For the resumable checkpointed
variant use jobs/extract_job.py.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession

from ocr_spark.pipeline import extract_transcripts, failure_spans, partition_metrics


def main() -> int:
    inp, out = sys.argv[1], sys.argv[2]
    salt = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    spark = (
        SparkSession.builder.appName("ocr-spark-run-extract")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    df = spark.read.parquet(inp)
    # spans=True: this job writes the full-fidelity artifact (inline
    # spans_json) that the byte-parity verify flow compares; production
    # 10^12-turn runs use the default spans=False + derive_spans instead
    extracted = extract_transcripts(df, salt=salt, spans=True)
    extracted.write.mode("overwrite").parquet(f"{out}/extracted")
    done = spark.read.parquet(f"{out}/extracted")
    partition_metrics(done).write.mode("overwrite").parquet(f"{out}/metrics")
    failure_spans(done).write.mode("overwrite").parquet(f"{out}/failures")
    counts = {
        r["status"]: r["count"]
        for r in done.groupBy("status").count().collect()
    }
    print(f"extracted {done.count()} turns; status counts: {counts}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
