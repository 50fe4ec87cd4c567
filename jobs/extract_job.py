#!/usr/bin/env python
"""spark-submit entry point for the extraction pipeline (north_rule:
"ships as a spark-submit --py-files package").

Usage (cluster):

    scripts/build_package.sh           # -> dist/ocr_spark.zip
    spark-submit \
        --py-files dist/ocr_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.execution.arrow.maxRecordsPerBatch=10000 \
        jobs/extract_job.py \
        --input  <path or iceberg table>  \
        --output <output root>            \
        --buckets 4096 --chunk-buckets 256 --salt 16

Usage (sandbox smoke):

    python jobs/extract_job.py --synthetic 2000 --output /tmp/extract_out

Input is an Iceberg transcripts table (``--format iceberg`` +
``--catalog-conf`` on a cluster with the Iceberg runtime) or a parquet
directory of the same schema (conv_id, turn_idx, role, text, tool, ts).
The job is resumable: re-running with the same --output continues from
the lineage table (see ocr_spark/checkpoint.py); completed buckets are
skipped, half-written buckets are overwritten idempotently.

Sizing guidance at 10^12 turns: buckets ~= executors * 8 (resume
granularity well under one executor-hour), chunk-buckets ~= executors
(one commit per "wave"), salt >= 8 so a 10^5-turn conversation spreads
over that many tasks.
"""

from __future__ import annotations

import argparse
import os
import sys

# direct `python jobs/extract_job.py` runs (no --py-files zip on the path)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_session(app: str, shuffle_partitions: int | None):
    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName(app)
    if shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return (
        b.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", help="parquet dir or iceberg table of transcripts")
    p.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    p.add_argument("--output", required=True, help="output root (data/ + _lineage/)")
    p.add_argument("--table-format", default="parquet", choices=["parquet", "iceberg"],
                   help="OUTPUT backend: parquet emulation (default) or real "
                        "Iceberg snapshot commits (needs the runtime jar + a "
                        "catalog; --output is then a table-identifier prefix)")
    p.add_argument("--buckets", type=int, default=32)
    p.add_argument("--chunk-buckets", type=int, default=8)
    p.add_argument("--salt", type=int, default=8)
    p.add_argument("--max-chunks", type=int, default=None,
                   help="stop after N chunk commits (testing / bounded runs)")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--synthetic", type=int, default=None, metavar="N_CONVS",
                   help="ignore --input; run on deterministic synthetic transcripts")
    p.add_argument("--deep-audit", action="store_true",
                   help="cross-check lineage totals against a full input rescan")
    args = p.parse_args(argv)
    if args.synthetic is not None and args.synthetic <= 0:
        p.error("--synthetic requires a positive conversation count")
    if args.synthetic is None and not args.input:
        p.error("either --input or --synthetic is required")

    spark = build_session("ocr-spark-extract", args.shuffle_partitions)
    spark.sparkContext.setLogLevel("WARN")

    from ocr_spark.checkpoint import CheckpointedExtraction

    if args.synthetic:
        from ocr_spark import synth

        df = synth.generate_spark(spark, args.synthetic)
    elif args.format == "iceberg":
        df = spark.read.format("iceberg").load(args.input)
    else:
        df = spark.read.parquet(args.input)

    job = CheckpointedExtraction(
        spark,
        df,
        args.output,
        buckets=args.buckets,
        chunk_buckets=args.chunk_buckets,
        salt=args.salt,
        table_format=args.table_format,
    )
    pending_before = len(job.pending_buckets())
    n = job.run(max_chunks=args.max_chunks)
    audit = job.validate(deep=args.deep_audit)
    print(
        f"committed {n} chunks ({pending_before} buckets were pending); audit: {audit}"
    )
    spark.stop()
    return 0 if (audit["complete"] or args.max_chunks is not None) else 1


if __name__ == "__main__":
    sys.exit(main())
