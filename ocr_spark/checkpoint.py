"""Checkpointed, resumable extraction runs (north_rule: "resumable from
Iceberg snapshot checkpoints with per-partition lineage rows ... written to
a metrics table").

Model
-----
The input keyspace is divided into ``buckets`` stable hash buckets of
``conv_id`` (`pmod(hash(conv_id), buckets)`) — a conversation always lands
in the same bucket, so bucket completion is a durable unit of progress.
Buckets are processed in chunks; after each chunk the job commits

1. the extracted rows, written ``partitionBy(bucket)`` with dynamic
   partition overwrite — re-running a half-finished chunk *overwrites* its
   buckets instead of duplicating them (idempotent, exactly-once per
   bucket), and
2. one lineage row per bucket to ``<output>/_lineage`` — (bucket, conv_id
   range, turn range, status counters, token/field totals, run_id,
   chunk_id) — the generalized flags model of the reference
   (``NFT_OCR.py:1470-1478,1510`` per-file status lists).

On restart, completed buckets are read from the lineage table and skipped
(the anti-join resume of SURVEY §2.10; the reference's precedent is its
memoized skip-seen-keys loop, ``Ingredients_OCR.py:222-224``,
``Google_OCR_API.py:74-75``).

On a real deployment the same structure maps 1:1 onto Iceberg: the chunk
commit becomes an Iceberg snapshot (atomic MERGE/overwrite of the bucket
partitions), `_lineage` becomes a second Iceberg table appended in the
same transaction-ish commit sequence, and resume reads the last snapshot.
The sandbox has no Iceberg runtime jar, so the parquet emulation here
keeps the exact commit/resume semantics with dynamic partition overwrite.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.pipeline import extract_transcripts

LINEAGE_SUBDIR = "_lineage"
DATA_SUBDIR = "data"


def _bucketed(df: DataFrame, buckets: int) -> DataFrame:
    return df.withColumn("bucket", F.pmod(F.hash(F.col("conv_id")), F.lit(buckets)))


class CheckpointedExtraction:
    """Drive `extract_transcripts` over an input table in resumable chunks.

    Parameters
    ----------
    input_df : transcripts DataFrame (conv_id, turn_idx, role, text, tool, ts)
    output_dir : root directory; extracted rows under ``data/``
        (partitioned by bucket), lineage rows under ``_lineage/``
    buckets : stable hash buckets over conv_id (the resume granularity)
    chunk_buckets : buckets committed per chunk (the failure granularity)
    salt : skew salt forwarded to the extraction repartition
    """

    def __init__(
        self,
        spark: SparkSession,
        input_df: DataFrame,
        output_dir: str,
        *,
        buckets: int = 32,
        chunk_buckets: int = 8,
        salt: int = 8,
        run_id: str | None = None,
    ):
        self.spark = spark
        self.input_df = input_df
        self.output_dir = output_dir.rstrip("/")
        self.buckets = buckets
        self.chunk_buckets = chunk_buckets
        self.salt = salt
        self.run_id = run_id or f"run_{int(time.time() * 1000):x}"
        self.data_dir = f"{self.output_dir}/{DATA_SUBDIR}"
        self.lineage_dir = f"{self.output_dir}/{LINEAGE_SUBDIR}"

    # -- resume bookkeeping -------------------------------------------------

    def lineage(self) -> DataFrame | None:
        try:
            return self.spark.read.parquet(self.lineage_dir)
        except Exception:
            return None  # first run: no lineage yet

    def completed_buckets(self) -> set[int]:
        lin = self.lineage()
        if lin is None:
            return set()
        return {r.bucket for r in lin.select("bucket").distinct().collect()}

    def pending_buckets(self) -> list[int]:
        done = self.completed_buckets()
        return [b for b in range(self.buckets) if b not in done]

    # -- execution ----------------------------------------------------------

    def run(self, max_chunks: int | None = None) -> int:
        """Process pending buckets chunk by chunk; returns chunks committed.

        ``max_chunks`` bounds work for tests (simulating a crash between
        chunk commits); production passes None and runs to completion.
        """
        pending = self.pending_buckets()
        chunks = [
            pending[i : i + self.chunk_buckets]
            for i in range(0, len(pending), self.chunk_buckets)
        ]
        if max_chunks is not None:
            chunks = chunks[:max_chunks]

        # Dynamic overwrite: INSERT OVERWRITE only touches the bucket
        # partitions present in the written frame (Iceberg's
        # overwrite-by-filter snapshot in parquet form).
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

        src = _bucketed(self.input_df, self.buckets)
        for chunk_id, chunk in enumerate(chunks):
            subset = src.filter(F.col("bucket").isin(chunk))
            extracted = extract_transcripts(
                subset.drop("bucket"), salt=self.salt, reassemble=False
            )
            out = _bucketed(extracted, self.buckets)
            out.write.mode("overwrite").partitionBy("bucket").parquet(self.data_dir)
            lineage_rows = (
                out.groupBy("bucket")
                .agg(
                    F.min("conv_id").alias("conv_id_min"),
                    F.max("conv_id").alias("conv_id_max"),
                    F.min("turn_idx").alias("turn_idx_min"),
                    F.max("turn_idx").alias("turn_idx_max"),
                    F.count(F.lit(1)).alias("turn_count"),
                    F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("ok_count"),
                    F.sum(F.when(F.col("status") == "empty", 1).otherwise(0)).alias(
                        "empty_count"
                    ),
                    F.sum(
                        F.when(~F.col("status").isin("ok", "empty"), 1).otherwise(0)
                    ).alias("failed_count"),
                    F.sum("n_tokens").alias("token_count"),
                    F.sum("n_fields").alias("field_count"),
                )
                .withColumn("run_id", F.lit(self.run_id))
                .withColumn("chunk_id", F.lit(chunk_id))
                .withColumn("committed_at", F.current_timestamp())
            )
            # lineage append AFTER data commit: a crash between the two
            # leaves the bucket un-marked -> it is simply redone (and the
            # dynamic overwrite makes the redo idempotent).
            lineage_rows.write.mode("append").parquet(self.lineage_dir)
        return len(chunks)

    # -- audit --------------------------------------------------------------

    def result(self) -> DataFrame:
        """Extracted rows with the stable-order reassembly window applied."""
        from pyspark.sql import Window

        out = self.spark.read.parquet(self.data_dir)
        w = Window.partitionBy("conv_id").orderBy("turn_idx")
        wc = Window.partitionBy("conv_id")
        return out.withColumn("turn_rank", F.row_number().over(w)).withColumn(
            "conv_turns", F.count(F.lit(1)).over(wc)
        )

    def validate(self) -> dict:
        """Coverage audit from lineage alone (no data rescan): every bucket
        committed exactly once per run set, and turn totals match input."""
        lin = self.lineage()
        done = self.completed_buckets()
        n_input = self.input_df.count()
        n_lineage = (
            lin.groupBy("bucket").agg(F.max("turn_count").alias("tc")).agg(
                F.sum("tc")
            ).collect()[0][0]
            if lin is not None
            else 0
        )
        return {
            "buckets_total": self.buckets,
            "buckets_done": len(done),
            "input_turns": n_input,
            "lineage_turns": int(n_lineage or 0),
            "complete": len(done) == self.buckets and int(n_lineage or 0) == n_input,
        }
