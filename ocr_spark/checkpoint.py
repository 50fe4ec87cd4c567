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
``table_format="iceberg"`` activates that path (V2 writeTo API:
``overwritePartitions()`` for data, ``append()`` for lineage) against a
configured Iceberg catalog; it needs the iceberg-spark-runtime jar on the
session's classpath.  This sandbox ships no Iceberg jar, so the default
``table_format="parquet"`` emulation keeps the exact commit/resume
semantics with dynamic partition overwrite, and the iceberg path fails
fast with a clear error when the runtime is absent
(tests/test_resume.py pins both the detection and the fallback).
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
        (partitioned by bucket), lineage rows under ``_lineage/``.
        With ``table_format="iceberg"`` this is instead an Iceberg table
        identifier prefix (``catalog.db.name``): data lands in
        ``<prefix>_data``, lineage in ``<prefix>_lineage``.
    buckets : stable hash buckets over conv_id (the resume granularity)
    chunk_buckets : buckets committed per chunk (the failure granularity)
    salt : skew salt forwarded to the extraction repartition
    table_format : "parquet" (default; dynamic-partition-overwrite
        emulation, works everywhere) or "iceberg" (real snapshot commits
        via the V2 writeTo API; requires the iceberg-spark-runtime jar
        and a configured catalog — raises RuntimeError with guidance when
        the runtime is missing)
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
        table_format: str = "parquet",
        spans: bool = False,
    ):
        if table_format not in ("parquet", "iceberg"):
            raise ValueError(f"unknown table_format {table_format!r}")
        self.spark = spark
        self.input_df = input_df
        self.output_dir = output_dir.rstrip("/")
        self.buckets = buckets
        self.chunk_buckets = chunk_buckets
        self.salt = salt
        self.spans = spans
        self.run_id = run_id or f"run_{int(time.time() * 1000):x}"
        self.table_format = table_format
        if table_format == "iceberg":
            self._require_iceberg_runtime()
            self.data_dir = f"{self.output_dir}_data"
            self.lineage_dir = f"{self.output_dir}_lineage"
        else:
            self.data_dir = f"{self.output_dir}/{DATA_SUBDIR}"
            self.lineage_dir = f"{self.output_dir}/{LINEAGE_SUBDIR}"

    def _require_iceberg_runtime(self) -> None:
        """Fail fast (at construction, not mid-job) when the Iceberg
        runtime isn't on the classpath, or when the catalog named by the
        table-identifier prefix isn't configured — with the jar present
        but no ``spark.sql.catalog.<name>`` set, the first
        tableExists/writeTo call would otherwise die mid-run."""
        try:
            self.spark._jvm.java.lang.Class.forName(
                "org.apache.iceberg.spark.SparkCatalog"
            )
        except Exception as exc:
            raise RuntimeError(
                "table_format='iceberg' needs the iceberg-spark-runtime jar "
                "on the Spark classpath and an Iceberg catalog configured "
                "(spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog); "
                "this environment has neither — use the default "
                "table_format='parquet' emulation (identical commit/resume "
                "semantics via dynamic partition overwrite)"
            ) from exc
        catalog = self.output_dir.split(".", 1)[0] if "." in self.output_dir else ""
        try:
            configured = self.spark.conf.get(f"spark.sql.catalog.{catalog}")
        except Exception:
            configured = None
        if not catalog or not configured:
            raise RuntimeError(
                f"table_format='iceberg' needs output_dir to be a table "
                f"identifier prefixed with a configured catalog "
                f"(got {self.output_dir!r}); set "
                f"spark.sql.catalog.{catalog or '<name>'}="
                "org.apache.iceberg.spark.SparkCatalog (plus its type/warehouse "
                "confs) on the session, or use table_format='parquet'"
            )

    # -- storage backends ---------------------------------------------------

    def _read(self, target: str) -> DataFrame:
        if self.table_format == "iceberg":
            return self.spark.read.table(target)
        return self.spark.read.parquet(target)

    def _commit_data(self, out: DataFrame) -> None:
        """Idempotent per-bucket commit: only the bucket partitions present
        in ``out`` are replaced (Iceberg: an overwrite-by-partition
        snapshot; parquet: dynamic partition overwrite)."""
        if self.table_format == "iceberg":
            # existence is checked explicitly, NOT via try/except around the
            # write: a real overwritePartitions failure (schema mismatch,
            # catalog auth, executor loss) must surface as-is so the resume
            # machinery redoes the bucket — retrying it as create() would
            # bury the root cause under TableAlreadyExists.
            if self.spark.catalog.tableExists(self.data_dir):
                out.writeTo(self.data_dir).overwritePartitions()
            else:
                out.writeTo(self.data_dir).partitionedBy(F.col("bucket")).create()
        else:
            out.write.mode("overwrite").partitionBy("bucket").parquet(self.data_dir)

    def _commit_lineage(self, rows: DataFrame) -> None:
        if self.table_format == "iceberg":
            if self.spark.catalog.tableExists(self.lineage_dir):
                rows.writeTo(self.lineage_dir).append()
            else:
                rows.writeTo(self.lineage_dir).create()
        else:
            rows.write.mode("append").parquet(self.lineage_dir)

    # -- resume bookkeeping -------------------------------------------------

    def lineage(self) -> DataFrame | None:
        try:
            return self._read(self.lineage_dir)
        except Exception:
            return None  # first run: no lineage yet

    def completed_buckets(self) -> set[int]:
        lin = self.lineage()
        if lin is None:
            return set()
        # Resume guard: the bucketing scheme is part of the lineage contract.
        # Resuming the same output with a different ``buckets`` would mix two
        # hash schemes — stale data partitions from the old scheme survive
        # dynamic overwrite (duplicates) while buckets "complete" under the
        # old numbering cover different key sets under the new one (missing
        # rows).  Each lineage row records its scheme; refuse a mismatch.
        if "buckets" in lin.columns:
            schemes = {r.buckets for r in lin.select("buckets").distinct().collect()}
            if schemes - {self.buckets}:
                raise ValueError(
                    f"resume bucket-scheme mismatch: lineage at {self.lineage_dir} "
                    f"was written with buckets={sorted(schemes)} but this run uses "
                    f"buckets={self.buckets}; rerun with the original setting or "
                    "use a fresh output_dir"
                )
        # same guard for the output schema: resuming a spans=True output
        # with spans=False (or vice versa) would mix data files with and
        # without the spans_json column under one data table.  Lineage
        # written before the 'spans' column existed is legacy data that was
        # always written WITH spans_json — treat it as spans=True so the
        # guard still fires instead of silently resuming under the current
        # spans=False default.
        if "spans" in lin.columns:
            modes = {bool(r.spans) for r in lin.select("spans").distinct().collect()}
        else:
            modes = {True}
        if modes - {self.spans}:
            raise ValueError(
                f"resume span-mode mismatch: lineage at {self.lineage_dir} was "
                f"written with spans={sorted(modes)} but this run uses "
                f"spans={self.spans}; rerun with the original setting or use a "
                "fresh output_dir"
            )
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
        from ocr_spark.pipeline import metrics_agg

        pending = self.pending_buckets()
        chunks = [
            pending[i : i + self.chunk_buckets]
            for i in range(0, len(pending), self.chunk_buckets)
        ]
        if max_chunks is not None:
            chunks = chunks[:max_chunks]

        # Dynamic overwrite: INSERT OVERWRITE only touches the bucket
        # partitions present in the written frame (Iceberg's
        # overwrite-by-filter snapshot in parquet form).  Saved/restored so
        # the shared session's overwrite semantics aren't silently changed
        # for later writers.
        conf_key = "spark.sql.sources.partitionOverwriteMode"
        prev_mode = self.spark.conf.get(conf_key, None)
        self.spark.conf.set(conf_key, "dynamic")
        try:
            src = _bucketed(self.input_df, self.buckets)
            for chunk_id, chunk in enumerate(chunks):
                subset = src.filter(F.col("bucket").isin(chunk))
                extracted = extract_transcripts(
                    subset.drop("bucket"),
                    salt=self.salt,
                    reassemble=False,
                    spans=self.spans,
                )
                # persisted so the data write and the lineage aggregation
                # share ONE kernel pass (not two)
                out = _bucketed(extracted, self.buckets).persist()
                self._commit_data(out)
                # lineage left-joined with the chunk's bucket list so
                # buckets with zero input rows still get a (zeroed) lineage
                # row — without it they would never be marked complete and
                # every resume would rerun them forever.
                chunk_df = self.spark.createDataFrame(
                    [(int(b),) for b in chunk], "bucket INT"
                )
                agg = metrics_agg(out, "bucket")
                lineage_rows = (
                    chunk_df.join(agg, "bucket", "left")
                    .fillna(
                        0,
                        subset=[
                            "turn_count", "ok_count", "empty_count",
                            "rejected_count", "failed_count",
                            "token_count", "field_count",
                        ],
                    )
                    .withColumn("buckets", F.lit(self.buckets))
                    .withColumn("spans", F.lit(self.spans))
                    .withColumn("run_id", F.lit(self.run_id))
                    .withColumn("chunk_id", F.lit(chunk_id))
                    .withColumn("committed_at", F.current_timestamp())
                )
                # lineage append AFTER data commit: a crash between the two
                # leaves the bucket un-marked -> it is simply redone (and the
                # per-bucket overwrite makes the redo idempotent).
                self._commit_lineage(lineage_rows)
                out.unpersist()
        finally:
            if prev_mode is None:
                self.spark.conf.unset(conf_key)
            else:
                self.spark.conf.set(conf_key, prev_mode)
        return len(chunks)

    # -- audit --------------------------------------------------------------

    def result(self) -> DataFrame:
        """Extracted rows with the stable-order reassembly window applied."""
        from pyspark.sql import Window

        out = self._read(self.data_dir)
        w = Window.partitionBy("conv_id").orderBy("turn_idx")
        wc = Window.partitionBy("conv_id")
        return out.withColumn("turn_rank", F.row_number().over(w)).withColumn(
            "conv_turns", F.count(F.lit(1)).over(wc)
        )

    def validate(self, deep: bool = False) -> dict:
        """Coverage audit from lineage alone (no input rescan): complete
        iff every bucket has a lineage row.  ``deep=True`` additionally
        rescans the input table to cross-check turn totals — a full input
        scan, so at production scale reserve it for spot audits.

        The shallow check assumes a STATIC input between runs: if the input
        table gained rows in already-committed buckets, lineage presence
        alone cannot see them (those rows are never extracted yet the audit
        reports complete).  Append-while-resuming inputs must either run
        ``deep=True`` on the final chunk or route new data through a new
        output_dir / run."""
        lin = self.lineage()
        done = self.completed_buckets()
        n_lineage = (
            lin.groupBy("bucket").agg(F.max("turn_count").alias("tc")).agg(
                F.sum("tc")
            ).collect()[0][0]
            if lin is not None
            else 0
        )
        out = {
            "buckets_total": self.buckets,
            "buckets_done": len(done),
            "lineage_turns": int(n_lineage or 0),
            "complete": len(done) == self.buckets,
        }
        if deep:
            n_input = self.input_df.count()
            out["input_turns"] = n_input
            out["complete"] = out["complete"] and int(n_lineage or 0) == n_input
        return out
