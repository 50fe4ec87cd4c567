"""Structured Streaming ingestion for the extraction pipeline.

SURVEY §2.10: the reference is strictly batch, and the north rule's
resumability is batch-incremental (see ocr_spark/checkpoint.py).  This
module is the idiomatic Structured Streaming alternative: a file/Iceberg
stream source -> the same Arrow-batched extraction kernel ->
checkpointed sink, with ``Trigger.AvailableNow`` draining whatever has
landed and exactly-once file tracking in the stream checkpoint (the
engine-level version of the reference's memoized skip-seen-keys loop,
``Ingredients_OCR.py:222-224``).

The per-turn kernel is stateless, so the stream needs no watermark for
extraction itself; `turn_rate_metrics` shows the stateful side — a
watermarked sliding-window throughput aggregation over event time `ts`
(late turns beyond the watermark are dropped from the metric, never from
extraction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ocr_spark.pipeline import OUTPUT_SCHEMA, _extract_map

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def stream_source(spark: SparkSession, input_dir: str, max_files: int = 64) -> DataFrame:
    """Streaming scan of a transcripts parquet directory.  The checkpoint
    remembers processed files, so re-runs only ingest new arrivals."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    partitions: int | None = None,
    available_now: bool = True,
):
    """readStream -> salted repartition -> mapInPandas kernel -> parquet
    sink.  Returns the started StreamingQuery; callers awaitTermination().

    No window reassembly inside the stream (a global row_number window is
    not streamable); readers apply the stable-order window at query time,
    exactly as the batch path's `result()` does.
    """
    src = stream_source(spark, input_dir)
    n_part = partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    salted = src.repartition(
        n_part, F.hash(F.col("conv_id")), F.pmod(F.hash(F.col("turn_idx")), F.lit(8))
    )
    extracted = salted.mapInPandas(_extract_map, OUTPUT_SCHEMA)
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


CONV_PROGRESS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turns_seen", IntegerType()),
        StructField("max_turn_idx", IntegerType()),
        StructField("tool_turns", IntegerType()),
    ]
)

_STATE_SCHEMA = "turns INT, max_idx INT, tools INT"


def _conv_progress_fn(key, pdf_iter, state):
    """applyInPandasWithState kernel: running per-conversation counters.

    State = (turns_seen, max_turn_idx, tool_turns), updated per micro-batch
    and emitted after each update — the streaming form of the lineage
    counters (per-key instead of per-partition).  Stateful custom-operator
    surface per SURVEY §2.11; bounded state (3 ints per conversation).
    """
    turns, max_idx, tools = state.get if state.exists else (0, -1, 0)
    for pdf in pdf_iter:
        if len(pdf) == 0:
            # With a state timeout configured, groups can fire with no data;
            # int(pdf["turn_idx"].max()) would then be int(nan) -> ValueError.
            continue
        turns += len(pdf)
        max_idx = max(max_idx, int(pdf["turn_idx"].max()))
        tools += int((pdf["role"] == "tool").sum())
    state.update((turns, max_idx, tools))
    import pandas as pd

    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "turns_seen": [turns],
            "max_turn_idx": [max_idx],
            "tool_turns": [tools],
        }
    )


def conversation_progress(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
):
    """Stateful streaming aggregation over conversations via
    ``applyInPandasWithState`` (custom stateful operator; per-key state
    persists in the stream checkpoint across restarts, so counters
    continue — not restart — when new files arrive).  Updates land in
    ``output_dir`` via foreachBatch append (the memory sink cannot recover
    from a checkpoint); the latest row per conv_id is the current state."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = stream_source(spark, input_dir)
    out = (
        src.groupBy("conv_id")
        .applyInPandasWithState(
            _conv_progress_fn,
            outputStructType=CONV_PROGRESS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

    def _append(batch_df, epoch_id):
        batch_df.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(
            output_dir
        )

    return (
        out.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def turn_rate_metrics(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
):
    """Stateful streaming metric: turns ingested per event-time window,
    with a watermark bounding state for late data.  foreachBatch parquet
    sink (the memory sink cannot recover from a checkpoint, so it would
    break the second invocation of the resume pattern this module uses
    everywhere else)."""
    src = stream_source(spark, input_dir)
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), F.col("role"))
        .agg(F.count(F.lit(1)).alias("turns"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "role",
            "turns",
        )
    )

    def _append(batch_df, epoch_id):
        batch_df.write.mode("append").parquet(output_dir)

    return (
        agg.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
