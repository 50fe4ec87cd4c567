"""Checkpoint-resume gate (north_rule: resumable with per-partition
lineage; SURVEY §5.2 item 3 — kill mid-job, restart, no duplicate or
missing turns)."""

from __future__ import annotations

from ocr_spark import synth
from ocr_spark.checkpoint import CheckpointedExtraction
from ocr_spark.pipeline import extract_transcripts

N_CONVS = 40


def _keys(df):
    return sorted(
        (r.conv_id, r.turn_idx, r.extracted_text)
        for r in df.select("conv_id", "turn_idx", "extracted_text").collect()
    )


def test_interrupted_run_resumes_exactly_once(spark, tmp_path):
    pdf = synth.generate_local(N_CONVS, shuffled=True)
    sdf = spark.createDataFrame(pdf)
    out = str(tmp_path / "ckpt")

    # first run "crashes" after 2 of 4 chunk commits
    job1 = CheckpointedExtraction(
        spark, sdf, out, buckets=8, chunk_buckets=2, salt=2
    )
    committed = job1.run(max_chunks=2)
    assert committed == 2
    assert len(job1.pending_buckets()) == 4
    assert not job1.validate()["complete"]

    # restart: a fresh driver resumes from lineage and finishes
    job2 = CheckpointedExtraction(
        spark, sdf, out, buckets=8, chunk_buckets=2, salt=2
    )
    assert len(job2.pending_buckets()) == 4
    job2.run()
    audit = job2.validate()
    assert audit["complete"], audit
    assert audit["lineage_turns"] == len(pdf)

    # no duplicates, no missing turns, and per-turn output identical to a
    # single uninterrupted pipeline run
    got = _keys(job2.result())
    want = _keys(extract_transcripts(sdf, salt=2, partitions=4))
    assert len(got) == len(pdf)
    assert got == want

    # re-running a completed job is a no-op
    job3 = CheckpointedExtraction(
        spark, sdf, out, buckets=8, chunk_buckets=2, salt=2
    )
    assert job3.run() == 0
    assert _keys(job3.result()) == want


def test_stable_turn_order_after_resume(spark, tmp_path):
    pdf = synth.generate_local(12, shuffled=True)
    sdf = spark.createDataFrame(pdf)
    out = str(tmp_path / "ckpt2")
    job = CheckpointedExtraction(spark, sdf, out, buckets=4, chunk_buckets=1, salt=2)
    job.run(max_chunks=1)
    job.run()
    res = job.result().orderBy("conv_id", "turn_idx").toPandas()
    # turn_rank from the reassembly window is dense 1..n per conversation
    for _, grp in res.groupby("conv_id"):
        assert list(grp["turn_rank"]) == list(range(1, len(grp) + 1))
        assert list(grp["turn_idx"]) == sorted(grp["turn_idx"])


def test_empty_buckets_complete_and_rerun_is_noop(spark, tmp_path):
    """Regression: with far more buckets than conversations, the empty
    buckets must still be marked complete — previously they never got a
    lineage row, so validate() stayed incomplete and every 'resume' reran
    full extraction chunks forever."""
    pdf = synth.generate_local(3, shuffled=True)
    sdf = spark.createDataFrame(pdf)
    out = str(tmp_path / "ckpt_sparse")
    job = CheckpointedExtraction(spark, sdf, out, buckets=32, chunk_buckets=8, salt=2)
    job.run()
    assert job.pending_buckets() == []
    audit = job.validate(deep=True)
    assert audit["complete"], audit
    assert audit["lineage_turns"] == len(pdf)
    # a fresh driver over the same output does nothing
    job2 = CheckpointedExtraction(spark, sdf, out, buckets=32, chunk_buckets=8, salt=2)
    assert job2.run() == 0


def test_bucket_scheme_mismatch_refused(spark, tmp_path):
    """Resuming the same output_dir with a different --buckets would mix
    two hash schemes (duplicates from stale partitions + missing rows from
    renumbered 'complete' buckets); the lineage records its scheme and a
    mismatched resume must refuse to run."""
    import pytest

    pdf = synth.generate_local(6, shuffled=True)
    sdf = spark.createDataFrame(pdf)
    out = str(tmp_path / "ckpt_scheme")
    CheckpointedExtraction(spark, sdf, out, buckets=8, chunk_buckets=4, salt=2).run(
        max_chunks=1
    )
    bad = CheckpointedExtraction(spark, sdf, out, buckets=16, chunk_buckets=4, salt=2)
    with pytest.raises(ValueError, match="bucket-scheme mismatch"):
        bad.run()
    # the original scheme still resumes fine
    ok = CheckpointedExtraction(spark, sdf, out, buckets=8, chunk_buckets=4, salt=2)
    ok.run()
    assert ok.validate(deep=True)["complete"]


def test_span_mode_mismatch_refused(spark, tmp_path):
    """Resuming a spans=False output with spans=True (or vice versa) would
    mix data files with and without the spans_json column under one data
    dir; the lineage records the mode and a mismatched resume must refuse."""
    import pytest

    pdf = synth.generate_local(6, shuffled=True)
    sdf = spark.createDataFrame(pdf)
    out = str(tmp_path / "ckpt_spans")
    CheckpointedExtraction(
        spark, sdf, out, buckets=8, chunk_buckets=4, salt=2, spans=False
    ).run(max_chunks=1)
    bad = CheckpointedExtraction(
        spark, sdf, out, buckets=8, chunk_buckets=4, salt=2, spans=True
    )
    with pytest.raises(ValueError, match="span-mode mismatch"):
        bad.run()
    ok = CheckpointedExtraction(
        spark, sdf, out, buckets=8, chunk_buckets=4, salt=2, spans=False
    )
    ok.run()
    assert ok.validate(deep=True)["complete"]
    assert "spans_json" not in ok.result().columns


def test_iceberg_backend_detection(spark, tmp_path):
    """table_format='iceberg' maps 1:1 onto the parquet emulation (V2
    writeTo snapshot commits); in an environment without the
    iceberg-spark-runtime jar it must fail fast at construction with
    guidance, and bogus formats are rejected outright."""
    import pytest

    pdf = synth.generate_local(2, shuffled=False)
    sdf = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="unknown table_format"):
        CheckpointedExtraction(spark, sdf, str(tmp_path / "x"), table_format="delta")
    has_iceberg = True
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
    except Exception:
        has_iceberg = False
    if has_iceberg:
        pytest.skip("iceberg runtime present; covered by the real-backend path")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        CheckpointedExtraction(
            spark, sdf, "local.db.extract", table_format="iceberg"
        )


def test_overwrite_mode_restored(spark, tmp_path):
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    pdf = synth.generate_local(4, shuffled=False)
    job = CheckpointedExtraction(
        spark, spark.createDataFrame(pdf), str(tmp_path / "c"), buckets=4,
        chunk_buckets=4, salt=2,
    )
    job.run()
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC") == prev
