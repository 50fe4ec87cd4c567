"""Incremental minhash signing (SCALE.md §9 "write the signatures once").

A growing corpus must be near-dup-checkable without re-running the shingle
+ minhash chain over already-signed docs:

1. ``minhash_bands_incremental`` signs ONLY the unsigned remainder;
2. ``dedup_minhash_incremental`` (stored signatures + fresh ones, verify
   re-shingles candidates only) returns EXACTLY the full-recompute answer;
3. re-running against an up-to-date signature table signs nothing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators import dedup


@pytest.fixture(autouse=True)
def _clear_cache(spark):
    """The library persists its shingle/candidate relations; in the shared
    test session those cached plans would otherwise substitute into later
    tests' plans (the plan-shape suite reads explain output, and an
    InMemoryRelation prints its cached subplan's nodes)."""
    yield
    spark.catalog.clearCache()

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return dedup.load(spark, SF_DIR, "documents").select("doc_id", "text")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_incremental_matches_full_recompute(spark, tmp_path):
    docs = _docs(spark)
    batch1 = docs.filter(F.col("doc_id") % 3 != 0)

    sig_path = str(tmp_path / "signatures.parquet")
    dedup.minhash_bands(spark, SF_DIR, shingle_arrays=None).join(
        batch1.select("doc_id"), "doc_id", "left_semi"
    ).write.parquet(sig_path)
    signed = spark.read.parquet(sig_path)

    incremental = dedup.dedup_minhash_incremental(spark, docs, signed)
    full = dedup.dedup_minhash_lsh(spark, SF_DIR)
    assert _rows(incremental) == _rows(full)
    assert len(_rows(full)) > 0, "fixture must exercise at least one pair"


def test_incremental_signs_only_unsigned_docs(spark, tmp_path):
    docs = _docs(spark)
    batch1 = docs.filter(F.col("doc_id") % 3 != 0)
    batch2_ids = {r.doc_id for r in docs.exceptAll(batch1).select("doc_id").collect()}

    sig_path = str(tmp_path / "signatures.parquet")
    dedup.minhash_bands(spark, SF_DIR).join(
        batch1.select("doc_id"), "doc_id", "left_semi"
    ).write.parquet(sig_path)
    signed = spark.read.parquet(sig_path)

    new_bands, all_bands = dedup.minhash_bands_incremental(spark, docs, signed)
    new_ids = {r.doc_id for r in new_bands.select("doc_id").distinct().collect()}
    # every unsigned doc gets rows now — real bands, or the band=-1
    # sentinel for docs with < 3 tokens (no shingles)
    assert new_ids == batch2_ids

    # idempotence: with every doc signed, a second pass signs nothing
    new2, _ = dedup.minhash_bands_incremental(spark, docs, all_bands)
    assert new2.count() == 0


def test_incremental_short_docs_get_sentinels_not_rework(spark, tmp_path):
    # the round-4 ADVICE regression: docs too short to shingle previously
    # produced no signature rows, so EVERY incremental run re-ran the
    # shingle pass over the whole short-doc tail.  Now they get one
    # (band=-1, NULL, NULL) sentinel row, join nothing, and the second
    # pass is a true no-op — while pair results still match the full
    # recompute on the same corpus.
    docs = _docs(spark).unionByName(
        spark.createDataFrame(
            [(900001, "tiny"), (900002, "two words"), (900003, "")],
            "doc_id long, text string",
        )
    )
    empty_sigs = spark.createDataFrame(
        [], "doc_id long, band int, s0 long, s1 long"
    )
    new_bands, all_bands = dedup.minhash_bands_incremental(spark, docs, empty_sigs)
    sent = {
        r.doc_id
        for r in new_bands.filter(F.col("band") < 0).select("doc_id").collect()
    }
    assert sent == {900001, 900002, 900003}

    new2, _ = dedup.minhash_bands_incremental(spark, docs, all_bands)
    assert new2.count() == 0  # short docs no longer re-signed every run

    incremental = dedup.dedup_minhash_incremental(spark, docs, all_bands)
    full = dedup.dedup_minhash_lsh(spark, SF_DIR)
    assert _rows(incremental) == _rows(full)
