"""Multimodal plumbing: binary columns cross the Arrow boundary intact,
stub decodes are deterministic, metadata aggs never touch payload bytes."""

from __future__ import annotations

import hashlib

from ocr_spark.operators.multimodal import (
    _decode_audio_stub,
    _decode_image_stub,
    assets,
    mm_feature_extract,
    mm_metadata_stats,
)

SF = "/root/testdata/sf0.001"


def test_assets_schema_and_payload_bytes(spark):
    a = assets(spark, SF)
    row = a.filter("asset_id = 4").collect()[0]
    assert row.kind == "image" and row.n_bytes == 16
    assert bytes(row.payload) == hashlib.md5(b"4").digest()
    assert row.sample_rate is None  # typed metadata is kind-specific


def test_feature_extract_matches_local_stub(spark):
    feats = {r.asset_id: r for r in mm_feature_extract(spark, SF).collect()}
    arows = assets(spark, SF).collect()
    assert len(feats) == len(arows)
    for a in arows[:20]:
        want = (
            _decode_image_stub(bytes(a.payload), a.width, a.height)
            if a.kind == "image"
            else _decode_audio_stub(bytes(a.payload), a.sample_rate)
        )
        got = feats[a.asset_id]
        assert got.feature_0 == want["feature_0"]
        assert got.out_w == want["out_w"]
        assert got.ok == "true"


def test_metadata_stats_prune_binary(spark):
    df = mm_metadata_stats(spark, SF)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "payload" not in plan  # binary column pruned before the scan
    rows = {r.kind: r for r in df.collect()}
    assert set(rows) == {"image", "audio"}
    assert all(r.total_bytes == r.n_assets * 16 for r in rows.values())
