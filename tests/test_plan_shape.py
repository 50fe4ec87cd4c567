"""Physical-plan regression guards for the extraction pipeline's scale
posture (SCALE.md §1/§3/§7): exactly one Python/Arrow stage, a 5-column
scan, and CONDITIONAL exchanges — explicit salt + window reassembly keep
their two shuffles, while the at-scale posture (salt="auto" over a
well-partitioned file scan, reassemble="sorted") must compile to ZERO
exchanges: scan -> coalesce -> mapInPandas -> local sort -> sink in one
stage."""

from __future__ import annotations

from ocr_spark import synth
from ocr_spark.pipeline import INPUT_COLUMNS, extract_transcripts


def _plan(df):
    return df._jdf.queryExecution().optimizedPlan().toString(), df._jdf.queryExecution().executedPlan().toString()


def test_pipeline_plan_shape(spark, tmp_path):
    path = str(tmp_path / "t.parquet")
    spark.createDataFrame(synth.generate_local(20)).write.parquet(path)
    # extra column that must be pruned out of the scan
    df = spark.read.parquet(path)
    out = extract_transcripts(df, salt=4, partitions=8)
    optimized, executed = _plan(out)

    assert executed.count("MapInPandas") == 1  # ONE Arrow stage, not N
    n_exchange = executed.count("Exchange")
    assert n_exchange == 2, f"expected 2 shuffles (salt + window), got {n_exchange}"
    # column pruning: ts never crosses into the scan output
    import re

    scan = re.search(r"ReadSchema: struct<([^>]*)>", executed)
    if scan:  # formatted scan line present
        cols = {c.split(":")[0] for c in scan.group(1).split(",")}
        assert cols == set(INPUT_COLUMNS), cols


def test_dedup_candidate_joins_are_not_all_pairs(spark):
    """Scale guard: simhash and embedding dedup generate candidate pairs
    via equi-joins (pigeonhole segments / LSH buckets), never a cartesian
    or broadcast-nested-loop product — the O(N^2) shape that cannot run at
    10^9 docs."""
    from ocr_spark.operators.dedup import dedup_embedding_lsh, dedup_simhash

    sf_dir = "/root/testdata/sf0.001"
    for fn in (dedup_simhash, dedup_embedding_lsh):
        _, executed = _plan(fn(spark, sf_dir))
        assert "CartesianProduct" not in executed, fn.__name__
        assert "BroadcastNestedLoopJoin" not in executed, fn.__name__


def test_minhash_signatures_are_map_side(spark):
    """Scale guard (round 4): minhash signature generation must be pure
    map work — shingle sets are in-row arrays and the k minhashes are
    array_min(transform(...)) over them, so the ONLY admissible exchange
    before the (band, sig) bucket key is the conditional parallelism
    fan-out repartition. An aggregate or window in this plan means the
    full-corpus shingle shuffle of rounds 1-3 crept back in."""
    from ocr_spark.operators.dedup import minhash_bands

    # cached relations from earlier tests substitute into this plan as
    # InMemoryRelations that PRINT their cached subplan's nodes — assert
    # over the genuinely compiled shape, not session cache state
    spark.catalog.clearCache()
    _, executed = _plan(minhash_bands(spark, "/root/testdata/sf0.001"))
    for node in ("HashAggregate", "SortAggregate", "Window", "Join"):
        assert node not in executed, (node, executed)
    assert executed.count("Exchange") <= 1, executed  # fan-out repartition only


def test_no_reassembly_means_single_shuffle(spark, tmp_path):
    path = str(tmp_path / "t2.parquet")
    spark.createDataFrame(synth.generate_local(10)).write.parquet(path)
    out = extract_transcripts(spark.read.parquet(path), salt=4, partitions=8, reassemble=False)
    _, executed = _plan(out)
    assert executed.count("Exchange") == 1  # only the salt repartition


def test_auto_salt_sorted_reassembly_is_exchange_free(spark, tmp_path):
    """The at-scale posture (the benched job): a well-partitioned file scan
    with salt="auto" and bucketed-sink local-sort reassembly must be ONE
    stage — no Exchange anywhere in the plan, the round-4 fix for the
    measured ~2.2 s two-exchange overhead at 32 cores (SCALE.md §7)."""
    path = str(tmp_path / "t3.parquet")
    spark.createDataFrame(synth.generate_local(40)).repartition(8).write.parquet(path)
    df = spark.read.parquet(path)
    out = extract_transcripts(df, salt="auto", partitions=8, reassemble="sorted")
    _, executed = _plan(out)
    assert executed.count("Exchange") == 0, executed
    assert executed.count("MapInPandas") == 1
    assert "Sort" in executed  # the local (within-partition) sort is present


def test_auto_salt_falls_back_to_repartition_when_underpartitioned(spark):
    """An input with fewer partitions than the session's parallelism (an
    upstream agg, a giant unsplittable file) still gets the salted-shuffle
    skew insurance under salt="auto"."""
    pdf = synth.generate_local(10)
    df = spark.createDataFrame(pdf).coalesce(1)
    out = extract_transcripts(df, salt="auto", partitions=8, reassemble=False)
    _, executed = _plan(out)
    assert executed.count("Exchange") == 1  # the auto-triggered salt repartition


def test_auto_salt_keeps_insurance_on_key_correlated_input(spark, tmp_path):
    """salt="auto" must NOT trust partition count when the input's plan
    contains a wide node: after repartition("conv_id") (or a groupBy/sort
    on it) whole conversations are co-located, so a healthy-looking
    partition count can still hide a 10^5-turn conversation in one task.
    The salted repartition must survive for such inputs."""
    path = str(tmp_path / "t5.parquet")
    spark.createDataFrame(synth.generate_local(40)).write.parquet(path)
    df = spark.read.parquet(path).repartition(8, "conv_id")  # >= n_part, keyed
    out = extract_transcripts(df, salt="auto", partitions=8, reassemble=False)
    _, executed = _plan(out)
    # exactly one salt exchange directly feeding the kernel (the user's own
    # repartition(8, conv_id) collapses into it: Catalyst drops a
    # repartition that is immediately re-shuffled)
    assert executed.count("Exchange") >= 1, executed
    assert "pmod" in executed, executed  # the salt expression is present


def test_auto_sorted_output_matches_salted_windowed(spark, tmp_path):
    """Mode equivalence: the exchange-free posture yields the same row SET
    as the full salted+windowed pipeline (minus the derivable window
    columns), and every output partition is (conv_id, turn_idx)-sorted."""
    path = str(tmp_path / "t4.parquet")
    spark.createDataFrame(synth.generate_local(30)).repartition(8).write.parquet(path)
    df = spark.read.parquet(path)
    fast = extract_transcripts(df, salt="auto", partitions=8, reassemble="sorted")
    full = extract_transcripts(df, salt=4, partitions=8, reassemble=True)
    cols = ["conv_id", "turn_idx", "extracted_text", "fields_json", "status"]
    got = sorted(map(tuple, fast.select(*cols).collect()))
    want = sorted(map(tuple, full.select(*cols).collect()))
    assert got == want
    for part in fast.select("conv_id", "turn_idx").rdd.glom().collect():
        keys = [(r.conv_id, r.turn_idx) for r in part]
        assert keys == sorted(keys)


def test_ann_plans_are_array_form(spark):
    """Round-3 scale guards for similarity.py: dot products run on intact
    arrays — the plan must NOT contain a posexplode of embedding
    components or any join keyed on a component index (the round-2 shape
    that capped join parallelism at 64 idx keys).  The brute-force
    baseline broadcasts the tiny query set into a nested-loop join; the
    LSH and IVF variants broadcast the probe set into hash joins."""
    from ocr_spark.operators.similarity import (
        ann_cosine_topk,
        ann_ivf_flat,
        ann_lsh_bucketed,
    )

    sf_dir = "/root/testdata/sf0.001"
    for fn in (ann_cosine_topk, ann_lsh_bucketed, ann_ivf_flat):
        optimized, executed = _plan(fn(spark, sf_dir))
        assert "idx" not in optimized, f"{fn.__name__}: component-index join is back"
        assert "BroadcastExchange" in executed, f"{fn.__name__}: query side not broadcast"
    # brute force specifically: broadcast NLJ (cross of corpus x 10 queries)
    _, exe_bf = _plan(ann_cosine_topk(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in exe_bf
    # LSH specifically: the candidate join is a broadcast HASH join on
    # (tbl, key) — not nested-loop, not a shuffle of the corpus
    _, exe_lsh = _plan(ann_lsh_bucketed(spark, sf_dir))
    assert "BroadcastHashJoin" in exe_lsh
