"""Parity gate: Spark pipeline output == single-threaded oracle, per turn.

BASELINE.json:15 — "per-row invariant vs the reference: per-turn text
equality under stable turn ordering; verify with `python -m pytest -x -q`".

The Spark side runs the full scale harness (salted repartition ->
mapInPandas -> window reassembly) at parallelism 4 on deliberately shuffled
input; the oracle runs the same kernel row-at-a-time single-threaded.
Equality is byte-for-byte on extracted_text, spans_json and fields_json.
"""

from __future__ import annotations

import pandas as pd

from ocr_spark import synth
from ocr_spark.oracle import oracle_extract
from ocr_spark.pipeline import extract_transcripts, failure_spans, partition_metrics

N_CONVS = 60  # ~10^3 turns with the Zipf tail


def _spark_result(spark, pdf):
    sdf = spark.createDataFrame(pdf)
    out = extract_transcripts(sdf, salt=4, partitions=8, spans=True)
    res = out.orderBy("conv_id", "turn_idx").toPandas()
    return res


def test_spark_matches_oracle_byte_for_byte(spark):
    pdf = synth.generate_local(N_CONVS, shuffled=True)
    want = oracle_extract(pdf)
    got = _spark_result(spark, pdf)

    assert len(got) == len(want)
    key_got = list(zip(got["conv_id"], got["turn_idx"]))
    key_want = list(zip(want["conv_id"], want["turn_idx"]))
    assert key_got == key_want  # stable (conv_id, turn_idx) ordering

    for col in ("extracted_text", "spans_json", "fields_json", "status"):
        mism = (got[col].to_numpy() != want[col].to_numpy()).nonzero()[0]
        assert len(mism) == 0, (
            f"{col}: {len(mism)} mismatches, first at "
            f"{key_got[mism[0]]}: spark={got[col].iloc[mism[0]]!r} "
            f"oracle={want[col].iloc[mism[0]]!r}"
        )

    for col in ("n_blocks", "n_lines", "n_tokens", "n_fields"):
        assert (got[col].to_numpy() == want[col].to_numpy()).all(), col


def test_derived_spans_match_kernel(spark):
    """The JVM-side span derivation (split/posexplode over extracted_text,
    the at-scale spans path) reproduces the Python kernel's span relation
    exactly, and the spans=False pipeline's count columns equal the
    spans=True kernel's."""
    import json

    from ocr_spark.operators.transcripts import derive_spans

    pdf = synth.generate_local(25, shuffled=True)
    want = oracle_extract(pdf)  # kernel with inline spans

    out = extract_transcripts(
        spark.createDataFrame(pdf), salt=4, partitions=8, spans=False
    )
    assert "spans_json" not in out.columns
    got_counts = out.orderBy("conv_id", "turn_idx").toPandas()
    for col in ("n_blocks", "n_lines", "n_tokens"):
        assert (got_counts[col].to_numpy() == want[col].to_numpy()).all(), col

    derived = {
        (r.conv_id, r.turn_idx, r.block_id, r.line_id, r.pos, r.token)
        for r in derive_spans(out).collect()
    }
    kernel_rel = set()
    for _, row in want.iterrows():
        for rec in json.loads(row["spans_json"]):
            # json.loads already decoded the kernel's escaping: rec["t"]
            # items are the raw tokens
            for p, tok in enumerate(rec["t"]):
                kernel_rel.add(
                    (row["conv_id"], row["turn_idx"], rec["b"], rec["l"], p, tok)
                )
    assert derived == kernel_rel


def test_derived_spans_adversarial_tokens(spark):
    """Tokens containing JSON-special characters (quote, backslash,
    unicode) — the kernel escapes them inside spans_json while
    derive_spans splits raw text; both must yield the same raw tokens."""
    import json

    import pandas as pd

    from ocr_spark.operators.transcripts import derive_spans

    texts = [
        'he said "hi there" back',
        "wind\\up path\\\\double über naïve",
        'mix "q\\w" end',
    ]
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in range(len(texts))],
            "turn_idx": pd.array([0] * len(texts), dtype="int32"),
            "role": ["user"] * len(texts),
            "text": texts,
            "tool": [""] * len(texts),
        }
    )
    out = extract_transcripts(
        spark.createDataFrame(pdf), salt=2, partitions=2, spans=False
    )
    derived = {
        (r.conv_id, r.block_id, r.line_id, r.pos, r.token)
        for r in derive_spans(out).collect()
    }
    kernel_rel = set()
    for _, row in oracle_extract(pdf).iterrows():
        for rec in json.loads(row["spans_json"]):
            # json.loads already decoded the kernel's escaping: rec["t"]
            # items are the raw tokens
            for p, tok in enumerate(rec["t"]):
                kernel_rel.add((row["conv_id"], rec["b"], rec["l"], p, tok))
    assert derived == kernel_rel
    assert derived  # non-degenerate: the adversarial tokens survived cleanup


def test_window_reassembly_columns(spark):
    pdf = synth.generate_local(20, shuffled=True)
    out = extract_transcripts(spark.createDataFrame(pdf), salt=4).toPandas()
    g = out.groupby("conv_id")
    # turn_rank is a dense 1..n per conversation regardless of input order
    assert (g["turn_rank"].max() == g["turn_rank"].count()).all()
    assert (g["conv_turns"].nunique() == 1).all()
    per_conv = out.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")["turn_rank"]
    assert per_conv.apply(lambda s: (s.to_numpy() == range(1, len(s) + 1)).all()).all()


def test_lineage_tables(spark):
    pdf = synth.generate_local(25, shuffled=True)
    extracted = extract_transcripts(spark.createDataFrame(pdf), salt=4, reassemble=False)
    extracted = extracted.cache()
    try:
        metrics = partition_metrics(extracted).toPandas()
        assert metrics["turn_count"].sum() == len(pdf)
        total = (
            metrics["ok_count"]
            + metrics["empty_count"]
            + metrics["rejected_count"]
            + metrics["failed_count"]
        )
        assert (total == metrics["turn_count"]).all()

        fs = failure_spans(extracted).toPandas()
        want = oracle_extract(pdf)
        bad = want[~want["status"].isin(["ok", "empty"])]
        assert len(fs) == len(bad)
    finally:
        extracted.unpersist()


def test_distributed_generator_matches_local(spark):
    pdf_local = synth.generate_local(15, shuffled=False)
    pdf_spark = (
        synth.generate_spark(spark, 15, partitions=4)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pdf_local = pdf_local.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pdf_spark["ts"] = pd.to_datetime(pdf_spark["ts"], utc=True)
    pdf_local["ts"] = pd.to_datetime(pdf_local["ts"], utc=True)
    pd.testing.assert_frame_equal(pdf_local, pdf_spark)
