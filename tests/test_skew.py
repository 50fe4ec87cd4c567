"""Skew defense: a pathological long conversation must spread across
`salt` shuffle buckets instead of pinning one task (north_rule: "salted
repartitioning on hash(conv_id) to defuse long-conversation skew")."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from ocr_spark.pipeline import INPUT_COLUMNS, extract_transcripts

N_BIG = 20_000
SALT = 8
PARTS = 16


def _skewed_frame():
    big = pd.DataFrame(
        {
            "conv_id": ["conv_mega"] * N_BIG,
            "turn_idx": pd.array(range(N_BIG), dtype="int32"),
            "role": ["user"] * N_BIG,
            "text": [f"turn {i} payload words here" for i in range(N_BIG)],
            "tool": [""] * N_BIG,
        }
    )
    small = pd.DataFrame(
        {
            "conv_id": [f"conv_{i:05d}" for i in range(500)],
            "turn_idx": pd.array([0] * 500, dtype="int32"),
            "role": ["user"] * 500,
            "text": ["short turn"] * 500,
            "tool": [""] * 500,
        }
    )
    return pd.concat([big, small], ignore_index=True)


def _mega_partition_spread(df, salt):
    salted = df.select(*INPUT_COLUMNS).repartition(
        PARTS,
        F.hash(F.col("conv_id")),
        F.pmod(F.hash(F.col("turn_idx")), F.lit(salt)),
    )
    dist = (
        salted.filter(F.col("conv_id") == "conv_mega")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    return {r.pid: r["count"] for r in dist}


def test_salt_spreads_the_mega_conversation(spark):
    df = spark.createDataFrame(_skewed_frame())

    unsalted = _mega_partition_spread(df, salt=1)
    assert len(unsalted) == 1  # without salt: one task owns all 20k turns

    salted = _mega_partition_spread(df, salt=SALT)
    assert len(salted) >= SALT - 2  # hash(turn_idx)%8 may collide partitions
    assert max(salted.values()) < N_BIG * 0.5  # no bucket holds the bulk


def test_skewed_input_extracts_correctly(spark):
    pdf = _skewed_frame()
    out = extract_transcripts(
        spark.createDataFrame(pdf), salt=SALT, partitions=PARTS
    )
    res = out.filter(F.col("conv_id") == "conv_mega").orderBy("turn_idx")
    rows = res.select("turn_idx", "turn_rank", "conv_turns", "extracted_text").collect()
    assert len(rows) == N_BIG
    # stable reassembly: rank dense 1..N in turn order despite the salt split
    assert [r.turn_rank for r in rows[:5]] == [1, 2, 3, 4, 5]
    assert rows[0].conv_turns == N_BIG
    assert rows[12345].extracted_text == "turn 12345 payload words here"
