"""Enrichment stage: unique-best spell correction + language vote over
extraction output (the Ingredients_OCR flow, SURVEY §3.2)."""

from __future__ import annotations

import pandas as pd

from ocr_spark.enrich import enrich_extracted
from ocr_spark.pipeline import extract_transcripts

LEXICON = ["tomato", "paprika", "vinegar", "protein", "sodium", "tomate"]


def _turns(spark, texts):
    pdf = pd.DataFrame(
        {
            "conv_id": ["c"] * len(texts),
            "turn_idx": pd.array(range(len(texts)), dtype="int32"),
            "role": ["user"] * len(texts),
            "text": texts,
            "tool": [""] * len(texts),
        }
    )
    return spark.createDataFrame(pdf)


def test_unique_best_corrects_and_ties_do_not(spark):
    df = _turns(
        spark,
        [
            "fresh sodiom sauce",        # sodiom -> sodium (unique, dist 1)
            "tomatz paste",              # dist 1 to BOTH tomato and tomate -> tie, no fix
            "paprika is already right",  # exact lexicon hit, untouched
        ],
    )
    out = enrich_extracted(extract_transcripts(df, salt=2, partitions=2), LEXICON)
    rows = {r.turn_idx: r for r in out.collect()}
    assert rows[0].corrected_text == "fresh sodium sauce"
    assert rows[0].n_corrections == 1
    assert "tomatz" in rows[1].corrected_text  # tie-kill: unchanged
    assert rows[1].n_corrections == 0
    assert rows[2].n_corrections == 0


def test_language_majority_vote(spark):
    df = _turns(
        spark,
        [
            "the sauce with sugar and milk",
            "les sauces avec des sucre pour",
            "word salad only",
        ],
    )
    out = enrich_extracted(extract_transcripts(df, salt=2, partitions=2), LEXICON)
    rows = {r.turn_idx: r for r in out.collect()}
    assert rows[0].language == "en"
    assert rows[1].language == "fr"
    assert rows[2].language == "und"


def test_word_positions_preserved(spark):
    df = _turns(spark, ["alpha tomato beta gamma"])
    out = enrich_extracted(extract_transcripts(df, salt=2, partitions=2), LEXICON)
    r = out.collect()[0]
    assert r.corrected_text.split(" ")[0] == "alpha"
    assert r.corrected_text.split(" ")[2] == "beta"
