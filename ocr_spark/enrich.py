"""Post-extraction enrichment: lexicon spell-correction + language ID.

The reference's Ingredients flow (``Ingredients_OCR.py:233-276``) runs
main-content extraction, then Levenshtein spell-correction against a
product lexicon (unique-best-only, ``:180-194``), then a majority-vote
language call (``:197-214``), and reports the number of corrections
(``:159-177``).  This module is that flow over the extraction pipeline's
output — entirely JVM-side (broadcast lexicon + built-in levenshtein +
window reassembly), no Python UDF:

    extracted ─ explode tokens ─┐
                                ├─ distinct token dictionary
    lexicon (broadcast) ────────┘
      -> levenshtein <= 2, unique-best-only correction map (J2/T2)
      -> map back over token stream, reassemble corrected text (W2)
      -> per-turn n_corrections (A7) + en/fr majority vote (A6)

Scale: corrections are computed on the *distinct* token dictionary
(vocabulary-sized, not corpus-sized) and joined back — the dict×dict
discipline of SCALE.md §4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FR_MARKERS = ("les", "des", "avec", "pour", "sans", "une", "sucre", "lait")
EN_MARKERS = ("the", "with", "for", "and", "without", "sugar", "milk")


def correction_map(tokens: DataFrame, lexicon: DataFrame) -> DataFrame:
    """(token) -> (token, corrected) for unique-best levenshtein <= 2 hits.

    ``tokens``: one column ``token`` (distinct).  ``lexicon``: one column
    ``lexword``.  Tokens already in the lexicon are never corrected
    (distance 0 short-circuit, as the reference's exact-match guard).
    """
    exact = tokens.join(lexicon, tokens.token == lexicon.lexword, "left_semi")
    candidates = (
        tokens.join(exact, "token", "left_anti")
        .filter(F.length("token") >= 4)
        .crossJoin(F.broadcast(lexicon))
        .withColumn("dist", F.levenshtein("token", "lexword"))
        .filter((F.col("dist") >= 1) & (F.col("dist") <= 2))
    )
    w = Window.partitionBy("token")
    best = candidates.withColumn("min_dist", F.min("dist").over(w)).filter(
        F.col("dist") == F.col("min_dist")
    )
    return (
        best.withColumn("n_best", F.count(F.lit(1)).over(w))
        .filter(F.col("n_best") == 1)  # ties never correct (T2 tie-kill)
        .select("token", F.col("lexword").alias("corrected"))
    )


def enrich_extracted(extracted: DataFrame, lexicon_words: list[str]) -> DataFrame:
    """Add (corrected_text, n_corrections, language) to extraction output.

    ``extracted`` must carry (conv_id, turn_idx, extracted_text).
    Word positions are preserved exactly; only whole tokens within
    levenshtein 2 of a unique lexicon word are replaced.
    """
    spark = extracted.sparkSession
    lexicon = spark.createDataFrame([(w,) for w in lexicon_words], ["lexword"])

    toks = extracted.select(
        "conv_id",
        "turn_idx",
        F.posexplode(F.split(F.col("extracted_text"), r"\s+")).alias("pos", "token"),
    ).filter(F.col("token") != "")
    cmap = correction_map(toks.select("token").distinct(), lexicon)

    fixed = (
        toks.join(F.broadcast(cmap), "token", "left")
        .withColumn("out_tok", F.coalesce(F.col("corrected"), F.col("token")))
        .withColumn("was_fixed", F.col("corrected").isNotNull().cast("int"))
    )
    per_turn = (
        fixed.groupBy("conv_id", "turn_idx")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "out_tok"))),
                    lambda x: x.out_tok,
                ),
            ).alias("corrected_text"),
            F.sum("was_fixed").cast("bigint").alias("n_corrections"),
            F.sum(
                F.when(F.col("token").isin(*FR_MARKERS), 1).otherwise(0)
            ).alias("fr_hits"),
            F.sum(
                F.when(F.col("token").isin(*EN_MARKERS), 1).otherwise(0)
            ).alias("en_hits"),
        )
        .withColumn(
            "language",
            F.when(F.col("fr_hits") > F.col("en_hits"), "fr")
            .when(F.col("en_hits") > F.col("fr_hits"), "en")
            .otherwise("und"),
        )
        .drop("fr_hits", "en_hits")
    )
    return extracted.join(per_turn, ["conv_id", "turn_idx"], "left").fillna(
        {"corrected_text": "", "n_corrections": 0, "language": "und"}
    )
