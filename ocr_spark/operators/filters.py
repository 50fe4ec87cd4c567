"""Projection / filter / predicate operators (SURVEY §2.2).

All predicates are declarative column expressions so Catalyst pushes them
into the parquet scan (PushedFilters) and prunes columns (ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.operators.tables import load


def words(spark, sf_dir):
    """(doc_id, pos, word) token stream — the transcript-domain analog of
    the reference's parallel-array token dict (SURVEY §1.1)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word")
    )


_WORDS_SQL = """
SELECT doc_id,
       generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
       unnest(string_split(text, ' ')) AS word
FROM documents
"""


def f1_blank_filter(spark, sf_dir):
    """F1 — drop blank tokens (renmove_objectionable_items, NFT_OCR.py:695-706)."""
    return words(spark, sf_dir).filter(F.trim(F.col("word")) != "")


F1_SQL = f"SELECT * FROM ({_WORDS_SQL}) WHERE trim(word) <> ''"


def f3_minlen_filter(spark, sf_dir):
    """F3 — min-token-length filter (ocr_to_boxes, NFT_PreProcessing.py:242-251)."""
    w = words(spark, sf_dir)
    return w.filter(F.length("word") >= 6).select("doc_id", "word")


F3_SQL = f"SELECT doc_id, word FROM ({_WORDS_SQL}) WHERE length(word) >= 6"


def f5_doc_gate(spark, sf_dir):
    """F5 — document classifier gate (is_american_nft, NFT_OCR.py:959-978):
    keep documents whose marker-term frequency crosses a threshold."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.regexp_count(F.col("text"), F.lit(r"\bspark\b")).cast("bigint").alias("n_hits"),
        )
        .filter(F.col("n_hits") >= 3)
    )


F5_SQL = r"""
SELECT doc_id, CAST(len(regexp_extract_all(text, '\bspark\b')) AS BIGINT) AS n_hits
FROM documents
WHERE len(regexp_extract_all(text, '\bspark\b')) >= 3
"""


def f11_null_guard(spark, sf_dir):
    """F11 — existence/null guard (NFT_OCR.py:1447-1448): classify rows by
    payload health instead of crashing on them."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.when(F.col("text").isNull(), "missing")
        .when(F.trim(F.col("text")) == "", "blank")
        .otherwise("ok")
        .alias("health"),
    )


F11_SQL = """
SELECT doc_id,
       CASE WHEN text IS NULL THEN 'missing'
            WHEN trim(text) = '' THEN 'blank'
            ELSE 'ok' END AS health
FROM documents
"""


QUERIES = {
    "f1_blank_filter": (f1_blank_filter, F1_SQL),
    "f3_minlen_filter": (f3_minlen_filter, F3_SQL),
    "f5_doc_gate": (f5_doc_gate, F5_SQL),
    "f11_null_guard": (f11_null_guard, F11_SQL),
}
