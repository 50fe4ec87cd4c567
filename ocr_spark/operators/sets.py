"""Set operators (SURVEY §2.7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.operators.tables import load


def e1_union_distinct(spark, sf_dir):
    """E1/E3 — union + dedup (NFT_OCR.py:924-928, 1126-1127): nation keys
    reachable from customers or suppliers."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey")
    )
    return c.union(s).distinct()


E1_SQL = """
SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
UNION
SELECT CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier
"""


def e2_except(spark, sf_dir):
    """E2/E4 — set difference (NFT_PreProcessing.py:68-70 "ingredient words
    found minus nutrient-word hits"): document vocabulary minus the
    vocabulary of one language slice."""
    d = load(spark, sf_dir, "documents")
    w = d.select("lang", F.explode(F.split(F.col("text"), " ")).alias("word")).filter(
        F.length("word") >= 3
    )
    all_words = w.select("word")
    en_words = w.filter(F.col("lang") == "en").select("word")
    return all_words.subtract(en_words)  # EXCEPT (set semantics)


E2_SQL = """
WITH w AS (
  SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
), f AS (SELECT lang, word FROM w WHERE length(word) >= 3)
SELECT word FROM f
EXCEPT
SELECT word FROM f WHERE lang = 'en'
"""


def e5_distinct(spark, sf_dir):
    """E5 — distinct projection (NFT_OCR.py:154)."""
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()


E5_SQL = "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"


QUERIES = {
    "e1_union_distinct": (e1_union_distinct, E1_SQL),
    "e2_except": (e2_except, E2_SQL),
    "e5_distinct": (e5_distinct, E5_SQL),
}
