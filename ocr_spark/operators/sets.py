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
    found minus nutrient-word hits"): document *bigram* vocabulary minus
    the bigram vocabulary of the English slice.  Bigrams, not unigrams: the
    synthetic lexicon is shared across every language/source slice, so any
    unigram-slice subtraction returns 0 rows — a trivially-green oracle row;
    the much larger bigram space leaves a non-empty, discriminative result."""
    d = load(spark, sf_dir, "documents")
    t = d.select("lang", F.split(F.col("text"), " ").alias("toks"))
    pairs = F.zip_with(
        F.expr("slice(toks, 1, greatest(size(toks) - 1, 0))"),
        F.expr("slice(toks, 2, greatest(size(toks) - 1, 0))"),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    w = (
        t.select("lang", F.explode(pairs).alias("p"))
        .filter((F.length("p.a") >= 3) & (F.length("p.b") >= 3))
        .select("lang", F.concat("p.a", F.lit(" "), "p.b").alias("bigram"))
    )
    return w.select("bigram").subtract(
        w.filter(F.col("lang") == "en").select("bigram")
    )  # EXCEPT (set semantics)


E2_SQL = """
WITH t AS (SELECT lang, string_split(text, ' ') AS toks FROM documents),
w AS (
  SELECT lang, toks[i] || ' ' || toks[i + 1] AS bigram
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks) - 1)) AS i)
  WHERE length(toks[i]) >= 3 AND length(toks[i + 1]) >= 3
)
SELECT bigram FROM w
EXCEPT
SELECT bigram FROM w WHERE lang = 'en'
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
