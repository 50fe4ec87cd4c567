"""Scalar string/regex/date/JSON operators (SURVEY §2.8).

All JVM-side column expressions inside whole-stage codegen — the fast path
the kernel deliberately avoids only where byte-parity with the Python
oracle is asserted.  Regex patterns stay in the Java-regex ∩ RE2 common
subset; replacement backrefs are ``$1`` (Spark) vs ``\\1`` (DuckDB).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.operators.tables import load


def c4_c5_confusion_fix(spark, sf_dir):
    """C4+C5 — locale decimal fix + o->0 confusion fix
    (french_floats_to_english NFT_OCR.py:674-681, oh_to_zero :662-672),
    applied as an ordered JVM-side regexp_replace chain."""
    e = load(spark, sf_dir, "events")
    fixed = F.regexp_replace(
        F.regexp_replace(F.lower(F.col("props")), r"(\d),(\d)", "$1.$2"),
        r"\bo(\d+)\b",
        "0$1",
    )
    return e.select("event_id", fixed.alias("fixed_props"))


C4_SQL = r"""
SELECT event_id,
       regexp_replace(regexp_replace(lower(props), '(\d),(\d)', '\1.\2', 'g'),
                      '\bo(\d+)\b', '0\1', 'g') AS fixed_props
FROM events
"""


def c7_token_split(spark, sf_dir):
    """C7 — token splitting with position propagation (split_ocr_item,
    NFT_OCR.py:839-904): split + posexplode, positions preserved."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), r"[ \.]")).alias("pos", "tok"),
    )
    return toks.filter(F.col("tok") != "")


C7_SQL = r"""
WITH s AS (
  SELECT doc_id,
         generate_subscripts(regexp_split_to_array(text, '[ .]'), 1) - 1 AS pos,
         unnest(regexp_split_to_array(text, '[ .]')) AS tok
  FROM documents
)
SELECT doc_id, pos, tok FROM s WHERE tok <> ''
"""


def c9_numeric_extract(spark, sf_dir):
    """C9 — numeric extraction + cast (extract_value, NFT_OCR.py:1135-1148)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        # nullif('') before the cast: a digitless props row must yield NULL,
        # not an ANSI CAST_INVALID_INPUT abort (same guard as c16)
        F.nullif(
            F.regexp_extract(F.col("props"), r"(\d+)", 1), F.lit("")
        ).cast("bigint").alias("k_val"),
    )


C9_SQL = r"""
SELECT event_id, CAST(nullif(regexp_extract(props, '([0-9]+)', 1), '') AS BIGINT) AS k_val
FROM events
"""


def c12_normalize_chain(spark, sf_dir):
    """C12 — ordered multi-step normalization (preprocess_ingredients,
    Ingredients_OCR.py:74-106): fold and/or + bullet separators to commas,
    collapse whitespace — order-sensitive chain (the bracket-span strip of
    the same reference function lives in c1_c2_c3_cleanup_chain)."""
    d = load(spark, sf_dir, "documents")
    s = F.lower(F.col("text"))
    s = F.regexp_replace(s, r"\band\b|\bor\b", ",")
    s = F.regexp_replace(s, r"\s+", " ")
    s = F.trim(s)
    return d.select("doc_id", s.alias("normalized"))


C12_SQL = r"""
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '\band\b|\bor\b', ',', 'g'),
                           '\s+', ' ', 'g')) AS normalized
FROM documents
"""


def c15_digits_only(spark, sf_dir):
    """C15 — digits-only projection (UPC_OCR.py:60,79,123,184)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.regexp_replace(F.col("props"), r"[^0-9]+", "").alias("digits"),
    )


C15_SQL = """
SELECT event_id, regexp_replace(props, '[^0-9]+', '', 'g') AS digits
FROM events
"""


def c16_expiry_dates(spark, sf_dir):
    """C16 — embedded date extraction (extract_expiry,
    Ingredients_OCR.py:295-305): render -> regex back -> parse, proving the
    regexp_extract + to_date surface."""
    o = load(spark, sf_dir, "orders")
    rendered = F.concat(
        F.lit("exp "), F.date_format(F.col("o_orderdate"), "yyyy/MM/dd"), F.lit(" lot 9")
    )
    # null-safe: regexp miss yields '' -> NULLIF -> NULL (no ANSI parse error)
    extracted = F.nullif(
        F.regexp_extract(rendered, r"(\d{4}/\d\d/\d\d)", 1), F.lit("")
    )
    return o.select(
        "o_orderkey",
        F.date_format(F.to_date(extracted, "yyyy/MM/dd"), "yyyy-MM-dd").alias("expiry"),
    )


C16_SQL = r"""
SELECT o_orderkey,
       strftime(strptime(nullif(regexp_extract('exp ' || strftime(o_orderdate, '%Y/%m/%d') || ' lot 9',
                                               '([0-9]{4}/[0-9][0-9]/[0-9][0-9])', 1), ''),
                         '%Y/%m/%d'), '%Y-%m-%d') AS expiry
FROM orders
"""


def c22_json_extract(spark, sf_dir):
    """C22 — JSON payload access (tool-column surface, SURVEY §2.8 C22):
    get_json_object path extraction + histogram."""
    e = load(spark, sf_dir, "events")
    return (
        e.select(
            F.get_json_object(F.col("props"), "$.k").cast("bigint").alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )


C22_SQL = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, count(*) AS n
FROM events GROUP BY k
"""


QUERIES = {
    "c4_c5_confusion_fix": (c4_c5_confusion_fix, C4_SQL),
    "c7_token_split": (c7_token_split, C7_SQL),
    "c9_numeric_extract": (c9_numeric_extract, C9_SQL),
    "c12_normalize_chain": (c12_normalize_chain, C12_SQL),
    "c15_digits_only": (c15_digits_only, C15_SQL),
    "c16_expiry_dates": (c16_expiry_dates, C16_SQL),
    "c22_json_extract": (c22_json_extract, C22_SQL),
}
