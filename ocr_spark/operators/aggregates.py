"""Aggregation operators (SURVEY §2.4).

All are single-shuffle groupBy aggregations with map-side partial
aggregation (HashAggregate partial/final in the physical plan) — the
scale-safe shape for 100 TB fact tables.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.operators.filters import _WORDS_SQL, words
from ocr_spark.operators.tables import load


def a1_conflict_first(spark, sf_dir):
    """A1 — conflict-detecting first() (add_to_dict, NFT_OCR.py:1163-1183):
    per key, a repeated equal value collapses; unequal values -> 'conflict'."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.when(F.countDistinct("o_orderstatus") == 1, F.min("o_orderstatus"))
        .otherwise(F.lit("conflict"))
        .alias("status_value"),
        F.count(F.lit(1)).alias("n_orders"),
    )


A1_SQL = """
SELECT o_custkey,
       CASE WHEN count(DISTINCT o_orderstatus) = 1 THEN min(o_orderstatus)
            ELSE 'conflict' END AS status_value,
       count(*) AS n_orders
FROM orders GROUP BY o_custkey
"""


def a4_countdistinct_collapse(spark, sf_dir):
    """A4 — count-distinct collapse (UPC_OCR.py:87-99): duplicated readings
    accepted only when they all agree."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_orderkey", "l_partkey")
        .agg(
            F.countDistinct("l_quantity").alias("n_readings"),
            F.when(F.countDistinct("l_quantity") == 1, F.round(F.min("l_quantity"), 2))
            .alias("accepted_qty"),
        )
    )


A4_SQL = """
SELECT l_orderkey, l_partkey,
       count(DISTINCT l_quantity) AS n_readings,
       CASE WHEN count(DISTINCT l_quantity) = 1 THEN round(min(l_quantity), 2)
            END AS accepted_qty
FROM lineitem GROUP BY l_orderkey, l_partkey
"""


def a5_cooccurrence_having(spark, sf_dir):
    """A5 — thresholded co-occurrence count with HAVING (is_american_nft,
    NFT_OCR.py:959-978)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("bigint")
            .alias("n_errors")
        )
        .filter(F.col("n_errors") >= 3)
    )


A5_SQL = """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
FROM events GROUP BY user_id HAVING n_errors >= 3
"""


def a6_majority_vote(spark, sf_dir):
    """A6 — majority-vote classifier (check_language,
    Ingredients_OCR.py:197-214): dictionary-hit counts decide the class."""
    w = words(spark, sf_dir)
    seta = ("the", "a", "fast", "slow", "big", "small")
    setb = ("scan", "join", "merge", "sort", "hash", "agg")
    return (
        w.groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("word").isin(*seta), 1).otherwise(0))
            .cast("bigint")
            .alias("hits_a"),
            F.sum(F.when(F.col("word").isin(*setb), 1).otherwise(0))
            .cast("bigint")
            .alias("hits_b"),
        )
        .withColumn(
            "verdict",
            F.when(F.col("hits_a") > F.col("hits_b"), "class_a")
            .when(F.col("hits_b") > F.col("hits_a"), "class_b")
            .otherwise("tie"),
        )
    )


A6_SQL = f"""
SELECT doc_id,
       CAST(sum(CASE WHEN word IN ('the','a','fast','slow','big','small') THEN 1 ELSE 0 END) AS BIGINT) AS hits_a,
       CAST(sum(CASE WHEN word IN ('scan','join','merge','sort','hash','agg') THEN 1 ELSE 0 END) AS BIGINT) AS hits_b,
       CASE WHEN sum(CASE WHEN word IN ('the','a','fast','slow','big','small') THEN 1 ELSE 0 END)
             > sum(CASE WHEN word IN ('scan','join','merge','sort','hash','agg') THEN 1 ELSE 0 END) THEN 'class_a'
            WHEN sum(CASE WHEN word IN ('scan','join','merge','sort','hash','agg') THEN 1 ELSE 0 END)
             > sum(CASE WHEN word IN ('the','a','fast','slow','big','small') THEN 1 ELSE 0 END) THEN 'class_b'
            ELSE 'tie' END AS verdict
FROM ({_WORDS_SQL}) GROUP BY doc_id
"""


def a8_distribution_stats(spark, sf_dir):
    """A8 — distribution statistics (curvature stats, skeleton.py:488-497):
    mean/variance/min/max/median per group."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.avg("value"), 4).alias("mean_v"),
        F.round(F.var_pop("value"), 4).alias("var_v"),
        F.round(F.min("value"), 4).alias("min_v"),
        F.round(F.max("value"), 4).alias("max_v"),
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("median_v"),
        F.count(F.lit(1)).alias("n"),
    )


A8_SQL = """
SELECT event_type,
       round(avg(value), 4) AS mean_v,
       round(var_pop(value), 4) AS var_v,
       round(min(value), 4) AS min_v,
       round(max(value), 4) AS max_v,
       round(quantile_cont(value, 0.5), 4) AS median_v,
       count(*) AS n
FROM events GROUP BY event_type
"""


def a11_second_pass_gate(spark, sf_dir):
    """A11 — all-null / missing-field detection gating a second pass
    (nutr_missing, NFT_OCR.py:1061-1081,1514-1517): partial+final shape."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_orderkey").agg(
        F.max(F.when(F.col("l_quantity") > 45, 1).otherwise(0))
        .cast("int")
        .alias("needs_second_pass")
    )


A11_SQL = """
SELECT l_orderkey,
       CAST(max(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) AS INTEGER) AS needs_second_pass
FROM lineitem GROUP BY l_orderkey
"""


QUERIES = {
    "a1_conflict_first": (a1_conflict_first, A1_SQL),
    "a4_countdistinct_collapse": (a4_countdistinct_collapse, A4_SQL),
    "a5_cooccurrence_having": (a5_cooccurrence_having, A5_SQL),
    "a6_majority_vote": (a6_majority_vote, A6_SQL),
    "a8_distribution_stats": (a8_distribution_stats, A8_SQL),
    "a11_second_pass_gate": (a11_second_pass_gate, A11_SQL),
}


def a12_metrics_rollup(spark, sf_dir):
    """Rollup reporting over the metrics dimensions (SURVEY §2.4 note:
    grouping-sets/cube are optional roll-up reporting for the lineage
    table): per (event_type, day) counts with subtotal and grand-total
    rows via ROLLUP; grouping_id disambiguates NULL-as-subtotal from
    NULL-as-value."""
    e = load(spark, sf_dir, "events")
    d = e.select(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"), "value"
    )
    return (
        d.rollup("event_type", "day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.grouping_id().cast("bigint").alias("gid"),
        )
    )


A12_SQL = """
SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n,
       CAST(grouping(event_type, strftime(ts, '%Y-%m-%d')) AS BIGINT) AS gid
FROM events
GROUP BY ROLLUP (event_type, strftime(ts, '%Y-%m-%d'))
"""

QUERIES["a12_metrics_rollup"] = (a12_metrics_rollup, A12_SQL)
