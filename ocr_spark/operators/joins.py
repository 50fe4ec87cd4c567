"""Join operators (SURVEY §2.3).

The only table-scale joins the extraction domain needs are the broadcast
lexicon fuzzy join (J2) and the pass-merge equi join (J5); everything else
is a per-document micro-join expressed with windows.  Scale notes: J2
broadcasts the (tiny, deduplicated) lexicon so the big side never shuffles;
J5 shuffles once on the merge key with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ocr_spark.operators.filters import _WORDS_SQL, words
from ocr_spark.operators.tables import load


def j1_dim_lookup(spark, sf_dir):
    """J1 — dimension lookup (EN->FR translation dict, NFT_OCR.py:1101-1119)
    as a broadcast hash join against a tiny dim table."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_name", "r_name"
    )


J1_SQL = "SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey"


def j2_fuzzy_unique_best(spark, sf_dir):
    """J2 — fuzzy similarity join with unique-best semantics
    (spell_correct_word, Ingredients_OCR.py:180-194): token x lexicon where
    1 <= levenshtein <= 2, accepted only when exactly one lexicon word sits
    at the minimum distance (the tie-kill of T2).

    Broadcast nested-loop theta join over *deduplicated* sides — at 100 TB
    the token side dedups first (tiny distinct vocabulary), so the cross
    join is dictionary x dictionary, never row x dictionary.
    """
    toks = (
        words(spark, sf_dir)
        .select(F.col("word").alias("token"))
        .filter(F.length("token") >= 4)
        .distinct()
    )
    lex = (
        words(spark, sf_dir)
        .select(F.col("word").alias("lexword"))
        .filter(F.length("lexword") >= 4)
        .distinct()
    )
    pairs = (
        toks.crossJoin(F.broadcast(lex))
        .withColumn("dist", F.levenshtein("token", "lexword"))
        .filter((F.col("dist") >= 1) & (F.col("dist") <= 2))
    )
    w = Window.partitionBy("token")
    best = pairs.withColumn("min_dist", F.min("dist").over(w)).filter(
        F.col("dist") == F.col("min_dist")
    )
    return (
        best.withColumn("n_best", F.count(F.lit(1)).over(w))
        .filter(F.col("n_best") == 1)
        .select("token", F.col("lexword").alias("corrected"), "dist")
    )


J2_SQL = f"""
WITH toks AS (
  SELECT DISTINCT word AS token FROM ({_WORDS_SQL}) WHERE length(word) >= 4
), lex AS (
  SELECT DISTINCT word AS lexword FROM ({_WORDS_SQL}) WHERE length(word) >= 4
), pairs AS (
  SELECT token, lexword, levenshtein(token, lexword) AS dist
  FROM toks CROSS JOIN lex
  WHERE levenshtein(token, lexword) BETWEEN 1 AND 2
), best AS (
  SELECT token, lexword, dist,
         min(dist) OVER (PARTITION BY token) AS min_dist
  FROM pairs
), only_best AS (
  SELECT token, lexword, dist,
         count(*) OVER (PARTITION BY token) AS n_best
  FROM best WHERE dist = min_dist
)
SELECT token, lexword AS corrected, dist FROM only_best WHERE n_best = 1
"""


def j3_sliding_phrase(spark, sf_dir):
    """J3 — sliding-window fuzzy phrase match (find_string_in_ocr,
    NFT_OCR.py:1014-1036): bigram levenshtein against a target phrase via
    lead() — an adjacency join with zero shuffle beyond the window."""
    w = words(spark, sf_dir)
    win = Window.partitionBy("doc_id").orderBy("pos")
    return (
        w.withColumn("nxt", F.lead("word", 1).over(win))
        .filter(F.col("nxt").isNotNull())
        .withColumn("bigram", F.concat_ws(" ", "word", "nxt"))
        .withColumn("dist", F.levenshtein("bigram", F.lit("hash join")))
        .filter(F.col("dist") <= 1)
        .select("doc_id", "pos", "bigram", "dist")
    )


J3_SQL = f"""
WITH w AS ({_WORDS_SQL}),
seq AS (
  SELECT doc_id, pos, word,
         lead(word, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM w
)
SELECT doc_id, pos, word || ' ' || nxt AS bigram,
       levenshtein(word || ' ' || nxt, 'hash join') AS dist
FROM seq
WHERE nxt IS NOT NULL AND levenshtein(word || ' ' || nxt, 'hash join') <= 1
"""


def j5_merge_passes(spark, sf_dir):
    """J5 — multi-pass outer merge with conflict detection (merge_results,
    NFT_OCR.py:1415-1441): two independent partial extractions combined by
    full-outer join + coalesce; unequal values -> sentinel 'conflict'."""
    l = load(spark, sf_dir, "lineitem")
    qty_cents = F.round(F.col("l_quantity") * 100).cast("bigint")
    p1 = (
        l.filter(F.col("l_linenumber") <= 3)
        .groupBy("l_orderkey")
        .agg(F.round(F.sum(qty_cents) / 100.0, 2).alias("q1"))
    )
    p2 = (
        l.filter(F.col("l_linenumber") > 3)
        .groupBy("l_orderkey")
        .agg(F.round(F.sum(qty_cents) / 100.0, 2).alias("q2"))
    )
    return (
        p1.join(p2, "l_orderkey", "full_outer")
        .select(
            "l_orderkey",
            F.when(F.col("q1").isNull(), F.col("q2").cast("string"))
            .when(F.col("q2").isNull(), F.col("q1").cast("string"))
            .when(F.col("q1") == F.col("q2"), F.col("q1").cast("string"))
            .otherwise(F.lit("conflict"))
            .alias("merged_qty"),
        )
    )


J5_SQL = """
WITH p1 AS (
  SELECT l_orderkey,
         round(sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0, 2) AS q1
  FROM lineitem WHERE l_linenumber <= 3 GROUP BY l_orderkey
), p2 AS (
  SELECT l_orderkey,
         round(sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0, 2) AS q2
  FROM lineitem WHERE l_linenumber > 3 GROUP BY l_orderkey
)
SELECT coalesce(p1.l_orderkey, p2.l_orderkey) AS l_orderkey,
       CASE WHEN q1 IS NULL THEN CAST(q2 AS VARCHAR)
            WHEN q2 IS NULL THEN CAST(q1 AS VARCHAR)
            WHEN q1 = q2 THEN CAST(q1 AS VARCHAR)
            ELSE 'conflict' END AS merged_qty
FROM p1 FULL OUTER JOIN p2 USING (l_orderkey)
"""


def j6_range_join(spark, sf_dir):
    """J6 — non-equi (theta/range) join (find_left_right, UPC_OCR.py:71-99
    generalized): lineitems shipped more than 60 days after order date."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    j = l.join(
        o,
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
    )
    return j.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("late_lines"))


J6_SQL = """
SELECT o_orderkey, count(*) AS late_lines
FROM lineitem JOIN orders
  ON l_orderkey = o_orderkey
 AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY o_orderkey
"""


def j7_anti_join(spark, sf_dir):
    """J7 — anti join (filter_lines_boxes, NFT_PreProcessing.py:108,131):
    customers with no recent (1998+) orders.  The date slice keeps the
    result non-empty on the TPC-H-shaped tables (every customer has SOME
    order, so the unfiltered form returned 0 rows — a trivially-green
    oracle row that would stay green under almost any bug)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "1998-01-01")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


J7_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1998-01-01'
)
"""


def j9_adjacency_context(spark, sf_dir):
    """J9 — token-adjacency context join (filter_text_for_multiple_hits,
    NFT_OCR.py:141-199): lag/lead disambiguation context, zero shuffle
    beyond the window."""
    e = load(spark, sf_dir, "events")
    win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("prev_type", F.lag("event_type", 1).over(win))
        .withColumn("next_type", F.lead("event_type", 1).over(win))
        .filter(F.col("event_type") == "error")
        .select("user_id", "event_id", "prev_type", "next_type")
    )


J9_SQL = """
WITH seq AS (
  SELECT user_id, event_id, event_type,
         lag(event_type, 1)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT user_id, event_id, prev_type, next_type FROM seq WHERE event_type = 'error'
"""


QUERIES = {
    "j1_dim_lookup": (j1_dim_lookup, J1_SQL),
    "j2_fuzzy_unique_best": (j2_fuzzy_unique_best, J2_SQL),
    "j3_sliding_phrase": (j3_sliding_phrase, J3_SQL),
    "j5_merge_passes": (j5_merge_passes, J5_SQL),
    "j6_range_join": (j6_range_join, J6_SQL),
    "j7_anti_join": (j7_anti_join, J7_SQL),
    "j9_adjacency_context": (j9_adjacency_context, J9_SQL),
}
