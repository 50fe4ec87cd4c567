"""Window-function operators (SURVEY §2.5).

Windows are the reference's per-document micro-join replacement: adjacency,
segmentation, truncation and top-1 logic all run inside one partition
ordering with no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ocr_spark.operators.filters import _WORDS_SQL, words
from ocr_spark.operators.tables import load

SESSION_GAP_S = 600


def w1_sessionize(spark, sf_dir):
    """W1 — line segmentation as session-window-by-gap (split_into_lines,
    NFT_OCR.py:1039-1058): lag -> gap predicate -> running sum = segment id.
    The classic sessionization pattern on the events stream."""
    e = load(spark, sf_dir, "events")
    win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # integer millisecond arithmetic on both engines (unix_millis vs
    # epoch_ms) — second-truncated unix_timestamp vs fractional epoch()
    # disagree at gap boundaries once in ~10^4 rows
    gaps = e.withColumn(
        "new_session",
        F.when(
            F.unix_millis(F.col("ts").cast("timestamp"))
            - F.unix_millis(F.lag(F.col("ts").cast("timestamp"), 1).over(win))
            > SESSION_GAP_S * 1000,
            1,
        )
        .otherwise(0)
        .cast("int"),
    )
    sess = gaps.withColumn(
        "session_id", F.sum("new_session").over(win).cast("bigint")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("t_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("t_end"),
    )


W1_SQL = f"""
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts, 1) OVER w) > {SESSION_GAP_S} * 1000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_id
  FROM gaps
)
SELECT user_id, session_id, count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS t_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS t_end
FROM sess GROUP BY user_id, session_id
"""


def w2_reading_order(spark, sf_dir):
    """W2 — reading-order sort (NFT_OCR.py:80-82): deterministic rank within
    a partition; the same window reassembles turns in the pipeline."""
    e = load(spark, sf_dir, "events")
    win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id", "event_id", F.row_number().over(win).alias("rn")
    )


W2_SQL = """
SELECT user_id, event_id,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
FROM events
"""


def w4_lead_pattern(spark, sf_dir):
    """W4 — lead-pattern detection (find_serving, NFT_OCR.py:85-96):
    token j matches and token j+1 matches -> anchor."""
    e = load(spark, sf_dir, "events")
    win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("nxt", F.lead("event_type", 1).over(win))
        .filter((F.col("event_type") == "click") & (F.col("nxt") == "purchase"))
        .select("user_id", "event_id")
    )


W4_SQL = """
WITH seq AS (
  SELECT user_id, event_id, event_type,
         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
)
SELECT user_id, event_id FROM seq WHERE event_type = 'click' AND nxt = 'purchase'
"""


def w6_footer_truncation(spark, sf_dir):
    """W6 — footer/boilerplate truncation (drop_below_term,
    NFT_OCR.py:708-721): first marker position per document, keep only
    tokens strictly before it.  The semantic heart of boilerplate
    stripping, relationally."""
    w = words(spark, sf_dir)
    win = Window.partitionBy("doc_id")
    cut = w.withColumn(
        "cut_pos",
        F.min(F.when(F.col("word") == "stream", F.col("pos"))).over(win),
    )
    return cut.filter(
        F.col("cut_pos").isNull() | (F.col("pos") < F.col("cut_pos"))
    ).select("doc_id", "pos", "word")


W6_SQL = f"""
WITH w AS ({_WORDS_SQL}),
cut AS (
  SELECT doc_id, pos, word,
         min(CASE WHEN word = 'stream' THEN pos END) OVER (PARTITION BY doc_id) AS cut_pos
  FROM w
)
SELECT doc_id, pos, word FROM cut WHERE cut_pos IS NULL OR pos < cut_pos
"""


def w8_rightmost_match(spark, sf_dir):
    """W8 — rightmost-match scan (LineItems.index_by_text right-to-left,
    NFT_OCR.py:537-547): max position of a marker per document."""
    w = words(spark, sf_dir)
    return (
        w.filter(F.col("word") == "spark")
        .groupBy("doc_id")
        .agg(F.max("pos").alias("last_pos"))
    )


W8_SQL = f"""
SELECT doc_id, max(pos) AS last_pos
FROM ({_WORDS_SQL}) WHERE word = 'spark' GROUP BY doc_id
"""


def w12_top1_per_group(spark, sf_dir):
    """W12 — top-1 per region by confidence (skeleton.py:536-560):
    row_number desc with deterministic tie-break."""
    o = load(spark, sf_dir, "orders")
    win = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") == 1)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("best_price"))
    )


W12_SQL = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
)
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS best_price
FROM ranked WHERE rk = 1
"""


def t2_top1_unique_best(spark, sf_dir):
    """T2 — top-1 with unique-best guard (Ingredients_OCR.py:185-194):
    accept the best only if strictly better than the runner-up."""
    o = load(spark, sf_dir, "orders")
    win = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    ranked = o.select(
        "o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(win).alias("rk")
    ).filter(F.col("rk") <= 2)
    p = ranked.groupBy("o_custkey").pivot("rk", [1, 2]).agg(F.first("o_totalprice"))
    top = ranked.filter(F.col("rk") == 1).select(
        "o_custkey", "o_orderkey", F.col("o_totalprice").alias("best")
    )
    return (
        top.join(p, "o_custkey")
        .filter(F.col("2").isNull() | (F.col("best") > F.col("2")))
        .select("o_custkey", "o_orderkey", F.round("best", 2).alias("best_price"))
    )


T2_SQL = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
), second AS (
  SELECT o_custkey, max(CASE WHEN rk = 2 THEN o_totalprice END) AS runner_up
  FROM ranked GROUP BY o_custkey
)
SELECT r.o_custkey, r.o_orderkey, round(r.o_totalprice, 2) AS best_price
FROM ranked r JOIN second s ON r.o_custkey = s.o_custkey
WHERE r.rk = 1 AND (s.runner_up IS NULL OR r.o_totalprice > s.runner_up)
"""


QUERIES = {
    "w1_sessionize": (w1_sessionize, W1_SQL),
    "w2_reading_order": (w2_reading_order, W2_SQL),
    "w4_lead_pattern": (w4_lead_pattern, W4_SQL),
    "w6_footer_truncation": (w6_footer_truncation, W6_SQL),
    "w8_rightmost_match": (w8_rightmost_match, W8_SQL),
    "w12_top1_per_group": (w12_top1_per_group, W12_SQL),
    "t2_top1_unique_best": (t2_top1_unique_best, T2_SQL),
}
