"""Composed UPC-analog flow: the reference's end-to-end code assembly
(``UPC_OCR.py:171-243`` ``process_full``/``report_upc``/``do_full_images``)
re-expressed as ONE declarative pipeline over the deterministic token-box
geometry (same arithmetic family as operators/spatial.py).

The reference's per-image algorithm, step for step:

1. **full**: if the whole-image annotation's digits are exactly 12
   (``find_full`` / ``verify_first_is_full``), that IS the code →
   here: per-doc ordered concat of all visible token digits (C19
   assembly; tokens are digits-only by construction, the C15 step).
2. **middle**: else scan annotations in order for a 10-digit token, or
   two ADJACENT 5-digit tokens combined (``find_middle``) → lead window
   over visible tokens (J9 adjacency), first candidate wins.
3. **left/right**: single-digit tokens strictly left / right of the
   middle box (``find_left_right`` via ``determine_direction``, F2); a
   side is taken when exactly one candidate exists OR all candidates
   agree (``len(set)==1``) → countDistinct == 1.
4. **placeholders**: missing sides become ``?`` (``report_upc``); no
   middle → no code (None).
5. **retry ladder**: ``do_full_images`` re-runs the whole algorithm at a
   list of threshold cutoffs until one yields a code → two deterministic
   visibility cutoffs (cutoff 0 = aggressive threshold that loses more
   tokens, cutoff 1 = permissive), assembled per cutoff and coalesced in
   ladder order.  Spark-first: the "retry" is a single plan evaluating
   both rungs and coalescing — no driver-side loop.

Synthetic coverage at sf0.01 (all branches fire): 7 docs resolve via the
full-12 path, ~18 via a 10-digit middle, ~16 via 5+5 adjacency, ~34 carry
a ``?`` placeholder, 8 stay null, ~16 need the second ladder rung.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ocr_spark.operators.tables import load

TOK_BOUND = 250  # p_partkey < 250 -> ~5 tokens per doc over 50 docs


def _toks0(spark, sf_dir):
    """Deterministic digit-token geometry (pre-visibility): docs with
    doc_id % 7 == 0 open with a single 12-digit label token (the clean
    scan the reference's full path handles); everyone else mixes 1/5/10/3
    digit tokens."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < TOK_BOUND)
    k = F.col("p_partkey")
    v = k * 7919

    def digits(mod: int, width: int):
        return F.lpad((v % F.lit(mod)).cast("string"), width, "0")

    txt = (
        F.when((k < 50) & (k % 7 == 0), digits(10**12, 12))
        .when(k % 9 == 0, digits(10, 1))
        .when(k % 9 == 1, digits(100000, 5))
        .when(k % 9 == 6, digits(100000, 5))
        .when(k % 9 == 8, digits(10**10, 10))
        .otherwise(digits(1000, 3))
    )
    return p.select(
        k.alias("tok_id"),
        (k % 50).alias("doc_id"),
        ((k * 37) % 211).alias("x"),
        (F.lit(10) + (k * 11) % 40).alias("w"),
        txt.alias("txt"),
    )


def upc_assembly(spark, sf_dir):
    """(doc_id, upc) per document; upc is null when no rung of the ladder
    finds a middle (the reference returns None for those images)."""
    t0 = _toks0(spark, sf_dir)
    vis0 = F.when(
        F.col("doc_id") % 7 == 0, F.col("tok_id") == F.col("doc_id")
    ).otherwise((F.col("tok_id") * 7) % 10 < 4)
    vis1 = (F.col("tok_id") * 11) % 10 < 7
    toks = (
        t0.withColumn("cutoff", F.explode(F.array(F.lit(0), F.lit(1))))
        .filter(((F.col("cutoff") == 0) & vis0) | ((F.col("cutoff") == 1) & vis1))
    )

    docs = t0.select("doc_id").distinct()

    full_t = toks.groupBy("cutoff", "doc_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.sort_array(F.collect_list(F.struct("tok_id", "txt"))),
                lambda s: s.txt,
            ),
        ).alias("full_txt")
    )

    w_seq = Window.partitionBy("cutoff", "doc_id").orderBy("tok_id")
    seq = (
        toks.withColumn("len", F.length("txt"))
        .withColumn("next_txt", F.lead("txt").over(w_seq))
        .withColumn("next_len", F.lead(F.length("txt")).over(w_seq))
        .withColumn("next_x", F.lead("x").over(w_seq))
        .withColumn("next_w", F.lead("w").over(w_seq))
    )
    mid_cand = seq.filter(
        (F.col("len") == 10) | ((F.col("len") == 5) & (F.col("next_len") == 5))
    ).select(
        "cutoff",
        "doc_id",
        "tok_id",
        F.when(F.col("len") == 10, F.col("txt"))
        .otherwise(F.concat("txt", "next_txt"))
        .alias("mid_txt"),
        F.col("x").alias("mx"),
        F.when(F.col("len") == 10, F.col("w"))
        .otherwise(F.col("next_x") + F.col("next_w") - F.col("x"))
        .alias("mw"),
    )
    w_first = Window.partitionBy("cutoff", "doc_id").orderBy("tok_id")
    middle = (
        mid_cand.withColumn("rk", F.row_number().over(w_first))
        .filter(F.col("rk") == 1)
        .select("cutoff", "doc_id", "mid_txt", "mx", "mw")
    )

    singles = toks.filter(F.length("txt") == 1)
    sides = (
        singles.join(middle, ["cutoff", "doc_id"])
        .withColumn(
            "side",
            F.when(F.col("x") + F.col("w") <= F.col("mx"), "left").when(
                F.col("x") >= F.col("mx") + F.col("mw"), "right"
            ),
        )
        .filter(F.col("side").isNotNull())
    )
    side_pick = sides.groupBy("cutoff", "doc_id", "side").agg(
        F.when(F.countDistinct("txt") == 1, F.min("txt")).alias("digit")
    )
    left = side_pick.filter(F.col("side") == "left").select(
        "cutoff", "doc_id", F.col("digit").alias("ldigit")
    )
    right = side_pick.filter(F.col("side") == "right").select(
        "cutoff", "doc_id", F.col("digit").alias("rdigit")
    )

    per_cutoff = (
        full_t.join(middle, ["cutoff", "doc_id"], "left")
        .join(left, ["cutoff", "doc_id"], "left")
        .join(right, ["cutoff", "doc_id"], "left")
        .select(
            "cutoff",
            "doc_id",
            F.when(F.length("full_txt") == 12, F.col("full_txt"))
            .when(
                F.col("mid_txt").isNotNull(),
                F.concat(
                    F.coalesce("ldigit", F.lit("?")),
                    F.col("mid_txt"),
                    F.coalesce("rdigit", F.lit("?")),
                ),
            )
            .alias("upc"),
        )
    )
    c0 = per_cutoff.filter(F.col("cutoff") == 0).select("doc_id", F.col("upc").alias("upc0"))
    c1 = per_cutoff.filter(F.col("cutoff") == 1).select("doc_id", F.col("upc").alias("upc1"))
    return (
        docs.join(c0, "doc_id", "left")
        .join(c1, "doc_id", "left")
        .select("doc_id", F.coalesce("upc0", "upc1").alias("upc"))
    )


_TXT_SQL = """CASE WHEN p_partkey < 50 AND p_partkey % 7 = 0
       THEN lpad(CAST((p_partkey * 7919) % 1000000000000 AS VARCHAR), 12, '0')
       WHEN p_partkey % 9 = 0 THEN lpad(CAST((p_partkey * 7919) % 10 AS VARCHAR), 1, '0')
       WHEN p_partkey % 9 = 1 THEN lpad(CAST((p_partkey * 7919) % 100000 AS VARCHAR), 5, '0')
       WHEN p_partkey % 9 = 6 THEN lpad(CAST((p_partkey * 7919) % 100000 AS VARCHAR), 5, '0')
       WHEN p_partkey % 9 = 8 THEN lpad(CAST((p_partkey * 7919) % 10000000000 AS VARCHAR), 10, '0')
       ELSE lpad(CAST((p_partkey * 7919) % 1000 AS VARCHAR), 3, '0') END"""

UPC_SQL = f"""
WITH toks0 AS (
  SELECT p_partkey AS tok_id, p_partkey % 50 AS doc_id,
         (p_partkey * 37) % 211 AS x, 10 + (p_partkey * 11) % 40 AS w,
         {_TXT_SQL} AS txt
  FROM part WHERE p_partkey < {TOK_BOUND}
),
toks AS (
  SELECT t.*, c.cutoff FROM toks0 t CROSS JOIN (VALUES (0), (1)) c(cutoff)
  WHERE (c.cutoff = 0 AND (CASE WHEN t.doc_id % 7 = 0 THEN t.tok_id = t.doc_id
                                ELSE (t.tok_id * 7) % 10 < 4 END))
     OR (c.cutoff = 1 AND (t.tok_id * 11) % 10 < 7)
),
full_t AS (
  SELECT cutoff, doc_id, string_agg(txt, '' ORDER BY tok_id) AS full_txt
  FROM toks GROUP BY cutoff, doc_id
),
seq AS (
  SELECT *, length(txt) AS len,
         lead(txt) OVER w AS next_txt, lead(length(txt)) OVER w AS next_len,
         lead(x) OVER w AS next_x, lead(w) OVER w AS next_w
  FROM toks WINDOW w AS (PARTITION BY cutoff, doc_id ORDER BY tok_id)
),
mid_cand AS (
  SELECT cutoff, doc_id, tok_id,
         CASE WHEN len = 10 THEN txt ELSE txt || next_txt END AS mid_txt,
         x AS mx,
         CASE WHEN len = 10 THEN w ELSE next_x + next_w - x END AS mw
  FROM seq WHERE len = 10 OR (len = 5 AND next_len = 5)
),
middle AS (
  SELECT cutoff, doc_id, mid_txt, mx, mw FROM (
    SELECT *, row_number() OVER (PARTITION BY cutoff, doc_id ORDER BY tok_id) AS rk
    FROM mid_cand) WHERE rk = 1
),
sides AS (
  SELECT t.cutoff, t.doc_id, t.txt,
         CASE WHEN t.x + t.w <= m.mx THEN 'left'
              WHEN t.x >= m.mx + m.mw THEN 'right' END AS side
  FROM toks t JOIN middle m ON t.cutoff = m.cutoff AND t.doc_id = m.doc_id
  WHERE length(t.txt) = 1 AND (t.x + t.w <= m.mx OR t.x >= m.mx + m.mw)
),
side_pick AS (
  SELECT cutoff, doc_id, side,
         CASE WHEN count(DISTINCT txt) = 1 THEN min(txt) END AS digit
  FROM sides GROUP BY cutoff, doc_id, side
),
per_cutoff AS (
  SELECT f.cutoff, f.doc_id,
         CASE WHEN length(f.full_txt) = 12 THEN f.full_txt
              WHEN m.mid_txt IS NOT NULL
              THEN coalesce(l.digit, '?') || m.mid_txt || coalesce(r.digit, '?')
         END AS upc
  FROM full_t f
  LEFT JOIN middle m ON m.cutoff = f.cutoff AND m.doc_id = f.doc_id
  LEFT JOIN side_pick l ON l.cutoff = f.cutoff AND l.doc_id = f.doc_id AND l.side = 'left'
  LEFT JOIN side_pick r ON r.cutoff = f.cutoff AND r.doc_id = f.doc_id AND r.side = 'right'
)
SELECT d.doc_id, coalesce(c0.upc, c1.upc) AS upc
FROM (SELECT DISTINCT doc_id FROM toks0) d
LEFT JOIN per_cutoff c0 ON c0.doc_id = d.doc_id AND c0.cutoff = 0
LEFT JOIN per_cutoff c1 ON c1.doc_id = d.doc_id AND c1.cutoff = 1
"""


QUERIES = {
    "upc_assembly": (upc_assembly, UPC_SQL),
}
