"""Spatial/geometric operators (SURVEY §2.2 F2/F7/F9/F10, §2.3 J4/J8,
§2.4 A2/A9, §2.6 T3, §2.8 C18/C20).

The reference's token boxes and rule lines are (left, top, width, height)
structs (SURVEY §1.1).  Here the same operators run over deterministic
synthetic geometry derived arithmetically from the driver tables — pure
integer expressions both engines evaluate identically.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ocr_spark.operators.tables import load

# Deterministic token-box table: one box per part row, ~40 boxes per doc.
_BOXES_SQL = """
SELECT p_partkey AS box_id,
       p_partkey % 50 AS doc_id,
       (p_partkey * 37) % 211 AS x,
       (p_partkey * 53) % 173 AS y,
       10 + (p_partkey * 11) % 40 AS w,
       8 + (p_partkey * 7) % 24 AS h
FROM part
"""

# Deterministic rule-line table: one line segment per supplier row.
_LINES_SQL = """
SELECT s_suppkey AS line_id,
       s_suppkey % 50 AS doc_id,
       (s_suppkey * 19) % 211 AS x1,
       (s_suppkey * 23) % 173 AS y1,
       (s_suppkey * 19) % 211 + (s_suppkey * 31) % 120 AS x2,
       (s_suppkey * 23) % 173 + (s_suppkey * 13) % 35 AS y2
FROM supplier
"""


def _boxes(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    k = F.col("p_partkey")
    return p.select(
        k.alias("box_id"),
        (k % 50).alias("doc_id"),
        ((k * 37) % 211).alias("x"),
        ((k * 53) % 173).alias("y"),
        (F.lit(10) + (k * 11) % 40).alias("w"),
        (F.lit(8) + (k * 7) % 24).alias("h"),
    )


def _lines(spark, sf_dir):
    s = load(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    return s.select(
        k.alias("line_id"),
        (k % 50).alias("doc_id"),
        ((k * 19) % 211).alias("x1"),
        ((k * 23) % 173).alias("y1"),
        ((k * 19) % 211 + (k * 31) % 120).alias("x2"),
        ((k * 23) % 173 + (k * 13) % 35).alias("y2"),
    )


def f2_directional_filter(spark, sf_dir):
    """F2 — directional filter (LineItems.filter_left_right,
    NFT_OCR.py:549-562): keep boxes right of a per-doc anchor (dist >= 0)."""
    b = _boxes(spark, sf_dir)
    anchor = b.groupBy("doc_id").agg(F.min("x").alias("ax"))
    return (
        b.join(anchor, "doc_id")
        .withColumn("dist", F.col("x") - F.col("ax") - 50)
        .filter(F.col("dist") >= 0)
        .select("doc_id", "box_id", "dist")
    )


F2_SQL = f"""
WITH b AS ({_BOXES_SQL}),
a AS (SELECT doc_id, min(x) AS ax FROM b GROUP BY doc_id)
SELECT b.doc_id, box_id, x - ax - 50 AS dist
FROM b JOIN a ON b.doc_id = a.doc_id
WHERE x - ax - 50 >= 0
"""


def f7_orientation_predicate(spark, sf_dir):
    """F7 — orientation predicate (LineWorker.filter_lines,
    NFT_OCR.py:311-335): keep near-horizontal lines,
    |x2-x1| > 3*|y2-y1|."""
    ln = _lines(spark, sf_dir)
    return ln.filter(
        F.abs(F.col("x2") - F.col("x1")) > 3 * F.abs(F.col("y2") - F.col("y1"))
    ).select("line_id", "doc_id", "x1", "y1", "x2", "y2")


F7_SQL = f"""
SELECT line_id, doc_id, x1, y1, x2, y2 FROM ({_LINES_SQL})
WHERE abs(x2 - x1) > 3 * abs(y2 - y1)
"""


def f9_usefulness_predicate(spark, sf_dir):
    """F9 — usefulness predicate on derived struct fields (Curve.isUseful,
    curve.py:432-451): horizontally complete AND confidence above a
    width-proportional threshold."""
    ln = _lines(spark, sf_dir)
    d = ln.withColumn("span", F.col("x2") - F.col("x1")).withColumn(
        "confidence", (F.col("line_id") * 7) % 100
    )
    return d.filter(
        (F.col("span") >= 60) & (F.col("confidence") > F.col("span") / 2)
    ).select("line_id", "doc_id", "span", "confidence")


F9_SQL = f"""
WITH d AS (
  SELECT line_id, doc_id, x2 - x1 AS span, (line_id * 7) % 100 AS confidence
  FROM ({_LINES_SQL})
)
SELECT line_id, doc_id, span, confidence
FROM d WHERE span >= 60 AND confidence > span / 2.0
"""


def f10_size_pruning(spark, sf_dir):
    """F10 — size-based pruning before expensive work (skeleton.py:108-124):
    drop boxes whose area is under 25% of the doc's max box area — the
    cheap pre-prune Catalyst pushes below costly operators."""
    b = _boxes(spark, sf_dir).withColumn("area", F.col("w") * F.col("h"))
    mx = b.groupBy("doc_id").agg(F.max("area").alias("max_area"))
    return (
        b.join(mx, "doc_id")
        .filter(F.col("area") * 4 >= F.col("max_area"))
        .select("doc_id", "box_id", "area")
    )


F10_SQL = f"""
WITH b AS (SELECT *, w * h AS area FROM ({_BOXES_SQL})),
m AS (SELECT doc_id, max(area) AS max_area FROM b GROUP BY doc_id)
SELECT b.doc_id, box_id, area
FROM b JOIN m ON b.doc_id = m.doc_id
WHERE area * 4 >= max_area
"""


def j4_interval_same_line(spark, sf_dir):
    """J4 — spatial interval join (get_items_on_same_line, NFT_OCR.py:45-82):
    box pairs within a doc whose vertical extents overlap the other's
    center — the same-line grouping predicate."""
    a = _boxes(spark, sf_dir).select(
        "doc_id",
        F.col("box_id").alias("a_id"),
        F.col("y").alias("a_y"),
        (F.col("y") + F.col("h")).alias("a_y2"),
        (F.col("y") + F.col("h") / 2.0).alias("a_cy"),
    )
    b = _boxes(spark, sf_dir).select(
        "doc_id",
        F.col("box_id").alias("b_id"),
        F.col("y").alias("b_y"),
        (F.col("y") + F.col("h")).alias("b_y2"),
    )
    return (
        a.join(b, "doc_id")
        .filter(
            (F.col("a_id") < F.col("b_id"))
            & (F.col("b_y") <= F.col("a_cy"))
            & (F.col("a_cy") <= F.col("b_y2"))
        )
        .select("doc_id", "a_id", "b_id")
    )


J4_SQL = f"""
WITH b AS ({_BOXES_SQL})
SELECT a.doc_id, a.box_id AS a_id, b.box_id AS b_id
FROM b a JOIN b b ON a.doc_id = b.doc_id
WHERE a.box_id < b.box_id
  AND b.y <= a.y + a.h / 2.0 AND a.y + a.h / 2.0 <= b.y + b.h
"""


def j8_containment_all(spark, sf_dir):
    """J8 — containment join (verify_first_is_full, UPC_OCR.py:216-227):
    per doc, is every box inside the doc's widest box?  bool_and over a
    theta containment predicate."""
    b = _boxes(spark, sf_dir)
    full = (
        b.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.col("w").desc(), F.col("box_id"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("x").alias("fx"),
            F.col("y").alias("fy"),
            (F.col("x") + F.col("w")).alias("fx2"),
            (F.col("y") + F.col("h")).alias("fy2"),
        )
    )
    return (
        b.join(full, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.min(
                (
                    (F.col("x") >= F.col("fx"))
                    & (F.col("y") >= F.col("fy"))
                    & (F.col("x") + F.col("w") <= F.col("fx2"))
                    & (F.col("y") + F.col("h") <= F.col("fy2"))
                ).cast("int")
            ).cast("boolean").alias("all_contained")
        )
    )


J8_SQL = f"""
WITH b AS ({_BOXES_SQL}),
f AS (
  SELECT doc_id, x AS fx, y AS fy, x + w AS fx2, y + h AS fy2
  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, box_id) AS rn FROM b)
  WHERE rn = 1
)
SELECT b.doc_id,
       CAST(min(CAST(x >= fx AND y >= fy AND x + w <= fx2 AND y + h <= fy2 AS INT)) AS BOOLEAN)
         AS all_contained
FROM b JOIN f ON b.doc_id = f.doc_id
GROUP BY b.doc_id
"""


def a2_bounding_region(spark, sf_dir):
    """A2 — bounding region min/max of box centers
    (find_bounding_region_multiple_items, NFT_PreProcessing.py:232-238)."""
    b = _boxes(spark, sf_dir)
    cx = F.col("x") + F.col("w") / 2.0
    cy = F.col("y") + F.col("h") / 2.0
    return b.groupBy("doc_id").agg(
        F.round(F.min(cx), 1).alias("cx_min"),
        F.round(F.max(cx), 1).alias("cx_max"),
        F.round(F.min(cy), 1).alias("cy_min"),
        F.round(F.max(cy), 1).alias("cy_max"),
    )


A2_SQL = f"""
SELECT doc_id,
       round(min(x + w / 2.0), 1) AS cx_min, round(max(x + w / 2.0), 1) AS cx_max,
       round(min(y + h / 2.0), 1) AS cy_min, round(max(y + h / 2.0), 1) AS cy_max
FROM ({_BOXES_SQL}) GROUP BY doc_id
"""


def a9_group_sizes(spark, sf_dir):
    """A9 — group sizes (pixel count per connected component,
    skeleton.py:82-95): plain groupBy().count() with map-side partials."""
    b = _boxes(spark, sf_dir)
    return b.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("n_boxes"))


A9_SQL = f"SELECT doc_id, CAST(count(*) AS BIGINT) AS n_boxes FROM ({_BOXES_SQL}) GROUP BY doc_id"


def t3_argmax_by_length(spark, sf_dir):
    """T3 — argmax by length (widest candidate rule line per side,
    NFT_PreProcessing.py:179-198) via max_by."""
    ln = _lines(spark, sf_dir).withColumn("len2", F.col("x2") - F.col("x1"))
    # two-stage argmax (max width, then max line_id among the widest):
    # deterministic under ties and safe at any id magnitude, unlike a
    # width*K+id encoding which silently breaks once ids exceed K
    widest = ln.groupBy("doc_id").agg(F.max("len2").alias("max_len"))
    return (
        ln.join(widest, "doc_id")
        .filter(F.col("len2") == F.col("max_len"))
        .groupBy("doc_id")
        .agg(F.max("line_id").alias("widest_line"))
    )


T3_SQL = f"""
WITH ln AS (SELECT *, x2 - x1 AS len2 FROM ({_LINES_SQL})),
w AS (SELECT doc_id, max(len2) AS max_len FROM ln GROUP BY doc_id)
SELECT ln.doc_id, max(line_id) AS widest_line
FROM ln JOIN w ON ln.doc_id = w.doc_id AND ln.len2 = w.max_len
GROUP BY ln.doc_id
"""


def c18_c20_box_algebra(spark, sf_dir):
    """C18/C20 — geometry math + bbox algebra (point-on-line NFT_OCR.py:278-309,
    bbox union Google_OCR_API.py:98-134): union of each doc's first two
    boxes via least/greatest struct exprs."""
    b = _boxes(spark, sf_dir)
    two = (
        b.withColumn(
            "rn", F.row_number().over(Window.partitionBy("doc_id").orderBy("box_id"))
        )
        .filter(F.col("rn") <= 2)
        .groupBy("doc_id")
        .agg(
            F.min("x").alias("ux"),
            F.min("y").alias("uy"),
            F.max(F.col("x") + F.col("w")).alias("ux2"),
            F.max(F.col("y") + F.col("h")).alias("uy2"),
        )
    )
    return two.select(
        "doc_id", "ux", "uy", "ux2", "uy2",
        ((F.col("ux2") - F.col("ux")) * (F.col("uy2") - F.col("uy"))).alias("union_area"),
    )


C18_SQL = f"""
WITH b AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY box_id) AS rn
  FROM ({_BOXES_SQL})
),
u AS (
  SELECT doc_id, min(x) AS ux, min(y) AS uy,
         max(x + w) AS ux2, max(y + h) AS uy2
  FROM b WHERE rn <= 2 GROUP BY doc_id
)
SELECT doc_id, ux, uy, ux2, uy2, (ux2 - ux) * (uy2 - uy) AS union_area FROM u
"""


def t4_argsort_by_y(spark, sf_dir):
    """T4 — argsort (curves sorted by vertical position, skeleton.py:393):
    per-doc line ids in ascending y order, array_sort on collected structs
    (fully JVM-side, no shuffle beyond the groupBy)."""
    ln = _lines(spark, sf_dir)
    return (
        ln.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("y1", "line_id"))).alias("arr"))
        .select(
            "doc_id",
            F.concat_ws(",", F.transform("arr", lambda x: x.line_id)).alias("ordered_lines"),
        )
    )


T4_SQL = f"""
SELECT doc_id,
       string_agg(CAST(line_id AS VARCHAR), ',' ORDER BY y1, line_id) AS ordered_lines
FROM ({_LINES_SQL}) GROUP BY doc_id
"""


QUERIES = {
    "f2_directional_filter": (f2_directional_filter, F2_SQL),
    "t4_argsort_by_y": (t4_argsort_by_y, T4_SQL),
    "f7_orientation_predicate": (f7_orientation_predicate, F7_SQL),
    "f9_usefulness_predicate": (f9_usefulness_predicate, F9_SQL),
    "f10_size_pruning": (f10_size_pruning, F10_SQL),
    "j4_interval_same_line": (j4_interval_same_line, J4_SQL),
    "j8_containment_all": (j8_containment_all, J8_SQL),
    "a2_bounding_region": (a2_bounding_region, A2_SQL),
    "a9_group_sizes": (a9_group_sizes, A9_SQL),
    "t3_argmax_by_length": (t3_argmax_by_length, T3_SQL),
    "c18_c20_box_algebra": (c18_c20_box_algebra, C18_SQL),
}
