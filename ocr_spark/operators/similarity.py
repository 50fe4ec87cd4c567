"""Similarity search over the embeddings table (array<float>, 64-dim).

Brute-force cosine top-k as the exactness baseline and a sign-LSH-bucketed
variant as the scale path.  Dot products are computed relationally
(posexplode + equi-join on the component index + sum) so the identical
plan runs in DuckDB for the oracle; cosines are rounded to 6 dp *before*
ranking so float noise cannot flip a rank across engines.

Scale notes: at 10^9 vectors the brute-force product is infeasible — the
bucketed variant prunes candidates to one bucket (sign-bit sketch over the
leading dimensions), the classic LSH trade; buckets are balanced keys, so
the join shuffles candidates once, broadcast-joining the (tiny) query set.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ocr_spark.operators.tables import load

N_QUERIES = 10
TOP_K = 5
SIGN_BITS = 8  # 2^8 = 256 buckets
PROBE_RADIUS = 1  # multi-probe: also search buckets within Hamming<=1


def _probe_masks(radius: int) -> list[int]:
    """XOR masks enumerating all buckets within Hamming ``radius`` of the
    query's bucket (multi-probe LSH: the near-miss buckets that differ in
    one borderline sign bit hold most of the lost neighbors)."""
    masks = [0]
    if radius >= 1:
        masks += [1 << i for i in range(SIGN_BITS)]
    if radius >= 2:
        masks += [
            (1 << i) | (1 << j)
            for i in range(SIGN_BITS)
            for j in range(i + 1, SIGN_BITS)
        ]
    return masks


def _components(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.posexplode(F.col("embedding")).alias("idx", "v"),
    ).select("vec_id", "idx", F.col("v").cast("double").alias("v"))


_COMPONENTS_SQL = """
SELECT vec_id,
       generate_subscripts(embedding, 1) - 1 AS idx,
       CAST(unnest(embedding) AS DOUBLE) AS v
FROM embeddings
"""

def ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k: queries = vec_id < N, candidates = all
    others; exact ranking with deterministic tie-break."""
    comp = _components(spark, sf_dir).cache()
    norms = comp.groupBy("vec_id").agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm"))
    q = comp.filter(F.col("vec_id") < N_QUERIES)
    c = comp.filter(F.col("vec_id") >= N_QUERIES)
    dots = (
        q.alias("q")
        .join(c.alias("c"), F.col("q.idx") == F.col("c.idx"))
        .groupBy(
            F.col("q.vec_id").alias("query_id"), F.col("c.vec_id").alias("cand_id")
        )
        .agg(F.sum(F.col("q.v") * F.col("c.v")).alias("dot"))
    )
    cos = (
        dots.join(norms.alias("nq"), F.col("query_id") == F.col("nq.vec_id"))
        .join(norms.alias("nc"), F.col("cand_id") == F.col("nc.vec_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(F.col("dot") / (F.col("nq.nrm") * F.col("nc.nrm")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        cos.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "cand_id", "cos", "rk")
    )


ANN_TOPK_SQL = f"""
WITH comp AS ({_COMPONENTS_SQL}),
norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM comp GROUP BY vec_id),
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, sum(q.v * c.v) AS dot
  FROM comp q JOIN comp c ON q.idx = c.idx
  WHERE q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
  GROUP BY q.vec_id, c.vec_id
),
cos AS (
  SELECT d.query_id, d.cand_id,
         round(d.dot / (nq.nrm * nc.nrm), 6) AS cos
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.query_id
  JOIN norms nc ON nc.vec_id = d.cand_id
),
ranked AS (
  SELECT query_id, cand_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rk
  FROM cos
)
SELECT query_id, cand_id, cos, rk FROM ranked WHERE rk <= {TOP_K}
"""


def ann_lsh_bucketed(spark, sf_dir, probe_radius: int = PROBE_RADIUS):
    """Sign-LSH bucketed + multi-probe variant: 8 sign bits over the
    leading dimensions define 256 buckets; a query searches its own bucket
    plus every bucket within Hamming ``probe_radius`` of it (the classic
    multi-probe recall fix for fine bucketing), then ranks exact cosine
    inside the probed set only.  At 10^9 vectors each bucket holds ~4M
    vectors and a radius-1 probe scans 9/256 ~ 3.5% of the corpus; the
    probe fan-out multiplies only the (tiny) query side before the join,
    so the shuffle stays one hash partition on bucket."""
    e = load(spark, sf_dir, "embeddings")
    bucket = sum(
        (
            F.when(F.element_at(F.col("embedding"), i + 1) > 0, 1 << i).otherwise(0)
            for i in range(SIGN_BITS)
        ),
        F.lit(0),
    ).alias("bucket")
    buckets = e.select("vec_id", bucket)

    comp = _components(spark, sf_dir)
    comp_b = comp.join(buckets, "vec_id")
    norms = comp.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm")
    )
    masks = _probe_masks(probe_radius)
    # fan the query side out to its probe buckets (candidates stay put: a
    # candidate lives in exactly one bucket, so probed pairs are unique)
    q = (
        comp_b.filter(F.col("vec_id") < N_QUERIES)
        .withColumn("mask", F.explode(F.array(*[F.lit(m) for m in masks])))
        .withColumn("probe", F.col("bucket").bitwiseXOR(F.col("mask")))
    )
    c = comp_b.filter(F.col("vec_id") >= N_QUERIES)
    dots = (
        q.alias("q")
        .join(
            c.alias("c"),
            (F.col("q.idx") == F.col("c.idx")) & (F.col("q.probe") == F.col("c.bucket")),
        )
        .groupBy(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("cand_id"),
            F.col("c.bucket").alias("bucket"),
        )
        .agg(F.sum(F.col("q.v") * F.col("c.v")).alias("dot"))
    )
    cos = (
        dots.join(norms.alias("nq"), F.col("query_id") == F.col("nq.vec_id"))
        .join(norms.alias("nc"), F.col("cand_id") == F.col("nc.vec_id"))
        .select(
            "query_id",
            "cand_id",
            "bucket",
            F.round(F.col("dot") / (F.col("nq.nrm") * F.col("nc.nrm")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        cos.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "cand_id", "bucket", "cos", "rk")
    )


_BUCKET_EXPR = " + ".join(
    f"(CASE WHEN embedding[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
    for i in range(SIGN_BITS)
)

ANN_LSH_SQL = f"""
WITH buckets AS (
  SELECT vec_id, {_BUCKET_EXPR} AS bucket FROM embeddings
),
comp AS ({_COMPONENTS_SQL}),
compb AS (SELECT c.vec_id, c.idx, c.v, b.bucket FROM comp c JOIN buckets b USING (vec_id)),
norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM comp GROUP BY vec_id),
masks(mask) AS (VALUES {", ".join(f"({m})" for m in _probe_masks(PROBE_RADIUS))}),
probed AS (
  SELECT q.vec_id, q.idx, q.v, xor(q.bucket, m.mask) AS probe
  FROM compb q CROSS JOIN masks m
  WHERE q.vec_id < {N_QUERIES}
),
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, c.bucket AS bucket,
         sum(q.v * c.v) AS dot
  FROM probed q JOIN compb c ON q.idx = c.idx AND q.probe = c.bucket
  WHERE c.vec_id >= {N_QUERIES}
  GROUP BY q.vec_id, c.vec_id, c.bucket
),
cos AS (
  SELECT d.query_id, d.cand_id, d.bucket,
         round(d.dot / (nq.nrm * nc.nrm), 6) AS cos
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.query_id
  JOIN norms nc ON nc.vec_id = d.cand_id
),
ranked AS (
  SELECT query_id, cand_id, bucket, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rk
  FROM cos
)
SELECT query_id, cand_id, bucket, cos, rk FROM ranked WHERE rk <= {TOP_K}
"""


N_CENTROIDS = 8
N_PROBE = 2


def ann_ivf_flat(spark, sf_dir, n_probe: int = N_PROBE):
    """IVF-Flat: coarse quantizer + probe-limited exact search (the other
    classic ANN scale path next to LSH).

    Centroids = the ``N_CENTROIDS`` vectors right after the query range
    (deterministic stand-in for a k-means codebook — the assignment /
    probe / rank machinery is identical).  Every vector is assigned to its
    argmax-dot centroid (its cell); a query probes its ``N_PROBE`` nearest
    cells and ranks exact cosine only within them.  At 10^9 vectors the
    centroid table broadcasts (tiny), assignment is one narrow pass, and
    the search join shuffles only (cell, vec) — never all-pairs.  Dots are
    rounded to 6 dp before the argmax so the cell assignment cannot flip
    between engines.
    """
    comp = _components(spark, sf_dir).cache()
    cent = comp.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + N_CENTROIDS)
    ).select(F.col("vec_id").alias("cent_id"), "idx", F.col("v").alias("cv"))
    # dot(vector, centroid) for every pair -> ranked cells per vector
    vdots = (
        comp.alias("x")
        .join(F.broadcast(cent), F.col("x.idx") == cent.idx)
        .groupBy(F.col("x.vec_id").alias("vec_id"), "cent_id")
        .agg(F.round(F.sum(F.col("x.v") * F.col("cv")), 6).alias("cdot"))
    )
    w_cell = Window.partitionBy("vec_id").orderBy(F.col("cdot").desc(), F.col("cent_id"))
    cells = vdots.withColumn("cell_rk", F.row_number().over(w_cell))
    assign = cells.filter(F.col("cell_rk") == 1).select(
        "vec_id", F.col("cent_id").alias("cell")
    )
    probes = cells.filter(
        (F.col("cell_rk") <= n_probe) & (F.col("vec_id") < N_QUERIES)
    ).select(F.col("vec_id").alias("query_id"), F.col("cent_id").alias("cell"))

    norms = comp.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm")
    )
    cand = assign.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("cand_id"), "cell"
    )
    pairs = probes.join(cand, "cell").select("query_id", "cand_id").distinct()
    dots = (
        pairs.join(
            comp.alias("q"), F.col("query_id") == F.col("q.vec_id")
        )
        .join(
            comp.alias("c"),
            (F.col("cand_id") == F.col("c.vec_id")) & (F.col("q.idx") == F.col("c.idx")),
        )
        .groupBy("query_id", "cand_id")
        .agg(F.sum(F.col("q.v") * F.col("c.v")).alias("dot"))
    )
    cos = (
        dots.join(norms.alias("nq"), F.col("query_id") == F.col("nq.vec_id"))
        .join(norms.alias("nc"), F.col("cand_id") == F.col("nc.vec_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(F.col("dot") / (F.col("nq.nrm") * F.col("nc.nrm")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        cos.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "cand_id", "cos", "rk")
    )


ANN_IVF_SQL = f"""
WITH comp AS ({_COMPONENTS_SQL}),
cent AS (
  SELECT vec_id AS cent_id, idx, v AS cv FROM comp
  WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + N_CENTROIDS}
),
vdots AS (
  SELECT x.vec_id, cent_id, round(sum(x.v * cv), 6) AS cdot
  FROM comp x JOIN cent ON x.idx = cent.idx
  GROUP BY x.vec_id, cent_id
),
cells AS (
  SELECT vec_id, cent_id, cdot,
         row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cent_id) AS cell_rk
  FROM vdots
),
assign AS (SELECT vec_id, cent_id AS cell FROM cells WHERE cell_rk = 1),
probes AS (
  SELECT vec_id AS query_id, cent_id AS cell FROM cells
  WHERE cell_rk <= {N_PROBE} AND vec_id < {N_QUERIES}
),
cand AS (SELECT vec_id AS cand_id, cell FROM assign WHERE vec_id >= {N_QUERIES}),
pairs AS (SELECT DISTINCT query_id, cand_id FROM probes JOIN cand USING (cell)),
norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM comp GROUP BY vec_id),
dots AS (
  SELECT p.query_id, p.cand_id, sum(q.v * c.v) AS dot
  FROM pairs p
  JOIN comp q ON q.vec_id = p.query_id
  JOIN comp c ON c.vec_id = p.cand_id AND c.idx = q.idx
  GROUP BY p.query_id, p.cand_id
),
cos AS (
  SELECT d.query_id, d.cand_id, round(d.dot / (nq.nrm * nc.nrm), 6) AS cos
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.query_id
  JOIN norms nc ON nc.vec_id = d.cand_id
),
ranked AS (
  SELECT query_id, cand_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rk
  FROM cos
)
SELECT query_id, cand_id, cos, rk FROM ranked WHERE rk <= {TOP_K}
"""


QUERIES = {
    "ann_cosine_topk": (ann_cosine_topk, ANN_TOPK_SQL),
    "ann_lsh_bucketed": (ann_lsh_bucketed, ANN_LSH_SQL),
    "ann_ivf_flat": (ann_ivf_flat, ANN_IVF_SQL),
}
