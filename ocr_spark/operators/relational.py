"""Headline relational queries (TPC-H shapes) — the general-engine proof.

Scale notes (100 TB posture): Q1 is a map-side-combinable scan-agg (partial
aggregation before the single shuffle); Q3/Q5 broadcast every dimension
that fits (region/nation/customer-filter) so the only big shuffles are the
fact-table aggregations.  AQE handles runtime re-planning and skew.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.operators.tables import load


# Cross-engine float discipline: prices/quantities/rates carry exactly 2
# decimals, so sums are computed in the scaled-integer domain (cents /
# basis points) — exact BIGINT arithmetic in both engines, immune to
# summation-order FP noise that makes round(sum(double)) flip at half-cent
# boundaries.
def _cents(col):
    return F.round(col * 100).cast("bigint")


def q1_pricing_summary(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    qty = _cents(F.col("l_quantity"))
    price = _cents(F.col("l_extendedprice"))
    disc = _cents(F.col("l_discount"))
    tax = _cents(F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty) / 100.0).alias("sum_qty"),
            (F.sum(price) / 100.0).alias("sum_base_price"),
            (F.sum(price * (100 - disc)) / 1e4).alias("sum_disc_price"),
            (F.sum(price * (100 - disc) * (100 + tax)) / 1e6).alias("sum_charge"),
            (F.sum(qty) / 100.0 / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(price) / 100.0 / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(disc) / 100.0 / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
WITH c AS (
  SELECT l_returnflag, l_linestatus,
         CAST(round(l_quantity * 100) AS BIGINT)       AS qty,
         CAST(round(l_extendedprice * 100) AS BIGINT)  AS price,
         CAST(round(l_discount * 100) AS BIGINT)       AS disc,
         CAST(round(l_tax * 100) AS BIGINT)            AS tax
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
)
SELECT l_returnflag, l_linestatus,
       sum(qty) / 100.0                                          AS sum_qty,
       sum(price) / 100.0                                         AS sum_base_price,
       sum(price * (100 - disc)) / 1e4                            AS sum_disc_price,
       sum(price * (100 - disc) * (100 + tax)) / 1e6              AS sum_charge,
       sum(qty) / 100.0 / count(*)                                AS avg_qty,
       sum(price) / 100.0 / count(*)                              AS avg_price,
       sum(disc) / 100.0 / count(*)                               AS avg_disc,
       count(*)                                                  AS count_order
FROM c GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark, sf_dir):
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1997-01-01")
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-01-01")
    return (
        # No broadcast hint on customer: it scales with sf (~3e9 rows at
        # 100 TB-equivalent), so a mandatory broadcast would OOM the driver
        # at scale and AQE cannot demote an explicit hint.  AQE still
        # broadcasts it at small sf on its own.
        l.join(o.join(c, o.o_custkey == c.c_custkey),
               F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            (
                F.sum(
                    _cents(F.col("l_extendedprice"))
                    * (100 - _cents(F.col("l_discount")))
                )
                / 1e4
            ).alias("revenue")
        )
        .select("o_orderkey", "o_orderpriority", "revenue")
    )


Q3_SQL = """
SELECT o_orderkey, o_orderpriority,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 1e4 AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o_orderkey, o_orderpriority
"""


def q5_local_supplier_volume(spark, sf_dir):
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    dims = (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(dims), s.s_nationkey == dims.n_nationkey)
        .groupBy("n_name", "r_name")
        .agg(
            (
                F.sum(
                    _cents(F.col("l_extendedprice"))
                    * (100 - _cents(F.col("l_discount")))
                )
                / 1e4
            ).alias("revenue")
        )
    )


Q5_SQL = """
SELECT n_name, r_name,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 1e4 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
"""


QUERIES = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q5_local_supplier_volume": (q5_local_supplier_volume, Q5_SQL),
}
