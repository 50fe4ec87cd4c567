"""Bucketed co-located join: pre-bucketing both sides of a recurring join
key eliminates the shuffle at query time (SCALE.md §1 — on Iceberg this is
`bucket(conv_id)` partitioning; here the Spark-native bucketBy form)."""

from __future__ import annotations

import pandas as pd


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # warehouse.dir is a static conf; tables land in the session default
    # warehouse (spark-warehouse/, gitignored) and are dropped below
    left = spark.createDataFrame(
        pd.DataFrame({"conv_id": [f"c{i%40:03d}" for i in range(400)], "x": range(400)})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"conv_id": [f"c{i%40:03d}" for i in range(200)], "y": range(200)})
    )
    for name, df in (("bkt_left", left), ("bkt_right", right)):
        df.write.mode("overwrite").bucketBy(8, "conv_id").sortBy("conv_id").saveAsTable(name)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        j = spark.table("bkt_left").join(spark.table("bkt_right"), "conv_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        # co-located: sort-merge join directly over the bucketed scans,
        # with no shuffle exchange on either side
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert j.count() == 2000  # 400*5 per-key pairs over 40 keys... (10*5)*40
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")
