"""Bucketed co-located joins: the plan must show NO shuffle exchange on
either side of a join between two tables bucketed on the join key."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    from tube_spark.sinks.writer import BucketedTableSink

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

        so = BucketedTableSink("b_orders", ("o_orderkey",), n_buckets=8)
        sl = BucketedTableSink("b_lineitem", ("l_orderkey",), n_buckets=8)
        so.write(orders)
        sl.write(lineitem)

        j = so.read(spark).join(
            sl.read(spark), F.col("o_orderkey") == F.col("l_orderkey")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        # and it still computes the right thing
        assert j.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_versioned_bucketed_publish(spark, tmp_path):
    from tube_spark.sinks.writer import VersionedIndexWriter

    try:
        w = VersionedIndexWriter(str(tmp_path), "cust_idx", keep_versions=2)
        df1 = spark.range(10).withColumn("k", F.col("id") % 3)
        t1 = w.publish_bucketed(df1, ("k",), n_buckets=4, watermark="tx1")
        assert t1 == "cust_idx_v1"
        assert spark.table("cust_idx_current").count() == 10

        df2 = spark.range(20).withColumn("k", F.col("id") % 3)
        w.publish_bucketed(df2, ("k",), n_buckets=4, watermark="tx2")
        # the view alias now serves v2
        assert spark.table("cust_idx_current").count() == 20
        assert w.manifest()["current"] == 2
        assert w.manifest()["versions"][-1]["bucketed_on"] == ["k"]
    finally:
        for t in ("cust_idx_v1", "cust_idx_v2"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql("DROP VIEW IF EXISTS cust_idx_current")
