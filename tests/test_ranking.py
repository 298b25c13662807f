"""Distributed global rank / ntile vs Spark's single-partition window."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tube_spark.operators.ranking import global_ranked, ntile_distributed


def _orders(spark):
    return spark.read.parquet("/root/testdata/sf0.001/orders.parquet")


def test_global_rank_matches_window(spark):
    o = _orders(spark)
    got = global_ranked(o, ["o_totalprice", "o_orderkey"], num_partitions=8)
    w = Window.partitionBy().orderBy("o_totalprice", "o_orderkey")
    want = o.withColumn("rank", F.row_number().over(w))
    assert (
        got.select("o_orderkey", "rank")
        .exceptAll(want.select("o_orderkey", "rank"))
        .count()
        == 0
    )
    assert got.count() == o.count()


def test_ntile_matches_window(spark):
    o = _orders(spark)
    got = ntile_distributed(o, 7, ["o_totalprice", "o_orderkey"], num_partitions=8)
    w = Window.partitionBy().orderBy("o_totalprice", "o_orderkey")
    want = o.withColumn("tile", F.ntile(7).over(w))
    assert (
        got.select("o_orderkey", "tile")
        .exceptAll(want.select("o_orderkey", "tile"))
        .count()
        == 0
    )


def test_no_single_partition_exchange(spark):
    """The whole point: the plan must not contain a SinglePartition
    exchange (which is what a global window compiles to)."""
    o = _orders(spark)
    got = ntile_distributed(o, 4, ["o_totalprice", "o_orderkey"], num_partitions=8)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_empty_input(spark):
    o = _orders(spark).filter(F.lit(False))
    assert global_ranked(o, ["o_orderkey"]).count() == 0
    assert ntile_distributed(o, 4, ["o_orderkey"]).count() == 0
