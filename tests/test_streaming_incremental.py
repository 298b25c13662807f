"""Incremental refresh: availableNow processes only new files per run."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_incremental_refresh_processes_only_new_data(spark, tmp_path):
    from tube_spark.streaming.refresh import incremental_refresh

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").write.mode(
        "append"
    ).parquet(src)

    transform = lambda df: df.withColumn("v2", F.upper("v"))
    incremental_refresh(spark, src, transform, sink, ckpt)
    assert spark.read.parquet(sink).count() == 2

    # new file arrives; second run appends ONLY the new rows
    spark.createDataFrame([(3, "c")], "id long, v string").write.mode("append").parquet(src)
    incremental_refresh(spark, src, transform, sink, ckpt)
    out = spark.read.parquet(sink)
    assert out.count() == 3
    assert {r["v2"] for r in out.collect()} == {"A", "B", "C"}

    # no new data: a third run is a no-op (freshness via checkpoint)
    incremental_refresh(spark, src, transform, sink, ckpt)
    assert spark.read.parquet(sink).count() == 3


def test_streaming_dedup_matches_batch(spark, tmp_path):
    from tube_spark.streaming.refresh import streaming_dedup

    src = str(tmp_path / "dup_src")
    rows = [
        (1, "2024-01-01 00:00:00", "a"),
        (1, "2024-01-01 00:05:00", "a-dup"),
        (2, "2024-01-01 01:00:00", "b"),
    ]
    spark.createDataFrame(rows, "k long, ts string, v string").selectExpr(
        "k", "cast(ts as timestamp) ts", "v"
    ).write.mode("append").parquet(src)
    # duplicates split ACROSS files (a second micro-batch on restart)
    spark.createDataFrame(
        [(2, "2024-01-01 01:10:00", "b-dup"), (3, "2024-01-01 02:00:00", "c")],
        "k long, ts string, v string",
    ).selectExpr("k", "cast(ts as timestamp) ts", "v").write.mode("append").parquet(src)

    out = streaming_dedup(spark, src, keys=["k"], ts_col="ts", watermark="1 hour")
    batch = spark.read.parquet(src).dropDuplicates(["k"])
    assert out.count() == batch.count() == 3
    assert {r["k"] for r in out.collect()} == {1, 2, 3}
    # exactly one surviving row per key, each a real input row
    vs = {r["k"]: r["v"] for r in out.collect()}
    assert vs[1] in {"a", "a-dup"} and vs[3] == "c"


def test_salted_join_and_count(spark):
    from tube_spark.operators.skew import salted_count, salted_join

    # a pathologically hot key: 900 of 1000 rows share key 7
    big = spark.range(1000).select(
        F.when(F.col("id") < 900, 7).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(7, "hot"), (950, "cold")], "k long, label string"
    )
    joined = salted_join(big, small, on="k", salt=8)
    assert joined.count() == 901  # 900 hot + 1 cold
    assert joined.filter(F.col("label") == "hot").count() == 900

    counts = {r["k"]: r["count"] for r in salted_count(big, "k", salt=8).collect()}
    assert counts[7] == 900 and counts[950] == 1
    assert len(counts) == 101

    # left join keeps unmatched BIG rows exactly once
    left = salted_join(big, small, on="k", salt=8, how="left")
    assert left.count() == 1000
    # right/full would duplicate unmatched small-side rows per salt copy
    import pytest

    for bad in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(big, small, on="k", salt=8, how=bad)
