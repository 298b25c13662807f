from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from tube_spark.sinks.writer import VersionedIndexWriter, array_config, freshness_check


def test_array_config(spark):
    df = spark.createDataFrame(
        [(1, ["a"], [{"x": 1, "tags": ["t"]}])],
        "id long, tags array<string>, nested array<struct<x: long, tags: array<string>>>",
    )
    cfg = array_config(df)
    assert cfg["array"] == ["nested", "nested.tags", "tags"]


def test_versioned_publish_and_rollover(spark, tmp_path):
    base = str(tmp_path)
    w = VersionedIndexWriter(base, "cust", keep_versions=2)
    df1 = spark.range(3).withColumn("v", F.lit("one"))
    df2 = spark.range(5).withColumn("v", F.lit("two"))
    df3 = spark.range(7).withColumn("v", F.lit("three"))

    assert freshness_check(w, "2024-01-01")  # nothing published yet
    w.publish(df1, watermark="2024-01-01")
    assert w.read_current(spark).count() == 3
    assert not freshness_check(w, "2024-01-01")  # same watermark -> skip
    assert freshness_check(w, "2024-02-01")  # newer -> run

    w.publish(df2, watermark="2024-02-01")
    w.publish(df3, watermark="2024-03-01")
    assert w.read_current(spark).count() == 7
    m = w.manifest()
    assert m["current"] == 3 and len(m["versions"]) == 2  # v1 pruned
    assert not os.path.exists(os.path.join(base, "cust_v1"))
    # array-config metadata written alongside each version
    with open(os.path.join(base, "cust_v3", "_array_config.json")) as f:
        assert json.load(f) == {"array": []}
