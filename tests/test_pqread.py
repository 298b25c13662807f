"""Schema-cached parquet reads (functions/pqread.py).

Pins the three contract points of the r14-opt read helper:
1. the cached read returns the SAME schema and rows as a stock read;
2. a cache hit submits ZERO Spark jobs (the stock path pays one
   footer-inference job per call — the cost the helper removes);
3. rewriting the file (schema change included) invalidates the cache
   via the (mtime_ns, size) signature, so stale schemas are never
   served.
"""

from __future__ import annotations

import os

from pyspark.sql import Row

from tube_spark.functions import pqread
from tube_spark.functions.pqread import read_parquet


def _job_ids(spark):
    return set(spark.sparkContext.statusTracker().getJobIdsForGroup(None))


def test_same_schema_and_rows(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [Row(a=1, b="x"), Row(a=2, b="y")]
    ).write.parquet(p)
    stock = spark.read.parquet(p)
    first = read_parquet(spark, p)  # fills the cache
    second = read_parquet(spark, p)  # served from it
    assert first.schema == stock.schema == second.schema
    assert sorted(second.collect()) == sorted(stock.collect())


def test_cache_hit_submits_no_jobs(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame([Row(a=1)]).write.parquet(p)
    read_parquet(spark, p)  # pays the inference job once
    before = _job_ids(spark)
    df = read_parquet(spark, p)
    assert _job_ids(spark) == before, "cache hit must not submit a job"
    assert df.count() == 1  # and still computes from the file


def test_rewrite_invalidates(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame([Row(a=1)]).write.parquet(p)
    assert read_parquet(spark, p).schema.fieldNames() == ["a"]
    spark.createDataFrame([Row(z="s")]).write.mode("overwrite").parquet(p)
    assert read_parquet(spark, p).schema.fieldNames() == ["z"]


def test_unstatable_path_degrades_to_stock(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame([Row(a=7)]).write.parquet(p)
    key_count = len(pqread._CACHE)
    # a path os.stat cannot see is read stock and never cached
    missing = str(tmp_path / "nope.parquet")
    assert not os.path.exists(missing)
    try:
        read_parquet(spark, missing)
    except Exception:
        pass  # stock reader raises its usual path-not-found
    assert len(pqread._CACHE) == key_count
