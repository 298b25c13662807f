"""Bucketed band join vs the naive inequality join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.rangejoin import interval_point_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 250), (3, 2, 100), (4, 9, 100)],
        "lid long, k long, lt long",
    )
    right = spark.createDataFrame(
        [(10, 1, 95), (11, 1, 105), (12, 1, 180), (13, 2, 400), (14, 3, 100)],
        "rid long, k long, rt long",
    )
    return left, right


def test_matches_naive_inequality_join(spark):
    left, right = _frames(spark)
    got = interval_point_join(left, right, "lt", "rt", lower=-50, upper=10, on="k")
    naive = left.alias("l").join(
        right.alias("r"),
        (F.col("l.k") == F.col("r.k"))
        & F.col("r.rt").between(F.col("l.lt") - 50, F.col("l.lt") + 10),
    ).select("l.lid", "r.rid")
    assert (
        got.select("lid", "rid").exceptAll(naive).count() == 0
        and naive.exceptAll(got.select("lid", "rid")).count() == 0
    )


def test_no_key_band_join(spark):
    left, right = _frames(spark)
    r2 = right.withColumnRenamed("k", "rk")
    got = interval_point_join(left, r2, "lt", "rt", lower=0, upper=100)
    naive = left.alias("l").join(
        r2.alias("r"), F.col("r.rt").between(F.col("l.lt"), F.col("l.lt") + 100)
    ).select("l.lid", "r.rid")
    assert got.select("lid", "rid").exceptAll(naive).count() == 0
    assert naive.exceptAll(got.select("lid", "rid")).count() == 0


def test_left_join_keeps_unmatched(spark):
    left, right = _frames(spark)
    got = interval_point_join(left, right, "lt", "rt", lower=-5, upper=5, on="k", how="left")
    rows = {r["lid"]: r["rid"] for r in got.collect()}
    assert rows[4] is None  # key 9 has no right rows at all
    assert got.count() >= left.count()  # every left row survives


def test_no_cartesian_in_plan(spark):
    left, right = _frames(spark)
    got = interval_point_join(left, right, "lt", "rt", lower=-50, upper=10, on="k")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_bad_bounds_raise(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError, match="upper"):
        interval_point_join(left, right, "lt", "rt", lower=5, upper=5)
