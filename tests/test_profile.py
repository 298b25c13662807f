"""Column profile and histogram semantics + single-pass plan."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.profile import histogram, profile


@pytest.fixture(scope="module")
def frame(spark):
    rows = [(1, 10.0, "a"), (2, 20.0, "b"), (3, None, "b"), (4, 40.0, None)]
    return spark.createDataFrame(rows, "id long, val double, cat string")


def test_profile_stats(spark, frame):
    out = {r["column"]: r for r in profile(frame).collect()}
    assert out["id"]["n"] == 4 and out["id"]["n_null"] == 0
    assert out["id"]["n_distinct"] == 4
    assert out["val"]["n_null"] == 1 and out["val"]["n_distinct"] == 3
    assert out["val"]["min"] == 10.0 and out["val"]["max"] == 40.0
    vals = [10.0, 20.0, 40.0]
    mean = sum(vals) / 3
    sd = math.sqrt(sum((v - mean) ** 2 for v in vals) / 2)  # sample stddev
    assert out["val"]["mean"] == round(mean, 6)
    assert out["val"]["stddev"] == round(sd, 6)
    assert out["cat"]["min"] is None and out["cat"]["mean"] is None
    assert out["cat"]["n_distinct"] == 2 and out["cat"]["n_null"] == 1


def test_profile_unknown_column(frame):
    with pytest.raises(ValueError, match="unknown columns"):
        profile(frame, ["nope"])


def test_profile_single_scan(spark, frame):
    df = profile(frame, ["id", "val"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1


def test_histogram_bins_and_clamp(spark):
    df = spark.createDataFrame(
        [(v,) for v in [-5.0, 0.0, 1.0, 5.0, 9.9, 10.0, 25.0, None]], "v double"
    )
    out = {r["bin"]: r for r in histogram(df, "v", 0.0, 10.0, bins=5).collect()}
    # -5 clamps into bin 0; 10 and 25 clamp into bin 4
    assert out[0]["n"] == 3 and out[0]["bin_lo"] == 0.0 and out[0]["bin_hi"] == 2.0
    assert out[2]["n"] == 1  # 5.0
    assert out[4]["n"] == 3  # 9.9, 10.0, 25.0
    assert sum(r["n"] for r in out.values()) == 7  # NULL excluded


def test_histogram_validation(spark, frame):
    with pytest.raises(ValueError, match="bins"):
        histogram(frame, "val", 0, 1, bins=0)
    with pytest.raises(ValueError, match="hi > lo"):
        histogram(frame, "val", 1, 1)
