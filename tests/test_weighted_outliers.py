"""Weighted sampling (A-ES) and IQR outlier gating."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tube_spark.functions.text import portable_hash60
from tube_spark.operators.profile import iqr_outliers
from tube_spark.operators.sampling import weighted_sample_k


@pytest.fixture(scope="module")
def weighted(spark):
    # one heavy row (weight 50) over a uniform tail (weight 1)
    rows = [(0, 50.0)] + [(i, 1.0) for i in range(1, 400)]
    return spark.createDataFrame(rows, "doc_id long, w double")


def test_weighted_deterministic_and_partition_independent(spark, weighted):
    a = [
        (r["doc_id"], r["sample_rank"])
        for r in weighted_sample_k(weighted, "w", 10).orderBy("sample_rank").collect()
    ]
    b = [
        (r["doc_id"], r["sample_rank"])
        for r in weighted_sample_k(weighted.repartition(13), "w", 10)
        .orderBy("sample_rank")
        .collect()
    ]
    assert a == b and len(a) == 10


def test_weighted_matches_reference_formula(spark, weighted):
    """The selection equals a direct ln(u)/w ranking computed in Python
    from the same portable hash."""
    hashes = {
        r["doc_id"]: r["h"]
        for r in weighted.select(
            "doc_id",
            portable_hash60(
                F.concat(F.lit("wsample"), F.col("doc_id").cast("string"))
            ).alias("h"),
        ).collect()
    }
    weights = {r["doc_id"]: r["w"] for r in weighted.collect()}
    keys = {
        d: math.log((h + 1) / float(1 << 60)) / weights[d]
        for d, h in hashes.items()
    }
    want = [
        d for d, _ in sorted(keys.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    ]
    got = [
        r["doc_id"]
        for r in weighted_sample_k(weighted, "w", 10).orderBy("sample_rank").collect()
    ]
    assert got == want


def test_weighted_inclusion_bias(spark, weighted):
    """The weight-50 row is sampled far more often than any weight-1
    row across independent seeds (statistical sanity, deterministic
    because seeds are fixed)."""
    hits = sum(
        1
        for s in range(30)
        if 0
        in {
            r["doc_id"]
            for r in weighted_sample_k(weighted, "w", 10, seed=f"s{s}").collect()
        }
    )
    # inclusion probability of the heavy row ≈ 1 - (1-50/449)^10 ≈ 0.7;
    # a weight-1 row's ≈ 0.02.  30 trials: expect ~21 hits.
    assert hits >= 12


def test_weighted_nonpositive_excluded_and_validation(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 2.0)], "doc_id long, w double"
    )
    got = weighted_sample_k(df, "w", 5)
    assert [r["doc_id"] for r in got.collect()] == [3]
    with pytest.raises(ValueError, match="k must be positive"):
        weighted_sample_k(df, "w", 0)


def test_iqr_outliers_global_and_grouped(spark):
    vals = [float(v) for v in range(1, 12)] + [1000.0]  # 1..11 + outlier
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, v double")
    out = {r["id"]: r for r in iqr_outliers(df, "v").collect()}
    assert out[11]["is_outlier"] and not out[0]["is_outlier"]
    # exact quartiles of the 12 values (Spark percentile, continuous)
    assert out[0]["q1"] == pytest.approx(3.75)
    assert out[0]["q3"] == pytest.approx(9.25)

    rows = (
        [(i, "a", float(i % 10)) for i in range(100)]
        + [(900 + i, "b", 5.0 + (i % 3)) for i in range(20)]
        + [(950, "b", 500.0)]
    )
    gdf = spark.createDataFrame(rows, "id long, g string, v double")
    got = {r["id"]: r["is_outlier"] for r in iqr_outliers(gdf, "v", by="g").collect()}
    assert got[950] and not got[900] and not got[5]
