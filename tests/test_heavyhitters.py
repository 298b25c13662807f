"""Heavy-hitter detection: exactness, superset guarantee, memory bound."""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.heavyhitters import (
    heavy_hitters,
    hot_key_values,
    misra_gries_candidates,
)


def _zipf_rows(n: int, seed: int) -> list[str]:
    """Skewed key stream: a few hot keys over a long random tail."""
    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        r = rnd.random()
        if r < 0.30:
            rows.append("hot_a")
        elif r < 0.45:
            rows.append("hot_b")
        elif r < 0.52:
            rows.append("warm_c")
        else:
            rows.append(f"tail_{rnd.randrange(2000)}")
    return rows


@pytest.fixture(scope="module")
def skewed(spark):
    rows = _zipf_rows(20000, seed=7)
    df = spark.createDataFrame([(k,) for k in rows], "k string")
    return df, Counter(rows)


def test_exact_answer_any_partitioning(spark, skewed):
    """The two-scan result equals the exact GROUP BY answer regardless
    of partition count / arrival order (only the discarded candidate
    set depends on them)."""
    df, truth = skewed
    n = sum(truth.values())
    expected = {
        k: c for k, c in truth.items() if c / n >= 0.05
    }
    for parts in (1, 3, 16):
        got = {
            r["k"]: r["cnt"]
            for r in heavy_hitters(df.repartition(parts), "k", 0.05).collect()
        }
        assert got == expected


def test_candidate_superset_guarantee(spark, skewed):
    """Every key with count > N/(k+1) appears among the MG candidates —
    the Misra-Gries pigeonhole bound, under adversarial ordering."""
    df, truth = skewed
    n = sum(truth.values())
    k = 20
    ordered = df.orderBy("k")  # worst case: hot keys clustered
    for frame in (df.repartition(8), ordered.repartition(2)):
        cands = {
            r["k"] for r in misra_gries_candidates(frame, "k", k).collect()
        }
        for key, cnt in truth.items():
            if cnt > n / (k + 1):
                assert key in cands, f"{key} ({cnt}/{n}) missing from candidates"


def test_summary_size_bounded(spark, skewed):
    """≤ k candidate rows per partition — the memory contract."""
    df, _ = skewed
    k = 15
    per_part = (
        misra_gries_candidates(df.repartition(6), "k", k)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    assert per_part and all(r["count"] <= k for r in per_part)


def test_share_and_hot_key_values(spark, skewed):
    df, truth = skewed
    n = sum(truth.values())
    rows = {r["k"]: r for r in heavy_hitters(df, "k", 0.10).collect()}
    for k_, r in rows.items():
        assert r["share"] == round(truth[k_] / n, 6)
    hot = set(hot_key_values(df, "k", 0.10))
    assert hot == {k for k, c in truth.items() if c / n >= 0.10}


def test_null_keys_counted(spark):
    rows = [("a",)] * 50 + [(None,)] * 40 + [("b",)] * 10
    df = spark.createDataFrame(rows, "k string").repartition(3)
    got = {r["k"]: r["cnt"] for r in heavy_hitters(df, "k", 0.3).collect()}
    assert got == {"a": 50, None: 40}


def test_numeric_keys(spark):
    rows = [(1,)] * 60 + [(2,)] * 30 + [(i,) for i in range(100, 110)]
    df = spark.createDataFrame(rows, "k long").repartition(4)
    got = {r["k"]: r["cnt"] for r in heavy_hitters(df, "k", 0.25).collect()}
    assert got == {1: 60, 2: 30}


def test_validation():
    with pytest.raises(ValueError, match="min_share"):
        heavy_hitters(None, "k", 0.0)
    with pytest.raises(ValueError, match="cannot cover"):
        heavy_hitters(None, "k", 0.01, k=5)
