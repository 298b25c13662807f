"""Adaptive hot-key join: equivalence to the plain join under skew."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.skew import adaptive_join


@pytest.fixture(scope="module")
def skewed_pair(spark):
    rnd = random.Random(3)
    rows = [
        (i, "hot" if rnd.random() < 0.4 else f"k{rnd.randrange(500)}")
        for i in range(20000)
    ]
    big = spark.createDataFrame(rows, "row_id long, k string")
    dims = [("hot", 0)] + [(f"k{i}", i + 1) for i in range(500)] + [("orphan", 99)]
    small = spark.createDataFrame(dims, "k string, dim long")
    return big, small


def _rows(df):
    return sorted((r["row_id"], r["k"], r["dim"]) for r in df.collect())


def test_inner_matches_plain(spark, skewed_pair):
    big, small = skewed_pair
    want = _rows(big.join(small, on="k", how="inner"))
    got = _rows(adaptive_join(big, small, "k", min_share=0.1, salt=8))
    assert got == want


def test_left_matches_plain_with_missing_dims(spark, skewed_pair):
    big, small = skewed_pair
    # drop some dims so left-join NULLs exercise both routes
    small2 = small.filter(~F.col("k").isin(["k1", "k2"]))
    want = _rows(big.join(small2, on="k", how="left"))
    got = _rows(adaptive_join(big, small2, "k", how="left", min_share=0.1))
    assert got == want


def test_explicit_hot_keys_and_no_hot(spark, skewed_pair):
    big, small = skewed_pair
    want = _rows(big.join(small, on="k"))
    got = _rows(adaptive_join(big, small, "k", hot_keys=["hot", "k3"]))
    assert got == want
    none_hot = _rows(adaptive_join(big, small, "k", hot_keys=[]))
    assert none_hot == want


def test_validation(skewed_pair):
    big, small = skewed_pair
    with pytest.raises(ValueError, match="inner"):
        adaptive_join(big, small, "k", how="full")
