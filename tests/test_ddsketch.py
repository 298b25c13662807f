"""DDSketch-style quantile sketch: python-reference equivalence,
relative-error bound, exact merge, zero/negative contracts."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.ddsketch import (
    ddsketch_buckets,
    ddsketch_merge,
    ddsketch_quantiles,
)

M = 5
TWO_M = 1 << M
SCALE = 1_000_000


def _bucket(v: float) -> int:
    vi = int(round(v * SCALE))
    if vi <= 0:
        return -1
    if vi < TWO_M:
        return vi
    e = vi.bit_length() - 1
    return (e - M + 1) * TWO_M + ((vi >> (e - M)) - TWO_M)


def _est(b: int) -> float:
    if b <= -1:
        return 0.0
    if b < TWO_M:
        return b / SCALE
    o, s = b // TWO_M, b % TWO_M
    width = 1 << (o - 1)
    lo = (TWO_M + s) * width
    return round(((lo + lo + width - 1) // 2) / SCALE, 6)


def _py_quantiles(vs, qs):
    c = Counter(_bucket(v) for v in vs if v is not None and v >= 0)
    n = sum(c.values())
    out = {}
    for q in qs:
        r, cum = math.ceil(q * n), 0
        for b in sorted(c):
            cum += c[b]
            if cum >= r:
                out[q] = (_est(b), n)
                break
    return out


VALS = [
    0.0, 0.0000004, 0.001, 0.25, 0.5, 1.0, 2.0, 3.7, 5.0, 5.0, 5.0,
    10.0, 99.99, 1234.5678, 1e6,
]


def test_matches_python_reference(spark):
    rows = [("a", v) for v in VALS] + [("b", float(i)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        (r["g"], r["q"]): (r["est_value"], r["n_values"])
        for r in ddsketch_quantiles(df, "g", "v", (0.5, 0.9, 0.99, 1.0)).collect()
    }
    for g, vs in (("a", VALS), ("b", [float(i) for i in range(1, 101)])):
        want = _py_quantiles(vs, [0.5, 0.9, 0.99, 1.0])
        for q, w in want.items():
            assert got[(g, q)] == w, (g, q)


def test_relative_error_bound(spark):
    # uniform 1..1000: every estimate within the mapping's guarantee
    # (~(2^(1/32) - 1)/2 ≈ 1.1%; assert the round 2% envelope)
    df = spark.createDataFrame(
        [("u", float(i)) for i in range(1, 1001)], "g string, v double"
    )
    got = {
        r["q"]: r["est_value"]
        for r in ddsketch_quantiles(df, "g", "v", (0.25, 0.5, 0.9, 0.99)).collect()
    }
    for q, est in got.items():
        exact = math.ceil(q * 1000)
        assert abs(est - exact) / exact < 0.02, (q, est, exact)


def test_merge_is_exact(spark):
    df = spark.createDataFrame(
        [("a", v) for v in VALS], "g string, v double"
    )
    merged = ddsketch_merge(
        ddsketch_buckets(df.filter("v < 5"), "g", "v"),
        ddsketch_buckets(df.filter("v >= 5"), "g", "v"),
    )
    full = ddsketch_buckets(df, "g", "v")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_zero_bin_and_filters(spark):
    # zeros occupy bucket -1 (estimate 0.0); nulls and negatives are
    # filtered out entirely (the documented cusum-style contract)
    df = spark.createDataFrame(
        [("z", 0.0), ("z", 0.0), ("z", 8.0), ("z", None), ("z", -3.0)],
        "g string, v double",
    )
    b = {r["bucket"]: r["cnt"] for r in ddsketch_buckets(df, "g", "v").collect()}
    assert b[-1] == 2 and sum(b.values()) == 3
    got = {
        r["q"]: (r["est_value"], r["n_values"])
        for r in ddsketch_quantiles(df, "g", "v", (0.5, 1.0)).collect()
    }
    assert got[0.5] == (0.0, 3)  # median of {0, 0, 8} sits in the zero bin
    assert got[1.0][0] == pytest.approx(8.0, rel=0.02)


def test_small_values_are_exact_singletons(spark):
    # micro-values below 2^sub_bits get exact buckets: tiny values
    # quantize but never smear across a log bucket
    df = spark.createDataFrame(
        [("s", 1e-6), ("s", 3e-6), ("s", 3e-6)], "g string, v double"
    )
    got = {r["bucket"]: r["cnt"] for r in ddsketch_buckets(df, "g", "v").collect()}
    assert got == {1: 1, 3: 2}


def test_validation(spark):
    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError):
        ddsketch_quantiles(df, "g", "v", (0.0,))
    with pytest.raises(ValueError):
        ddsketch_buckets(df, "g", "v", sub_bits=0)
