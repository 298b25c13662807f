"""CUSUM change-point detection: recursion-equivalence to the textbook
form, shift detection, constant series, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.changepoint import cusum_changepoints


def _df(spark, rows):
    return spark.createDataFrame(rows, "s string, ts long, x double")


def _py_cusum(xs, k, h):
    mu = round(sum(xs) / len(xs), 6)
    var = sum((x - mu) ** 2 for x in xs) / len(xs)
    sigma = round(var ** 0.5, 6)
    s_hi = s_lo = 0.0
    out = []
    for x in xs:
        s_hi = max(0.0, s_hi + (x - mu - k * sigma))
        s_lo = max(0.0, s_lo + (mu - x - k * sigma))
        out.append(
            (round(s_hi, 6), round(s_lo, 6), s_hi > h * sigma, s_lo > h * sigma)
        )
    return out


def test_matches_textbook_recursion(spark):
    xs = [10.0, 10.5, 9.5, 10.2, 14.0, 14.5, 13.8, 14.2, 9.9, 10.1]
    df = _df(spark, [("a", i, x) for i, x in enumerate(xs)])
    got = [
        (r["s_hi"], r["s_lo"], r["alarm_hi"], r["alarm_lo"])
        for r in cusum_changepoints(df, "s", "ts", "x", k=0.5, h=2.0)
        .orderBy("ts")
        .collect()
    ]
    want = _py_cusum(xs, 0.5, 2.0)
    # micro-unit quantization: drift bounded by n/2 * 1e-6
    for (gh, gl, gah, gal), (wh, wl, wah, wal) in zip(got, want):
        assert abs(gh - wh) < 1e-4 and abs(gl - wl) < 1e-4
        assert gah == wah and gal == wal


def test_sustained_shift_alarms_upward_only(spark):
    # 50 points at ~10, then a SHORT +2 shift (12 points): the global
    # baseline stays near the long regime, so only the upward side
    # accumulates — the sustained-shift case a pointwise test misses
    xs = [10.0 + 0.1 * ((i * 7) % 5 - 2) for i in range(50)]
    xs += [12.0 + 0.1 * ((i * 7) % 5 - 2) for i in range(12)]
    df = _df(spark, [("m", i, x) for i, x in enumerate(xs)])
    rows = (
        cusum_changepoints(df, "s", "ts", "x", k=0.5, h=4.0)
        .orderBy("ts")
        .collect()
    )
    # textbook-recursion equivalence on the full trajectory
    want = _py_cusum(xs, 0.5, 4.0)
    got = [(r["s_hi"], r["s_lo"], r["alarm_hi"], r["alarm_lo"]) for r in rows]
    for (gh, gl, gah, gal), (wh, wl, wah, wal) in zip(got, want):
        assert abs(gh - wh) < 1e-4 and abs(gl - wl) < 1e-4
        assert gah == wah and gal == wal
    # no upward alarm in the stable regime; alarm inside the shift;
    # never a downward alarm after the shift begins
    assert not any(r["alarm_hi"] for r in rows[:50])
    assert any(r["alarm_hi"] for r in rows[50:])
    assert not any(r["alarm_lo"] for r in rows[50:])
    first_alarm = next(i for i, r in enumerate(rows) if r["alarm_hi"])
    assert 50 <= first_alarm <= 58  # detection lag bounded


def test_constant_series_never_alarms(spark):
    df = _df(spark, [("c", i, 5.0) for i in range(20)])
    rows = cusum_changepoints(df, "s", "ts", "x").collect()
    assert all(
        r["s_hi"] == 0.0 and r["s_lo"] == 0.0
        and not r["alarm_hi"] and not r["alarm_lo"]
        for r in rows
    )


def test_multiple_series_independent(spark):
    shifted = [("up", i, 1.0 if i < 10 else 3.0) for i in range(20)]
    stable = [("flat", i, float((i * 3) % 4)) for i in range(20)]
    rows = cusum_changepoints(
        _df(spark, shifted + stable), "s", "ts", "x", k=0.5, h=3.0
    ).collect()
    by = {}
    for r in rows:
        by.setdefault(r["s"], []).append(r)
    assert any(r["alarm_hi"] for r in by["up"])
    assert not any(r["alarm_hi"] or r["alarm_lo"] for r in by["flat"])


def test_validation(spark):
    df = _df(spark, [("a", 0, 1.0)])
    with pytest.raises(ValueError):
        cusum_changepoints(df, "s", "ts", "x", k=-1)
    with pytest.raises(ValueError):
        cusum_changepoints(df, "s", "ts", "x", h=0)


def test_null_values_filtered_like_streaming_twin(spark):
    # null-value rows are dropped up front (matching StreamingCUSUM's
    # per-batch filter) — they neither appear in the output nor shift
    # the baseline, so batch == batch-on-prefiltered-data
    xs = [10.0, 10.5, None, 9.5, 10.2, None, 14.0]
    df = spark.createDataFrame(
        [("a", i, x) for i, x in enumerate(xs)], "s string, ts long, x double"
    )
    clean = df.filter(F.col("x").isNotNull())
    got = cusum_changepoints(df, "s", "ts", "x", k=0.5, h=2.0).orderBy("ts")
    want = cusum_changepoints(clean, "s", "ts", "x", k=0.5, h=2.0).orderBy("ts")
    assert got.collect() == want.collect()
    assert got.count() == sum(1 for x in xs if x is not None)
