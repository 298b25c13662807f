"""Streaming Misra-Gries: bounds correctness and wiring equivalence."""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from tube_spark.streaming.heavyhitters import (
    StreamingHeavyHitters,
    streaming_hot_keys,
)


@pytest.fixture(scope="module")
def stream_data(spark):
    rnd = random.Random(11)
    rows = []
    for i in range(30000):
        r = rnd.random()
        if r < 0.25:
            rows.append((i, "hot_a"))
        elif r < 0.40:
            rows.append((i, "hot_b"))
        else:
            rows.append((i, f"tail_{rnd.randrange(3000)}"))
    df = spark.createDataFrame(rows, "i long, k string")
    truth = Counter(k for _, k in rows)
    return df, truth


def test_bounds_and_presence(spark, stream_data, tmp_path):
    df, truth = stream_data
    n = sum(truth.values())
    hh = StreamingHeavyHitters(spark, str(tmp_path / "hh.json"), "k", k=64)
    for b in range(3):
        hh.process_batch(df.filter(F.col("i") % 3 == b).drop("i"))

    state = hh._load()
    assert state["n"] == n and len(state["counters"]) <= 64
    err = state["err"]
    present = state["counters"]

    # invariant: an absent key's true count never exceeds the error
    for key, cnt in truth.items():
        if key not in present:
            assert cnt <= err, f"{key} (count {cnt}) absent with err {err}"
    # bounds contain the truth for every present key
    for key, lo in present.items():
        assert lo <= truth[key] <= lo + err

    report = {r["k"]: r for r in hh.hot_keys(min_share=0.10).collect()}
    assert report["hot_a"]["guaranteed"] and report["hot_b"]["guaranteed"]
    assert all(
        r["min_count"] <= truth[k_] <= r["max_count"] for k_, r in report.items()
    )


def test_streaming_wiring_matches_replay(spark, stream_data, tmp_path):
    df, _ = stream_data
    src = str(tmp_path / "src")
    df.drop("i").write.parquet(src)

    p1 = str(tmp_path / "a.json")
    q = streaming_hot_keys(
        spark, src, p1, "k", k=32, checkpoint_dir=str(tmp_path / "ck")
    )
    q.awaitTermination(120)
    got = StreamingHeavyHitters(spark, p1, "k", 32)._load()
    assert got["n"] == df.count() and got["counters"]


def test_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="k must be positive"):
        StreamingHeavyHitters(spark, str(tmp_path / "x.json"), "k", k=0)
