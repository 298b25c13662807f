"""Streaming A-ES reservoir: bit-exact equivalence to the batch
weighted sample under any schedule, idempotent redelivery, k/seed
freeze, wiring."""

from __future__ import annotations

import pytest

from tube_spark.operators.sampling import weighted_sample_k
from tube_spark.streaming.sample import StreamingSample, streaming_sample


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, weight double")


def _rows(lo, hi):
    return [(i, float(1 + i % 7)) for i in range(lo, hi)]


def _batch_sample(spark, rows, k):
    out = weighted_sample_k(_mk(spark, rows), "weight", k).collect()
    return [(r["doc_id"], r["sample_rank"]) for r in out]


def test_any_schedule_matches_batch(spark, tmp_path):
    k = 25
    ss = StreamingSample(spark, str(tmp_path / "s.json"), k=k)
    for lo, hi in [(0, 100), (100, 100), (100, 700), (700, 1000)]:
        ss.process_batch(_mk(spark, _rows(lo, hi)))
    got = [(r["doc_id"], r["sample_rank"]) for r in ss.sample().collect()]
    assert sorted(got, key=lambda t: t[1]) == _batch_sample(
        spark, _rows(0, 1000), k
    )


def test_redelivery_is_noop(spark, tmp_path):
    ss = StreamingSample(spark, str(tmp_path / "s.json"), k=10)
    b = _mk(spark, _rows(0, 50))
    ss.process_batch(b)
    once = ss.sample().collect()
    ss.process_batch(b)  # at-least-once redelivery: same ids, same keys
    assert ss.sample().collect() == once


def test_zero_weight_rows_excluded(spark, tmp_path):
    ss = StreamingSample(spark, str(tmp_path / "s.json"), k=10)
    ss.process_batch(
        spark.createDataFrame(
            [(1, 0.0), (2, -1.0), (3, 2.0)], "doc_id long, weight double"
        )
    )
    assert [r["doc_id"] for r in ss.sample().collect()] == [3]


def test_config_freeze(spark, tmp_path):
    ss = StreamingSample(spark, str(tmp_path / "s.json"), k=10)
    ss.process_batch(_mk(spark, _rows(0, 5)))
    with pytest.raises(ValueError, match="configured for"):
        StreamingSample(spark, str(tmp_path / "s.json"), k=20).process_batch(
            _mk(spark, _rows(5, 6))
        )


def test_structured_streaming_wiring(spark, tmp_path):
    src = str(tmp_path / "src")
    _mk(spark, _rows(0, 300)).write.parquet(src)
    q = streaming_sample(
        spark, src, str(tmp_path / "s.json"), k=15,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    _mk(spark, _rows(300, 500)).write.mode("append").parquet(src)
    q2 = streaming_sample(
        spark, src, str(tmp_path / "s.json"), k=15,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    ss = StreamingSample(spark, str(tmp_path / "s.json"), k=15)
    got = [(r["doc_id"], r["sample_rank"]) for r in ss.sample().collect()]
    assert sorted(got, key=lambda t: t[1]) == _batch_sample(
        spark, _rows(0, 500), 15
    )
