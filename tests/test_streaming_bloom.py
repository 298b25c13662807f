"""Streaming Bloom maintenance: bit-exact batch equivalence under any
schedule, idempotent replay, geometry freeze, gate guarantee over the
accumulated history, and the true Structured Streaming wiring."""

from __future__ import annotations

import pytest

from tube_spark.operators.bloomgate import bloom_build
from tube_spark.streaming.bloom import StreamingBloom, streaming_bloom


def _mk(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "value string")


def test_any_schedule_matches_batch_bitwise(spark, tmp_path):
    vals = [f"blocked-{i}" for i in range(400)]
    sb = StreamingBloom(spark, str(tmp_path / "b.json"), m_bits=1890, n_hashes=3)
    for lo, hi in [(0, 50), (50, 300), (300, 300), (300, 400)]:  # incl. empty
        sb.process_batch(_mk(spark, vals[lo:hi]))
    want = bloom_build(_mk(spark, vals), "value", 1890, 3)
    assert sb.words() == want


def test_replay_is_noop(spark, tmp_path):
    vals = [f"v-{i}" for i in range(100)]
    sb = StreamingBloom(spark, str(tmp_path / "b.json"), m_bits=630, n_hashes=2)
    batch = _mk(spark, vals)
    sb.process_batch(batch)
    once = sb.words()
    sb.process_batch(batch)  # at-least-once redelivery
    assert sb.words() == once


def test_geometry_freeze(spark, tmp_path):
    sb = StreamingBloom(spark, str(tmp_path / "b.json"), m_bits=630, n_hashes=2)
    sb.process_batch(_mk(spark, ["x"]))
    with pytest.raises(ValueError, match="geometry is frozen"):
        StreamingBloom(
            spark, str(tmp_path / "b.json"), m_bits=1260, n_hashes=2
        ).process_batch(_mk(spark, ["y"]))


def test_gate_covers_full_history(spark, tmp_path):
    """No false negative against ANYTHING ingested across batches."""
    sb = StreamingBloom(spark, str(tmp_path / "b.json"), m_bits=2520, n_hashes=3)
    sb.process_batch(_mk(spark, [f"old-{i}" for i in range(50)]))
    sb.process_batch(_mk(spark, [f"new-{i}" for i in range(50)]))
    corpus = _mk(
        spark,
        [f"old-{i}" for i in range(50)] + [f"new-{i}" for i in range(50)],
    )
    out = sb.gate(corpus, "value").collect()
    assert all(r["maybe_blocked"] for r in out)


def test_structured_streaming_wiring(spark, tmp_path):
    src = str(tmp_path / "src")
    vals = [f"s-{i}" for i in range(200)]
    _mk(spark, vals[:120]).write.parquet(src)
    q = streaming_bloom(
        spark,
        src,
        str(tmp_path / "b.json"),
        m_bits=1890,
        n_hashes=3,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    _mk(spark, vals[120:]).write.mode("append").parquet(src)
    q2 = streaming_bloom(
        spark,
        src,
        str(tmp_path / "b.json"),
        m_bits=1890,
        n_hashes=3,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    sb = StreamingBloom(spark, str(tmp_path / "b.json"), m_bits=1890, n_hashes=3)
    assert sb.words() == bloom_build(_mk(spark, vals), "value", 1890, 3)
