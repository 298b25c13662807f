"""Streaming DDSketch maintenance: bit-exact batch equivalence under
any schedule, watermark replay skip, mapping freeze, wiring,
batch-identical quantile extraction."""

from __future__ import annotations

import pytest

from tube_spark.operators.ddsketch import ddsketch_buckets, ddsketch_quantiles
from tube_spark.streaming.ddsketch import StreamingDDSketch, streaming_ddsketch


def _mk(spark, rows):
    return spark.createDataFrame(rows, "g string, v double")


def _grid(df, gcol="g"):
    return {(r[gcol], r["bucket"]): r["cnt"] for r in df.collect()}


def _rows(n, phase=0):
    return [(f"g{(i + phase) % 3}", float((i * 7 + phase) % 500) / 3.0)
            for i in range(n)]


def test_any_schedule_matches_batch(spark, tmp_path):
    rows = _rows(600)
    sd = StreamingDDSketch(spark, str(tmp_path / "d.json"), "g", "v")
    for bid, (lo, hi) in enumerate([(0, 100), (100, 100), (100, 420), (420, 600)]):
        sd.process_batch(_mk(spark, rows[lo:hi]), bid)
    want = _grid(ddsketch_buckets(_mk(spark, rows), "g", "v"))
    assert _grid(sd.buckets()) == want
    # quantile extraction equals the batch operator on the full data
    got = {
        (r["g"], r["q"]): (r["est_value"], r["n_values"])
        for r in sd.quantiles((0.5, 0.9, 0.99)).collect()
    }
    batch = {
        (r["g"], r["q"]): (r["est_value"], r["n_values"])
        for r in ddsketch_quantiles(
            _mk(spark, rows), "g", "v", (0.5, 0.9, 0.99)
        ).collect()
    }
    assert got == batch


def test_watermark_skips_replayed_epoch(spark, tmp_path):
    sd = StreamingDDSketch(spark, str(tmp_path / "d.json"), "g", "v")
    b = _mk(spark, [("a", 3.5)] * 10)
    sd.process_batch(b, 0)
    once = _grid(sd.buckets())
    sd.process_batch(b, 0)  # at-least-once redelivery
    assert _grid(sd.buckets()) == once


def test_mapping_freeze(spark, tmp_path):
    sd = StreamingDDSketch(spark, str(tmp_path / "d.json"), "g", "v", sub_bits=5)
    sd.process_batch(_mk(spark, [("a", 1.0)]), 0)
    with pytest.raises(ValueError, match="frozen"):
        StreamingDDSketch(
            spark, str(tmp_path / "d.json"), "g", "v", sub_bits=6
        ).process_batch(_mk(spark, [("a", 2.0)]), 1)


def test_structured_streaming_wiring(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = _rows(300)
    _mk(spark, rows[:200]).write.parquet(src)
    q = streaming_ddsketch(
        spark, src, str(tmp_path / "d.json"), "g", "v",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    _mk(spark, rows[200:]).write.mode("append").parquet(src)
    q2 = streaming_ddsketch(
        spark, src, str(tmp_path / "d.json"), "g", "v",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    sd = StreamingDDSketch(spark, str(tmp_path / "d.json"), "g", "v")
    assert _grid(sd.buckets()) == _grid(
        ddsketch_buckets(_mk(spark, rows), "g", "v")
    )
