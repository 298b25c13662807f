"""Streaming CMS maintenance: bit-exact batch equivalence under any
schedule, watermark replay skip, geometry freeze, wiring."""

from __future__ import annotations

import pytest

from tube_spark.operators.cms import cms_build
from tube_spark.streaming.cms import StreamingCms, streaming_cms


def _mk(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "value string")


def _grid_dict(df):
    return {(r["r"], r["b"]): r["c"] for r in df.collect()}


def test_any_schedule_matches_batch(spark, tmp_path):
    vals = [f"k-{i % 37}" for i in range(500)]
    sc = StreamingCms(spark, str(tmp_path / "c.json"), width=64, depth=3)
    for bid, (lo, hi) in enumerate([(0, 80), (80, 80), (80, 350), (350, 500)]):
        sc.process_batch(_mk(spark, vals[lo:hi]), bid)
    want = _grid_dict(cms_build(_mk(spark, vals), "value", 64, 3))
    assert _grid_dict(sc.grid()) == want
    # estimates flow through the shared expression
    probes = _mk(spark, [f"k-{i}" for i in range(5)])
    est = {r["value"]: r["est"] for r in sc.estimate(probes, "value").collect()}
    truth = {f"k-{i}": len([v for v in vals if v == f"k-{i}"]) for i in range(5)}
    assert all(est[k] >= truth[k] for k in truth)


def test_watermark_skips_replayed_epoch(spark, tmp_path):
    sc = StreamingCms(spark, str(tmp_path / "c.json"), width=64, depth=2)
    b = _mk(spark, ["x"] * 10)
    sc.process_batch(b, 0)
    once = _grid_dict(sc.grid())
    sc.process_batch(b, 0)  # at-least-once redelivery
    assert _grid_dict(sc.grid()) == once


def test_geometry_freeze(spark, tmp_path):
    sc = StreamingCms(spark, str(tmp_path / "c.json"), width=64, depth=2)
    sc.process_batch(_mk(spark, ["x"]), 0)
    with pytest.raises(ValueError, match="geometry is frozen"):
        StreamingCms(
            spark, str(tmp_path / "c.json"), width=128, depth=2
        ).process_batch(_mk(spark, ["y"]), 1)


def test_structured_streaming_wiring(spark, tmp_path):
    src = str(tmp_path / "src")
    vals = [f"s-{i % 11}" for i in range(300)]
    _mk(spark, vals[:200]).write.parquet(src)
    q = streaming_cms(
        spark, src, str(tmp_path / "c.json"), width=64, depth=3,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    _mk(spark, vals[200:]).write.mode("append").parquet(src)
    q2 = streaming_cms(
        spark, src, str(tmp_path / "c.json"), width=64, depth=3,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    sc = StreamingCms(spark, str(tmp_path / "c.json"), width=64, depth=3)
    assert _grid_dict(sc.grid()) == _grid_dict(
        cms_build(_mk(spark, vals), "value", 64, 3)
    )
