"""Scene-cut detection: known scene structure, python-reference
distances, threshold behavior, non-AVI payloads."""

from __future__ import annotations

import numpy as np

from tube_spark.operators.multimodal import (
    detect_scene_cuts,
    parse_avi,
    synthesize_avi,
)


def _mk(spark, payloads):
    return spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "doc_id long, media binary"
    )


def _py_dists(payload):
    avi = parse_avi(payload)
    hists, sizes = [], []
    for off, size in avi["frames"]:
        body = np.frombuffer(payload, dtype=np.uint8, count=size, offset=off)
        hists.append(np.bincount(body, minlength=256))
        sizes.append(size)
    out = [0.0]
    for i in range(1, len(hists)):
        l1 = int(np.abs(hists[i] - hists[i - 1]).sum())
        out.append(round(l1 / float(sizes[i] + sizes[i - 1]), 6))
    return out


def test_known_scene_structure(spark):
    # 6 frames in scenes of 3: seeds [s,s,s,s+1,s+1,s+1] -> one cut at 3
    avi = synthesize_avi(7, 6, scene_len=3)
    rows = sorted(
        detect_scene_cuts(_mk(spark, [avi]), threshold=0.01).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["is_cut"] for r in rows] == [False, False, False, True, False, False]
    assert [r["scene_id"] for r in rows] == [0, 0, 0, 1, 1, 1]
    assert [r["ts_ms"] for r in rows] == [0, 100, 200, 300, 400, 500]
    # within-scene distance is exactly 0; the cut distance is positive
    assert rows[1]["dist_norm"] == 0.0 and rows[3]["dist_norm"] > 0.0


def test_distances_match_python_reference(spark):
    avi = synthesize_avi(19, 5, scene_len=2)
    rows = sorted(
        detect_scene_cuts(_mk(spark, [avi]), threshold=0.01).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["dist_norm"] for r in rows] == _py_dists(avi)


def test_threshold_one_means_one_scene(spark):
    avi = synthesize_avi(3, 6, scene_len=1)  # every frame distinct
    rows = detect_scene_cuts(_mk(spark, [avi]), threshold=1.0).collect()
    assert all(not r["is_cut"] and r["scene_id"] == 0 for r in rows)


def test_non_avi_payloads_emit_nothing(spark):
    df = _mk(spark, [b"not an avi", None])
    assert detect_scene_cuts(df).count() == 0
