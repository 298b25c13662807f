"""Baseline JPEG codec: roundtrip error bounds, exactness cases,
restart markers, scope boundaries, and the frame-pixel-stats operator
over real entropy-coded MJPEG frames."""

from __future__ import annotations

import numpy as np
import pytest

from tube_spark.operators.jpeg import (
    STD_LUMA_QUANT,
    decode_baseline_jpeg,
    encode_baseline_jpeg,
    quality_scaled_quant,
)


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 / max(1, w - 1),
            yy * 255 / max(1, h - 1),
            (xx + yy) * 255 / max(1, w + h - 2),
        ],
        axis=-1,
    ).astype(np.uint8)


def test_roundtrip_error_bounds_444():
    img = _gradient(40, 56)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(img, quality=95))
    assert dec is not None and dec.shape == img.shape and dec.dtype == np.uint8
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 8 and err.mean() < 2.0


def test_roundtrip_error_bounds_420():
    img = _gradient(33, 47)  # odd dims exercise chroma padding
    dec = decode_baseline_jpeg(
        encode_baseline_jpeg(img, quality=90, subsampling="4:2:0")
    )
    assert dec is not None and dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 20 and err.mean() < 4.0


def test_flat_image_decodes_uniform():
    flat = np.full((16, 16, 3), 200, np.uint8)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(flat, quality=50))
    assert (dec == dec[0, 0]).all()
    assert abs(int(dec[0, 0, 0]) - 200) <= 2


def test_grayscale_roundtrip_near_exact():
    yy, xx = np.mgrid[0:24, 0:40]
    g = (xx * 255 // 39).astype(np.uint8)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(g, quality=95))
    assert dec.shape == (24, 40, 3)
    assert (dec[..., 0] == dec[..., 1]).all() and (dec[..., 1] == dec[..., 2]).all()
    assert np.abs(dec[..., 0].astype(int) - g.astype(int)).max() <= 2


def test_restart_markers_do_not_change_pixels():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    plain = decode_baseline_jpeg(encode_baseline_jpeg(img, quality=80))
    rst = decode_baseline_jpeg(
        encode_baseline_jpeg(img, quality=80, restart_interval=2)
    )
    assert (plain == rst).all()  # RST resets predictors, not pixels


def test_deterministic_bytes():
    img = _gradient(16, 16)
    assert encode_baseline_jpeg(img, 70) == encode_baseline_jpeg(img, 70)


def test_quality_scaling_monotone_size():
    img = _gradient(32, 32)
    sizes = [len(encode_baseline_jpeg(img, q)) for q in (10, 50, 95)]
    assert sizes[0] < sizes[1] < sizes[2]
    assert (quality_scaled_quant(STD_LUMA_QUANT, 50) == STD_LUMA_QUANT).all()


def test_out_of_scope_inputs_return_none():
    # header-only synthetic (no scan), garbage, truncation, progressive
    from tube_spark.operators.multimodal import synthesize_jpeg

    assert decode_baseline_jpeg(synthesize_jpeg(3, 32, 24)) is None
    assert decode_baseline_jpeg(b"not a jpeg") is None
    assert decode_baseline_jpeg(None) is None
    full = encode_baseline_jpeg(_gradient(16, 16), 75)
    assert decode_baseline_jpeg(full[:40]) is None
    # flip SOF0 -> SOF2 (progressive): out of documented scope
    prog = bytearray(full)
    idx = bytes(prog).find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    assert decode_baseline_jpeg(bytes(prog)) is None


def test_encoder_validation():
    with pytest.raises(ValueError):
        encode_baseline_jpeg(np.zeros((4, 4, 2), np.uint8))
    with pytest.raises(ValueError):
        encode_baseline_jpeg(np.zeros((4, 4, 3), np.uint8), subsampling="4:1:1")


def test_dispatch_point_decodes_baseline():
    from tube_spark.operators.multimodal import (
        decode_jpeg_pixels,
        synthesize_real_jpeg,
    )

    buf = synthesize_real_jpeg(5, 32, 24, quality=85)
    px = decode_jpeg_pixels(buf)
    assert px is not None and px.shape == (24, 32, 3)


def test_frame_pixel_stats_on_real_mjpeg(spark):
    from tube_spark.operators.multimodal import (
        decode_jpeg_pixels,
        frame_pixel_stats,
        parse_avi,
        synthesize_avi,
    )

    rows = [(i, synthesize_avi(i, 5, 32, 24, fps=10, real_frames=True))
            for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = frame_pixel_stats(df, every_ms=100).orderBy("doc_id", "frame_idx")
    out = got.collect()
    # 100 ms cadence at 10 fps samples every frame
    assert len(out) == 4 * 5
    assert all(r["decoded"] for r in out)
    assert all(r["width"] == 32 and r["height"] == 24 for r in out)
    # Spark-side stats equal a local decode of the same frame bytes
    raw = rows[1][1]
    avi = parse_avi(raw)
    off, size = avi["frames"][2]
    px = decode_jpeg_pixels(raw[off : off + size]).astype(np.float64)
    want_r = float(px[..., 0].mean())
    r = [x for x in out if x["doc_id"] == 1 and x["frame_idx"] == 2][0]
    assert r["mean_r"] == pytest.approx(want_r)
    assert 0.0 <= r["std_luma"] < 128.0
    assert r["ts_ms"] == 200


def test_frame_pixel_stats_header_only_frames_flagged(spark):
    from tube_spark.operators.multimodal import frame_pixel_stats, synthesize_avi

    df = spark.createDataFrame(
        [(1, synthesize_avi(7, 3, 32, 24, fps=10))], "doc_id long, media binary"
    )
    out = frame_pixel_stats(df, every_ms=100).collect()
    assert len(out) == 3
    assert all(not r["decoded"] for r in out)
    assert all(r["mean_r"] is None and r["width"] == 32 for r in out)
