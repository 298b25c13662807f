"""Real nearest-neighbor BMP resize (operators/multimodal.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tube_spark.operators.multimodal import (
    bmp_stride,
    decode_bmp,
    resize_bmp,
    resize_images,
    synthesize_bmp,
    synthesize_media_col,
    synthesize_wav,
)


def _pixels(payload):
    meta = decode_bmp(payload)
    import struct
    offset, = struct.unpack_from("<I", payload, 10)
    stride = bmp_stride(meta["width"])
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * meta["height"], offset=offset)
    return rows.reshape(meta["height"], stride)[:, : 3 * meta["width"]].reshape(
        meta["height"], meta["width"], 3
    )


def test_resize_kernel_samples_exact_pixels():
    src = synthesize_bmp(7, width=8, height=6)
    out = resize_bmp(src, 4, 3)
    meta = decode_bmp(out)
    assert (meta["width"], meta["height"]) == (4, 3)
    sp, op = _pixels(src), _pixels(out)
    # nearest-neighbor: every output pixel must equal its source pixel
    ys = np.minimum(((np.arange(3) + 0.5) * 6 / 3).astype(int), 5)
    xs = np.minimum(((np.arange(4) + 0.5) * 8 / 4).astype(int), 7)
    assert (op == sp[ys][:, xs]).all()


def test_upscale_roundtrip_identity():
    src = synthesize_bmp(3, width=5, height=4)
    up = resize_bmp(src, 10, 8)
    back = resize_bmp(up, 5, 4)
    assert _pixels(back).tobytes() == _pixels(src).tobytes()


def test_non_bmp_returns_none():
    assert resize_bmp(synthesize_wav(1, 20), 4, 4) is None
    assert resize_bmp(b"junk", 4, 4) is None


def test_resize_images_operator(spark):
    base = spark.range(0, 20).select(F.col("id").alias("doc_id"))
    media = synthesize_media_col(base)  # id%4==0 AVI, other even BMP, odd WAV
    out = resize_images(media, 4, 3).collect()
    rows = {r["doc_id"]: r for r in out}
    assert len(rows) == 20
    for i in range(2, 20, 4):  # BMPs resized
        assert rows[i]["resized"] and (rows[i]["width"], rows[i]["height"]) == (4, 3)
        assert decode_bmp(bytes(rows[i]["media"]))["width"] == 4
    for i in range(1, 20, 2):  # WAVs pass through untouched
        assert not rows[i]["resized"] and rows[i]["width"] is None
    for i in range(0, 20, 4):  # AVIs pass through untouched
        assert not rows[i]["resized"] and rows[i]["width"] is None


def test_bad_dims():
    src = synthesize_bmp(1, 4, 4)
    import pyspark.sql  # noqa: F401
    with pytest.raises(ValueError):
        # operator-level validation (kernel itself has no spark dep)
        from tube_spark.operators.multimodal import resize_images as ri
        ri(None, 0, 4)
