"""Audio spectral features: sine-wave ground truth through the kernel."""

from __future__ import annotations

import math
import struct

import pytest

from tube_spark.operators.multimodal import (
    audio_spectral_features,
    spectral_features_wav,
)


def _wav(samples: list[int], sample_rate: int = 8000, channels: int = 1) -> bytes:
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * 2 * channels, 2 * channels, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _sine(freq: float, n: int, rate: int = 8000, amp: int = 10000) -> list[int]:
    return [int(amp * math.sin(2 * math.pi * freq * i / rate)) for i in range(n)]


def test_sine_dominant_frequency():
    rate, freq = 8000, 1000.0
    feat = spectral_features_wav(_wav(_sine(freq, 4000, rate), rate))
    assert feat["sample_rate"] == rate and feat["n_frames"] > 20
    bin_width = rate / 256  # frame=256
    assert abs(feat["dominant_hz"] - freq) <= bin_width
    assert abs(feat["spectral_centroid_hz"] - freq) <= 3 * bin_width
    assert feat["rms"] == pytest.approx(10000 / math.sqrt(2), rel=0.01)


def test_short_and_invalid_payloads():
    feat = spectral_features_wav(_wav(_sine(500, 100)))  # < one frame
    assert feat["n_frames"] == 0 and feat["dominant_hz"] == 0.0
    assert spectral_features_wav(b"not audio") is None
    assert spectral_features_wav(None) is None


def test_stereo_mono_mix():
    rate = 8000
    left = _sine(1000, 2000, rate)
    # interleave identical channels: mono mix must equal the mono case
    stereo = [s for v in left for s in (v, v)]
    mono = spectral_features_wav(_wav(left, rate))
    st = spectral_features_wav(_wav(stereo, rate, channels=2))
    assert st["dominant_hz"] == mono["dominant_hz"]
    assert st["rms"] == pytest.approx(mono["rms"], rel=1e-9)


def test_dataframe_kernel(spark):
    rows = [
        (1, bytearray(_wav(_sine(1000, 3000)))),
        (2, bytearray(_wav(_sine(2500, 3000)))),
        (3, bytearray(b"junk")),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    out = {r["doc_id"]: r for r in audio_spectral_features(df).collect()}
    assert abs(out[1]["dominant_hz"] - 1000) <= 8000 / 256
    assert abs(out[2]["dominant_hz"] - 2500) <= 8000 / 256
    assert out[3]["dominant_hz"] is None and out[4]["rms"] is None
