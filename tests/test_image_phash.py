"""Perceptual image hashing + banded-Hamming image near-dup."""

from __future__ import annotations

import random
import struct

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.multimodal import (
    bmp_stride,
    image_near_duplicates,
    image_phash,
    phash_bmp,
)


def _bmp(width: int, height: int, pixels: list[int]) -> bytes:
    """Minimal bottom-up 24-bit BMP from a flat BGR byte list."""
    stride = bmp_stride(width)
    body = bytearray()
    for y in range(height):
        row = bytes(pixels[y * width * 3 : (y + 1) * width * 3])
        body += row + b"\x00" * (stride - len(row))
    header = b"BM" + struct.pack(
        "<IHHI", 54 + len(body), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 0, 0, 0, 0)
    return bytes(header + body)


def _random_image(seed: int, w: int = 48, h: int = 32) -> list[int]:
    rnd = random.Random(seed)
    # smooth image with seed-dependent STRUCTURE (gradient direction &
    # frequency), plus noise: a perceptual hash keys on the structure,
    # so different seeds give perceptually different images while small
    # per-pixel noise does not
    ax, ay = 2 + (seed * 3) % 7, 1 + (seed * 5) % 9
    return [
        min(255, max(0, (x * ax + y * ay) % (120 + 17 * seed % 100) + rnd.randrange(20)))
        for y in range(h)
        for x in range(w)
        for _ in range(3)
    ]


def test_phash_deterministic_and_noise_robust():
    base_px = _random_image(1)
    base = _bmp(48, 32, base_px)
    assert phash_bmp(base) == phash_bmp(base)

    rnd = random.Random(9)
    noisy_px = [min(255, max(0, v + rnd.randrange(-4, 5))) for v in base_px]
    noisy = _bmp(48, 32, noisy_px)
    other = _bmp(48, 32, _random_image(2))

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    d_noise = ham(phash_bmp(base), phash_bmp(noisy))
    d_other = ham(phash_bmp(base), phash_bmp(other))
    assert d_noise <= 6 < d_other


def test_phash_rejects_non_bmp():
    assert phash_bmp(None) is None
    assert phash_bmp(b"JFIF-not-bmp") is None
    assert phash_bmp(_bmp(4, 2, [0] * 24)[:-3]) is None  # truncated


def test_image_near_duplicates_pipeline(spark):
    base_px = _random_image(1)
    rnd = random.Random(5)
    noisy_px = [min(255, max(0, v + rnd.randrange(-4, 5))) for v in base_px]
    rows = [
        (1, bytearray(_bmp(48, 32, base_px))),
        (2, bytearray(_bmp(48, 32, noisy_px))),
        (3, bytearray(_bmp(48, 32, _random_image(7)))),
        (4, bytearray(b"not an image")),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")

    hashes = {r["doc_id"]: r["phash"] for r in image_phash(df).collect()}
    assert hashes[4] is None and hashes[5] is None
    assert hashes[1] is not None

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_duplicates(df, max_hamming=6, bands=8).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 6
    assert (1, 3) not in pairs and (2, 3) not in pairs
