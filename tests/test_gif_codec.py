"""GIF codec (operators/gif.py): LZW exactness across code widths and
table resets, interlace, transparency + disposal compositing, hostile
inputs, and the multimodal dispatch (decode_media / phash_image)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tube_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
    gif_dimensions,
)


def _pal(n, seed=7):
    return np.random.default_rng(seed).integers(0, 256, (n, 3), dtype=np.uint8)


def _idx(h, w, hi, seed=9):
    return np.random.default_rng(seed).integers(0, hi, (h, w), dtype=np.uint8)


@pytest.mark.parametrize(
    "mcs,hi,n",
    [
        (2, 4, 50),
        (2, 4, 5000),       # width growth through 12 bits
        (4, 13, 4000),
        (8, 256, 60000),    # full byte alphabet
        (4, 16, 200000),    # multiple 4096-entry table resets
    ],
)
def test_lzw_roundtrip_exact(mcs, hi, n):
    seq = np.random.default_rng(3).integers(0, hi, n, dtype=np.uint8)
    assert np.array_equal(_lzw_decode(_lzw_encode(seq, mcs), mcs, n), seq)


def test_lzw_corrupt_streams_return_none():
    seq = np.arange(64, dtype=np.uint8) % 13
    enc = _lzw_encode(seq, 4)
    assert _lzw_decode(enc[: len(enc) // 2], 4, 64) is None  # short
    assert _lzw_decode(b"", 4, 10) is None
    assert _lzw_decode(enc, 1, 64) is None  # bad min code size


def test_single_frame_roundtrip_exact():
    pal = _pal(13)
    idx = _idx(17, 23, 13)
    buf = encode_gif([idx], pal)
    assert gif_dimensions(buf) == (23, 17)
    assert np.array_equal(decode_gif(buf), pal[idx])


def test_interlaced_roundtrip_exact():
    pal = _pal(13)
    for h in (1, 2, 5, 8, 17):  # pass boundaries
        idx = _idx(h, 9, 13, seed=h)
        buf = encode_gif([idx], pal, interlace=True)
        assert np.array_equal(decode_gif(buf), pal[idx]), h


def test_256_color_and_table_reset_frame():
    pal = _pal(256)
    idx = _idx(200, 300, 256)
    assert np.array_equal(decode_gif(encode_gif([idx], pal)), pal[idx])


def test_animation_transparency_and_disposal_background():
    pal = _pal(13)
    f0 = _idx(10, 12, 13, seed=1)
    f1 = _idx(4, 5, 13, seed=2)
    buf = encode_gif(
        [f0, (f1, 3, 2), (f1, 0, 0)], pal,
        delays_ms=[40, 20, 30], transparent=5, disposal=[0, 2, 0], loop=0,
    )
    frames = decode_gif_frames(buf)
    assert len(frames) == 3
    assert [d for _, d in frames] == [40, 20, 30]
    # reference compositing in plain numpy
    canvas = np.empty((10, 12, 3), np.uint8)
    canvas[:] = pal[0]  # background color index 0
    m0 = f0 != 5
    canvas[m0] = pal[f0[m0]]
    assert np.array_equal(frames[0][0], canvas)
    c1 = canvas.copy()
    reg = c1[2:6, 3:8]
    m1 = f1 != 5
    reg[m1] = pal[f1[m1]]
    assert np.array_equal(frames[1][0], c1)
    c2 = canvas.copy()
    c2[2:6, 3:8] = pal[0]  # disposal 2: region restored to background
    reg = c2[0:4, 0:5]
    reg[m1] = pal[f1[m1]]
    assert np.array_equal(frames[2][0], c2)


def test_disposal_restore_previous():
    pal = _pal(13)
    f0 = _idx(10, 12, 13, seed=1)
    f1 = _idx(4, 5, 13, seed=2)
    buf = encode_gif([f0, (f1, 1, 1), (f1, 6, 5)], pal, disposal=[0, 3, 0])
    fr = decode_gif_frames(buf)
    c0 = pal[f0]
    assert np.array_equal(fr[0][0], c0)
    c1 = c0.copy()
    c1[1:5, 1:6] = pal[f1]
    assert np.array_equal(fr[1][0], c1)
    c2 = c0.copy()  # frame-1 region restored to what preceded it
    c2[5:9, 6:11] = pal[f1]
    assert np.array_equal(fr[2][0], c2)


def test_local_color_table_overrides_global():
    """Hand-built stream: frame carries an LCT that differs from the
    GCT — pixels must come from the LCT."""
    gct = np.zeros((2, 3), np.uint8)
    lct = np.array([[10, 20, 30], [200, 100, 50]], np.uint8)
    idx = np.array([[0, 1], [1, 0]], np.uint8)
    lzw = _lzw_encode(idx.reshape(-1), 2)
    buf = bytearray(b"GIF89a")
    buf += struct.pack("<HH", 2, 2) + bytes([0x80, 0, 0]) + gct.tobytes()
    buf += b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2)
    buf += bytes([0x80])  # LCT present, 2 entries
    buf += lct.tobytes()
    buf += bytes([2])  # min code size
    buf += bytes([len(lzw)]) + lzw + b"\x00" + b"\x3b"
    assert np.array_equal(decode_gif(bytes(buf)), lct[idx])


def test_gif87a_and_skipped_extensions():
    """87a signature decodes; comment/application extensions skip."""
    pal = _pal(4)
    idx = _idx(3, 3, 4)
    buf = bytearray(encode_gif([idx], pal, loop=3))  # has NETSCAPE ext
    buf[:6] = b"GIF89a"
    assert np.array_equal(decode_gif(bytes(buf)), pal[idx])
    buf87 = bytearray(encode_gif([idx], pal))
    buf87[:6] = b"GIF87a"
    assert np.array_equal(decode_gif(bytes(buf87)), pal[idx])


def test_hostile_inputs_never_raise():
    pal = _pal(13)
    buf = encode_gif([_idx(9, 9, 13)], pal)
    assert decode_gif(None) is None
    assert decode_gif(b"GIF89a") is None
    for cut in (5, 12, 30, len(buf) // 2, len(buf) - 2):
        decode_gif(buf[:cut])  # must not raise
    rng = np.random.default_rng(5)
    for _ in range(60):
        b = bytearray(buf)
        for _ in range(6):
            b[int(rng.integers(6, len(b)))] = int(rng.integers(0, 256))
        decode_gif(bytes(b))  # must not raise
    bomb = bytearray(buf)
    bomb[6:10] = b"\xff\xff\xff\xff"  # 65535x65535 screen
    assert decode_gif(bytes(bomb)) is None


def test_hostile_frame_count_capped():
    """A stream repeating one tiny frame thousands of times stops at
    _MAX_FRAMES instead of compositing forever."""
    from tube_spark.operators import gif as G

    pal = _pal(4)
    idx = np.zeros((1, 1), np.uint8)
    one = encode_gif([idx], pal)
    # splice the image block (0x2C..before trailer) many times
    img_at = one.index(b"\x2c")
    img = one[img_at:-1]
    hostile = one[:img_at] + img * (G._MAX_FRAMES + 50) + b"\x3b"
    frames = decode_gif_frames(bytes(hostile))
    assert frames is not None and len(frames) == G._MAX_FRAMES


def test_encoder_validation():
    pal = _pal(4)
    with pytest.raises(ValueError, match="palette"):
        encode_gif([np.zeros((2, 2), np.uint8)], np.zeros((300, 3), np.uint8))
    with pytest.raises(ValueError, match="index outside"):
        encode_gif([np.full((2, 2), 9, np.uint8)], pal)
    with pytest.raises(ValueError, match="exceeds"):
        encode_gif(
            [np.zeros((4, 4), np.uint8), (np.zeros((3, 3), np.uint8), 3, 3)],
            pal,
        )
    with pytest.raises(ValueError, match="at least one"):
        encode_gif([], pal)


def test_decode_media_and_phash_dispatch():
    """multimodal integration: decode_media classifies single-frame
    GIF as image and animation as video with summed duration; GIF and
    BMP of identical pixels hash identically."""
    from tube_spark.operators.multimodal import decode_media, phash_image
    from tube_spark.operators.png import encode_png

    pal = _pal(16, seed=21)
    idx = _idx(24, 32, 16, seed=22)
    single = encode_gif([idx], pal)
    meta = decode_media(single)
    assert meta["kind"] == "image" and (meta["width"], meta["height"]) == (32, 24)
    assert meta["value_mean"] == pytest.approx(float(pal[idx].mean()))

    anim = encode_gif([idx, idx], pal, delays_ms=[30, 50])
    meta2 = decode_media(anim)
    assert meta2["kind"] == "video" and meta2["duration_ms"] == 80

    # cross-format pHash identity on the same pixels (GIF is lossless
    # given the palette; PNG is lossless period)
    px = pal[idx]
    assert phash_image(single) == phash_image(encode_png(px))


def test_webp_header_dims_parse():
    """WebP header walk (multimodal.webp_dimensions): VP8X / VP8L /
    VP8-keyframe variants, hand-built per RFC 9649 — the degrade-to-
    header path for the format whose pixel decode is out of scope."""
    import struct as st

    from tube_spark.operators.multimodal import decode_media, webp_dimensions

    def riff(chunks):
        body = b"WEBP"
        for fourcc, payload in chunks:
            body += fourcc + st.pack("<I", len(payload)) + payload
            if len(payload) % 2:
                body += b"\x00"
        return b"RIFF" + st.pack("<I", len(body)) + body

    # VP8X: canvas 320x240 -> stored minus-one 24-bit LE
    vp8x = bytes([0x08, 0, 0, 0]) + (319).to_bytes(3, "little") + (
        239
    ).to_bytes(3, "little")
    assert webp_dimensions(riff([(b"VP8X", vp8x)])) == (320, 240)
    # VP8L: signature byte + 14+14 bit packed dims
    bits = (17 - 1) | ((9 - 1) << 14)
    vp8l = bytes([0x2F]) + bits.to_bytes(4, "little")
    assert webp_dimensions(riff([(b"VP8L", vp8l)])) == (17, 9)
    # VP8 lossy keyframe: frame tag (keyframe: bit0=0) + start code + dims
    vp8 = bytes([0x00, 0x00, 0x00]) + b"\x9d\x01\x2a" + st.pack(
        "<HH", 64, 48
    )
    assert webp_dimensions(riff([(b"VP8 ", vp8)])) == (64, 48)
    # interframe / bad start code / truncation -> None
    assert webp_dimensions(riff([(b"VP8 ", bytes([1]) + vp8[1:])])) is None
    assert webp_dimensions(riff([(b"VP8 ", vp8[:5])])) is None
    assert webp_dimensions(b"RIFF\x00\x00\x00\x00WEBP") is None
    # decode_media: header dims, NULL value_mean (degrade contract)
    meta = decode_media(riff([(b"VP8X", vp8x)]))
    assert meta["kind"] == "image" and meta["width"] == 320
    assert meta["value_mean"] is None


def test_gif_frame_stats_spark(spark):
    """Distributed per-frame stats over animated GIFs: every composited
    frame's channel means equal the local decode, timestamps cumulate
    delays, undecodable payloads emit no rows."""
    import numpy as np

    from tube_spark.operators.multimodal import gif_frame_stats

    pal = _pal(8, seed=31)
    f0 = _idx(6, 8, 8, seed=32)
    f1 = _idx(6, 8, 8, seed=33)
    anim = encode_gif([f0, f1], pal, delays_ms=[40, 60])
    single = encode_gif([f1], pal)
    rows = [
        (1, bytearray(anim)),
        (2, bytearray(single)),
        (3, bytearray(b"GIF89a garbage")),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    out = gif_frame_stats(df, "doc_id", "media").collect()
    by_key = {(r["doc_id"], r["frame_idx"]): r for r in out}
    assert set(by_key) == {(1, 0), (1, 1), (2, 0)}
    assert by_key[(1, 0)]["ts_ms"] == 0 and by_key[(1, 1)]["ts_ms"] == 40
    want0 = pal[f0].astype(np.float64)
    assert by_key[(1, 0)]["mean_r"] == pytest.approx(want0[..., 0].mean())
    assert by_key[(1, 1)]["mean_b"] == pytest.approx(
        float(pal[f1][..., 2].mean())
    )
    assert by_key[(2, 0)]["width"] == 8 and by_key[(2, 0)]["decoded"]


def test_truncated_extension_returns_none_not_desync():
    """A comment extension whose sub-block chain runs off the buffer
    must return None rather than desyncing the block walk."""
    pal = _pal(4)
    buf = bytearray(encode_gif([_idx(3, 3, 4)], pal))
    # splice a comment extension with a size byte pointing past the end
    at = buf.index(b"\x2c")
    hostile = bytes(buf[:at]) + b"\x21\xfe\xff" + bytes(buf[at : at + 4])
    assert decode_gif(hostile) is None


def test_encoder_length_validation():
    pal = _pal(4)
    frames = [_idx(2, 2, 4), _idx(2, 2, 4)]
    with pytest.raises(ValueError, match="match the frame count"):
        encode_gif(frames, pal, delays_ms=[10])
    with pytest.raises(ValueError, match="match the frame count"):
        encode_gif(frames, pal, disposal=[0, 1, 2])


def test_synthesize_gif_matches_arithmetic():
    """The oracle contract of q_gif_decode: decoding the synthesized
    GIF reproduces the closed-form palette arithmetic exactly."""
    import numpy as np

    from tube_spark.operators.multimodal import synthesize_gif

    for seed in (0, 1, 7, 40, 101):
        frames = decode_gif_frames(synthesize_gif(seed))
        w, h = seed % 9 + 2, seed % 6 + 2
        assert len(frames) == 2
        assert frames[0][1] == (seed % 20 + 1) * 10
        p = np.arange(h * w)
        for f, (px, _) in enumerate(frames):
            assert px.shape == (h, w, 3)
            for c in range(3):
                want = np.mean(
                    (seed * 11 + ((seed * 13 + f * 4 + p * 29) % 8) * 37
                     + c * 71) % 256
                )
                assert abs(px[..., c].mean() - want) < 1e-12


def _pack_codes(codes, width):
    """LSB-first LZW bit packing (the GIF wire order)."""
    acc = nbits = 0
    out = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _bomb_gif(w, h, n_frames, delay_cs=20):
    """Hand-built hostile animation: a w*h logical screen whose frames
    are all 1x1 — a few hundred bytes of input that would composite
    n_frames full-screen canvases."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80, 0, 0])  # GCT flag, 2 entries
    out += bytes([10, 20, 30, 40, 50, 60])
    one_px = _pack_codes([4, 0, 5], 3)  # clear, index 0, end @ width 3
    for _ in range(n_frames):
        out += bytes([0x21, 0xF9, 0x04, 0x00]) + struct.pack("<H", delay_cs)
        out += bytes([0x00, 0x00])  # no transparency; terminator
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, 1, 1) + b"\x00"
        out += bytes([2, len(one_px)]) + one_px + b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_animation_decode_bomb_budget():
    """ADVICE r13 (high): tiny input, large screen, many sub-frames —
    the cumulative decoded-output budget must stop compositing once
    total output pixels exceed _MAX_PIXELS, instead of multiplying
    memory without bound (4.7 KB -> 603 MB measured pre-fix)."""
    from tube_spark.operators.gif import _MAX_PIXELS, decode_gif_frames

    w = h = 4096  # 16.7M px/frame, 1/4 of the budget
    buf = _bomb_gif(w, h, 16)
    assert len(buf) < 1000
    frames = decode_gif_frames(buf)
    assert frames is not None
    assert len(frames) == _MAX_PIXELS // (w * h) == 4
    assert frames[0][0].shape == (h, w, 3)
    assert frames[0][1] == 200  # the GCE delay still lands


def test_frame_delays_structural_scan():
    """gif_frame_delays: delay-exact vs the pixel decoder on
    well-formed animations; full frame count on a budget-capped bomb
    (no compositing); None on structural corruption."""
    from tube_spark.operators.gif import decode_gif_frames, gif_frame_delays

    pal = _pal(8, seed=31)
    frames = [_idx(6, 7, 8, seed=s) for s in range(5)]
    buf = encode_gif(frames, pal, delays_ms=[10, 20, 30, 40, 50])
    assert gif_frame_delays(buf) == [d for _, d in decode_gif_frames(buf)]

    bomb = _bomb_gif(4096, 4096, 16, delay_cs=7)
    assert gif_frame_delays(bomb) == [70] * 16  # all 16, not just 4

    assert gif_frame_delays(buf[:20]) is None  # truncated stream
    assert gif_frame_delays(b"not a gif") is None
    # unknown block marker desyncs the walk: reject like the decoder
    corrupt = bytearray(buf)
    corrupt[13 + 3 * 8] = 0x55  # first block marker after the GCT
    assert gif_frame_delays(bytes(corrupt)) is None


def test_meta_bomb_is_header_cost():
    """decode_gif_meta on a decode bomb: duration/kind from the
    structural scan (all frames), value_mean from ONE composited
    frame — never a canvas copy per sub-frame."""
    from tube_spark.operators.multimodal import decode_gif_meta

    bomb = _bomb_gif(4096, 4096, 16, delay_cs=20)
    m = decode_gif_meta(bomb)
    assert m["kind"] == "video"
    assert m["duration_ms"] == 16 * 200
    assert (m["width"], m["height"]) == (4096, 4096)
    # canvas = bg = GCT[0] = (10,20,30) everywhere; the 1x1 frame draws
    # the same entry -> mean over channels is 20
    assert m["value_mean"] == pytest.approx(20.0)
