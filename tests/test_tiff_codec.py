"""Baseline TIFF codec (operators/tiff.py): roundtrip differentials
across every supported axis (byte order x compression x strip layout x
photometric), PackBits hand-built streams, decode-bomb guards, and the
multimodal integration (decode_media dispatch, cross-format pHash
identity, the synthesize_tiff oracle contract)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tube_spark.operators.tiff import (
    _MAX_PIXELS,
    _packbits_decode,
    _packbits_encode,
    decode_tiff,
    encode_tiff,
    tiff_dimensions,
    tiff_ifd,
)


class TestRoundtrip:
    @pytest.mark.parametrize("comp", [1, 32773])
    @pytest.mark.parametrize("bo", ["II", "MM"])
    @pytest.mark.parametrize("rps", [None, 4])
    def test_rgb_exact(self, comp, bo, rps):
        rng = np.random.default_rng(comp * 7 + rps_seed(rps) + (bo == "MM"))
        for h, w in ((1, 1), (5, 7), (16, 9), (33, 2)):
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            buf = encode_tiff(px, compression=comp, byte_order=bo,
                              rows_per_strip=rps)
            assert tiff_dimensions(buf) == (w, h)
            assert np.array_equal(decode_tiff(buf), px)

    @pytest.mark.parametrize("comp", [1, 32773])
    @pytest.mark.parametrize("miw", [False, True])
    def test_gray_both_photometrics(self, comp, miw):
        """MinIsBlack roundtrips; MinIsWhite stores inverted samples
        and the decoder un-inverts — both land on the same RGB."""
        rng = np.random.default_rng(11)
        g = rng.integers(0, 256, (6, 9), dtype=np.uint8)
        buf = encode_tiff(g, compression=comp, min_is_white=miw)
        want = np.repeat(g[:, :, None], 3, axis=2)
        assert np.array_equal(decode_tiff(buf), want)
        # the stored photometric really differs
        tags = tiff_ifd(buf)
        assert tags[262] == [0 if miw else 1]

    def test_multi_strip_ragged_tail(self):
        """h not divisible by rows_per_strip: the last strip is short
        and reassembly is exact."""
        rng = np.random.default_rng(5)
        px = rng.integers(0, 256, (7, 4, 3), dtype=np.uint8)
        buf = encode_tiff(px, rows_per_strip=3)
        tags = tiff_ifd(buf)
        assert len(tags[273]) == 3  # ceil(7/3) strips
        assert np.array_equal(decode_tiff(buf), px)


def rps_seed(rps):
    return 0 if rps is None else rps


class TestPackBits:
    def test_spec_example(self):
        # TIFF 6.0 §9 / Apple PackBits worked example
        data = bytes.fromhex(
            "AAAAAA" "80002A" "AAAAAAAA" "80002A22"
            + "AA" * 10 + "28" * 6
        )
        enc = bytes.fromhex("FEAA" "0280002A" "FDAA" "0380002A22" "F7AA" "FB28")
        assert _packbits_decode(enc, len(data)) == data
        # and our encoder reproduces the same runs/literal split
        assert _packbits_encode(data) == enc

    def test_roundtrip_rows(self):
        for row in (b"", b"\x01", b"\x01" * 300, bytes(range(256)),
                    b"aabbbbccdddddddde"):
            enc = _packbits_encode(row)
            if row:
                assert _packbits_decode(enc, len(row)) == row
            else:
                assert enc == b""

    def test_hostile_truncation_and_shortfall(self):
        assert _packbits_decode(bytes([5, 1, 2]), 6) is None  # cut literal
        assert _packbits_decode(bytes([0, 7]), 5) is None  # too little
        assert _packbits_decode(bytes([129]), 2) is None  # run w/o byte
        # noop byte (128) is skipped per spec
        assert _packbits_decode(bytes([128, 0, 0x41]), 1) == b"A"

    def test_expansion_capped_at_need(self):
        """A stream declaring vastly more output than the strip needs
        stops at the pixel budget — the decode-bomb bound."""
        raw = bytes([129, 0xAB]) * 10_000  # would expand to 1.28 MB
        assert _packbits_decode(raw, 256) == bytes([0xAB]) * 256


class TestHostileInputs:
    def test_never_raises_on_cuts_and_mutations(self):
        rng = np.random.default_rng(0)
        base = encode_tiff(
            rng.integers(0, 256, (9, 9, 3), dtype=np.uint8),
            compression=32773,
        )
        for cut in range(0, len(base), 5):
            assert decode_tiff(base[:cut]) is None or cut >= len(base)
            tiff_ifd(base[:cut])
        for _ in range(300):
            m = bytearray(base)
            for _ in range(4):
                m[int(rng.integers(0, len(m)))] = int(rng.integers(0, 256))
            decode_tiff(bytes(m))  # any return; raising is the failure

    def test_pixel_bomb_rejected_before_allocation(self):
        """A header claiming 2^16 x 2^16 (4G px) is rejected at the
        dims guard — no canvas allocation happens."""
        buf = bytearray(encode_tiff(np.zeros((2, 2), np.uint8)))
        tags_off = 8
        n = struct.unpack_from("<H", buf, tags_off)[0]
        for i in range(n):
            base = tags_off + 2 + 12 * i
            tag = struct.unpack_from("<H", buf, base)[0]
            if tag in (256, 257):  # width/height LONG inline
                struct.pack_into("<I", buf, base + 8, 1 << 16)
        assert tiff_dimensions(bytes(buf)) == (1 << 16, 1 << 16)
        assert (1 << 32) > _MAX_PIXELS
        assert decode_tiff(bytes(buf)) is None

    def test_out_of_scope_degrades_to_none(self):
        """LZW compression (5) and 16-bit depth parse their IFD but
        return None from pixel decode — the degrade-to-header path."""
        buf = bytearray(encode_tiff(np.zeros((2, 2), np.uint8)))
        n = struct.unpack_from("<H", buf, 8)[0]
        for i in range(n):
            base = 8 + 2 + 12 * i
            tag = struct.unpack_from("<H", buf, base)[0]
            if tag == 259:
                struct.pack_into("<H", buf, base + 8, 5)  # LZW
        assert tiff_dimensions(bytes(buf)) == (2, 2)
        assert decode_tiff(bytes(buf)) is None


class TestMultimodalIntegration:
    def test_decode_media_dispatch(self):
        from tube_spark.operators.multimodal import decode_media

        rng = np.random.default_rng(3)
        px = rng.integers(0, 256, (5, 8, 3), dtype=np.uint8)
        meta = decode_media(encode_tiff(px, compression=32773))
        assert meta["kind"] == "image"
        assert (meta["width"], meta["height"]) == (8, 5)
        assert meta["value_mean"] == pytest.approx(float(px.mean()))

    def test_cross_format_phash_identity(self):
        """TIFF and PNG of identical pixels hash identically — the
        lossless-codec identity the near-dup screens rely on."""
        from tube_spark.operators.multimodal import phash_image
        from tube_spark.operators.png import encode_png

        rng = np.random.default_rng(8)
        px = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
        assert phash_image(encode_tiff(px)) == phash_image(encode_png(px))
        assert phash_image(
            encode_tiff(px, compression=32773, byte_order="MM")
        ) == phash_image(encode_png(px))

    def test_synthesize_tiff_oracle_contract(self):
        """The q_tiff_decode oracle: decoding the synthesized TIFF
        reproduces the closed-form channel arithmetic exactly, across
        the compression / byte-order / strip axes seed parity picks."""
        from tube_spark.operators.multimodal import synthesize_tiff

        for seed in (0, 1, 3, 5, 15, 30, 101):
            buf = synthesize_tiff(seed)
            w, h = seed % 9 + 2, seed % 6 + 2
            px = decode_tiff(buf)
            assert px.shape == (h, w, 3)
            p = np.arange(h * w)
            for c in range(3):
                want = ((seed * 17 + p * 23 + c * 29) % 256).reshape(h, w)
                assert np.array_equal(px[..., c], want), (seed, c)


def _build_tiff_4bit(w, h, vals, photo=1, colormap=None):
    """Hand-assembled little-endian single-strip 4-bit TIFF: MSB-first
    nibbles, byte-aligned rows; optional 16-entry ColorMap (photo 3)."""
    row_bytes = (w + 1) // 2
    data = bytearray()
    for r in range(h):
        for i in range(0, w, 2):
            hi = vals[r][i] << 4
            lo = vals[r][i + 1] if i + 1 < w else 0
            data.append(hi | lo)
    entries = [
        (256, 4, 1, [w]), (257, 4, 1, [h]), (258, 3, 1, [4]),
        (259, 3, 1, [1]), (262, 3, 1, [photo]),
        (273, 4, 1, None),  # strip offset patched below
        (277, 3, 1, [1]), (278, 4, 1, [h]), (279, 4, 1, [len(data)]),
    ]
    ext = b""
    if colormap is not None:
        entries.append((320, 3, 48, "ext"))
        ext = struct.pack(
            "<48H", *(v * 257 for ch in zip(*colormap) for v in ch)
        )
    entries.sort()
    ifd_size = 2 + 12 * len(entries) + 4
    ext_off = 8 + ifd_size
    data_off = ext_off + len(ext)
    out = bytearray(b"II" + struct.pack("<HI", 42, 8))
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack("<HHI", tag, typ, cnt)
        if val == "ext":
            out += struct.pack("<I", ext_off)
        elif val is None:
            out += struct.pack("<I", data_off)
        else:
            fmt = {3: "H", 4: "I"}[typ]
            cell = struct.pack("<" + fmt * cnt, *val)
            out += cell + b"\x00" * (4 - len(cell))
    out += struct.pack("<I", 0)
    out += ext + data
    return bytes(out)


class TestPaletteAndSubByte:
    def test_palette_roundtrip_through_encoder(self):
        rng = np.random.default_rng(2)
        pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
        idx = rng.integers(0, 256, (7, 9), dtype=np.uint8)
        for comp in (1, 32773):
            for bo in ("II", "MM"):
                buf = encode_tiff(idx, compression=comp, byte_order=bo,
                                  palette=pal)
                assert np.array_equal(decode_tiff(buf), pal[idx]), (comp, bo)
        # short palettes pad with zeros; out-of-range indices rejected
        pal16 = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        idx16 = rng.integers(0, 16, (5, 5), dtype=np.uint8)
        assert np.array_equal(
            decode_tiff(encode_tiff(idx16, palette=pal16)), pal16[idx16]
        )
        with pytest.raises(ValueError, match="outside the palette"):
            encode_tiff(np.full((2, 2), 16, np.uint8), palette=pal16)

    def test_4bit_gray_hand_built(self):
        """MSB-first nibble unpack with byte-aligned rows (odd width
        pads the last nibble) and the x17 gray scaling."""
        vals = [[1, 15, 7], [0, 8, 3]]
        buf = _build_tiff_4bit(3, 2, vals)
        got = decode_tiff(buf)
        want = (np.array(vals, np.uint8) * 17)
        assert np.array_equal(got, np.repeat(want[:, :, None], 3, axis=2))
        # MinIsWhite inverts AFTER scaling
        miw = decode_tiff(_build_tiff_4bit(3, 2, vals, photo=0))
        assert np.array_equal(miw[..., 0], 255 - want)

    def test_4bit_palette_hand_built(self):
        pal = [(i * 16, 255 - i * 16, (i * 37) % 256) for i in range(16)]
        vals = [[0, 15, 3, 8], [7, 1, 12, 2]]
        buf = _build_tiff_4bit(4, 2, vals, photo=3, colormap=pal)
        got = decode_tiff(buf)
        want = np.array([[pal[v] for v in row] for row in vals], np.uint8)
        assert np.array_equal(got, want)

    def test_colormap_size_mismatch_rejected(self):
        """A palette image whose ColorMap does not hold 3*2^bits
        entries degrades to None (header dims survive)."""
        pal = [(0, 0, 0)] * 16
        buf = bytearray(_build_tiff_4bit(4, 2, [[0] * 4] * 2, photo=3,
                                         colormap=pal))
        # shrink the declared colormap count
        n = struct.unpack_from("<H", buf, 8)[0]
        for i in range(n):
            base = 8 + 2 + 12 * i
            if struct.unpack_from("<H", buf, base)[0] == 320:
                struct.pack_into("<I", buf, base + 4, 24)
        assert tiff_dimensions(bytes(buf)) == (4, 2)
        assert decode_tiff(bytes(buf)) is None
