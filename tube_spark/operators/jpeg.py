"""Baseline JPEG codec — pure numpy/stdlib, no codec library.

Completes the multimodal codec boundary (COVERAGE.md): the container
walks in ``operators/multimodal.py`` (AVI demux, SOF dimension parse)
stop at the entropy-coded scan; this module decodes it.  Reference
parity note: the reference engine has no media path at all — this is
part of the training-data-pipeline surface (frame pixel statistics,
perceptual hashing over real frames) built Spark-first.

Scope (documented, asserted by tests):
* DECODE: baseline sequential DCT (SOF0) — 8-bit, 1 or 3 components,
  any sampling factors 1-2 (4:4:4, 4:2:2, 4:2:0), one interleaved
  scan, restart markers, byte stuffing — AND progressive DCT (SOF2):
  spectral selection, successive approximation (DC and AC refinement
  scans, EOB runs), interleaved DC / non-interleaved AC scans,
  per-scan table redefinition, restart markers (T.81 Annex G).
  Arithmetic coding, 12-bit, and hierarchical return None — callers
  degrade to header-level features exactly as before.
* ENCODE: baseline or progressive, quality-scaled standard tables
  (the "typical" Huffman and quantization tables published in the
  JPEG standard, ITU-T T.81 Annex K), 4:4:4 or 4:2:0, grayscale or
  RGB, optional restart interval.  The progressive writer emits the
  classic 4-phase script (DC first at Al=1, DC refine, per-component
  AC first at Al=1, per-component AC refine) with per-block EOB0 so
  the standard tables suffice.  Exists so tests and synthesizers can
  produce REAL entropy-coded payloads deterministically — and so the
  progressive DECODER is differentially verified: baseline and
  progressive encodes of the same pixels carry the SAME quantized
  coefficients, so their decodes must be byte-identical.

Throughput: the Huffman scan is bit-serial Python — correct and fast
enough for thumbnail/keyframe work inside Arrow-batched mapInPandas,
but a 100 TB video corpus should swap a native codec into the same
``decode_jpeg_pixels`` dispatch point (one function, zero plan
changes).  The 8x8 IDCT, dequantization, upsampling, and color
transform are vectorized numpy over whole planes.
"""

from __future__ import annotations

import struct

import numpy as np

# Decode-bomb guards (mirrors png.py's _MAX_PIXELS): a crafted SOF
# claiming e.g. 65535x65535 would allocate ~17 GB of coefficient planes
# per component BEFORE any payload byte is checked, and a progressive
# stream can multiply CPU per tiny SOS segment by walking every block —
# reject both at parse time instead of relying on the except clause.
# 2^26 pixels = 64 MP, far above any thumbnail/keyframe this path is
# documented for.  _MAX_SCANS bounds the progressive scan count (real
# encoder scripts emit <= ~20 scans; libjpeg-turbo's tooling suggests
# capping around 100 for the same hostile-input reason).
_MAX_PIXELS = 1 << 26
_MAX_SCANS = 100

# zigzag scan order: index i of the stream -> (row, col) in the 8x8 block
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# standard quantization tables (ITU-T T.81 Annex K.1, quality 50 base)
STD_LUMA_QUANT = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
STD_CHROMA_QUANT = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# standard Huffman tables (T.81 Annex K.3): (bits[1..16], huffval)
STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis M: forward F = M f M^T,
    inverse f = M^T F M (M's rows are orthonormal)."""
    x = np.arange(8)
    u = x.reshape(-1, 1)
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16.0)
    m[0, :] *= 1.0 / np.sqrt(2.0)
    return m


_DCT_M = _dct_matrix()


def quality_scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """The IJG quality scaling (public libjpeg convention): 50 keeps
    the standard table, 100 approaches all-ones, 1 is maximally
    coarse."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


class _HuffTable:
    """Canonical Huffman table from a DHT (bits, huffval) pair: decode
    via (length, code) lookup, encode via symbol -> (code, length)."""

    def __init__(self, bits: list[int], huffval: list[int]):
        self.decode_map: dict[tuple[int, int], int] = {}
        self.encode_map: dict[int, tuple[int, int]] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                sym = huffval[k]
                self.decode_map[(length, code)] = sym
                self.encode_map[sym] = (code, length)
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with byte
    stuffing (FF 00 -> FF) and restart-marker awareness."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None  # pending non-RST marker

    def _fill(self) -> bool:
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.buf):
                # past the end: pad with zero bits (spec: the decoder
                # may read a few padding bits at the end of a scan)
                self.bitbuf = (self.bitbuf << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = self.buf[self.pos]
            if b == 0xFF:
                nxt = self.buf[self.pos + 1] if self.pos + 1 < len(self.buf) else 0xD9
                if nxt == 0x00:  # stuffed byte
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RST: handled by reset()
                    self.marker = nxt
                    continue
                else:  # EOI / next segment: stop consuming
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.bitbuf = ((self.bitbuf << 8) | b) & 0xFFFFFFFF
            self.nbits += 8
        return True

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        v = (self.bitbuf >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return v

    def decode_symbol(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bits(1)
            sym = table.decode_map.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def reset_at_restart(self) -> None:
        """Consume the next RSTn and byte-align (DC predictors are
        reset by the caller).  The marker may not have been reached by
        ``_fill`` yet (the bit buffer can hold a whole interval's tail
        without ever looking at the next byte), so discard the buffered
        padding bits and scan forward to it."""
        self.bitbuf = 0
        self.nbits = 0
        if self.marker is None:
            while self.pos + 1 < len(self.buf) and not (
                self.buf[self.pos] == 0xFF and self.buf[self.pos + 1] != 0x00
            ):
                self.pos += 1
            if self.pos + 1 < len(self.buf):
                self.marker = self.buf[self.pos + 1]
        if self.marker is None or not 0xD0 <= self.marker <= 0xD7:
            raise ValueError("expected restart marker")
        self.pos += 2
        self.marker = None


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_baseline_jpeg(buf: bytes) -> "np.ndarray | None":
    """Decode a baseline (SOF0) or progressive (SOF2) JPEG to an HxWx3
    uint8 RGB array (grayscale replicated across channels).  Returns
    None for anything outside the documented scope (arithmetic coding,
    12-bit, >2 sampling factors) or malformed input — never raises on
    bad bytes.  (The name predates progressive support and is the
    stable dispatch point ``multimodal.py`` binds to.)"""
    try:
        return _decode(buf)
    except (
        ValueError,
        IndexError,
        struct.error,
        KeyError,
        MemoryError,
        OverflowError,
    ):
        # MemoryError/OverflowError: hostile headers can still drive a
        # large-but-under-cap allocation on a constrained executor —
        # the never-raise contract must hold there too (png.py's list)
        return None


def _next_segment(buf: bytes, p: int) -> int:
    """Position of the next real marker (skips entropy bytes, stuffed
    FF00 pairs and RSTn) at or after ``p``."""
    n = len(buf)
    while p + 1 < n:
        if (
            buf[p] == 0xFF
            and buf[p + 1] != 0x00
            and buf[p + 1] != 0xFF
            and not 0xD0 <= buf[p + 1] <= 0xD7
        ):
            return p
        p += 1
    return n


def _decode_block_baseline(reader, dc_t, ac_t, coef, pred, ci) -> None:
    """One full 8x8 block (zigzag-order coefficients) — the baseline
    sequential decode: DC diff + AC run-length to EOB."""
    s = reader.decode_symbol(dc_t)
    diff = _extend(reader.read_bits(s), s)
    pred[ci] += diff
    coef[0] = pred[ci]
    k = 1
    while k < 64:
        rs = reader.decode_symbol(ac_t)
        r, size = rs >> 4, rs & 0xF
        if size == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past block end")
        coef[k] = _extend(reader.read_bits(size), size)
        k += 1


def _decode_block_ac_first(reader, ac_t, coef, ss, se, al, eobrun) -> int:
    """Progressive AC initial scan for one block (T.81 G.1.2.2): EOB
    runs span blocks; new coefficients land shifted left by ``al``.
    Returns the updated EOB run counter."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_symbol(ac_t)
        r, size = rs >> 4, rs & 0xF
        if size == 0:
            if r != 15:  # EOBn: this block ends the coded data
                eobrun = 1 << r
                if r:
                    eobrun += reader.read_bits(r)
                return eobrun - 1
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        coef[k] = _extend(reader.read_bits(size), size) << al
        k += 1
    return 0


def _decode_block_ac_refine(reader, ac_t, coef, ss, se, al, eobrun) -> int:
    """Progressive AC refinement for one block (T.81 G.1.2.3): one
    correction bit per already-nonzero coefficient in decode order,
    newly-nonzero coefficients arrive as ±(1<<al).  Returns the updated
    EOB run counter."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_symbol(ac_t)
            r, size = rs >> 4, rs & 0xF
            newval = 0
            if size == 0:
                if r != 15:  # EOBn
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # ZRL: advance over 16 zero-history coefficients
            else:
                newval = p1 if reader.read_bits(1) else m1
            # advance over r zero-history coefficients, emitting a
            # correction bit at every nonzero-history one passed
            while k <= se:
                c = int(coef[k])
                if c != 0:
                    if reader.read_bits(1) and (c & p1) == 0:
                        coef[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                coef[k] = newval
            k += 1
    if eobrun > 0:
        # inside an EOB run: only correction bits for nonzero history
        while k <= se:
            c = int(coef[k])
            if c != 0:
                if reader.read_bits(1) and (c & p1) == 0:
                    coef[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(
    buf, data_pos, frame, scan_comps, ss, se, ah, al,
    coefs, block_dims, huff_dc, huff_ac, restart_interval, progressive,
) -> int:
    """Decode one entropy-coded scan into the coefficient arrays.
    Returns the buffer position after the scan's data."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    reader = _BitReader(buf, data_pos)
    pred = [0] * len(comps)
    eobrun = 0
    unit = 0  # MCUs (interleaved) or blocks (single-component)

    def maybe_restart():
        nonlocal unit, pred, eobrun
        if restart_interval and unit == restart_interval:
            reader.reset_at_restart()
            pred = [0] * len(comps)
            eobrun = 0
            unit = 0

    if len(scan_comps) > 1:
        # interleaved: MCU order (baseline, or progressive DC).  The
        # MCU count deliberately uses the FRAME's hmax/vmax even when
        # the scan interleaves only a subset of components: T.81 A.2.3
        # derives MCUs-per-row per component as ceil(blocks_i / H_i)
        # with blocks_i = ceil(ceil(w*H_i/Hmax)/8), which reduces to
        # ceil(w/(8*Hmax)) — the frame maximum — for EVERY component,
        # and libjpeg's per_scan_setup uses cinfo->max_h_samp_factor
        # the same way.  A scan-local maximum would over-count MCUs
        # for a subset scan that excludes the max-sampled component
        # (pinned by the subset-DC differential test in
        # tests/test_jpeg_codec.py).
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for ci, td, ta in scan_comps:
                    cid, hs, vs, tq = comps[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            coef = coefs[ci][my * vs + by, mx * hs + bx]
                            if not progressive:
                                _decode_block_baseline(
                                    reader, huff_dc[td], huff_ac[ta],
                                    coef, pred, ci,
                                )
                            elif ah == 0:  # DC first
                                s = reader.decode_symbol(huff_dc[td])
                                pred[ci] += _extend(reader.read_bits(s), s)
                                coef[0] = pred[ci] << al
                            else:  # DC refinement: one raw bit
                                if reader.read_bits(1):
                                    coef[0] = int(coef[0]) | (1 << al)
                unit += 1
    else:
        # non-interleaved: the component's own (unpadded) block grid
        ci, td, ta = scan_comps[0]
        bh, bw_ = block_dims[ci]
        for by in range(bh):
            for bx in range(bw_):
                maybe_restart()
                coef = coefs[ci][by, bx]
                if not progressive:
                    _decode_block_baseline(
                        reader, huff_dc[td], huff_ac[ta], coef, pred, ci
                    )
                elif ss == 0:
                    if ah == 0:
                        s = reader.decode_symbol(huff_dc[td])
                        pred[ci] += _extend(reader.read_bits(s), s)
                        coef[0] = pred[ci] << al
                    else:
                        if reader.read_bits(1):
                            coef[0] = int(coef[0]) | (1 << al)
                elif ah == 0:
                    eobrun = _decode_block_ac_first(
                        reader, huff_ac[ta], coef, ss, se, al, eobrun
                    )
                else:
                    eobrun = _decode_block_ac_refine(
                        reader, huff_ac[ta], coef, ss, se, al, eobrun
                    )
                unit += 1

    return _next_segment(buf, reader.pos)


def _decode(buf: bytes) -> "np.ndarray | None":
    if buf is None or len(buf) < 4 or buf[:2] != b"\xff\xd8":
        return None
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None  # (h, w, [(cid, hs, vs, tq)])
    progressive = False
    restart_interval = 0
    coefs: list[np.ndarray] | None = None
    block_dims: list[tuple[int, int]] = []
    n_scans = 0
    while pos + 2 <= len(buf):
        if buf[pos] != 0xFF:
            return None
        marker = buf[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > len(buf):
            return None
        seg_len = int.from_bytes(buf[pos + 2 : pos + 4], "big")
        if seg_len < 2 or pos + 2 + seg_len > len(buf):
            return None
        body = buf[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:  # 16-bit tables: out of scope
                    return None
                tbl = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int64)
                if tbl.size != 64:
                    return None
                quant[tq] = tbl
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                if len(vals) != n:
                    return None
                t = _HuffTable(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = t
                i += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if frame is not None:
                return None
            progressive = marker == 0xC2
            prec = body[0]
            if prec != 8:
                return None
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            if nc not in (1, 3) or h == 0 or w == 0:
                return None
            if h * w > _MAX_PIXELS:
                # reject BEFORE the per-component coefficient planes
                # are allocated (a 65535x65535 claim is ~17 GB each)
                return None
            comps = []
            for c in range(nc):
                cid = body[6 + 3 * c]
                hv = body[7 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, body[8 + 3 * c]))
            if any(not 1 <= hs <= 2 or not 1 <= vs <= 2 for _, hs, vs, _ in comps):
                return None
            frame = (h, w, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            coefs = []
            block_dims = []
            for cid, hs, vs, tq in comps:
                # MCU-padded grid for interleaved scans; the unpadded
                # dims bound non-interleaved (single-component) scans
                coefs.append(
                    np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int32)
                )
                cw = (w * hs + hmax - 1) // hmax
                ch = (h * vs + vmax - 1) // vmax
                block_dims.append(((ch + 7) // 8, (cw + 7) // 8))
        elif 0xC1 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return None  # extended/arithmetic/hierarchical: out of scope
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None or coefs is None:
                return None
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                return None
            cid_to_ci = {c[0]: i for i, c in enumerate(frame[2])}
            scan_comps = []
            for c in range(ns):
                cs = body[1 + 2 * c]
                if cs not in cid_to_ci:
                    return None
                td_ta = body[2 + 2 * c]
                scan_comps.append((cid_to_ci[cs], td_ta >> 4, td_ta & 0xF))
            if len({ci for ci, _, _ in scan_comps}) != ns:
                # duplicate component selector: the MCU walk would
                # decode one plane twice against desynced entropy data
                # and silently return garbage instead of None
                return None
            ss = body[1 + 2 * ns]
            se = body[2 + 2 * ns]
            ah_al = body[3 + 2 * ns]
            ah, al = ah_al >> 4, ah_al & 0xF
            if progressive:
                if ss == 0 and se != 0:
                    return None  # DC scan must be DC-only (G.1.1.1.1)
                if ss > 0 and (ns != 1 or se < ss or se > 63):
                    return None
            else:
                # baseline scope: ONE full interleaved scan
                if ns != len(frame[2]) or ss != 0 or se != 63 or ah or al:
                    return None
                if n_scans:
                    return None
            # validate only the tables this scan type actually uses
            for ci, td, ta in scan_comps:
                if frame[2][ci][3] not in quant:
                    return None
                needs_dc = ss == 0 and (not progressive or ah == 0)
                needs_ac = se > 0
                if needs_dc and td not in huff_dc:
                    return None
                if needs_ac and ta not in huff_ac:
                    return None
            pos = _decode_scan(
                buf, pos + 2 + seg_len, frame, scan_comps, ss, se, ah, al,
                coefs, block_dims, huff_dc, huff_ac, restart_interval,
                progressive,
            )
            n_scans += 1
            if n_scans > _MAX_SCANS:
                return None  # hostile scan-count multiplier (see cap)
            continue
        pos += 2 + seg_len
    if frame is None or coefs is None or n_scans == 0:
        return None
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)

    # batched dequantize + inverse zigzag + 2D IDCT per component
    full = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        dq = coefs[ci].astype(np.float64) * quant[tq].astype(np.float64)
        by, bx = dq.shape[:2]
        nat = np.zeros_like(dq)
        nat[..., ZIGZAG] = dq
        blocks = nat.reshape(by, bx, 8, 8)
        px = _DCT_M.T @ blocks @ _DCT_M  # broadcast over (by, bx)
        plane = np.rint(px).astype(np.int32)
        plane = plane.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        if hs < hmax:
            plane = np.repeat(plane, hmax // hs, axis=1)
        if vs < vmax:
            plane = np.repeat(plane, vmax // vs, axis=0)
        full.append(plane[:h, :w].astype(np.float64) + 128.0)

    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (spec)

    def marker(self, m: int) -> None:
        self.flush()
        self.out += bytes((0xFF, m))


def _encode_block(
    bw: _BitWriter,
    block: np.ndarray,
    q: np.ndarray,
    dc_t: _HuffTable,
    ac_t: _HuffTable,
    pred: int,
) -> int:
    f = _DCT_M @ (block.astype(np.float64) - 128.0) @ _DCT_M.T
    zz = f.reshape(64)[ZIGZAG]
    coef = np.round(zz / q).astype(np.int64)  # q is in ZIGZAG order
    diff = int(coef[0]) - pred

    def size_of(v: int) -> int:
        return int(abs(v)).bit_length()

    s = size_of(diff)
    code, length = dc_t.encode_map[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coef[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coef[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_t.encode_map[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = size_of(v)
        code, length = ac_t.encode_map[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_t.encode_map[0x00]  # EOB
        bw.write(code, length)
    return int(coef[0])


def _prep_planes(pixels: np.ndarray, subsampling: str):
    """Shared encoder front half: validate shape, color-convert,
    chroma-downsample, MCU-pad.  Returns
    (gray, h, w, comps, prepped planes, mcux, mcuy)."""
    if pixels.ndim == 2:
        gray = True
        h, w = pixels.shape
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        gray = False
        h, w = pixels.shape[:2]
    else:
        raise ValueError(f"expected HxW or HxWx3, got {pixels.shape}")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    sub = 2 if (subsampling == "4:2:0" and not gray) else 1

    if gray:
        y = pixels.astype(np.float64)
        comps = [(1, 1, 1, 0)]
        planes = [y]
    else:
        p = pixels.astype(np.float64)
        r, g, b = p[..., 0], p[..., 1], p[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [(1, sub, sub, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        planes = [y, cb, cr]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # pad planes to MCU grid (edge replication), downsample chroma
    prepped = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        p = planes[ci]
        if ci > 0 and sub == 2:  # 2x2 mean downsample (pad to even first)
            pe = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
            p = pe.reshape(pe.shape[0] // 2, 2, pe.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        p = np.pad(
            p, ((0, max(0, ph - p.shape[0])), (0, max(0, pw - p.shape[1]))),
            mode="edge",
        )[:ph, :pw]
        prepped.append(p)
    return gray, h, w, comps, prepped, mcux, mcuy


def _header_segments(
    gray: bool,
    h: int,
    w: int,
    comps,
    ql: np.ndarray,
    qc: np.ndarray,
    sof_marker: int,
    restart_interval: int,
) -> bytearray:
    """SOI through DHT/DRI (everything before the first SOS)."""
    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + (16).to_bytes(2, "big")
        + b"JFIF\x00\x01\x01\x00" + b"\x00\x48\x00\x48\x00\x00"
    )
    for tq, q in ((0, ql),) + (((1, qc),) if not gray else ()):
        out += b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([tq])
        out += bytes(int(v) for v in q)  # already zigzag order
    nc = len(comps)
    out += bytes((0xFF, sof_marker)) + (8 + 3 * nc).to_bytes(2, "big") + b"\x08"
    out += h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for cid, hs, vs, tq in comps:
        out += bytes([cid, (hs << 4) | vs, tq])
    for tc_th, (bits, vals) in (
        ((0x00, STD_DC_LUMA), (0x10, STD_AC_LUMA))
        + (((0x01, STD_DC_CHROMA), (0x11, STD_AC_CHROMA)) if not gray else ())
    ):
        out += b"\xff\xc4" + (19 + len(vals)).to_bytes(2, "big")
        out += bytes([tc_th]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + (4).to_bytes(2, "big")
        out += int(restart_interval).to_bytes(2, "big")
    return out


def encode_baseline_jpeg(
    pixels: np.ndarray,
    quality: int = 75,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Encode an HxW (grayscale) or HxWx3 (RGB) uint8 array as a
    baseline JPEG.  Deterministic: same pixels + parameters -> same
    bytes (fixed tables, no rate control)."""
    gray, h, w, comps, prepped, mcux, mcuy = _prep_planes(pixels, subsampling)

    # zigzag order throughout: the DQT segment stores tables in zigzag
    # stream order, and _encode_block divides zigzag-ordered
    # coefficients — one ordering, no permutation at either site
    ql = quality_scaled_quant(STD_LUMA_QUANT, quality)[ZIGZAG]
    qc = quality_scaled_quant(STD_CHROMA_QUANT, quality)[ZIGZAG]
    dcl, acl = _HuffTable(*STD_DC_LUMA), _HuffTable(*STD_AC_LUMA)
    dcc, acc = _HuffTable(*STD_DC_CHROMA), _HuffTable(*STD_AC_CHROMA)
    nc = len(comps)

    out = _header_segments(gray, h, w, comps, ql, qc, 0xC0, restart_interval)
    out += b"\xff\xda" + (6 + 2 * nc).to_bytes(2, "big") + bytes([nc])
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        out += bytes([cid, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0

    bw = _BitWriter()
    pred = [0] * nc
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count == restart_interval:
                bw.marker(0xD0 + rst)
                rst = (rst + 1) % 8
                pred = [0] * nc
                mcu_count = 0
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                q = ql if tq == 0 else qc
                dt, at = (dcl, acl) if ci == 0 else (dcc, acc)
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        blk = prepped[ci][y0 : y0 + 8, x0 : x0 + 8]
                        pred[ci] = _encode_block(bw, blk, q, dt, at, pred[ci])
            mcu_count += 1
    bw.flush()
    out += bytes(bw.out)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _emit_dc_first(bw: _BitWriter, dc_t: _HuffTable, v: int, pred: int) -> int:
    """One DC-first value (already point-transformed): size-coded diff."""
    diff = v - pred
    s = abs(diff).bit_length()
    code, length = dc_t.encode_map[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    return v


def _emit_ac_first(bw: _BitWriter, ac_t: _HuffTable, coef, al: int) -> None:
    """Progressive AC initial scan for one block, per-block EOB0 (no
    cross-block EOB runs, so the standard tables suffice)."""
    r = 0
    for k in range(1, 64):
        v = int(coef[k])
        t = abs(v) >> al
        if t == 0:
            r += 1
            continue
        while r > 15:
            code, length = ac_t.encode_map[0xF0]  # ZRL
            bw.write(code, length)
            r -= 16
        s = t.bit_length()
        code, length = ac_t.encode_map[(r << 4) | s]
        bw.write(code, length)
        sv = t if v >= 0 else -t
        bw.write(sv if sv >= 0 else sv + (1 << s) - 1, s)
        r = 0
    if r > 0:
        code, length = ac_t.encode_map[0x00]  # EOB0
        bw.write(code, length)


def _emit_ac_refine(bw: _BitWriter, ac_t: _HuffTable, coef, al: int) -> None:
    """Progressive AC refinement for one block (T.81 G figure G.7 /
    the public libjpeg jcphuff structure): newly-nonzero coefficients
    as (run,1) symbols with a sign bit; correction bits for
    already-nonzero coefficients buffered and flushed after the next
    emitted symbol, so the decoder reads them in position order while
    advancing."""
    absv = [0] * 64
    eob = 0
    for k in range(1, 64):
        t = abs(int(coef[k])) >> al
        absv[k] = t
        if t == 1:
            eob = k  # last NEWLY-nonzero position
    r = 0
    br: list[int] = []

    def flush_br() -> None:
        for bit in br:
            bw.write(bit, 1)
        br.clear()

    for k in range(1, 64):
        t = absv[k]
        if t == 0:
            r += 1
            continue
        # emit pending ZRLs unless they fold into the trailing EOB;
        # this check runs at EVERY nonzero absvalue (also history-only
        # ones), which is what keeps encoder/decoder bit order aligned
        while r > 15 and k <= eob:
            code, length = ac_t.encode_map[0xF0]
            bw.write(code, length)
            r -= 16
            flush_br()
        if t > 1:  # previously nonzero: just its correction bit
            br.append(t & 1)
            continue
        code, length = ac_t.encode_map[(r << 4) | 1]
        bw.write(code, length)
        bw.write(1 if int(coef[k]) >= 0 else 0, 1)  # sign: 1 -> +(1<<al)
        flush_br()
        r = 0
    if r > 0 or br:
        code, length = ac_t.encode_map[0x00]  # EOB0 + its buffered bits
        bw.write(code, length)
        flush_br()


def encode_progressive_jpeg(
    pixels: np.ndarray,
    quality: int = 75,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Encode an HxW (grayscale) or HxWx3 (RGB) uint8 array as a
    PROGRESSIVE JPEG (SOF2) with the classic 4-phase scan script:

      1. DC first, all components interleaved (Ah=0, Al=1)
      2. DC refinement (Ah=1, Al=0)
      3. per component: AC spectral band 1-63 first pass (Ah=0, Al=1)
      4. per component: AC refinement (Ah=1, Al=0)

    Quantized coefficients are computed with EXACTLY the baseline
    encoder's arithmetic (same DCT expression per 8x8 block, same
    round-half-even divide), so a progressive encode decodes to the
    byte-identical image as the baseline encode of the same pixels —
    the differential contract tests/test_jpeg_codec.py pins."""
    gray, h, w, comps, prepped, mcux, mcuy = _prep_planes(pixels, subsampling)
    ql = quality_scaled_quant(STD_LUMA_QUANT, quality)[ZIGZAG]
    qc = quality_scaled_quant(STD_CHROMA_QUANT, quality)[ZIGZAG]
    dcl, acl = _HuffTable(*STD_DC_LUMA), _HuffTable(*STD_AC_LUMA)
    dcc, acc = _HuffTable(*STD_DC_CHROMA), _HuffTable(*STD_AC_CHROMA)
    nc = len(comps)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)

    # quantized zigzag coefficients per component — per-block, with the
    # IDENTICAL expression _encode_block uses (a batched matmul can
    # round differently at half-ulp boundaries; determinism wins here)
    coefs = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        p = prepped[ci]
        q = ql if tq == 0 else qc
        by_n, bx_n = p.shape[0] // 8, p.shape[1] // 8
        arr = np.zeros((by_n, bx_n, 64), dtype=np.int64)
        for by in range(by_n):
            for bx in range(bx_n):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                f = _DCT_M @ (blk.astype(np.float64) - 128.0) @ _DCT_M.T
                arr[by, bx] = np.round(f.reshape(64)[ZIGZAG] / q).astype(
                    np.int64
                )
        coefs.append(arr)

    out = _header_segments(gray, h, w, comps, ql, qc, 0xC2, restart_interval)

    def sos(scan_cis, ss, se, ah, al) -> bytes:
        seg = bytearray(
            b"\xff\xda"
            + (6 + 2 * len(scan_cis)).to_bytes(2, "big")
            + bytes([len(scan_cis)])
        )
        for ci in scan_cis:
            seg += bytes([comps[ci][0], 0x00 if ci == 0 else 0x11])
        seg += bytes([ss, se, (ah << 4) | al])
        return bytes(seg)

    class _Scan:
        """Per-scan bit writer + restart bookkeeping (RST numbering and
        the interval counter reset at every SOS)."""

        def __init__(self) -> None:
            self.bw = _BitWriter()
            self.count = 0
            self.rst = 0

        def tick(self, on_restart=None) -> None:
            if restart_interval and self.count == restart_interval:
                self.bw.marker(0xD0 + self.rst)
                self.rst = (self.rst + 1) % 8
                self.count = 0
                if on_restart is not None:
                    on_restart()

        def done(self) -> bytes:
            self.bw.flush()
            return bytes(self.bw.out)

    # scan 1: DC first (interleaved, MCU-padded grid), Al=1
    out += sos(list(range(nc)), 0, 0, 0, 1)
    sc = _Scan()
    pred = [0] * nc
    for my in range(mcuy):
        for mx in range(mcux):
            sc.tick(lambda: pred.__setitem__(slice(None), [0] * nc))
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                dt = dcl if ci == 0 else dcc
                for by in range(vs):
                    for bx in range(hs):
                        v = int(coefs[ci][my * vs + by, mx * hs + bx, 0]) >> 1
                        pred[ci] = _emit_dc_first(sc.bw, dt, v, pred[ci])
            sc.count += 1
    out += sc.done()

    # scan 2: DC refinement — one raw bit per block
    out += sos(list(range(nc)), 0, 0, 1, 0)
    sc = _Scan()
    for my in range(mcuy):
        for mx in range(mcux):
            sc.tick()
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                for by in range(vs):
                    for bx in range(hs):
                        sc.bw.write(
                            int(coefs[ci][my * vs + by, mx * hs + bx, 0]) & 1,
                            1,
                        )
            sc.count += 1
    out += sc.done()

    # non-interleaved AC scans walk the component's UNPADDED block grid
    def ac_dims(ci):
        cid, hs, vs, tq = comps[ci]
        cw = (w * hs + hmax - 1) // hmax
        ch = (h * vs + vmax - 1) // vmax
        return (ch + 7) // 8, (cw + 7) // 8

    for emit, ah, al in ((_emit_ac_first, 0, 1), (_emit_ac_refine, 1, 0)):
        for ci in range(nc):
            at = acl if ci == 0 else acc
            out += sos([ci], 1, 63, ah, al)
            sc = _Scan()
            bh, bwid = ac_dims(ci)
            for by in range(bh):
                for bx in range(bwid):
                    sc.tick()
                    emit(sc.bw, at, coefs[ci][by, bx], al)
                    sc.count += 1
            out += sc.done()

    out += b"\xff\xd9"  # EOI
    return bytes(out)
