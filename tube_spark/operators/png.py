"""PNG codec — pure stdlib zlib + numpy, no image library.

Closes the second half of the multimodal codec boundary (COVERAGE.md):
``operators/jpeg.py`` covers the DCT family; this module covers the
deflate family — the two formats that together carry the bulk of a web
image corpus.  The DEFLATE layer itself is stdlib ``zlib`` (PNG's
compression IS zlib, RFC 1950/1951), so unlike JPEG nothing is
approximated: the per-scanline prediction filters (None/Sub/Up/
Average/Paeth, RFC 2083 §6) and the Adam7 deinterlace are the whole
codec.

Scope (documented, asserted by tests):
* DECODE: 8- and 16-bit samples; color types 0 (gray), 2 (RGB),
  3 (palette), 4 (gray+alpha), 6 (RGBA); interlace 0 (sequential) and
  1 (Adam7); multiple IDAT chunks; CRCs are NOT verified (corrupt
  streams surface as zlib/shape errors and return None — same
  never-raise contract as the JPEG decoder).  EVERY legal bit depth
  decodes: 16-bit samples (scientific/medical gray imagery) by
  high-byte strip (libpng's classic 16->8), EXACT for the v*257
  representation an 8->16 upconvert produces; 1/2/4-bit gray/palette
  rows unpack MSB-first (gray scales by the exact 255/85/17 factors).
  Filtering operates on BYTES per RFC 2083 §6.2 (bpp rounds up to 1
  for sub-byte rows), so the scanline machinery is shared.
  Alpha is dropped (feature pipelines consume RGB; compositing policy
  belongs to the caller), grayscale replicates to 3 channels — the
  exact output contract of ``decode_baseline_jpeg``.
* ENCODE: 8- or 16-bit gray/RGB (16-bit upconverts v -> v*257, the
  standard bit-replication), non-interlaced, a fixed per-row filter
  type (0-4) or "adaptive" (minimum-sum-of-absolute-residuals, the
  libpng heuristic).  Deterministic bytes; exists so tests synthesize
  REAL PNG payloads exercising every unfilter path — decode(encode(px,
  filter=f)) must be pixel-EXACT for every f and depth (PNG is
  lossless, and high-byte strip inverts v*257).

Throughput: Up/Sub unfilters are vectorized numpy (Sub via per-lane
cumulative sum); Average/Paeth are byte-serial per row — fine for
thumbnail/phash work inside Arrow-batched mapInPandas, with the same
documented native-codec swap point as JPEG for 100 TB bulk decode.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# decode-side sanity cap: a crafted IHDR can claim 4-billion-pixel
# dimensions and make the decoder allocate (or zero-fill) gigabytes
# before any payload-size check — cap total pixels at 64M (an 8k x 8k
# frame), far above the thumbnail/phash scope this codec serves
_MAX_PIXELS = 1 << 26

# color type -> samples per pixel (before palette expansion)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass layout: (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def png_dimensions(buf: bytes) -> "tuple[int, int] | None":
    """(width, height) from IHDR, or None when not a PNG."""
    if buf is None or len(buf) < 24 or buf[:8] != _SIG:
        return None
    if buf[12:16] != b"IHDR":
        return None
    w, h = struct.unpack_from(">II", buf, 16)
    if w == 0 or h == 0:
        return None
    return int(w), int(h)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters: ``raw`` is h rows of
    (1 filter byte + stride data bytes); returns (h, stride) uint8."""
    rows = raw.reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int32)
        if ft == 0:  # None
            rec = line
        elif ft == 1:  # Sub: per byte-lane cumulative sum
            rec = line.copy()
            for lane in range(bpp):
                rec[lane::bpp] = np.cumsum(rec[lane::bpp]) & 0xFF
        elif ft == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ft == 3:  # Average
            rec = line
            up = prev.astype(np.int32)
            for i in range(stride):
                left = int(rec[i - bpp]) if i >= bpp else 0
                rec[i] = (rec[i] + ((left + int(up[i])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            rec = line
            up = prev.astype(np.int32)
            for i in range(stride):
                left = int(rec[i - bpp]) if i >= bpp else 0
                ul = int(prev[i - bpp]) if i >= bpp else 0
                rec[i] = (rec[i] + _paeth(left, int(up[i]), ul)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ft}")
        out[y] = rec.astype(np.uint8)
        prev = out[y]
    return out


def _samples8(
    rows: np.ndarray, pw: int, ch: int, depth: int, color_type: int
) -> np.ndarray:
    """Unfiltered scanline bytes -> (n_rows, pw, ch) 8-bit samples.
    16-bit samples strip to the high byte (libpng's classic 16->8,
    exact for v*257-encoded content); 1/2/4-bit samples (gray or
    palette indices, ch==1 by spec) unpack MSB-first and gray scales
    by 255/(2^depth−1) — exact integer factors 255/85/17."""
    if depth == 8:
        return rows.reshape(-1, pw, ch)
    if depth == 16:
        u16 = np.ascontiguousarray(rows).reshape(-1).view(">u2")
        return (u16 >> 8).astype(np.uint8).reshape(-1, pw, ch)
    n = rows.shape[0]
    bits = np.unpackbits(np.ascontiguousarray(rows), axis=1)
    per = bits[:, : pw * depth].reshape(n, pw, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (per * weights).sum(axis=2, dtype=np.uint16)
    if color_type == 0:  # gray: scale to full 8-bit range
        vals = vals * (255 // ((1 << depth) - 1))
    return vals.astype(np.uint8)[:, :, None]


def _row_stride(w: int, ch: int, depth: int) -> int:
    """Bytes per scanline (sub-byte depths pack, rows pad to a byte)."""
    return (w * ch * depth + 7) // 8


def _to_rgb(
    samples: np.ndarray, color_type: int, palette: "np.ndarray | None"
) -> np.ndarray:
    """(h, w, channels) samples -> (h, w, 3) uint8 RGB (alpha dropped,
    gray replicated, palette expanded)."""
    if color_type == 2:
        return samples
    if color_type == 6:
        return samples[..., :3]
    if color_type == 0:
        g = samples[..., 0]
        return np.stack([g, g, g], axis=-1)
    if color_type == 4:
        g = samples[..., 0]
        return np.stack([g, g, g], axis=-1)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        idx = samples[..., 0].astype(np.int64)
        if idx.max(initial=0) >= len(palette):
            raise ValueError("palette index out of range")
        return palette[idx]
    raise ValueError(f"bad color type {color_type}")


def decode_png(buf: bytes) -> "np.ndarray | None":
    """Decode a PNG to an HxWx3 uint8 RGB array.  Returns None for
    anything outside the documented scope or malformed input — never
    raises on bad bytes."""
    try:
        return _decode(buf)
    except (
        ValueError,
        IndexError,
        struct.error,
        zlib.error,
        KeyError,
        MemoryError,
        OverflowError,
    ):
        return None


def _decode(buf: bytes) -> "np.ndarray | None":
    if buf is None or len(buf) < 8 or buf[:8] != _SIG:
        return None
    pos = 8
    w = h = None
    depth = 8
    color_type = interlace = 0
    palette = None
    idat = bytearray()
    seen_iend = False
    while pos + 8 <= len(buf):
        length, ctype = struct.unpack_from(">I4s", buf, pos)
        body = buf[pos + 8 : pos + 8 + length]
        if len(body) != length:
            return None
        if ctype == b"IHDR":
            if length != 13:
                return None
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth not in (1, 2, 4, 8, 16) or comp != 0 or filt != 0:
                return None
            if depth == 16 and color_type == 3:
                return None  # spec-invalid: palette depth caps at 8
            if depth < 8 and color_type not in (0, 3):
                return None  # spec: sub-byte only for gray/palette
            if color_type not in _CHANNELS or interlace not in (0, 1):
                return None
            if w == 0 or h == 0 or w * h > _MAX_PIXELS:
                return None
        elif ctype == b"PLTE":
            if length % 3:
                return None
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            seen_iend = True
            break
        pos += 12 + length  # length + type + crc
    if w is None or not idat or not seen_iend:
        return None
    ch = _CHANNELS[color_type]
    # filters operate on BYTES; sub-byte depths use bpp = 1 (RFC 2083)
    bpp = max(1, ch * depth // 8)
    # the exact inflated size is known from the header, so bound the
    # inflate to it (+1 to detect overruns) — an unbounded decompress
    # would let a small zlib bomb expand fully into memory first
    if interlace == 0:
        expected = h * (1 + _row_stride(w, ch, depth))
    else:
        expected = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw and ph:
                expected += ph * (1 + _row_stride(pw, ch, depth))
    dec = zlib.decompressobj()
    raw = dec.decompress(bytes(idat), expected + 1)
    if len(raw) != expected:  # short stream, or overrun (got the +1)
        return None
    data = np.frombuffer(raw, dtype=np.uint8)

    if interlace == 0:
        stride = _row_stride(w, ch, depth)
        if data.size != h * (1 + stride):
            return None
        px = _samples8(
            _unfilter(data, h, stride, bpp), w, ch, depth, color_type
        )
        return _to_rgb(px, color_type, palette)

    # Adam7: seven independently-filtered sub-images
    out = np.zeros((h, w, ch), dtype=np.uint8)
    off = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw == 0 or ph == 0:
            continue
        stride = _row_stride(pw, ch, depth)
        need = ph * (1 + stride)
        sub = data[off : off + need]
        if sub.size != need:
            return None
        off += need
        spx = _samples8(
            _unfilter(sub, ph, stride, bpp), pw, ch, depth, color_type
        )
        out[y0::dy, x0::dx] = spx
    if off != data.size:
        return None
    return _to_rgb(out, color_type, palette)


def _filter_row(
    ft: int, line: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Forward filter one reconstructed scanline (encoder side)."""
    cur = line.astype(np.int32)
    up = prev.astype(np.int32)
    n = cur.size
    left = np.zeros(n, dtype=np.int32)
    left[bpp:] = cur[:-bpp]
    ul = np.zeros(n, dtype=np.int32)
    ul[bpp:] = up[:-bpp]
    if ft == 0:
        res = cur
    elif ft == 1:
        res = cur - left
    elif ft == 2:
        res = cur - up
    elif ft == 3:
        res = cur - ((left + up) >> 1)
    elif ft == 4:
        p = left + up - ul
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
        )
        res = cur - pred
    else:
        raise ValueError(f"bad filter type {ft}")
    return (res & 0xFF).astype(np.uint8)


def encode_png(
    pixels: np.ndarray,
    filter_type: "int | str" = 0,
    level: int = 6,
    bit_depth: int = 8,
) -> bytes:
    """Encode an HxW (grayscale) or HxWx3 (RGB) uint8 array as a
    non-interlaced PNG.  ``filter_type`` 0-4 applies that filter
    to every row; "adaptive" picks per row by minimum sum of absolute
    residuals (the libpng heuristic).  ``bit_depth=16`` upconverts
    each 8-bit value v to v*257 (v<<8 | v, the standard bit
    replication) so the decoder's high-byte strip inverts it exactly.
    Deterministic bytes."""
    if pixels.ndim == 2:
        ct, ch = 0, 1
        h, w = pixels.shape
        flat = pixels.reshape(h, w)[:, :, None]
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        ct, ch = 2, 3
        h, w = pixels.shape[:2]
        flat = pixels
    else:
        raise ValueError(f"expected HxW or HxWx3, got {pixels.shape}")
    if isinstance(filter_type, int) and not 0 <= filter_type <= 4:
        raise ValueError(f"filter_type must be 0-4 or 'adaptive'")
    if bit_depth not in (8, 16):
        raise ValueError(f"bit_depth must be 8 or 16, got {bit_depth}")
    if bit_depth == 8:
        rows = flat.reshape(h, w * ch).astype(np.uint8)
    else:
        wide = (flat.astype(np.uint16) * 257).astype(">u2")
        rows = wide.reshape(h, w * ch).view(np.uint8).reshape(h, w * ch * 2)
    bpp = ch * (bit_depth // 8)  # filters operate on BYTES (RFC 2083)
    stride = w * bpp

    raw = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        if filter_type == "adaptive":
            best, best_ft = None, 0
            for ft in range(5):
                cand = _filter_row(ft, rows[y], prev, bpp)
                # minimum sum of absolute differences, residuals as signed
                cost = int(
                    np.abs(cand.astype(np.int8).astype(np.int32)).sum()
                )
                if best is None or cost < best:
                    best, best_ft = cost, ft
            ft = best_ft
        else:
            ft = int(filter_type)
        raw.append(ft)
        raw += _filter_row(ft, rows[y], prev, bpp).tobytes()
        prev = rows[y]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            len(body).to_bytes(4, "big")
            + ctype
            + body
            + zlib.crc32(ctype + body).to_bytes(4, "big")
        )

    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, ct, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), level))
        + chunk(b"IEND", b"")
    )
