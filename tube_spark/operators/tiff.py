"""Pure-numpy baseline TIFF codec — the scanned-document format.

Implements the TIFF 6.0 baseline profile (Adobe, 1992) the way the
repo's other codecs (png.py RFC 2083, gif.py GIF89a, jpeg.py T.81)
implement theirs: real entropy/packing decode from the spec, no codec
library, every claim pinned by hand-built-stream differential tests.

Scope — TIFF 6.0 Baseline, strip-organized, chunky planar layout:

* both byte orders (``II`` little / ``MM`` big);
* 8-bit and 4-bit grayscale (PhotometricInterpretation 0 = MinIsWhite
  with the spec inversion, 1 = MinIsBlack; 4-bit scales 0..15 →
  0..255 by ×17, MSB-first nibbles, byte-aligned rows), 8-bit RGB
  (Photometric 2, SamplesPerPixel 3, extra samples dropped), and
  8/4-bit palette (Photometric 3: 16-bit ColorMap, high-byte
  narrowing);
* Compression 1 (none) and 32773 (PackBits — the run-length scheme
  baseline requires, TIFF 6.0 §9);
* multi-strip images (RowsPerStrip + StripOffsets/StripByteCounts).

Out-of-scope variants (LZW/CCITT/JPEG-in-TIFF, tiles, planar config 2,
1/2/16-bit depths, CMYK/YCbCr) return ``None`` from
``decode_tiff`` — the callers' degrade-to-header contract keeps the
dims (``tiff_dimensions`` needs only the IFD walk).  A deployment
swaps in Pillow through ``multimodal.decode_jpeg_pixels``-style hooks
for the long tail (tests/test_native_codec_hook.py pins that shape).

Decode-bomb discipline (the gif/jpeg rules): dimensions are rejected
against ``_MAX_PIXELS`` BEFORE any pixel allocation, the IFD walk is
entry-capped, every tag/strip read is bounds-checked, and PackBits
expansion stops at the strip's declared pixel budget — a hostile
run-length stream cannot out-allocate the image it claims to be.

Reference: the reference engine has no media path (SURVEY §2 —
extension family); format layout from the public TIFF 6.0
specification.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_PIXELS = 1 << 26
_MAX_IFD_ENTRIES = 512

# TIFF type -> byte size (baseline subset; RATIONAL read as 2 LONGs)
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284
_TAG_COLORMAP = 320


def tiff_ifd(buf: bytes) -> "dict[int, list[int]] | None":
    """First-IFD tag values ``{tag: [int, ...]}`` (BYTE/SHORT/LONG
    entries; other types skipped), or None when not a parseable TIFF.
    Bounds-checked throughout; entry count capped (a header cannot
    demand an unbounded walk)."""
    try:
        return _ifd(buf)
    except (struct.error, IndexError, ValueError, OverflowError):
        return None


def _ifd(buf):
    if buf is None or len(buf) < 8:
        return None
    if buf[:2] == b"II":
        end = "<"
    elif buf[:2] == b"MM":
        end = ">"
    else:
        return None
    magic, ifd_off = struct.unpack_from(end + "HI", buf, 2)
    if magic != 42:
        return None
    if ifd_off + 2 > len(buf):
        return None
    n = struct.unpack_from(end + "H", buf, ifd_off)[0]
    if n == 0 or n > _MAX_IFD_ENTRIES:
        return None
    if ifd_off + 2 + 12 * n > len(buf):
        return None
    tags: dict[int, list[int]] = {}
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(end + "HHI", buf, base)
        size = _TYPE_SIZE.get(typ)
        if size is None or typ == 2 or typ == 5:  # ASCII/RATIONAL: skip
            continue
        total = size * count
        if total <= 4:
            off = base + 8
        else:
            off = struct.unpack_from(end + "I", buf, base + 8)[0]
            if off + total > len(buf):
                return None
        if count > _MAX_IFD_ENTRIES * 16:
            return None  # a tag cannot carry an unbounded value list
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = list(struct.unpack_from(end + fmt * count, buf, off))
    return tags or None


def tiff_dimensions(buf: bytes) -> "tuple[int, int] | None":
    """(width, height) from the first IFD, or None."""
    tags = tiff_ifd(buf)
    if not tags:
        return None
    w = tags.get(_TAG_WIDTH)
    h = tags.get(_TAG_HEIGHT)
    if not w or not h or w[0] <= 0 or h[0] <= 0:
        return None
    return w[0], h[0]


def _packbits_decode(raw: bytes, need: int) -> "bytes | None":
    """TIFF 6.0 §9 PackBits: n<128 → n+1 literals, n>128 → repeat next
    byte 257−n times, n==128 no-op.  Output capped at ``need`` bytes
    (the strip's declared pixel budget — the decode-bomb bound);
    returns None on truncation or shortfall."""
    out = bytearray()
    i = 0
    ln = len(raw)
    while i < ln and len(out) < need:
        n = raw[i]
        i += 1
        if n < 128:
            take = n + 1
            chunk = raw[i : i + take]
            if len(chunk) != take:
                return None
            out += chunk
            i += take
        elif n > 128:
            if i >= ln:
                return None
            out += raw[i : i + 1] * (257 - n)
            i += 1
        # n == 128: no-op per spec
    return bytes(out[:need]) if len(out) >= need else None


def decode_tiff(buf: bytes) -> "np.ndarray | None":
    """Pixel-decode a baseline TIFF to HxWx3 uint8 RGB (the shared
    decoder contract: gray replicates across channels, MinIsWhite
    inverts), or None outside scope / on bad bytes — never raises."""
    try:
        return _decode(buf)
    except (
        struct.error,
        IndexError,
        ValueError,
        KeyError,
        MemoryError,
        OverflowError,
    ):
        return None


def _decode(buf):
    tags = tiff_ifd(buf)
    if not tags:
        return None
    dims = tiff_dimensions(buf)
    if dims is None:
        return None
    w, h = dims
    if w * h > _MAX_PIXELS:
        return None
    comp = tags.get(_TAG_COMPRESSION, [1])[0]
    photo = tags.get(_TAG_PHOTOMETRIC)
    if photo is None:
        return None
    photo = photo[0]
    spp = tags.get(_TAG_SPP, [1])[0]
    bits = tags.get(_TAG_BITS, [1])
    if comp not in (1, 32773):
        return None
    if tags.get(_TAG_PLANAR, [1])[0] != 1:
        return None  # planar config 2 (separate planes) out of scope
    pal = None
    if photo == 2:
        if spp < 3 or len(bits) != spp or any(b != 8 for b in bits):
            return None
        bps = 8
    elif photo in (0, 1):
        if spp != 1 or bits not in ([8], [4]):
            return None
        bps = bits[0]
    elif photo == 3:  # palette: indices into the 16-bit ColorMap
        if spp != 1 or bits not in ([8], [4]):
            return None
        bps = bits[0]
        cmap = tags.get(_TAG_COLORMAP)
        if not cmap or len(cmap) != 3 * (1 << bps):
            return None
        # ColorMap stores 3*2^bps SHORTs (all R, all G, all B) in the
        # 0..65535 range; the 8-bit value is the high byte (v*257 is
        # the canonical widening, so >>8 inverts it exactly)
        pal = (
            np.array(cmap, dtype=np.uint16).reshape(3, 1 << bps).T >> 8
        ).astype(np.uint8)
    else:
        return None  # CMYK/YCbCr out of scope
    offsets = tags.get(_TAG_STRIP_OFFSETS)
    counts = tags.get(_TAG_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        return None
    rps = tags.get(_TAG_ROWS_PER_STRIP, [h])[0]
    if rps == 0 or rps == 0xFFFFFFFF:
        rps = h
    n_strips = (h + rps - 1) // rps
    if len(offsets) != n_strips:
        return None

    # rows are padded to byte boundaries (TIFF 6.0: each row begins on
    # a byte); at bps=8 row_bytes == w*spp
    row_bytes = (w * spp * bps + 7) // 8
    out = np.empty((h, w * spp), dtype=np.uint8)
    row = 0
    for off, cnt in zip(offsets, counts):
        nrows = min(rps, h - row)
        need = nrows * row_bytes
        raw = buf[off : off + cnt]
        if len(raw) != cnt:
            return None
        if comp == 1:
            if len(raw) < need:
                return None
            data = raw[:need]
        else:
            data = _packbits_decode(raw, need)
            if data is None:
                return None
        arr = np.frombuffer(data, dtype=np.uint8).reshape(nrows, row_bytes)
        if bps == 8:
            out[row : row + nrows] = arr
        else:  # 4-bit, MSB-first nibble order per spec
            nib = np.empty((nrows, row_bytes * 2), dtype=np.uint8)
            nib[:, 0::2] = arr >> 4
            nib[:, 1::2] = arr & 0x0F
            out[row : row + nrows] = nib[:, : w * spp]
        row += nrows
    if photo == 2:
        return (
            np.ascontiguousarray(out.reshape(h, w, spp)[..., :3])
            if spp > 3
            else out.reshape(h, w, 3)
        )
    g = out.reshape(h, w)
    if pal is not None:
        return np.ascontiguousarray(pal[g])
    if bps == 4:
        g = g * np.uint8(17)  # 0..15 -> 0..255 (the PNG scaling)
    if photo == 0:
        g = 255 - g  # MinIsWhite: 0 is white per spec
    return np.repeat(g[:, :, None], 3, axis=2)


def _packbits_encode(row: bytes) -> bytes:
    """Per-row PackBits encode (TIFF 6.0 recommends restarting at row
    boundaries): runs of >= 3 as (257-len, byte), literals in <= 128
    chunks."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        j = i
        while j + 1 < n and row[j + 1] == row[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i = j + 1
            continue
        # literal stretch: until the next >=3 run or 128 bytes
        k = i
        while k < n and k - i < 128:
            if (
                k + 2 < n
                and row[k] == row[k + 1] == row[k + 2]
            ):
                break
            k += 1
        out += bytes([k - i - 1]) + row[i:k]
        i = k
    return bytes(out)


def encode_tiff(
    px: np.ndarray,
    compression: int = 1,
    byte_order: str = "II",
    rows_per_strip: "int | None" = None,
    min_is_white: bool = False,
    palette: "np.ndarray | None" = None,
) -> bytes:
    """Baseline TIFF from an HxW (gray), HxWx3 (RGB), or — with
    ``palette`` (n<=256 x 3 uint8) — HxW palette-index uint8 array.
    ``compression``: 1 (none) or 32773 (PackBits, restarted per strip
    row); deterministic bytes.  Palette entries widen 8->16 bit as
    v*257 (the canonical ColorMap convention the decoder inverts)."""
    px = np.asarray(px, dtype=np.uint8)
    if palette is not None:
        palette = np.asarray(palette, dtype=np.uint8)
        if px.ndim != 2 or palette.ndim != 2 or palette.shape != (256, 3):
            if palette.ndim != 2 or palette.shape[1] != 3 or len(palette) > 256:
                raise ValueError("palette must be (<=256, 3) uint8")
            if px.ndim != 2:
                raise ValueError("palette images are HxW index arrays")
        if int(px.max(initial=0)) >= len(palette):
            raise ValueError("index outside the palette")
        if min_is_white:
            raise ValueError("min_is_white applies to grayscale only")
        spp, photo = 1, 3
        flat = px
    elif px.ndim == 2:
        spp, photo = 1, (0 if min_is_white else 1)
        flat = (255 - px) if min_is_white else px
    elif px.ndim == 3 and px.shape[2] == 3:
        if min_is_white:
            raise ValueError("min_is_white applies to grayscale only")
        spp, photo = 3, 2
        flat = px
    else:
        raise ValueError(f"expected HxW or HxWx3 uint8, got {px.shape}")
    if compression not in (1, 32773):
        raise ValueError(f"compression must be 1 or 32773, got {compression}")
    if byte_order not in ("II", "MM"):
        raise ValueError(f"byte_order must be 'II' or 'MM', got {byte_order}")
    end = "<" if byte_order == "II" else ">"
    h, w = flat.shape[:2]
    rps = rows_per_strip or h
    rows = flat.reshape(h, w * spp)

    strips: list[bytes] = []
    for r0 in range(0, h, rps):
        chunk = rows[r0 : r0 + rps]
        if compression == 1:
            strips.append(chunk.tobytes())
        else:
            strips.append(
                b"".join(_packbits_encode(bytes(r)) for r in chunk)
            )

    n_strips = len(strips)
    entries: list[tuple[int, int, int, "int | list[int] | None"]] = []
    external = bytearray()

    def _add(tag, typ, values):
        size = _TYPE_SIZE[typ]
        total = size * len(values)
        if total <= 4:
            entries.append((tag, typ, len(values), list(values)))
        else:
            entries.append((tag, typ, len(values), ("ext", len(external))))
            fmt = {3: "H", 4: "I"}[typ]
            external.extend(
                struct.pack(end + fmt * len(values), *values)
            )

    _add(_TAG_WIDTH, 4, [w])
    _add(_TAG_HEIGHT, 4, [h])
    _add(_TAG_BITS, 3, [8] * spp)
    _add(_TAG_COMPRESSION, 3, [compression])
    _add(_TAG_PHOTOMETRIC, 3, [photo])
    _add(_TAG_STRIP_OFFSETS, 4, [0] * n_strips)  # patched below
    _add(_TAG_SPP, 3, [spp])
    _add(_TAG_ROWS_PER_STRIP, 4, [rps])
    _add(_TAG_STRIP_COUNTS, 4, [len(s) for s in strips])
    if palette is not None:
        # full 3*256 SHORT map (pad short palettes with zeros), R G B planes
        table = np.zeros((256, 3), dtype=np.uint16)
        table[: len(palette)] = palette.astype(np.uint16) * 257
        _add(_TAG_COLORMAP, 3, [int(v) for v in table.T.reshape(-1)])

    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    ext_off = ifd_off + ifd_size
    data_off = ext_off + len(external)
    strip_offsets = []
    acc = data_off
    for s in strips:
        strip_offsets.append(acc)
        acc += len(s)
    # patch the strip-offset values (inline or external)
    for idx, (tag, typ, cnt, val) in enumerate(entries):
        if tag == _TAG_STRIP_OFFSETS:
            if isinstance(val, tuple):
                fmt = end + "I" * n_strips
                struct.pack_into(fmt, external, val[1], *strip_offsets)
            else:
                entries[idx] = (tag, typ, cnt, strip_offsets)

    out = bytearray()
    out += (b"II" if end == "<" else b"MM") + struct.pack(end + "HI", 42, ifd_off)
    out += struct.pack(end + "H", len(entries))
    for tag, typ, cnt, val in sorted(entries):
        out += struct.pack(end + "HHI", tag, typ, cnt)
        if isinstance(val, tuple):
            out += struct.pack(end + "I", ext_off + val[1])
        else:
            fmt = {1: "B", 3: "H", 4: "I"}[typ]
            cell = struct.pack(end + fmt * cnt, *val)
            out += cell + b"\x00" * (4 - len(cell))
    out += struct.pack(end + "I", 0)  # no next IFD
    out += external
    for s in strips:
        out += s
    return bytes(out)
