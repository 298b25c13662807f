"""GIF codec — pure numpy/stdlib, no image library.

Third member of the multimodal codec boundary (COVERAGE.md):
``operators/jpeg.py`` covers the DCT family, ``operators/png.py`` the
deflate family, this module the LZW family.  Chosen over WebP by
published web-corpus share vs implementation surface (COVERAGE.md
"codec breadth" row): GIF still rides ~1 in 5 websites (W3Techs image
format usage) and is the dominant short-animation container feeding
frame-sampling / scene-cut pipelines, while WebP-lossy requires a full
VP8 intra-frame decoder (boolean arithmetic coder, 4x4/16x16 spatial
prediction, in-loop deblocking) — far outside the pure-numpy contract
(the skip and its forfeited share are recorded in COVERAGE.md).

Scope (documented, asserted by tests/test_gif_codec.py):
* DECODE: GIF87a/GIF89a; global and local color tables; sequential
  and interlaced frames (the 4-pass row order); spec-complete LZW
  (variable code width 3..12, clear codes, deferred clear at a full
  table, EOI); Graphic Control Extension transparency; ANIMATION
  compositing with disposal methods 0/1 (leave), 2 (restore
  background), 3 (restore previous).  ``decode_gif`` returns the
  FIRST composited frame as HxWx3 uint8 RGB — the exact output
  contract of ``decode_baseline_jpeg``/``decode_png`` — and
  ``decode_gif_frames`` returns every composited frame plus its delay
  for frame sampling.  Never raises on bad bytes; hostile headers are
  rejected at parse time (``_MAX_PIXELS``/``_MAX_FRAMES``, the jpeg/
  png decode-bomb discipline).
* ENCODE: GIF89a from palette-indexed frames — REAL LZW compression
  (table reset on overflow), optional interlace, per-frame placement,
  delay, transparency and disposal, NETSCAPE loop block.  Exists so
  tests synthesize genuine variable-width LZW streams whose decode
  must be pixel-exact (GIF is lossless given the palette).

Throughput: LZW is byte-serial Python — correct and fast enough for
thumbnail/frame-sample work inside Arrow-batched ``mapInPandas``, with
the same documented native-codec swap point as JPEG/PNG for 100 TB
bulk decode (one dispatch function, zero plan changes).

Format per the CompuServe GIF89a specification (1990; W3C mirror) —
no reference-engine counterpart (the reference has no media path).
"""

from __future__ import annotations

import struct

import numpy as np

# decode-bomb guards (the png.py/jpeg.py discipline): reject hostile
# headers before allocating canvases or walking per-frame LZW streams
_MAX_PIXELS = 1 << 26
_MAX_FRAMES = 4096

# interlace pass layout: (row_start, row_step)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_dimensions(buf: bytes) -> "tuple[int, int] | None":
    """(width, height) of the logical screen, or None when not a GIF."""
    if buf is None or len(buf) < 13 or buf[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack_from("<HH", buf, 6)
    if w == 0 or h == 0:
        return None
    return int(w), int(h)


def _lzw_decode(data: bytes, min_code_size: int, expected: int):
    """GIF LZW (spec appendix): LSB-first variable-width codes.
    Returns ``expected`` indices as uint8, or None on a corrupt
    stream."""
    if not 2 <= min_code_size <= 11:
        return None
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev = None
    n = len(data)
    while len(out) < expected:
        while nbits < code_size:
            if pos >= n:
                return None  # ran out of codes before the pixels
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return None  # EOI before enough pixels
        if prev is None:
            if code >= clear:
                return None  # first code after clear must be a root
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            return None
        out += entry
        prev = entry
        # width grows when the NEXT code to assign would not fit;
        # at 12 bits the table freezes until a clear (deferred clear)
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    return np.frombuffer(bytes(out[:expected]), dtype=np.uint8)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF LZW compression (encoder twin): emits an initial clear,
    resets the table at 4096 entries, grows the code width exactly
    when the decoder does."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    seq = b""
    for b in bytes(indices.astype(np.uint8).tobytes()):
        cand = seq + bytes([b])
        if cand in table:
            seq = cand
            continue
        emit(table[seq], code_size)
        if next_code < 4096:
            table[cand] = next_code
            # the decoder widens when ITS table size reaches
            # 2^code_size; its table trails the encoder's by one
            # entry, so widen exactly when the newly ASSIGNED index
            # equals 2^code_size (decoder assigns that same index one
            # code later, right before its next read)
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        seq = bytes([b])
    if seq:
        emit(table[seq], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _deinterlace(rows: np.ndarray, h: int) -> np.ndarray:
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE:
        n = len(range(start, h, step))
        out[start:h:step] = rows[src : src + n]
        src += n
    return out


def _interlace_order(h: int) -> np.ndarray:
    order = []
    for start, step in _INTERLACE:
        order.extend(range(start, h, step))
    return np.asarray(order, dtype=np.int64)


def decode_gif(buf: bytes) -> "np.ndarray | None":
    """First composited frame as HxWx3 uint8 RGB (the shared decoder
    contract), or None outside scope / on bad bytes — never raises."""
    frames = decode_gif_frames(buf, max_frames=1)
    return frames[0][0] if frames else None


def decode_gif_frames(
    buf: bytes, max_frames: "int | None" = None
) -> "list[tuple[np.ndarray, int]] | None":
    """All composited frames as [(HxWx3 uint8 RGB, delay_ms), ...] in
    presentation order (animation semantics: transparency + disposal
    applied against the logical-screen canvas), or None."""
    try:
        return _decode_frames(buf, max_frames)
    except (
        ValueError,
        IndexError,
        struct.error,
        KeyError,
        MemoryError,
        OverflowError,
    ):
        return None


def gif_frame_delays(buf: bytes) -> "list[int] | None":
    """Per-frame presentation delays (ms) by STRUCTURAL scan only:
    walks the block stream with the same descriptor / color-table /
    sub-block length validation as the pixel decoder, but never
    entropy-decodes or composites — O(input bytes) work, O(frames)
    ints of output, zero canvas allocation.  This is the animation-
    metadata path for untrusted payloads (``decode_gif_meta``): a
    decode bomb costs a scan here, not a canvas copy per frame.  LZW
    validity is deliberately NOT checked — ``decode_gif_frames`` is
    the pixel-level contract.  None on invalid container structure."""
    try:
        return _frame_delays(buf)
    except (ValueError, IndexError, struct.error, OverflowError):
        return None


def _frame_delays(buf):
    dims = gif_dimensions(buf)
    if dims is None:
        return None
    w, h = dims
    if w * h > _MAX_PIXELS:
        return None
    packed = buf[10]
    pos = 13
    have_gct = bool(packed & 0x80)
    if have_gct:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(buf):
            return None
        pos += 3 * n

    def skip_subblocks(p):
        while True:
            if p >= len(buf):
                return None
            size = buf[p]
            p += 1
            if size == 0:
                return p
            if p + size > len(buf):
                return None
            p += size

    delays: list[int] = []
    delay_ms = 0
    while pos < len(buf):
        marker = buf[pos]
        pos += 1
        if marker == 0x3B:
            break
        if marker == 0x21:
            if pos >= len(buf):
                return None
            label = buf[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension: read body
                chunks = []
                while True:
                    if pos >= len(buf):
                        return None
                    size = buf[pos]
                    pos += 1
                    if size == 0:
                        break
                    blk = buf[pos : pos + size]
                    if len(blk) != size:
                        return None
                    chunks.append(blk)
                    pos += size
                body = b"".join(chunks)
                if len(body) < 4:
                    return None
                delay_ms = int.from_bytes(body[1:3], "little") * 10
            else:
                pos = skip_subblocks(pos)
                if pos is None:
                    return None
            continue
        if marker != 0x2C:
            return None
        if pos + 9 > len(buf):
            return None
        left, top, fw, fh = struct.unpack_from("<HHHH", buf, pos)
        fpacked = buf[pos + 8]
        pos += 9
        if fw == 0 or fh == 0 or left + fw > w or top + fh > h:
            return None
        if fpacked & 0x80:
            nl = 2 << (fpacked & 0x07)
            if pos + 3 * nl > len(buf):
                return None
            pos += 3 * nl
        elif not have_gct:
            return None  # no palette anywhere: the decoder rejects too
        if pos >= len(buf):
            return None
        pos += 1  # LZW minimum code size
        pos = skip_subblocks(pos)
        if pos is None:
            return None
        delays.append(delay_ms)
        if len(delays) >= _MAX_FRAMES:
            return delays
        delay_ms = 0
    return delays if delays else None


def _decode_frames(buf, max_frames):
    dims = gif_dimensions(buf)
    if dims is None:
        return None
    w, h = dims
    if w * h > _MAX_PIXELS:
        return None
    packed = buf[10]
    bg_index = buf[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(buf[pos : pos + 3 * n], dtype=np.uint8)
        if gct.size != 3 * n:
            return None
        gct = gct.reshape(n, 3)
        pos += 3 * n

    if gct is not None and bg_index < len(gct):
        bg = gct[bg_index]
    else:
        bg = np.zeros(3, dtype=np.uint8)
    canvas = np.empty((h, w, 3), dtype=np.uint8)
    canvas[:] = bg

    frames: list[tuple[np.ndarray, int]] = []
    # pending Graphic Control Extension state (applies to next image)
    transparent = None
    disposal = 0
    delay_ms = 0

    def read_subblocks(p):
        chunks = []
        while True:
            if p >= len(buf):
                return None, p
            size = buf[p]
            p += 1
            if size == 0:
                return b"".join(chunks), p
            blk = buf[p : p + size]
            if len(blk) != size:
                return None, p
            chunks.append(blk)
            p += size

    while pos < len(buf):
        marker = buf[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension
            if pos >= len(buf):
                return None
            label = buf[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                body, pos = read_subblocks(pos)
                if body is None or len(body) < 4:
                    return None
                flags = body[0]
                disposal = (flags >> 2) & 0x7
                delay_ms = int.from_bytes(body[1:3], "little") * 10
                transparent = body[3] if flags & 0x1 else None
            else:  # comment / app / plain-text: skip the sub-blocks
                blk, pos = read_subblocks(pos)
                if blk is None:
                    return None  # truncated extension: don't desync
            continue
        if marker != 0x2C:  # image descriptor is the only other block
            return None
        if pos + 9 > len(buf):
            return None
        left, top, fw, fh = struct.unpack_from("<HHHH", buf, pos)
        fpacked = buf[pos + 8]
        pos += 9
        if fw == 0 or fh == 0 or left + fw > w or top + fh > h:
            return None
        lct = None
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            lct = np.frombuffer(buf[pos : pos + 3 * n], dtype=np.uint8)
            if lct.size != 3 * n:
                return None
            lct = lct.reshape(n, 3)
            pos += 3 * n
        pal = lct if lct is not None else gct
        if pal is None:
            return None
        if pos >= len(buf):
            return None
        min_code_size = buf[pos]
        pos += 1
        data, pos = read_subblocks(pos)
        if data is None:
            return None
        idx = _lzw_decode(data, min_code_size, fw * fh)
        if idx is None or int(idx.max(initial=0)) >= len(pal):
            return None
        idx = idx.reshape(fh, fw)
        if fpacked & 0x40:  # interlaced
            idx = _deinterlace(idx, fh)

        saved = (
            canvas[top : top + fh, left : left + fw].copy()
            if disposal == 3
            else None
        )
        region = canvas[top : top + fh, left : left + fw]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = pal[idx[mask]]
        else:
            region[:] = pal[idx]
        # cumulative decoded-output budget: each presented frame is a
        # full w*h canvas copy, so a tiny input with a large screen and
        # many 1x1 sub-frames multiplies memory (4.7 KB -> 603 MB
        # measured) — the per-frame and per-screen guards alone don't
        # compose.  Stop once total output pixels would exceed
        # _MAX_PIXELS (<= 192 MB RGB per payload, hard bound).
        if (len(frames) + 1) * (w * h) > _MAX_PIXELS:
            return frames if frames else None
        frames.append((canvas.copy(), delay_ms))
        if max_frames is not None and len(frames) >= max_frames:
            return frames
        if len(frames) >= _MAX_FRAMES:
            return frames  # hostile frame-count multiplier: stop here
        # dispose AFTER presentation, before the next frame draws
        if disposal == 2:
            canvas[top : top + fh, left : left + fw] = bg
        elif disposal == 3 and saved is not None:
            canvas[top : top + fh, left : left + fw] = saved
        transparent = None
        disposal = 0
        delay_ms = 0
    return frames if frames else None


def encode_gif(
    frames,
    palette: np.ndarray,
    delays_ms=None,
    transparent: "int | None" = None,
    disposal: "int | list[int]" = 0,
    interlace: bool = False,
    loop: "int | None" = None,
) -> bytes:
    """GIF89a from palette-indexed frames.  Each frame is an HxW uint8
    index array, or ``(indices, left, top)`` for a sub-region frame.
    The logical screen is the first frame's extent; later frames must
    fit inside it.  ``palette`` is (n<=256, 3) uint8 (padded to the
    next power of two as the format requires).  Deterministic bytes."""
    palette = np.asarray(palette, dtype=np.uint8)
    if palette.ndim != 2 or palette.shape[1] != 3 or not 1 <= len(palette) <= 256:
        raise ValueError(f"palette must be (1..256, 3) uint8, got {palette.shape}")
    norm = []
    for f in frames:
        if isinstance(f, tuple):
            arr, left, top = f
        else:
            arr, left, top = f, 0, 0
        arr = np.asarray(arr, dtype=np.uint8)
        if arr.ndim != 2:
            raise ValueError("each frame must be an HxW index array")
        if int(arr.max(initial=0)) >= len(palette):
            raise ValueError("frame index outside the palette")
        norm.append((arr, int(left), int(top)))
    if not norm:
        raise ValueError("need at least one frame")
    h, w = norm[0][0].shape
    if norm[0][1] or norm[0][2]:
        raise ValueError("the first frame defines the screen: left=top=0")
    for arr, left, top in norm[1:]:
        if top + arr.shape[0] > h or left + arr.shape[1] > w:
            raise ValueError("frame exceeds the logical screen")

    # color-table size field: 2^(k+1) entries
    k = max(1, (len(palette) - 1).bit_length()) - 1
    n_entries = 2 << k
    table = np.zeros((n_entries, 3), dtype=np.uint8)
    table[: len(palette)] = palette

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (k & 0x7), 0, 0])  # GCT flag+size, bg=0, no aspect
    out += table.tobytes()
    if loop is not None:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01"
        out += struct.pack("<H", loop) + b"\x00"

    delays = list(delays_ms or [0] * len(norm))
    disposals = (
        list(disposal) if isinstance(disposal, (list, tuple))
        else [disposal] * len(norm)
    )
    if len(delays) != len(norm) or len(disposals) != len(norm):
        raise ValueError(
            f"delays_ms/disposal must match the frame count "
            f"({len(delays)}/{len(disposals)} vs {len(norm)})"
        )
    min_code_size = max(2, k + 1)
    for i, (arr, left, top) in enumerate(norm):
        if delays[i] or transparent is not None or disposals[i]:
            flags = (disposals[i] & 0x7) << 2
            tr = 0
            if transparent is not None:
                flags |= 0x1
                tr = transparent
            out += b"\x21\xf9\x04" + bytes([flags])
            out += struct.pack("<H", delays[i] // 10) + bytes([tr, 0])
        fh, fw = arr.shape
        out += b"\x2c" + struct.pack("<HHHH", left, top, fw, fh)
        out += bytes([0x40 if interlace else 0x00])
        rows = arr[_interlace_order(fh)] if interlace else arr
        out += bytes([min_code_size])
        lzw = _lzw_encode(rows.reshape(-1), min_code_size)
        for off in range(0, len(lzw), 255):
            blk = lzw[off : off + 255]
            out += bytes([len(blk)]) + blk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
