"""Multimodal column processing: image/audio/video as opaque binary.

Schema convention: a multimodal column is ``binary`` payload plus a
typed metadata struct:

    media: binary
    media_meta: struct<kind string, mime string, width int, height int,
                       duration_ms long, sample_rate int>

The decode kernel is REAL for the three container formats a pure
numpy/stdlib environment can parse — uncompressed BMP images, PCM WAV
audio, and MJPEG-in-AVI video (RIFF header walks + pixel/sample
statistics; AVI frames are demuxed to per-frame JPEG chunks whose
dimensions come from a JPEG marker walk).  Pixel-decoding a JPEG scan
needs a codec library — that single step dispatches through
``decode_jpeg_pixels`` (returns None here); a deployment drops
Pillow/ffmpeg into that one hook without touching the demuxer or the
Spark plumbing.  Everything else — container walk, frame offsets,
timestamps, dimensions, sampling cadence — is real and tested against
synthesized-but-valid container bytes.

Scale notes:
* binary payloads make rows wide — decode batches are re-chunked by
  row count so a partition of large payloads can't blow Python-worker
  memory;
* decode is mapInPandas (Arrow columnar transfer, one Python worker per
  core), the one place in the engine where Python in the executor path
  is justified — the work is per-byte media decoding, not relational;
* repartitioning before decode distributes payload bytes, not row
  counts, when sizes are skewed (``repartition_for_payload``).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)


# ----------------------------------------------------------------------
# real decoders (pure numpy / stdlib)
def bmp_stride(width: int) -> int:
    """BMP rows pad to 4-byte boundaries."""
    return (3 * width + 3) // 4 * 4


def decode_bmp(payload: bytes) -> dict | None:
    """Parse an uncompressed 24-bit BI_RGB BMP: header fields + mean
    over the pixel bytes (excluding row padding).  Returns None when the
    payload is not a parseable BMP."""
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        return None
    offset, = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp, = struct.unpack_from("<H", payload, 28)
    compression, = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0 or width <= 0 or height == 0:
        return None
    h = abs(height)  # negative height = top-down row order
    stride = bmp_stride(width)
    pixels_end = offset + stride * h
    if pixels_end > len(payload):
        return None
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=offset)
    pixel_bytes = rows.reshape(h, stride)[:, : 3 * width]
    return {
        "kind": "image",
        "width": width,
        "height": h,
        "n_bytes": len(payload),
        "sample_rate": None,
        "duration_ms": None,
        # mean over real pixel bytes only — padding excluded
        "value_mean": float(pixel_bytes.sum(dtype=np.int64)) / pixel_bytes.size,
    }


def decode_wav(payload: bytes) -> dict | None:
    """Parse a PCM WAV: RIFF chunk walk for fmt/data, then RMS over the
    int16 samples.  Returns None when not a parseable PCM WAV."""
    if payload is None or len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, sample_rate, bits, channels, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size, = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and size >= 16:
            fmt_code, channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            bits, = struct.unpack_from("<H", body, 14)
            if fmt_code != 1:  # PCM only
                return None
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks pad to even offsets
    if sample_rate is None or data is None or bits != 16:
        return None
    samples = np.frombuffer(data, dtype="<i2")
    n_frames = len(samples) // max(channels or 1, 1)
    rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))) if len(samples) else 0.0
    return {
        "kind": "audio",
        "width": None,
        "height": None,
        "n_bytes": len(payload),
        "sample_rate": int(sample_rate),
        "duration_ms": int(n_frames * 1000 // sample_rate),
        "value_mean": rms,
    }


# ----------------------------------------------------------------------
# MJPEG-in-AVI video: RIFF container demux + JPEG marker walk
def jpeg_dimensions(buf: bytes) -> tuple[int, int] | None:
    """(width, height) from a JPEG's SOF marker — a pure marker walk
    (SOI, skip segments by length, read SOF0-3/5-7/9-11/13-15).  No
    codec: this parses the header, not the entropy-coded scan.  Returns
    None when the buffer is not a well-formed JPEG header."""
    if buf is None or len(buf) < 4 or buf[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            return None
        marker = buf[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD9:  # standalone
            pos += 2
            continue
        seg_len = int.from_bytes(buf[pos + 2 : pos + 4], "big")
        if seg_len < 2 or pos + 2 + seg_len > len(buf):
            return None
        # SOF0..SOF15 except DHT(C4)/JPG(C8)/DAC(CC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if seg_len < 7:
                return None
            height = int.from_bytes(buf[pos + 5 : pos + 7], "big")
            width = int.from_bytes(buf[pos + 7 : pos + 9], "big")
            return width, height
        if marker == 0xDA:  # SOS: scan data follows; header walk is done
            return None
        pos += 2 + seg_len
    return None


def decode_jpeg_pixels(frame: bytes) -> "np.ndarray | None":
    """Codec dispatch point: pixel-decode one JPEG frame to an HxWx3
    uint8 array.  Baseline sequential (SOF0 — the MJPEG frame format)
    AND progressive (SOF2 — the majority of web JPEGs) decode through
    the pure-numpy codec in ``operators/jpeg.py`` (Huffman scan +
    successive-approximation/spectral-selection passes + IDCT, real
    entropy decoding, no codec library); Pillow/libjpeg takes
    precedence when installed, covering arithmetic/12-bit variants and
    native-speed bulk decode.  Returns None for formats neither path
    handles — callers emit header-level features only."""
    try:  # pragma: no cover - exercised only where Pillow exists
        import io

        from PIL import Image  # noqa: F401

        return np.asarray(Image.open(io.BytesIO(frame)).convert("RGB"))
    except ImportError:
        from tube_spark.operators.jpeg import decode_baseline_jpeg

        return decode_baseline_jpeg(frame)


def parse_avi(payload: bytes) -> dict | None:
    """Demux an AVI container (RIFF header walk, same style as the
    BMP/WAV parsers): main-header timing/dims + the (offset, size) of
    every video frame chunk in the ``movi`` list.  Pure stdlib — reads
    structure, not pixels.  Returns None when not a parseable AVI."""
    if (
        payload is None
        or len(payload) < 24
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"AVI "
    ):
        return None
    usec_per_frame = width = height = None
    total_frames = 0
    frames: list[tuple[int, int]] = []

    def walk(pos: int, end: int, in_movi: bool) -> None:
        nonlocal usec_per_frame, width, height, total_frames
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            size, = struct.unpack_from("<I", payload, pos + 4)
            body_start = pos + 8
            if body_start + size > end:
                break  # truncated chunk
            if cid in (b"LIST", b"RIFF"):
                list_type = payload[body_start : body_start + 4]
                walk(
                    body_start + 4,
                    body_start + size,
                    in_movi or list_type == b"movi",
                )
            elif cid == b"avih" and size >= 40:
                usec_per_frame, = struct.unpack_from("<I", payload, body_start)
                total_frames, = struct.unpack_from("<I", payload, body_start + 16)
                width, = struct.unpack_from("<I", payload, body_start + 32)
                height, = struct.unpack_from("<I", payload, body_start + 36)
            elif in_movi and len(cid) == 4 and cid[2:4] in (b"dc", b"db"):
                # ##dc = compressed / ##db = uncompressed video frame
                frames.append((body_start, size))
            pos = body_start + size + (size % 2)  # chunks pad to even

    walk(12, len(payload), False)
    if usec_per_frame is None or not usec_per_frame:
        return None
    return {
        "usec_per_frame": int(usec_per_frame),
        "width": int(width) if width else None,
        "height": int(height) if height else None,
        "n_frames": len(frames) or int(total_frames),
        "frames": frames,
    }


def decode_avi(payload: bytes) -> dict | None:
    """AVI → video stats for ``decode_media``: dims from the main
    header, duration from usec_per_frame × demuxed frame count."""
    avi = parse_avi(payload)
    if avi is None:
        return None
    return {
        "kind": "video",
        "width": avi["width"],
        "height": avi["height"],
        "n_bytes": len(payload),
        "sample_rate": None,
        "duration_ms": int(avi["n_frames"] * avi["usec_per_frame"] // 1000),
        "value_mean": None,
    }


def decode_png_meta(payload: bytes) -> dict | None:
    """PNG → the decode_bmp-shaped metadata dict: IHDR dims always;
    value_mean from the REAL pixel decode (operators/png.py) when the
    payload decodes (every legal depth now), NULL when only the
    header parses (corrupt stream) — the degrade-to-header
    contract."""
    from tube_spark.operators.png import decode_png, png_dimensions

    dims = png_dimensions(payload)
    if dims is None:
        return None
    px = decode_png(payload)
    return {
        "kind": "image",
        "width": dims[0],
        "height": dims[1],
        "n_bytes": len(payload),
        "sample_rate": None,
        "duration_ms": None,
        "value_mean": float(px.mean()) if px is not None else None,
    }


def decode_gif_meta(payload: bytes) -> dict | None:
    """GIF → the decode_bmp-shaped metadata dict: screen dims from the
    header always; a single-frame GIF is kind="image", an animation is
    kind="video" with duration_ms summed over frame delays (the AVI
    contract); value_mean from the REAL first composited frame
    (operators/gif.py), NULL when only the header parses — the
    degrade-to-header contract.

    Frame count and duration come from ``gif_frame_delays`` — a
    structural scan of the GCE delay fields that never composites, so
    a decode-bomb animation (tiny input, huge screen, thousands of
    sub-frames) costs a byte walk here, not a canvas copy per frame —
    and only the FIRST frame is pixel-decoded (one canvas) for
    value_mean."""
    from tube_spark.operators.gif import decode_gif_frames, gif_frame_delays, gif_dimensions

    dims = gif_dimensions(payload)
    if dims is None:
        return None
    delays = gif_frame_delays(payload)
    n = len(delays) if delays else 0
    first = decode_gif_frames(payload, max_frames=1)
    return {
        "kind": "video" if n > 1 else "image",
        "width": dims[0],
        "height": dims[1],
        "n_bytes": len(payload),
        "sample_rate": None,
        "duration_ms": sum(delays) if n > 1 else None,
        "value_mean": float(first[0][0].mean()) if first else None,
    }


def webp_dimensions(buf: bytes) -> "tuple[int, int] | None":
    """(width, height) from a WebP container (RFC 9649): VP8X extended
    header (24-bit canvas dims), VP8L lossless signature (14-bit
    packed dims), or a VP8 lossy KEYFRAME header (start code
    9D 01 2A + 14-bit dims).  Header walk only — WebP PIXEL decode is
    a full VP8/VP8L decoder and deliberately out of the pure-numpy
    scope (COVERAGE.md codec-breadth decision); payloads degrade to
    these header dims exactly like non-baseline JPEG."""
    if buf is None or len(buf) < 20 or buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
        return None
    pos = 12
    while pos + 8 <= len(buf):
        fourcc = buf[pos : pos + 4]
        size, = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8 : pos + 8 + size]
        if len(body) != size:
            return None
        if fourcc == b"VP8X" and size >= 10:
            w = 1 + int.from_bytes(body[4:7], "little")
            h = 1 + int.from_bytes(body[7:10], "little")
            return w, h
        if fourcc == b"VP8L" and size >= 5 and body[0] == 0x2F:
            bits = int.from_bytes(body[1:5], "little")
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            return w, h
        if fourcc == b"VP8 " and size >= 10:
            if body[0] & 0x1:  # interframe: no dims in-stream
                return None
            if body[3:6] != b"\x9d\x01\x2a":
                return None
            w = int.from_bytes(body[6:8], "little") & 0x3FFF
            h = int.from_bytes(body[8:10], "little") & 0x3FFF
            return (w, h) if w and h else None
        pos += 8 + size + (size % 2)  # RIFF chunks pad to even
    return None


def decode_webp_meta(payload: bytes) -> dict | None:
    """WebP → header-dims-only metadata (kind="image", value_mean
    NULL): the degrade-to-header contract for the one major web format
    whose pixel decode is out of pure-numpy scope (a deployment drops
    Pillow/libwebp into decode_jpeg_pixels-style hooks for bulk
    decode)."""
    dims = webp_dimensions(payload)
    if dims is None:
        return None
    return {
        "kind": "image",
        "width": dims[0],
        "height": dims[1],
        "n_bytes": len(payload),
        "sample_rate": None,
        "duration_ms": None,
        "value_mean": None,
    }


def decode_jpeg_meta(payload: bytes) -> dict | None:
    """Bare JPEG → the decode_bmp-shaped metadata dict: SOF dims from
    the marker walk always; value_mean from the REAL pixel decode
    (baseline or progressive, operators/jpeg.py) when in the codec's
    scope, NULL when only the header parses (arithmetic/12-bit) — the
    degrade-to-header contract.  The majority format of a web image
    corpus; before r13 a bare .jpg payload fell through to
    kind="unknown" (only MJPEG-inside-AVI dispatched)."""
    if payload is None or len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    dims = jpeg_dimensions(payload)
    if dims is None:
        return None
    px = decode_jpeg_pixels(payload)
    return {
        "kind": "image",
        "width": dims[0],
        "height": dims[1],
        "n_bytes": len(payload),
        "sample_rate": None,
        "duration_ms": None,
        "value_mean": float(px.mean()) if px is not None else None,
    }


def decode_tiff_meta(payload: bytes) -> dict | None:
    """Baseline TIFF → the decode_bmp-shaped metadata dict: dims from
    the IFD walk always; value_mean from the REAL pixel decode
    (operators/tiff.py — uncompressed / PackBits, gray / RGB, both
    byte orders), NULL when only the header parses (LZW/tiled/16-bit
    variants) — the degrade-to-header contract."""
    from tube_spark.operators.tiff import decode_tiff, tiff_dimensions

    if payload is None or len(payload) < 8 or payload[:2] not in (b"II", b"MM"):
        return None
    dims = tiff_dimensions(payload)
    if dims is None:
        return None
    px = decode_tiff(payload)
    return {
        "kind": "image",
        "width": dims[0],
        "height": dims[1],
        "n_bytes": len(payload),
        "sample_rate": None,
        "duration_ms": None,
        "value_mean": float(px.mean()) if px is not None else None,
    }


def decode_media(payload: bytes) -> dict:
    """Dispatch on magic bytes: BMP/PNG/GIF/JPEG → image stats
    (animated GIF → video stats), WebP → header dims (pixel decode out
    of scope), WAV → audio stats, AVI → video stats, anything else →
    kind="unknown" with byte stats only (the hook where a deployment
    plugs Pillow/ffmpeg)."""
    for dec in (
        decode_bmp, decode_png_meta, decode_gif_meta, decode_webp_meta,
        decode_tiff_meta, decode_jpeg_meta, decode_wav, decode_avi
    ):
        out = dec(payload)
        if out is not None:
            return out
    return {
        "kind": "unknown",
        "width": None,
        "height": None,
        "n_bytes": len(payload) if payload is not None else 0,
        "sample_rate": None,
        "duration_ms": None,
        "value_mean": float(np.frombuffer(payload, dtype=np.uint8).mean())
        if payload else None,
    }


# ----------------------------------------------------------------------
# deterministic synthesizers (testdata carries no real media; these
# build REAL container bytes the decoders above genuinely parse)
def synthesize_bmp(seed: int, width: int, height: int) -> bytes:
    """A valid 24-bit BI_RGB BMP whose pixel byte *i* is
    ``(seed*31 + i) % 256`` (padding bytes zero)."""
    stride = bmp_stride(width)
    size = 54 + stride * height
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", size, 0, 0, 54, 40, width, height, 1, 24, 0,
        stride * height, 2835, 2835, 0, 0,
    )
    idx = np.arange(3 * width * height, dtype=np.int64)
    pix = ((seed * 31 + idx) % 256).astype(np.uint8).reshape(height, 3 * width)
    rows = np.zeros((height, stride), dtype=np.uint8)
    rows[:, : 3 * width] = pix
    return header + rows.tobytes()


def synthesize_wav(seed: int, n_samples: int, sample_rate: int = 8000) -> bytes:
    """A valid mono 16-bit PCM WAV whose sample *i* is
    ``(seed*7 + i*13) % 1024 - 512``."""
    idx = np.arange(n_samples, dtype=np.int64)
    samples = ((seed * 7 + idx * 13) % 1024 - 512).astype("<i2")
    data = samples.tobytes()
    header = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16, 1, 1,
        sample_rate, sample_rate * 2, 2, 16, b"data", len(data),
    )
    return header + data


def synthesize_media_col(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic ``media`` binary column: ids divisible by
    4 get an MJPEG AVI (``id%5+2`` frames at 10 fps, 32×24), other even
    ids a BMP (width ``id%13+1`` × height ``id%7+1``), odd ids a WAV
    (``id%50+10`` samples at 8 kHz) — real container bytes for
    exercising all three decoders when the corpus has no media."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def synth(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            if i % 4 == 0:
                out.append(synthesize_avi(i, i % 5 + 2))
            elif i % 2 == 0:
                out.append(synthesize_bmp(i, i % 13 + 1, i % 7 + 1))
            else:
                out.append(synthesize_wav(i, i % 50 + 10))
        return pd.Series(out)

    return df.withColumn("media", synth(F.col(id_col)))


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("value_mean", T.DoubleType()),
    ]
)

_DECODE_COLS = [f.name for f in _DECODE_SCHEMA.fields]


def decode_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "media",
    rows_per_batch: int = 256,
) -> DataFrame:
    """Extract media features from binary payloads via Arrow-batched
    ``mapInPandas`` over the real BMP/WAV decoders.  Batch size is
    bounded so a partition of large payloads can't blow Python-worker
    memory."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), rows_per_batch):
                chunk = pdf.iloc[start : start + rows_per_batch]
                feats = [decode_media(p) for p in chunk[payload_col]]
                out = pd.DataFrame(feats)
                out.insert(0, "doc_id", chunk[id_col].values)
                yield out[_DECODE_COLS]

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema=_DECODE_SCHEMA
    )


def repartition_for_payload(
    df: DataFrame, payload_col: str = "media", target_bytes: int = 64 * 1024 * 1024
) -> DataFrame:
    """Repartition so each partition holds ≈target_bytes of payload.

    Uses a cheap salt keyed on payload length buckets — heavy media rows
    spread across partitions instead of clustering by original file
    order.  (At 100 TB the alternative — row-count-based splits — puts
    hours of video in one task and thumbnails in another.)
    """
    with_len = df.withColumn("__plen", F.length(F.col(payload_col)).cast("long"))
    total = with_len.agg(F.sum("__plen")).collect()[0][0] or 1
    n_parts = max(1, int(total / target_bytes))
    return (
        with_len.repartition(n_parts, F.xxhash64(F.col(payload_col)))
        .drop("__plen")
    )


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("frame_crc32", T.LongType()),
    ]
)


def sample_video_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "media",
    every_ms: int = 1000,
) -> DataFrame:
    """Demux MJPEG-in-AVI payloads (``parse_avi``) and emit one row per
    SAMPLED frame — the first frame at or after each ``every_ms``
    boundary, the standard thumbnail/keyframe cadence.  Per frame:
    exact timestamp (frame_idx × usec_per_frame), dimensions from the
    frame's own JPEG SOF marker (falling back to the container header),
    byte size, and a CRC32 content fingerprint (exact-dup detection
    across videos without decoding pixels).  Non-AVI payloads emit no
    rows.  Explode-shaped mapInPandas: one input row → many output
    rows; pixel decode stays behind ``decode_jpeg_pixels``."""
    import zlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else None
                avi = parse_avi(raw)
                if avi is None or not avi["frames"]:
                    continue
                usec = avi["usec_per_frame"]
                # frames whose timestamp crosses the next sample boundary
                step_us = every_ms * 1000
                next_due = 0
                for i, (off, size) in enumerate(avi["frames"]):
                    ts_us = i * usec
                    if ts_us < next_due:
                        continue
                    next_due = ts_us + step_us - (ts_us % step_us) if step_us else ts_us + 1
                    frame = raw[off : off + size]
                    dims = jpeg_dimensions(frame)
                    rows.append(
                        {
                            "doc_id": int(did),
                            "frame_idx": i,
                            "ts_ms": ts_us // 1000,
                            "width": dims[0] if dims else avi["width"],
                            "height": dims[1] if dims else avi["height"],
                            "frame_bytes": size,
                            "frame_crc32": zlib.crc32(frame),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in _FRAME_SCHEMA.fields])

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema=_FRAME_SCHEMA
    )


_PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("decoded", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("std_luma", T.DoubleType()),
    ]
)


def frame_pixel_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "media",
    every_ms: int = 1000,
) -> DataFrame:
    """Per-sampled-frame PIXEL statistics: demux like
    ``sample_video_frames`` but actually decode each sampled frame
    through ``decode_jpeg_pixels`` (the baseline codec) and emit
    channel means plus luma stddev — the content features behind
    brightness filtering, black-frame detection, and thumbnail QA.
    Frames the codec can't decode (non-baseline) emit a row with
    ``decoded = false`` and header dimensions, so coverage is
    observable instead of silently partial.  Same explode-shaped
    mapInPandas contract as the demuxer; the per-frame decode is the
    deliberate Python-side kernel (see module docstring)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else None
                avi = parse_avi(raw)
                if avi is None or not avi["frames"]:
                    continue
                usec = avi["usec_per_frame"]
                step_us = every_ms * 1000
                next_due = 0
                for i, (off, size) in enumerate(avi["frames"]):
                    ts_us = i * usec
                    if ts_us < next_due:
                        continue
                    next_due = (
                        ts_us + step_us - (ts_us % step_us)
                        if step_us
                        else ts_us + 1
                    )
                    frame = raw[off : off + size]
                    px = decode_jpeg_pixels(frame)
                    if px is None:
                        dims = jpeg_dimensions(frame)
                        rows.append(
                            {
                                "doc_id": int(did),
                                "frame_idx": i,
                                "ts_ms": ts_us // 1000,
                                "decoded": False,
                                "width": dims[0] if dims else avi["width"],
                                "height": dims[1] if dims else avi["height"],
                                "mean_r": None,
                                "mean_g": None,
                                "mean_b": None,
                                "std_luma": None,
                            }
                        )
                        continue
                    p = px.astype(np.float64)
                    luma = (
                        0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]
                    )
                    rows.append(
                        {
                            "doc_id": int(did),
                            "frame_idx": i,
                            "ts_ms": ts_us // 1000,
                            "decoded": True,
                            "width": px.shape[1],
                            "height": px.shape[0],
                            "mean_r": float(p[..., 0].mean()),
                            "mean_g": float(p[..., 1].mean()),
                            "mean_b": float(p[..., 2].mean()),
                            "std_luma": float(luma.std()),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _PIXEL_SCHEMA.fields]
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema=_PIXEL_SCHEMA
    )


def gif_frame_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "media",
    max_frames: "int | None" = None,
) -> DataFrame:
    """Per-frame pixel statistics over animated-GIF payloads — the GIF
    twin of ``frame_pixel_stats``: every composited frame (transparency
    and disposal applied, operators/gif.py) emits channel means + luma
    stddev with its cumulative presentation timestamp, so scene-cut /
    brightness screens run on GIFs exactly as on MJPEG-AVI.
    Undecodable payloads emit NO rows (a GIF with a parseable header
    but corrupt LZW has no composited frames to measure — use
    ``decode_media`` for header-level audits); same explode-shaped
    Arrow ``mapInPandas`` contract as the demuxer."""
    from tube_spark.operators.gif import decode_gif_frames

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else None
                frames = decode_gif_frames(raw, max_frames=max_frames)
                if not frames:
                    continue
                ts = 0
                for i, (px, delay) in enumerate(frames):
                    p = px.astype(np.float64)
                    luma = (
                        0.299 * p[..., 0]
                        + 0.587 * p[..., 1]
                        + 0.114 * p[..., 2]
                    )
                    rows.append(
                        {
                            "doc_id": int(did),
                            "frame_idx": i,
                            "ts_ms": ts,
                            "decoded": True,
                            "width": px.shape[1],
                            "height": px.shape[0],
                            "mean_r": float(p[..., 0].mean()),
                            "mean_g": float(p[..., 1].mean()),
                            "mean_b": float(p[..., 2].mean()),
                            "std_luma": float(luma.std()),
                        }
                    )
                    ts += delay
            yield pd.DataFrame(
                rows, columns=[f.name for f in _PIXEL_SCHEMA.fields]
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema=_PIXEL_SCHEMA
    )


def synthesize_gif(seed: int) -> bytes:
    """A deterministic 2-frame animated GIF with REAL LZW payload
    (operators/gif.py encoder): w = seed%9+2, h = seed%6+2, an 8-color
    palette with channel c of color i = (seed*11 + i*37 + c*71) % 256,
    frame-f pixel p (row-major) indexing color
    (seed*13 + f*4 + p*29) % 8, first-frame delay (seed%20+1)*10 ms.
    Odd seeds interlace (decode is pixel-identical either way).  Every
    emitted stat is therefore closed-form in ``seed`` — the oracle
    replays the palette arithmetic while Spark decodes the actual
    entropy-coded bytes."""
    from tube_spark.operators.gif import encode_gif

    w = seed % 9 + 2
    h = seed % 6 + 2
    pal = np.array(
        [
            [(seed * 11 + i * 37 + c * 71) % 256 for c in range(3)]
            for i in range(8)
        ],
        dtype=np.uint8,
    )
    p = np.arange(h * w, dtype=np.int64)
    frames = [
        (((seed * 13 + f * 4 + p * 29) % 8).astype(np.uint8).reshape(h, w))
        for f in range(2)
    ]
    return encode_gif(
        frames,
        pal,
        delays_ms=[(seed % 20 + 1) * 10, 0],
        interlace=bool(seed % 2),
    )


def synthesize_gif_col(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic ``media`` GIF column (``synthesize_gif``
    per id) — the LZW-family twin of ``synthesize_media_col``."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def synth(ids: pd.Series) -> pd.Series:
        return pd.Series([synthesize_gif(int(i)) for i in ids])

    return df.withColumn("media", synth(F.col(id_col)))


def synthesize_jpeg(seed: int, width: int, height: int) -> bytes:
    """A minimal structurally-valid JPEG: SOI, APP0/JFIF, SOF0 carrying
    the real dimensions, then EOI.  ``jpeg_dimensions`` (and any
    marker-walking tool) parses it; there is no entropy-coded scan —
    the payload's 16 trailing filler bytes are deterministic in
    ``seed`` so frame fingerprints differ per frame."""
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00" + b"\x00\x48\x00\x48\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + (17).to_bytes(2, "big")
        + b"\x08"
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + b"\x03"
        + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    filler = bytes((seed * 31 + i * 7) % 256 for i in range(16))
    com = b"\xff\xfe" + (2 + len(filler)).to_bytes(2, "big") + filler
    return b"\xff\xd8" + app0 + sof0 + com + b"\xff\xd9"


def synthesize_real_jpeg(
    seed: int, width: int, height: int, quality: int = 75
) -> bytes:
    """A fully entropy-coded baseline JPEG with deterministic pixel
    content (a seed-phased color gradient): ``decode_jpeg_pixels``
    genuinely decodes it, so frame-level PIXEL operators can be tested
    end-to-end on synthetic corpora.  Complements ``synthesize_jpeg``
    (header-only, kept for marker-walk and fingerprint tests whose
    oracles depend on its exact bytes)."""
    from tube_spark.operators.jpeg import encode_baseline_jpeg

    yy, xx = np.mgrid[0:height, 0:width]
    px = np.stack(
        [
            (xx * 255 // max(1, width - 1) + seed * 37) % 256,
            (yy * 255 // max(1, height - 1) + seed * 101) % 256,
            ((xx + yy) * 255 // max(1, width + height - 2) + seed * 11) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)
    return encode_baseline_jpeg(px, quality=quality)


def synthesize_avi(
    seed: int,
    n_frames: int,
    width: int = 32,
    height: int = 24,
    fps: int = 10,
    scene_len: int = 1,
    real_frames: bool = False,
) -> bytes:
    """A valid MJPEG-in-AVI container: RIFF(AVI ) → LIST(hdrl){avih,
    LIST(strl){strh,strf}} → LIST(movi){00dc×n}.  Every frame is a
    ``synthesize_jpeg`` whose bytes vary by (seed, frame index //
    ``scene_len``) — ``scene_len`` > 1 repeats each frame body for a
    run of that length, giving the video a deterministic scene
    structure (used by ``detect_scene_cuts`` tests/oracles; the
    default 1 keeps every frame distinct, the original behavior).
    ``real_frames`` swaps in fully entropy-coded baseline JPEGs
    (``synthesize_real_jpeg``) so pixel-decoding operators run for
    real; default off to keep the byte-exact fingerprints existing
    oracles replay."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + len(body).to_bytes(4, "little") + body + pad

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    usec_per_frame = 1_000_000 // fps
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec_per_frame, 0, 0, 0x10, n_frames, 0, 1, 0, width, height,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, n_frames, 0, 0xFFFFFFFF,
        0, 0, 0, width, height,
    )
    strf = struct.pack(  # BITMAPINFOHEADER
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    frame_fn = synthesize_real_jpeg if real_frames else synthesize_jpeg
    movi = lst(
        b"movi",
        b"".join(
            chunk(b"00dc", frame_fn(seed + i // scene_len, width, height))
            for i in range(n_frames)
        ),
    )
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def resize_bmp(payload: bytes, out_w: int, out_h: int) -> bytes | None:
    """Nearest-neighbor resize of an uncompressed 24-bit BMP — a REAL
    pixel kernel (numpy index sampling), re-encoded as a valid BMP.
    Returns None when the payload is not a parseable BMP."""
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        return None
    offset, = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp, = struct.unpack_from("<H", payload, 28)
    compression, = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0 or width <= 0 or height == 0:
        return None
    h = abs(height)
    stride = bmp_stride(width)
    if offset + stride * h > len(payload):
        return None
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=offset)
    pix = rows.reshape(h, stride)[:, : 3 * width].reshape(h, width, 3)
    # nearest-neighbor index maps (the standard center-aligned grid)
    ys = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(out_w) + 0.5) * width / out_w).astype(np.int64), width - 1)
    resized = pix[ys][:, xs]  # (out_h, out_w, 3)
    out_stride = bmp_stride(out_w)
    out_rows = np.zeros((out_h, out_stride), dtype=np.uint8)
    out_rows[:, : 3 * out_w] = resized.reshape(out_h, 3 * out_w)
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", 54 + out_stride * out_h, 0, 0, 54, 40, out_w,
        out_h if height > 0 else -out_h, 1, 24, 0,
        out_stride * out_h, 2835, 2835, 0, 0,
    )
    return header + out_rows.tobytes()


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BooleanType()),
    ]
)


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "doc_id",
    payload_col: str = "media",
    rows_per_batch: int = 256,
) -> DataFrame:
    """Resize every BMP payload to (out_w, out_h); non-image payloads
    pass through unchanged with ``resized=false``.  Same Arrow-batched
    ``mapInPandas`` shape as ``decode_features`` — pair with
    ``repartition_for_payload`` so partitions are byte-balanced."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError(f"target dims must be positive, got {out_w}x{out_h}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), rows_per_batch):
                chunk = pdf.iloc[start : start + rows_per_batch]
                out = []
                for i, p in zip(chunk[id_col], chunk[payload_col]):
                    r = resize_bmp(p, out_w, out_h)
                    if r is None:
                        out.append((int(i), p, None, None, False))
                    else:
                        out.append((int(i), r, out_w, out_h, True))
                yield pd.DataFrame(
                    out, columns=["doc_id", "media", "width", "height", "resized"]
                )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema=_RESIZE_SCHEMA
    )


# ----------------------------------------------------------------------
# perceptual image hashing (pHash) + image near-duplicate detection
def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (type-II, norm='ortho')."""
    k = np.arange(n)[:, None].astype(np.float64)
    m = np.arange(n)[None, :].astype(np.float64)
    d = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * m + 1) * k / (2 * n))
    d[0] /= np.sqrt(2.0)
    return d


_DCT32 = _dct_matrix(32)


def _phash_from_gray(gray: np.ndarray) -> int:
    """The shared pHash tail: HxW float grayscale -> nearest-resize to
    32x32 -> 2-D DCT-II -> low-frequency 8x8 block -> bit i set iff
    coefficient i > median(block); packed into a signed Spark long."""
    h, w = gray.shape
    yi = (np.arange(32) * h) // 32
    xi = (np.arange(32) * w) // 32
    small = gray[np.ix_(yi, xi)]
    coef = _DCT32 @ small @ _DCT32.T
    block = coef[:8, :8]
    med = np.median(block)
    bits = (block > med).flatten()
    val = 0
    for i, b in enumerate(bits):
        val |= int(b) << i
    if val >= 1 << 63:  # two's complement into a signed Spark long
        val -= 1 << 64
    return val


def phash_bmp(payload: bytes) -> int | None:
    """64-bit perceptual hash of an uncompressed 24-bit BMP (the
    classic pHash recipe, per the public imagehash library).  Robust
    to small pixel noise / re-encodes; Hamming distance between hashes
    tracks perceptual difference.  Returns None for non-BMP payloads
    (``phash_image`` is the multi-format dispatch)."""
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        return None
    offset, = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp, = struct.unpack_from("<H", payload, 28)
    compression, = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0 or width <= 0 or height == 0:
        return None
    h = abs(height)
    stride = bmp_stride(width)
    if offset + stride * h > len(payload):
        return None
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=offset)
    px = rows.reshape(h, stride)[:, : 3 * width].reshape(h, width, 3)
    if height > 0:  # bottom-up storage: normalize to top-down
        px = px[::-1]
    # BMP stores BGR
    gray = (
        0.114 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.299 * px[:, :, 2]
    ).astype(np.float64)
    return _phash_from_gray(gray)


def phash_image(payload: bytes) -> int | None:
    """pHash over any decodable image payload: BMP (fast header path),
    PNG (operators/png.py), GIF first frame (operators/gif.py), JPEG
    (operators/jpeg.py, baseline or progressive) or baseline TIFF
    (operators/tiff.py) — all reduced to the SAME BT.601 luma plane,
    so a BMP and a lossless PNG/GIF/TIFF of identical pixels hash
    identically (pytest-pinned).  None for undecodable payloads."""
    if payload is None:
        return None
    if len(payload) >= 2 and payload[:2] == b"BM":
        return phash_bmp(payload)
    px = None
    if len(payload) >= 8 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        from tube_spark.operators.png import decode_png

        px = decode_png(payload)
    elif len(payload) >= 6 and payload[:6] in (b"GIF87a", b"GIF89a"):
        from tube_spark.operators.gif import decode_gif

        px = decode_gif(payload)
    elif len(payload) >= 2 and payload[:2] == b"\xff\xd8":
        px = decode_jpeg_pixels(payload)
    elif len(payload) >= 8 and payload[:2] in (b"II", b"MM"):
        from tube_spark.operators.tiff import decode_tiff

        px = decode_tiff(payload)
    if px is None:
        return None
    gray = (
        0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    ).astype(np.float64)
    return _phash_from_gray(gray)


def image_phash(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "media"
) -> DataFrame:
    """(id, phash) via Arrow mapInPandas over BMP/PNG/GIF/JPEG payloads;
    undecodable payloads yield NULL phash (filtered by near-dup
    callers, reportable by audits)."""
    schema = f"`{id_col}` long, phash long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                id_col: pdf[id_col],
                "phash": [
                    phash_image(bytes(p) if p is not None else None)
                    for p in pdf[payload_col]
                ],
            }
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema=schema
    )


def image_channel_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "media"
) -> DataFrame:
    """(id, width, height, mean_r, mean_g, mean_b, std_luma) per
    decodable SINGLE-IMAGE payload (PNG / GIF first frame / JPEG /
    baseline TIFF — the px-producing codecs) — the still-image twin of
    ``frame_pixel_stats``/``gif_frame_stats`` for brightness / channel
    screens over an image corpus.  Undecodable payloads emit NO rows
    (``decode_media`` is the header-level audit); Arrow
    ``mapInPandas``, never row-Python."""
    from tube_spark.operators.gif import decode_gif
    from tube_spark.operators.png import decode_png
    from tube_spark.operators.tiff import decode_tiff

    schema = (
        f"`{id_col}` long, width int, height int, mean_r double, "
        "mean_g double, mean_b double, std_luma double"
    )

    def _px(payload):
        if payload is None or len(payload) < 8:
            return None
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return decode_png(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return decode_gif(payload)
        if payload[:2] == b"\xff\xd8":
            return decode_jpeg_pixels(payload)
        if payload[:2] in (b"II", b"MM"):
            return decode_tiff(payload)
        return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            id_col, "width", "height", "mean_r", "mean_g", "mean_b",
            "std_luma",
        ]
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                px = _px(bytes(payload) if payload is not None else None)
                if px is None:
                    continue
                p = px.astype(np.float64)
                luma = (
                    0.299 * p[..., 0]
                    + 0.587 * p[..., 1]
                    + 0.114 * p[..., 2]
                )
                rows.append(
                    {
                        id_col: int(did),
                        "width": px.shape[1],
                        "height": px.shape[0],
                        "mean_r": float(p[..., 0].mean()),
                        "mean_g": float(p[..., 1].mean()),
                        "mean_b": float(p[..., 2].mean()),
                        "std_luma": float(luma.std()),
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema=schema
    )


def synthesize_tiff(seed: int) -> bytes:
    """A deterministic baseline TIFF with REAL strip layout: w =
    seed%9+2, h = seed%6+2, RGB pixel p (row-major) channel c =
    (seed*17 + p*23 + c*29) % 256.  Odd seeds PackBits-compress
    (real run-length bytes), seeds divisible by 3 are big-endian,
    seeds divisible by 5 split into 2-row strips — so decoding the
    corpus exercises every baseline axis while every emitted stat is
    closed-form in ``seed`` (the synthesize_gif contract for the TIFF
    family)."""
    from tube_spark.operators.tiff import encode_tiff

    w, h = seed % 9 + 2, seed % 6 + 2
    p = np.arange(h * w, dtype=np.int64)
    px = np.stack(
        [(seed * 17 + p * 23 + c * 29) % 256 for c in range(3)], axis=-1
    ).astype(np.uint8).reshape(h, w, 3)
    return encode_tiff(
        px,
        compression=32773 if seed % 2 else 1,
        byte_order="MM" if seed % 3 == 0 else "II",
        rows_per_strip=2 if seed % 5 == 0 else None,
    )


def synthesize_tiff_col(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic ``media`` TIFF column (``synthesize_tiff``
    per id) — the strip-family twin of ``synthesize_gif_col``."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def synth(ids: pd.Series) -> pd.Series:
        return pd.Series([synthesize_tiff(int(i)) for i in ids])

    return df.withColumn("media", synth(F.col(id_col)))


def image_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "media",
    max_hamming: int = 6,
    bands: int = 8,
) -> DataFrame:
    """Image near-dup pairs: pHash signatures + the SAME banded
    Hamming blocking as text SimHash (operators/dedup.py
    ``hamming_pairs``) — no all-pairs join, pigeonhole-complete for
    distance < bands.  The LAION-style image dedup shape: hash is
    map-only per image; candidate generation touches ids only."""
    from tube_spark.operators.dedup import hamming_pairs

    sigs = image_phash(df, id_col, payload_col).filter(F.col("phash").isNotNull())
    return hamming_pairs(sigs, id_col, "phash", 64, max_hamming, bands)


# ----------------------------------------------------------------------
# audio spectral features (pure-numpy FFT; no codec dependency)
def spectral_features_wav(
    payload: bytes, frame: int = 256, hop: int = 128
) -> dict | None:
    """Frame-level spectral analysis of a PCM WAV: Hann-windowed STFT
    magnitudes (numpy rfft), reduced to the per-document features a
    curation pipeline filters on — dominant frequency, spectral
    centroid, RMS loudness, frame count.  Returns None for non-WAV
    payloads.  Mono-izes by averaging channels."""
    if payload is None or len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, sample_rate, bits, channels, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size, = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and size >= 16:
            fmt_code, channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            bits, = struct.unpack_from("<H", body, 14)
            if fmt_code != 1:
                return None
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)
    if sample_rate is None or data is None or bits != 16:
        return None
    samples = np.frombuffer(data, dtype="<i2").astype(np.float64)
    ch = max(channels or 1, 1)
    if ch > 1:
        samples = samples[: len(samples) // ch * ch].reshape(-1, ch).mean(axis=1)
    if len(samples) < frame:
        return {
            "sample_rate": int(sample_rate),
            "n_frames": 0,
            "dominant_hz": 0.0,
            "spectral_centroid_hz": 0.0,
            "rms": float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0,
        }
    n_frames = 1 + (len(samples) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    window = np.hanning(frame)
    spec = np.abs(np.fft.rfft(samples[idx] * window, axis=1))  # (frames, bins)
    power = spec**2
    mean_power = power.mean(axis=0)
    mean_power[0] = 0.0  # ignore DC for dominant/centroid
    freqs = np.fft.rfftfreq(frame, d=1.0 / sample_rate)
    total = mean_power.sum()
    centroid = float((freqs * mean_power).sum() / total) if total > 0 else 0.0
    return {
        "sample_rate": int(sample_rate),
        "n_frames": int(n_frames),
        "dominant_hz": float(freqs[int(mean_power.argmax())]) if total > 0 else 0.0,
        "spectral_centroid_hz": centroid,
        "rms": float(np.sqrt(np.mean(samples**2))),
    }


def audio_spectral_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "media"
) -> DataFrame:
    """(id, sample_rate, n_frames, dominant_hz, spectral_centroid_hz,
    rms) via Arrow mapInPandas; non-WAV payloads yield NULL features."""
    schema = (
        f"`{id_col}` long, sample_rate int, n_frames int, "
        "dominant_hz double, spectral_centroid_hz double, rms double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                feat = spectral_features_wav(bytes(p) if p is not None else None)
                rows.append(
                    {
                        id_col: did,
                        "sample_rate": feat["sample_rate"] if feat else None,
                        "n_frames": feat["n_frames"] if feat else None,
                        "dominant_hz": feat["dominant_hz"] if feat else None,
                        "spectral_centroid_hz": feat["spectral_centroid_hz"] if feat else None,
                        "rms": feat["rms"] if feat else None,
                    }
                )
            yield pd.DataFrame(rows, columns=[id_col, "sample_rate", "n_frames", "dominant_hz", "spectral_centroid_hz", "rms"])

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(run, schema=schema)


_SCENE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("dist_norm", T.DoubleType()),
        T.StructField("is_cut", T.BooleanType()),
        T.StructField("scene_id", T.IntegerType()),
    ]
)


def detect_scene_cuts(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "media",
    threshold: float = 0.05,
) -> DataFrame:
    """Coarse scene-cut detection over MJPEG-in-AVI payloads WITHOUT
    pixel decode: per frame a 256-bin byte histogram of the compressed
    frame body, per consecutive pair the normalized L1 distance
    ``sum|h_i - h_{i-1}| / (bytes_i + bytes_{i-1})`` in [0, 1] — the
    classic cheap pre-filter (compressed-domain shot detection): a cut
    re-keys the entropy stream, so the byte distribution jumps, while
    within-shot frames stay near.  ``is_cut`` marks frames opening a
    new scene (frame 0 never does); ``scene_id`` is the running cut
    count, segmenting the video for per-scene sampling / dedup.

    Explode-shaped Arrow ``mapInPandas`` like ``sample_video_frames``:
    frames of one video live in one payload, so distances and the
    scene counter are computed IN the kernel — no window, no shuffle;
    pixel-accurate detection would plug ``decode_jpeg_pixels`` into
    the same loop.  Non-AVI payloads emit no rows."""
    if not 0 <= threshold <= 1:
        raise ValueError(f"threshold must be in [0, 1], got {threshold}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else None
                avi = parse_avi(raw)
                if avi is None or not avi["frames"]:
                    continue
                usec = avi["usec_per_frame"]
                prev_hist = None
                prev_size = 0
                scene = 0
                for i, (off, size) in enumerate(avi["frames"]):
                    body = np.frombuffer(raw, dtype=np.uint8, count=size, offset=off)
                    hist = np.bincount(body, minlength=256)
                    if prev_hist is None:
                        dist, cut = 0.0, False
                    else:
                        l1 = int(np.abs(hist - prev_hist).sum())
                        dist = l1 / float(size + prev_size)
                        cut = dist >= threshold
                    if cut:
                        scene += 1
                    rows.append(
                        {
                            "doc_id": int(did),
                            "frame_idx": i,
                            "ts_ms": i * usec // 1000,
                            "dist_norm": round(dist, 6),
                            "is_cut": cut,
                            "scene_id": scene,
                        }
                    )
                    prev_hist, prev_size = hist, size
            yield pd.DataFrame(
                rows, columns=[f.name for f in _SCENE_SCHEMA.fields]
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema=_SCENE_SCHEMA
    )


def synthesize_video_col(
    df: DataFrame, id_col: str = "doc_id", scene_len: int = 1
) -> DataFrame:
    """Attach a deterministic MJPEG-AVI ``media`` column to EVERY row
    (``id%5+2`` frames at 10 fps, 32x24, frame bodies repeating in
    runs of ``scene_len``) — the video-only twin of
    ``synthesize_media_col``, for exercising frame-level operators
    over a corpus with a known scene structure."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def synth(ids: pd.Series) -> pd.Series:
        return pd.Series(
            [
                synthesize_avi(int(i), int(i) % 5 + 2, scene_len=scene_len)
                for i in ids
            ]
        )

    return df.withColumn("media", synth(F.col(id_col)))
