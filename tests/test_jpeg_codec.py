"""Baseline JPEG codec: roundtrip error bounds, exactness cases,
restart markers, scope boundaries, and the frame-pixel-stats operator
over real entropy-coded MJPEG frames."""

from __future__ import annotations

import numpy as np
import pytest

from tube_spark.operators.jpeg import (
    STD_LUMA_QUANT,
    decode_baseline_jpeg,
    encode_baseline_jpeg,
    quality_scaled_quant,
)


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 / max(1, w - 1),
            yy * 255 / max(1, h - 1),
            (xx + yy) * 255 / max(1, w + h - 2),
        ],
        axis=-1,
    ).astype(np.uint8)


def test_roundtrip_error_bounds_444():
    img = _gradient(40, 56)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(img, quality=95))
    assert dec is not None and dec.shape == img.shape and dec.dtype == np.uint8
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 8 and err.mean() < 2.0


def test_roundtrip_error_bounds_420():
    img = _gradient(33, 47)  # odd dims exercise chroma padding
    dec = decode_baseline_jpeg(
        encode_baseline_jpeg(img, quality=90, subsampling="4:2:0")
    )
    assert dec is not None and dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 20 and err.mean() < 4.0


def test_flat_image_decodes_uniform():
    flat = np.full((16, 16, 3), 200, np.uint8)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(flat, quality=50))
    assert (dec == dec[0, 0]).all()
    assert abs(int(dec[0, 0, 0]) - 200) <= 2


def test_grayscale_roundtrip_near_exact():
    yy, xx = np.mgrid[0:24, 0:40]
    g = (xx * 255 // 39).astype(np.uint8)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(g, quality=95))
    assert dec.shape == (24, 40, 3)
    assert (dec[..., 0] == dec[..., 1]).all() and (dec[..., 1] == dec[..., 2]).all()
    assert np.abs(dec[..., 0].astype(int) - g.astype(int)).max() <= 2


def test_restart_markers_do_not_change_pixels():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    plain = decode_baseline_jpeg(encode_baseline_jpeg(img, quality=80))
    rst = decode_baseline_jpeg(
        encode_baseline_jpeg(img, quality=80, restart_interval=2)
    )
    assert (plain == rst).all()  # RST resets predictors, not pixels


def test_deterministic_bytes():
    img = _gradient(16, 16)
    assert encode_baseline_jpeg(img, 70) == encode_baseline_jpeg(img, 70)


def test_quality_scaling_monotone_size():
    img = _gradient(32, 32)
    sizes = [len(encode_baseline_jpeg(img, q)) for q in (10, 50, 95)]
    assert sizes[0] < sizes[1] < sizes[2]
    assert (quality_scaled_quant(STD_LUMA_QUANT, 50) == STD_LUMA_QUANT).all()


def test_out_of_scope_inputs_return_none():
    # header-only synthetic (no scan), garbage, truncation, progressive
    from tube_spark.operators.multimodal import synthesize_jpeg

    assert decode_baseline_jpeg(synthesize_jpeg(3, 32, 24)) is None
    assert decode_baseline_jpeg(b"not a jpeg") is None
    assert decode_baseline_jpeg(None) is None
    full = encode_baseline_jpeg(_gradient(16, 16), 75)
    assert decode_baseline_jpeg(full[:40]) is None
    # flip SOF0 -> SOF2: now claims progressive, but the scan header
    # (Ss=0, Se=63) is malformed for a progressive DC scan -> None
    prog = bytearray(full)
    idx = bytes(prog).find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    assert decode_baseline_jpeg(bytes(prog)) is None
    # arithmetic coding (SOF9) stays out of scope
    arith = bytearray(full)
    arith[idx + 1] = 0xC9
    assert decode_baseline_jpeg(bytes(arith)) is None


def test_encoder_validation():
    with pytest.raises(ValueError):
        encode_baseline_jpeg(np.zeros((4, 4, 2), np.uint8))
    with pytest.raises(ValueError):
        encode_baseline_jpeg(np.zeros((4, 4, 3), np.uint8), subsampling="4:1:1")


def test_dispatch_point_decodes_baseline():
    from tube_spark.operators.multimodal import (
        decode_jpeg_pixels,
        synthesize_real_jpeg,
    )

    buf = synthesize_real_jpeg(5, 32, 24, quality=85)
    px = decode_jpeg_pixels(buf)
    assert px is not None and px.shape == (24, 32, 3)


def test_frame_pixel_stats_on_real_mjpeg(spark):
    from tube_spark.operators.multimodal import (
        decode_jpeg_pixels,
        frame_pixel_stats,
        parse_avi,
        synthesize_avi,
    )

    rows = [(i, synthesize_avi(i, 5, 32, 24, fps=10, real_frames=True))
            for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = frame_pixel_stats(df, every_ms=100).orderBy("doc_id", "frame_idx")
    out = got.collect()
    # 100 ms cadence at 10 fps samples every frame
    assert len(out) == 4 * 5
    assert all(r["decoded"] for r in out)
    assert all(r["width"] == 32 and r["height"] == 24 for r in out)
    # Spark-side stats equal a local decode of the same frame bytes
    raw = rows[1][1]
    avi = parse_avi(raw)
    off, size = avi["frames"][2]
    px = decode_jpeg_pixels(raw[off : off + size]).astype(np.float64)
    want_r = float(px[..., 0].mean())
    r = [x for x in out if x["doc_id"] == 1 and x["frame_idx"] == 2][0]
    assert r["mean_r"] == pytest.approx(want_r)
    assert 0.0 <= r["std_luma"] < 128.0
    assert r["ts_ms"] == 200


def test_frame_pixel_stats_header_only_frames_flagged(spark):
    from tube_spark.operators.multimodal import frame_pixel_stats, synthesize_avi

    df = spark.createDataFrame(
        [(1, synthesize_avi(7, 3, 32, 24, fps=10))], "doc_id long, media binary"
    )
    out = frame_pixel_stats(df, every_ms=100).collect()
    assert len(out) == 3
    assert all(not r["decoded"] for r in out)
    assert all(r["mean_r"] is None and r["width"] == 32 for r in out)


# ---------------------------------------------------------------------------
# Progressive (SOF2)


def _noisy(shape, seed=42):
    rng = np.random.default_rng(seed)
    if len(shape) == 2:
        base = np.fromfunction(
            lambda y, x: 128 + 60 * np.sin(x / 3) + 50 * np.cos(y / 4), shape
        )
    else:
        base = np.fromfunction(
            lambda y, x, c: 128 + 60 * np.sin((x + 40 * c) / 3)
            + 50 * np.cos(y / 4),
            shape,
        )
    return np.clip(base + rng.normal(0, 18, shape), 0, 255).astype(np.uint8)


@pytest.mark.parametrize(
    "shape,sub,q,dri",
    [
        ((16, 16), "4:4:4", 75, 0),  # grayscale
        ((24, 33, 3), "4:4:4", 75, 0),
        ((24, 33, 3), "4:2:0", 60, 0),  # odd dims + subsampled chroma
        ((17, 19, 3), "4:2:0", 90, 2),  # restart markers in every scan
        ((8, 8), "4:4:4", 50, 1),
        ((40, 56, 3), "4:2:0", 75, 3),
    ],
)
def test_progressive_decodes_identical_to_baseline(shape, sub, q, dri):
    """The differential contract: baseline and progressive encodes of
    the same pixels carry the same quantized coefficients, so the two
    decodes must be BYTE-IDENTICAL — this pins every progressive scan
    type (DC first/refine, AC first/refine, EOB, ZRL, restarts) against
    the already-verified baseline path."""
    from tube_spark.operators.jpeg import encode_progressive_jpeg

    px = _noisy(shape)
    db = decode_baseline_jpeg(
        encode_baseline_jpeg(px, quality=q, subsampling=sub, restart_interval=dri)
    )
    dp = decode_baseline_jpeg(
        encode_progressive_jpeg(
            px, quality=q, subsampling=sub, restart_interval=dri
        )
    )
    assert dp is not None
    assert np.array_equal(db, dp)


def test_progressive_stream_is_sof2_multiscan():
    from tube_spark.operators.jpeg import encode_progressive_jpeg

    buf = encode_progressive_jpeg(_noisy((24, 33, 3)), quality=75)
    assert b"\xff\xc2" in buf and b"\xff\xc0" not in buf
    # 4-phase script over 3 components: 2 DC scans + 3 AC first + 3 AC
    # refine = 8 SOS markers
    assert buf.count(b"\xff\xda") == 8


def test_progressive_roundtrip_error_bounds():
    from tube_spark.operators.jpeg import encode_progressive_jpeg

    img = _gradient(40, 56)
    dec = decode_baseline_jpeg(encode_progressive_jpeg(img, quality=95))
    assert dec is not None and dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 8 and err.mean() < 2.0


def test_progressive_dispatch_point():
    from tube_spark.operators.jpeg import encode_progressive_jpeg
    from tube_spark.operators.multimodal import decode_jpeg_pixels

    px = _noisy((16, 24, 3))
    out = decode_jpeg_pixels(encode_progressive_jpeg(px, quality=85))
    assert out is not None and out.shape == (16, 24, 3)


def test_progressive_truncation_and_fuzz_never_raise():
    from tube_spark.operators.jpeg import encode_progressive_jpeg

    buf = encode_progressive_jpeg(_noisy((24, 33, 3)), quality=75)
    for cut in (10, 60, len(buf) // 3, len(buf) - 5):
        decode_baseline_jpeg(buf[:cut])  # must not raise
    rng = np.random.default_rng(7)
    for _ in range(25):
        b = bytearray(buf)
        for _ in range(6):
            b[rng.integers(2, len(b))] = rng.integers(0, 256)
        decode_baseline_jpeg(bytes(b))  # must not raise


def test_ac_eob_run_spans_blocks():
    """Cross-block EOB runs (EOBn, n>0) — our encoder only emits
    per-block EOB0, so drive the decoder's run paths directly: three
    blocks coded as one EOB2 run after the first block's coefficients,
    via a custom table that contains the EOB1 symbol (0x10)."""
    from tube_spark.operators.jpeg import (
        _BitReader,
        _BitWriter,
        _HuffTable,
        _decode_block_ac_first,
    )

    # symbols: 0x01 (run0,size1), 0x10 (EOB1), 0x00 (EOB0), 0xF0 (ZRL)
    tbl = _HuffTable([0, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                     [0x01, 0x10, 0x00, 0xF0])
    bw = _BitWriter()
    c, ln = tbl.encode_map[0x01]
    bw.write(c, ln)
    bw.write(1, 1)  # coefficient +1 at k=1
    c, ln = tbl.encode_map[0x10]  # EOB1: run = 2 + read_bits(1)
    bw.write(c, ln)
    bw.write(1, 1)  # -> run of 3 blocks total (this one + 2 more)
    bw.flush()
    reader = _BitReader(bytes(bw.out), 0)

    blocks = [np.zeros(64, dtype=np.int32) for _ in range(4)]
    eobrun = 0
    eobrun = _decode_block_ac_first(reader, tbl, blocks[0], 1, 63, 1, eobrun)
    assert blocks[0][1] == 1 << 1  # value shifted by al=1
    assert eobrun == 2  # two more blocks inside the run
    eobrun = _decode_block_ac_first(reader, tbl, blocks[1], 1, 63, 1, eobrun)
    eobrun = _decode_block_ac_first(reader, tbl, blocks[2], 1, 63, 1, eobrun)
    assert eobrun == 0
    assert not blocks[1].any() and not blocks[2].any()


def test_ac_refine_eob_run_reads_correction_bits():
    """Refinement inside an EOB run: blocks covered by the run still
    consume one correction bit per nonzero-history coefficient."""
    from tube_spark.operators.jpeg import (
        _BitReader,
        _BitWriter,
        _HuffTable,
        _decode_block_ac_refine,
    )

    tbl = _HuffTable([0, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                     [0x01, 0x10, 0x00, 0xF0])
    bw = _BitWriter()
    c, ln = tbl.encode_map[0x10]  # EOB1 -> run = 2 + bits(1)
    bw.write(c, ln)
    bw.write(0, 1)  # run of exactly 2 blocks
    bw.write(1, 1)  # correction bit for block0's coef at k=3 (1 -> grow)
    bw.write(0, 1)  # correction bit for block1's coef at k=5 (0 -> keep)
    bw.flush()
    reader = _BitReader(bytes(bw.out), 0)

    b0 = np.zeros(64, dtype=np.int32)
    b0[3] = 2  # history: +2 at al=0 -> correction bit 1 makes it 3
    b1 = np.zeros(64, dtype=np.int32)
    b1[5] = -2
    eobrun = _decode_block_ac_refine(reader, tbl, b0, 1, 63, 0, 0)
    assert eobrun == 1
    eobrun = _decode_block_ac_refine(reader, tbl, b1, 1, 63, 0, eobrun)
    assert eobrun == 0
    assert b0[3] == 3  # refined toward larger magnitude
    assert b1[5] == -2  # bit 0: unchanged


def _encode_subset_dc_progressive(pixels: np.ndarray, quality: int = 75) -> bytes:
    """Hand-build a spec-legal SOF2 stream whose DC scans are SPLIT:
    DC-first {Y} non-interleaved, then DC-first {Cb,Cr} INTERLEAVED as
    a subset that EXCLUDES the max-sampled component (4:2:0 Y is 2x2),
    then the matching refinement scans, then the stock AC script.
    Exercises the ADVICE-r12 claim that subset-interleaved DC scans
    desync the MCU walk: per T.81 A.2.3 (and libjpeg per_scan_setup)
    the MCU count derives from the FRAME max sampling factor, so the
    decode must be byte-identical to the baseline decode."""
    from tube_spark.operators import jpeg as J

    gray, h, w, comps, prepped, mcux, mcuy = J._prep_planes(pixels, "4:2:0")
    assert not gray and comps[0][1] == 2  # Y is the max-sampled comp
    ql = J.quality_scaled_quant(J.STD_LUMA_QUANT, quality)[J.ZIGZAG]
    qc = J.quality_scaled_quant(J.STD_CHROMA_QUANT, quality)[J.ZIGZAG]
    dcl = J._HuffTable(*J.STD_DC_LUMA)
    acl = J._HuffTable(*J.STD_AC_LUMA)
    dcc = J._HuffTable(*J.STD_DC_CHROMA)
    acc = J._HuffTable(*J.STD_AC_CHROMA)

    # quantized zigzag coefficients with the encoder's exact arithmetic
    coefs = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        p = prepped[ci]
        q = ql if tq == 0 else qc
        by_n, bx_n = p.shape[0] // 8, p.shape[1] // 8
        arr = np.zeros((by_n, bx_n, 64), dtype=np.int64)
        for by in range(by_n):
            for bx in range(bx_n):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                f = J._DCT_M @ (blk.astype(np.float64) - 128.0) @ J._DCT_M.T
                arr[by, bx] = np.round(f.reshape(64)[J.ZIGZAG] / q).astype(
                    np.int64
                )
        coefs.append(arr)

    out = J._header_segments(False, h, w, comps, ql, qc, 0xC2, 0)

    def sos(cis, ss, se, ah, al) -> bytes:
        seg = bytearray(
            b"\xff\xda"
            + (6 + 2 * len(cis)).to_bytes(2, "big")
            + bytes([len(cis)])
        )
        for ci in cis:
            seg += bytes([comps[ci][0], 0x00 if ci == 0 else 0x11])
        seg += bytes([ss, se, (ah << 4) | al])
        return bytes(seg)

    # DC first {Y}: non-interleaved raster over Y's own block grid
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    ybh = ((h * comps[0][2] + vmax - 1) // vmax + 7) // 8
    ybw = ((w * comps[0][1] + hmax - 1) // hmax + 7) // 8
    out += sos([0], 0, 0, 0, 1)
    bw = J._BitWriter()
    pred = 0
    for by in range(ybh):
        for bx in range(ybw):
            pred = J._emit_dc_first(
                bw, dcl, int(coefs[0][by, bx, 0]) >> 1, pred
            )
    bw.flush()
    out += bytes(bw.out)

    # DC first {Cb, Cr}: interleaved SUBSET — mcux/mcuy from frame max
    out += sos([1, 2], 0, 0, 0, 1)
    bw = J._BitWriter()
    preds = [0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for i, ci in enumerate((1, 2)):
                preds[i] = J._emit_dc_first(
                    bw, dcc, int(coefs[ci][my, mx, 0]) >> 1, preds[i]
                )
    bw.flush()
    out += bytes(bw.out)

    # DC refinement, same split
    out += sos([0], 0, 0, 1, 0)
    bw = J._BitWriter()
    for by in range(ybh):
        for bx in range(ybw):
            bw.write(int(coefs[0][by, bx, 0]) & 1, 1)
    bw.flush()
    out += bytes(bw.out)
    out += sos([1, 2], 0, 0, 1, 0)
    bw = J._BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in (1, 2):
                bw.write(int(coefs[ci][my, mx, 0]) & 1, 1)
    bw.flush()
    out += bytes(bw.out)

    # stock AC script: per-component first then refine
    for emit, ah, al in ((J._emit_ac_first, 0, 1), (J._emit_ac_refine, 1, 0)):
        for ci in range(3):
            at = acl if ci == 0 else acc
            cw = (w * comps[ci][1] + hmax - 1) // hmax
            ch = (h * comps[ci][2] + vmax - 1) // vmax
            out += sos([ci], 1, 63, ah, al)
            bw = J._BitWriter()
            for by in range((ch + 7) // 8):
                for bx in range((cw + 7) // 8):
                    emit(bw, at, coefs[ci][by, bx], al)
            bw.flush()
            out += bytes(bw.out)

    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("shape", [(32, 32, 3), (24, 40, 3)])
def test_subset_interleaved_dc_scan_decodes_identical(shape):
    """ADVICE r12 adjudication: a spec-legal progressive DC scan that
    interleaves only the chroma subset (excluding the max-sampled Y)
    decodes byte-identically to the baseline encode — the frame-max
    MCU geometry is the T.81/libjpeg formula, not a desync.  (A
    scan-local max would walk 4x the MCUs here and desync.)"""
    px = _noisy(shape)
    want = decode_baseline_jpeg(encode_baseline_jpeg(px, 75, "4:2:0"))
    got = decode_baseline_jpeg(_encode_subset_dc_progressive(px, 75))
    assert got is not None
    assert np.array_equal(got, want)


def test_hostile_sof_dimensions_rejected_cheaply():
    """ADVICE r12 (medium): a crafted SOF claiming huge dimensions must
    return None at parse time — BEFORE allocating coefficient planes —
    and MemoryError can never escape the dispatch point."""
    import time

    from tube_spark.operators import jpeg as J

    real = encode_baseline_jpeg(_noisy((16, 16, 3)), 75, "4:4:4")
    sof_at = real.find(b"\xff\xc0")
    assert sof_at > 0
    bomb = bytearray(real)
    # SOF payload: len(2) prec(1) h(2) w(2) — claim 65535 x 65535
    bomb[sof_at + 5 : sof_at + 9] = b"\xff\xff\xff\xff"
    t0 = time.monotonic()
    assert decode_baseline_jpeg(bytes(bomb)) is None
    assert time.monotonic() - t0 < 2.0  # parse-time rejection, no alloc
    # boundary: the cap itself, not the except clause, does the work
    assert 65535 * 65535 > J._MAX_PIXELS


def test_hostile_scan_count_capped():
    """A stream repeating tiny SOS segments past _MAX_SCANS returns
    None instead of multiplying full-image walks per segment."""
    from tube_spark.operators import jpeg as J
    from tube_spark.operators.jpeg import encode_progressive_jpeg

    prog = encode_progressive_jpeg(_noisy((16, 16, 3)), 75)
    assert decode_baseline_jpeg(prog) is not None
    # splice one AC scan (SOS..next-marker) many times before EOI
    body = prog[:-2]
    last_sos = body.rfind(b"\xff\xda")
    scan = body[last_sos:]
    hostile = body + scan * (J._MAX_SCANS + 8) + b"\xff\xd9"
    assert decode_baseline_jpeg(hostile) is None


def test_decode_media_dispatches_bare_jpeg():
    """Before r13 a bare .jpg payload — the majority web image format —
    fell through to kind="unknown" (only MJPEG-inside-AVI dispatched).
    Both baseline and progressive decode to image stats; header-only
    streams (no scan) degrade to dims with NULL value_mean."""
    from tube_spark.operators.multimodal import decode_media, synthesize_jpeg
    from tube_spark.operators.jpeg import (
        encode_baseline_jpeg,
        encode_progressive_jpeg,
    )

    px = _noisy((16, 24, 3))
    for enc in (encode_baseline_jpeg, encode_progressive_jpeg):
        m = decode_media(enc(px, 75))
        assert m["kind"] == "image"
        assert (m["width"], m["height"]) == (24, 16)
        assert m["value_mean"] == pytest.approx(
            float(decode_baseline_jpeg(enc(px, 75)).mean())
        )
    # header-only synth (no entropy scan): dims parse, pixels don't
    ho = decode_media(synthesize_jpeg(3, 40, 30))
    assert ho["kind"] == "image" and ho["width"] == 40
    assert ho["value_mean"] is None
