"""Content-defined chunking: python/Spark agreement, insertion
stability (the whole point), max-size forcing, overlap scoring."""

from __future__ import annotations

import hashlib

import pytest

from tube_spark.operators.cdc import (
    cdc_boundaries,
    chunk_overlap,
    chunk_payloads,
    gear_table,
)


def _payload(seed: int, n: int) -> bytes:
    x, out = seed or 1, bytearray()
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        out.append((x >> 33) & 0xFF)
    return bytes(out)


def test_gear_table_is_fixed():
    t = gear_table()
    assert len(t) == 256 and len(set(t)) == 256
    assert t == gear_table()  # pure function of the constant seed


def test_boundaries_deterministic_and_bounded():
    p = _payload(7, 20_000)
    b1 = cdc_boundaries(p)
    assert b1 == cdc_boundaries(p)
    assert b1[-1] == len(p)
    lens = [e - s for s, e in zip([0] + b1[:-1], b1)]
    # every chunk obeys max; every chunk except possibly the last
    # obeys min (the tail is whatever remains)
    assert all(x <= 4096 for x in lens)
    assert all(x >= 256 for x in lens[:-1])
    # average in the right ballpark for random content
    assert 512 <= sum(lens) / len(lens) <= 2048


def test_insertion_shifts_only_local_chunks():
    # fixed-offset chunking would invalidate EVERY chunk after the
    # insertion point; CDC re-synchronizes within a few chunks
    p = _payload(3, 30_000)
    q = p[:9000] + b"INSERTED BYTES" + p[9000:]
    h_p = {hashlib.md5(p[s:e]).hexdigest()
           for s, e in zip([0] + cdc_boundaries(p)[:-1], cdc_boundaries(p))}
    h_q = {hashlib.md5(q[s:e]).hexdigest()
           for s, e in zip([0] + cdc_boundaries(q)[:-1], cdc_boundaries(q))}
    shared = len(h_p & h_q)
    assert shared / len(h_p) > 0.7  # most chunks survive the insertion


def test_pathological_content_forced_at_max():
    bounds = cdc_boundaries(b"\x00" * 10_000, max_size=2048)
    lens = [e - s for s, e in zip([0] + bounds[:-1], bounds)]
    assert all(x <= 2048 for x in lens)
    assert lens[:-1] == [2048] * (len(lens) - 1)  # never triggers → forced


def test_validation():
    with pytest.raises(ValueError, match="power of two"):
        cdc_boundaries(b"x", avg_size=1000)
    with pytest.raises(ValueError, match="min_size"):
        cdc_boundaries(b"x", min_size=0)


def test_spark_chunks_match_local(spark):
    rows = [(i, _payload(i, 8000 + 500 * i)) for i in range(4)] + [(9, None)]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = chunk_payloads(df).orderBy("doc_id", "chunk_idx").collect()
    assert all(r["doc_id"] != 9 for r in got)  # null payload: no rows
    for did, payload in rows[:4]:
        bounds = cdc_boundaries(payload)
        mine = [r for r in got if r["doc_id"] == did]
        assert [r["chunk_len"] for r in mine] == [
            e - s for s, e in zip([0] + bounds[:-1], bounds)
        ]
        assert mine[0]["chunk_hash"] == hashlib.md5(
            payload[: bounds[0]]
        ).hexdigest()
        # offsets reconstruct the payload partition exactly
        assert mine[0]["offset"] == 0
        assert all(
            mine[i]["offset"] + mine[i]["chunk_len"] == mine[i + 1]["offset"]
            for i in range(len(mine) - 1)
        )


def test_chunk_overlap_finds_embedded_payload(spark):
    # the same content wrapped with different prefixes/suffixes (the
    # re-muxed-container story): chunk overlap sees through it
    core = _payload(42, 25_000)
    rows = [
        (1, b"HDR-A" * 100 + core + b"TRAILER-A"),
        (2, b"X" * 700 + core),
        (3, _payload(99, 25_000)),  # unrelated
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    ov = {
        (r["id_a"], r["id_b"]): r["containment_a"]
        for r in chunk_overlap(chunk_payloads(df), min_shared=2).collect()
    }
    assert (1, 2) in ov and ov[(1, 2)] > 0.7
    assert (1, 3) not in ov and (2, 3) not in ov
