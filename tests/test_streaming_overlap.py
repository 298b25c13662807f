"""Streaming KMV maintenance: exact batch equivalence, idempotent
replay, and the true Structured Streaming wiring."""

from __future__ import annotations

from pyspark.sql import functions as F

from tube_spark.operators.overlap import corpus_overlap, kmv_minima
from tube_spark.streaming.overlap import (
    StreamingCorpusOverlap,
    streaming_corpus_overlap,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "corpus string, element string")


def _rows(lo, hi, shift):
    """Deterministic two-corpus element rows: corpus 'a' gets tok{i},
    corpus 'b' gets tok{i+shift} — partial vocabulary overlap."""
    out = []
    for i in range(lo, hi):
        out.append(("a", f"tok{i}"))
        out.append(("b", f"tok{i + shift}"))
    return out


def test_replay_matches_batch_exactly(spark, tmp_path):
    """After any batch schedule the maintained minima equal the batch
    sketch over everything — KMV merge is exact, so the overlap row is
    IDENTICAL (not just close) to corpus_overlap on the union."""
    k = 64
    all_rows = _rows(0, 3000, 1500)
    cuts = [0, 500, 1200, 3000]
    inc = StreamingCorpusOverlap(spark, str(tmp_path / "kmv.json"), k=k)
    for lo, hi in zip(cuts, cuts[1:]):
        inc.process_batch(_mk(spark, all_rows[2 * lo: 2 * hi]))

    batch_minima = {
        r["corpus"]: list(r["minima"])
        for r in kmv_minima(_mk(spark, all_rows), k=k).collect()
    }
    assert inc.minima("a") == batch_minima["a"]
    assert inc.minima("b") == batch_minima["b"]
    got = inc.overlap("a", "b").collect()[0]
    want = corpus_overlap(_mk(spark, all_rows), "a", "b", k=k).collect()[0]
    assert got.asDict() == want.asDict()


def test_redelivery_is_idempotent(spark, tmp_path):
    """Processing the same batch twice leaves the state unchanged —
    set-union merge needs no at-least-once bookkeeping."""
    inc = StreamingCorpusOverlap(spark, str(tmp_path / "kmv2.json"), k=32)
    b = _mk(spark, _rows(0, 400, 200))
    inc.process_batch(b)
    first = (inc.minima("a"), inc.minima("b"))
    inc.process_batch(b)
    assert (inc.minima("a"), inc.minima("b")) == first


def test_true_streaming_wiring(spark, tmp_path):
    """availableNow file stream drives the same maintenance."""
    src = str(tmp_path / "src")
    _mk(spark, _rows(0, 600, 300)).write.parquet(src)
    q = streaming_corpus_overlap(
        spark, src, str(tmp_path / "kmv3.json"), k=48,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    inc = StreamingCorpusOverlap(spark, str(tmp_path / "kmv3.json"), k=48)
    want = {
        r["corpus"]: list(r["minima"])
        for r in kmv_minima(_mk(spark, _rows(0, 600, 300)), k=48).collect()
    }
    assert inc.minima("a") == want["a"] and inc.minima("b") == want["b"]
