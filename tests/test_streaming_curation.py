"""Incremental curation == batch curate_corpus, under any batch split."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.curation import curate_corpus
from tube_spark.streaming.curation import (
    IncrementalCuration,
    replay_curation,
    streaming_curation,
)

SF = "/root/testdata/sf0.001"
KW = dict(min_quality=0.5, ngram_n=1, jaccard_threshold=0.8)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def _batch_truth(docs):
    return {
        (r["doc_id"], r["n_tokens"], r["lang_pred"], round(r["quality_score"], 6))
        for r in curate_corpus(docs, None, **KW).collect()
    }


def _rows(df):
    return {
        (r["doc_id"], r["n_tokens"], r["lang_pred"], round(r["quality_score"], 6))
        for r in df.collect()
    }


def test_replay_matches_batch_3way(spark, docs, tmp_path):
    want = _batch_truth(docs)
    batches = [
        docs.filter(F.col("doc_id") < 150),
        docs.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 320)),
        docs.filter(F.col("doc_id") >= 320),
    ]
    got = _rows(replay_curation(spark, batches, str(tmp_path / "s3"), **KW))
    assert got == want


def test_replay_matches_batch_single(spark, docs, tmp_path):
    want = _batch_truth(docs)
    got = _rows(replay_curation(spark, [docs], str(tmp_path / "s1"), **KW))
    assert got == want


def test_replay_idempotent(spark, docs, tmp_path):
    """Crash-replaying an already-processed batch (at-least-once
    delivery) overwrites the same per-batch state dirs with identical
    content — survivors are unchanged, nothing duplicates."""
    b1 = docs.filter(F.col("doc_id") < 200)
    b2 = docs.filter(F.col("doc_id") >= 200)
    inc = IncrementalCuration(spark, str(tmp_path / "dup"), **KW)
    inc.process_batch(b1)
    inc.process_batch(b2)
    want = _rows(inc.survivors())
    assert want == _batch_truth(docs)
    inc.process_batch(b2)  # redeliver the last batch
    assert _rows(inc.survivors()) == want
    inc.process_batch(b1)  # redeliver an older batch
    assert _rows(inc.survivors()) == want


def test_monotone_contract_enforced(spark, docs, tmp_path):
    inc = IncrementalCuration(spark, str(tmp_path / "mono"), **KW)
    inc.process_batch(docs.filter(F.col("doc_id") >= 300))
    with pytest.raises(ValueError, match="monotone-id"):
        inc.process_batch(docs.filter(F.col("doc_id") < 300))


def test_streaming_wiring(spark, docs, tmp_path):
    """availableNow file-source run lands the same survivors as batch."""
    src = str(tmp_path / "src")
    docs.write.parquet(src)
    q = streaming_curation(
        spark, src, str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"), **KW
    )
    q.awaitTermination(180)
    got = _rows(IncrementalCuration(spark, str(tmp_path / "state"), **KW).survivors())
    assert got == _batch_truth(docs)
