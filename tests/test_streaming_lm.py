"""Streaming bigram LM: bit-exact batch equivalence under a frozen
vocab, redelivery idempotency, frozen-vocab guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.lm import bigram_lm_perplexity, top_vocab
from tube_spark.streaming.lm import StreamingBigramLM

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def _pmap(df):
    return {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"], r["ppl"]) for r in df.collect()
    }


def test_stream_equals_batch_bit_exact(spark, docs, tmp_path):
    """Training corpus in three uneven batches vs the one-shot batch
    fit with the SAME frozen vocab: integer counts merge exactly and
    scoring shares the expression — scores are bit-identical."""
    vocab = [r["term"] for r in top_vocab(docs, vocab_size=20).collect()]
    lm = StreamingBigramLM(spark, str(tmp_path / "st.json"), vocab=vocab)
    for bid, (lo, hi) in enumerate([(0, 140), (140, 310), (310, 10**9)]):
        lm.process_batch(
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), bid
        )
    got = _pmap(lm.perplexity(docs))
    want = _pmap(bigram_lm_perplexity(docs, vocab_size=20))
    assert got == want


def test_uncapped_stream_equals_batch(spark, docs, tmp_path):
    sub = docs.filter(F.col("doc_id") < 120)
    lm = StreamingBigramLM(spark, str(tmp_path / "st.json"), vocab=None)
    lm.process_batch(sub.filter(F.col("doc_id") < 60), 0)
    lm.process_batch(sub.filter(F.col("doc_id") >= 60), 1)
    assert _pmap(lm.perplexity(sub)) == _pmap(bigram_lm_perplexity(sub))


def test_redelivery_and_vocab_guard(spark, docs, tmp_path):
    path = str(tmp_path / "st.json")
    lm = StreamingBigramLM(spark, path, vocab=["the", "a"])
    b0 = docs.filter(F.col("doc_id") < 50)
    lm.process_batch(b0, 0)
    s1 = open(path).read()
    lm.process_batch(b0, 0)  # replay: no-op
    assert open(path).read() == s1
    with pytest.raises(ValueError, match="frozen vocabulary"):
        StreamingBigramLM(spark, path, vocab=["the", "b"])._load()
