"""End-to-end tokenizer pipeline: train BPE on the corpus, encode every
document with the trained vocab, and pack the corpus into token-budget
training shards addressed by REAL BPE token counts — the full
train-tokenizer -> tokenize -> shard path a pretraining pipeline runs,
exercised across operators/bpe.py and sinks/shards.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.bpe import encode_with_vocab, train_bpe
from tube_spark.sinks.shards import export_shards, verify_shards

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 200)
    )


def test_bpe_tokenize_to_token_budget_shards(spark, corpus, tmp_path):
    merges, vocab = train_bpe(corpus, num_merges=30)
    enc = encode_with_vocab(corpus, vocab)
    # every corpus word is in the self-trained vocab: no NULL tokens
    assert enc.filter(F.col("tokens").isNull()).count() == 0

    tok_counts = enc.groupBy("doc_id").agg(
        F.sum(F.size("tokens")).alias("n_bpe_tokens")
    )
    docs = corpus.join(tok_counts, "doc_id")
    n_docs = docs.count()
    total_tokens = docs.agg(F.sum("n_bpe_tokens")).collect()[0][0]
    budget = max(200, total_tokens // 8)

    store = str(tmp_path / "shards")
    m = export_shards(
        docs,
        store,
        key_col="doc_id",
        token_budget=budget,
        token_count_col="n_bpe_tokens",
        shuffle_seed=42,
    )
    assert m["n_rows"] == n_docs and m["n_tokens"] == total_tokens
    ok = verify_shards(spark, store)
    assert ok.filter(~F.col("ok")).count() == 0

    # every shard respects the budget up to one whole document's
    # overhang (whole-doc packing: a shard closes when adding the next
    # doc would cross the budget)
    published = spark.read.parquet(store)
    per_shard = (
        published.groupBy("shard")
        .agg(F.sum("n_bpe_tokens").alias("t"), F.count("*").alias("n"))
        .collect()
    )
    max_doc = docs.agg(F.max("n_bpe_tokens")).collect()[0][0]
    for r in per_shard:
        assert r["t"] < budget + max_doc
    assert sum(r["n"] for r in per_shard) == n_docs
    # the shard count is what the budget arithmetic implies: packing is
    # dense (total/budget floor .. plus slack for whole-doc overhang)
    n_shards = len(per_shard)
    assert n_shards >= total_tokens // (budget + max_doc)
    assert n_shards <= total_tokens // budget + 1
