"""End-to-end training-data pipeline integration: the operator
families compose — curate → leakage-safe split → pack → shard export —
with conservation and leakage invariants checked at every stage.

This is the user journey the extension suite exists for; each stage is
unit/oracle-tested on its own, this test pins that the OUTPUTS of one
stage are valid INPUTS to the next (schema and semantics), on the real
sf0.001 documents."""

from __future__ import annotations

from pyspark.sql import functions as F

from tube_spark.functions.text import token_count_bpe_ish
from tube_spark.operators.curation import curate_corpus
from tube_spark.operators.dedup import minhash_lsh_pairs
from tube_spark.operators.packing import chunk_concat
from tube_spark.operators.sampling import leakage_safe_split
from tube_spark.sinks.shards import export_shards, read_manifest, verify_shards

SF = "/root/testdata/sf0.001"


def test_corpus_to_training_shards(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()

    # 1. curate: quality + near-dup gates
    curated_ids = curate_corpus(docs, min_quality=0.0).select("doc_id")
    curated = docs.join(curated_ids, "doc_id", "left_semi")
    n_curated = curated.count()
    assert 0 < n_curated <= n_docs

    # 2. leakage-safe split on the CURATED corpus
    pairs = minhash_lsh_pairs(
        curated, "doc_id", "text", n=2, num_hashes=64, bands=16,
        threshold=0.5, portable=True,
    )
    split = leakage_safe_split(curated.select("doc_id"), pairs)
    assert split.count() == n_curated
    # no duplicate group straddles splits
    assert (
        split.groupBy("group_id")
        .agg(F.count_distinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
        == 0
    )

    # 3. train subset → token counts → packed sequence layout
    train = curated.join(
        split.filter(F.col("split") == "train").select("doc_id"),
        "doc_id",
        "left_semi",
    ).withColumn("n_tok", token_count_bpe_ish(F.col("text")))
    n_train = train.count()
    assert 0 < n_train < n_curated
    placed = chunk_concat(train, "doc_id", "n_tok", seq_len=512)
    total_tokens = train.filter(F.col("n_tok") > 0).agg(F.sum("n_tok")).collect()[0][0]
    n_seqs = -(-total_tokens // 512)
    assert placed.agg(F.max("end_seq")).collect()[0][0] == n_seqs - 1

    # 4. shard export of the packed train docs, token-budgeted
    p = str(tmp_path / "shards")
    m = export_shards(
        train.select("doc_id", "text", "n_tok"),
        p, "doc_id", token_budget=4096, token_count_col="n_tok",
        shuffle_seed=11,
    )
    assert m["n_rows"] == n_train
    assert m["n_tokens"] == train.agg(F.sum("n_tok")).collect()[0][0]
    assert verify_shards(spark, p).filter(~F.col("ok")).count() == 0

    # 5. leakage check END TO END: no doc in the shard store shares a
    # duplicate group with a val/test doc
    shard_ids = spark.read.parquet(f"{p}/data").select("doc_id")
    holdout_groups = (
        split.filter(F.col("split") != "train").select("group_id").distinct()
    )
    leaked = (
        split.join(shard_ids, "doc_id", "left_semi")
        .join(holdout_groups, "group_id", "left_semi")
        .count()
    )
    assert leaked == 0
    # manifest is re-readable and consistent
    assert read_manifest(spark, p)["n_rows"] == n_train
