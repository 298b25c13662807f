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


def test_jsonl_ingest_to_mixture_to_shards(spark, tmp_path):
    """The round-8 front/middle stages compose with the sink: raw JSONL
    (with corrupt lines) -> schema-contract ingest + quarantine ->
    temperature mixture weights -> per-source token-budget sampling ->
    shard export, with accounting invariants at every joint."""
    import json

    from tube_spark.operators.mixture import mixture_sample, mixture_weights
    from tube_spark.sources.jsonl import read_jsonl

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    rows = docs.collect()
    lines = [
        json.dumps({
            "doc_id": r["doc_id"],
            "text": r["text"],
            "source": "web" if r["doc_id"] % 10 < 7 else "books",
        })
        for r in rows
    ] + ['{"doc_id": broken', "garbage line"]
    src = tmp_path / "raw"
    src.mkdir()
    (src / "part-0.jsonl").write_text("\n".join(lines) + "\n")

    clean, quar = read_jsonl(
        spark, str(src), "doc_id long, text string, source string",
        required=["doc_id", "text"],
    )
    assert clean.count() == len(rows) and quar.count() == 2

    toks = clean.withColumn("n_tok", token_count_bpe_ish(F.col("text")))
    plan = {
        r["source"]: r
        for r in mixture_weights(
            toks, "source", "n_tok", alpha=0.5, total_budget=20_000
        ).collect()
    }
    assert set(plan) == {"web", "books"}
    # fractional temperature upsamples the smaller source
    w_prop = plan["web"]["n_tokens"] / (plan["web"]["n_tokens"] + plan["books"]["n_tokens"])
    assert plan["web"]["weight"] < w_prop

    weights = {s: r["weight"] for s, r in plan.items()}
    sampled = mixture_sample(
        toks, weights, token_budget=20_000, id_col="doc_id",
        source_col="source", token_count_col="n_tok",
    )
    got_tokens = sampled.agg(F.sum("n_tok")).collect()[0][0]
    assert got_tokens >= 20_000 * 0.9  # boundary-doc inclusion, near-budget

    p = str(tmp_path / "mixshards")
    m = export_shards(
        sampled.select("doc_id", "text", "source", "n_tok"),
        p, "doc_id", token_budget=4096, token_count_col="n_tok",
        shuffle_seed=3,
    )
    assert m["n_rows"] == sampled.count()
    assert m["n_tokens"] == got_tokens
    assert verify_shards(spark, p).filter(~F.col("ok")).count() == 0
    # per-source presence survives the shard write
    back = spark.read.parquet(f"{p}/data")
    assert back.select("source").distinct().count() == 2
