"""Deterministic splits / stratified sampling semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.sampling import hash_split, stratified_sample


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).select(F.col("id").alias("doc_id")).cache()


def test_split_deterministic_and_partition_independent(spark, ids):
    a = {r["doc_id"]: r["split"] for r in hash_split(ids).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(ids.repartition(13)).collect()
    }
    assert a == b  # same membership under any partitioning
    assert set(a.values()) == {"train", "val", "test"}
    n = len(a)
    train = sum(1 for v in a.values() if v == "train")
    assert 0.75 * n < train < 0.85 * n  # ~80% within hash noise


def test_split_stable_under_append(spark, ids):
    """New rows never displace old ones: the split of the first 2000
    ids is unchanged when 1000 more arrive."""
    before = {r["doc_id"]: r["split"] for r in hash_split(ids).collect()}
    more = spark.range(0, 3000).select(F.col("id").alias("doc_id"))
    after = {r["doc_id"]: r["split"] for r in hash_split(more).collect()}
    assert all(after[k] == v for k, v in before.items())


def test_split_weights_validated(ids):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(ids, weights={"a": 0.5, "b": 0.1})


def test_stratified_sample_fraction_and_nesting(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept10 = stratified_sample(df, "lang", {"en": 0.1}, default_fraction=0.0)
    kept30 = stratified_sample(df, "lang", {"en": 0.3}, default_fraction=0.0)
    n10, n30 = kept10.count(), kept30.count()
    assert 0.05 * 2000 < n10 < 0.15 * 2000  # ≈10% of the 2000 'en' rows
    assert 0.25 * 2000 < n30 < 0.35 * 2000
    assert kept10.filter(F.col("lang") == "de").count() == 0  # default 0
    # nested: the 10% sample is a strict subset of the 30% sample
    extra = kept10.join(kept30, "doc_id", "left_anti").count()
    assert extra == 0


def test_stratified_sample_map_only_plan(spark):
    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    out = stratified_sample(df, "lang", {"en": 0.5})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # one scan, no shuffle


def test_fraction_bounds_validated(spark):
    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError, match="fraction"):
        stratified_sample(df, "lang", {"en": 1.5})


def test_leakage_safe_split_no_group_straddles(spark):
    """Every duplicate group lands wholly inside one split — the
    property doc-keyed splitting cannot give."""
    from tube_spark.operators.dedup import minhash_lsh_pairs
    from tube_spark.operators.sampling import leakage_safe_split

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", n=2, num_hashes=64, bands=16,
        threshold=0.5, portable=True,
    )
    out = leakage_safe_split(docs.select("doc_id"), pairs)
    straddlers = (
        out.groupBy("group_id")
        .agg(F.count_distinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert straddlers == 0
    # the corpus actually exercises the property: some non-singleton
    # group exists and all three splits are populated
    assert out.filter(F.col("group_id") != F.col("doc_id")).count() > 0
    assert out.select("split").distinct().count() == 3


def test_leakage_safe_split_degrades_to_hash_split(spark):
    """With no duplicate pairs, assignment equals plain hash_split on
    the doc id (same seed, same buckets) — group_id = doc_id."""
    from tube_spark.operators.sampling import leakage_safe_split

    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    got = {
        r["doc_id"]: (r["group_id"], r["split"])
        for r in leakage_safe_split(docs, pairs).collect()
    }
    want = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    assert got.keys() == want.keys()
    for d, (g, s) in got.items():
        assert g == d and s == want[d]


def test_leakage_safe_split_pair_moves_doc(spark):
    """A pair linking two docs whose solo buckets differ forces both
    into the group root's split."""
    from tube_spark.operators.sampling import leakage_safe_split

    docs = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    solo = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    # find two ids whose solo splits differ
    a = next(d for d in solo if solo[d] == "train")
    b = next(d for d in solo if solo[d] == "test")
    pairs = spark.createDataFrame([(min(a, b), max(a, b))], "id_a long, id_b long")
    out = {
        r["doc_id"]: (r["group_id"], r["split"])
        for r in leakage_safe_split(docs, pairs).collect()
    }
    root = min(a, b)
    assert out[a] == (root, solo[root]) and out[b] == (root, solo[root])
