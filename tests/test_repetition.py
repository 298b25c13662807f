"""operators/text_analysis.repetition_stats: Gopher-style repetition
signals on hand-built documents where the right answer is visible."""

from __future__ import annotations

from tube_spark.operators.text_analysis import repetition_stats


def _stats(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in repetition_stats(df).collect()}


def test_repetitive_doc_flagged(spark):
    rows = [
        (1, "spam spam spam spam spam spam"),
        (2, "the quick brown fox jumps over a lazy dog"),
    ]
    got = _stats(spark, rows)
    # doc 1: every 2-gram is "spam spam" -> top_2gram_frac == 1
    assert got[1]["top_2gram_frac"] == 1.0
    assert got[1]["dup_3gram_frac"] > 0.5
    assert got[1]["is_repetitive"]
    # doc 2: all distinct words, no repeated grams at all
    assert got[2]["dup_1gram_frac"] == 0.0
    assert got[2]["dup_2gram_frac"] == 0.0
    assert got[2]["top_2gram_frac"] < 0.2
    assert not got[2]["is_repetitive"]


def test_exact_fractions(spark):
    # "a b a b c": 1-grams a,b,a,b,c -> top(a)=2/5, dup=(5-3)/5
    #              2-grams "a b","b a","a b","b c" -> top=2/4, dup=1/4
    got = _stats(spark, [(7, "a b a b c")])[7]
    assert got["top_1gram_frac"] == 0.4
    assert got["dup_1gram_frac"] == 0.4
    assert got["top_2gram_frac"] == 0.5
    assert got["dup_2gram_frac"] == 0.25


def test_tokenless_doc_survives_with_zeros(spark):
    got = _stats(spark, [(9, "12345 678"), (10, "real words here")])
    assert got[9]["top_1gram_frac"] == 0.0 and got[9]["dup_3gram_frac"] == 0.0
    assert not got[9]["is_repetitive"]
    assert got[10]["top_1gram_frac"] > 0
