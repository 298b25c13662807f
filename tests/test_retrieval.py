"""operators/retrieval.py: BM25 ranking and unigram LM scoring."""

from __future__ import annotations

import math

import pytest
from tube_spark.operators.retrieval import bm25_topk, unigram_lm_score


def test_bm25_ranks_multi_term_match_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark join spark join spark"),
            (2, "spark appears once here"),
            (3, "nothing relevant at all"),
            (4, "join join join join join join"),
        ],
        "doc_id long, text string",
    )
    rows = bm25_topk(docs, ["spark", "join"], k=3).collect()
    assert rows[0]["doc_id"] == 1 and rows[0]["n_matched_terms"] == 2
    assert {r["doc_id"] for r in rows} == {1, 2, 4}


def test_bm25_empty_terms_rejected(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(docs, [])


def test_lm_score_rare_tokens_score_higher(spark):
    docs = spark.createDataFrame(
        [
            (1, "common common common common"),
            (2, "common common common rare"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in unigram_lm_score(docs).collect()}
    # doc 2 contains the rare token -> higher avg NLL and perplexity
    assert got[2]["avg_nll"] > got[1]["avg_nll"]
    assert got[2]["ppl"] > got[1]["ppl"]
    # hand-check doc 1: p(common) = (7+1)/(8+2) = 0.8
    assert abs(got[1]["avg_nll"] - (-math.log(0.8))) < 1e-5


def test_lm_score_ppl_is_exp_of_nll(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a a a a a a")], "doc_id long, text string"
    )
    for r in unigram_lm_score(docs).collect():
        assert abs(r["ppl"] - math.exp(r["avg_nll"])) < 1e-3
