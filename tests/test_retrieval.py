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


def test_rrf_fuse_hand_computed(spark):
    """Two 3-item lists with one shared doc: fused scores match the
    closed-form 1/(60+r) sums and the shared doc wins."""
    from tube_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    b = spark.createDataFrame([(2, 1), (4, 2), (5, 3)], "doc_id long, rank int")
    got = {r["doc_id"]: r for r in rrf_fuse([a, b], ["x", "y"], k=10).collect()}
    assert abs(got[2]["rrf_score"] - round(1 / 62 + 1 / 61, 6)) < 1e-9
    assert abs(got[1]["rrf_score"] - round(1 / 61, 6)) < 1e-9
    assert got[2]["x_rank"] == 2 and got[2]["y_rank"] == 1
    assert got[4]["x_rank"] is None
    best = max(got.values(), key=lambda r: r["rrf_score"])
    assert best["doc_id"] == 2


def test_hybrid_topk_ranks_bounded_and_deterministic(spark):
    from tube_spark.operators.retrieval import hybrid_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    r1 = hybrid_topk(docs, emb, ["join", "spark"], query_vec_id=0, k=10, pool=15)
    r2 = hybrid_topk(docs, emb, ["join", "spark"], query_vec_id=0, k=10, pool=15)
    rows1, rows2 = r1.collect(), r2.collect()
    assert rows1 == rows2
    assert len(rows1) == 10
    for r in rows1:
        for c in ("bm25_rank", "dense_rank"):
            assert r[c] is None or 1 <= r[c] <= 15
        # query doc never retrieves itself on the dense side
        assert not (r["doc_id"] == 0 and r["dense_rank"] is not None)


def test_doc_keywords_reference(spark):
    """Hand-checkable corpus: rare terms out-score common ones, ranks
    deterministic, sklearn smooth-idf math."""
    import math

    from tube_spark.operators.retrieval import doc_keywords

    rows = [
        (1, "apple apple banana common common common"),
        (2, "banana cherry common common"),
        (3, "common cherry"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["score"])
        for r in doc_keywords(df, k=2).collect()
    }

    def idf(dfreq):
        return math.log((1 + 3) / (1 + dfreq)) + 1

    # doc 1: apple tf=2 df=1 beats common tf=3 df=3 (idf 1.0)
    assert got[(1, 1)] == ("apple", round(2 * idf(1), 6))
    assert got[(1, 2)][0] in ("banana", "common")
    # doc 3: cherry (df=2) out-scores common (df=3)
    assert got[(3, 1)] == ("cherry", round(1 * idf(2), 6))
    assert got[(3, 2)] == ("common", round(1 * idf(3), 6))
