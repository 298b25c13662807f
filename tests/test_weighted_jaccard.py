"""Exact weighted Jaccard rescoring: python-reference equivalence,
repetition sensitivity, no-overlap pairs."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from tube_spark.operators.dedup import weighted_jaccard_pairs

SF = "/root/testdata/sf0.001"


def _toks(s):
    return [t for t in re.split(r"[^a-z]+", s.lower()) if t]


def _py_wj(a, b):
    ca, cb = Counter(_toks(a)), Counter(_toks(b))
    inter = sum(min(ca[t], cb[t]) for t in ca.keys() & cb.keys())
    union = sum(ca.values()) + sum(cb.values()) - inter
    return inter, union, round(inter / union, 6) if union else 0.0


def test_matches_python_reference_on_real_docs(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    texts = {r["doc_id"]: r["text"] for r in docs.limit(40).collect()}
    ids = sorted(texts)
    pair_list = [(ids[i], ids[i + 1]) for i in range(0, len(ids) - 1, 2)]
    pairs = spark.createDataFrame(pair_list, "id_a long, id_b long")
    got = {
        (r["id_a"], r["id_b"]): (
            r["w_intersection"], r["w_union"], r["weighted_jaccard"]
        )
        for r in weighted_jaccard_pairs(docs, pairs).collect()
    }
    assert len(got) == len(pair_list)
    for a, b in pair_list:
        assert got[(a, b)] == _py_wj(texts[a], texts[b])


def test_repetition_is_signal(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam ham"),
            (2, "spam ham"),
            (3, "spam spam spam spam eggs"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    got = {
        (r["id_a"], r["id_b"]): r["weighted_jaccard"]
        for r in weighted_jaccard_pairs(docs, pairs).collect()
    }
    # SET Jaccard would call (1,2) identical (same term sets: 1.0) and
    # (1,3) 2/3; weighted sees the repetition: (1,2) = 2/5, (1,3) = 4/6
    assert got[(1, 2)] == round(2 / 5, 6)
    assert got[(1, 3)] == round(4 / 6, 6)
    assert got[(1, 3)] > got[(1, 2)]


def test_disjoint_pair_scores_zero(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = weighted_jaccard_pairs(docs, pairs).first()
    assert r["n_common_terms"] == 0 and r["w_intersection"] == 0
    assert r["w_union"] == 4 and r["weighted_jaccard"] == 0.0


def test_tokenless_participant_keeps_pair_with_zero_score(spark):
    # a candidate whose participant has no tokens (empty / non-alpha
    # text, or an id missing from docs entirely) is KEPT with a 0.0
    # score — totals are left-joined and coalesced, never an inner join
    # that silently drops the pair
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, "123 !!!"), (4, "alpha beta")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 9), (2, 3), (1, 4)], "id_a long, id_b long"
    )
    got = {
        (r["id_a"], r["id_b"]): (
            r["w_intersection"], r["w_union"], r["weighted_jaccard"]
        )
        for r in weighted_jaccard_pairs(docs, pairs).collect()
    }
    assert len(got) == 5  # nothing dropped
    assert got[(1, 2)] == (0, 2, 0.0)  # empty text
    assert got[(1, 3)] == (0, 2, 0.0)  # non-alpha text
    assert got[(1, 9)] == (0, 2, 0.0)  # id absent from docs
    assert got[(2, 3)] == (0, 0, 0.0)  # both token-less: w_union 0
    assert got[(1, 4)] == (2, 2, 1.0)  # control: identical docs
