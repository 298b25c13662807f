"""Collocations (bigram lift) and reciprocal nearest neighbors:
python-reference equivalence, determinism, hub-suppression."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.mining import collocations
from tube_spark.operators.similarity import reciprocal_nn


def _toks(s):
    return [t for t in re.split(r"[^a-z]+", s.lower()) if t]


def _py_collocations(texts, min_count, k):
    uni: Counter = Counter()
    big: Counter = Counter()
    n = 0
    for t in texts:
        ts = _toks(t)
        uni.update(ts)
        n += len(ts)
        big.update(zip(ts, ts[1:]))
    rows = []
    for (a, b), cab in big.items():
        if cab < min_count:
            continue
        lift = round(n * cab / (uni[a] * uni[b]), 6)
        rows.append((a, b, cab, uni[a], uni[b], lift))
    rows.sort(key=lambda r: (-r[5], r[0], r[1]))
    return [
        (i + 1, a, b, cab, ca, cb, lift)
        for i, (a, b, cab, ca, cb, lift) in enumerate(rows[:k])
    ]


def test_collocations_match_python_reference(spark):
    texts = [
        "new york is big and new york is busy",
        "machine learning and machine learning again",
        "the new day the new start york alone",
        "learning machine is not machine learning",
    ] * 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["rank"], r["term_a"], r["term_b"], r["c_ab"], r["c_a"],
         r["c_b"], r["lift"])
        for r in collocations(df, min_count=3, k=30).orderBy("rank").collect()
    ]
    assert got == _py_collocations(texts, 3, 30)
    # the true collocations surface with above-independence lift
    by_pair = {(a, b): lift for _, a, b, _, _, _, lift in got}
    assert by_pair[("machine", "learning")] > 1.0
    assert by_pair[("new", "york")] > 1.0


def test_collocations_min_count_cuts_rare_noise(spark):
    # a once-seen pair of two hapaxes has huge lift — the cut removes it
    df = spark.createDataFrame(
        [(1, "zyxq wvut common common common common common")],
        "doc_id long, text string",
    )
    assert collocations(df, min_count=2, k=10).filter(
        "term_a = 'zyxq'"
    ).count() == 0
    with pytest.raises(ValueError):
        collocations(df, min_count=0)
    with pytest.raises(ValueError):
        collocations(df, k=0)


def _py_rnn(A, B):
    def cos(u, v):
        d = sum(x * y for x, y in zip(u, v))
        nu = sum(x * x for x in u) ** 0.5
        nv = sum(x * x for x in v) ** 0.5
        return d / (nu * nv)

    na = {
        ia: min(B, key=lambda ib: (-cos(A[ia], B[ib]), ib)) for ia in A
    }
    nb = {
        ib: min(A, key=lambda ia: (-cos(A[ia], B[ib]), ia)) for ib in B
    }
    return sorted(
        (ia, ib, round(cos(A[ia], B[ib]), 6))
        for ia, ib in na.items()
        if nb[ib] == ia
    )


def test_reciprocal_nn_matches_python_reference(spark):
    A = {1: [1.0, 0.0, 0.1], 2: [0.0, 1.0, 0.0], 3: [0.5, 0.5, 0.0]}
    B = {10: [0.9, 0.1, 0.0], 20: [0.1, 0.9, 0.1], 30: [1.0, 1.0, 0.0]}
    a = spark.createDataFrame(
        [(k, v) for k, v in A.items()], "vec_id long, embedding array<double>"
    )
    b = spark.createDataFrame(
        [(k, v) for k, v in B.items()], "vec_id long, embedding array<double>"
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["cosine"])
        for r in reciprocal_nn(a, b).collect()
    )
    assert got == _py_rnn(A, B)


def test_reciprocal_nn_suppresses_hub_matches(spark):
    # B's hub vector is the one-way top-1 of EVERY a, but it can only
    # reciprocate one — mutual filtering keeps exactly that pair
    hub = [1.0, 1.0]
    a = spark.createDataFrame(
        [(1, [1.0, 0.9]), (2, [0.9, 1.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    b = spark.createDataFrame(
        [(10, hub)], "vec_id long, embedding array<double>"
    )
    got = reciprocal_nn(a, b).collect()
    assert len(got) == 1
    assert (got[0]["id_a"], got[0]["id_b"]) == (3, 10)
    assert got[0]["cosine"] == 1.0
