"""Property-based tests for the round-9 operators: bigram LM and DSIR
vs their pure-Python references over random corpora, DOULION estimator
degeneracy/monotonicity over random graphs."""

from __future__ import annotations

import itertools
import math
import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tube_spark.operators.dsir import dsir_log_weights
from tube_spark.operators.lm import UNK, bigram_lm_perplexity

WORDS = ["the", "cat", "dog", "sat", "ran", "on", "mat", "log", "qx", "zz"]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=8).map(" ".join),
    min_size=2,
    max_size=8,
)


def _tok(t):
    return [w for w in re.split(r"[^a-z]+", (t or "").lower()) if w]


def _py_bigram(docs, vocab_size, add_k=0.5):
    if vocab_size is not None:
        uc = Counter(w for _, t in docs for w in _tok(t))
        keep = set(
            w
            for w, _ in sorted(uc.items(), key=lambda kv: (-kv[1], kv[0]))[
                :vocab_size
            ]
        )
        m = lambda w: w if w in keep else UNK  # noqa: E731
    else:
        m = lambda w: w  # noqa: E731

    def bigrams(t):
        toks = [m(w) for w in _tok(t)]
        return list(zip(toks, toks[1:]))

    c12 = Counter(b for _, t in docs for b in bigrams(t))
    c1 = Counter()
    for (w1, _), c in c12.items():
        c1[w1] += c
    vev = len({w2 for _, w2 in c12})
    out = {}
    for did, t in docs:
        bs = bigrams(t)
        if not bs:
            continue
        nll = [
            -math.log((c12[b] + add_k) / (c1[b[0]] + add_k * vev)) for b in bs
        ]
        avg = sum(nll) / len(nll)
        out[did] = (len(bs), round(avg, 6), round(math.exp(avg), 4))
    return out


@given(texts=corpus_strategy, vocab_size=st.one_of(st.none(), st.integers(1, 6)))
@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bigram_lm_matches_reference_any_corpus(spark, texts, vocab_size):
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"], r["ppl"])
        for r in bigram_lm_perplexity(df, vocab_size=vocab_size).collect()
    }
    assert got == _py_bigram(docs, vocab_size)


@given(
    raw_texts=corpus_strategy,
    tgt_texts=st.lists(
        st.lists(st.sampled_from(WORDS), min_size=1, max_size=6).map(" ".join),
        min_size=1,
        max_size=4,
    ),
)
@settings(
    max_examples=5, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dsir_total_weight_identity(spark, raw_texts, tgt_texts):
    """Invariant (holds for ANY corpora): when raw == target, every
    log-ratio is 0, so all weights are exactly 0; and n_feats equals
    tokens + bigrams per doc."""
    docs = list(enumerate(raw_texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    same = dsir_log_weights(df, df, dim=64)
    for r in same.collect():
        assert r["log_weight"] == 0.0 and r["avg_log_weight"] == 0.0
        toks = _tok(docs[r["doc_id"]][1])
        assert r["n_feats"] == len(toks) + max(len(toks) - 1, 0)


@given(n_nodes=st.integers(4, 16), n_edges=st.integers(3, 40), seed=st.integers(0, 999))
@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_triangle_census_matches_reference_any_graph(spark, n_nodes, n_edges, seed):
    import random

    from tube_spark.operators.triangles import triangle_stats

    rng = random.Random(seed)
    pairs = {
        tuple(sorted(rng.sample(range(n_nodes), 2))) for _ in range(n_edges)
    }
    es = set(pairs)
    nodes = sorted({x for e in es for x in e})
    want = sum(
        1
        for u, v, w in itertools.combinations(nodes, 3)
        if (u, v) in es and (v, w) in es and (u, w) in es
    )
    df = spark.createDataFrame(sorted(pairs), "a long, b long")
    got = triangle_stats(df).collect()[0]
    assert got["n_triangles"] == want
    assert got["n_edges"] == len(pairs)
    # wedge identity: sum over nodes of C(deg, 2)
    deg = Counter(x for e in es for x in e)
    assert got["n_wedges"] == sum(d * (d - 1) // 2 for d in deg.values())
