"""Bigram LM perplexity vs an independent pure-Python reference."""

from __future__ import annotations

import math
import re
from collections import Counter

from tube_spark.operators.lm import UNK, bigram_lm_perplexity, top_vocab

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "the cat ate the fish"),
    (3, "zebra quark flux"),
    (4, "on"),  # single token: no bigram, must be omitted
    (5, None),  # null text: omitted
]


def _tok(t):
    return [w for w in re.split(r"[^a-z]+", (t or "").lower()) if w]


def _py_reference(docs, vocab_size=None, add_k=0.5, train=None):
    train = docs if train is None else train
    if vocab_size is not None:
        uc = Counter(w for _, t in train for w in _tok(t))
        keep = set(
            w for w, _ in sorted(uc.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
        )

        def m(w):
            return w if w in keep else UNK

    else:

        def m(w):
            return w

    def bigrams(t):
        toks = [m(w) for w in _tok(t)]
        return list(zip(toks, toks[1:]))

    c12 = Counter(b for _, t in train for b in bigrams(t))
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
            -math.log(
                (c12.get(b, 0) + add_k) / (c1.get(b[0], 0) + add_k * vev)
            )
            for b in bs
        ]
        avg = sum(nll) / len(nll)
        out[did] = (len(bs), round(avg, 6), round(math.exp(avg), 4))
    return out


def _rows(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_self_trained_matches_reference(spark):
    df = bigram_lm_perplexity(_rows(spark, DOCS))
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_nll"], r["ppl"]) for r in df.collect()}
    want = _py_reference(DOCS)
    assert got == want
    assert 4 not in got and 5 not in got


def test_vocab_cap_maps_unk(spark):
    df = bigram_lm_perplexity(_rows(spark, DOCS), vocab_size=3)
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_nll"], r["ppl"]) for r in df.collect()}
    want = _py_reference(DOCS, vocab_size=3)
    assert got == want
    # the cap actually bites: rare words collapse, so doc 3 (all-rare)
    # scores exactly like a sequence of <unk> bigrams
    keep = {r["term"] for r in top_vocab(_rows(spark, DOCS), vocab_size=3).collect()}
    assert len(keep) == 3 and "zebra" not in keep


def test_cross_corpus_scoring_handles_unseen(spark):
    train = _rows(spark, DOCS[:3])
    score = _rows(spark, [(9, "the cat sat on a brand new unseen mat")])
    df = bigram_lm_perplexity(score, train_docs=train)
    want = _py_reference(
        [(9, "the cat sat on a brand new unseen mat")], train=DOCS[:3]
    )
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_nll"], r["ppl"]) for r in df.collect()}
    assert got == want


def test_fluent_beats_shuffled(spark):
    # word-order sensitivity: a corpus-frequent sentence scores lower
    # perplexity than its reversal under the self-trained model
    docs = DOCS[:3] + [(10, "mat the on sat cat the")]
    df = bigram_lm_perplexity(_rows(spark, docs))
    got = {r["doc_id"]: r["ppl"] for r in df.collect()}
    assert got[0] < got[10]
