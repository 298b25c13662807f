"""ngram_novelty and structural_templates: python-reference
equivalence and contract edges (short docs kept, null text, exact-dup
vs fill-in template discrimination)."""

from __future__ import annotations

import re
from collections import defaultdict

import pytest

from tube_spark.operators.text_analysis import (
    ngram_novelty,
    structural_templates,
)


def _toks(s):
    return [t for t in re.split(r"[^a-z]+", s.lower()) if t]


def _py_novelty(docs, n):
    grams = {
        did: set(
            " ".join(t[i : i + n]) for i in range(len(t) - n + 1)
        )
        for did, t in ((d, _toks(s or "")) for d, s in docs)
    }
    first = {}
    for did in sorted(grams):
        for g in grams[did]:
            first.setdefault(g, did)
    out = {}
    for did, gs in grams.items():
        novel = sum(1 for g in gs if first[g] == did)
        out[did] = (
            len(gs),
            novel,
            round(novel / len(gs), 6) if gs else None,
        )
    return out


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat on the hat"),          # shares 'the cat sat' etc.
    (3, "the cat sat on the mat"),          # exact dup of 1: zero novelty
    (4, "completely different words here today"),
    (5, "xy"),                              # 1 token: no trigrams
    (6, None),                              # null text: kept, 0 grams
]


def test_novelty_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty"])
        for r in ngram_novelty(df, "doc_id", "text", n=3).collect()
    }
    want = _py_novelty(DOCS, 3)
    assert got == want
    assert got[1][2] == 1.0      # first doc: all grams novel
    assert got[3] == (4, 0, 0.0)  # exact dup: zero novelty
    assert got[5] == (0, 0, None) and got[6] == (0, 0, None)  # kept


def test_novelty_validation(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        ngram_novelty(df, n=0)


TEMPLATE_DOCS = [
    (1, "Error 404: page not found"),
    (2, "Error 500: page not found"),       # same skeleton, different text
    (3, "Error 404: page not found"),       # exact dup of 1
    (4, "a unique sentence"),
    (5, "another unique sentence entirely"),
    (6, None),
]


def test_templates_discriminate_fill_in_from_exact_dup(spark):
    df = spark.createDataFrame(TEMPLATE_DOCS, "doc_id long, text string")
    rows = structural_templates(df, min_docs=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["skeleton"] == "w 0: w w w"
    assert r["n_docs"] == 3
    assert r["n_texts"] == 2  # a true fill-in template, not just dups
    assert r["example_doc_id"] == 1
    assert r["total_chars"] == sum(
        len(t) for _, t in TEMPLATE_DOCS[:3]
    )


def test_templates_min_docs_one_returns_singletons(spark):
    df = spark.createDataFrame(TEMPLATE_DOCS, "doc_id long, text string")
    rows = structural_templates(df, min_docs=1).collect()
    # null-text doc excluded; 3 skeletons total (template + 2 uniques)
    assert len(rows) == 3
    with pytest.raises(ValueError):
        structural_templates(df, min_docs=0)
