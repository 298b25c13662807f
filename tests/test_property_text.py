"""Property-based tests for the text expression layer: invariants that
must hold for arbitrary input strings (hypothesis-generated, executed
in batches through Spark once per example set for speed)."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tube_spark.functions.text import fingerprint, normalize, token_count_bpe_ish, tokens, word_shingles

texts = st.lists(
    st.text(alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)), max_size=80),
    min_size=1,
    max_size=20,
)


def _run(spark, rows, *cols):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(rows)], "i long, t string")
    return df.select("i", *cols).collect()


@pytest.fixture(scope="module")
def pspark(spark):
    return spark


@given(ts=texts)
@settings(max_examples=10, deadline=None)
def test_text_invariants(pspark, ts):
    out = _run(
        pspark,
        ts,
        tokens(F.col("t")).alias("tok"),
        normalize(F.col("t")).alias("norm"),
        fingerprint(F.col("t")).alias("fp"),
        token_count_bpe_ish(F.col("t")).alias("bpe"),
        word_shingles(tokens(F.col("t")), 2).alias("sh2"),
    )
    for r in out:
        t = ts[r["i"]]
        # tokens: lowercase alpha runs only, no empties
        assert all(tok and re.fullmatch(r"[a-z]+", tok) for tok in r["tok"])
        # normalize idempotence + charset
        assert re.fullmatch(r"[a-z0-9 ]*", r["norm"]) and "  " not in r["norm"]
        # fingerprint: 32 hex chars, stable under normalization
        assert re.fullmatch(r"[0-9a-f]{32}", r["fp"])
        # bpe-ish token count ≥ whitespace word count of alnum runs
        assert r["bpe"] >= 0
        # bigrams: count = max(len(tok)-1, 0) before dedup → after dedup ≤
        assert len(r["sh2"]) <= max(len(r["tok"]) - 1, 0) or len(r["tok"]) == 0
        # every bigram is two tokens joined by one space
        for g in r["sh2"]:
            parts = g.split(" ")
            assert len(parts) == 2 and all(p in r["tok"] for p in parts)


@given(ts=texts)
@settings(max_examples=6, deadline=None)
def test_fingerprint_normalization_equivalence(pspark, ts):
    """fingerprint(t) == fingerprint(normalize(t)) — normalization is
    a fixpoint, so case/punctuation variants collide on purpose."""
    out = _run(
        pspark,
        ts,
        fingerprint(F.col("t")).alias("a"),
        fingerprint(normalize(F.col("t"))).alias("b"),
    )
    for r in out:
        assert r["a"] == r["b"]
