"""Property-based invariants for the round-4 curation operators:
chunking layout and mixture budgets must hold for arbitrary inputs."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tube_spark.operators.chunking import chunk_documents
from tube_spark.operators.mixture import mixture_sample


@pytest.fixture(scope="module")
def pspark(spark):
    return spark


words = st.lists(st.sampled_from("alpha beta gamma delta eps zeta eta".split()),
                 min_size=0, max_size=60)


@given(
    docs=st.lists(words, min_size=1, max_size=6),
    chunk=st.integers(min_value=1, max_value=12),
    data=st.data(),
)
@settings(max_examples=10, deadline=None)
def test_chunking_layout_invariants(pspark, docs, chunk, data):
    overlap = data.draw(st.integers(min_value=0, max_value=chunk - 1))
    stride = chunk - overlap
    df = pspark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "doc_id long, text string"
    )
    rows = chunk_documents(df, chunk, overlap).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, ws in enumerate(docs):
        n = len(ws)
        got = sorted(by_doc.get(i, []), key=lambda r: r["chunk_index"])
        if n == 0:
            assert got == []  # token-less docs vanish
            continue
        # contiguous indices, stride-aligned starts, bounded sizes
        assert [r["chunk_index"] for r in got] == list(range(len(got)))
        for r in got:
            assert r["start_token"] == r["chunk_index"] * stride
            assert 1 <= r["n_tokens"] <= chunk
            assert r["chunk_text"].split() == ws[r["start_token"]:r["start_token"] + r["n_tokens"]]
        # full coverage: every token index appears in some chunk
        covered = set()
        for r in got:
            covered.update(range(r["start_token"], r["start_token"] + r["n_tokens"]))
        assert covered == set(range(n))


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=30), min_size=1, max_size=40),
    budget=st.integers(min_value=1, max_value=400),
    w_a=st.floats(min_value=0.1, max_value=5),
    w_b=st.floats(min_value=0.1, max_value=5),
)
@settings(max_examples=10, deadline=None)
def test_mixture_budget_invariants(pspark, sizes, budget, w_a, w_b):
    rows = [
        (i, "a" if i % 2 == 0 else "b", n) for i, n in enumerate(sizes)
    ]
    df = pspark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    weights = {"a": w_a, "b": w_b}
    sel = mixture_sample(df, weights, budget).collect()
    total_w = w_a + w_b
    alloc = {s: int(budget * w / total_w) for s, w in weights.items()}
    per: dict[str, list] = {"a": [], "b": []}
    for r in sel:
        per[r["source"]].append(r)
        # selection rule: strictly inside the allocation before this doc
        assert r["cum_before"] < alloc[r["source"]]
    avail = {"a": sum(n for i, n in enumerate(sizes) if i % 2 == 0),
             "b": sum(n for i, n in enumerate(sizes) if i % 2 == 1)}
    for s, rs in per.items():
        taken = sum(r["n_tokens"] for r in rs)
        if avail[s] >= alloc[s]:
            # source had enough supply: allocation met (boundary doc may
            # overshoot by < its own size)
            assert taken >= alloc[s] or alloc[s] == 0
        else:
            assert taken == avail[s]  # exhausted source: everything taken
