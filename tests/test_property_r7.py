"""Property-based tests for the round-7 operators: KMV estimator
invariants (pure driver math, many examples) and dedup_lines
textual-vs-hashed path equivalence on random corpora (Spark, few
examples — JVM round-trips are the budget)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tube_spark.operators.overlap import kmv_overlap_stats

_SPACE = 1 << 60

sketch = st.lists(
    st.integers(1, _SPACE - 1), min_size=1, max_size=40, unique=True
).map(sorted)


@given(a=sketch, b=sketch, k=st.integers(8, 64))
@settings(max_examples=200, deadline=None)
def test_kmv_stats_invariants(a, b, k):
    s = kmv_overlap_stats(a, b, k)
    assert 0.0 <= s["jaccard_est"] <= 1.0
    assert s["n_a_est"] > 0 and s["n_b_est"] > 0 and s["n_union_est"] > 0
    assert s["n_intersection_est"] <= s["n_union_est"] + 1e-9
    # symmetry
    t = kmv_overlap_stats(b, a, k)
    assert t["jaccard_est"] == s["jaccard_est"]
    assert t["n_union_est"] == s["n_union_est"]
    assert (t["n_a_est"], t["n_b_est"]) == (s["n_b_est"], s["n_a_est"])
    # self-identity
    i = kmv_overlap_stats(a, a, k)
    assert i["jaccard_est"] == 1.0
    assert i["n_intersection_est"] == i["n_union_est"] == i["n_a_est"]


@given(a=sketch, b=sketch, k=st.integers(8, 64))
@settings(max_examples=200, deadline=None)
def test_kmv_disjoint_is_zero(a, b, k):
    sa, sb = set(a), set(b)
    if sa & sb:
        b = sorted(sb - sa)
        if not b:
            return
    s = kmv_overlap_stats(a, b, k)
    assert s["jaccard_est"] == 0.0 and s["n_intersection_est"] == 0.0


# a tiny line vocabulary forces real cross-document duplication
_LINES = [f"line variant number {i} with padding words" for i in range(8)]

corpus = st.lists(
    st.lists(st.integers(0, len(_LINES) - 1), min_size=1, max_size=6),
    min_size=2,
    max_size=8,
)


@given(docs=corpus)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dedup_lines_hash_equals_textual(spark, docs):
    """hash_lines=True output is identical to the textual path on
    arbitrary corpora — including heavy duplication and repeated lines
    within one document."""
    from tube_spark.operators.spandedup import dedup_lines

    df = spark.createDataFrame(
        [(i, "\n".join(_LINES[j] for j in d)) for i, d in enumerate(docs)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, dedup_lines(df, min_docs=2, min_line_chars=5).collect()))
    b = sorted(
        map(
            tuple,
            dedup_lines(
                df, min_docs=2, min_line_chars=5, hash_lines=True
            ).collect(),
        )
    )
    assert a == b


@given(n=st.integers(1, 5))
@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dedup_lines_unique_corpus_identity(spark, n):
    """With globally unique lines the rewrite is the identity."""
    from tube_spark.operators.spandedup import dedup_lines

    df = spark.createDataFrame(
        [
            (i, "\n".join(f"doc {i} unique line {j} padded" for j in range(n)))
            for i in range(4)
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup_lines(df, min_docs=2).collect()}
    for i in range(4):
        assert out[i]["n_lines_removed"] == 0
        assert out[i]["text"] == "\n".join(
            f"doc {i} unique line {j} padded" for j in range(n)
        )
