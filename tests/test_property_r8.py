"""Property-based tests for the round-8 operators: shard addressing
invariants over random sizes/seeds, PCA model invariants over random
moment state (pure driver math), mixture-weight normalization, and
prefix-length arithmetic (the losslessness precondition)."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tube_spark.operators.pca import model_from_moments
from tube_spark.sinks.shards import export_shards, verify_shards


@given(
    rows_per_shard=st.integers(7, 200),
    seed=st.integers(0, 1 << 30),
)
@settings(
    max_examples=4, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_shard_addressing_invariants(spark, tmp_path_factory, rows_per_shard, seed):
    """For ANY shard size and seed: exact sizes on every full shard,
    contiguous persisted rank space, xor-of-fingerprints equals the
    corpus fingerprint, verify green."""
    from pyspark.sql import functions as F

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(300)
    )
    p = str(tmp_path_factory.mktemp("shprop") / "s")
    m = export_shards(docs, p, "doc_id", rows_per_shard=rows_per_shard, shuffle_seed=seed)
    n = 300
    full, last = divmod(n, rows_per_shard)
    sizes = {int(k): v["n_rows"] for k, v in m["shards"].items()}
    assert all(sizes[k] == rows_per_shard for k in range(full))
    if last:
        assert sizes[full] == last
    assert m["n_shards"] == full + (1 if last else 0)
    ranks = sorted(
        r["rank"] for r in spark.read.parquet(f"{p}/data").select("rank").collect()
    )
    assert ranks == list(range(n))
    fp = 0
    for v in m["shards"].values():
        fp ^= v["fp"]
    want = docs.agg(F.bit_xor(F.xxhash64(F.col("doc_id").cast("string")))).collect()[0][0]
    assert fp == want
    assert verify_shards(spark, p).filter(~F.col("ok")).count() == 0


moments = st.integers(20, 400).flatmap(
    lambda n: st.tuples(
        st.just(n),
        st.lists(
            st.lists(st.floats(-5, 5, allow_nan=False), min_size=6, max_size=6),
            min_size=20, max_size=60,
        ),
    )
)


@given(data=moments, k=st.integers(1, 6))
@settings(max_examples=60, deadline=None)
def test_pca_model_invariants_random_moments(data, k):
    """model_from_moments on random vector sets: orthonormal
    components, non-increasing eigenvalues, eigenvalue sum <= total
    variance, explained ratios in [0, 1]."""
    _, vecs = data
    X = np.array(vecs)
    n, dim = X.shape
    s = X.sum(axis=0).tolist()
    iu = np.triu_indices(dim)
    g = (X.T @ X)[iu].tolist()
    model = model_from_moments(n, s, g, dim, k)
    C = np.array(model.components)
    assert np.allclose(C @ C.T, np.eye(k), atol=1e-8)
    evs = model.eigenvalues
    assert all(evs[i] >= evs[i + 1] - 1e-12 for i in range(len(evs) - 1))
    ratios = model.explained_variance_ratio()
    total_var = np.trace(np.cov(X, rowvar=False, ddof=1))
    assert sum(evs) <= total_var + 1e-6
    assert all(-1e-12 <= r <= 1 + 1e-9 for r in ratios)


@given(
    sizes=st.lists(st.integers(1, 10**9), min_size=2, max_size=8),
    alpha=st.floats(0.0, 2.0, allow_nan=False),
)
@settings(max_examples=200, deadline=None)
def test_mixture_weight_math(sizes, alpha):
    """The weight formula (pure math twin of mixture_weights):
    normalized, order-independent, and monotone — a source with more
    tokens never gets a smaller weight."""
    pw = [t ** alpha for t in sizes]
    tot = sum(pw)
    w = [x / tot for x in pw]
    assert abs(sum(w) - 1.0) < 1e-9
    for (ta, wa) in zip(sizes, w):
        for (tb, wb) in zip(sizes, w):
            if ta > tb:
                assert wa >= wb - 1e-12


@given(sz=st.integers(1, 10**6), t=st.floats(0.01, 1.0, allow_nan=False))
@settings(max_examples=300, deadline=None)
def test_prefix_length_arithmetic(sz, t):
    """The losslessness precondition of prefix filtering: a set whose
    intersection avoids its prefix has at most ceil(t*sz) - 1 shared
    elements — strictly below the t*sz a true pair needs.  Also the
    prefix is never empty and never exceeds the set."""
    p = sz - math.ceil(t * sz) + 1
    assert 1 <= p <= sz
    max_escaped_intersection = sz - p  # = ceil(t*sz) - 1
    assert max_escaped_intersection < t * sz or math.ceil(t * sz) == t * sz and max_escaped_intersection == t * sz - 1
