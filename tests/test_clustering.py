"""Distributed Lloyd k-means vs a numpy reference on the same init."""

from __future__ import annotations

import numpy as np
import pytest


def _ref_lloyd(X, centers, iters):
    cent = np.array(centers, dtype=np.float64)
    for _ in range(iters):
        d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            m = X[assign == c]
            if len(m):
                cent[c] = m.mean(axis=0)
    d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    return cent, d.argmin(axis=1)


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.RandomState(7)
    # three well-separated blobs in 8 dims
    X = np.concatenate(
        [rng.randn(40, 8) * 0.1 + mu for mu in (0.0, 3.0, -3.0)]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        schema="vec_id long, embedding array<float>",
    )
    # the reference must see the float-truncated values Spark stores
    return df, np.asarray(X, dtype=np.float32).astype(np.float64)


def test_matches_numpy_reference(spark, data):
    from tube_spark.operators.clustering import kmeans, kmeans_init_ids

    df, X = data
    init = kmeans_init_ids(df, "vec_id", "embedding", 3)
    _, ref_assign = _ref_lloyd(X, init, iters=4)
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans(df, "vec_id", k=3, iters=4).collect()
    }
    assert [got[i] for i in range(len(X))] == list(ref_assign)


def test_blobs_recovered(spark, data):
    from tube_spark.operators.clustering import kmeans

    df, X = data
    out = kmeans(df, "vec_id", k=3, iters=5)
    rows = out.collect()
    # every blob of 40 consecutive ids must land in one cluster
    by_blob = {}
    for r in rows:
        by_blob.setdefault(r["vec_id"] // 40, set()).add(r["cluster"])
    assert all(len(s) == 1 for s in by_blob.values())
    assert len({next(iter(s)) for s in by_blob.values()}) == 3


def test_empty_cluster_keeps_center(spark):
    from tube_spark.operators.clustering import kmeans_fit

    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(4)],
        schema="vec_id long, embedding array<float>",
    )
    # a center far away never wins any point and must survive unchanged
    far = [1e6, 1e6]
    out = kmeans_fit(df, [[0.0, 0.0], far], iters=2)
    assert out[1] == far


def test_round_to_is_deterministic(spark, data):
    from tube_spark.operators.clustering import kmeans_fit, kmeans_init_ids

    df, _ = data
    init = kmeans_init_ids(df, "vec_id", "embedding", 3)
    a = kmeans_fit(df, init, iters=3, round_to=6)
    b = kmeans_fit(df, init, iters=3, round_to=6)
    assert a == b
    assert all(x == round(x, 6) for c in a for x in c)


def test_broadcast_assignment_equals_literal_form(spark):
    """The codegen-cache fix (r6) claims float-identity between the
    literal-embedded argmin and the broadcast-data form — pin it, since
    the DuckDB oracle contract depends on it."""
    from pyspark.sql import functions as F

    from tube_spark.operators.clustering import (
        _argmin_cluster,
        _assign_via_broadcast,
        kmeans_init_ids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    centers = kmeans_init_ids(emb, "vec_id", "embedding", 4)
    lit = {
        r["vec_id"]: r["c"]
        for r in emb.select(
            "vec_id", _argmin_cluster(F.col("embedding"), centers).alias("c")
        ).collect()
    }
    bc = {
        r["vec_id"]: r["cluster"]
        for r in _assign_via_broadcast(emb, centers, "embedding").collect()
    }
    assert lit == bc
