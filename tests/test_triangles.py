"""Triangle counting: known graphs, python-reference random graphs,
co-occurrence projection with the hot-group cap."""

from __future__ import annotations

import itertools
import random

from tube_spark.operators.triangles import cooccurrence_edges, triangle_stats


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "a long, b long"
    )


def _stats(spark, pairs):
    return triangle_stats(_edges(spark, pairs)).collect()[0]


def _py_triangles(pairs):
    es = {(min(a, b), max(a, b)) for a, b in pairs}
    nodes = sorted({x for e in es for x in e})
    return sum(
        1
        for u, v, w in itertools.combinations(nodes, 3)
        if (u, v) in es and (v, w) in es and (u, w) in es
    )


def test_known_graphs(spark):
    k3 = _stats(spark, [(1, 2), (2, 3), (1, 3)])
    assert (k3["n_nodes"], k3["n_edges"], k3["n_triangles"]) == (3, 3, 1)
    assert k3["global_clustering"] == 1.0

    k4 = _stats(spark, list(itertools.combinations(range(4), 2)))
    assert k4["n_triangles"] == 4 and k4["global_clustering"] == 1.0

    path = _stats(spark, [(1, 2), (2, 3), (3, 4)])
    assert path["n_triangles"] == 0 and path["n_wedges"] == 2

    # star: the skew case — hub degree n-1, but orientation points every
    # edge INTO the hub, so the wedge join sees ZERO fan-out at the hub
    star = _stats(spark, [(0, i) for i in range(1, 8)])
    assert star["n_triangles"] == 0 and star["n_wedges"] == 21
    assert star["global_clustering"] == 0.0


def test_random_graph_matches_reference(spark):
    rng = random.Random(7)
    pairs = {
        (a, b)
        for a, b in (
            sorted(rng.sample(range(25), 2)) for _ in range(120)
        )
    }
    got = _stats(spark, pairs)
    assert got["n_triangles"] == _py_triangles(pairs)
    assert got["n_edges"] == len(pairs)


def test_cooccurrence_projection_and_cap(spark):
    rows = [
        # group 1: {1,2,3} -> triangle
        (1, 1), (1, 2), (1, 3),
        # group 2: {3,4} -> one edge
        (2, 3), (2, 4),
        # group 9: a hot group of 5 nodes -> dropped by max_group=4
        *[(9, n) for n in range(10, 15)],
    ]
    df = spark.createDataFrame(rows, "g long, n long")
    capped = cooccurrence_edges(df, "g", "n", max_group=4)
    got = {(r["a"], r["b"]) for r in capped.collect()}
    assert got == {(1, 2), (1, 3), (2, 3), (3, 4)}
    full = cooccurrence_edges(df, "g", "n")
    assert full.count() == 4 + 10  # hot group contributes C(5,2)
    st = triangle_stats(capped).collect()[0]
    assert st["n_triangles"] == 1


def test_doulion_sampled_estimate(spark):
    from tube_spark.operators.triangles import triangle_stats_sampled

    rng = random.Random(11)
    pairs = {
        tuple(sorted(rng.sample(range(40), 2))) for _ in range(400)
    }
    exact = _py_triangles(pairs)
    # p=1 degenerates to the exact count
    full = triangle_stats_sampled(_edges(spark, pairs), p=1.0).collect()[0]
    assert full["n_triangles_sampled"] == exact
    assert full["n_triangles_est"] == float(exact)
    # p=0.7: unbiased estimator lands near the truth on a graph this
    # dense (fixed hash seed -> deterministic, so the bound is stable)
    est = triangle_stats_sampled(_edges(spark, pairs), p=0.7).collect()[0]
    assert est["n_edges_sampled"] < len(pairs)
    assert abs(est["n_triangles_est"] - exact) / exact < 0.5
    import pytest as _pytest

    with _pytest.raises(ValueError, match="p must be"):
        triangle_stats_sampled(_edges(spark, pairs), p=0.0)
