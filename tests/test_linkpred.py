"""Link prediction: python-reference equivalence, hub cap, edge
exclusion, determinism."""

from __future__ import annotations

import itertools
import math
import random

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.linkpred import link_prediction


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "a long, b long"
    )


def _py_linkpred(pairs, k, max_degree=None):
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {n: len(s) for n, s in adj.items()}
    out = []
    for u, v in itertools.combinations(sorted(adj), 2):
        if (u, v) in edges:
            continue
        zs = adj[u] & adj[v]
        if max_degree is not None:
            zs = {z for z in zs if deg[z] <= max_degree}
        if not zs:
            continue
        cn = len(zs)
        aa = round(sum(1.0 / math.log(deg[z]) for z in zs), 6)
        jac = round(cn / (deg[u] + deg[v] - cn), 6)
        out.append((u, v, cn, jac, aa))
    out.sort(key=lambda r: (-r[4], -r[2], r[0], r[1]))
    return out[:k]


def test_triangle_with_tail(spark):
    # path u-z-v: predict (u, v); z has degree 2 -> aa = 1/ln 2
    got = link_prediction(_edges(spark, [(1, 2), (2, 3)]), k=10).collect()
    assert [(r["u"], r["v"], r["cn"]) for r in got] == [(1, 3, 1)]
    assert got[0]["aa"] == round(1.0 / math.log(2), 6)
    assert got[0]["jaccard"] == 1.0  # N(1)={2}, N(3)={2}


def test_matches_python_reference_on_random_graphs(spark):
    rng = random.Random(23)
    for trial in range(3):
        pairs = {
            tuple(sorted(rng.sample(range(16), 2))) for _ in range(40 + trial * 10)
        }
        got = [
            (r["u"], r["v"], r["cn"], r["jaccard"], r["aa"])
            for r in link_prediction(_edges(spark, pairs), k=15).collect()
        ]
        assert got == _py_linkpred(pairs, 15)


def test_existing_edges_never_predicted(spark):
    pairs = list(itertools.combinations(range(6), 2))  # complete graph
    assert link_prediction(_edges(spark, pairs), k=50).count() == 0


def test_max_degree_cap_and_reversed_input(spark):
    # star center 0 (degree 5) + one path 1-6-2; capping at 4 removes
    # every wedge THROUGH the hub (pairs of leaves stop being
    # predicted), but pairs sharing low-degree neighbors remain
    star = [(0, i) for i in range(1, 6)]
    path = [(6, 1), (2, 6)]  # reversed orientations on purpose
    got = [
        (r["u"], r["v"], r["cn"], r["jaccard"], r["aa"])
        for r in link_prediction(
            _edges(spark, star + path), k=50, max_degree=4
        ).collect()
    ]
    assert got == _py_linkpred(star + path, 50, max_degree=4)
    # no leaf-leaf pair (through the degree-5 hub) survives the cap
    assert all(not (u in (3, 4, 5) or v in (3, 4, 5)) for u, v, *_ in got)
    # and the full (uncapped) run matches the reference
    full = [
        (r["u"], r["v"], r["cn"], r["jaccard"], r["aa"])
        for r in link_prediction(_edges(spark, star + path), k=50).collect()
    ]
    assert full == _py_linkpred(star + path, 50)


def test_k_validation(spark):
    with pytest.raises(ValueError):
        link_prediction(_edges(spark, [(1, 2)]), k=0)
    with pytest.raises(ValueError):
        link_prediction(_edges(spark, [(1, 2)]), k=5, max_degree=1)
