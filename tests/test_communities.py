"""Label propagation: known two-community graph, python-reference
trajectory equality on random graphs, zero-iteration identity."""

from __future__ import annotations

import itertools
import random
from collections import Counter, defaultdict

from tube_spark.operators.communities import label_propagation


def _edges(spark, pairs):
    return spark.createDataFrame(
        sorted({(min(a, b), max(a, b)) for a, b in pairs}), "a long, b long"
    )


def _py_lpa(pairs, iters):
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    labels = {v: v for v in adj}
    for _ in range(iters):
        new = {}
        for v in adj:
            cnt = Counter(labels[u] for u in adj[v])
            new[v] = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        labels = new
    return labels


def _run(spark, pairs, iters):
    return {
        r["n"]: r["community"]
        for r in label_propagation(_edges(spark, pairs), iters=iters).collect()
    }


def test_two_cliques_with_bridge(spark):
    c1 = list(itertools.combinations([1, 2, 3, 4], 2))
    c2 = list(itertools.combinations([10, 11, 12, 13], 2))
    pairs = c1 + c2 + [(4, 10)]  # one bridge edge
    got = _run(spark, pairs, iters=3)
    # each clique converges to its smallest member's label
    assert {got[1], got[2], got[3]} == {1}
    assert {got[11], got[12], got[13]} == {10}
    assert got == _py_lpa(pairs, 3)


def test_random_trajectory_matches_reference(spark):
    rng = random.Random(13)
    pairs = {tuple(sorted(rng.sample(range(20), 2))) for _ in range(45)}
    for iters in (1, 2, 4):
        assert _run(spark, pairs, iters) == _py_lpa(pairs, iters)


def test_zero_iterations_identity(spark):
    pairs = [(1, 2), (2, 3)]
    assert _run(spark, pairs, 0) == {1: 1, 2: 2, 3: 3}
