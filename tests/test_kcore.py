"""k-core peeling: known-graph cores, python-reference equality on
random graphs, fixed-round trajectory prefix, coreness ladder."""

from __future__ import annotations

import itertools
import random
from collections import defaultdict

from tube_spark.operators.kcore import coreness, k_core


def _edges(spark, pairs):
    return spark.createDataFrame(
        sorted({(min(a, b), max(a, b)) for a, b in pairs}), "a long, b long"
    )


def _py_peel(pairs, k, rounds=None):
    """Reference peeling; returns {node: residual_degree}."""
    edges = {tuple(sorted(p)) for p in pairs}
    i = 0
    while edges and (rounds is None or i < rounds):
        deg = defaultdict(int)
        for a, b in edges:
            deg[a] += 1
            deg[b] += 1
        keep = {n for n, d in deg.items() if d >= k}
        nxt = {(a, b) for a, b in edges if a in keep and b in keep}
        i += 1
        if rounds is None and nxt == edges:
            edges = nxt
            break
        edges = nxt
    deg = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    return dict(deg)


def _run(spark, pairs, k, rounds=None):
    return {
        r["n"]: r["core_deg"]
        for r in k_core(_edges(spark, pairs), k, rounds=rounds).collect()
    }


def test_clique_plus_tail(spark):
    # 5-clique (every degree 4) with a pendant chain hanging off it
    clique = list(itertools.combinations([1, 2, 3, 4, 5], 2))
    tail = [(5, 6), (6, 7), (7, 8)]
    pairs = clique + tail
    # 3-core = the clique alone; the chain peels away over cascading
    # rounds (8 first, then 7, then 6)
    got = _run(spark, pairs, k=3)
    assert got == {n: 4 for n in (1, 2, 3, 4, 5)}
    # 2-core also drops the chain (pendant degree 1 cascades)
    assert set(_run(spark, pairs, k=2)) == {1, 2, 3, 4, 5}
    # 5-core is empty (max degree in the 4-regular clique is 4)
    assert _run(spark, pairs, k=5) == {}


def test_cascade_needs_multiple_rounds(spark):
    # path graph: each k=2 peel round only removes the current
    # endpoints, so the trajectory prefix is visibly round-dependent
    pairs = [(i, i + 1) for i in range(6)]
    assert _run(spark, pairs, k=2, rounds=0) == _py_peel(pairs, 2, 0)
    r1 = _run(spark, pairs, k=2, rounds=1)
    assert r1 == _py_peel(pairs, 2, 1)
    assert 0 not in r1 and 6 not in r1 and 1 in r1  # endpoints peeled
    # fixpoint: a path has no 2-core
    assert _run(spark, pairs, k=2) == {}


def test_random_graphs_match_reference(spark):
    rng = random.Random(29)
    pairs = {tuple(sorted(rng.sample(range(24), 2))) for _ in range(70)}
    for k in (2, 3, 4, 5):
        assert _run(spark, pairs, k) == _py_peel(pairs, k)
    for rounds in (1, 2, 3):
        assert _run(spark, pairs, 4, rounds) == _py_peel(pairs, 4, rounds)


def test_fixed_rounds_noop_past_fixpoint(spark):
    # once converged, extra unrolled rounds change nothing — the
    # property that lets a fixed-round SQL oracle equal the fixpoint
    clique = list(itertools.combinations(range(6), 2))
    assert _run(spark, clique, k=3, rounds=7) == _run(spark, clique, k=3)


def test_coreness_ladder(spark):
    clique = list(itertools.combinations([1, 2, 3, 4, 5], 2))
    pairs = clique + [(5, 6), (6, 7)]
    got = {
        r["n"]: r["coreness"]
        for r in coreness(_edges(spark, pairs), k_max=6).collect()
    }
    assert got == {1: 4, 2: 4, 3: 4, 4: 4, 5: 4, 6: 1, 7: 1}


def _py_truss(pairs, k, rounds):
    edges = {tuple(sorted(p)) for p in pairs}

    def support(es):
        sup = {e: 0 for e in es}
        nodes = sorted({n for e in es for n in e})
        adj = {n: set() for n in nodes}
        for a, b in es:
            adj[a].add(b)
            adj[b].add(a)
        for a, b in es:
            for c in adj[a] & adj[b]:
                sup[(a, b)] += 1
        return sup

    for _ in range(rounds):
        sup = support(edges)
        edges = {e for e in edges if sup[e] >= k - 2}
    return support(edges)


def test_k_truss_clique_and_chain(spark):
    from tube_spark.operators.kcore import k_truss

    clique = list(itertools.combinations([1, 2, 3, 4, 5], 2))
    chain = [(5, 6), (6, 7)]
    got = {
        (r["a"], r["b"]): r["support"]
        for r in k_truss(_edges(spark, clique + chain), k=5, rounds=1).collect()
    }
    # 5-truss: every clique edge sits in 3 triangles; chain edges in 0
    assert got == {e: 3 for e in clique}
    # k=6 demands support >= 4: nothing survives
    assert (
        k_truss(_edges(spark, clique + chain), k=6, rounds=1).count() == 0
    )


def test_k_truss_matches_reference_on_random(spark):
    from tube_spark.operators.kcore import k_truss

    rng = random.Random(41)
    pairs = {tuple(sorted(rng.sample(range(18), 2))) for _ in range(80)}
    for k, rounds in ((3, 1), (4, 2), (5, 2)):
        got = {
            (r["a"], r["b"]): r["support"]
            for r in k_truss(_edges(spark, pairs), k=k, rounds=rounds).collect()
        }
        assert got == _py_truss(pairs, k, rounds)


def test_k_truss_accepts_reversed_edges(spark):
    """Edges arriving in b>a order (or mixed orientations of the same
    undirected edge) must behave exactly like canonical a<b input —
    the regression was a triangle stored as (1,2),(2,3),(3,1) being
    emptied at k=3 because (3,1) never matched its (1,3) support row."""
    from tube_spark.operators.kcore import k_truss

    got = {
        (r["a"], r["b"]): r["support"]
        for r in k_truss(
            _edges(spark, [(1, 2), (2, 3), (3, 1)]), k=3, rounds=1
        ).collect()
    }
    assert got == {(1, 2): 1, (1, 3): 1, (2, 3): 1}
    # mixed orientations + a duplicate of the same undirected edge
    # collapse to one canonical edge each; self-loops are dropped
    rng = random.Random(7)
    pairs = {tuple(sorted(rng.sample(range(12), 2))) for _ in range(40)}
    scrambled = [
        (b, a) if rng.random() < 0.5 else (a, b) for a, b in pairs
    ] + [(5, 5)]
    got = {
        (r["a"], r["b"]): r["support"]
        for r in k_truss(_edges(spark, scrambled), k=3, rounds=2).collect()
    }
    assert got == _py_truss(pairs, 3, 2)


def test_k_truss_cascade(spark):
    from tube_spark.operators.kcore import k_truss

    # two triangles sharing an edge: (1,2,3) and (2,3,4), plus a
    # triangle (4,5,6) hanging off — k=4 (support >= 2): only the
    # shared edge (2,3) has support 2, but its triangles' OTHER edges
    # have support 1 and die in round 1, starving (2,3) in round 2
    pairs = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5), (4, 6), (5, 6)]
    r1 = k_truss(_edges(spark, pairs), k=4, rounds=1).count()
    r2 = k_truss(_edges(spark, pairs), k=4, rounds=2).count()
    assert r1 == 1 and r2 == 0
    assert _py_truss(pairs, 4, 2) == {}
