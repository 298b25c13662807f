"""PageRank: python reference equality, dangling mass, invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.pagerank import pagerank


def _py_pagerank(edges, iters, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out: dict = {}
    for u, v in set(edges):
        out.setdefault(u, set()).add(v)
    rank = {x: 1.0 / n for x in nodes}
    for _ in range(iters):
        dm = sum(rank[x] for x in nodes if x not in out)
        new = {}
        for x in nodes:
            inflow = sum(
                rank[u] / len(out[u]) for u in nodes if u in out and x in out[u]
            )
            new[x] = (1 - d) / n + d * (inflow + dm / n)
        rank = new
    return rank


EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 4), (5, 1),
    (6, 5),  # 6 has no in-links
    (3, 7),  # 7 is dangling (no out-edges)
]


def test_matches_python_reference(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=6).collect()}
    want = _py_pagerank(EDGES, 6)
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-7)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_hub_ranks_higher(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=10).collect()}
    # node 3 receives the most links; node 6 receives none
    assert got[3] == max(got.values())
    assert got[6] == min(got.values())


def test_early_stop_converges(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    fixed = {r["node"]: r["rank"] for r in pagerank(df, iterations=60).collect()}
    tol = {
        r["node"]: r["rank"]
        for r in pagerank(df, iterations=60, tol=1e-9).collect()
    }
    for k in fixed:
        assert tol[k] == pytest.approx(fixed[k], abs=1e-6)


def test_validation_and_empty(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError, match="iterations"):
        pagerank(df, iterations=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.5)
    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty, iterations=2).count() == 0


def _py_ppr(edges, sources, iters, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges} | set(sources))
    out: dict = {}
    for u, v in set(edges):
        out.setdefault(u, set()).add(v)
    p = {x: (1.0 / len(sources) if x in sources else 0.0) for x in nodes}
    rank = dict(p)
    for _ in range(iters):
        dm = sum(rank[x] for x in nodes if x not in out)
        new = {}
        for x in nodes:
            inflow = sum(
                rank[u] / len(out[u]) for u in nodes if u in out and x in out[u]
            )
            new[x] = (1 - d) * p[x] + d * (inflow + dm * p[x])
        rank = new
    return rank


def test_personalized_matches_python_reference(spark):
    from tube_spark.operators.pagerank import personalized_pagerank

    e = spark.createDataFrame(EDGES, "src long, dst long")
    for sources in ([1], [2, 5]):
        s = spark.createDataFrame([(x,) for x in sources], "node long")
        got = {
            r["node"]: r["rank"]
            for r in personalized_pagerank(e, s, iterations=4).collect()
        }
        want = _py_ppr(EDGES, sources, 4)
        assert set(got) == set(want)
        for n in want:
            assert abs(got[n] - want[n]) < 1e-8


def test_personalized_mass_and_locality(spark):
    from tube_spark.operators.pagerank import personalized_pagerank

    # two disconnected triangles; restart on a node of the first:
    # ALL mass stays in the first component
    tri1 = [(1, 2), (2, 3), (3, 1)]
    tri2 = [(10, 11), (11, 12), (12, 10)]
    e = spark.createDataFrame(tri1 + tri2, "src long, dst long")
    s = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(e, s, iterations=8).collect()
    }
    assert abs(sum(got.values()) - 1.0) < 1e-6
    assert all(got[n] == 0.0 for n in (10, 11, 12))
    assert got[1] > got[2] > 0 and got[3] > 0


def test_personalized_validation(spark):
    from tube_spark.operators.pagerank import personalized_pagerank

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    empty = spark.createDataFrame([], "node long")
    with pytest.raises(ValueError):
        personalized_pagerank(e, empty)


def test_personalized_edge_isolated_seed_redistributes_dangling_mass(spark):
    # a seed with NO edges at all keeps its restart mass and redistributes
    # it onto the personalization vector each round (dm > 0 path) — the
    # dangling membership is precomputed once, not re-derived per round
    from tube_spark.operators.pagerank import personalized_pagerank

    e = spark.createDataFrame(EDGES, "src long, dst long")
    sources = [1, 99]  # 99 appears in no edge row
    s = spark.createDataFrame([(x,) for x in sources], "node long")
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(e, s, iterations=4).collect()
    }
    want = _py_ppr(EDGES, sources, 4)
    assert set(got) == set(want) and 99 in got
    for n in want:
        assert abs(got[n] - want[n]) < 1e-8
    # the isolated seed's rank stays strictly positive (restart + its own
    # dangling share) and total mass is conserved
    assert got[99] > 0
    assert abs(sum(got.values()) - 1.0) < 1e-6
