"""Random walks: python-reference trajectory equality, multi-walk
divergence, dead ends, determinism across layouts."""

from __future__ import annotations

import hashlib
import random
from collections import defaultdict

from tube_spark.operators.walks import random_walks


def _edges(spark, pairs):
    return spark.createDataFrame(
        sorted({(min(a, b), max(a, b)) for a, b in pairs}), "a long, b long"
    )


def _py_walks(pairs, walk_len, wpn, seed="walk"):
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    out = {}
    for n in sorted(adj):
        for j in range(wpn):
            wid = n * wpn + j
            cur = n
            out[(wid, 0)] = (n, n)
            for i in range(1, walk_len + 1):
                def key(v):
                    h = hashlib.md5(f"{seed}|{wid}|{i}|{v}".encode()).hexdigest()
                    return (int(h[:15], 16), -v)

                cur = max(adj[cur], key=key)
                out[(wid, i)] = (n, cur)
    return out


def _run(spark, pairs, walk_len, wpn):
    return {
        (r["walk_id"], r["step"]): (r["start"], r["node"])
        for r in random_walks(
            _edges(spark, pairs), walk_len=walk_len, walks_per_node=wpn
        ).collect()
    }


def test_matches_python_reference(spark):
    rng = random.Random(7)
    pairs = {tuple(sorted(rng.sample(range(15), 2))) for _ in range(40)}
    for walk_len, wpn in ((0, 1), (3, 1), (2, 3)):
        assert _run(spark, pairs, walk_len, wpn) == _py_walks(
            pairs, walk_len, wpn
        )


def test_walks_from_same_start_diverge(spark):
    # a dense-enough graph: different walk ids salt the hash
    # differently, so sibling walks are independent samples
    import itertools

    pairs = list(itertools.combinations(range(8), 2))
    got = _run(spark, pairs, walk_len=4, wpn=4)
    paths = defaultdict(list)
    for (wid, step), (start, node) in sorted(got.items()):
        if start == 0:
            paths[wid].append(node)
    assert len({tuple(p) for p in paths.values()}) > 1


def test_dead_end_stops_walk(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    rows = random_walks(df, walk_len=3, undirected=False).collect()
    by_walk = defaultdict(dict)
    for r in rows:
        by_walk[r["walk_id"]][r["step"]] = r["node"]
    # only node 1 starts (node 2 has no out-edge so it is not a src);
    # its walk reaches 2 at step 1 and then stops (2 is a dead end)
    assert list(by_walk) == [1]
    assert by_walk[1] == {0: 1, 1: 2}


def test_deterministic_across_layouts(spark):
    rng = random.Random(9)
    pairs = {tuple(sorted(rng.sample(range(20), 2))) for _ in range(60)}
    a = _run(spark, pairs, 3, 2)
    b = {
        (r["walk_id"], r["step"]): (r["start"], r["node"])
        for r in random_walks(
            _edges(spark, pairs).repartition(11), walk_len=3, walks_per_node=2
        ).collect()
    }
    assert a == b


def test_weighted_walks_bias_and_reference(spark):
    """A hub with one heavy and many light edges: the heavy neighbor
    is chosen far more often across walks; exact python-reference
    equality pins the E-S key math."""
    import math

    # star: 0 -- {1..20}; edge (0, 1) has weight 50, the rest 1
    rows = [(0, v, 50.0 if v == 1 else 1.0) for v in range(1, 21)]
    df = spark.createDataFrame(rows, "a long, b long, w double")
    got = {
        (r["walk_id"], r["step"]): r["node"]
        for r in random_walks(
            df, walk_len=1, walks_per_node=40, weight_col="w"
        ).collect()
    }

    def choice(wid, i, cands, weights):
        def key(v):
            h = hashlib.md5(f"walk|{wid}|{i}|{v}".encode()).hexdigest()
            u = (int(h[:15], 16) + 1.0) / float(1 << 60)
            return (math.log(u) / weights[v], -v)

        return max(cands, key=key)

    weights = {v: (50.0 if v == 1 else 1.0) for v in range(1, 21)}
    # walks starting at the hub (node 0): walk_ids 0..39
    picks = []
    for wid in range(40):
        want = choice(wid, 1, list(range(1, 21)), weights)
        assert got[(wid, 1)] == want
        picks.append(want)
    # weight 50 of total 69 -> expect node 1 the large majority
    assert picks.count(1) >= 20


def test_zero_weight_edges_never_taken(spark):
    df = spark.createDataFrame(
        [(0, 1, 0.0), (0, 2, 1.0)], "a long, b long, w double"
    )
    rows = random_walks(df, walk_len=2, weight_col="w").collect()
    assert all(r["node"] != 1 or r["step"] == 0 for r in rows if r["start"] == 0)
