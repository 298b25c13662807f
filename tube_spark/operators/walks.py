"""Random-walk corpus generation (DeepWalk, Perozzi et al. KDD 2014 /
node2vec with p=q=1): the data-prep step for graph embeddings — walks
become "sentences" a skip-gram model trains on.

Determinism: the "random" neighbor choice at step i of walk w is the
argmax of a salted portable hash over the current node's neighbors —
``h = md5(seed|w|i|neighbor)`` — so walks are a pure function of
(graph, walk_len, walks_per_node, seed): rerun-stable, layout-stable,
and replayable step-for-step by an SQL oracle (the unrolled-trajectory
pattern: kcore/ktruss/LPA/pagerank).  Distinct walk ids salt the hash
differently, so the ``walks_per_node`` walks from one start node
diverge exactly like independent samples.

Scale shape per step: ONE equi-join of the (walk_id, cur) frontier —
2-column rows — onto the directed adjacency, one ``max_by`` keyed
argmax (constant state per walk).  Walk state never carries history;
emitted (walk_id, step, node) rows accumulate by union.  Dead-end
nodes (possible in directed input) simply end their walks early.
Rounds localCheckpoint to keep lineage one step deep, but deliberately
WITHOUT the CheckpointRotor: unlike kcore/LPA (where only the final
round survives), EVERY round's frame feeds the output union, so its
blocks must stay live until the result is consumed — an early release
throws checkpoint-block-not-found at collect (hit in testing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tube_spark.functions.text import portable_hash60


def random_walks(
    edges: DataFrame,
    walk_len: int = 3,
    walks_per_node: int = 1,
    seed: str = "walk",
    undirected: bool = True,
    weight_col: str | None = None,
) -> DataFrame:
    """``(walk_id, start, step, node)`` for every walk of ``walk_len``
    steps (``step`` 0 = the start node; ``walk_id`` =
    ``start * walks_per_node + j``).  ``edges`` is ``(a, b)``;
    ``undirected=True`` walks both directions.

    ``weight_col`` makes the choice WEIGHTED (weighted node2vec):
    each candidate's key becomes ``ln(u) / w`` with ``u`` the salted
    uniform from the hash — the Efraimidis-Spirakis exponential race,
    the same formula as ``sampling.weighted_sample_k`` — so edge e is
    chosen with probability proportional to its weight, while the
    trajectory stays a deterministic pure function of the inputs.
    Edges with weight <= 0 are never taken."""
    if walk_len < 0:
        raise ValueError(f"walk_len must be >= 0, got {walk_len}")
    if walks_per_node < 1:
        raise ValueError(f"walks_per_node must be >= 1, got {walks_per_node}")
    spark = edges.sparkSession
    cols = ["a", "b"] + ([weight_col] if weight_col else [])
    e = edges.select(*cols).distinct()
    wsel = (
        [F.col(weight_col).cast("double").alias("w")] if weight_col else []
    )
    adj = e.select(F.col("a").alias("src"), F.col("b").alias("dst"), *wsel)
    if undirected:
        adj = adj.unionAll(
            e.select(F.col("b").alias("src"), F.col("a").alias("dst"), *wsel)
        )
    if weight_col:
        adj = adj.filter(F.col("w") > 0)
    adj = adj.localCheckpoint(eager=False)  # reused every step
    nodes = adj.select(F.col("src").alias("start")).distinct()
    js = spark.range(walks_per_node).select(F.col("id").alias("j"))
    cur = (
        nodes.crossJoin(F.broadcast(js))
        .select(
            (F.col("start") * walks_per_node + F.col("j")).alias("walk_id"),
            "start",
            F.col("start").alias("node"),
        )
        .localCheckpoint(eager=False)
    )
    out = cur.select("walk_id", "start", F.lit(0).alias("step"), "node")
    for i in range(1, walk_len + 1):
        h = portable_hash60(
            F.concat_ws(
                "|",
                F.lit(seed),
                F.col("walk_id").cast("string"),
                F.lit(str(i)),
                F.col("dst").cast("string"),
            )
        )
        if weight_col:
            # E-S exponential race: u in (0,1] from the hash, key =
            # ln(u)/w — max key wins with p proportional to weight
            u = (h.cast("double") + F.lit(1.0)) / F.lit(float(1 << 60))
            key = F.log(u) / F.col("w")
        else:
            # keep the raw 60-bit long: a double cast loses bits past
            # 2^53 and could merge distinct hashes, diverging from the
            # oracle's BIGINT ordering
            key = h
        cur = (
            cur.join(adj, cur["node"] == adj["src"])
            .select("walk_id", "start", F.col("dst"), key.alias("h"))
            .groupBy("walk_id")
            .agg(
                F.first("start").alias("start"),
                F.expr("max_by(dst, struct(h, -dst))").alias("node"),
            )
            .localCheckpoint(eager=False)
        )
        out = out.unionByName(
            cur.select("walk_id", "start", F.lit(i).alias("step"), "node")
        )
    return out
