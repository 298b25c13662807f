"""Distributed kNN-graph construction by NN-descent (Dong, Moses &
Li, WWW 2011 "Efficient k-nearest neighbor graph construction for
generic similarity measures").

cosine_topk answers "top-k for THESE queries" (broadcast queries, one
corpus stream); the kNN GRAPH wants top-k for EVERY corpus vector —
brute force is O(n²) scoring, the thing that cannot ship at 100 TB.
NN-descent converges to a near-exact graph in a few rounds on the
principle "a neighbor of a neighbor is likely a neighbor": start from
cheap locality-ish candidates, then repeatedly score each node against
its neighbors' neighbors and keep the best k.  Per-round work is
O(n * k²) candidate scores — independent of n², and every step is a
plain DataFrame op.

Determinism: init buckets come from the salted portable hash of the
id, every top-k breaks ties by neighbor id, and rounds are synchronous
— the output is a pure function of (corpus, k, iters, seed), so tests
pin exact equality across runs/partitionings and measured recall
floors against the exact graph (tests/test_knngraph.py; the
`ann_recall_report` registry row carries the floor into the
driver-visible output).

Scale shape per round: ONE self-join of the (src, dst) neighbor list
(2-column rows — vectors are NOT carried through the expansion), a
distinct over bounded candidates (≤ 4k² per node), two id→vector
equi-joins to attach embeddings, one Arrow dot-product kernel over
pre-normalized vectors (the bulk-scoring path every ANN operator here
uses), and one funnel-free grouped top-k.  Rounds end in
``localCheckpoint`` under the CheckpointRotor (the CC / pagerank / LPA
storage contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tube_spark.functions.text import portable_hash60
from tube_spark.operators.ranking import grouped_topk
from tube_spark.operators.similarity import dot_arrow, normalized
from tube_spark.plans.lifecycle import CheckpointRotor


def _score(cand: DataFrame, vecs: DataFrame) -> DataFrame:
    """(src, dst) candidates -> (src, dst, cosine) via two id->vector
    joins + the Arrow dot kernel (vectors pre-normalized, so dot IS
    cosine)."""
    d = dot_arrow()
    return (
        cand.join(
            vecs.select(F.col("id").alias("src"), F.col("v").alias("sv")), "src"
        )
        .join(
            vecs.select(F.col("id").alias("dst"), F.col("v").alias("dv")), "dst"
        )
        .select("src", "dst", d(F.col("sv"), F.col("dv")).alias("cosine"))
    )


def nn_descent(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    iters: int = 2,
    init_bucket: int | None = None,
    seed: str = "nnd",
) -> DataFrame:
    """The approximate kNN graph: ``(query_id, neighbor_id, rank,
    cosine)`` with exactly ``min(k, n-1)`` neighbors per vector,
    ``rank`` 1..k by descending cosine (ties by neighbor id) — the
    same shape as ``cosine_topk`` so ``topk_recall`` compares them
    directly.

    ``init_bucket`` (default ``2*(k+1)``) sizes the hash-random seed
    groups.  Round 0 scores all pairs inside each bucket of THREE
    independent bucketings (different salts) — one bucketing alone
    partitions the graph into disjoint cliques that
    neighbors-of-neighbors can never leave (measured: recall frozen at
    the init value); overlapping bucketings make the seed graph
    connected, which is what lets each NN-descent round's expansion
    over the UNDIRECTED current graph actually traverse the space.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    spark = emb.sparkSession
    vecs = normalized(emb, id_col, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    n = vecs.count()
    bucket = init_bucket or 2 * (k + 1)
    n_buckets = max(1, -(-n // bucket))

    def bucketing(j: int) -> DataFrame:
        ids = vecs.select(
            "id",
            (
                portable_hash60(
                    F.concat(
                        F.lit(f"{seed}{j}"), F.col("id").cast("string")
                    )
                )
                % F.lit(n_buckets)
            ).alias("b"),
        )
        return (
            ids.join(
                ids.select(F.col("id").alias("dst"), F.col("b").alias("b2")),
                F.col("b") == F.col("b2"),
            )
            .filter(F.col("id") != F.col("dst"))
            .select(F.col("id").alias("src"), "dst")
        )

    cand0 = (
        bucketing(0).unionAll(bucketing(1)).unionAll(bucketing(2)).distinct()
    )
    rotor = CheckpointRotor(spark)
    rotor.begin()
    g = grouped_topk(
        _score(cand0, vecs), ["src"], "cosine", k, tiebreak_col="dst"
    ).localCheckpoint(eager=False)
    g.count()
    rotor.commit()
    for _ in range(iters):
        und = g.select("src", "dst").unionAll(
            g.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        nn = (
            und.join(
                und.select(F.col("src").alias("dst"), F.col("dst").alias("dst2")),
                "dst",
            )
            .select("src", F.col("dst2").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        cand = nn.unionAll(g.select("src", "dst")).distinct()
        rotor.begin()
        g = grouped_topk(
            _score(cand, vecs), ["src"], "cosine", k, tiebreak_col="dst"
        ).localCheckpoint(eager=False)
        g.count()
        rotor.commit()
    return g.select(
        F.col("src").alias("query_id"),
        F.col("dst").alias("neighbor_id"),
        F.col("rank"),
        F.round("cosine", 6).alias("cosine"),
    )
