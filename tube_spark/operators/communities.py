"""Label propagation communities (Raghavan et al. 2007, made
deterministic): synchronous LPA over an undirected edge list.

Every node starts labeled with its own id; each round, every node
adopts the most frequent label among its NEIGHBORS, ties broken by the
smallest label — the two classic nondeterminism sources (random visit
order, random tie-break) replaced by fixed synchronous rounds and an
ordered tie-break, so a fixed iteration count yields a portable
trajectory an SQL oracle can replay exactly (the pagerank /
kmeans-trajectory pattern; plain LPA's oscillation on bipartite
structures is a property of the synchronous schedule, not a defect —
the trajectory is still deterministic and that is what the oracle
pins).

Scale shape (per round): one equi-join of the current label frame onto
the directed edge list (labels are (node, label) — 2 columns), one
(node, label) count aggregation, one ``max_by`` argmax aggregation —
all map-side-combinable keyed aggs, no windows, no driver state beyond
the round counter.  Rounds end in ``localCheckpoint`` with the
``CheckpointRotor`` releasing the previous round's blocks (the CC /
pagerank storage contract).

Complements the family: components.py answers "what is CONNECTED",
triangles.py "how cohesive", this "what are the DENSE sub-blocks" —
e.g. sub-communities inside one near-dup connected component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tube_spark.plans.lifecycle import CheckpointRotor


def label_propagation(edges: DataFrame, iters: int = 3) -> DataFrame:
    """(n, community) for every node in the undirected ``(a, b)`` edge
    list after ``iters`` synchronous rounds.  Deterministic: most
    frequent neighbor label, ties to the smallest label; isolated
    nodes cannot appear in an edge list, so every node has >= 1
    neighbor."""
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    spark = edges.sparkSession
    e = edges.select("a", "b").distinct()
    # both directions once, pinned: reused every round
    directed = (
        e.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionAll(e.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .localCheckpoint(eager=False)
    )
    labels = (
        directed.select(F.col("src").alias("n"))
        .distinct()
        .withColumn("community", F.col("n"))
        .localCheckpoint(eager=False)
    )
    rotor = CheckpointRotor(spark)
    for _ in range(iters):
        rotor.begin()
        neigh = directed.join(
            labels.select(F.col("n").alias("dst"), "community"), "dst"
        )
        counts = neigh.groupBy(F.col("src").alias("n"), "community").agg(
            F.count(F.lit(1)).alias("c")
        )
        # argmax: highest count, then smallest label — one keyed agg,
        # constant state per key
        labels = (
            counts.groupBy("n")
            .agg(
                F.expr("max_by(community, struct(c, -community))").alias(
                    "community"
                )
            )
            .localCheckpoint(eager=False)
        )
        labels.count()
        rotor.commit()
    return labels
