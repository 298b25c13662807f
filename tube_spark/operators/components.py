"""Connected components: near-dup pairs → dedup groups, at scale.

LSH/Jaccard dedup emits PAIRS; a curation pipeline needs GROUPS — every
document labeled with its duplicate-cluster id, so one representative
per cluster survives.  Pairs→groups is connected components, an
iterative algorithm Spark has no built-in for.

The implementation is alternating **large-star / small-star** (Kiveris
et al., "Connected Components in MapReduce and Beyond", SoCC'14) — the
shape designed for exactly this setting:

* converges in O(log² n) rounds w.h.p. (vs. O(diameter) for naive
  min-label propagation — near-dup graphs DO form long chains of
  pairwise-similar documents);
* each round is two shuffles keyed by node id (a groupBy-min and a
  join), no driver-side graph, no vertex set materialized in memory;
* per-round ``localCheckpoint`` truncates the lineage so 20 rounds
  don't build a 40-stage recursive plan (the classic iterative-Spark
  failure mode);
* convergence detected by an order-insensitive edge-set fingerprint
  (count + xor of pair hashes) — one tiny aggregate per round, no
  set-difference join.

Output: ``(node, component)`` with component = MIN node id in the
component — the natural stable group id and representative choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tube_spark.plans.lifecycle import CheckpointRotor


def _fingerprint(e: DataFrame) -> tuple[int, int]:
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        # xor-fold of per-edge hashes: order/partition insensitive AND
        # distributive — bit_xor combines map-side, so the fingerprint
        # never materializes the edge set anywhere (a collect_list fold
        # here would funnel every edge hash through one reducer)
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).first()
    return row["n"], row["h"]


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """``(node, component)`` for every node appearing in ``pairs``;
    component = min node id reachable.  Nodes without any pair are not
    emitted (union them back as singletons — see ``dedup_groups``)."""
    # lazy checkpoint + fingerprint: the fingerprint aggregate is the
    # action that materializes the checkpoint — ONE job per round, and
    # every later round reads the checkpointed blocks, not the lineage.
    # The rotor releases round r-1's blocks once round r materializes
    # (r consumed them; without this, N rounds hold N rounds of storage
    # until the driver JVM happens to GC — see plans/lifecycle.py).
    rotor = CheckpointRotor(pairs.sparkSession)
    rotor.begin()
    e = (
        pairs.select(
            F.greatest(F.col(id_a), F.col(id_b)).alias("u"),
            F.least(F.col(id_a), F.col(id_b)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev = _fingerprint(e)
    rotor.commit()
    # per-neighborhood minima via a window over the SAME shuffle that a
    # groupBy would need — but with no second shuffle to join the min
    # back: each star step is one exchange, not two
    wu = Window.partitionBy("u")
    for _ in range(max_iterations):
        rotor.begin()
        # large-star: every node connects its LARGER neighbors to the
        # minimum of its neighborhood (incl. itself)
        nbrs = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = F.least(F.min("v").over(wu), F.col("u"))
        e = (
            nbrs.withColumn("m", m)
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star: every node connects its smaller neighbors (and
        # itself) to the minimum of those — edges are (big, small) here
        sm = e.withColumn("m", F.min("v").over(wu))
        e = (
            sm.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(sm.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=False)  # truncate iterative lineage
        )
        cur = _fingerprint(e)  # materializes the checkpoint too
        rotor.commit()  # frees the previous round's blocks
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds"
        )
    # converged: e is a star graph (node -> component root)
    roots = e.select(F.col("v")).distinct().select(
        F.col("v").alias("node"), F.col("v").alias("component")
    )
    return e.select(F.col("u").alias("node"), F.col("v").alias("component")).unionByName(
        roots
    )


def dedup_groups(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Every document labeled with its duplicate-group id and a
    keep/drop verdict: ``(doc_id, group_id, group_size,
    is_representative)``.  Unpaired documents are singleton groups of
    themselves; the representative is the MIN doc id of the group (a
    deterministic choice — swap in quality-based selection by joining
    doc stats and ranking before the keep decision)."""
    cc = connected_components(pairs, id_a, id_b)
    labeled = (
        docs.select(F.col(id_col))
        .join(cc.withColumnRenamed("node", id_col), on=id_col, how="left")
        .withColumn("group_id", F.coalesce(F.col("component"), F.col(id_col)))
        .drop("component")
    )
    sizes = labeled.groupBy("group_id").agg(F.count(F.lit(1)).alias("group_size"))
    return (
        labeled.join(sizes, "group_id")
        .select(
            id_col,
            "group_id",
            "group_size",
            (F.col(id_col) == F.col("group_id")).alias("is_representative"),
        )
    )
