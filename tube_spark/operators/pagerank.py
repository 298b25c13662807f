"""Distributed PageRank over an edge DataFrame.

Joins the engine's iterative family (connected components, Lloyd
k-means, logistic GD, BPE) with the canonical link-analysis operator —
in a curation pipeline it ranks documents by citation/link importance
(keep-best tie-breaking, crawl prioritization), and on the graph-ETL
side it is the standard "walk the graph" beyond-reference ask.

Per iteration (the textbook formulation, Page et al. 1999):

    rank'(v) = (1-d)/N + d * ( Σ_{u→v} rank(u)/outdeg(u)
                               + dangling_mass/N )

Spark shape — one join + one aggregation per round, all keyed:

* out-degrees are computed ONCE and live in the edge frame (the join
  carries ``rank/outdeg`` contributions keyed by destination);
* dangling mass (ranks of nodes with no out-edges) is a one-row
  aggregate broadcast back — the repo's standard scalar pattern;
* every round ends in ``localCheckpoint(eager=False)`` with the
  ``CheckpointRotor`` releasing the previous round's blocks — the
  iterative-operator storage contract shared with components.py;
* fixed ``iterations`` (deterministic, ORACLE-able: the extras query
  unrolls 3 rounds in SQL) or early stop on L1 delta < tol.

100 TB notes: the per-round shuffle is |E| contributions hashed on the
destination — identical shape to the candidate joins elsewhere; skew
(a node with 10^8 in-links) is an AQE-skew/salting case like any hot
join key.  Ranks are one row per node; nothing driver-side but the
one-row dangling/delta aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tube_spark.plans.lifecycle import CheckpointRotor


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    tol: float | None = None,
) -> DataFrame:
    """(node, rank) with Σrank = 1.  ``tol`` enables early stop when
    the L1 rank change drops below it (costs one extra one-row
    aggregate per round); leave None for a fixed, oracle-reproducible
    trajectory."""
    if iterations <= 0:
        raise ValueError(f"iterations must be positive, got {iterations}")
    if not 0 < damping < 1:
        raise ValueError(f"damping must be in (0,1), got {damping}")
    spark = edges.sparkSession
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.count()  # materializes the checkpoint
    if n_nodes == 0:
        return spark.createDataFrame([], "node long, rank double")
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # edges annotated once; reused every round
    ed = e.join(out_deg, on="src").localCheckpoint(eager=False)
    ed.count()

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    rotor = CheckpointRotor(spark)
    base = (1.0 - damping) / n_nodes
    for _ in range(iterations):
        rotor.begin()
        dangling = (
            ranks.join(out_deg, on=F.col("node") == F.col("src"), how="left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        contrib = (
            ed.join(ranks, on=F.col("src") == F.col("node"))
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        new_ranks = (
            nodes.join(contrib, on="node", how="left")
            .crossJoin(F.broadcast(dangling))  # one-row aggregate
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.col("dm") / n_nodes)
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
        if tol is not None:
            delta = (
                new_ranks.join(ranks.withColumnRenamed("rank", "prev"), on="node")
                .agg(F.sum(F.abs(F.col("rank") - F.col("prev"))).alias("d"))
                .collect()[0]["d"]
            )
            ranks = new_ranks
            rotor.commit()
            if delta < tol:
                break
        else:
            new_ranks.count()  # materialize this round's checkpoint
            ranks = new_ranks
            rotor.commit()
    return ranks.select("node", F.round("rank", 8).alias("rank"))


def personalized_pagerank(
    edges: DataFrame,
    sources: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Personalized PageRank (the random-walk-with-restart kernel):
    identical to ``pagerank`` except ALL restart mass — the (1-d)
    teleport AND the dangling redistribution — lands on the source
    set's personalization vector p (uniform over ``sources``' single
    id column) instead of uniformly on every node:

        rank'(v) = (1-d) * p(v) + d * (inflow(v) + dangling_mass * p(v))

    Ranks then measure proximity TO THE SOURCES along the graph — the
    standard "more like these" expansion (seed documents -> related
    documents, seed entities -> candidate matches), and the scoring
    side of the random-walk family (operators/walks.py generates the
    trajectories; this integrates them in closed form).

    Same per-round shape and storage contract as ``pagerank`` (one
    keyed join + one agg, rotor-checkpointed); fixed ``iterations``
    keeps the trajectory oracle-replayable.  Sources not present in
    the edge set still receive their restart mass (they are part of
    the node universe by definition).
    """
    if iterations <= 0:
        raise ValueError(f"iterations must be positive, got {iterations}")
    if not 0 < damping < 1:
        raise ValueError(f"damping must be in (0,1), got {damping}")
    spark = edges.sparkSession
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    s = sources.select(F.col(sources.columns[0]).alias("node")).distinct()
    n_sources = s.count()
    if n_sources == 0:
        raise ValueError("sources must contain at least one node")
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # the dangling membership depends only on the (static) edge set, so
    # it is a COLUMN of the pinned node frame, not a per-round anti-join:
    # each round's dangling mass is then a filtered sum over the ranks
    # frame it already holds — zero extra joins per iteration
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .unionByName(s)
        .distinct()
        .join(s.withColumn("__p", F.lit(1.0 / n_sources)), "node", "left")
        .join(
            out_deg.select(F.col("src").alias("node"), F.lit(False).alias("__nd")),
            "node",
            "left",
        )
        .select(
            "node",
            F.coalesce("__p", F.lit(0.0)).alias("p"),
            F.coalesce("__nd", F.lit(True)).alias("dangling"),
        )
        .localCheckpoint(eager=False)
    )
    nodes.count()
    ed = e.join(out_deg, on="src").localCheckpoint(eager=False)
    ed.count()

    ranks = nodes.select("node", "p", "dangling", F.col("p").alias("rank"))
    rotor = CheckpointRotor(spark)
    for _ in range(iterations):
        rotor.begin()
        dangling = ranks.filter(F.col("dangling")).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        contrib = (
            ed.join(ranks, on=F.col("src") == F.col("node"))
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, on="node", how="left")
            .crossJoin(F.broadcast(dangling))  # one-row aggregate
            .select(
                "node",
                "p",
                "dangling",
                (
                    F.lit(1.0 - damping) * F.col("p")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("dm") * F.col("p")
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
        ranks.count()
        rotor.commit()
    return ranks.select("node", F.round("rank", 8).alias("rank"))
