"""k-core decomposition by iterative peeling (Matula & Beck 1983;
distributed formulation after Montresor et al. 2013).

The k-core is the maximal subgraph in which every node has degree
>= k — the standard "dense backbone" extractor: in a near-dup pair
graph it separates tight template families from incidental chains, in
a co-occurrence graph it isolates the heavily-bundled catalog core
that LPA then splits into communities (operators/communities.py) and
triangles.py scores for cohesion.

Peeling is the classic fixpoint: repeatedly delete every node whose
CURRENT degree is < k (deleting a node lowers its neighbours' degrees,
which can drop them below k in the next round).  The trajectory is
fully deterministic — each round is a pure function of the edge set —
so a fixed round count yields a portable trajectory an SQL oracle can
replay exactly (the pagerank / kmeans / LPA pattern), and extra rounds
past the fixpoint are provably no-ops (peeling is monotone: once every
residual degree is >= k, the filter keeps everything), so a
fixed-round oracle equals the true k-core whenever it converges within
the unrolled budget.

Scale shape (per round): ONE map-side-combinable degree aggregation
over the residual edge list + TWO left-semi joins inducing the
surviving subgraph — no windows, no driver state beyond the round
counter, edge set monotonically shrinking.  Rounds end in
``localCheckpoint`` with the ``CheckpointRotor`` releasing the
previous round's blocks (the CC / pagerank / LPA storage contract);
at any instant at most two rounds of residual edges are live.

Reference anchor: extends the graph-analytics family
(operators/components.py, pagerank.py, triangles.py, communities.py)
beyond reference scope (SURVEY.md beyond-parity suite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tube_spark.plans.lifecycle import CheckpointRotor


def _degrees(e: DataFrame) -> DataFrame:
    return (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )


def k_core(
    edges: DataFrame, k: int, rounds: int | None = None
) -> DataFrame:
    """``(n, core_deg)`` for every node incident to an edge of the
    residual graph after peeling nodes of degree < ``k``.

    ``rounds=None`` (production) peels until the fixpoint — the exact
    k-core, detected by the residual edge count going stable (the
    count doubles as the checkpoint materialization action, so early
    stop costs nothing extra).  An integer ``rounds`` runs EXACTLY
    that many synchronous peel rounds with no early stop — the
    portable-trajectory mode the SQL oracle unrolls; identical to the
    fixpoint whenever the graph converges within the budget, and a
    well-defined deterministic prefix of the trajectory otherwise.

    ``core_deg`` is the node's degree inside the residual subgraph —
    at the fixpoint every ``core_deg >= k`` (its minimum over the core
    is the graph's coreness floor).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rounds is not None and rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    spark = edges.sparkSession
    e = edges.select("a", "b").distinct().localCheckpoint(eager=False)
    n_edges = e.count()
    rotor = CheckpointRotor(spark)
    i = 0
    while n_edges > 0 and (rounds is None or i < rounds):
        rotor.begin()
        keep = _degrees(e).filter(F.col("d") >= k).select("n")
        e = (
            e.join(keep.select(F.col("n").alias("a")), "a", "left_semi")
            .join(keep.select(F.col("n").alias("b")), "b", "left_semi")
            .localCheckpoint(eager=False)
        )
        survived = e.count()
        rotor.commit()
        i += 1
        if rounds is None and survived == n_edges:
            n_edges = survived
            break
        n_edges = survived
    return _degrees(e).select("n", F.col("d").alias("core_deg"))


def coreness(edges: DataFrame, k_max: int) -> DataFrame:
    """``(n, coreness)`` — the largest k for which the node survives in
    the k-core, for k in 1..``k_max`` (nodes outside even the 1-core —
    impossible for edge-list input — would be absent).  Runs the
    peeling ladder: the (k+1)-core is a subgraph of the k-core, so each
    step peels the PREVIOUS core rather than the full graph — total
    work is the telescoping sum of shrinking residuals, not
    k_max * full-graph.
    """
    if k_max < 1:
        raise ValueError(f"k_max must be >= 1, got {k_max}")
    e = edges.select("a", "b").distinct().localCheckpoint(eager=False)
    result: DataFrame | None = None
    for k in range(1, k_max + 1):
        core = k_core(e, k).select("n", F.lit(k).alias("coreness"))
        core = core.localCheckpoint(eager=False)
        if core.limit(1).count() == 0:
            break
        result = core if result is None else result.unionByName(core)
        # peel the NEXT level from this core's node set (induced
        # subgraph), not from the full graph
        keep = core.select("n")
        e = (
            e.join(keep.select(F.col("n").alias("a")), "a", "left_semi")
            .join(keep.select(F.col("n").alias("b")), "b", "left_semi")
            .localCheckpoint(eager=False)
        )
    if result is None:
        return e.select(
            F.col("a").alias("n"), F.lit(0).alias("coreness")
        ).limit(0)
    # a node appears once per level it survives; coreness = max level
    return result.groupBy("n").agg(F.max("coreness").alias("coreness"))


def _edge_support(e: DataFrame) -> DataFrame:
    """(a, b, support) — triangles through each undirected edge, via
    the same degree-ordered orientation as operators/triangles.py
    (each triangle found once at its lowest-(degree, id) corner, then
    unpivoted to its three edges)."""
    deg = _degrees(e)
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    ed = e.join(da, "a").join(db, "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    directed = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dst_d"),
    ).localCheckpoint(eager=False)
    e1 = directed.select("src", F.col("dst").alias("v"), F.col("dst_d").alias("vd"))
    e2 = directed.select("src", F.col("dst").alias("w"), F.col("dst_d").alias("wd"))
    v_first = (F.col("vd") < F.col("wd")) | (
        (F.col("vd") == F.col("wd")) & (F.col("v") < F.col("w"))
    )
    wedges = e1.join(e2, "src").filter(v_first).select("src", "v", "w")
    closing = directed.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tris = wedges.join(closing, ["v", "w"])  # (src, v, w) closed
    edges3 = (
        tris.select(F.col("src").alias("x"), F.col("v").alias("y"))
        .unionAll(tris.select(F.col("src").alias("x"), F.col("w").alias("y")))
        .unionAll(tris.select(F.col("v").alias("x"), F.col("w").alias("y")))
    )
    return (
        edges3.select(
            F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("support"))
    )


def k_truss(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """``(a, b, support)`` — the residual edge set after ``rounds``
    synchronous k-truss peel rounds (Cohen 2008): each round drops
    every edge in fewer than ``k-2`` triangles (deleting an edge kills
    its triangles, which can starve OTHER edges next round), then the
    output reports support on the final residual graph.  The truss is
    the edge-analog of the k-core — membership requires triangle
    EMBEDDEDNESS, not just degree — and peels cohesive blocks the core
    keeps (a hub with many degree-heavy but triangle-free edges).

    Fixed rounds = the portable-trajectory contract (kcore/LPA/
    pagerank): the oracle unrolls identical rounds, and rounds past the
    fixpoint are no-ops, so the contract holds at any scale factor.
    Per round: one support computation (the degree-ordered wedge join —
    O(sqrt m)-bounded fan-out — plus a 3-edge unpivot count) and one
    edge semi-filter; rounds rotate under the CheckpointRotor.
    """
    if k < 3:
        raise ValueError(f"k must be >= 3, got {k}")
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    spark = edges.sparkSession
    # canonicalize to a<b at entry: _edge_support emits (least, greatest)
    # keys, so an edge stored as (3, 1) would never match its support row
    # and get peeled in round 1 regardless of its true support.
    # triangle_stats / k_core tolerate either orientation; this makes
    # k_truss consistent with them (self-loops carry no triangles).
    e = (
        edges.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    rotor = CheckpointRotor(spark)
    for _ in range(rounds):
        rotor.begin()
        sup = _edge_support(e)
        e = (
            e.join(sup, ["a", "b"])
            .filter(F.col("support") >= k - 2)
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
        e.count()
        rotor.commit()
    return e.join(_edge_support(e), ["a", "b"], "left").select(
        "a", "b", F.coalesce("support", F.lit(0)).alias("support")
    )
