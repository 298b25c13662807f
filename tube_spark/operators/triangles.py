"""Triangle counting with degree-ordered orientation — the classic
skew-proof formulation (Suri & Vassilvitskii, WWW 2011 "Counting
triangles and the curse of the last reducer").

A naive wedge join fans out quadratically at hub nodes: a degree-d
vertex contributes d*(d-1)/2 wedges, and real graphs are power-law.
Orienting every edge from its lower-(degree, id) endpoint to the
higher bounds every vertex's OUT-degree by O(sqrt(m)), so the wedge
join's per-key fan-out — the thing that melts on skew — is bounded
regardless of the degree distribution; each triangle is found exactly
once, at its lowest-ranked vertex.

Spark shape: two keyed aggregations (degrees, wedge count), two
broadcast-or-shuffle equi-joins (attach degrees, close wedges), all
native Catalyst — no iteration, no driver state.  Composes with the
co-occurrence edge builder below (bipartite fact -> unipartite
projection with the same hot-group cap the shingle index uses) and
with the dedup pair sets (triangle density over LSH pairs measures
how transitive — how "group-like" — the near-dup relation actually
is before CC runs).

Reference anchor: extends the graph-analytics family
(operators/pagerank.py, operators/components.py) beyond reference
scope (SURVEY.md beyond-parity suite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_edges(
    df: DataFrame,
    group_col: str,
    node_col: str,
    max_group: int | None = None,
) -> DataFrame:
    """Distinct undirected edges ``(a, b)``, ``a < b``, between nodes
    sharing a group (the bipartite->unipartite projection).  Groups
    larger than ``max_group`` are dropped BEFORE the pair self-join —
    a group of size g emits g*(g-1)/2 pairs, so one boilerplate hot
    group (every-supplier order, every-doc shingle) is the quadratic
    hazard; same cap semantics as the shingle index's
    ``max_shingle_df``."""
    membership = df.select(
        F.col(group_col).alias("g"), F.col(node_col).alias("n")
    ).distinct()
    if max_group is not None:
        if max_group < 2:
            raise ValueError(f"max_group must be >= 2, got {max_group}")
        from pyspark.sql import Window

        # cap via a count window on the distinct frame — one shuffle on
        # g shared with the pair self-join below, instead of a size
        # aggregation joined back (a second full-width membership
        # shuffle; measured at sf1 the downstream k_truss drops
        # ~33 -> ~26 s and loses most of its run-to-run variance)
        membership = (
            membership.withColumn(
                "__gs", F.count(F.lit(1)).over(Window.partitionBy("g"))
            )
            .filter(F.col("__gs") <= max_group)
            .drop("__gs")
        )
    a = membership.select("g", F.col("n").alias("a"))
    b = membership.select("g", F.col("n").alias("b"))
    return (
        a.join(b, "g")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def triangle_stats_sampled(
    edges: DataFrame, p: float = 0.5, seed: str = "tri"
) -> DataFrame:
    """DOULION edge-sparsified triangle estimate (Tsourakakis et al.,
    KDD 2009): keep each edge independently with probability ``p``
    (deterministic salted portable hash, so the estimate is replayable
    in SQL), count triangles EXACTLY on the sparsified graph, scale by
    ``1/p^3`` — an unbiased estimator whose cost shrinks cubically in
    the wedge volume while the graph shrinks linearly.  The scale dial
    for census-sized graphs where the exact wedge join (inherently
    Sum(outdeg^2)) is the bottleneck: p=0.1 cuts wedge work ~100x.

    Output row: (p, n_edges_sampled, n_triangles_sampled,
    n_triangles_est) — ``n_triangles_est`` = sampled count / p^3,
    rounded to 2.  ``p=1`` degenerates to the exact count."""
    from tube_spark.functions.text import portable_hash60

    if not 0 < p <= 1:
        raise ValueError(f"p must be in (0, 1], got {p}")
    h = portable_hash60(
        F.concat_ws("|", F.lit(seed), F.col("a").cast("string"), F.col("b").cast("string"))
    )
    # round, not int(): int(0.7 * 1e6) truncates to 699999 under float
    kept = edges.filter(
        (h % F.lit(1_000_000)) < F.lit(int(round(p * 1_000_000)))
    )
    t = triangle_stats(kept)
    # p*p*p (not pow): matches the SQL oracle's multiply shape ulp-for-ulp
    p3 = F.lit(float(p)) * F.lit(float(p)) * F.lit(float(p))
    return t.select(
        F.lit(float(p)).alias("p"),
        F.col("n_edges").alias("n_edges_sampled"),
        F.col("n_triangles").alias("n_triangles_sampled"),
        F.round(F.col("n_triangles") / p3, 2).alias("n_triangles_est"),
    )


def triangle_stats(edges: DataFrame) -> DataFrame:
    """One-row graph summary from distinct undirected ``(a, b)`` edges:
    (n_nodes, n_edges, n_wedges, n_triangles, global_clustering) —
    global clustering = 3 * triangles / wedges (rounded to 6), the
    fraction of open wedges that close.

    Degree-ordered orientation bounds the wedge join's fan-out by
    O(sqrt(m)) per vertex; each triangle is counted once at its
    lowest-(degree, id) corner."""
    # e / deg / directed each feed MULTIPLE downstream branches —
    # unpinned, Catalyst replans the whole upstream per consumer
    # (measured: 72 scans / 143 exchanges in the unpinned plan).
    # localCheckpoint pins each to one computation (the packing.py
    # reused-subtree rule).
    e = edges.select("a", "b").distinct().localCheckpoint(eager=False)
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint(eager=False)
    )
    # attach both endpoint degrees, then orient low-(d, id) -> high
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
    # wedges at src: unordered pairs of out-neighbours, ordered by the
    # SAME (degree, id) rank so the closing edge (v, w) is guaranteed
    # to be oriented v -> w
    e1 = directed.select("src", F.col("dst").alias("v"), F.col("dst_d").alias("vd"))
    e2 = directed.select("src", F.col("dst").alias("w"), F.col("dst_d").alias("wd"))
    v_first = (F.col("vd") < F.col("wd")) | (
        (F.col("vd") == F.col("wd")) & (F.col("v") < F.col("w"))
    )
    wedges = e1.join(e2, "src").filter(v_first).select("v", "w")
    closing = directed.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    n_tri = wedges.join(closing, ["v", "w"], "left_semi")
    counts = e.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        deg.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum(F.expr("d * (d - 1) / 2")).cast("long").alias("n_wedges"),
        )
    ).crossJoin(n_tri.agg(F.count(F.lit(1)).alias("n_triangles")))
    return counts.select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.when(
            F.col("n_wedges") > 0,
            F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("global_clustering"),
    )
