"""Whole-graph degree statistics and assortativity.

The cheap first look every graph-pipeline stage wants before paying
for pagerank / k-core / triangles: how big, how dense, how skewed, and
whether hubs attach to hubs (assortativity > 0) or to leaves (< 0) —
the single number that predicts whether degree-ordered orientation
(operators/triangles.py) and hub caps (operators/linkpred.py) will pay.

Assortativity is Newman 2002/2003 ("Mixing patterns in networks"):
the Pearson correlation of endpoint degrees over the DIRECTED edge
list obtained by writing each undirected edge in both orientations.
Pearson is scale-invariant, so sample-vs-population variance conventions
cancel and Spark's ``corr`` matches DuckDB's ``corr`` bit-for-bit at
double precision.

Cost shape: one canonicalize + distinct, one degree agg, one broadcast
degree join per endpoint (degree table is |V| rows — broadcast only
when small; at 100 TB the equi-join shuffles on node id, which is the
right plan), then a single global agg.  No iteration, no windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_table(edges: DataFrame) -> DataFrame:
    """(node, degree) from an undirected edge list (src, dst).
    Self-loops dropped; parallel edges collapse (distinct canonical
    pairs) so degree = number of distinct neighbors."""
    e = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).filter(F.col("a") != F.col("b")).distinct()
    both = e.select(F.col("a").alias("node")).unionAll(
        e.select(F.col("b").alias("node"))
    )
    return both.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))


def graph_degree_stats(edges: DataFrame) -> DataFrame:
    """One-row summary: n_nodes, n_edges, avg_degree, max_degree,
    degree_variance (population), degree_assortativity.

    ``degree_assortativity`` is NULL for degree-regular graphs (zero
    variance — correlation undefined), matching SQL NULL conventions
    (explicit Pearson behind try_divide: ANSI-mode corr() would raise
    DIVIDE_BY_ZERO instead).

    ONE aggregation over the degree-annotated directed-edge frame —
    node-grain stats are recovered from edge grain without a second
    branch (every node u appears deg(u) times as a source, so
    count = Σ_nodes d, sum(deg_u) = Σ_nodes d², countDistinct(u) = |V|,
    and the variance falls out of the moments as exact-integer-sum
    arithmetic — MORE portable than var_pop's streaming accumulation).
    The naive three-branch form (deg agg + edge count + assortativity
    agg) re-planned the upstream edge construction per branch — 32
    static scans at sf0.01; this shape plans 6.
    """
    e = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).filter(F.col("a") != F.col("b")).distinct()
    directed = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    # Pin the directed frame: deg and paired both branch off it, and
    # without the pin Catalyst replays the whole upstream edge
    # construction per branch (measured: 24 static scans at sf0.01 on
    # the co-occurrence graph vs 4 pinned).  localCheckpoint, not
    # cache: blocks release on GC — the shards.py/packing.py pattern.
    directed = directed.localCheckpoint(eager=False)
    deg = directed.groupBy("u").agg(F.count(F.lit(1)).alias("degree"))
    du = deg.select(F.col("u"), F.col("degree").alias("deg_u"))
    dv = deg.select(F.col("u").alias("v"), F.col("degree").alias("deg_v"))
    paired = directed.join(du, on="u").join(dv, on="v")
    n_dir = F.count(F.lit(1))
    n_nodes = F.count_distinct(F.col("u"))
    sum_d2 = F.sum("deg_u")
    agg = paired.agg(
        n_nodes.alias("n_nodes"),
        (n_dir / 2).cast("long").alias("n_edges"),
        n_dir.alias("n_dir"),
        F.max("deg_u").alias("max_degree"),
        sum_d2.alias("sum_d2"),
        F.try_divide(
            F.covar_pop("deg_u", "deg_v"),
            F.stddev_pop("deg_u") * F.stddev_pop("deg_v"),
        ).alias("assort"),
    )
    avg_deg = F.col("n_dir") / F.col("n_nodes")
    return agg.select(
        "n_nodes",
        "n_edges",
        F.round(avg_deg, 6).alias("avg_degree"),
        "max_degree",
        F.round(
            F.col("sum_d2") / F.col("n_nodes") - avg_deg * avg_deg, 6
        ).alias("degree_variance"),
        F.round("assort", 6).alias("degree_assortativity"),
    )
