"""Whole-graph degree statistics and assortativity.

The cheap first look every graph-pipeline stage wants before paying
for pagerank / k-core / triangles: how big, how dense, how skewed, and
whether hubs attach to hubs (assortativity > 0) or to leaves (< 0) —
the single number that predicts whether degree-ordered orientation
(operators/triangles.py) and hub caps (operators/linkpred.py) will pay.

Assortativity is Newman 2002/2003 ("Mixing patterns in networks"):
the Pearson correlation of endpoint degrees over the DIRECTED edge
list obtained by writing each undirected edge in both orientations.
Pearson is scale-invariant (the sample-vs-population convention
cancels); it is computed as explicit covar/stddev·stddev behind
try_divide so degree-regular graphs yield SQL-style NULL instead of
an ANSI divide-by-zero.

Cost shape: one canonicalize + distinct, one degree agg, one degree
join per endpoint (degree table is |V| rows — broadcast when small;
at 100 TB the equi-join shuffles on node id, which is the right
plan), then a single global agg.  ``khop_reach`` / ``hyperball``
extend the family to the neighborhood function (exact small-k form
and the HLL-counter scale form).
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

    Two aggregation branches over PINNED frames (directed edges and
    the degree table — localCheckpoint, not cache: blocks release on
    GC, the shards.py/packing.py pattern; without the pins Catalyst
    replays the whole edge construction per branch — 32 static scans
    at sf0.01):

    * node-grain moments straight off the degree table as exact
      integer sums (n_nodes = count, 2·n_edges = Σd, variance =
      Σd²/n − (Σd/n)² — more portable than var_pop's streaming
      accumulation, and no COUNT DISTINCT expand over the edge frame:
      the first single-agg form paid a 2× expand on 2|E| rows and
      measured SLOWER at sf1 than the exact 2-hop frontier);
    * the Pearson alone on edge grain (degree-annotated directed
      edges).
    """
    directed = _directed(edges)
    deg = (
        directed.groupBy("u")
        .agg(F.count(F.lit(1)).alias("degree"))
        .localCheckpoint(eager=False)
    )
    summary = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum("degree") / 2).cast("long").alias("n_edges"),
        F.sum("degree").alias("sum_d"),
        F.max("degree").alias("max_degree"),
        F.sum(F.col("degree") * F.col("degree")).alias("sum_d2"),
    )
    du = deg.select(F.col("u"), F.col("degree").alias("deg_u"))
    dv = deg.select(F.col("u").alias("v"), F.col("degree").alias("deg_v"))
    paired = directed.join(du, on="u").join(dv, on="v")
    assort = paired.agg(
        F.try_divide(
            F.covar_pop("deg_u", "deg_v"),
            F.stddev_pop("deg_u") * F.stddev_pop("deg_v"),
        ).alias("assort")
    )
    avg_deg = F.col("sum_d") / F.col("n_nodes")
    return summary.crossJoin(assort).select(
        "n_nodes",
        "n_edges",
        F.round(avg_deg, 6).alias("avg_degree"),
        "max_degree",
        F.round(
            F.col("sum_d2") / F.col("n_nodes") - avg_deg * avg_deg, 6
        ).alias("degree_variance"),
        F.round("assort", 6).alias("degree_assortativity"),
    )


def _directed(edges: DataFrame) -> DataFrame:
    """Canonical distinct undirected edges written in both orientations
    (u, v), pinned (one construction, every consumer branches off the
    checkpoint — the graph_degree_stats scan-replay fix)."""
    e = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).filter(F.col("a") != F.col("b")).distinct()
    return (
        e.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(e.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .localCheckpoint(eager=False)
    )


def khop_reach(edges: DataFrame, k: int = 2) -> DataFrame:
    """Exact per-node k-hop reachability: (node, degree, reach) where
    ``reach`` = distinct nodes at distance 1..k (self excluded).

    The exact small-k form of the neighborhood function — the quantity
    ``hyperball`` estimates when k or the graph make exactness
    unaffordable.  Per extra hop: one equi-join frontier extension +
    one distinct.  The pair frame is Σ_v |B(v, k)| rows — the same
    wedge-volume cost class as the triangle census at k=2 — so at
    100 TB this runs on a degree-capped or sampled graph (the census
    pattern) and ``hyperball`` carries the general case with m
    registers per node instead of |B| rows.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    directed = _directed(edges)
    reach = directed
    for _ in range(k - 1):
        ext = (
            reach.withColumnRenamed("v", "w")
            .join(directed.withColumnRenamed("u", "w"), on="w")
            .select("u", "v")
            .filter(F.col("u") != F.col("v"))
        )
        reach = reach.unionAll(ext).distinct()
    deg = directed.groupBy("u").agg(F.count(F.lit(1)).alias("degree"))
    return (
        reach.groupBy("u")
        .agg(F.count(F.lit(1)).alias("reach"))
        .join(deg, on="u")
        .select(F.col("u").alias("node"), "degree", "reach")
    )


def hyperball(
    edges: DataFrame, rounds: int = 2, p: int = 6, seed: str = "hb"
) -> DataFrame:
    """HyperBall (Boldi & Vigna 2013): per-node ball-size estimates via
    HLL counters — (node, m, n_zero, estimate) where ``estimate``
    approximates |B(v, rounds)| = |{v} ∪ nodes within <= rounds hops|.

    The scale path for the neighborhood function / effective-diameter
    curve: exact k-hop frontiers (``khop_reach``) hold Σ|B(v,k)| pair
    rows — super-quadratic on dense graphs — while the counter state
    here is <= m = 2^p rows per node at ANY k.  Per round: one
    register-frame equi-join along edges + one (node, j) max agg
    (HLL merge = elementwise max: idempotent, order-free), rounds
    pinned by the CheckpointRotor (the k-core/LPA storage contract).

    Deterministic: counters hash node ids with the portable 60-bit
    md5 hash (operators/hll.py register split), so the whole
    trajectory — init, merges, estimator — is a pure function of
    (graph, rounds, p, seed) and replays bit-for-bit in SQL.
    """
    from tube_spark.operators.hll import hll_estimate_by
    from tube_spark.plans.lifecycle import CheckpointRotor

    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    from tube_spark.functions.text import portable_hash60

    m = 1 << p
    w_bits = 60 - p
    directed = _directed(edges)
    nodes = directed.select(F.col("u").alias("node")).distinct()
    h = portable_hash60(
        F.concat_ws("|", F.lit(seed), F.col("node").cast("string"))
    )
    w = F.expr(f"__hb_h div {m}")
    rank = F.when(
        w > 0, F.lit(w_bits) - F.length(F.bin(w)) + 1
    ).otherwise(F.lit(w_bits) + 1)
    regs = nodes.select(F.col("node"), h.alias("__hb_h")).select(
        "node",
        F.pmod("__hb_h", F.lit(m)).cast("int").alias("j"),
        rank.cast("int").alias("m_rank"),
    ).localCheckpoint(eager=False)
    spark = edges.sparkSession
    rotor = CheckpointRotor(spark)
    for _ in range(rounds):
        rotor.begin()
        nbr = directed.join(
            regs.withColumnRenamed("node", "v"), on="v"
        ).select(F.col("u").alias("node"), "j", "m_rank")
        regs = (
            regs.unionByName(nbr)
            .groupBy("node", "j")
            .agg(F.max("m_rank").alias("m_rank"))
            .localCheckpoint(eager=False)
        )
        regs.count()
        rotor.commit()
    return hll_estimate_by(regs, "node", p)


def neighborhood_function(
    edges: DataFrame, max_rounds: int = 4, p: int = 7, seed: str = "hb"
) -> DataFrame:
    """The neighborhood function N(t) and effective-diameter curve
    (Boldi & Vigna 2013 §4 — what HyperBall exists to compute):
    one row per round t = 0..max_rounds with

      nf_est        Σ_v |B(v, t)| estimate (sum of per-node ball sizes)
      nf_ratio      nf_est(t) / nf_est(max_rounds)
      is_effective  first t with nf_ratio >= 0.9 — the standard 90%
                    effective-diameter readout

    Same per-round counter state as ``hyperball`` (m registers per
    node); each round additionally pays one per-node estimator agg
    (|V| rows) — negligible next to the merge join.  Deterministic and
    fully SQL-replayable round by round.

    Storage note: unlike ``hyperball`` (CheckpointRotor frees each
    superseded round), EVERY round's register checkpoint stays live
    here — the curve reads all of them — so peak state is
    (max_rounds+1)·|V|·m rows.  That is the point of the curve; when
    only the final ball matters, use ``hyperball``.
    """
    from tube_spark.operators.hll import hll_estimate_by
    from tube_spark.functions.text import portable_hash60

    if max_rounds < 0:
        raise ValueError(f"max_rounds must be >= 0, got {max_rounds}")
    m = 1 << p
    w_bits = 60 - p
    directed = _directed(edges)
    nodes = directed.select(F.col("u").alias("node")).distinct()
    h = portable_hash60(
        F.concat_ws("|", F.lit(seed), F.col("node").cast("string"))
    )
    w = F.expr(f"__hb_h div {m}")
    rank = F.when(
        w > 0, F.lit(w_bits) - F.length(F.bin(w)) + 1
    ).otherwise(F.lit(w_bits) + 1)
    regs = nodes.select(F.col("node"), h.alias("__hb_h")).select(
        "node",
        F.pmod("__hb_h", F.lit(m)).cast("int").alias("j"),
        rank.cast("int").alias("m_rank"),
    ).localCheckpoint(eager=False)

    def _nf(frame: DataFrame, t: int) -> DataFrame:
        return hll_estimate_by(frame, "node", p).agg(
            F.lit(t).alias("round"),
            F.round(F.sum("estimate"), 4).alias("nf_est"),
        )

    curves = [_nf(regs, 0)]
    for t in range(1, max_rounds + 1):
        nbr = directed.join(
            regs.withColumnRenamed("node", "v"), on="v"
        ).select(F.col("u").alias("node"), "j", "m_rank")
        regs = (
            regs.unionByName(nbr)
            .groupBy("node", "j")
            .agg(F.max("m_rank").alias("m_rank"))
            .localCheckpoint(eager=False)
        )
        curves.append(_nf(regs, t))
    curve = curves[0]
    for c in curves[1:]:
        curve = curve.unionByName(c)
    from pyspark.sql import Window

    total = F.max("nf_est").over(Window.partitionBy())  # max_rounds row
    w_ord = Window.partitionBy().orderBy("round")
    out = curve.select(
        "round",
        "nf_est",
        F.round(F.col("nf_est") / total, 6).alias("nf_ratio"),
    )
    # first round reaching 90% of the final mass; the curve frame is
    # max_rounds+1 rows, so the unpartitioned windows are bounded
    reached = F.col("nf_ratio") >= 0.9
    first90 = F.min(F.when(reached, F.col("round"))).over(Window.partitionBy())
    return out.withColumn(
        "is_effective", (F.col("round") == first90).alias("is_effective")
    ).orderBy("round")


def hyperball_packed(
    edges: DataFrame, rounds: int = 2, p: int = 6, seed: str = "hb"
) -> DataFrame:
    """HyperBall with PACKED per-node counters: one row per node
    holding all m = 2^p registers as ``array<int>`` — the
    Boldi-Vigna message shape, vs ``hyperball``'s (node, j, m_rank)
    register rows.

    Identical output to ``hyperball`` (same hash, same registers,
    same estimator — equality-asserted in tests): the merge
    ``max(r_a[i], r_b[i])`` commutes with packing.  A merge round
    moves |directed| messages either way; a packed message is one row
    with a 4m-byte array, and the per-(node, j) max agg becomes a
    per-node elementwise ``np.maximum`` over Arrow batches
    (applyInPandas — built-ins have no grouped elementwise-array-max
    aggregate).  Estimator runs JVM-side on the packed array: an
    absent register is rank 0 and 2^-0 = 1, exactly the n_zero term
    of the row form, so s = Σ 2^-r over all m needs no
    present/absent split.

    MEASURED VERDICT (BENCH_NOTES r11): below register saturation the
    ROW form wins (sf1 rounds=2/p=7: 26.7 s vs 46.1 s packed) — row
    messages are SPARSE (only non-zero registers ship, ≈ ball size)
    while packing ships all m every time, and per-node Arrow groups
    pay Python overhead the codegen max agg doesn't.  Packing is the
    saturated-regime (balls ≳ m, large radius) alternative only;
    ``hyperball`` is the default.
    """
    import pandas as pd

    from tube_spark.operators.hll import _alpha
    from tube_spark.plans.lifecycle import CheckpointRotor
    from tube_spark.functions.text import portable_hash60

    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    m = 1 << p
    w_bits = 60 - p
    directed = _directed(edges)
    nodes = directed.select(F.col("u").alias("node")).distinct()
    h = portable_hash60(
        F.concat_ws("|", F.lit(seed), F.col("node").cast("string"))
    )
    w = F.expr(f"__hb_h div {m}")
    rank = F.when(
        w > 0, F.lit(w_bits) - F.length(F.bin(w)) + 1
    ).otherwise(F.lit(w_bits) + 1)
    regs = (
        nodes.select(F.col("node"), h.alias("__hb_h"))
        .select(
            "node",
            F.pmod("__hb_h", F.lit(m)).cast("int").alias("j"),
            rank.cast("int").alias("m_rank"),
        )
        .select(
            "node",
            F.expr(
                f"transform(sequence(0, {m - 1}),"
                " i -> CASE WHEN i = j THEN m_rank ELSE 0 END)"
            ).alias("regs"),
        )
        .localCheckpoint(eager=False)
    )

    def _elementwise_max(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        merged = np.maximum.reduce(np.stack(pdf["regs"].values))
        return pd.DataFrame({"node": [pdf["node"].iloc[0]], "regs": [merged]})

    spark = edges.sparkSession
    rotor = CheckpointRotor(spark)
    schema = "node long, regs array<int>"
    for _ in range(rounds):
        rotor.begin()
        nbr = directed.join(
            regs.withColumnRenamed("node", "v"), on="v"
        ).select(F.col("u").alias("node"), "regs")
        regs = (
            regs.unionByName(nbr)
            .groupBy("node")
            .applyInPandas(_elementwise_max, schema)
            .localCheckpoint(eager=False)
        )
        regs.count()
        rotor.commit()
    s = F.aggregate(
        "regs", F.lit(0.0), lambda acc, r: acc + F.pow(F.lit(2.0), -r)
    )
    n_zero = F.size(F.filter("regs", lambda r: r == F.lit(0)))
    raw = F.lit(_alpha(m) * m * m) / s
    est = F.when(
        (raw <= 2.5 * m) & (n_zero > 0),
        F.lit(float(m)) * F.log(F.lit(m).cast("double") / n_zero),
    ).otherwise(raw)
    return regs.select(
        "node",
        F.lit(m).alias("m"),
        n_zero.cast("long").alias("n_zero"),
        F.round(est, 4).alias("estimate"),
    )
