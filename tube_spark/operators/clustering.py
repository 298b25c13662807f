"""Distributed Lloyd's k-means over an embedding column.

The bounded-sample quantizer in ``similarity._kmeans_centroids`` (≤4096
vectors on the driver) is the right coarse quantizer for IVF, but a
clustering OPERATOR — SemDeDup partitions, topic bucketing, stratified
curation — should see the whole corpus.  This is full-corpus Lloyd with
the classic distributed shape (the same dataflow MLlib's KMeans uses,
re-expressed on DataFrames):

* **assignment** is map-only: k squared-distance expressions per row,
  all native Catalyst (``zip_with`` + ``aggregate`` folds inside
  whole-stage codegen), argmin by first-minimum for deterministic ties.
* **update** shuffles only ``k × dim`` partial aggregates: posexplode
  to ``(cluster, dim, value)`` rows, map-side partial ``avg`` per
  partition, final ``k·dim`` means collected to the driver (64 rows for
  k=4, dim=16 — the bounded-collect pattern used throughout this repo).
  The corpus itself never moves: no shuffle is keyed by vector.
* per-iteration cost: one corpus scan + one ``k·dim``-row shuffle;
  ``iters`` is fixed (no data-dependent convergence test) so runs are
  reproducible and plannable.

Portability: with ``round_to`` set, centers are rounded after every
update.  Float summation order differs across engines (Spark partial
aggregation vs a sequential fold), so unrounded means differ in final
bits; rounding at 6 decimals makes the whole trajectory — and therefore
every assignment — bit-reproducible in an independent SQL engine
(DuckDB oracle: the driver hash-matches assignments after 3 full
iterations).

At large k (≥ a few hundred) the k-expression assignment should move
to the Arrow kernel (``similarity._nearest_centroids_udf``) — one BLAS
matmul per batch; the update side is k-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tube_spark.functions.localrel import local_df


def _sq_dist(vec: Column, center: list[float]) -> Column:
    """Squared Euclidean distance to a literal center — a codegen'd
    fold, no UDF.  DuckDB twin:
    ``list_sum(list_transform(generate_series(1, len(v)), i -> (v[i] - c[i])^2))``."""
    lit = F.array(*[F.lit(float(x)) for x in center])
    return F.aggregate(
        F.zip_with(vec, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _argmin_cluster(vec: Column, centers: list[list[float]]) -> Column:
    """Index of the nearest center; ties break to the FIRST (lowest
    index) via ``array_position`` of the minimum.

    Literal-embedding form — kept for the float-identity test against
    ``_assign_via_broadcast`` (the production path); do NOT call it
    per-iteration in a trainer (fresh literals force a Janino recompile
    each round — SCALE.md §iterative; the one-SQL-string variant of
    this tradeoff lives at its real call sites in operators/quantize.py)."""
    dists = F.array(*[_sq_dist(vec, c) for c in centers])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def _assign_via_broadcast(
    df: DataFrame,
    centers: list[list[float]],
    vec_col: str,
    out_col: str = "cluster",
) -> DataFrame:
    """Nearest-center assignment with centers as broadcast one-row DATA
    instead of literals.  Embedding k*dim literals re-compiles a fresh
    500+-term codegen method EVERY Lloyd iteration (measured 3-6 s per
    iteration at k=4/dim=64 — Janino, not data).  With centers as a
    column, the expression TEXT is identical across iterations, so the
    codegen cache hits and each iteration pays only the scan.  The
    arithmetic is the same 0.0-seeded zip_with fold and first-minimum
    argmin, so the portable DuckDB oracle keeps hash-matching; the
    one-row broadcast is the declared-bounded BNLJ shape
    (tests/test_plan_audit.py)."""
    spark = df.sparkSession
    cdf = local_df(
        spark, [([[float(x) for x in c] for c in centers],)], "__c array<array<double>>"
    )
    dists = F.transform(
        F.col("__c"),
        lambda cc: F.aggregate(
            F.zip_with(F.col(vec_col), cc, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    cluster = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    return (
        df.crossJoin(F.broadcast(cdf)).withColumn(out_col, cluster).drop("__c")
    )


def kmeans_init_ids(
    df: DataFrame, id_col: str, vec_col: str, k: int
) -> list[list[float]]:
    """Deterministic, engine-portable init: the vectors of the ``k``
    smallest ids, in id order.  (k-means++ sampling converges faster but
    is not reproducible across engines; pass its output as explicit
    ``centers`` when quality matters more than portability.)"""
    rows = df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    return [[float(x) for x in r[1]] for r in rows]


def kmeans_fit(
    df: DataFrame,
    centers: list[list[float]],
    vec_col: str = "embedding",
    iters: int = 5,
    round_to: int | None = None,
) -> list[list[float]]:
    """Run ``iters`` full Lloyd iterations from ``centers``; returns the
    final centers.  Empty clusters keep their previous center."""
    centers = [list(map(float, c)) for c in centers]
    for _ in range(iters):
        assigned = _assign_via_broadcast(df, centers, vec_col).select(
            "cluster", F.posexplode(vec_col).alias("dim", "val")
        )
        rows = (
            assigned.groupBy("cluster", "dim")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .collect()
        )
        nxt = [list(c) for c in centers]
        for r in rows:
            nxt[r["cluster"]][r["dim"]] = (
                round(r["m"], round_to) if round_to is not None else r["m"]
            )
        centers = nxt
    return centers


def kmeans_assign(
    df: DataFrame,
    centers: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Map-only nearest-center assignment — appends ``out_col``."""
    return _assign_via_broadcast(df, centers, vec_col, out_col)


def kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 5,
    round_to: int | None = None,
) -> DataFrame:
    """Fit + assign with the portable smallest-ids init."""
    init = kmeans_init_ids(df, id_col, vec_col, k)
    final = kmeans_fit(df, init, vec_col, iters, round_to)
    return kmeans_assign(df, final, vec_col)
