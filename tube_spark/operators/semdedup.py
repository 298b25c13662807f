"""Semantic deduplication: cluster embeddings, drop near-duplicates
within each cluster (SemDeDup, Abbas et al. 2023, arXiv:2303.09540).

The published recipe — k-means-cluster the corpus embeddings, compute
pairwise cosine similarity INSIDE each cluster only, and keep one
representative per near-duplicate neighborhood — re-expressed as three
DataFrame stages:

1. **assign**: nearest-centroid id per vector.  Map-only — k dot
   products per row as native Catalyst array expressions (or the Arrow
   kernel shared with IVF for large k).  No shuffle.
2. **pairs**: self-equi-join on the cluster id (never all-pairs across
   the corpus), exact cosine on bucket-mates, threshold filter.
3. **verdict**: a document is dropped iff a LOWER-ID document in the
   same cluster is ≥ threshold similar — the deterministic
   keep-lowest-id rule (left-anti join against the pair list's right
   side).  Note this is the independent "drop if any lower-id near-dup
   exists" rule, not a greedy chain: a document may be dropped on the
   evidence of a neighbor that was itself dropped.  That matches the
   paper's "keep one per neighborhood" intent, is order-deterministic,
   and is the same rule the exact-dedup canonical uses.

Two centroid sources:

* ``lattice_centroids`` — data-independent integer-lattice directions.
  Every number in the pipeline is then reproducible in ANY engine
  (DuckDB oracle: the driver hash-matches the full pipeline), the same
  portability trick as ``minhash_signatures(portable=True)``.
* k-means (``centroids="kmeans"``) — the paper's choice; reuses the
  bounded-sample driver-side k-means + distributed assignment from
  ``similarity.ivf_topk``.  Approximate across cluster borders, so its
  check is recall-vs-exact, not an oracle.

SCALE (100 TB): stage 2 is the classic Θ(Σ cluster²) blocked self-join —
identical cost model to the LSH band joins (dedup.py); size k so mean
cluster occupancy stays bounded (k ≈ n / target_size, the paper uses
occupancy ~100-1k at 100M-doc scale) and cap hot clusters with
``max_cluster_size`` (skips the degenerate clusters the paper also
excludes).  Assignment cost is k dots per row: past a few hundred
centroids move to the Arrow kernel (`use_arrow=True`), past tens of
thousands use IVF-style probe pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tube_spark.functions.localrel import local_df

from tube_spark.operators.similarity import cosine, dot


def lattice_centroids(k: int, dim: int) -> list[list[float]]:
    """Data-independent centroid directions on a small integer lattice:
    ``c[j][i] = (j*31 + i*7) % 11 - 5``.  Integers, so any engine
    reproduces them exactly; directions are spread enough to partition a
    unit sphere usefully.  Not a quality quantizer — the portability
    path for differential verification (use k-means for real curation).
    """
    return [
        [float((j * 31 + i * 7) % 11 - 5) for i in range(dim)] for j in range(k)
    ]


def _argmax_cluster(vec: Column, centroids: list[list[float]]) -> Column:
    """Index of the centroid with the highest direction-normalized dot
    product (ties → lowest index, via ``array_position`` returning the
    FIRST occurrence).  The per-centroid norm is computed inside the
    expression from the exact integer values, so both engines derive it
    from identical inputs."""
    scores = F.array(
        *[
            dot(vec, F.array(*[F.lit(x) for x in c]))
            / F.sqrt(F.lit(sum(x * x for x in c)))
            for c in centroids
        ]
    )
    return (F.array_position(scores, F.array_max(scores)) - 1).cast("int")


def _assign_via_broadcast(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """``_argmax_cluster`` with centroids as broadcast one-row DATA —
    the iteration-invariant-expression-text form (see
    ``clustering._assign_via_broadcast``): k*dim literals cost a py4j
    round-trip per operator to build and a fresh codegen compile per
    distinct centroid set.  Float-identical to the literal form: the
    in-engine norm fold ``0.0 + x*x + ...`` replays Python's
    ``sum(x*x for x in c)`` left-to-right over the same doubles, and
    ``dot`` is the same 0.0-seeded zip_with fold — so the portable
    DuckDB oracle keeps hash-matching.  The one-row broadcast is the
    plan-audit-declared bounded BNLJ shape."""
    spark = df.sparkSession
    cdf = local_df(
        spark,
        [([[float(x) for x in c] for c in centroids],)],
        "__cent array<array<double>>",
    )
    v = F.col(vec_col)
    scores = F.transform(
        F.col("__cent"),
        lambda cc: dot(v, cc)
        / F.sqrt(F.aggregate(cc, F.lit(0.0), lambda acc, x: acc + x * x)),
    )
    cl = (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
    return (
        df.crossJoin(F.broadcast(cdf))
        .select(F.col(id_col), v.alias(vec_col), cl.alias("cluster"))
    )


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_arrow: bool = False,
) -> DataFrame:
    """(id, vector, cluster) — nearest-centroid assignment, map-only.

    ``use_arrow=True`` switches to the numpy matmul kernel shared with
    IVF (``_nearest_centroids_udf``) — same assignment, BLAS-shaped; the
    native-expression path stays the portable/oracled semantics."""
    v = F.col(vec_col).cast("array<double>")
    if use_arrow:
        import numpy as np

        from tube_spark.operators.similarity import _nearest_centroids_udf

        # the IVF kernel scores raw dot products (its k-means centroids
        # are already unit vectors) — normalize ours so argmax matches
        # the direction-normalized native expression
        c = np.asarray(centroids, dtype=np.float64)
        c = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
        probes = _nearest_centroids_udf(c, 1)
        cl = probes(v).getItem(0)
        return df.select(F.col(id_col), v.alias(vec_col), cl.alias("cluster"))
    # native path: centroids as broadcast data (codegen-cache shape)
    return _assign_via_broadcast(
        df.select(F.col(id_col), v.alias(vec_col)), centroids, id_col, vec_col
    )


def semantic_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    centroids: list[list[float]] | str = "kmeans",
    k_clusters: int = 8,
    max_cluster_size: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Within-cluster near-duplicate pairs: (id_a, id_b, cluster, cosine)
    with id_a < id_b and cosine ≥ threshold.

    ``centroids`` is either an explicit list (portable path) or
    ``"kmeans"`` (paper path; bounded-sample k-means from similarity.py).
    ``max_cluster_size`` skips clusters above the cap — the hot-bucket
    guard; at scale the capped clusters are the low-information regions
    (same rationale as ``embedding_near_duplicates.max_bucket_size``)."""
    if centroids == "kmeans":
        from tube_spark.operators.similarity import _kmeans_centroids

        centroids = [
            list(map(float, c))
            for c in _kmeans_centroids(df, vec_col, k_clusters, 5, seed)
        ]
    a = assign_clusters(df, centroids, id_col, vec_col)
    if max_cluster_size is not None:
        sizes = a.groupBy("cluster").agg(F.count(F.lit(1)).alias("_cs"))
        a = a.join(sizes.filter(F.col("_cs") <= max_cluster_size), "cluster").drop(
            "_cs"
        )
    x = a.select(
        F.col("cluster"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
    )
    y = a.select(
        F.col("cluster"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
    )
    return (
        x.join(y, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine(F.col("vec_a"), F.col("vec_b")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cluster", F.round("cosine", 6).alias("cosine"))
    )


def semdedup_report(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    centroids: list[list[float]] | str = "kmeans",
    k_clusters: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Per-document semantic-dedup verdict:
    (id, cluster, cluster_size, n_near_dups, is_kept).

    ``is_kept`` = no lower-id neighbor at ≥ threshold in the cluster —
    i.e. the document does not appear as ``id_b`` of any pair.  The
    verdict join is a broadcast-friendly left join on the (small
    relative to the corpus) dropped-id set; cluster sizes reuse the
    assignment's cluster partitioning."""
    if centroids == "kmeans":
        from tube_spark.operators.similarity import _kmeans_centroids

        centroids = [
            list(map(float, c))
            for c in _kmeans_centroids(df, vec_col, k_clusters, 5, seed)
        ]
    a = assign_clusters(df, centroids, id_col, vec_col).cache()
    # materialize BEFORE building consumers (the minhash_lsh_pairs
    # stampede fix): the cached assignment feeds the sizes branch, the
    # final join, AND — via CacheManager plan-matching — both self-join
    # sides inside semantic_duplicates; un-materialized, each branch
    # recomputes the full assignment concurrently at action time.
    a.count()
    pairs = semantic_duplicates(
        df, id_col, vec_col, threshold, centroids=centroids
    ).cache()
    # same: pairs fans out into the neighbors union (2 branches) and
    # the dropped-id set — one materialization, three cache readers.
    pairs.count()
    sizes = a.groupBy("cluster").agg(F.count(F.lit(1)).alias("cluster_size"))
    neighbors = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionAll(pairs.select(F.col("id_b").alias(id_col)))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_near_dups"))
    )
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct().withColumn(
        "_dropped", F.lit(True)
    )
    return (
        a.join(sizes, "cluster")
        .join(neighbors, id_col, "left")
        .join(dropped, id_col, "left")
        .select(
            F.col(id_col),
            "cluster",
            "cluster_size",
            F.coalesce("n_near_dups", F.lit(0)).alias("n_near_dups"),
            F.coalesce(~F.col("_dropped"), F.lit(True)).alias("is_kept"),
        )
    )
