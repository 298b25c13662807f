"""SemDeDup (operators/semdedup.py): portable + k-means paths.

The portable-centroid pipeline is oracle-verified end-to-end by the
``semantic_dedup`` extras query (tests/test_extra_queries.py); here we
pin the operator-level invariants and the k-means (paper) path, which
is approximate across cluster borders and therefore recall-measured
against the exact all-pairs baseline rather than hash-matched.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tube_spark.operators.semdedup import (
    assign_clusters,
    lattice_centroids,
    semantic_duplicates,
    semdedup_report,
)
from tube_spark.operators.similarity import exact_near_pairs

SF = "/root/testdata/sf0.001"
TAU = 0.4


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )


def test_pairs_subset_of_exact(spark):
    """Every within-cluster pair the operator reports is a true
    ≥-threshold pair (no false positives, regardless of centroids)."""
    emb = _emb(spark)
    exact = {
        (r.id_a, r.id_b) for r in exact_near_pairs(emb, threshold=TAU).collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in semantic_duplicates(
            emb, threshold=TAU, centroids=lattice_centroids(8, 64)
        ).collect()
    }
    assert got <= exact
    assert got  # non-trivial at this threshold


def test_kmeans_path_recall(spark):
    """The paper's k-means quantizer: measured recall of within-cluster
    pairs vs the exact baseline, floor-asserted.  Missing pairs are the
    documented price of cluster-border blindness (the paper accepts it;
    fewer clusters -> higher recall, more -> cheaper stage 2)."""
    emb = _emb(spark)
    exact = {
        (r.id_a, r.id_b) for r in exact_near_pairs(emb, threshold=TAU).collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in semantic_duplicates(
            emb, threshold=TAU, centroids="kmeans", k_clusters=4
        ).collect()
    }
    assert got <= exact
    recall = len(got) / len(exact)
    assert recall >= 0.25, f"kmeans within-cluster pair recall {recall:.2f}"


def test_verdict_matches_pairs(spark):
    """is_kept <=> the doc has no lower-id near-dup in its cluster, and
    n_near_dups counts both directions."""
    emb = _emb(spark)
    cent = lattice_centroids(8, 64)
    pairs = semantic_duplicates(emb, threshold=TAU, centroids=cent).collect()
    rep = {r.vec_id: r for r in semdedup_report(
        emb, threshold=TAU, centroids=cent
    ).collect()}
    dropped = {p.id_b for p in pairs}
    counts: dict[int, int] = {}
    for p in pairs:
        counts[p.id_a] = counts.get(p.id_a, 0) + 1
        counts[p.id_b] = counts.get(p.id_b, 0) + 1
    assert len(rep) == emb.count()
    for vid, r in rep.items():
        assert r.is_kept == (vid not in dropped)
        assert r.n_near_dups == counts.get(vid, 0)


def test_assignment_deterministic_and_arrow_equivalent(spark):
    """Native argmax assignment is stable across runs and the Arrow
    (numpy matmul) kernel assigns identically on the same centroids."""
    emb = _emb(spark)
    cent = lattice_centroids(8, 64)
    a1 = {r.vec_id: r.cluster for r in assign_clusters(emb, cent).collect()}
    a2 = {r.vec_id: r.cluster for r in assign_clusters(emb, cent).collect()}
    a3 = {
        r.vec_id: r.cluster
        for r in assign_clusters(emb, cent, use_arrow=True).collect()
    }
    assert a1 == a2 == a3


def test_max_cluster_size_cap(spark):
    """Hot-cluster guard: a cap below every cluster size yields no pairs
    (all clusters skipped), and a generous cap changes nothing."""
    emb = _emb(spark)
    cent = lattice_centroids(8, 64)
    assert (
        semantic_duplicates(
            emb, threshold=TAU, centroids=cent, max_cluster_size=1
        ).count()
        == 0
    )
    full = semantic_duplicates(emb, threshold=TAU, centroids=cent).count()
    capped = semantic_duplicates(
        emb, threshold=TAU, centroids=cent, max_cluster_size=10**6
    ).count()
    assert full == capped


def test_broadcast_argmax_equals_literal_form(spark):
    """Float-identity of the broadcast-centroid assignment (r6) vs the
    literal argmax the DuckDB oracle replays."""
    from pyspark.sql import functions as F

    from tube_spark.operators.semdedup import (
        _argmax_cluster,
        _assign_via_broadcast,
        lattice_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cents = lattice_centroids(8, 64)
    lit = {
        r["vec_id"]: r["c"]
        for r in emb.select(
            "vec_id", _argmax_cluster(F.col("embedding"), cents).alias("c")
        ).collect()
    }
    bc = {
        r["vec_id"]: r["cluster"]
        for r in _assign_via_broadcast(emb, cents, "vec_id", "embedding").collect()
    }
    assert lit == bc
