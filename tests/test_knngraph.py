"""NN-descent kNN graph: recall floors vs the exact graph (clustered +
uniform-random hard case), monotone convergence, exact degree,
determinism across layouts."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tube_spark.operators.knngraph import nn_descent
from tube_spark.operators.similarity import cosine_topk, topk_recall

SF = "/root/testdata/sf0.001"


def _recall(exact, g):
    return topk_recall(exact, g).agg(F.avg("recall")).first()[0]


@pytest.fixture(scope="module")
def blobs(spark):
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(10, 16)) * 5
    rows = [
        (i, (centers[i % 10] + rng.normal(size=16) * 0.3).tolist())
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def rand_emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )


def test_clustered_recall_floor(spark, blobs):
    exact = cosine_topk(blobs, blobs, k=5)
    assert _recall(exact, nn_descent(blobs, k=5, iters=3)) >= 0.9
    # measured 0.984 — descent finds cluster-mates via their neighbors


def test_uniform_random_monotone_convergence(spark, rand_emb):
    """The hard case: uniform random 64-dim vectors, no cluster
    structure to exploit.  Measured trajectory 0.13 -> 0.36 -> 0.62 ->
    0.76 over iters 0..3 — each round must improve, and iters=3 must
    clear the same 0.6 floor the LSH index is held to."""
    exact = cosine_topk(rand_emb, rand_emb, k=10)
    r = [
        _recall(exact, nn_descent(rand_emb, k=10, iters=i)) for i in (0, 2, 3)
    ]
    assert r[0] < r[1] < r[2]
    assert r[2] >= 0.6


def test_exact_degree_and_rank_shape(spark, blobs):
    g = nn_descent(blobs, k=5, iters=1)
    deg = g.groupBy("query_id").agg(F.count(F.lit(1)).alias("d")).collect()
    assert len(deg) == 300 and all(r["d"] == 5 for r in deg)
    ranks = g.groupBy("query_id").agg(
        F.sort_array(F.collect_list("rank")).alias("rs")
    )
    assert all(r["rs"] == [1, 2, 3, 4, 5] for r in ranks.collect())


def test_deterministic_across_layouts(spark, blobs):
    a = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in nn_descent(blobs, k=5, iters=2).collect()
    }
    b = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in nn_descent(blobs.repartition(13), k=5, iters=2).collect()
    }
    assert a == b


def test_small_corpus_degenerate(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    g = nn_descent(df, k=5, iters=1)  # k > n-1: everyone gets n-1
    deg = {r["query_id"]: r["d"] for r in g.groupBy("query_id").agg(F.count(F.lit(1)).alias("d")).collect()}
    assert deg == {1: 2, 2: 2, 3: 2}
