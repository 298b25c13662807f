"""IVF vector store: recall, partition pruning, append, streaming."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tube_spark.operators.similarity import cosine_topk, topk_recall
from tube_spark.operators.vectorstore import (
    append_vectors,
    build_ivf_store,
    cell_stats,
    load_centroids,
    search_store,
    store_vectors,
    streaming_vector_ingest,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def store(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "store")
    build_ivf_store(emb, path, n_clusters=8, seed=7)
    return path


def test_store_roundtrip_and_cells(spark, emb, store):
    df = store_vectors(spark, store)
    assert df.count() == emb.count()
    cs = cell_stats(spark, store).collect()
    assert sum(r["count"] for r in cs) == emb.count()
    assert 1 < len(cs) <= 8  # vectors spread over cells


def test_search_recall_floor(spark, emb, store):
    queries = emb.filter(F.col("vec_id") % 29 == 0)
    exact = cosine_topk(emb, queries, k=5)
    approx = search_store(spark, store, queries, k=5, nprobe=4)
    rec = topk_recall(exact, approx).agg(F.avg("recall")).collect()[0][0]
    assert rec >= 0.6, f"IVF store recall {rec} below floor"


def test_search_prunes_partitions(spark, emb, store):
    """The probed-cell predicate must reach the file index as a
    partition filter — unprobed cell directories are never opened."""
    queries = emb.filter(F.col("vec_id") == 0)
    df = search_store(spark, store, queries, k=5, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the partition filter carries the IN list on cell
    assert "cell" in plan.split("PartitionFilters", 1)[1][:200]


def test_append_frozen_centroids(spark, emb, tmp_path):
    """Appended vectors join existing cells under the frozen quantizer:
    store(first) + append(rest) holds exactly the same rows as a build
    over everything with the SAME centroids."""
    first = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    p_inc, p_all = str(tmp_path / "inc"), str(tmp_path / "all")
    cent = build_ivf_store(first, p_inc, n_clusters=8, seed=7)
    append_vectors(rest, p_inc)
    assert np.allclose(load_centroids(p_inc), cent)
    build_ivf_store(emb, p_all, centroids=cent)
    inc_rows = {
        (r["vec_id"], r["cell"])
        for r in store_vectors(spark, p_inc).select("vec_id", "cell").collect()
    }
    all_rows = {
        (r["vec_id"], r["cell"])
        for r in store_vectors(spark, p_all).select("vec_id", "cell").collect()
    }
    assert inc_rows == all_rows


def test_streaming_ingest_matches_batch(spark, emb, tmp_path):
    """Structured Streaming ingestion (availableNow over a file source)
    produces the same store as batch appends of the same data."""
    seed = emb.filter(F.col("vec_id") < 100)
    later = emb.filter(F.col("vec_id") >= 100)
    src = str(tmp_path / "src")
    later.write.parquet(src)

    p = str(tmp_path / "store")
    build_ivf_store(seed, p, n_clusters=8, seed=7)
    q = streaming_vector_ingest(
        spark, src, p, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    got = {
        (r["vec_id"], r["cell"])
        for r in store_vectors(spark, p).select("vec_id", "cell").collect()
    }
    p2 = str(tmp_path / "twin")
    build_ivf_store(seed, p2, n_clusters=8, seed=7)
    append_vectors(later, p2)
    want = {
        (r["vec_id"], r["cell"])
        for r in store_vectors(spark, p2).select("vec_id", "cell").collect()
    }
    assert got == want
