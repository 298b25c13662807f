"""Recall floors for the approximate similarity indexes.

The LSH / IVF / near-dup queries are approximate by design, so the
driver's oracle compare can only count their rows.  These tests close
that gap: measure recall against the exact brute-force result and
assert a floor.  The test embeddings are effectively random vectors
(avg pairwise cosine ≈ 0), which is the *hard* case for both indexes —
real embedding corpora are clustered and recall there is strictly
higher.  Seeds are fixed, so the measured values are deterministic.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.similarity import (
    cosine_topk,
    embedding_near_duplicates,
    exact_near_pairs,
    ivf_topk,
    pair_recall,
    rhp_lsh_topk,
    topk_recall,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        )
        .cache()
    )
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def exact_topk(spark, emb):
    q = emb.filter(F.col("vec_id") < 5)
    return cosine_topk(emb, q, k=10).cache()


def _macro_recall(exact, approx) -> float:
    return topk_recall(exact, approx).agg(F.avg("recall")).collect()[0][0]


def test_lsh_topk_recall(spark, emb, exact_topk):
    q = emb.filter(F.col("vec_id") < 5)
    approx = rhp_lsh_topk(emb, q, dim=64, k=10, bits=32, bands=8)
    assert _macro_recall(exact_topk, approx) >= 0.6  # measured 0.72


def test_ivf_topk_recall(spark, emb, exact_topk):
    q = emb.filter(F.col("vec_id") < 5)
    approx = ivf_topk(emb, q, k=10, n_clusters=16, nprobe=4)
    assert _macro_recall(exact_topk, approx) >= 0.4  # measured 0.56


def test_near_dup_pair_recall(spark, emb):
    exact = exact_near_pairs(emb, threshold=0.3)
    approx = embedding_near_duplicates(emb, threshold=0.3, bits=32, bands=8)
    row = pair_recall(exact, approx).collect()[0]
    assert row.n_exact > 0  # threshold 0.3 is in the tail but non-empty
    assert row.recall >= 0.5
    # every returned pair must be a true positive (cosine really ≥ θ):
    # approx ⊆ exact, so precision is 1.0 by construction — verify it.
    extra = approx.join(exact, ["id_a", "id_b"], "left_anti").count()
    assert extra == 0
