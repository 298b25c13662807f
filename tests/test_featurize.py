"""Hashed n-gram features: reference math, density, vector-op interop."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tube_spark.functions.text import portable_hash60
from tube_spark.operators.featurize import (
    hashed_ngram_features,
    hashed_ngram_features_sparse,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat"),
        (3, "completely different words entirely here"),
        (4, ""),  # no n-grams
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_features(spark, text, dim=64, seed="feat"):
    words = [w for w in "".join(c if c.isalpha() else " " for c in text.lower()).split() if w]
    grams = [f"{a} {b}" for a, b in zip(words, words[1:])]
    hashes = {
        g: r["h"]
        for g, r in zip(
            grams,
            spark.createDataFrame([(g,) for g in grams], "g string")
            .select(portable_hash60(F.concat(F.lit(seed), F.col("g"))).alias("h"))
            .collect(),
        )
    } if grams else {}
    vec = [0.0] * dim
    for g in grams:
        h = hashes[g]
        vec[h % dim] += -1.0 if (h // dim) % 2 == 1 else 1.0
    nrm = math.sqrt(sum(v * v for v in vec))
    return [v / nrm if nrm else 0.0 for v in vec]


def test_sparse_matches_reference(spark, docs):
    got = {
        (r["doc_id"], r["idx"]): r["val"]
        for r in hashed_ngram_features_sparse(docs).collect()
    }
    want_vec = _py_features(spark, "the cat sat on the mat")
    for idx, v in enumerate(want_vec):
        if v != 0.0:
            assert got[(1, idx)] == pytest.approx(round(v, 6), abs=1e-6)
    assert not any(d == 4 for d, _ in got)  # empty doc emits nothing


def test_dense_assembly_and_norm(spark, docs):
    out = {r["doc_id"]: r["embedding"] for r in hashed_ngram_features(docs).collect()}
    assert len(out) == 4 and all(len(v) == 64 for v in out.values())
    assert sum(x * x for x in out[1]) == pytest.approx(1.0, abs=1e-4)
    assert out[4] == [0.0] * 64  # empty doc -> zero vector
    # similar docs closer than dissimilar ones
    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        da, db = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(x * x for x in b))
        return num / (da * db) if da and db else 0.0
    assert cos(out[1], out[2]) > cos(out[1], out[3])


def test_interop_with_vector_ops(spark):
    """documents → hashed features → exact cosine top-k end to end."""
    from tube_spark.operators.similarity import cosine_topk

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(100)
    vecs = hashed_ngram_features(docs, dim=32).withColumnRenamed("doc_id", "vec_id")
    queries = vecs.filter(F.col("vec_id") < 3)
    out = cosine_topk(vecs, queries, k=5, vec_col="embedding")
    assert out.count() > 0


def test_validation(docs):
    with pytest.raises(ValueError, match="dim must be positive"):
        hashed_ngram_features_sparse(docs, dim=0)
