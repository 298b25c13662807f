"""c-TF-IDF cluster labeling."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.topics import cluster_terms


@pytest.fixture(scope="module")
def clustered(spark):
    rows = [
        (0, "spark engine shuffle spark plan"),
        (0, "spark catalyst plan"),
        (1, "banana smoothie recipe banana"),
        (1, "smoothie blender recipe"),
        (2, "the the the the"),  # common-term cluster
    ]
    return spark.createDataFrame(rows, "cluster long, text string")


def test_distinctive_terms_float_up(spark, clustered):
    out = cluster_terms(clustered, "cluster", top_k=2).collect()
    top = {(r["cluster"], r["rank"]): r["term"] for r in out}
    assert top[(0, 1)] == "spark"
    assert top[(1, 1)] in ("banana", "recipe", "smoothie")
    assert all(r["rank"] <= 2 for r in out)


def test_matches_python_reference(spark, clustered):
    docs = [
        (0, "spark engine shuffle spark plan"),
        (0, "spark catalyst plan"),
        (1, "banana smoothie recipe banana"),
        (1, "smoothie blender recipe"),
        (2, "the the the the"),
    ]
    tf: dict = {}
    dfreq: dict = {}
    cluster_tokens: dict = {}
    for c, t in docs:
        for w in t.split():
            tf[(c, w)] = tf.get((c, w), 0) + 1
            dfreq[w] = dfreq.get(w, 0) + 1
            cluster_tokens[c] = cluster_tokens.get(c, 0) + 1
    A = sum(cluster_tokens.values()) / len(cluster_tokens)
    want = {
        (c, w): round(n * math.log(1.0 + A / dfreq[w]), 6)
        for (c, w), n in tf.items()
    }
    got = {
        (r["cluster"], r["term"]): r["score"]
        for r in cluster_terms(clustered, "cluster", top_k=100).collect()
    }
    for k, v in got.items():
        assert v == pytest.approx(want[k], abs=1e-6)


def test_validation(clustered):
    with pytest.raises(ValueError, match="top_k"):
        cluster_terms(clustered, "cluster", top_k=0)
