"""Logistic-regression classifier: real learning on separable data,
deterministic trajectories, and end-to-end corpus accuracy."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def blobs(spark):
    rng = np.random.RandomState(11)
    X0 = rng.randn(60, 3) + np.array([-2.0, 0.0, 1.0])
    X1 = rng.randn(60, 3) + np.array([2.0, 1.0, -1.0])
    rows = [
        (i, float(x[0]), float(x[1]), float(x[2]), float(y))
        for i, (x, y) in enumerate(
            [(x, 0) for x in X0] + [(x, 1) for x in X1]
        )
    ]
    return spark.createDataFrame(
        rows, schema="id long, f1 double, f2 double, f3 double, y double"
    )


def test_learns_separable_blobs(spark, blobs):
    from tube_spark.operators.classifier import logreg_score, logreg_train

    w, b = logreg_train(blobs, ["f1", "f2", "f3"], "y", lr=1.0, iters=20)
    scored = logreg_score(blobs, ["f1", "f2", "f3"], w, b)
    acc = scored.agg(
        F.avg((F.col("predicted") == F.col("y").cast("int")).cast("double"))
    ).first()[0]
    assert acc >= 0.95, acc


def test_training_deterministic(spark, blobs):
    from tube_spark.operators.classifier import logreg_train

    a = logreg_train(blobs, ["f1", "f2", "f3"], "y", lr=0.5, iters=8)
    b = logreg_train(blobs, ["f1", "f2", "f3"], "y", lr=0.5, iters=8)
    assert a == b
    assert all(x == round(x, 6) for x in a[0] + [a[1]])


def test_gradient_matches_numpy(spark, blobs):
    from tube_spark.operators.classifier import logreg_train

    pdf = blobs.toPandas()
    X, y = pdf[["f1", "f2", "f3"]].values, pdf["y"].values
    w = np.zeros(3)
    b = 0.0
    for _ in range(4):
        s = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        g = s - y
        w = np.round(w - 0.5 * (g[:, None] * X).mean(axis=0), 6)
        b = round(b - 0.5 * g.mean(), 6)
    got_w, got_b = logreg_train(blobs, ["f1", "f2", "f3"], "y", lr=0.5, iters=4)
    assert got_b == pytest.approx(b, abs=2e-6)
    assert got_w == pytest.approx(list(w), abs=2e-6)


def test_quality_classifier_corpus_accuracy(spark):
    from tube_spark.operators.classifier import quality_classifier, text_features

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    feats = text_features(F.col("text"))
    label = (feats["f_stopfrac"] > 0.05) & (feats["f_distinct"] > 0.45)
    out = quality_classifier(docs, label, lr=1.0, iters=10)
    acc = out.agg(
        F.avg((F.col("predicted") == F.col("label")).cast("double"))
    ).first()[0]
    # must beat the majority-class baseline by a clear margin
    base = out.agg(F.greatest(F.avg("label"), 1 - F.avg("label"))).first()[0]
    assert acc >= base + 0.05, (acc, base)
