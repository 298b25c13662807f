"""Containment detection and PSI distribution drift."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.dedup import ngram_containment_pairs
from tube_spark.operators.profile import psi_drift


def test_containment_asymmetry(spark):
    short = "the quick brown fox jumps over the lazy dog"
    long = short + " while ten other animals watch from a very tall green hill nearby today"
    rows = [(1, long), (2, short), (3, "completely unrelated words about spark engines")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["id_a"], r["id_b"]): r
        for r in ngram_containment_pairs(df, "doc_id", "text", n=3, threshold=0.8).collect()
    }
    pair = out[(1, 2)]
    # every trigram of the short doc appears in the long one
    assert pair["containment_b_in_a"] == 1.0
    assert pair["containment_a_in_b"] < 0.6  # long doc NOT contained in short
    assert pair["jaccard"] < 0.8  # resemblance alone would have missed it
    assert not any(3 in k for k in out)  # unrelated doc pairs with nobody


def test_containment_matches_python(spark):
    docs = {
        1: "a b c d e f g h",
        2: "c d e f g h i j",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")

    def tri(t):
        w = t.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    s1, s2 = tri(docs[1]), tri(docs[2])
    inter = len(s1 & s2)
    got = ngram_containment_pairs(df, "doc_id", "text", n=3, threshold=0.1).collect()[0]
    assert got["containment_a_in_b"] == round(inter / len(s1), 6)
    assert got["containment_b_in_a"] == round(inter / len(s2), 6)
    assert got["jaccard"] == round(inter / len(s1 | s2), 6)


def test_psi_identical_zero_and_shift_positive(spark):
    base = spark.range(10000).select((F.col("id") % 100).cast("double").alias("v"))
    out = psi_drift(base, base, "v", 0, 100, bins=10).collect()[0]
    assert out["psi"] == 0.0 and out["n_old"] == out["n_new"] == 10000

    shifted = base.select((F.col("v") + 30).alias("v"))  # mass moves up
    drift = psi_drift(base, shifted, "v", 0, 100, bins=10).collect()[0]
    assert drift["psi"] > 0.25  # "action" territory for a 30-point shift
    assert drift["top_bin"] is not None


def test_psi_matches_python(spark):
    old = spark.createDataFrame([(float(v),) for v in [1, 1, 2, 5, 9]], "v double")
    new = spark.createDataFrame([(float(v),) for v in [1, 8, 8, 9, 9, 9]], "v double")
    got = psi_drift(old, new, "v", 0, 10, bins=5, epsilon=1e-6).collect()[0]

    def hist(vals):
        h = [0] * 5
        for v in vals:
            h[min(max(int((v - 0) / 2.0), 0), 4)] += 1
        return h

    ho, hn = hist([1, 1, 2, 5, 9]), hist([1, 8, 8, 9, 9, 9])
    psi = 0.0
    for o, n in zip(ho, hn):
        p_raw, q_raw = o / 5, n / 6
        # mirror the operator: raw ratios in the difference, epsilon
        # floor only inside the log
        psi += (q_raw - p_raw) * math.log(
            max(q_raw, 1e-6) / max(p_raw, 1e-6)
        )
    assert got["psi"] == pytest.approx(round(psi, 6), abs=2e-6)
