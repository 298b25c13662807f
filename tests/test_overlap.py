"""KMV corpus-overlap sketches: exactness, estimator accuracy, and the
threshold pre-filter's no-loss property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.overlap import (
    corpus_overlap,
    kmv_minima,
    kmv_overlap_stats,
)


def _elements(spark, pairs):
    return spark.createDataFrame(pairs, "corpus string, element string")


def test_small_corpus_is_exact(spark):
    """Below k distinct elements the sketch IS the set: estimates are
    exact and Jaccard is the true Jaccard."""
    a = {f"w{i}" for i in range(40)}
    b = {f"w{i}" for i in range(20, 70)}  # |A∩B|=20, |A∪B|=70
    el = _elements(
        spark,
        [("a", x) for x in a] + [("b", x) for x in b]
        + [("a", "w0"), ("b", "w25")],  # duplicates must not matter
    )
    row = corpus_overlap(el, "a", "b", k=256).collect()[0]
    assert row["n_a_est"] == 40.0
    assert row["n_b_est"] == 50.0
    assert row["n_union_est"] == 70.0
    assert row["jaccard_est"] == pytest.approx(20 / 70)
    assert row["n_intersection_est"] == pytest.approx(20.0)


def test_estimator_accuracy_above_k(spark):
    """Well above k, estimates land within the KMV error envelope
    (~1/sqrt(k); generous 3x bound here)."""
    n, k = 20000, 256
    a = [("a", f"tok{i}") for i in range(n)]
    b = [("b", f"tok{i}") for i in range(n // 2, n + n // 2)]  # 50% overlap
    row = corpus_overlap(_elements(spark, a + b), "a", "b", k=k).collect()[0]
    tol = 3.0 / (k ** 0.5)
    assert row["n_a_est"] == pytest.approx(n, rel=tol)
    assert row["n_b_est"] == pytest.approx(n, rel=tol)
    assert row["n_union_est"] == pytest.approx(1.5 * n, rel=tol)
    # true Jaccard = (n/2) / (3n/2) = 1/3
    assert row["jaccard_est"] == pytest.approx(1 / 3, abs=3 * tol)


def test_threshold_filter_loses_no_minimum(spark):
    """The 8x-margin pre-filter must return the SAME minima as the
    unfiltered exact k smallest distinct hashes."""
    from tube_spark.functions.text import portable_hash60

    el = _elements(spark, [("a", f"elem{i}") for i in range(5000)])
    got = {
        r["corpus"]: r["minima"] for r in kmv_minima(el, k=64).collect()
    }
    exact = [
        r["h"]
        for r in el.select(portable_hash60(F.col("element")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(64)
        .collect()
    ]
    assert got["a"] == exact


def test_disjoint_and_identical_corpora(spark):
    el = _elements(
        spark,
        [("a", f"x{i}") for i in range(500)]
        + [("b", f"y{i}") for i in range(500)]
        + [("c", f"x{i}") for i in range(500)],
    )
    disjoint = corpus_overlap(el, "a", "b", k=128).collect()[0]
    assert disjoint["jaccard_est"] == 0.0
    assert disjoint["n_intersection_est"] == 0.0
    same = corpus_overlap(el, "a", "c", k=128).collect()[0]
    assert same["jaccard_est"] == 1.0


def test_stats_pure_math():
    """Driver-side estimator unit facts: k-th-minimum formula and the
    union sketch truncation."""
    k = 4
    space = float(1 << 60)
    a = [int(space * f) for f in (0.01, 0.02, 0.03, 0.04)]
    b = [int(space * f) for f in (0.01, 0.02, 0.05, 0.06)]
    s = kmv_overlap_stats(a, b, k)
    # union minima = .01 .02 .03 .04; shared (in both sketches) = .01 .02
    assert s["jaccard_est"] == pytest.approx(0.5)
    assert s["n_a_est"] == pytest.approx((k - 1) * space / a[-1], rel=1e-12)


def test_fast_hash_variant_accuracy(spark):
    """The xxhash64 fast-hash path (100 TB CPU lever) keeps the same
    estimator guarantees — accuracy envelope identical to portable."""
    n, k = 20000, 256
    a = [("a", f"tok{i}") for i in range(n)]
    b = [("b", f"tok{i}") for i in range(n // 2, n + n // 2)]
    row = corpus_overlap(
        _elements(spark, a + b), "a", "b", k=k, fast_hash=True
    ).collect()[0]
    tol = 3.0 / (k ** 0.5)
    assert row["n_a_est"] == pytest.approx(n, rel=tol)
    assert row["n_union_est"] == pytest.approx(1.5 * n, rel=tol)
    assert row["jaccard_est"] == pytest.approx(1 / 3, abs=3 * tol)
    # hash space really is [0, 2^60): minima are non-negative and small
    from tube_spark.operators.overlap import kmv_minima

    m = kmv_minima(_elements(spark, a), k=16, fast_hash=True).collect()[0]
    assert all(0 <= h < (1 << 60) for h in m["minima"])


def test_kmv_plan_shape(spark):
    """Sketch pass stays JVM-side and reads one pruned scan: no Python
    stages, shingle derivation fused, survivors (not the corpus) enter
    the distinct exchange."""
    from pyspark.sql import functions as F2

    from tube_spark.functions.text import tokens, word_shingles
    from tube_spark.operators.overlap import kmv_minima

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    el = docs.select(
        F2.when(F2.col("doc_id") % 2 == 0, F2.lit("even"))
        .otherwise(F2.lit("odd"))
        .alias("corpus"),
        F2.explode(word_shingles(tokens(F2.col("text")), 2)).alias("element"),
    )
    plan = kmv_minima(el, k=64)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    import re

    scans = re.findall(r"ReadSchema: struct<[^>]*>", plan)
    assert scans and all(
        "doc_id" in s and "text" in s and "embedding" not in s for s in scans
    ), scans
    # the threshold filter sits below the distinct exchange: the Filter
    # on h appears in the plan before (deeper than) any Exchange
    assert plan.count("Exchange") <= 3  # distinct + window partition (+AQE read)


def test_overlap_matrix_three_corpora(spark):
    """One sketch pass, C(3,2) pairwise rows, estimates consistent
    with the pairwise corpus_overlap calls."""
    from tube_spark.operators.overlap import overlap_matrix

    el = _elements(
        spark,
        [("a", f"x{i}") for i in range(300)]
        + [("b", f"x{i}") for i in range(150, 450)]   # 50% with a
        + [("c", f"z{i}") for i in range(300)],       # disjoint
    )
    mx = {
        (r["corpus_a"], r["corpus_b"]): r
        for r in overlap_matrix(el, k=128).collect()
    }
    assert set(mx) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = corpus_overlap(el, "a", "b", k=128).collect()[0]
    assert mx[("a", "b")]["jaccard_est"] == ab["jaccard_est"]
    assert mx[("a", "b")]["n_union_est"] == ab["n_union_est"]
    assert mx[("a", "c")]["jaccard_est"] == 0.0
    assert mx[("b", "c")]["jaccard_est"] == 0.0
