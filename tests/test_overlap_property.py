"""Property test: the KMV estimator stays inside the Beyer et al.
error envelope for randomized corpus sizes and overlap fractions.

Runs entirely driver-side: element sets are synthesized in Python,
hashed with the SAME md5-derived 60-bit hash as ``portable_hash60``
(pinned against the Spark expression in test_overlap.py's exactness
tests), and fed through ``kmv_overlap_stats`` — so a future hash-space
or truncation regression (e.g. taking 16 hex digits, or losing the
distinct-before-top-k step) shifts the estimates outside the envelope
and fails here even though the fixed-seed accuracy tests might still
pass by luck.

Envelope (Beyer et al., SIGMOD 2007): the distinct-count estimator's
relative error concentrates at ~1/sqrt(k-2); the Jaccard estimator is
a proportion over the k union minima, std ~ sqrt(J(1-J)/k).  We assert
6-sigma bounds per draw (derandomized hypothesis => deterministic,
no flake budget), plus exactness whenever a corpus is below k.
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings, strategies as st

from tube_spark.operators.overlap import _kmv_estimate, kmv_overlap_stats

K = 256
SPACE = float(1 << 60)


def _h60(s: str) -> int:
    """Python twin of functions.text.portable_hash60 (15 md5 hex digits)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _minima(elements, k=K):
    return sorted({_h60(e) for e in elements})[:k]


@settings(max_examples=25, deadline=None, derandomize=True)
@given(
    n_a=st.integers(min_value=2000, max_value=40000),
    n_shared_frac=st.floats(min_value=0.0, max_value=1.0),
    size_ratio=st.floats(min_value=0.25, max_value=4.0),
    salt=st.integers(min_value=0, max_value=9),
)
def test_kmv_envelope_random_overlaps(n_a, n_shared_frac, size_ratio, salt):
    n_b = max(2000, int(n_a * size_ratio))
    n_shared = int(min(n_a, n_b) * n_shared_frac)
    shared = [f"s{salt}_{i}" for i in range(n_shared)]
    a = shared + [f"a{salt}_{i}" for i in range(n_a - n_shared)]
    b = shared + [f"b{salt}_{i}" for i in range(n_b - n_shared)]
    stats = kmv_overlap_stats(_minima(a), _minima(b), K)

    rel = 6.0 / math.sqrt(K - 2)  # 6-sigma distinct-count envelope
    assert abs(stats["n_a_est"] - n_a) <= rel * n_a
    assert abs(stats["n_b_est"] - n_b) <= rel * n_b
    n_union = n_a + n_b - n_shared
    assert abs(stats["n_union_est"] - n_union) <= rel * n_union

    j = n_shared / n_union
    sigma_j = math.sqrt(max(j * (1 - j), 1.0 / K) / K)
    # Jaccard proportion envelope + the union-estimate error it rides on
    assert abs(stats["jaccard_est"] - j) <= 6.0 * sigma_j
    assert abs(stats["n_intersection_est"] - n_shared) <= (
        6.0 * sigma_j * n_union + rel * n_union * max(j, 0.05)
    )


@settings(max_examples=15, deadline=None, derandomize=True)
@given(
    n_a=st.integers(min_value=1, max_value=K // 2 - 1),
    n_b=st.integers(min_value=1, max_value=K // 2 - 1),
    shared=st.integers(min_value=0, max_value=K - 1),
    salt=st.integers(min_value=0, max_value=9),
)
def test_kmv_exact_below_k(n_a, n_b, shared, salt):
    """While the UNION stays below k the sketch IS the set: every
    estimate is exact (sizes capped at k/2-1 so n_a + n_b < k; at
    union >= k the estimator correctly switches to the k-th-minimum
    formula and only the envelope test applies)."""
    n_shared = min(shared, n_a, n_b)
    sh = [f"s{salt}_{i}" for i in range(n_shared)]
    a = sh + [f"a{salt}_{i}" for i in range(n_a - n_shared)]
    b = sh + [f"b{salt}_{i}" for i in range(n_b - n_shared)]
    stats = kmv_overlap_stats(_minima(a), _minima(b), K)
    assert stats["n_a_est"] == float(n_a)
    assert stats["n_b_est"] == float(n_b)
    n_union = n_a + n_b - n_shared
    assert stats["n_union_est"] == float(n_union)
    assert math.isclose(stats["jaccard_est"], n_shared / n_union)
    assert math.isclose(stats["n_intersection_est"], float(n_shared))


def test_python_hash_twin_matches_expression(spark):
    """The Python _h60 twin used above really is portable_hash60."""
    from pyspark.sql import functions as F

    from tube_spark.functions.text import portable_hash60

    words = [f"probe{i}" for i in range(64)]
    got = {
        r["w"]: r["h"]
        for r in spark.createDataFrame([(w,) for w in words], "w string")
        .select("w", portable_hash60(F.col("w")).alias("h"))
        .collect()
    }
    assert got == {w: _h60(w) for w in words}


def test_estimate_monotone_in_kth_minimum():
    """_kmv_estimate regression guard: smaller k-th minimum => larger
    corpus estimate; exact length below k."""
    base = [int(SPACE * (i + 1) / 1000.0) for i in range(K)]
    bigger_corpus = [h // 2 for h in base]
    assert _kmv_estimate(bigger_corpus, K) > _kmv_estimate(base, K)
    assert _kmv_estimate(base[: K - 5], K) == K - 5
