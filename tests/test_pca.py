"""Distributed PCA: moment-pass exactness, eigen parity with numpy,
map-only JVM transform, whitening, and the quantized Gram oracle twin."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tube_spark.operators.pca import PCAModel, gram_matrix, pca_fit, pca_transform

SF = "/root/testdata/sf0.001"
DIM = 64


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")


@pytest.fixture(scope="module")
def X(emb):
    rows = emb.orderBy("vec_id").collect()
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def test_fit_matches_numpy_eigh(emb, X):
    model = pca_fit(emb, dim=DIM, k=8)
    assert model.n == len(X)
    cov = np.cov(X, rowvar=False, ddof=1)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1][:8]
    assert np.allclose(model.eigenvalues, evals, rtol=1e-8)
    assert np.allclose(model.mean, X.mean(axis=0), rtol=1e-9, atol=1e-12)
    # components span the same directions (dot with numpy eigvecs = ±1)
    _, vecs = np.linalg.eigh(cov)
    top = vecs[:, np.argsort(np.linalg.eigvalsh(cov))[::-1][:8]].T
    dots = np.abs(np.sum(np.array(model.components) * top, axis=1))
    assert np.allclose(dots, 1.0, atol=1e-6)
    # orthonormal
    C = np.array(model.components)
    assert np.allclose(C @ C.T, np.eye(8), atol=1e-9)


def test_fit_partitioning_invariant(emb):
    m1 = pca_fit(emb.repartition(17), dim=DIM, k=4)
    m2 = pca_fit(emb.coalesce(1), dim=DIM, k=4)
    assert np.allclose(m1.eigenvalues, m2.eigenvalues, rtol=1e-9)
    assert np.allclose(m1.components, m2.components, atol=1e-9)


def test_transform_matches_numpy(emb, X):
    model = pca_fit(emb, dim=DIM, k=8)
    got = {
        r["vec_id"]: np.array(r["pca"])
        for r in pca_transform(emb, model).collect()
    }
    W = np.array(model.components)
    want = (X - np.array(model.mean)) @ W.T
    out = np.array([got[i] for i in sorted(got)])
    assert np.allclose(out, want, atol=1e-9)
    # projected variance per component equals the eigenvalue
    var = out.var(axis=0, ddof=1)
    assert np.allclose(var, model.eigenvalues, rtol=1e-6)


def test_whiten_identity_covariance(emb):
    model = pca_fit(emb, dim=DIM, k=6)
    out = np.array(
        [r["pca"] for r in pca_transform(emb, model, whiten=True).collect()]
    )
    cov = np.cov(out, rowvar=False, ddof=1)
    assert np.allclose(cov, np.eye(6), atol=1e-4)


def test_reconstruction_error_decreases_with_k(emb, X):
    errs = []
    for k in (2, 8, 32):
        m = pca_fit(emb, dim=DIM, k=k)
        W = np.array(m.components)
        Xc = X - np.array(m.mean)
        err = np.linalg.norm(Xc - (Xc @ W.T) @ W)
        errs.append(err)
    assert errs[0] > errs[1] > errs[2]
    ratios = pca_fit(emb, dim=DIM, k=DIM).explained_variance_ratio()
    assert abs(sum(ratios) - 1.0) < 1e-9


def test_transform_is_jvm_side_map_only(emb):
    model = pca_fit(emb, dim=DIM, k=4)
    plan = (
        pca_transform(emb, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # map-only


def test_gram_matrix_exact_integers(emb, X):
    got = {
        (r["i"], r["j"]): r["s_q"] for r in gram_matrix(emb, dim=DIM).collect()
    }
    Xq = np.floor(X * 10000.0 + 0.5).astype(np.int64)
    G = Xq.T @ Xq
    iu = np.triu_indices(DIM)
    want = {(int(i), int(j)): int(G[i, j]) for i, j in zip(*iu)}
    assert got == want


def test_fit_validation(emb, spark):
    with pytest.raises(ValueError, match="k must be"):
        pca_fit(emb, dim=DIM, k=0)
    one = spark.createDataFrame([(1, [0.0] * DIM)], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="at least 2"):
        pca_fit(one, dim=DIM, k=2)


def test_full_rank_transform_is_isometry(emb, X):
    """k=dim PCA is an orthogonal rotation: pairwise L2 distances are
    preserved, so any distance-based downstream (PQ, ANN, near-dup)
    composed on rotated vectors searches the SAME neighbor structure.
    (On these isotropic synthetic embeddings rotation does not improve
    PQ recall — measured 0.52 vs 0.54 plain, BENCH_NOTES r8 — the
    invariant worth pinning is that it cannot CHANGE the answers.)"""
    model = pca_fit(emb, dim=DIM, k=DIM)
    out = {
        r["vec_id"]: np.array(r["pca"])
        for r in pca_transform(emb, model).collect()
    }
    Y = np.array([out[i] for i in sorted(out)])
    for a, b in [(0, 1), (3, 400), (17, 171)]:
        da = np.linalg.norm(X[a] - X[b])
        db = np.linalg.norm(Y[a] - Y[b])
        assert abs(da - db) < 1e-9
