"""Distributed PCA / whitening for embedding columns.

The embedding-compression step before ANN indexing or semantic dedup:
project ``array<float>`` vectors onto the top-k principal directions
(optionally whitened), shrinking every downstream shuffle and index by
dim/k while keeping the variance that matters.  PQ (operators/
quantize.py) compresses per-subspace; PCA rotates first so the
subspaces carry independent energy — the standard OPQ-lite pairing.

Scale shape (the only one that survives 100 TB):

* **Fit is ONE Arrow pass of bounded output.** Each partition's batch
  computes its Gram-matrix partial ``X^T X`` (a BLAS matmul over the
  Arrow batch), the column-sum vector, and the row count — dim*(dim+1)
  numbers per batch, independent of corpus size.  Partials reduce with
  one tiny groupBy; the dim x dim eigendecomposition runs driver-side
  (numpy, milliseconds at embedding dims) — the same
  bounded-driver-state contract as ``clustering.kmeans_fit`` and
  ``quantize.pq_train``.
* **Transform is map-only and JVM-side**: the centered projection is a
  literal-array expression (zip_with/aggregate over the broadcast
  component rows) — no Python worker, no shuffle, fuses into whatever
  plan consumes it.
* **The differential oracle works on exact integers**: parallel float
  sums cannot bit-match a SQL engine's summation order, so the oracled
  query quantizes elements to int64 (round-half-up at a fixed scale)
  and ships the EXACT quantized Gram sums — order-independent integer
  arithmetic both engines reproduce bit-for-bit (the portable-hash
  trick, applied to moments).

Reference: no PCA exists in the reference engine; this extends its
aggregation family (tube/etl/indexers/aggregation/new_translator.py
numeric reducers) to matrix moments, the way overlap.py extended it to
multiset synopses.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _moment_pass(df: DataFrame, vec_col: str, dim: int, scale: float | None):
    """One Arrow pass over the vectors: per-batch Gram partial + column
    sums + count, emitted as (i, j, s) rows (j = -1 carries the column
    sums, i = j = -1 the count) and reduced by a tiny groupBy — output
    cardinality dim*(dim+1)/2 + dim + 1, corpus-size-independent."""
    import numpy as np  # local: executors import lazily

    iu = np.triu_indices(dim)

    def part(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].values).astype(np.float64)
            if scale is not None:
                Xq = np.floor(X * scale + 0.5).astype(np.int64)
                G = (Xq.T @ Xq)[iu]
                s = Xq.sum(axis=0)
                cnt = np.array([len(pdf)], dtype=np.int64)
            else:
                G = (X.T @ X)[iu]
                s = X.sum(axis=0)
                cnt = np.array([float(len(pdf))])
            yield pd.DataFrame(
                {
                    "i": np.concatenate([iu[0], np.arange(dim), [-1]]),
                    "j": np.concatenate([iu[1], np.full(dim, -1), [-1]]),
                    "s": np.concatenate([G, s, cnt]),
                }
            )

    kind = "long" if scale is not None else "double"
    rows = (
        df.select(F.col(vec_col).alias(vec_col))
        .mapInPandas(part, schema=f"i int, j int, s {kind}")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
    )
    return rows


def gram_matrix(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64,
    quantize_scale: float = 10000.0,
) -> DataFrame:
    """The EXACT quantized second-moment sums as a queryable frame:
    one row ``(i, j, s_q)`` per upper-triangle entry (0-based, i <= j),
    where ``s_q = sum over rows of q_i * q_j`` and
    ``q = floor(double(x) * scale + 0.5)`` (round-half-up — what SQL
    ``floor(x*s + 0.5)`` computes).  Integer arithmetic end to end, so
    a DuckDB oracle reproduces every value exactly regardless of
    summation order.  Covariance is an affine function of these sums
    plus the quantized means; ``pca_fit`` uses the full-precision float
    path instead."""
    rows = _moment_pass(df, vec_col, dim, quantize_scale)
    return rows.filter(F.col("j") >= 0).select(
        F.col("i").cast("int").alias("i"),
        F.col("j").cast("int").alias("j"),
        F.col("s").cast("long").alias("s_q"),
    )


@dataclass
class PCAModel:
    mean: list[float]            # dim
    components: list[list[float]]  # k rows, each dim (orthonormal)
    eigenvalues: list[float]     # k, descending (sample covariance)
    n: int

    @property
    def k(self) -> int:
        return len(self.components)

    @property
    def dim(self) -> int:
        return len(self.mean)

    def explained_variance_ratio(self, total_variance: float | None = None):
        tot = total_variance if total_variance is not None else self._total
        if tot == 0:  # zero-variance corpus: nothing to explain
            return [0.0] * len(self.eigenvalues)
        return [ev / tot for ev in self.eigenvalues]

    _total: float = 0.0


def collect_moments(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> tuple[int, list[float], list[float]]:
    """The distributed half of a PCA fit, as plain driver state:
    ``(n, column_sums[dim], gram_upper[dim*(dim+1)/2])`` — the exactly
    the numbers a streaming twin accumulates per batch (sums are
    mergeable by addition)."""
    import numpy as np

    got = {(r["i"], r["j"]): r["s"] for r in _moment_pass(df, vec_col, dim, None).collect()}
    n = int(got.pop((-1, -1), 0))
    s = [float(got.get((i, -1), 0.0)) for i in range(dim)]
    iu = np.triu_indices(dim)
    g = [float(got.get((int(i), int(j)), 0.0)) for i, j in zip(*iu)]
    return n, s, g


def model_from_moments(
    n: int, s: list[float], g: list[float], dim: int, k: int
) -> PCAModel:
    """Driver-side finish of a fit: sample covariance
    ``(X^T X - n mu mu^T) / (n - 1)`` from the moment sums, then
    eigendecompose.  Components are sign-normalized
    (largest-|coefficient| entry positive) so fits are deterministic
    across partitionings and batch schedules."""
    import numpy as np

    if not 1 <= k <= dim:
        raise ValueError(f"k must be in [1, {dim}], got {k}")
    if n < 2:
        raise ValueError(f"PCA needs at least 2 vectors, got {n}")
    mu = np.array(s) / n
    G = np.zeros((dim, dim))
    iu = np.triu_indices(dim)
    G[iu] = g
    G = G + np.triu(G, 1).T
    cov = (G - n * np.outer(mu, mu)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)      # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T               # k x dim
    # deterministic sign: the largest-magnitude coefficient is positive
    for r in range(k):
        m = np.argmax(np.abs(comps[r]))
        if comps[r][m] < 0:
            comps[r] = -comps[r]
    model = PCAModel(
        mean=[float(x) for x in mu],
        components=[[float(x) for x in row] for row in comps],
        eigenvalues=[float(evals[i]) for i in order],
        n=n,
    )
    model._total = float(evals.sum())
    return model


def pca_fit(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64, k: int = 16,
) -> PCAModel:
    """Fit PCA on one distributed pass: collect the dim x dim moment
    partials (bounded driver state) and finish driver-side
    (``model_from_moments``)."""
    if not 1 <= k <= dim:
        raise ValueError(f"k must be in [1, {dim}], got {k}")
    n, s, g = collect_moments(df, vec_col, dim)
    return model_from_moments(n, s, g, dim, k)


def _lit_arr(vals) -> str:
    return "array(" + ",".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in vals) + ")"


def pca_transform(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-9,
) -> DataFrame:
    """Project vectors onto the model's components — map-only, JVM-side
    (literal component arrays + zip_with/aggregate; no Python worker).
    ``whiten=True`` scales each coordinate by 1/sqrt(eigenvalue + eps)
    so the output has identity covariance — what cosine-based dedup
    wants before thresholding.

    The component/mean literals are built as ONE SQL expression string:
    a Column-by-Column build would pay a py4j round-trip per term
    (SCALE.md wide-expression rule)."""
    scales = (
        [1.0 / (ev + eps) ** 0.5 for ev in model.eigenvalues]
        if whiten
        else [1.0] * model.k
    )
    rows = ",".join(
        _lit_arr([w * s for w in comp])
        for comp, s in zip(model.components, scales)
    )
    expr = (
        f"transform(array({rows}), row -> aggregate("
        f"zip_with(row, zip_with(CAST(`{vec_col}` AS array<double>), "
        f"{_lit_arr(model.mean)}, (a, b) -> a - b), (w, x) -> w * x), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    return df.withColumn(out_col, F.expr(expr))
