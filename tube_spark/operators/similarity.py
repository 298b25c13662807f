"""Similarity search over embedding columns (``array<float>``).

Two paths:

* ``cosine_topk`` — exact brute force: broadcast the (small) query set
  against the corpus, dot products as native Catalyst array expressions,
  per-query top-k via ``min_by``-style window ranking.  This is the
  correctness baseline and is already the right plan when |queries| is
  small: the corpus streams once, nothing shuffles except k rows per
  query.
* ``rhp_lsh_topk`` — approximate: random-hyperplane LSH.  Each vector
  gets a ``bits``-bit sign signature; vectors sharing a signature prefix
  band bucket together and only bucket-mates are scored.  At 100 TB this
  replaces the corpus×queries product with per-bucket products.

Hyperplanes are generated driver-side from a seeded RNG and shipped as
*literal arrays* into the plan (they are tiny: bits × dim floats), so
signature computation is still pure JVM expression work — no UDFs, no
Python in the executor path.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(u: Column, v: Column) -> Column:
    """Σ uᵢvᵢ as a native array expression (DuckDB: list_dot_product)."""
    return F.aggregate(
        F.zip_with(u, v, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(u: Column) -> Column:
    return F.sqrt(F.aggregate(u, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(u: Column, v: Column) -> Column:
    return dot(u, v) / (norm(u) * norm(v))


def cosine_arrow():
    """Arrow-vectorized cosine for bulk candidate scoring (numpy row-wise
    kernel per batch).  Same BLAS-shaped-work justification as
    ``rhp_signature_arrow``; the pure-Catalyst ``cosine`` stays the
    reference semantics (used by the oracled brute-force query)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos(u: pd.Series, v: pd.Series) -> pd.Series:
        a = np.asarray(u.tolist(), dtype=np.float64)
        b = np.asarray(v.tolist(), dtype=np.float64)
        num = (a * b).sum(axis=1)
        den = np.sqrt((a * a).sum(axis=1)) * np.sqrt((b * b).sum(axis=1))
        return pd.Series(num / den)

    return cos


def dot_arrow():
    """Arrow dot product — cosine for PRE-NORMALIZED vectors (⅓ the
    flops and no per-candidate norm recomputation)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def d(u: pd.Series, v: pd.Series) -> pd.Series:
        a = np.asarray(u.tolist(), dtype=np.float64)
        b = np.asarray(v.tolist(), dtype=np.float64)
        return pd.Series((a * b).sum(axis=1))

    return d


def normalized(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, unit-norm vector) — normalize ONCE per vector so candidate
    scoring is a bare dot product."""
    n = norm(F.col(vec_col))
    return df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x / n).alias(vec_col),
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors per query vector.

    Returns (query_id, neighbor_id, rank, cosine); self-matches excluded.
    Deterministic: ties broken by neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def _hyperplanes(dim: int, bits: int, seed: int) -> list[list[float]]:
    rnd = random.Random(seed)
    return [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def portable_hyperplanes(dim: int, bits: int) -> list[list[float]]:
    """Deterministic integer-lattice hyperplanes: plane[j][i] =
    (j*31 + i*7) mod 11 - 5 ∈ [-5, 5].  Statistically rougher than
    gaussian planes but reproducible in plain SQL — the same trick as
    ``semdedup``'s portable centroids — so an LSH top-k built on them
    has a full DuckDB oracle (extras query ``ann_lsh_topk_portable``).
    Use the gaussian default in production; use this to differentially
    verify the pipeline's plumbing end to end."""
    return [
        [float((j * 31 + i * 7) % 11 - 5) for i in range(dim)]
        for j in range(bits)
    ]


def rhp_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign signature under random hyperplanes, packed into a long.

    Pure-Catalyst form; fine for a handful of planes.  For 32+ planes
    the plan embeds bits×dim literals and codegen compilation dominates
    runtime — ``rhp_signature_arrow`` is the production path.
    """
    out = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = (dot(vec, plane) > 0).cast("long")
        out = out.bitwiseOR(F.shiftleft(bit, i))
    return out


def rhp_signature_arrow(planes: list[list[float]]):
    """Arrow-vectorized signature: one numpy matmul per batch.

    This is the deliberate Pandas-UDF exception in the engine: a dense
    bits×dim matrix product per row is BLAS work, not relational work —
    a batch matmul beats a 2048-literal codegen'd fold expression by an
    order of magnitude and keeps the plan small.  Returns a pandas_udf
    usable as ``sig_udf(vec_col) -> long``.
    """
    from pyspark.sql.functions import pandas_udf

    p = np.asarray(planes, dtype=np.float64)  # (bits, dim)
    weights = (1 << np.arange(p.shape[0], dtype=np.uint64)).astype(np.uint64)

    @pandas_udf("long")
    def sig(vecs: pd.Series) -> pd.Series:
        m = np.asarray(vecs.tolist(), dtype=np.float64)  # (n, dim)
        bits = (m @ p.T) > 0  # (n, bits)
        packed = (bits.astype(np.uint64) * weights).sum(axis=1).astype(np.int64)
        return pd.Series(packed)

    return sig


def _band_buckets(
    df: DataFrame,
    planes: list[list[float]],
    bands: int,
    id_col: str,
    vec_col: str,
    id_alias: str,
    keep_sig: bool = False,
) -> DataFrame:
    """(id, band index, band value) LSH bucket rows — ids only.

    Candidate generation stays narrow: vectors are NOT carried through
    the bucket join / distinct (hashing 64-double arrays per candidate
    row is what makes naive LSH implementations fall over); they are
    joined back by id only for the final exact-cosine scoring.

    ``keep_sig=True`` additionally carries the packed 64-bit signature
    (8 bytes/row) so callers can deduplicate multi-band collisions with
    a stateless first-matching-band filter instead of a distinct().
    """
    bits = len(planes)
    width = bits // bands
    sig_udf = rhp_signature_arrow(planes)
    with_sig = df.select(F.col(id_col).alias(id_alias), sig_udf(F.col(vec_col)).alias("sig"))
    chunk = lambda b: F.shiftright(F.col("sig"), b * width).bitwiseAND(F.lit((1 << width) - 1))
    bandarr = F.array(
        *[F.struct(F.lit(b).alias("cb"), chunk(b).alias("cv")) for b in range(bands)]
    )
    cols = [id_alias, F.col("c.cb").alias("cb"), F.col("c.cv").alias("cv")]
    if keep_sig:
        cols.append("sig")
    return with_sig.select(id_alias, "sig", F.explode(bandarr).alias("c")).select(*cols)


def rhp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    bits: int = 32,
    bands: int = 4,
    seed: int = 42,
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k: candidates = signature-band collisions (id-only
    join), then exact cosine on candidates.  Recall rises with bands
    (each band is an independent chance to collide); precision of the
    bucketing rises with band width = bits/bands.  ``planes`` overrides
    the gaussian defaults (see ``portable_hyperplanes``)."""
    if planes is None:
        planes = _hyperplanes(dim, bits, seed)
    assert len(planes) == bits and bits % bands == 0

    qb = _band_buckets(queries, planes, bands, id_col, vec_col, "query_id")
    cb = _band_buckets(corpus, planes, bands, id_col, vec_col, "neighbor_id")
    cand = (
        cb.join(qb, on=["cb", "cv"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    cos = cosine_arrow()
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("cosine", cos(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def _kmeans_centroids(
    corpus: DataFrame, vec_col: str, k: int, iters: int, seed: int, sample: int = 4096
):
    """Tiny driver-side k-means on a deterministic sample — the coarse
    quantizer for IVF.  The sample (≤4096 vectors) is the only data that
    leaves the executors; assignment at scale stays distributed."""
    rows = (
        corpus.select(vec_col)
        .orderBy(F.xxhash64(F.col(vec_col).cast("string")))
        .limit(sample)
        .collect()
    )
    X = np.asarray([r[0] for r in rows], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cent = X[rng.choice(len(X), size=min(k, len(X)), replace=False)]
    for _ in range(iters):
        sims = X @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            members = X[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def _nearest_centroids_udf(cent, nprobe: int):
    """Arrow kernel: indexes of the ``nprobe`` nearest centroids."""
    from pyspark.sql.functions import pandas_udf

    c = np.asarray(cent, dtype=np.float64)

    @pandas_udf("array<int>")
    def probes(vecs: pd.Series) -> pd.Series:
        m = np.asarray(vecs.tolist(), dtype=np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ c.T
        top = np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(top))

    return probes


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    kmeans_iters: int = 5,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus vectors are
    assigned to their nearest k-means centroid (one cell each); each
    query probes its ``nprobe`` nearest cells and scores only those
    vectors.  The classic FAISS-style coarse quantizer re-expressed as
    DataFrame ops: cell assignment is a map-only Arrow kernel, the
    candidate join is an equi-join on cell id, and exact cosine runs on
    the probed subset.  Expected work per query ≈ nprobe/n_clusters of
    the corpus (vs. all of it for brute force)."""
    cent = _kmeans_centroids(corpus, vec_col, n_clusters, kmeans_iters, seed)
    assign1 = _nearest_centroids_udf(cent, 1)
    probe_n = _nearest_centroids_udf(cent, nprobe)

    cells = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.explode(assign1(F.col(vec_col))).alias("cell"),
    )
    probes = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(probe_n(F.col(vec_col))).alias("cell"),
    )
    cos = cosine_arrow()
    # (query, neighbor) pairs are unique by construction — each corpus
    # vector lives in exactly ONE cell and a query's probed cells are
    # distinct — so no dedup is needed after scoring; a distinct here
    # would be a full shuffle of every scored row for nothing.
    scored = (
        cells.join(F.broadcast(probes), on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos(F.col("q_vec"), F.col("c_vec")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bits: int = 32,
    bands: int = 4,
    dim: int = 64,
    seed: int = 42,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold: hyperplane
    band buckets for candidates (id-only self-join), exact cosine after
    joining vectors back by id.

    A pair whose signatures collide on k bands would surface k times;
    instead of a ``distinct()`` (a full shuffle of the candidate pair
    set) each pair is emitted only from its FIRST matching band — a
    stateless filter computable from xor(sig_a, sig_b) alone, the same
    optimization measured at 4.7s → ~2s on ``simhash_pairs``.

    SCALING (measured, BENCH_NOTES.md): candidate volume is
    Θ(Σ bucket²) — with band width w fixed, buckets saturate as the
    corpus grows and candidates go quadratic.  Two knobs, both with
    S-curve math ``recall = 1−(1−p^w)^bands``, ``p = 1−θ/π``:
    * grow ``bits`` so width w ≈ log2(n / target_occupancy): for
      dedup-grade thresholds (≥0.9, p≈0.86) w=8..16 keeps recall
      high at any n — this is the 100 TB configuration;
    * ``max_bucket_size`` skips hotter-than-cap buckets (the
      low-information hyperplane regions), bounding work at
      n·bands·cap; recall impact is measured, not assumed — see
      ``pair_recall`` / ann_recall_report.
    Broad thresholds near random (e.g. 0.3, θ≈72° vs 90°) are
    intrinsically dense: no signature length separates borderline
    from random pairs cheaply; use ivf_topk for that regime."""
    assert bits % bands == 0
    width = bits // bands
    planes = _hyperplanes(dim, bits, seed)
    unit = normalized(df, id_col, vec_col).cache()
    # eager materialization: the frame fans out into both self-join
    # sides — un-materialized, each AQE branch recomputes the cached
    # plan (the minhash_lsh_pairs stampede, same fix)
    unit.count()
    buckets = _band_buckets(unit, planes, bands, id_col, vec_col, "vid", keep_sig=True)
    if max_bucket_size is not None:
        sizes = buckets.groupBy("cb", "cv").agg(F.count(F.lit(1)).alias("_bs"))
        # join (not broadcast): bucket count scales with the corpus when
        # width is sized properly, and Catalyst reuses the (cb, cv)
        # shuffle for the self-join below
        buckets = (
            buckets.join(sizes.filter(F.col("_bs") <= max_bucket_size), ["cb", "cv"])
            .drop("_bs")
        )
    a = buckets.select(F.col("vid").alias("id_a"), F.col("sig").alias("sig_a"), "cb", "cv")
    b = buckets.select(F.col("vid").alias("id_b"), F.col("sig").alias("sig_b"), "cb", "cv")
    chunk = lambda c, bb: F.shiftright(c, bb * width).bitwiseAND(F.lit((1 << width) - 1))
    xor = F.col("sig_a").bitwiseXOR(F.col("sig_b"))
    first_match = F.lit(bands - 1)
    for bb in range(bands - 2, -1, -1):
        first_match = F.when(chunk(xor, bb) == 0, F.lit(bb)).otherwise(first_match)
    j = a.join(b, on=["cb", "cv"]).filter(F.col("id_a") < F.col("id_b"))
    if max_bucket_size is None:
        # stateless first-matching-band dedup of multi-band collisions.
        # The surviving pairs inherit the bucket join's (band, value)
        # partitioning, which is skewed by construction (hot buckets);
        # rebalance before the vector join + Arrow scoring so the UDF
        # stage has no stragglers.  Same exchange volume as a
        # distinct(), minus its hash-dedup aggregate.
        cand = (
            j.filter(F.col("cb") == first_match)
            .select("id_a", "id_b")
            .repartition("id_a")
        )
    else:
        # with hot buckets removed, a pair's first matching band may be
        # a skipped one — the stateless filter would drop it entirely;
        # dedup the (cap-bounded) candidate set explicitly instead (the
        # distinct's exchange doubles as the rebalance)
        cand = j.select("id_a", "id_b").distinct()
    va = unit.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    vb = unit.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    dot_k = dot_arrow()
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", dot_k(F.col("vec_a"), F.col("vec_b")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def topk_recall(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """Per-query recall of an approximate top-k result against the exact
    one: |approx ∩ exact| / |exact| over ``(query_id, neighbor_id)``.

    Used both by the test suite (assert recall ≥ floor) and by the
    ``ann_recall_report`` driver query, so the quality of the
    approximate indexes is *measured*, not assumed.  Left-semi join +
    per-key count — no vector payloads move."""
    e = exact.select("query_id", "neighbor_id")
    a = approx.select("query_id", "neighbor_id")
    hits = (
        e.join(a, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    tot = e.groupBy("query_id").agg(F.count(F.lit(1)).alias("n"))
    return (
        tot.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.round(F.coalesce("hits", F.lit(0)) / F.col("n"), 4).alias("recall"),
        )
    )


def pair_recall(exact_pairs: DataFrame, approx_pairs: DataFrame) -> DataFrame:
    """Recall of an approximate near-duplicate pair set against the
    brute-force set: one row ``(n_exact, n_found, recall)``.  Pairs are
    matched on ``(id_a, id_b)`` (callers keep id_a < id_b canonical)."""
    e = exact_pairs.select("id_a", "id_b")
    found = e.join(approx_pairs.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi")
    return (
        e.agg(F.count(F.lit(1)).alias("n_exact"))
        .crossJoin(found.agg(F.count(F.lit(1)).alias("n_found")))
        .select(
            "n_exact",
            "n_found",
            F.round(
                F.when(F.col("n_exact") > 0, F.col("n_found") / F.col("n_exact"))
                .otherwise(F.lit(1.0)),
                4,
            ).alias("recall"),
        )
    )


def exact_near_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Brute-force all-pairs cosine ≥ threshold (the oracle for
    ``embedding_near_duplicates``).  O(n²) — correctness baseline for
    tests and small corpora only; the LSH path is the scale path."""
    unit = normalized(df, id_col, vec_col)
    a = unit.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    b = unit.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    dot_k = dot_arrow()
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", dot_k(F.col("vec_a"), F.col("vec_b")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def reciprocal_nn(
    side_a: DataFrame,
    side_b: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """MUTUAL nearest neighbors across two embedding sides — the core
    primitive of bitext/parallel-corpus mining (align sentences across
    languages), cross-modal pairing (caption <-> image), and snapshot
    entity alignment: a pair survives only when each side is the
    OTHER's top-1, which kills the asymmetric hub matches a one-way
    top-1 floods you with.

    Returns ``(id_a, id_b, cosine)``, one row per mutual pair (each id
    appears at most once per side by construction).  Deterministic:
    ties break by the opposite id ascending, exactly like
    ``cosine_topk``.

    This is the EXACT brute-force tier (one cross join with ``side_b``
    broadcast — pass the smaller table as ``side_b``); at corpus scale
    swap the per-side top-1 search to the IVF store
    (``operators/vectorstore.py``) and keep the mutual join, which is
    the cheap part (two |A|+|B|-sized frames).
    """
    a = side_a.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va")
    )
    b = side_b.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb")
    )
    scored = a.crossJoin(F.broadcast(b)).withColumn(
        "cosine", cosine(F.col("__va"), F.col("__vb"))
    )
    wa = Window.partitionBy("id_a").orderBy(
        F.col("cosine").desc(), F.col("id_b").asc()
    )
    wb = Window.partitionBy("id_b").orderBy(
        F.col("cosine").desc(), F.col("id_a").asc()
    )
    nn_a = (
        scored.withColumn("__r", F.row_number().over(wa))
        .filter(F.col("__r") == 1)
        .select("id_a", "id_b", "cosine")
    )
    nn_b = (
        scored.withColumn("__r", F.row_number().over(wb))
        .filter(F.col("__r") == 1)
        .select(F.col("id_a").alias("id_a"), F.col("id_b").alias("id_b"))
    )
    return nn_a.join(nn_b, ["id_a", "id_b"]).select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    )
