"""Scalar int8 quantization of embedding columns.

Embedding stores are float32 arrays; serving and training-data
pipelines routinely quantize them to int8 (4x smaller, SIMD-friendly)
with per-DIMENSION affine parameters: for dimension d with corpus
range [min_d, max_d],

    code = floor((x - min_d) / scale_d + 0.5) - 127,
    scale_d = (max_d - min_d) / 254          (codes in [-127, +127])

``floor(x + 0.5)`` is used instead of round() so the arithmetic is
bit-reproducible across engines (round-half-even vs half-up varies).
Constant dimensions (max == min) quantize to code 0.

Scale shape: the per-dimension ranges are one posexplode + groupBy(pos)
aggregation — the result is ``dim`` rows, collected and re-broadcast as
literal arrays into a map-only quantize pass.  Nothing corpus-sized
ever reaches the driver, and the quantize/dequantize steps are pure
whole-array expressions (zip_with/transform) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tube_spark.functions.localrel import local_df


def dimension_ranges(
    df: DataFrame, vec_col: str = "embedding"
) -> list[tuple[float, float]]:
    """[(min_d, max_d)] per dimension — dim rows via one shuffle."""
    rows = (
        df.select(F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .collect()
    )
    return [
        (float(r["lo"]), float(r["hi"])) for r in sorted(rows, key=lambda r: r["pos"])
    ]


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ranges: list[tuple[float, float]] | None = None,
) -> DataFrame:
    """(id, codes array<int>, n_dims) — int8-range codes in [-127, 127].

    ``ranges`` may be passed (e.g. from a training corpus) so new data
    quantizes with frozen parameters; by default they are computed from
    ``df`` itself.
    """
    if ranges is None:
        ranges = dimension_ranges(df, vec_col)
    lo = F.array(*[F.lit(l) for l, _ in ranges])
    scale = F.array(
        *[F.lit((h - l) / 254.0 if h > l else 0.0) for l, h in ranges]
    )
    # zip (value, dim-index) so each element picks its own parameters
    idx = F.transform(F.col(vec_col), lambda _, i: i)
    code = F.zip_with(
        F.col(vec_col),
        idx,
        lambda x, i: F.when(
            F.element_at(scale, i + 1) > 0,
            F.floor(
                (x.cast("double") - F.element_at(lo, i + 1))
                / F.element_at(scale, i + 1)
                + F.lit(0.5)
            ).cast("int")
            - F.lit(127),
        ).otherwise(F.lit(0)),
    )
    return df.select(
        F.col(id_col),
        code.alias("codes"),
        F.size(vec_col).cast("long").alias("n_dims"),
    )


def dequantize_codes(
    df: DataFrame,
    ranges: list[tuple[float, float]],
    id_col: str = "vec_id",
    codes_col: str = "codes",
) -> DataFrame:
    """(id, vector array<double>) — inverse of ``quantize_embeddings``
    up to scale/2 per dimension."""
    lo = F.array(*[F.lit(l) for l, _ in ranges])
    scale = F.array(
        *[F.lit((h - l) / 254.0 if h > l else 0.0) for l, h in ranges]
    )
    idx = F.transform(F.col(codes_col), lambda _, i: i)
    vec = F.zip_with(
        F.col(codes_col),
        idx,
        lambda c, i: (c.cast("double") + 127.0) * F.element_at(scale, i + 1)
        + F.element_at(lo, i + 1),
    )
    return df.select(F.col(id_col), vec.alias("vector"))


# ----------------------------------------------------------------------
# Product quantization (PQ) — the FAISS IVF-PQ building block

# Largest m*k*sub_dim for which the flat straight-line distance
# expression stays inside janino's 64 KB generated-method limit
# (measured on Spark 4.1 against a materializing plan: 512 compiles,
# 768 throws "Code grows beyond 64 KB" and the stage silently loses
# codegen — the boundary depends on what else fuses into the stage,
# so the limit sits at the largest ALWAYS-compiling size)
_PQ_FLAT_TERM_LIMIT = 512


def lattice_codebooks(m: int, sub_dim: int, k: int) -> list[list[list[float]]]:
    """Data-independent PQ codebooks on a small integer lattice:
    ``codebook[s][j][i] = (s*13 + j*31 + i*7) % 11 - 5``.  Integers, so
    any engine reproduces the assignment argmin exactly — the same
    portability device as ``semdedup.lattice_centroids`` (use k-means
    sub-codebooks for real compression quality; this is the
    differential-verification path)."""
    return [
        [
            [float((s * 13 + j * 31 + i * 7) % 11 - 5) for i in range(sub_dim)]
            for j in range(k)
        ]
        for s in range(m)
    ]


def pq_encode(
    df: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Product-quantize: split each ``dim``-vector into ``m`` subspaces
    of ``dim/m`` and encode each as the index of its nearest codebook
    entry (L2; ties -> lowest index).  64 float32 dims at m=8/k=16
    compress 64x to 8 nibbles.  Output: (id, codes array<int> length m,
    sq_error = total squared reconstruction error).

    Map-only: every distance is a native Catalyst expression over the
    embedded codebook literals — one corpus scan, zero shuffles, whole-
    stage codegen (plan-audited via the host query).  The m*k*sub_dim
    expression tree is assembled as ONE SQL string (``F.expr``), not
    composed Column objects — per-operator composition costs a py4j
    JVM round-trip each and measured ~9 s of DRIVER time at m=8/k=16
    before any row moved.

    Above ``_PQ_FLAT_TERM_LIMIT`` expanded terms the flat form's
    generated ``processNext()`` exceeds janino's 64 KB method limit
    (measured: 512 terms always compiles, 768 fails once a
    materializing sink fuses into the stage — Spark then LOGS
    ``Failed to compile`` and silently interprets the whole stage), so
    large configs switch to a compact per-centroid
    ``aggregate(zip_with(...))`` form whose generated code is one
    bounded call per centroid instead of inlined straight-line
    arithmetic.  The two forms are BIT-IDENTICAL: same subtraction and
    multiplication operands in the same order, and the fold's
    ``0.0 + t1 + t2 + ...`` equals the flat ``t1 + t2 + ...`` exactly
    because every square is non-negative (IEEE ``+0.0 + x == x``) —
    pytest-pinned in tests/test_quantize.py.  At larger m*k still,
    switch the argmin to the Arrow matmul kernel exactly as
    ``semdedup.assign_clusters(use_arrow=True)`` does; the native path
    stays the portable/oracled semantics.
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub_dim = dim // m
    books = codebooks if codebooks is not None else lattice_codebooks(m, sub_dim, k)
    if len(books) != m or any(len(b) != k for b in books):
        raise ValueError("codebooks must be m lists of k centroids")

    def dists_sql(s: int) -> str:
        # squared L2 to each of subspace s's k centroids; "a + b + c"
        # parses left-associative, so DuckDB's sequential list_sum
        # reproduces the floats bit-for-bit
        cents = []
        for c in books[s]:
            # CAST('<repr>' AS DOUBLE): repr is the shortest exact
            # round-trip string, and string->double parse reproduces the
            # exact binary64 (decimal-literal parsing would too for the
            # lattice ints, but trained codebook means are arbitrary)
            terms = [
                f"(element_at(__v, {s * sub_dim + i + 1}) - CAST('{ci!r}' AS DOUBLE))"
                f" * (element_at(__v, {s * sub_dim + i + 1}) - CAST('{ci!r}' AS DOUBLE))"
                for i, ci in enumerate(c)
            ]
            cents.append(" + ".join(terms))
        return "array(" + ", ".join(cents) + ")"

    def dists_hof_sql(s: int) -> str:
        # compact form: squared L2 as a fold over the pre-sliced
        # subvector; one bounded expression node per centroid
        cents = []
        for c in books[s]:
            lits = ", ".join(f"CAST('{ci!r}' AS DOUBLE)" for ci in c)
            cents.append(
                f"aggregate(zip_with(__s{s}, array({lits}), "
                "(x, y) -> (x - y) * (x - y)), "
                "CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
            )
        return "array(" + ", ".join(cents) + ")"

    dmats = [f"__d{s}" for s in range(m)]
    codes = (
        "array("
        + ", ".join(
            f"CAST(array_position({d}, array_min({d})) - 1 AS INT)" for d in dmats
        )
        + ")"
    )
    sq_err = " + ".join(f"array_min({d})" for d in dmats)
    base = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    if m * k * sub_dim <= _PQ_FLAT_TERM_LIMIT:
        dist_df = base.select(
            F.col(id_col),
            *[F.expr(dists_sql(s)).alias(f"__d{s}") for s in range(m)],
        )
    else:
        # slice once per subspace (k references each, so CollapseProject
        # keeps the projection separate and the fold never re-slices)
        sliced = base.select(
            F.col(id_col),
            *[
                F.expr(f"slice(__v, {s * sub_dim + 1}, {sub_dim})").alias(
                    f"__s{s}"
                )
                for s in range(m)
            ],
        )
        dist_df = sliced.select(
            F.col(id_col),
            *[F.expr(dists_hof_sql(s)).alias(f"__d{s}") for s in range(m)],
        )
    return dist_df.select(
        F.col(id_col),
        F.expr(codes).alias("codes"),
        F.expr(sq_err).alias("sq_error"),
    )


def pq_decode(
    df: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """(id, vector array<double>) — concatenated codebook centroids, the
    PQ reconstruction ``pq_encode``'s sq_error measures against."""
    sub_dim = dim // m
    books = codebooks if codebooks is not None else lattice_codebooks(m, sub_dim, k)
    parts = []
    for s in range(m):
        book = F.array(*[F.array(*[F.lit(x) for x in c]) for c in books[s]])
        parts.append(F.element_at(book, F.element_at(F.col(codes_col), s + 1) + 1))
    return df.select(F.col(id_col), F.concat(*parts).alias("vector"))


def pq_search(
    codes_df: DataFrame,
    query_vec: list[float],
    dim: int,
    m: int = 8,
    k: int = 16,
    topk: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Asymmetric distance computation (ADC) over PQ codes — how a PQ
    index is actually scanned: precompute the m x k table of squared
    distances from the query's subvectors to every codebook entry
    (driver-side, m*k floats), then score each stored vector as the sum
    of m table lookups indexed by its codes.  No decode, no original
    vectors touched — the scan reads only the codes column.

    Scale: the lookup table is a broadcast literal (m*k doubles); the
    scan is map-only + one TakeOrderedAndProject for top-k.  100 TB of
    codes at m=8 is ~1/64th the original bytes, and column pruning
    means that is ALL the scan reads.
    """
    if len(query_vec) != dim:
        raise ValueError(f"query dim {len(query_vec)} != {dim}")
    sub_dim = dim // m
    books = codebooks if codebooks is not None else lattice_codebooks(m, sub_dim, k)
    # driver-side ADC table: table[s][j] = ||q_s - c_sj||^2, summed in
    # the same left-to-right order as pq_encode for reproducibility
    table = [
        [
            sum(
                (query_vec[s * sub_dim + i] - c[i]) * (query_vec[s * sub_dim + i] - c[i])
                for i in range(sub_dim)
            )
            for c in books[s]
        ]
        for s in range(m)
    ]
    approx = None
    for s in range(m):
        lut = F.array(*[F.lit(x) for x in table[s]])
        term = F.element_at(lut, F.element_at(F.col(codes_col), s + 1) + 1)
        approx = term if approx is None else approx + term
    return (
        codes_df.select(F.col(id_col), approx.alias("approx_sq_dist"))
        .orderBy(F.col("approx_sq_dist").asc(), F.col(id_col).asc())
        .limit(topk)
    )


def pq_search_many(
    codes_df: DataFrame,
    queries: list[tuple[int, list[float]]],
    dim: int,
    m: int = 8,
    k: int = 16,
    topk: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Batched ADC search: ALL queries against the code table in ONE
    plan — the retrieval-serving shape (``pq_search`` compiles a fresh
    literal expression per query; B queries = B plans and B scans).

    Each query's m x k lookup table is a ROW of a broadcast frame
    (flattened to m*k doubles), joined to the codes by a
    declared-bounded broadcast nested loop (B tiny rows x the scan);
    scoring indexes the LUT with a higher-order ``aggregate`` over the
    m code positions, so the expression TEXT is shared by every query
    — one codegen compile, one scan of the codes column, regardless of
    B.  Per-query top-k goes through ``grouped_topk`` (two-phase, no
    one-task-per-query window funnel).

    Returns ``(query_id, vec_id, approx_sq_dist, rank)``, rank 1-based
    ascending by distance (ties broken by id).  Exactly equal to
    per-query ``pq_search`` calls (pytest-pinned)."""
    from tube_spark.operators.ranking import grouped_topk

    if not queries:
        raise ValueError("pq_search_many needs at least one query")
    sub_dim = dim // m
    books = codebooks if codebooks is not None else lattice_codebooks(m, sub_dim, k)
    spark = codes_df.sparkSession
    rows = []
    for qid, qv in queries:
        if len(qv) != dim:
            raise ValueError(f"query {qid}: dim {len(qv)} != {dim}")
        flat = [
            sum(
                (qv[s * sub_dim + i] - c[i]) * (qv[s * sub_dim + i] - c[i])
                for i in range(sub_dim)
            )
            for s in range(m)
            for c in books[s]
        ]
        rows.append((int(qid), flat))
    q = F.broadcast(
        local_df(spark, rows, "query_id long, lut array<double>")
    )
    score = F.expr(
        f"aggregate(sequence(1, {m}), CAST(0.0 AS DOUBLE), "
        f"(acc, s) -> acc + element_at(lut, (s-1)*{k} + "
        f"element_at({codes_col}, s) + 1))"
    )
    scored = (
        codes_df.select(F.col(id_col), F.col(codes_col))
        .join(q)  # BNLJ: B broadcast rows x the codes scan
        .select("query_id", F.col(id_col), score.alias("approx_sq_dist"))
    )
    return grouped_topk(
        scored, ["query_id"], "approx_sq_dist", topk,
        descending=False, tiebreak_col=id_col,
    ).select("query_id", id_col, "approx_sq_dist", "rank")


def pq_train(
    df: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train PQ codebooks: k-means in EACH of the m subspaces — but all
    m trainings advance together in ONE corpus scan per Lloyd
    iteration, not m separate jobs.  Rows explode to (subspace,
    subvector) once per iteration; assignment is a native argmin
    against that subspace's current centroids (a literal nested array
    indexed by subspace id); the update is one groupBy(subspace, code,
    dim) average whose result is m*k*sub_dim rows — bounded driver
    state, the same contract as ``clustering.kmeans_fit``.

    Init is the portable smallest-ids rule per subspace (subvectors of
    the k lowest ids).  Returns codebooks shaped for ``pq_encode`` /
    ``pq_search``; empty codes keep their previous centroid.
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub_dim = dim // m
    v = F.col(vec_col).cast("array<double>")
    seed_rows = df.select(id_col, v.alias("v")).orderBy(id_col).limit(k).collect()
    if len(seed_rows) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(seed_rows)}")
    books = [
        [
            [float(seed_rows[j]["v"][s * sub_dim + i]) for i in range(sub_dim)]
            for j in range(k)
        ]
        for s in range(m)
    ]

    # (subspace, subvector) rows — built once, reused every iteration
    subs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        F.slice(v, s * sub_dim + 1, sub_dim).alias("sv"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("e")
    ).select("e.s", "e.sv")

    spark = df.sparkSession
    for _ in range(iters):
        # codebooks as broadcast one-row DATA, not literals: the
        # expression text stays identical across iterations so the
        # codegen cache hits (the kmeans _assign_via_broadcast lesson —
        # 1024 embedded literals re-compiled a fresh Janino method per
        # iteration)
        bdf = local_df(
            spark, [(books,)], "__books array<array<array<double>>>"
        )
        cents = F.element_at(F.col("__books"), F.col("s") + 1)
        dists = F.transform(
            cents,
            lambda c: F.aggregate(
                F.zip_with(F.col("sv"), c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        code = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        rows = (
            subs.crossJoin(F.broadcast(bdf))
            # code assigned BELOW the explode: a Generate in the same
            # projection re-evaluates the argmin once per exploded
            # dimension row (the kmeans 64x-redundant-work bug)
            .withColumn("code", code)
            .select(F.col("s"), "code", F.posexplode("sv").alias("dim", "x"))
            .groupBy("s", "code", "dim")
            .agg(F.avg("x").alias("mean"))
            .collect()
        )
        nxt = [[list(c) for c in book] for book in books]
        for r in rows:
            nxt[r["s"]][r["code"]][r["dim"]] = float(r["mean"])
        books = nxt
    return books
