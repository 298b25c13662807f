"""Cell-partitioned IVF vector store: partition-pruned ANN on parquet.

``operators/similarity.py``'s ``ivf_topk`` is the in-memory shape of
IVF search — every query recomputes cell assignment over the whole
corpus.  At 100 TB the corpus must live ON DISK laid out so a search
touches only the cells it probes.  This module is that layout:

* **Build** — train the coarse quantizer (the same bounded driver-side
  k-means as ``ivf_topk``: ≤4096-vector deterministic sample), persist
  the centroids next to the data (``_centroids.json``), assign every
  vector to its nearest centroid with the map-only Arrow kernel, and
  write parquet ``partitionBy("cell")`` — one directory per inverted
  list.
* **Search** — compute each query's ``nprobe`` nearest cells, collect
  the DISTINCT probed cell ids (bounded: ≤ n_queries x nprobe ints),
  and read the store with ``cell IN (...)``.  That predicate is a
  PARTITION filter: Spark's file index skips every unprobed cell
  directory before a single byte is read — the scan cost is
  nprobe/n_cells of the corpus by construction, verified by a
  plan assertion in tests (``PartitionFilters``).
* **Append / streaming ingest** — new vectors are assigned with the
  SAME stored centroids (the code space is frozen at build time, like
  ``layout.py``'s fixed Z-order bounds), so appends land in existing
  cells and never reshuffle old data.  ``streaming_vector_ingest``
  wires it to Structured Streaming via ``foreachBatch`` +
  ``availableNow``; re-processing a batch rewrites the same rows into
  the same cells (append idempotency at the id level is delegated to
  the readers' ``dropDuplicates([id])``, documented below).

Re-centering drift: after heavy appends the frozen centroids may stop
matching the data distribution (cells grow unbalanced).  ``cell_stats``
exposes per-cell counts so an operator can decide to rebuild; rebuild =
``build_ivf_store`` to a fresh path + atomic pointer swap (the
``sinks/writer.py`` versioned-publish pattern).

No reference counterpart — the reference has no vector surface at all;
this is the scale path behind SURVEY's similarity-search extension.
"""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tube_spark.functions.localrel import local_df

from tube_spark.functions import fsio
from tube_spark.operators.similarity import (
    _kmeans_centroids,
    _nearest_centroids_udf,
    cosine_arrow,
)
from tube_spark.operators.storelife import StoreManifest

_CENTROIDS = "_centroids.json"
_DATA = "cells"
_STORE_MANIFEST = "_store.json"


def _sm(spark: SparkSession, path: str) -> StoreManifest:
    return StoreManifest(fsio.join(path, _STORE_MANIFEST), spark)


def _store_manifest(spark: SparkSession, path: str) -> dict:
    """The store pointer set: {"data_dir", "data_gen",
    "appends_since_compact", "centroids", ["pq_books"], ["stale"]}.
    One manifest write commits data dir AND quantizer files together,
    so a rebuild can never leave new centroids pointing at old cells.
    Legacy stores (no manifest) resolve to the original flat layout at
    generation 0."""
    m = _sm(spark, path).read()
    if m is None:
        m = {"data_dir": _DATA, "data_gen": 0, "appends_since_compact": 0}
    m.setdefault("centroids", _CENTROIDS)
    m.setdefault("pq_books", _PQ_BOOKS)
    return m


def _write_store_manifest(spark: SparkSession, path: str, m: dict) -> None:
    _sm(spark, path).commit(m)


def _data_path(spark: SparkSession, path: str) -> str:
    return fsio.join(path, _store_manifest(spark, path)["data_dir"])


def _sweep_stale(spark: SparkSession, path: str, m: dict) -> None:
    """Delete directories/files a prior commit superseded but a crash
    left behind (the manifest carries them until the delete lands, so
    a post-commit crash can never leak a generation forever)."""
    _sm(spark, path).sweep_stale(
        m, lambda name: fsio.delete(spark, fsio.join(path, name))
    )


def load_centroids(path: str, spark: SparkSession | None = None) -> np.ndarray:
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            "load_centroids needs a SparkSession (none active): pass one "
            "explicitly or create it before loading the IVF store"
        )
    name = _store_manifest(spark, path)["centroids"]
    return np.asarray(
        json.loads(fsio.read_text(spark, fsio.join(path, name))),
        dtype=np.float64,
    )


def _assign_cells(
    df: DataFrame, cent: np.ndarray, id_col: str, vec_col: str
) -> DataFrame:
    assign1 = _nearest_centroids_udf(cent, 1)
    return df.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(assign1(F.col(vec_col))).alias("cell"),
    )


def build_ivf_store(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    kmeans_iters: int = 5,
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> np.ndarray:
    """Train (or take) centroids, persist them, and write the corpus
    cell-partitioned.  Returns the centroids."""
    cent = (
        np.asarray(centroids, dtype=np.float64)
        if centroids is not None
        else _kmeans_centroids(corpus, vec_col, n_clusters, kmeans_iters, seed)
    )
    spark = corpus.sparkSession
    names = _stage_names(spark, path)
    fsio.mkdirs(spark, path)
    fsio.write_text(
        spark, fsio.join(path, names["centroids"]),
        json.dumps([[float(x) for x in row] for row in cent]),
    )
    (
        _assign_cells(corpus, cent, id_col, vec_col)
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(fsio.join(path, names["data_dir"]))
    )
    _commit_build(spark, path, names)
    return cent


def _stage_names(spark: SparkSession, path: str) -> dict:
    """Staging names for a (re)build.  A FRESH path uses the flat
    layout; rebuilding over an existing store stages everything —
    data, centroids, PQ books — under the NEXT generation's names, so
    nothing goes live (and nothing old is clobbered) until the single
    manifest commit.  The r12 in-place form overwrote the centroids
    BEFORE the data write: a crash in between left new centroids
    pointing at old cells, silently corrupting every search."""
    has_manifest = fsio.exists(spark, fsio.join(path, _STORE_MANIFEST))
    has_legacy = fsio.exists(spark, fsio.join(path, _DATA))
    prior = _store_manifest(spark, path)
    if not has_manifest and not has_legacy:
        gen = 0
    else:
        gen = int(prior.get("data_gen", 0)) + 1
    gname = StoreManifest.gen_name
    return {
        "gen": gen,
        "data_dir": gname(_DATA, gen),
        "centroids": (
            _CENTROIDS if gen == 0 else gname("_centroids", gen) + ".json"
        ),
        "pq_books": (
            _PQ_BOOKS if gen == 0 else gname("_pq_codebooks", gen) + ".json"
        ),
        "prior": prior,
    }


def _commit_build(spark: SparkSession, path: str, names: dict) -> None:
    prior = names["prior"]
    new = {names["data_dir"], names["centroids"], names["pq_books"]}
    m = {
        "data_dir": names["data_dir"],
        "data_gen": names["gen"],
        "appends_since_compact": 0,
        "centroids": names["centroids"],
        "pq_books": names["pq_books"],
        "stale": list(prior.get("stale") or []),
    }
    StoreManifest.record_stale(
        m,
        [
            n
            for n in (
                prior["data_dir"], prior["centroids"], prior.get("pq_books")
            )
            if n and n not in new
        ],
    )
    _write_store_manifest(spark, path, m)  # the commit point
    _sweep_stale(spark, path, m)


def append_vectors(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    auto_compact_at: int | None = None,
    compact_cleanup: bool = True,
) -> None:
    """Assign new vectors with the store's FROZEN centroids and append.
    Old cells are untouched — an append moves only the new rows.

    Refuses to run on an IVF-PQ store: rows appended without the
    ``codes`` column read back as NULL ``approx_sq_dist``, which sorts
    FIRST under the ascending ADC rank window and corrupts results —
    use ``append_vectors_pq`` (which encodes with the frozen codebooks)
    there instead.

    Every append adds one file set per touched cell directory (the
    same accretion shape the BM25 and near-dup stores carry);
    ``auto_compact_at=N`` rewrites the store via ``compact_store``
    once N appends have accumulated since the last rewrite;
    ``compact_cleanup=False`` defers deleting the superseded
    generation to the NEXT commit (in-flight readers that resolved the
    old directory keep working; the manifest's stale list guarantees
    the deferred delete still happens)."""
    spark = df.sparkSession
    _check_compact_at(auto_compact_at)  # before any write lands
    m = _store_manifest(spark, path)
    if fsio.exists(spark, fsio.join(path, m["pq_books"])):
        raise ValueError(
            f"{path} is an IVF-PQ store ({m['pq_books']} present): plain "
            "append_vectors would write NULL codes and poison the ADC "
            "scan — use append_vectors_pq(df, path, dim, ...) instead"
        )
    cent = load_centroids(path, spark)
    (
        _assign_cells(df, cent, id_col, vec_col)
        .write.mode("append")
        .partitionBy("cell")
        .parquet(_data_path(spark, path))
    )
    _bump_appends(spark, path, auto_compact_at, id_col, compact_cleanup)


_check_compact_at = StoreManifest.check_compact_at


def _bump_appends(
    spark: SparkSession,
    path: str,
    auto_compact_at: int | None,
    id_col: str,
    compact_cleanup: bool = True,
) -> None:
    m = _store_manifest(spark, path)
    if _sm(spark, path).bump_appends(m, auto_compact_at):
        compact_store(spark, path, id_col=id_col, cleanup=compact_cleanup)


def compact_store(
    spark: SparkSession,
    path: str,
    id_col: str = "vec_id",
    cleanup: bool = True,
    n_output_partitions: int | None = None,
) -> dict:
    """Rewrite the cell-partitioned data into a fresh generation
    directory with ONE file per cell, committed by the store-manifest
    pointer (readers resolve the data dir from the manifest at call
    time, so the swap is atomic to them; a crash before the commit
    leaves an orphan directory the replay overwrites).  The rewrite
    also MATERIALIZES the replay-dedup: duplicate ids from redelivered
    streaming appends are dropped here (readers dropDuplicates anyway
    — identical results, but the dropped bytes stop being re-read by
    every later search).  Works for both plain IVF and IVF-PQ stores
    (all columns carried).

    ``n_output_partitions`` defaults to n_cells — one file per cell,
    right while each inverted list fits a task.  On a store whose
    cells are themselves huge, pass a larger value: the rewrite then
    hashes on (cell, id) so one cell's rows SPLIT across tasks
    (hashing on cell alone could never split a hot cell), and
    partitionBy still routes every row to its cell directory — more,
    bounded-size files per cell instead of one unbounded one.

    ``cleanup=False`` defers deleting the superseded directory: it is
    recorded in the manifest's ``stale`` list at the commit, and the
    NEXT commit (compact or rebuild) sweeps it — in-flight readers of
    the old generation finish undisturbed, and a crash between commit
    and delete can never leak a directory forever."""
    m = _store_manifest(spark, path)
    gen = int(m.get("data_gen", 0)) + 1
    new_dir = StoreManifest.gen_name(_DATA, gen)
    df = spark.read.parquet(fsio.join(path, m["data_dir"])).dropDuplicates(
        [id_col]
    )
    n_cells = len(load_centroids(path, spark))
    if n_output_partitions is not None and n_output_partitions < n_cells:
        # fewer partitions than cells cannot be honored (partitionBy
        # still writes one directory per cell) — the argument would be
        # silently ignored; n_cells IS the minimum
        raise ValueError(
            f"n_output_partitions={n_output_partitions} < n_cells="
            f"{n_cells}: the rewrite is per-cell, so n_cells is the "
            "minimum — pass None for the default one-file-per-cell"
        )
    if n_output_partitions is None or n_output_partitions == n_cells:
        parted = df.repartition(n_cells, F.col("cell"))
    else:
        parted = df.repartition(
            n_output_partitions, F.col("cell"), F.col(id_col)
        )
    (
        parted.write.mode("overwrite")
        .partitionBy("cell")
        .parquet(fsio.join(path, new_dir))
    )
    old_dir = m["data_dir"]
    m["data_dir"] = new_dir
    m["data_gen"] = gen
    m["appends_since_compact"] = 0
    StoreManifest.record_stale(m, [old_dir])
    _write_store_manifest(spark, path, m)  # the commit point
    if cleanup:
        _sweep_stale(spark, path, m)
    return m


def store_vectors(spark: SparkSession, path: str, dedup: bool = True) -> DataFrame:
    """The store as a DataFrame (``id, vector, cell``).  ``dedup``
    drops replayed appends (streaming at-least-once): last write wins
    is unnecessary — any duplicate row is bit-identical because cell
    assignment is deterministic under frozen centroids."""
    df = spark.read.parquet(_data_path(spark, path))
    if dedup:
        df = df.dropDuplicates([df.columns[0]])
    return df


def cell_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-cell row counts — the rebuild-decision signal (a cell far
    above corpus/n_cells means the frozen quantizer has drifted)."""
    return store_vectors(spark, path).groupBy("cell").count().orderBy("cell")


def search_store(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """IVF top-k over the on-disk store.  Probed cell ids are collected
    (bounded: ≤ |queries| x nprobe ints) and pushed as a PARTITION
    filter, so unprobed cell directories are never opened."""
    cent = load_centroids(path, spark)
    probe_n = _nearest_centroids_udf(cent, nprobe)
    probes = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(probe_n(F.col(vec_col))).alias("cell"),
    )
    probed_cells = sorted(
        {r["cell"] for r in probes.select("cell").distinct().collect()}
    )
    # partition filter FIRST (dedup above the filter would block
    # pruning: Catalyst cannot push a non-key filter through the
    # dropDuplicates aggregate), then replay-dedup the probed subset
    store = (
        spark.read.parquet(_data_path(spark, path))
        .filter(F.col("cell").isin(probed_cells))
        .dropDuplicates([id_col])
    )
    store = store.select(
        F.col(store.columns[0]).alias("neighbor_id"),
        F.col(store.columns[1]).alias("c_vec"),
        "cell",
    )
    cos = cosine_arrow()
    scored = (
        store.join(F.broadcast(probes), on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cos(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine")
        )
    )


def streaming_vector_ingest(
    spark: SparkSession,
    source_dir: str,
    store_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint_dir: str | None = None,
    schema=None,
    auto_compact_at: int | None = None,
    compact_cleanup: bool = True,
):
    """Structured Streaming ingestion: watch ``source_dir`` for new
    vector parquet files, append each micro-batch into the store with
    frozen-centroid assignment (``availableNow`` trigger — drain then
    stop; swap the trigger for continuous ingestion).  The store must
    already exist (``build_ivf_store`` on a seed corpus)."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema

    def handle(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        append_vectors(
            batch, store_path, id_col=id_col, vec_col=vec_col,
            auto_compact_at=auto_compact_at,
            compact_cleanup=compact_cleanup,
        )

    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = stream.writeStream.foreachBatch(handle).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


# ----------------------------------------------------------------------
# IVF-PQ: coarse cells prune DIRECTORIES, PQ codes shrink the BYTES —
# composed, a probe reads nprobe/n_cells of the corpus and only the
# codes column of that (the FAISS IVF-PQ cost model on parquet)
_PQ_BOOKS = "_pq_codebooks.json"


def load_pq_books(path: str, spark: SparkSession | None = None):
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            "load_pq_books needs a SparkSession (none active): pass one "
            "explicitly or create it before loading the IVF-PQ store"
        )
    name = _store_manifest(spark, path)["pq_books"]
    return json.loads(fsio.read_text(spark, fsio.join(path, name)))


def build_ivfpq_store(
    corpus: DataFrame,
    path: str,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    kmeans_iters: int = 5,
    seed: int = 42,
    m: int = 8,
    k_codes: int = 16,
    train_pq: bool = True,
    pq_iters: int = 3,
) -> None:
    """IVF-PQ build: coarse centroids + per-subspace PQ codebooks are
    trained (both bounded driver state), persisted next to the data,
    and every vector lands in its cell directory carrying its m-byte
    code vector AND the raw vector (codes answer the scan; the vector
    column exists for exact re-rank and is column-pruned away unless a
    query asks for it)."""
    from tube_spark.operators.quantize import (
        lattice_codebooks,
        pq_encode,
        pq_train,
    )

    spark = corpus.sparkSession
    cent = _kmeans_centroids(corpus, vec_col, n_clusters, kmeans_iters, seed)
    books = (
        pq_train(corpus, dim, m, k_codes, pq_iters, id_col, vec_col)
        if train_pq
        else lattice_codebooks(m, dim // m, k_codes)
    )
    # stage quantizers + data under the next generation's names; the
    # single manifest commit flips all three pointers together (see
    # _stage_names for the crash window this closes)
    names = _stage_names(spark, path)
    fsio.mkdirs(spark, path)
    fsio.write_text(
        spark, fsio.join(path, names["centroids"]),
        json.dumps([[float(x) for x in row] for row in cent]),
    )
    fsio.write_text(
        spark, fsio.join(path, names["pq_books"]), json.dumps(books)
    )
    coded = pq_encode(corpus, dim, m, k_codes, id_col, vec_col, books).select(
        id_col, "codes"
    )
    (
        _assign_cells(corpus, cent, id_col, vec_col)
        .join(coded, on=id_col)
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(fsio.join(path, names["data_dir"]))
    )
    _commit_build(spark, path, names)


def search_store_pq(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
    rerank: int = 0,
) -> DataFrame:
    """IVF-PQ search: probe ``nprobe`` cells per query (partition
    filter — unprobed directories never open), then ADC-score ONLY the
    codes column of the probed cells against per-query lookup tables
    (m*k doubles each, broadcast as literals on the bounded query set).
    Returns (query_id, neighbor_id, rank, approx_sq_dist) ranked by
    approximate squared L2 — the PQ metric; for normalized embeddings
    this ordering matches cosine.  ``rerank > 0`` re-scores that many
    ADC candidates per query with exact distances on the raw vectors
    (a second bounded read of the same cells), the standard
    accuracy/IO dial.
    """
    books = load_pq_books(path, spark)
    m, k_codes = len(books), len(books[0])
    sub_dim = dim // m
    # derive the id type from the caller's frame — hardcoding `long`
    # mis-joins (or fails) for string/int id columns (ADVICE r6)
    qid_type = queries.schema[id_col].dataType.simpleString()
    cent = load_centroids(path, spark)
    probe_n = _nearest_centroids_udf(cent, nprobe)
    qrows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).collect()  # bounded by the broadcast-queries contract (cosine_topk)
    probed = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(probe_n(F.col(vec_col))).alias("cell"),
    )
    probed_cells = sorted({r["cell"] for r in probed.select("cell").distinct().collect()})

    def lut_flat(qv):
        return [
            sum(
                (float(qv[s * sub_dim + i]) - books[s][j][i])
                * (float(qv[s * sub_dim + i]) - books[s][j][i])
                for i in range(sub_dim)
            )
            for s in range(m)
            for j in range(k_codes)
        ]

    luts = local_df(
        spark,
        [(r["query_id"], lut_flat(r["q_vec"])) for r in qrows],
        f"query_id {qid_type}, lut array<double>",
    ).join(probed, on="query_id")

    # codes IS NOT NULL guards against rows slipped in via plain
    # append_vectors (NULL approx_sq_dist sorts first ascending);
    # append_vectors itself also refuses PQ stores
    codes_scan = (
        spark.read.parquet(_data_path(spark, path))
        .filter(F.col("cell").isin(probed_cells))
        .filter(F.col("codes").isNotNull())
        .select(F.col(id_col).alias("neighbor_id"), "codes", "cell")
        .dropDuplicates(["neighbor_id"])
    )
    adc = None
    for s in range(m):
        term = F.element_at(
            F.col("lut"),
            F.lit(s * k_codes) + F.element_at(F.col("codes"), s + 1) + 1,
        )
        adc = term if adc is None else adc + term
    scored = (
        codes_scan.join(F.broadcast(luts), on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", adc.alias("approx_sq_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_sq_dist").asc(), F.col("neighbor_id").asc()
    )
    top = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(max(k, rerank)))
    )
    if not rerank:
        return top.select(
            "query_id", "neighbor_id", "rank",
            F.round("approx_sq_dist", 6).alias("approx_sq_dist"),
        )
    # exact re-rank: fetch raw vectors for the ADC survivors only
    vecs = (
        spark.read.parquet(_data_path(spark, path))
        .filter(F.col("cell").isin(probed_cells))
        .select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
        .dropDuplicates(["neighbor_id"])
    )
    qlits = local_df(
        spark,
        [(r["query_id"], [float(x) for x in r["q_vec"]]) for r in qrows],
        f"query_id {qid_type}, q_vec array<double>",
    )
    exact = (
        top.join(vecs, on="neighbor_id")
        .join(F.broadcast(qlits), on="query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.aggregate(
                F.zip_with(
                    F.col("q_vec"),
                    F.col("c_vec").cast("array<double>"),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("sq_dist"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("sq_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sq_dist", 6).alias("sq_dist"))
    )


def append_vectors_pq(
    df: DataFrame,
    path: str,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    auto_compact_at: int | None = None,
    compact_cleanup: bool = True,
) -> None:
    """Append to an IVF-PQ store: assign cells with the FROZEN
    centroids and encode with the FROZEN codebooks (both loaded from
    the store), so appended rows are byte-compatible with the build.
    Plain ``append_vectors`` must not be used on a PQ store — it would
    write NULL codes and poison the ADC scan.  ``auto_compact_at`` /
    ``compact_cleanup``: see ``append_vectors``/``compact_store``."""
    from tube_spark.operators.quantize import pq_encode

    spark = df.sparkSession
    _check_compact_at(auto_compact_at)  # before any write lands
    cent = load_centroids(path, spark)
    books = load_pq_books(path, spark)
    m, k_codes = len(books), len(books[0])
    coded = pq_encode(df, dim, m, k_codes, id_col, vec_col, books).select(
        id_col, "codes"
    )
    (
        _assign_cells(df, cent, id_col, vec_col)
        .join(coded, on=id_col)
        .write.mode("append")
        .partitionBy("cell")
        .parquet(_data_path(spark, path))
    )
    _bump_appends(spark, path, auto_compact_at, id_col, compact_cleanup)


def streaming_vector_ingest_pq(
    spark: SparkSession,
    source_dir: str,
    store_path: str,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint_dir: str | None = None,
    schema=None,
    auto_compact_at: int | None = None,
    compact_cleanup: bool = True,
):
    """Structured Streaming ingestion into an IVF-PQ store: each
    micro-batch is assigned with the FROZEN centroids and encoded with
    the FROZEN codebooks (``append_vectors_pq``), so streamed rows are
    byte-compatible with the build and immediately ADC-searchable.
    ``availableNow`` trigger — drain then stop; the store must already
    exist (``build_ivfpq_store`` on a seed corpus).  Replays are
    idempotent at the row level: assignment and encoding are
    deterministic under frozen state, so duplicates are bit-identical
    and collapse in the readers' ``dropDuplicates([id])``."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema

    def handle(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        append_vectors_pq(
            batch, store_path, dim, id_col=id_col, vec_col=vec_col,
            auto_compact_at=auto_compact_at,
            compact_cleanup=compact_cleanup,
        )

    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = stream.writeStream.foreachBatch(handle).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
