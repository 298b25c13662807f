"""Persistent term-partitioned BM25 index: ranked retrieval WITHOUT
scanning the corpus per query.

``operators/retrieval.py`` scores straight off the document table —
right for one-shot analytics, wrong for a serving path: every query
would re-tokenize 100 TB.  This store is the text analog of the IVF
vector store (operators/vectorstore.py): postings live on parquet
PARTITIONED by a term-hash bucket, so a query reads only the buckets
its terms hash into (``PartitionFilters`` — plan-asserted in
tests/test_searchindex.py) and, inside them, only the matching term
rows (pushed filters).  A q-term query against a B-bucket index
touches <= q/B of the postings bytes regardless of corpus size.

Layout:
    <path>/postings/tb=<bucket>/...      base generation (build output;
                                         later generations land at
                                         postings-g<n> via compaction)
    <path>/segments/seg-<n>/tb=<b>/...   committed append segments
    <path>/_MANIFEST.json                n_docs, total_dl, n_buckets,
                                         postings_dir, segments,
                                         next_seg/next_gen watermarks

Document length rides each posting row (denormalized) so scoring
needs NO doc-side join; corpus-level stats (N, avgdl) are two numbers
in the manifest.  Scoring reuses the exact BM25 expressions of
``retrieval.bm25_topk`` — per-term df computed from the pruned read
exactly as bm25_topk computes it from the filtered token stream — so
``search_text_index`` is provably result-identical to the scan-time
scorer (pinned by an exact-equality pytest).

Appends: postings for NEW doc_ids (the monotone-id contract the
streaming sinks document) land as a STAGED SEGMENT
(``<path>/segments/seg-<n>/tb=<bucket>/...``) that only becomes
visible when the manifest commits it — the manifest's ``segments``
list is the transaction log.  A crash between the segment write and
the manifest write leaves an uncommitted directory that search never
reads; the replay re-runs the same segment number in overwrite mode,
replacing the partial files before committing.  At-least-once
redelivery therefore cannot double-insert postings OR double-count
(n_docs, total_dl), even across a mid-append crash.  df needs no
stored state — it is derived at search time — so an append never
rewrites published buckets (the frozen-codebook property: old
postings never move).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tube_spark.functions.localrel import local_df

from tube_spark.functions import fsio
from tube_spark.operators.retrieval import term_stats
from tube_spark.operators.storelife import StoreManifest

_MANIFEST = "_MANIFEST.json"


def _postings(
    docs: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> tuple[DataFrame, DataFrame]:
    """((term, doc_id, tf, dl, tb) rows, per-doc lengths)."""
    tok, doclen = term_stats(docs, id_col, text_col)
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    rows = tf.join(doclen, id_col).select(
        "term",
        F.col(id_col).alias("doc_id"),
        "tf",
        "dl",
        (F.pmod(F.xxhash64("term"), F.lit(n_buckets))).alias("tb"),
    )
    return rows, doclen


def _sm(spark: SparkSession, path: str) -> StoreManifest:
    return StoreManifest(f"{path}/{_MANIFEST}", spark)


def _read_manifest(spark: SparkSession, path: str) -> dict:
    m = _sm(spark, path).read()
    if m is None:
        raise FileNotFoundError(f"{path}/{_MANIFEST}")
    return m


def _write_manifest(spark: SparkSession, path: str, m: dict) -> None:
    _sm(spark, path).commit(m)


def build_text_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> dict:
    """Tokenize once, write term-bucket-partitioned postings, persist
    corpus stats.  Returns the manifest."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    spark = docs.sparkSession
    rows, doclen = _postings(docs, id_col, text_col, n_buckets)
    rows.write.mode("overwrite").partitionBy("tb").parquet(f"{path}/postings")
    agg = doclen.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("t")
    ).first()
    m = {
        "n_docs": int(agg["n"] or 0),
        "total_dl": int(agg["t"] or 0),
        "n_buckets": n_buckets,
    }
    _write_manifest(spark, path, m)
    return m


def append_text_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_id: int | None = None,
    auto_compact_at: int | None = None,
) -> dict:
    """Add NEW documents (caller guarantees unseen doc_ids — the
    monotone-id contract): postings land as a staged segment committed
    by the manifest write, so the append is TRANSACTIONAL — a crash
    after the segment write but before the manifest write leaves an
    uncommitted directory that ``search_text_index`` never reads, and
    the replay overwrites that same segment before committing it.
    ``batch_id`` additionally makes the append idempotent per streaming
    epoch: an id at or below the manifest's ``last_batch_id`` watermark
    is a replay and becomes a no-op (the shards-sink contract — a bare
    parquet append would NOT be replay-safe, which is why segments
    exist).

    ``auto_compact_at`` enforces the measured compaction rule (search
    cost grows with the per-root plan overhead of each append, 3.2x at
    8 segments — compact at ~4-8) without an operator remembering:
    once THIS append commits and the segment count has reached the
    threshold, the index is compacted in the same call.  The append's
    manifest commit lands first, so a crash mid-compaction loses only
    the compaction, never the append."""
    StoreManifest.check_compact_at(auto_compact_at)
    spark = docs.sparkSession
    m = _read_manifest(spark, path)
    if (
        batch_id is not None
        and m.get("last_batch_id") is not None
        and batch_id <= int(m["last_batch_id"])
    ):
        return m  # replayed epoch: already applied
    rows, doclen = _postings(docs, id_col, text_col, m["n_buckets"])
    # stage: overwrite (never append) so a crashed earlier attempt of
    # this same uncommitted segment is replaced, not duplicated
    seg = int(m.get("next_seg", 0))
    rows.write.mode("overwrite").partitionBy("tb").parquet(
        f"{path}/segments/seg-{seg}"
    )
    agg = doclen.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("t")
    ).first()
    m["n_docs"] += int(agg["n"] or 0)
    m["total_dl"] += int(agg["t"] or 0)
    m["segments"] = sorted(set(m.get("segments", [])) | {seg})
    m["next_seg"] = seg + 1
    if batch_id is not None:
        m["last_batch_id"] = int(batch_id)
    _write_manifest(spark, path, m)  # the commit point
    if auto_compact_at is not None and len(m["segments"]) >= auto_compact_at:
        m = compact_text_index(spark, path)
    return m


def streaming_text_index(
    spark: SparkSession,
    source_dir: str,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    schema=None,
    checkpoint_dir: str | None = None,
    auto_compact_at: int | None = None,
):
    """Structured Streaming ingest into the index (availableNow +
    foreachBatch, the streaming-shards shape): the first batch builds,
    later batches append under the ``last_batch_id`` watermark so
    at-least-once redelivery cannot double-insert postings.  A stream
    is exactly where segments pile up one-per-epoch, so
    ``auto_compact_at`` (see ``append_text_index``) matters most here."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema

    def handle(batch: DataFrame, batch_id: int) -> None:
        if fsio.exists(spark, f"{path}/{_MANIFEST}"):
            append_text_index(
                batch, path, id_col, text_col, batch_id,
                auto_compact_at=auto_compact_at,
            )
        elif not batch.isEmpty():
            m = build_text_index(batch, path, id_col, text_col, n_buckets)
            m["last_batch_id"] = int(batch_id)
            _write_manifest(spark, path, m)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = stream.writeStream.foreachBatch(handle).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def compact_text_index(
    spark: SparkSession, path: str, cleanup: bool = True
) -> dict:
    """Merge the base postings and every committed segment into a fresh
    postings GENERATION and commit it via the manifest pointer —
    search cost returns to one root per query however many appends
    accumulated.  Measured at sf1 (BENCH_NOTES): 8 segments made a
    5-term search 3.2x slower than the compacted store (per-root plan
    overhead, not bytes), so compact when the segment count reaches
    ~4-8.  Same transaction discipline as the appends: the new
    generation directory is invisible until the manifest commits
    (a crash before the commit leaves an orphan the replay overwrites);
    ``cleanup`` then deletes the superseded directories (safe once the
    manifest no longer references them — readers resolve roots from the
    manifest at call time)."""
    m = _read_manifest(spark, path)
    segs = list(m.get("segments", []))
    if not segs:
        # nothing staged: base generation is already compact — but a
        # prior deferred cleanup may have left recorded stale debt;
        # settle it (this IS the "next commit" the deferral promises)
        if cleanup:
            _sm(spark, path).sweep_stale(
                m, lambda name: fsio.delete(spark, f"{path}/{name}")
            )
        return m
    base = m.get("postings_dir", "postings")
    roots = [f"{path}/{base}"] + [f"{path}/segments/seg-{s}" for s in segs]
    merged = None
    for root in roots:
        scan = spark.read.parquet(root)
        merged = scan if merged is None else merged.unionByName(scan)
    gen = int(m.get("next_gen", 1))
    new_dir = StoreManifest.gen_name("postings", gen, sep="-g")
    merged.write.mode("overwrite").partitionBy("tb").parquet(
        f"{path}/{new_dir}"
    )
    m["postings_dir"] = new_dir
    m["segments"] = []
    m["next_gen"] = gen + 1
    # superseded roots ride the manifest until deleted: a crash between
    # the commit and the sweep can never leak a generation forever —
    # the NEXT compaction's sweep settles the recorded debt
    StoreManifest.record_stale(
        m, [base] + [f"segments/seg-{s}" for s in segs]
    )
    _write_manifest(spark, path, m)  # the commit point
    if cleanup:
        _sm(spark, path).sweep_stale(
            m, lambda name: fsio.delete(spark, f"{path}/{name}")
        )
    return m


def search_text_index(
    spark: SparkSession,
    path: str,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k (doc_id, bm25, n_matched_terms) for a bag-of-terms query —
    result-identical to ``retrieval.bm25_topk`` over the indexed corpus
    (exact-equality pytest), but reading only the query terms' bucket
    partitions + term rows instead of the corpus."""
    if not terms:
        raise ValueError("search_text_index needs at least one query term")
    m = _read_manifest(spark, path)
    nb = m["n_buckets"]
    # the terms' buckets, computed the same way the writer bucketed
    buckets = sorted(
        {
            r["tb"]
            for r in local_df(spark, [(t,) for t in set(terms)], "term string")
            .select(F.pmod(F.xxhash64("term"), F.lit(nb)).alias("tb"))
            .collect()
        }
    )
    # current postings generation + every COMMITTED segment (the
    # manifest is the transaction log: uncommitted segment directories
    # are invisible here).  Each root is read separately so partition
    # pruning on tb applies per scan; the isin filters push through
    # the union.
    roots = [f"{path}/{m.get('postings_dir', 'postings')}"] + [
        f"{path}/segments/seg-{s}" for s in m.get("segments", [])
    ]
    post = None
    for root in roots:
        scan = (
            spark.read.parquet(root)
            .filter(F.col("tb").isin(buckets))       # partition pruning
            .filter(F.col("term").isin(list(terms)))  # pushed row filter
        )
        post = scan if post is None else post.unionByName(scan)
    n_docs = F.lit(m["n_docs"])
    avgdl = F.lit(m["total_dl"] / m["n_docs"] if m["n_docs"] else 0.0)
    df_ = post.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.ln(1.0 + (n_docs - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl)
    )
    return (
        post.join(F.broadcast(df_), "term")
        .withColumn("contrib", idf * tf_norm)
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("contrib"), 6).alias("bm25"),
            F.count(F.lit(1)).alias("n_matched_terms"),
        )
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(k)
    )
