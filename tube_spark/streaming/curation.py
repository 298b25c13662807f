"""Incremental corpus curation: the streaming twin of
``operators/curation.py``'s ``curate_corpus``, with EXACT batch
equivalence.

Batch semantics being replicated (one Catalyst plan over the corpus):
quality gate → exact dedup (min id per content) → near-dup drop (for
every word-n-gram Jaccard pair ≥ τ among exact-dedup survivors, the
higher id dies) → survivor stats.

The streaming form maintains three append-only parquet state stores
under ``state_dir`` and processes each micro-batch against them:

* ``fps``      — content fingerprints of every exact-dedup survivor so
                 far (membership probe for cross-batch exact dedup);
* ``shingles`` — the (doc_id, shingle-hash) inverted index of every
                 exact-dedup survivor (including docs later dropped as
                 near-dups — the batch pair universe is exact-dedup
                 survivors, so dropped docs still kill future lookalikes);
* ``sizes``    — per-doc distinct-shingle counts (the |A| in Jaccard);
* ``survivors``— the curated output rows.

Per batch the new docs join the shingle store keyed on shingle hash —
the same inverted-index shape as the batch operator, but with only the
batch on the probe side, so incremental cost scales with the batch,
not the corpus.  State appends are written to a deterministic
``batch=<min-doc-id>`` subdirectory with overwrite, so re-processing a
batch after a crash rewrites identical files instead of duplicating
state (the ``streaming/refresh.py`` idempotency pattern).

**Monotone-id contract**: arrival order must not precede id order
(``min(batch ids) > max(previously seen ids)``, checked per batch and
raised on violation).  This is what lets "drop the higher id of a
pair" commute with incremental processing: by the time a doc arrives,
every potential lower-id partner is already in the store.  Real
ingestion pipelines mint monotonically increasing ids, so the contract
is natural; out-of-order backfills need the batch operator.

Equivalence is proven in tests/test_streaming_curation.py: replaying
any split of the corpus through ``process_batch`` yields exactly
``curate_corpus``'s survivor set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tube_spark.functions import fsio
from tube_spark.operators.dedup import _shingle_hashes, ngram_jaccard_pairs
from tube_spark.operators.text_analysis import text_stats


class IncrementalCuration:
    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        min_quality: float = 0.5,
        ngram_n: int = 1,
        jaccard_threshold: float = 0.8,
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.id_col = id_col
        self.text_col = text_col
        self.min_quality = min_quality
        self.ngram_n = ngram_n
        self.jaccard_threshold = jaccard_threshold

    # -- state I/O (Hadoop FS — the state dir may be hdfs://
    # or s3a://, ADVICE r4) --------------------------------------------
    def _dir(self, name: str) -> str:
        return fsio.join(self.state_dir, name)

    def _read_or_empty(
        self, name: str, schema: str, before=None
    ) -> DataFrame:
        """Read a state store; ``before`` keeps only batches with key <
        ``before`` (monotone keys make that "every earlier batch"), so
        a crash-replayed batch never sees its own prior write."""
        path = self._dir(name)
        if fsio.is_dir(self.spark, path) and any(
            d.startswith("batch=") for d in fsio.list_names(self.spark, path)
        ):
            df = self.spark.read.parquet(path)
            if before is not None:
                df = df.filter(F.col("batch") < before)
            return df.drop("batch")
        return self.spark.createDataFrame([], schema)

    def _append(self, df: DataFrame, name: str, batch_key) -> None:
        # deterministic per-batch subdir + overwrite = replay-idempotent
        df.write.mode("overwrite").parquet(
            fsio.join(self._dir(name), f"batch={batch_key}")
        )

    # -- results -------------------------------------------------------
    def survivors(self) -> DataFrame:
        return self._read_or_empty(
            "survivors",
            f"{self.id_col} long, n_tokens long, lang_pred string, "
            "quality_score double",
        )

    # -- the per-batch maintenance ------------------------------------
    def process_batch(self, batch: DataFrame) -> None:
        idc, txt = self.id_col, self.text_col
        if batch.isEmpty():
            return
        lo, hi = (
            batch.agg(F.min(idc), F.max(idc)).collect()[0]
        )
        replay = fsio.is_dir(self.spark, fsio.join(self._dir("fps"), f"batch={lo}"))
        if not replay:
            prev_max = (
                self._read_or_empty("fps", "fp string, max_id long")
                .agg(F.max("max_id"))
                .collect()[0][0]
            )
            if prev_max is not None and lo <= prev_max:
                raise ValueError(
                    f"monotone-id contract violated: batch min id {lo} <= "
                    f"already-processed max id {prev_max}; out-of-order "
                    "backfills need the batch curate_corpus"
                )
        # crash-replay of an already-processed batch: state reads below
        # exclude batch >= lo (its own prior write) and every state
        # write is an overwrite of the same batch=<lo> dirs with
        # deterministically identical content — replays are idempotent.
        seen_fps = self._read_or_empty("fps", "fp string, max_id long", before=lo)

        # 1. quality gate (stateless)
        stats = text_stats(batch, idc, txt)
        q_stats = stats.filter(F.col("quality_score") >= self.min_quality).select(
            idc, "n_tokens", "lang_pred", "quality_score"
        )
        qdocs = batch.join(q_stats.select(idc), on=idc, how="inner")

        # 2. exact dedup: min id per content within the batch, then
        #    drop content already seen in earlier batches
        fp = F.md5(F.col(txt)).alias("fp")
        w_min = (
            qdocs.select(F.col(idc), fp)
            .groupBy("fp")
            .agg(F.min(idc).alias(idc))
        )
        exact_survivors = qdocs.join(w_min, on=idc, how="left_semi")
        exact_survivors = (
            exact_survivors.withColumn("fp", F.md5(F.col(txt)))
            .join(seen_fps.select("fp"), on="fp", how="left_anti")
        )

        # 3. near-dup drop.  Pair universe = exact-dedup survivors; a
        #    new doc dies if it matches (J >= tau) any STORED doc (all
        #    of which have lower ids under the contract) or a lower-id
        #    batch-mate.
        inv_new = _shingle_hashes(exact_survivors, idc, txt, self.ngram_n)
        sizes_new = inv_new.groupBy(idc).agg(F.count(F.lit(1)).alias("sz"))
        store_inv = self._read_or_empty("shingles", f"{idc} long, sh long", before=lo)
        store_sz = self._read_or_empty("sizes", f"{idc} long, sz long", before=lo)

        inter = (
            inv_new.select(F.col(idc).alias("id_new"), "sh")
            .join(store_inv.select(F.col(idc).alias("id_old"), "sh"), on="sh")
            .groupBy("id_new", "id_old")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
        cross_dropped = (
            inter.join(
                sizes_new.select(F.col(idc).alias("id_new"), F.col("sz").alias("sz_new")),
                on="id_new",
            )
            .join(
                store_sz.select(F.col(idc).alias("id_old"), F.col("sz").alias("sz_old")),
                on="id_old",
            )
            .withColumn(
                "jaccard",
                F.col("n_inter")
                / (F.col("sz_new") + F.col("sz_old") - F.col("n_inter")),
            )
            .filter(F.col("jaccard") >= self.jaccard_threshold)
            .select(F.col("id_new").alias(idc))
            .distinct()
        )
        within_dropped = (
            ngram_jaccard_pairs(
                exact_survivors, idc, txt, n=self.ngram_n,
                threshold=self.jaccard_threshold,
            )
            .select(F.col("id_b").alias(idc))
            .distinct()
        )
        survivors_batch = (
            exact_survivors.join(cross_dropped, on=idc, how="left_anti")
            .join(within_dropped, on=idc, how="left_anti")
            .select(idc)
            .join(q_stats, on=idc, how="inner")
        )

        # 4. idempotent state appends (keyed by the batch's min id)
        self._append(
            exact_survivors.select(
                "fp", F.lit(hi).cast("long").alias("max_id")
            ).distinct(),
            "fps",
            lo,
        )
        self._append(inv_new, "shingles", lo)
        self._append(sizes_new, "sizes", lo)
        self._append(survivors_batch, "survivors", lo)


def replay_curation(
    spark: SparkSession,
    batches: list[DataFrame],
    state_dir: str,
    **kwargs,
) -> DataFrame:
    """Replay batches through IncrementalCuration and return the final
    survivor set — the equivalence-test harness (and the body you would
    hand to ``foreachBatch``)."""
    inc = IncrementalCuration(spark, state_dir, **kwargs)
    for b in batches:
        inc.process_batch(b)
    return inc.survivors()


def streaming_curation(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    schema=None,
    checkpoint_dir: str | None = None,
    **kwargs,
):
    """Structured Streaming wiring: watch ``source_dir`` for document
    parquet files and curate each micro-batch incrementally
    (``availableNow`` — drain then stop).  Read results with
    ``IncrementalCuration(spark, state_dir).survivors()`` after
    ``awaitTermination()``."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    inc = IncrementalCuration(spark, state_dir, **kwargs)

    def handle(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        inc.process_batch(batch)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = stream.writeStream.foreachBatch(handle).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
