"""Incremental duplicate-group maintenance over a document stream.

Batch ``dedup_groups`` (operators/components.py) recomputes connected
components from scratch.  This module maintains the SAME grouping
incrementally as new document batches arrive — the ``foreachBatch``
pattern for a corpus that grows by appends:

* **State** (parquet under ``state_dir``): the MinHash signatures and
  LSH band buckets of every document seen so far, plus the current
  ``(doc_id, group_id)`` assignment.  Signatures/buckets are append-only
  (a document's signature never changes); assignments are rewritten via
  versioned directories with a ``_CURRENT`` pointer — the same
  atomic-publish pattern as the versioned index sink.
* **Per batch**: bucket the new documents, join against stored buckets
  (new-vs-all, ids only), score candidates by estimated Jaccard, and
  re-converge connected components ONLY on the delta pairs plus the
  star edges (member -> group root) of the groups they touch.  Groups
  untouched by the batch carry over without being read into the solve.

Equivalence: over any replay schedule, the union of per-batch delta
pairs equals the batch pair set (a pair (a, b) with b in the later
batch is generated exactly when b arrives, via the new-vs-all join),
and re-converging star edges + new edges preserves connectivity — so
the final assignment is IDENTICAL (same group ids, min-id roots) to
running batch ``dedup_groups`` over the full corpus.  Pinned by
tests/test_streaming_dedup_groups.py.

At 100 TB: per-batch cost scales with |batch| x bucket fan-out plus the
size of the TOUCHED groups only, never the corpus; the full-corpus
shuffle of a batch recompute is gone.  State I/O is parquet append +
one assignment rewrite (itself rewritable as a partition-pruned
overwrite keyed by group bucket if assignments outgrow a single
rewrite).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tube_spark.functions import fsio
from tube_spark.operators.components import connected_components
from tube_spark.operators.dedup import (
    minhash_buckets,
    minhash_est_jaccard,
    minhash_signatures,
)


class IncrementalDedupGroups:
    """Maintains near-duplicate groups across appended document batches.

    >>> inc = IncrementalDedupGroups(spark, "/tmp/state")
    >>> inc.process_batch(batch_df)      # call per micro-batch
    >>> inc.assignments()                # (doc_id, group_id)
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 3,
        num_hashes: int = 64,
        bands: int = 16,
        threshold: float = 0.7,
        seed: int = 42,
        portable: bool = False,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.id_col = id_col
        self.text_col = text_col
        self.n = n
        self.num_hashes = num_hashes
        self.bands = bands
        self.threshold = threshold
        self.seed = seed
        self.portable = portable
        fsio.mkdirs(spark, state_dir)

    # -- state paths (Hadoop FS — the state dir may be hdfs:// or
    # s3a://, ADVICE r4) -------------------------------------------------
    @property
    def _sig_dir(self) -> str:
        return fsio.join(self.state_dir, "signatures")

    @property
    def _bucket_dir(self) -> str:
        return fsio.join(self.state_dir, "buckets")

    def _assign_pointer(self) -> str:
        return fsio.join(self.state_dir, "_CURRENT")

    def _current_assign_dir(self) -> str | None:
        p = self._assign_pointer()
        if fsio.exists(self.spark, p):
            v = fsio.read_text(self.spark, p).strip()
            if v:
                return fsio.join(self.state_dir, v)
        # Lost/empty pointer with versions on disk: RECOVER rather than
        # return None — returning None made the next batch compute
        # prev=empty and publish a current holding only that batch,
        # silently dropping every prior doc->group assignment even
        # though the newest assignments_N still held them (ADVICE r6).
        # Prefer the highest version carrying a _SUCCESS commit marker
        # (a crash mid-write leaves a partial dir without one); fall
        # back to the highest dir when no marker exists anywhere
        # (committers with marksuccessfuljobs=false).  The pointer is
        # healed so later reads and publishes resume normally.
        import re

        vers = sorted(
            (
                int(m.group(1))
                for d in fsio.list_names(self.spark, self.state_dir)
                if (m := re.fullmatch(r"assignments_(\d+)", d))
            ),
            reverse=True,
        )
        if not vers:
            return None
        pick = next(
            (
                v
                for v in vers
                if fsio.exists(
                    self.spark,
                    fsio.join(
                        self.state_dir, f"assignments_{v}", "_SUCCESS"
                    ),
                )
            ),
            vers[0],
        )
        name = f"assignments_{pick}"
        fsio.write_text(self.spark, p, name)
        return fsio.join(self.state_dir, name)

    def _publish_assignments(self, df: DataFrame) -> None:
        cur = self._current_assign_dir()
        # _current_assign_dir recovers a lost pointer from the versions
        # on disk, so cur is None only when no assignments_N exists at
        # all — numbering never restarts over a live directory.
        ver = 0 if cur is None else int(cur.rsplit("_", 1)[-1]) + 1
        new_dir = fsio.join(self.state_dir, f"assignments_{ver}")
        df.write.mode("overwrite").parquet(new_dir)
        # pointer swap is the atomic publish (fsio tmp+rename); the
        # previous version stays readable for in-flight readers (GC'd
        # out-of-band)
        fsio.write_text(self.spark, self._assign_pointer(), f"assignments_{ver}")

    def gc_versions(self, keep: int = 2) -> list[str]:
        """Delete assignment versions older than the newest ``keep``
        (the out-of-band GC the publish path defers to).  The current
        version is never deleted; returns the removed directory names."""
        import re

        if keep < 1:
            raise ValueError(f"keep must be >= 1, got {keep}")
        vers = sorted(
            (
                int(m.group(1))
                for d in fsio.list_names(self.spark, self.state_dir)
                if (m := re.fullmatch(r"assignments_(\d+)", d))
            ),
        )
        victims = [f"assignments_{v}" for v in vers[:-keep]]
        for d in victims:
            p = fsio.join(self.state_dir, d)
            fs, jp, _ = fsio._fs(self.spark, p)
            if fs.exists(jp):
                fs.delete(jp, True)
        return victims

    # -- public API ------------------------------------------------------
    def assignments(self) -> DataFrame:
        """Current (doc_id, group_id); empty frame before any batch."""
        cur = self._current_assign_dir()
        if cur is None:
            return self.spark.createDataFrame(
                [], f"{self.id_col} long, group_id long"
            )
        return self.spark.read.parquet(cur)

    def groups(self) -> DataFrame:
        """Batch-compatible output: (doc_id, group_id, group_size,
        is_representative) — same schema as operators.components
        ``dedup_groups``."""
        a = self.assignments()
        sizes = a.groupBy("group_id").agg(F.count(F.lit(1)).alias("group_size"))
        return a.join(sizes, "group_id").select(
            self.id_col,
            "group_id",
            "group_size",
            (F.col(self.id_col) == F.col("group_id")).alias("is_representative"),
        )

    def process_batch(self, batch: DataFrame) -> None:
        ic = self.id_col
        sig_new = minhash_signatures(
            batch, ic, self.text_col, self.n, self.num_hashes, self.seed,
            self.portable,
        ).localCheckpoint()
        buckets_new = minhash_buckets(sig_new, ic, self.num_hashes, self.bands)
        buckets_new = buckets_new.localCheckpoint()

        have_state = fsio.exists(self.spark, self._bucket_dir)
        if have_state:
            buckets_all = self.spark.read.parquet(self._bucket_dir).unionByName(
                buckets_new
            )
            sig_all = self.spark.read.parquet(self._sig_dir).unionByName(sig_new)
        else:
            buckets_all, sig_all = buckets_new, sig_new

        # new-vs-all candidates, ids only; normalized (small, large)
        ca = buckets_new.select(F.col(ic).alias("id_a"), "band", "bh")
        cb = buckets_all.select(F.col(ic).alias("id_b"), "band", "bh")
        cand = (
            ca.join(cb, on=["band", "bh"])
            .filter(F.col("id_a") != F.col("id_b"))
            .select(
                F.least("id_a", "id_b").alias("id_a"),
                F.greatest("id_a", "id_b").alias("id_b"),
            )
            .distinct()
        )
        sa = sig_all.select(F.col(ic).alias("id_a"), F.col("sig").alias("sig_a"))
        sb = sig_all.select(F.col(ic).alias("id_b"), F.col("sig").alias("sig_b"))
        delta_pairs = (
            cand.join(sa, "id_a")
            .join(sb, "id_b")
            .withColumn("est_jaccard", minhash_est_jaccard(self.num_hashes))
            .filter(F.col("est_jaccard") >= self.threshold)
            .select("id_a", "id_b")
            .localCheckpoint()
        )

        prev = self.assignments()
        # groups touched by the delta must be re-solved; everyone else
        # carries over untouched
        delta_nodes = (
            delta_pairs.select(F.col("id_a").alias(ic))
            .unionByName(delta_pairs.select(F.col("id_b").alias(ic)))
            .distinct()
        )
        touched_groups = (
            prev.join(delta_nodes, ic, "left_semi").select("group_id").distinct()
        )
        touched = prev.join(touched_groups, "group_id", "left_semi")
        # star edges preserve the touched groups' connectivity exactly
        star_edges = touched.filter(F.col(ic) != F.col("group_id")).select(
            F.col(ic).alias("id_a"), F.col("group_id").alias("id_b")
        )
        solve_pairs = delta_pairs.unionByName(star_edges)

        resolved = connected_components(solve_pairs).select(
            F.col("node").alias(ic), F.col("component").alias("group_id")
        )
        carried = prev.join(touched_groups, "group_id", "left_anti")
        # batch docs with no pair at all become singleton groups
        batch_ids = batch.select(ic).distinct()
        singleton = (
            batch_ids.join(resolved, ic, "left_anti")
            .join(prev, ic, "left_anti")
            .select(F.col(ic), F.col(ic).alias("group_id"))
        )
        new_assign = carried.unionByName(resolved).unionByName(singleton)
        # state append BEFORE the assignment publish: a crash in between
        # re-delivers the batch (foreachBatch is at-least-once), and
        # duplicate bucket/sig rows are harmless — candidates pass a
        # distinct() and CC dedups edges — whereas the reverse order
        # could publish assignments for docs whose buckets were never
        # stored, silently losing their future pairs
        buckets_new.write.mode("append").parquet(self._bucket_dir)
        sig_new.write.mode("append").parquet(self._sig_dir)
        self._publish_assignments(new_assign)


def replay_stream(
    spark: SparkSession,
    batches: list[DataFrame],
    state_dir: str,
    **kwargs,
) -> DataFrame:
    """Replay document batches through IncrementalDedupGroups and return
    the final batch-compatible grouping — the equivalence-test harness
    (and the body you would hand to ``foreachBatch`` in production)."""
    inc = IncrementalDedupGroups(spark, state_dir, **kwargs)
    for b in batches:
        inc.process_batch(b)
    return inc.groups()


def streaming_dedup_groups(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    schema=None,
    checkpoint_dir: str | None = None,
    **kwargs,
):
    """True Structured Streaming wiring: watch ``source_dir`` for new
    document parquet files and maintain the grouping via
    ``foreachBatch``.  Runs with ``availableNow`` (process everything
    present, then stop) — the idiomatic batch-refresh trigger; swap the
    trigger for continuous ingestion.

    Returns the StreamingQuery; read results with
    ``IncrementalDedupGroups(spark, state_dir).groups()`` after
    ``awaitTermination()``.  Exactly-once note: the maintenance is
    replay-safe at the document level (re-processing a batch re-derives
    the same pairs and the same min-id assignment; signature/bucket
    appends are deduplicated downstream by id), so foreachBatch's
    at-least-once delivery yields the same final grouping.
    """
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    inc = IncrementalDedupGroups(spark, state_dir, **kwargs)

    def handle(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        inc.process_batch(batch)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = stream.writeStream.foreachBatch(handle).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
