"""Streaming near-dup ingestion: the probe-then-append crawl loop.

Each arriving micro-batch of documents is (1) probed against the
persistent near-dup index (operators/neardup_index.py) — hits are
appended to a parquet hit log — then (2) appended into the index so
LATER batches dedup against it.  Within a batch, self-duplicates are
the batch operators' job (the batch is small; history is the 100 TB
side), so this loop only answers delta-vs-history.

Replay contract: index append is NOT idempotent (appending the same
band rows twice doubles candidate fan-out and index size), so the
processor carries a ``last_batch_id`` watermark in its own state file
— the CMS/addition contract (streaming/cms.py), not the Bloom
OR-merge one.  A fully-committed batch id is skipped wholesale: no
double append, no duplicate hit-log rows.

The append itself is guarded by a WRITE-AHEAD intent: the batch id is
recorded as ``pending`` in the state file BEFORE the index append, and
promoted to ``last_batch_id`` only after.  A crash between append and
watermark therefore replays as a DETECTED half-commit, and the replay
compensates instead of re-running blind:

* the probe's hits are anti-joined against the batch's own ids — the
  index may already contain the batch, and without the filter the
  replay would log self-hits, breaking the delta-vs-history contract;
* the append runs with ``if_absent=True`` (anti-join per store table),
  so ids the half-commit already landed are not appended twice — each
  table's saveAsTable append is all-or-nothing at job commit, so
  per-table id presence is the exact compensation predicate.

The hit log is partitioned by batch id (one overwrite-able directory
per batch — the streaming/jsonl.py idempotent-epoch pattern), so a
crash between hit-log write and watermark commit re-emits only that
batch's directory, identically.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tube_spark.operators.neardup_index import NearDupIndex


class StreamingNearDup:
    def __init__(
        self,
        index: NearDupIndex,
        hits_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        threshold: float = 0.7,
        auto_compact_at: int | None = None,
    ) -> None:
        self.index = index
        self.hits_dir = hits_dir
        self.id_col = id_col
        self.text_col = text_col
        self.threshold = threshold
        # a stream is exactly where per-append file accretion piles up
        # one generation per epoch (the searchindex streaming lesson:
        # BM25 search degraded 3.2x at 8 segments) — pass the measured
        # threshold so the loop rewrites the store periodically
        self.auto_compact_at = auto_compact_at

    @property
    def _state_path(self) -> str:
        return os.path.join(self.hits_dir, "_neardup_stream_state.json")

    def _state(self) -> dict:
        if os.path.exists(self._state_path):
            with open(self._state_path) as f:
                return json.load(f)
        return {"last_batch_id": -1}

    def _write_state(self, state: dict) -> None:
        os.makedirs(self.hits_dir, exist_ok=True)
        with open(self._state_path, "w") as f:
            json.dump(state, f)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        state = self._state()
        if batch_id <= state.get("last_batch_id", -1):
            return  # fully-committed redelivery: skip wholesale
        pending = state.get("pending")
        half_committed = bool(pending) and pending.get("batch_id") == batch_id
        hits = self.index.probe(batch, self.id_col, self.text_col, self.threshold)
        if half_committed:
            # the crashed attempt may have appended this batch before
            # its watermark landed, so the index can contain the batch
            # itself — drop those self-hits to keep the hit log
            # delta-vs-history (identical to the crash-free output)
            own = batch.select(
                F.col(self.id_col).alias("indexed_id")
            ).distinct()
            hits = hits.join(own, "indexed_id", "left_anti")
        # one directory per batch: a replayed crash rewrites the same
        # directory with identical content instead of duplicating rows;
        # the batch_id column is carried by the directory name (writing
        # it into the files too would collide with partition discovery)
        hits.write.mode("overwrite").parquet(
            os.path.join(self.hits_dir, f"batch_id={batch_id}")
        )
        if half_committed:
            # compensated re-append: only ids the half-commit missed
            self.index.append(
                batch, self.id_col, self.text_col, if_absent=True,
                auto_compact_at=self.auto_compact_at,
            )
        else:
            # write-ahead intent BEFORE the non-idempotent append: a
            # crash after the append but before the watermark replays
            # as a detected half-commit (branch above), never as a
            # blind double append
            state["pending"] = {"batch_id": batch_id}
            self._write_state(state)
            self.index.append(
                batch, self.id_col, self.text_col,
                auto_compact_at=self.auto_compact_at,
            )
        self._write_state({"last_batch_id": batch_id})

    def hits(self, spark: SparkSession) -> DataFrame:
        """All hit-log rows so far (new_id, indexed_id, est_jaccard,
        batch_id)."""
        return spark.read.option("basePath", self.hits_dir).parquet(
            os.path.join(self.hits_dir, "batch_id=*")
        )


def streaming_neardup_ingest(
    spark: SparkSession,
    source_dir: str,
    proc: StreamingNearDup,
    checkpoint_dir: str | None = None,
    schema=None,
):
    """Structured Streaming wiring (availableNow + foreachBatch):
    watch ``source_dir`` for new document parquet files, run the
    probe-then-append loop per micro-batch, then stop.  The index
    must already exist (``NearDupIndex.build`` on the seed corpus)."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = (
        stream.writeStream.foreachBatch(proc.process_batch)
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
