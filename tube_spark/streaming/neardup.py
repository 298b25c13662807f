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

* the batch's hit directory is KEPT, not recomputed: the write order
  is hits -> intent -> append, so a pending intent proves the hit log
  committed before any of the batch's rows could have reached the
  index — the directory already holds the exact crash-free probe
  output.  (Re-probing and filtering out the batch's own ids would
  also drop legitimate hits against same ids indexed by EARLIER
  batches — re-ingested documents — diverging from the crash-free
  run.)
* the append runs with ``if_absent=True`` (anti-join per store table),
  so ids the half-commit already landed are not appended twice — each
  table's saveAsTable append is all-or-nothing at job commit, so
  per-table id presence is the exact compensation predicate.

The hit log is partitioned by batch id (one overwrite-able directory
per batch — the streaming/jsonl.py idempotent-epoch pattern), so a
crash between hit-log write and watermark commit re-emits only that
batch's directory, identically.  Replay output is therefore
bit-identical to the crash-free output at every crash point.  The
state file itself is written via temp + ``os.replace`` so a crash
mid-write can never leave truncated JSON that wedges the stream.
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
        # temp + atomic rename (the fsio.write_text pattern): a crash
        # mid-write must never leave a truncated JSON that wedges every
        # later _state() with JSONDecodeError — the write-ahead protocol
        # writes this file twice per batch, so the window is real
        os.makedirs(self.hits_dir, exist_ok=True)
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self._state_path)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        state = self._state()
        if batch_id <= state.get("last_batch_id", -1):
            return  # fully-committed redelivery: skip wholesale
        pending = state.get("pending")
        half_committed = bool(pending) and pending.get("batch_id") == batch_id
        if half_committed:
            # write order is hits -> intent -> append, so a pending
            # intent PROVES this batch's hit directory committed before
            # any of its rows could have reached the index — that
            # directory IS the crash-free probe output.  Re-probing now
            # would see the half-appended batch itself, and filtering
            # those self-hits by the batch's ids (the r12 form) also
            # removed legitimate hits against SAME ids indexed by
            # earlier batches — keep the committed directory instead
            # and only finish the append, compensated.
            marker = os.path.join(
                self.hits_dir, f"batch_id={batch_id}", "_SUCCESS"
            )
            if not os.path.exists(marker):
                raise RuntimeError(
                    f"near-dup stream state inconsistent: batch "
                    f"{batch_id} has a pending append intent but its "
                    f"hit directory is missing/incomplete ({marker}); "
                    "the intent is only written after the hit log "
                    "commits, so this state cannot arise from a crash "
                    "— restore the hit directory or clear "
                    f"{self._state_path}"
                )
            self.index.append(
                batch, self.id_col, self.text_col, if_absent=True,
                auto_compact_at=self.auto_compact_at,
            )
        else:
            hits = self.index.probe(
                batch, self.id_col, self.text_col, self.threshold
            )
            # one directory per batch: a replayed crash rewrites the
            # same directory with identical content instead of
            # duplicating rows; the batch_id column is carried by the
            # directory name (writing it into the files too would
            # collide with partition discovery)
            hits.write.mode("overwrite").parquet(
                os.path.join(self.hits_dir, f"batch_id={batch_id}")
            )
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
