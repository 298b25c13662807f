"""Streaming heavy hitters: a mergeable Misra-Gries summary maintained
across micro-batches.

The batch operator (``operators/heavyhitters.py``) can afford a second
exact-verification scan; a stream cannot rescan history.  What CAN be
maintained exactly is the Misra-Gries summary itself — MG summaries
are mergeable (Agarwal et al., PODS 2012): summarize each batch with
``misra_gries_candidates``, add counters keywise into the stored
summary, and shrink back to ``k`` entries by subtracting the (k+1)-th
largest count.  The stored state is ≤ k counters plus one error
accumulator — constant size forever, no watermark needed.

Guarantees after any number of batches over a stream of N rows:
* every key with true count > N/(k+1) is present in the summary;
* for any present key, true count ∈ [cnt, cnt + err] where ``err`` is
  the accumulated per-key undercount budget — Σ over batches of
  n_batch/(k+1) (the partition-level MG bound) plus every cross-batch
  shrink cut; err ≤ 2N/(k+1) by the standard merge analysis.  Absent
  keys therefore have true count ≤ err.

``hot_keys`` reports (key, min_count, max_count, guaranteed) rows:
``guaranteed`` marks keys whose LOWER bound already clears the share
threshold — safe to act on (e.g. feed ``skew.py`` salting) without the
exact re-scan; non-guaranteed rows are candidates an offline batch job
can verify.

State is tiny, so it lives on the driver between batches and persists
as a single JSON file (atomic replace) — the same durability contract
as the versioned-publish manifest.  The heavy lifting (per-batch
summaries over arbitrarily large batches) stays distributed.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from tube_spark.functions import fsio
from tube_spark.operators.heavyhitters import misra_gries_candidates


class StreamingHeavyHitters:
    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        key_col: str,
        k: int = 64,
    ) -> None:
        if k <= 0:
            raise ValueError(f"k must be positive, got {k}")
        self.spark = spark
        self.state_path = state_path
        self.key_col = key_col
        self.k = k

    # -- state (Hadoop FS — the state path may be hdfs:// or s3a://,
    # ADVICE r4; fsio.write_text keeps the tmp+rename replace) ---------
    def _load(self) -> dict:
        if fsio.exists(self.spark, self.state_path):
            return json.loads(fsio.read_text(self.spark, self.state_path))
        return {"counters": {}, "n": 0, "err": 0}

    def _save(self, state: dict) -> None:
        parent = self.state_path.rsplit("/", 1)[0]
        if parent and parent != self.state_path:
            fsio.mkdirs(self.spark, parent)
        fsio.write_text(self.spark, self.state_path, json.dumps(state))

    # -- per-batch maintenance ------------------------------------------
    def process_batch(self, batch: DataFrame) -> None:
        n_batch = batch.count()
        if n_batch == 0:
            return
        summary: dict[str, int] = {}
        for r in misra_gries_candidates(batch, self.key_col, self.k).collect():
            key = str(r[self.key_col])
            # SUM across the per-partition summaries — each is an
            # independent lower bound on the key's count in its
            # partition, and partition counts are disjoint
            summary[key] = summary.get(key, 0) + int(r["mg_count"])
        state = self._load()
        counters = state["counters"]
        for key, cnt in summary.items():
            counters[key] = counters.get(key, 0) + int(cnt)
        # per-KEY undercount budget of the batch's partition-level MG
        # summaries: each partition undercounts any key by at most
        # n_p/(k+1), so the batch adds at most n_batch/(k+1) — NOT the
        # (much larger) total mass the summaries dropped
        state["err"] += -(-n_batch // (self.k + 1))
        if len(counters) > self.k:
            # mergeable shrink: subtract the (k+1)-th largest, keep > 0
            ordered = sorted(counters.values(), reverse=True)
            cut = ordered[self.k]
            counters = {
                key: c - cut for key, c in counters.items() if c - cut > 0
            }
            state["err"] += cut
        state["counters"] = counters
        state["n"] += n_batch
        self._save(state)

    # -- reporting -------------------------------------------------------
    def hot_keys(self, min_share: float = 0.0) -> DataFrame:
        """(key, min_count, max_count, guaranteed): every key whose
        UPPER bound clears ``min_share`` of the stream; ``guaranteed``
        when the lower bound already clears it."""
        state = self._load()
        n, err = state["n"], state["err"]
        rows = []
        for key, cnt in sorted(
            state["counters"].items(), key=lambda kv: -kv[1]
        ):
            lo_ct, hi_ct = int(cnt), int(cnt) + err
            if n and hi_ct / n >= min_share:
                rows.append((key, lo_ct, hi_ct, bool(n and lo_ct / n >= min_share)))
        return self.spark.createDataFrame(
            rows, f"{self.key_col} string, min_count long, max_count long, guaranteed boolean"
        )


def streaming_hot_keys(
    spark: SparkSession,
    source_dir: str,
    state_path: str,
    key_col: str,
    k: int = 64,
    schema=None,
    checkpoint_dir: str | None = None,
):
    """Structured Streaming wiring (availableNow + foreachBatch), the
    same shape as streaming_dedup_groups / streaming_curation."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    hh = StreamingHeavyHitters(spark, state_path, key_col, k)

    def handle(batch: DataFrame, batch_id: int) -> None:
        hh.process_batch(batch)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = stream.writeStream.foreachBatch(handle).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
