"""Streaming shard export: micro-batches append into the training-shard
store under the frozen manifest contract.

Each batch runs ``append_shards`` (rank continuation + boundary-shard
fill), so a file stream of curated documents lands as dataloader-ready
fixed-size shards with a manifest that is correct after every batch —
the terminal stage of a continuously-refreshed training corpus.

Note the idempotency boundary: unlike the KMV/vector-store ingests,
shard append is NOT naturally replay-idempotent (re-appending a batch
would rank its rows again after the published tail), and foreachBatch
is only AT-LEAST-ONCE for external side effects — a crash after the
append completes but before the checkpoint epoch commits replays the
batch.  Idempotence is therefore enforced at the sink: ``handle``
passes its ``batch_id`` to ``append_shards``, which records the last
applied id in the manifest and no-ops any batch at or below that
watermark, so a replayed epoch cannot double-append.  The remaining
window — a crash in the middle of ``append_shards`` itself, after
some data files land but before the manifest publish — leaves the OLD
manifest in place, so ``verify_shards`` flags the affected shards
(count/fingerprint mismatch on a filled boundary, orphan directories
for new shards) before any training job reads it; ``repair_shards``
rolls the store back to the published rank space, after which the
replayed epoch lands exactly once.  The streaming checkpoint is still REQUIRED: it is what
scopes each source file to exactly one batch_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tube_spark.sinks.shards import append_shards


def streaming_shard_export(
    spark: SparkSession,
    source_dir: str,
    store_path: str,
    checkpoint_dir: str,
    schema=None,
):
    """availableNow + foreachBatch wiring; the shard store must already
    exist (``export_shards`` on a seed corpus).  ``checkpoint_dir`` is
    mandatory (see module docstring)."""
    if not checkpoint_dir:
        raise ValueError(
            "streaming_shard_export requires a checkpoint_dir: it is "
            "what scopes each source file to exactly one batch_id, "
            "which the manifest's last_batch_id watermark then makes "
            "replay-idempotent"
        )
    if schema is None:
        schema = spark.read.parquet(source_dir).schema

    def handle(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        # batch_id makes the append idempotent per epoch: a replayed
        # batch (foreachBatch is at-least-once) is a manifest-level
        # no-op — see append_shards.
        append_shards(batch, store_path, batch_id=batch_id)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(handle)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
