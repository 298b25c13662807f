"""Streaming shard export: micro-batches append into the training-shard
store under the frozen manifest contract.

Each batch runs ``append_shards`` (rank continuation + boundary-shard
fill), so a file stream of curated documents lands as dataloader-ready
fixed-size shards with a manifest that is correct after every batch —
the terminal stage of a continuously-refreshed training corpus.

Note the idempotency boundary: unlike the KMV/vector-store ingests,
shard append is NOT replay-idempotent (re-appending a batch would rank
its rows again after the published tail).  The Structured Streaming
checkpoint is therefore REQUIRED here — foreachBatch's epoch tracking
is what guarantees each batch lands exactly once; this mirrors how the
versioned-sink foreachBatch handles non-idempotent publishes.
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
            "streaming_shard_export requires a checkpoint_dir: shard "
            "append is not replay-idempotent, the streaming checkpoint "
            "is what makes delivery exactly-once"
        )
    if schema is None:
        schema = spark.read.parquet(source_dir).schema

    def handle(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        append_shards(batch, store_path)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(handle)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
