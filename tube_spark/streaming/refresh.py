"""Structured Streaming: incremental refresh + event-time windows.

The reference is pure batch; its only "incremental" behavior is a
run-level freshness gate (skip the ETL when no new transactions,
``tube/etl/outputs/es/timestamp.py:71-79``).  The idiomatic Spark
equivalent is an ``availableNow`` streaming trigger: process exactly
the data that has arrived since the last checkpoint, then stop — same
batch-refresh semantics, but incremental by construction and restart-
safe via the checkpoint dir.

``streaming_daily_event_counts`` is the streaming twin of the batch
``events_window`` query: watermarked event-time daily windows per
event_type.  On an unbounded source the watermark bounds state (late
events beyond 1 day are dropped); with availableNow over files it
drains the backlog and emits the same result as the batch query.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def streaming_daily_event_counts(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Run an availableNow windowed aggregation over the events table and
    return the (materialized) result as a DataFrame."""
    import os

    schema = spark.read.parquet(events_path).schema
    # the file streaming source monitors a DIRECTORY; expose a single
    # LOCAL parquet file through a symlinked temp dir (remote URIs pass
    # straight through — hdfs://s3a:// paths are directories in practice
    # and symlinks don't exist there)
    if "://" not in events_path and not os.path.isdir(events_path):
        d = tempfile.mkdtemp(prefix="tube_spark_stream_")
        os.symlink(os.path.abspath(events_path), os.path.join(d, os.path.basename(events_path)))
        events_path = d
    stream = spark.readStream.schema(schema).parquet(events_path)
    # normalize event time to session-tz TimestampType for watermarking:
    # a long column is nanoseconds (nanosAsLong sources, see session.py),
    # anything else (TIMESTAMP / TIMESTAMP_NTZ) casts directly — a no-op
    # wall-clock shift under the UTC session timezone
    if isinstance(schema["ts"].dataType, T.LongType):
        ts_norm = F.timestamp_micros(F.expr("ts div 1000"))
    else:
        ts_norm = F.col("ts").cast("timestamp")
    stream = stream.withColumn("ts", ts_norm)
    windowed = (
        stream.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("day"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    sink = f"mem_{uuid.uuid4().hex[:12]}"
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="tube_spark_ckpt_")
    q = (
        windowed.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


def streaming_dedup(
    spark: SparkSession,
    source_path: str,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 day",
    transform=None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Streaming exact deduplication: the streaming twin of
    ``operators.dedup.exact_duplicates``'s keep-one side.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    watermark passes the key's first-seen event time, so state is
    bounded on an unbounded stream — the property that makes exact
    dedup viable in a continuous 100 TB ingest (a plain
    ``dropDuplicates`` on a stream would accumulate state forever).
    Duplicates arriving within the watermark horizon are suppressed
    exactly; later re-occurrences are treated as new (by design — the
    horizon IS the dedup contract).  With an ``availableNow`` drain over
    files it emits one row per key, matching the batch twin.
    """
    schema = spark.read.parquet(source_path).schema
    stream = spark.readStream.schema(schema).parquet(source_path)
    if transform is not None:
        stream = transform(stream)
    deduped = stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    sink = f"mem_{uuid.uuid4().hex[:12]}"
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="tube_spark_ckpt_")
    q = (
        deduped.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


def incremental_refresh(
    spark: SparkSession,
    source_path: str,
    transform,
    sink_path: str,
    checkpoint_dir: str,
) -> None:
    """Generic incremental pipeline refresh: stream new source files
    through ``transform`` (DataFrame → DataFrame) into a Parquet sink,
    processing only data not yet covered by the checkpoint."""
    schema = spark.read.parquet(source_path).schema
    stream = spark.readStream.schema(schema).parquet(source_path)
    out = transform(stream)
    q = (
        out.writeStream.format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_versioned_refresh(
    spark: SparkSession,
    source_path: str,
    transform,
    writer,
    checkpoint_dir: str,
    staging_dir: str | None = None,
) -> str | None:
    """Incremental refresh INTO a zero-downtime versioned index.

    The missing piece between ``incremental_refresh`` (streams deltas to
    a parquet dir) and ``VersionedIndexWriter`` (atomic alias swap over
    immutable versions): stream only-new source files through
    ``transform`` into a batch-partitioned staging area, then — if and
    only if new data arrived — publish the full staging content as a
    NEW index version and swap the alias.

    ``foreachBatch`` is at-least-once: a crash between the sink write
    and the checkpoint commit replays the batch with the SAME batch_id.
    Each batch therefore lands in its own ``staging/batch=<id>/``
    subdirectory in ``overwrite`` mode — a replay rewrites the same
    directory instead of appending duplicate rows, making the staging
    area idempotent (effectively exactly-once).  Readers of
    ``writer.read_current`` never see a half-written refresh; a crash
    mid-stream resumes from the checkpoint; a crash between staging and
    publish re-publishes on the next run (same staging content → same
    index content).

    Returns the published version path, or None when no new data.
    """
    import os

    staging = staging_dir or os.path.join(writer.base_dir, f"{writer.index}_staging")
    schema = spark.read.parquet(source_path).schema
    stream = spark.readStream.schema(schema).parquet(source_path)
    out = transform(stream)

    saw_data = {"n": 0}

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        # persist: the batch feeds two actions (count + write) and must
        # not recompute (the file-source batch would re-read its files)
        batch_df.persist()
        try:
            saw_data["n"] += batch_df.count()
            # batch-keyed overwrite: replaying batch N (at-least-once
            # delivery) rewrites batch=N in place — no duplicates
            batch_df.write.mode("overwrite").parquet(
                os.path.join(staging, f"batch={batch_id}")
            )
        finally:
            batch_df.unpersist()

    q = (
        out.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if saw_data["n"] == 0:
        return None  # freshness gate: nothing new, keep current version live
    # partition discovery surfaces the batch dir as a `batch` column —
    # an implementation detail of the staging layout, dropped on publish
    return writer.publish(spark.read.parquet(staging).drop("batch"))
