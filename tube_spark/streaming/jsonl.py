"""Streaming JSONL ingestion: a landing zone of JSON-lines files
drains continuously into typed clean/quarantine parquet.

The batch contract is ``sources.jsonl.read_jsonl`` applied per
micro-batch: declared schema, PERMISSIVE parse, malformed lines and
required-column failures preserved with reasons.  Each batch writes
into ``batch=<batch_id>`` subdirectories with overwrite — a replayed
epoch (foreachBatch is at-least-once) rewrites the same directories
with the same rows, so delivery is idempotent without any manifest
state (the streaming/curation.py pattern).

One wrinkle vs the batch path: a file stream hands foreachBatch
ALREADY-PARSED rows, so the corrupt-record column must be declared in
the STREAM schema — Spark populates it during the streamed scan; the
handler only routes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CORRUPT = "_corrupt_record"


def streaming_jsonl_ingest(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    clean_dir: str,
    quarantine_dir: str,
    required: list[str] | None = None,
    checkpoint_dir: str | None = None,
):
    """availableNow + foreachBatch wiring.  Returns the streaming
    query; after it drains, ``clean_dir`` holds schema-typed rows and
    ``quarantine_dir`` holds ``(raw, reason)`` rows, both partitioned
    by ``batch`` for replay-idempotent rewrites."""
    if _CORRUPT in schema:
        raise ValueError(f"schema must not declare {_CORRUPT} itself")
    req = list(required or [])
    full_schema = f"{schema}, {_CORRUPT} string"
    stream = (
        spark.readStream.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(source_dir)
    )
    data_cols = [c for c in stream.columns if c != _CORRUPT]
    for c in req:
        if c not in data_cols:
            raise ValueError(f"required column {c!r} not in schema")

    def handle(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch = batch.localCheckpoint()  # one materialization, two splits
        parsed = batch.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
        malformed = batch.filter(F.col(_CORRUPT).isNotNull()).select(
            F.col(_CORRUPT).alias("raw"), F.lit("malformed").alias("reason")
        )
        if req:
            missing = None
            reason = F.lit(None).cast("string")
            for c in reversed(req):
                cnd = F.col(c).isNull()
                missing = cnd if missing is None else (cnd | missing)
                reason = F.when(cnd, F.lit(f"missing:{c}")).otherwise(reason)
            clean = parsed.filter(~missing)
            bad = parsed.filter(missing).select(
                F.to_json(F.struct(*data_cols)).alias("raw"),
                reason.alias("reason"),
            )
            quarantine = malformed.unionByName(bad)
        else:
            clean, quarantine = parsed, malformed
        # deterministic per-batch subdir + overwrite = replay-idempotent
        clean.write.mode("overwrite").parquet(f"{clean_dir}/batch={batch_id}")
        if not quarantine.isEmpty():
            quarantine.write.mode("overwrite").parquet(
                f"{quarantine_dir}/batch={batch_id}"
            )

    writer = stream.writeStream.foreachBatch(handle).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
