"""Multimodal column plumbing: image/audio/video as opaque binary.

Real decode libraries (Pillow, ffmpeg, torchaudio…) are not available
in this environment, so the *decode kernels are stubs* — clearly marked
below — while everything Spark-side is real and tested: the schema
convention, Arrow-batched ``mapInPandas`` plumbing, batch shaping, and
partition sizing.

Schema convention: a multimodal column is ``binary`` payload plus a
typed metadata struct:

    media: binary
    media_meta: struct<kind string, mime string, width int, height int,
                       duration_ms long, sample_rate int>

Scale notes:
* binary payloads make rows wide — ``bytes_per_batch`` caps Arrow batch
  memory instead of relying on row counts;
* decode is mapInPandas (Arrow columnar transfer, one Python worker per
  core), the one place in the engine where Python in the executor path
  is justified — the work is per-byte media decoding, not relational;
* repartitioning before decode distributes payload bytes, not row
  counts, when sizes are skewed (``repartition_for_payload``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)


def decode_image_stub(payload: bytes) -> dict:
    """STUB — deterministic fake decoder.

    A real implementation would call Pillow/libvips here.  The fake
    derives "dimensions" from the payload bytes so tests are
    deterministic and the Spark plumbing (schema, batching, null
    handling) is exercised for real.
    """
    if payload is None or len(payload) < 4:
        return {"width": 0, "height": 0, "n_bytes": 0, "mean_byte": 0.0}
    return {
        "width": int(payload[0]) + 1,
        "height": int(payload[1]) + 1,
        "n_bytes": len(payload),
        "mean_byte": float(sum(payload[:64]) / min(len(payload), 64)),
    }


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


def decode_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "media",
    rows_per_batch: int = 256,
) -> DataFrame:
    """Extract features from binary payloads via Arrow-batched
    ``mapInPandas``.  Batch size is bounded so a partition of large
    payloads can't blow Python-worker memory."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), rows_per_batch):
                chunk = pdf.iloc[start : start + rows_per_batch]
                feats = [decode_image_stub(p) for p in chunk[payload_col]]
                out = pd.DataFrame(feats)
                out.insert(0, "doc_id", chunk[id_col].values)
                yield out

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema=_DECODE_SCHEMA
    )


def repartition_for_payload(
    df: DataFrame, payload_col: str = "media", target_bytes: int = 64 * 1024 * 1024
) -> DataFrame:
    """Repartition so each partition holds ≈target_bytes of payload.

    Uses a cheap salt keyed on payload length buckets — heavy media rows
    spread across partitions instead of clustering by original file
    order.  (At 100 TB the alternative — row-count-based splits — puts
    hours of video in one task and thumbnails in another.)
    """
    with_len = df.withColumn("__plen", F.length(F.col(payload_col)).cast("long"))
    total = with_len.agg(F.sum("__plen")).collect()[0][0] or 1
    n_parts = max(1, int(total / target_bytes))
    return (
        with_len.repartition(n_parts, F.xxhash64(F.col(payload_col)))
        .drop("__plen")
    )


def frame_sample_stub(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "media",
    every_ms: int = 1000,
) -> DataFrame:
    """STUB frame sampler: a real one would demux video and emit one row
    per sampled frame.  The fake emits ``n = len(payload) % 4 + 1``
    deterministic "frames" so the explode-shaped plumbing (one input row
    → many output rows through mapInPandas) is real."""

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("frame_hash", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                n = (len(payload) % 4 + 1) if payload is not None else 0
                for i in range(n):
                    rows.append(
                        {
                            "doc_id": did,
                            "frame_idx": i,
                            "ts_ms": i * every_ms,
                            "frame_hash": hash((did, i)) & 0x7FFFFFFF,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(run, schema=schema)
