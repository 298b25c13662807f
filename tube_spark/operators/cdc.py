"""Content-defined chunking (CDC) for binary payload deduplication.

Fixed-offset chunking breaks on INSERTION: one added byte shifts every
later boundary, so two 99%-identical blobs share zero chunks.  CDC
places boundaries where a rolling hash of the content crosses a
threshold — boundaries are properties of the BYTES, not the offsets,
so an insertion only perturbs the chunks it touches (the storage-dedup
result behind LBFS/restic/borg; Gear hash after Xia et al.'s FastCDC,
USENIX ATC 2016).

Training-data use: media/binary columns carry the same payload wrapped
in different containers (the same video re-muxed, the same image with
different EXIF) — whole-payload hashing misses them, but their CDC
chunk sets overlap massively.  ``chunk_payloads`` emits per-chunk
fingerprints; joining on ``chunk_hash`` is then ordinary exact dedup
(``dedup_exact``) or containment scoring over chunks instead of
shingles.

Determinism: the Gear table is derived from a fixed splitmix64 walk
(seeded constants below), so chunk boundaries are a pure function of
the bytes — stable across runs, partitions, and machines.  Python-side
kernel by necessity (per-byte rolling state over binary), Arrow-batched
via mapInPandas like every media kernel; the per-payload loop is
numpy-free but bounded by ``rows_per_batch`` re-chunking so wide rows
cannot blow worker memory.

Scale shape: embarrassingly parallel map over payloads (explode-shaped
output, no shuffle); downstream chunk-hash joins are the engine's
bread-and-butter keyed aggregations.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MASK64 = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & _MASK64
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _MASK64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _MASK64
    return z ^ (z >> 31)


def gear_table(seed: int = 0x1715) -> list[int]:
    """256 fixed 64-bit gear constants from a splitmix64 walk — the
    whole determinism contract hangs on this table being a constant."""
    out, x = [], seed
    for _ in range(256):
        x = _splitmix64(x)
        out.append(x)
    return out


_GEAR = gear_table()


def cdc_boundaries(
    payload: bytes,
    min_size: int = 256,
    avg_size: int = 1024,
    max_size: int = 4096,
) -> list[int]:
    """Chunk END offsets (exclusive) for one payload.  A boundary is
    declared at byte i when ``gear_hash & mask == 0`` with
    mask = avg_size - 1 (avg_size must be a power of two) — expected
    chunk length avg_size; ``min_size`` suppresses early boundaries
    (the hash needs warm-up and tiny chunks dedup nothing),
    ``max_size`` forces a cut so pathological content (e.g. all zeros,
    which never triggers the mask) cannot produce unbounded chunks."""
    if avg_size & (avg_size - 1):
        raise ValueError(f"avg_size must be a power of two, got {avg_size}")
    if not 0 < min_size <= avg_size <= max_size:
        raise ValueError(
            f"need 0 < min_size <= avg_size <= max_size, got "
            f"{min_size}/{avg_size}/{max_size}"
        )
    mask = avg_size - 1
    bounds = []
    h = 0
    start = 0
    n = len(payload)
    for i in range(n):
        h = ((h << 1) + _GEAR[payload[i]]) & _MASK64
        length = i + 1 - start
        if (length >= min_size and (h & mask) == 0) or length >= max_size:
            bounds.append(i + 1)
            start = i + 1
            h = 0
    if start < n:
        bounds.append(n)
    return bounds


_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("chunk_idx", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("chunk_len", T.LongType()),
        T.StructField("chunk_hash", T.StringType()),
    ]
)


def chunk_payloads(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "media",
    min_size: int = 256,
    avg_size: int = 1024,
    max_size: int = 4096,
    rows_per_batch: int = 64,
) -> DataFrame:
    """One row per content-defined chunk:
    ``(doc_id, chunk_idx, offset, chunk_len, chunk_hash)`` with
    ``chunk_hash`` = hex md5 of the chunk bytes.  Null/empty payloads
    emit no rows.  Joining on ``chunk_hash`` across payloads finds
    shared content through container-level differences."""
    # validate eagerly on the driver — a bad config should raise here,
    # not per-task
    cdc_boundaries(b"", min_size, avg_size, max_size)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for s in range(0, len(pdf), rows_per_batch):
                rows = []
                for did, payload in zip(
                    pdf[id_col].iloc[s : s + rows_per_batch],
                    pdf[payload_col].iloc[s : s + rows_per_batch],
                ):
                    if payload is None:
                        continue
                    raw = bytes(payload)
                    start = 0
                    for ci, end in enumerate(
                        cdc_boundaries(raw, min_size, avg_size, max_size)
                    ):
                        rows.append(
                            {
                                "doc_id": int(did),
                                "chunk_idx": ci,
                                "offset": start,
                                "chunk_len": end - start,
                                "chunk_hash": hashlib.md5(
                                    raw[start:end]
                                ).hexdigest(),
                            }
                        )
                        start = end
                yield pd.DataFrame(
                    rows, columns=[f.name for f in _CHUNK_SCHEMA.fields]
                )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema=_CHUNK_SCHEMA
    )


def chunk_overlap(
    chunks: DataFrame, min_shared: int = 1
) -> DataFrame:
    """Pairwise payload overlap from a chunk frame:
    ``(id_a, id_b, n_shared, bytes_shared, containment_a)`` for pairs
    sharing >= ``min_shared`` distinct chunk hashes — containment_a =
    shared bytes / total bytes of the smaller side's id_a.  The
    chunk-level analog of n-gram containment: one self-join on
    chunk_hash (distinct per doc first, so a chunk repeated inside one
    payload counts once)."""
    d = chunks.select(
        "doc_id", "chunk_hash", "chunk_len"
    ).groupBy("doc_id", "chunk_hash").agg(
        F.max("chunk_len").alias("chunk_len")
    )
    tot = d.groupBy("doc_id").agg(F.sum("chunk_len").alias("tot"))
    a = d.select(
        F.col("doc_id").alias("id_a"), "chunk_hash",
        F.col("chunk_len").alias("len_a"),
    )
    b = d.select(F.col("doc_id").alias("id_b"), "chunk_hash")
    inter = (
        a.join(b, "chunk_hash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.sum("len_a").alias("bytes_shared"),
        )
        .filter(F.col("n_shared") >= min_shared)
    )
    ta = tot.select(F.col("doc_id").alias("id_a"), F.col("tot").alias("tot_a"))
    return inter.join(ta, "id_a").select(
        "id_a",
        "id_b",
        "n_shared",
        "bytes_shared",
        F.round(F.col("bytes_shared") / F.col("tot_a"), 6).alias(
            "containment_a"
        ),
    )
