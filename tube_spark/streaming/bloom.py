"""Streaming Bloom blocklist: filter words maintained across
micro-batches.

A Bloom filter is mergeable EXACTLY: the filter of a union is the
bitwise OR of the per-part filters (insertion only ever sets bits), so
maintaining the word array over a stream of blocklist appends gives,
after ANY batch schedule, state BIT-IDENTICAL to ``bloom_build`` over
everything seen (pinned by tests/test_streaming_bloom.py).  OR-merge
is idempotent (x | x = x), so at-least-once redelivery of a batch is a
no-op by construction — the KMV-overlap property, no batch_id
bookkeeping needed.

Per batch the heavy work stays distributed (the same explode(k) +
``bit_or`` aggregation as the batch build, output bounded by the word
count); the accumulated state is ceil(m/63) int64s persisted as one
JSON file with the atomic tmp+rename contract every streaming state
here uses.  ``gate()`` probes any frame against the CURRENT filter
through the identical map-only expression the batch gate uses — the
no-false-negative guarantee holds over everything ingested so far.

The streaming shape this enables: an opt-out / takedown / benchmark
feed appends continuously; the nightly 100 TB curation run picks up
the latest words as a plan literal — no rebuild over the full
blocklist history.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from tube_spark.functions import fsio
from tube_spark.operators.bloomgate import bloom_build, bloom_gate

_BITS_PER_WORD = 63


class StreamingBloom:
    """Maintains Bloom filter words over appended blocklist batches.

    >>> sb = StreamingBloom(spark, "/tmp/bloom.json", m_bits=9600, n_hashes=7)
    >>> sb.process_batch(new_blocked_values)   # (col,) rows
    >>> sb.gate(corpus, "text")                # corpus + maybe_blocked
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        col: str = "value",
        m_bits: int = 9600,
        n_hashes: int = 7,
        seed: str = "bloomgate",
    ) -> None:
        if m_bits < _BITS_PER_WORD:
            raise ValueError(f"m_bits must be >= {_BITS_PER_WORD}, got {m_bits}")
        if n_hashes < 1:
            raise ValueError(f"n_hashes must be >= 1, got {n_hashes}")
        self.spark = spark
        self.state_path = state_path
        self.col = col
        self.m_bits = m_bits
        self.n_hashes = n_hashes
        self.seed = seed

    def _load(self) -> dict:
        if fsio.exists(self.spark, self.state_path):
            st = json.loads(fsio.read_text(self.spark, self.state_path))
            if (
                st["m_bits"] != self.m_bits
                or st["n_hashes"] != self.n_hashes
                or st["seed"] != self.seed
            ):
                raise ValueError(
                    f"state at {self.state_path} was built with "
                    f"m_bits={st['m_bits']} n_hashes={st['n_hashes']} "
                    f"seed={st['seed']!r}; this ingest is configured for "
                    f"m_bits={self.m_bits} n_hashes={self.n_hashes} "
                    f"seed={self.seed!r} — a Bloom filter's geometry is "
                    "frozen at first build"
                )
            return st
        return {
            "m_bits": self.m_bits,
            "n_hashes": self.n_hashes,
            "seed": self.seed,
            "words": [0] * (-(-self.m_bits // _BITS_PER_WORD)),
            "n_batches": 0,
        }

    def _save(self, st: dict) -> None:
        parent = self.state_path.rsplit("/", 1)[0]
        if parent and parent != self.state_path:
            fsio.mkdirs(self.spark, parent)
        fsio.write_text(self.spark, self.state_path, json.dumps(st))

    def process_batch(self, batch: DataFrame) -> None:
        st = self._load()
        if not batch.isEmpty():
            delta = bloom_build(
                batch, self.col, self.m_bits, self.n_hashes, self.seed
            )
            st["words"] = [a | b for a, b in zip(st["words"], delta)]
        st["n_batches"] += 1
        self._save(st)

    def words(self) -> list[int]:
        return list(self._load()["words"])

    def gate(
        self, corpus: DataFrame, col: str, flag_col: str = "maybe_blocked"
    ) -> DataFrame:
        return bloom_gate(
            corpus,
            col,
            self.words(),
            self.m_bits,
            self.n_hashes,
            self.seed,
            flag_col,
        )


def streaming_bloom(
    spark: SparkSession,
    source_dir: str,
    state_path: str,
    col: str = "value",
    m_bits: int = 9600,
    n_hashes: int = 7,
    seed: str = "bloomgate",
    schema=None,
    checkpoint_dir: str | None = None,
):
    """Structured Streaming wiring (availableNow + foreachBatch), the
    same shape as streaming_corpus_overlap."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    sb = StreamingBloom(spark, state_path, col, m_bits, n_hashes, seed)

    def handle(batch: DataFrame, batch_id: int) -> None:
        sb.process_batch(batch)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = stream.writeStream.foreachBatch(handle).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
