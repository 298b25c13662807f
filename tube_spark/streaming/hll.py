"""Streaming HyperLogLog: distinct-count registers maintained across
micro-batches.

HLL registers are mergeable EXACTLY: the register array of a union is
the elementwise MAX of the per-part arrays (a register only ever
ratchets upward), so maintaining the array over a stream gives, after
ANY batch schedule, state BIT-IDENTICAL to ``hll_registers`` over
everything seen (pinned by tests/test_hll.py).  MAX-merge is
idempotent (max(x, x) = x), so at-least-once redelivery of a batch is
a no-op by algebra — the Bloom OR-merge contract, no batch_id
bookkeeping needed (contrast streaming/cms.py, whose counters ADD and
therefore carry a watermark).

Per batch the heavy work stays distributed (the same map +
map-side-combinable max agg as the batch build, output bounded by m
rows); the accumulated state is m = 2^p ints persisted as one JSON
file with the atomic tmp+rename contract every streaming state here
uses.  ``estimate()`` runs the standard estimator (with linear-counting
small-range correction) on the CURRENT array — identical arithmetic to
``hll_estimate``.

The streaming shape this enables: unique users / unique tokens per
feed tracked continuously in kilobytes of state, queryable at any
instant, with late or replayed data harmless by construction.
"""

from __future__ import annotations

import json
import math

from pyspark.sql import DataFrame, SparkSession

from tube_spark.functions import fsio
from tube_spark.operators.hll import _alpha, hll_registers

_HASH_BITS = 60


class StreamingHLL:
    """Maintains HLL registers over appended element batches.

    >>> sh = StreamingHLL(spark, "/tmp/hll.json", col="user_id", p=10)
    >>> sh.process_batch(new_events)
    >>> sh.estimate()
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        col: str = "value",
        p: int = 8,
        seed: str = "hll",
    ) -> None:
        if not 4 <= p <= 16:
            raise ValueError(f"p must be in [4, 16], got {p}")
        self.spark = spark
        self.state_path = state_path
        self.col = col
        self.p = p
        self.seed = seed

    def _load(self) -> dict:
        if fsio.exists(self.spark, self.state_path):
            st = json.loads(fsio.read_text(self.spark, self.state_path))
            if st["p"] != self.p or st["seed"] != self.seed:
                raise ValueError(
                    f"state at {self.state_path} was built with "
                    f"p={st['p']} seed={st['seed']!r}; this ingest is "
                    f"configured for p={self.p} seed={self.seed!r} — "
                    "register geometry is frozen at first build"
                )
            return st
        return {
            "p": self.p,
            "seed": self.seed,
            "registers": [0] * (1 << self.p),
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
            regs = st["registers"]
            for r in hll_registers(batch, self.col, self.p, self.seed).collect():
                j = r["j"]
                if r["m_rank"] > regs[j]:
                    regs[j] = r["m_rank"]
        st["n_batches"] += 1
        self._save(st)

    def registers(self) -> list[int]:
        return list(self._load()["registers"])

    def estimate(self) -> float:
        regs = self.registers()
        m = 1 << self.p
        s = sum(2.0 ** -r for r in regs)
        n_zero = sum(1 for r in regs if r == 0)
        raw = _alpha(m) * m * m / s
        if raw <= 2.5 * m and n_zero > 0:
            return round(m * math.log(m / n_zero), 4)
        return round(raw, 4)


def streaming_hll(
    spark: SparkSession,
    source_dir: str,
    state_path: str,
    col: str = "value",
    p: int = 8,
    seed: str = "hll",
    schema=None,
    checkpoint_dir: str | None = None,
):
    """Structured Streaming wiring (availableNow + foreachBatch), the
    same shape as streaming_bloom."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    sh = StreamingHLL(spark, state_path, col, p, seed)

    def handle(batch: DataFrame, batch_id: int) -> None:
        sh.process_batch(batch)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = stream.writeStream.foreachBatch(handle).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
