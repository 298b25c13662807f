"""Streaming exact-k weighted sample: an Efraimidis-Spirakis reservoir
maintained across micro-batches.

A-ES keys are DETERMINISTIC here (``operators/sampling.py``
``weighted_sample_k``: u from a salted portable hash of the id, key =
ln(u)/w), which makes the reservoir exactly mergeable: the top-k keys
of a union are the top-k of (per-batch top-k  ∪  current reservoir).
After any batch schedule the reservoir is BIT-IDENTICAL to the batch
sample over everything seen (pinned by tests/test_streaming_sample.py)
— and because a replayed row carries the same id, weight, and
therefore the same key, max/top-k absorbs it: at-least-once redelivery
is a no-op with NO batch_id bookkeeping (the KMV / Bloom idempotent-
merge family; contrast the additive DSIR/CMS twins, which need the
watermark).

Contract: an id's weight must be stable across deliveries (same row,
same key) — the same monotone-id/frozen-payload contract the streaming
curation and shard sinks document.  Per batch the heavy work stays
distributed (the batch TakeOrderedAndProject top-k over just the
delta); the state is k (id, key, payload) rows in one JSON file with
the atomic tmp+rename publish every streaming state here uses.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tube_spark.functions import fsio
from tube_spark.functions.text import portable_hash60


class StreamingSample:
    """Maintains a deterministic weighted exact-k sample over appended
    batches.

    >>> ss = StreamingSample(spark, "/tmp/sample.json", k=100)
    >>> ss.process_batch(batch)        # rows with id + weight columns
    >>> ss.sample()                    # k rows, sample_rank 1..k
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        k: int,
        id_col: str = "doc_id",
        weight_col: str = "weight",
        seed: str = "wsample",
        id_type: str = "long",
    ) -> None:
        if k <= 0:
            raise ValueError(f"k must be positive, got {k}")
        self.spark = spark
        self.state_path = state_path
        self.k = k
        self.id_col = id_col
        self.weight_col = weight_col
        self.seed = seed
        self.id_type = id_type

    def _load(self) -> dict:
        if fsio.exists(self.spark, self.state_path):
            st = json.loads(fsio.read_text(self.spark, self.state_path))
            if st["k"] != self.k or st["seed"] != self.seed:
                raise ValueError(
                    f"state at {self.state_path} was built with "
                    f"k={st['k']} seed={st['seed']!r}; this ingest is "
                    f"configured for k={self.k} seed={self.seed!r}"
                )
            return st
        return {"k": self.k, "seed": self.seed, "rows": []}

    def _save(self, st: dict) -> None:
        parent = self.state_path.rsplit("/", 1)[0]
        if parent and parent != self.state_path:
            fsio.mkdirs(self.spark, parent)
        fsio.write_text(self.spark, self.state_path, json.dumps(st))

    def _batch_topk(self, batch: DataFrame) -> list[dict]:
        w = F.col(self.weight_col).cast("double")
        h = portable_hash60(
            F.concat(F.lit(self.seed), F.col(self.id_col).cast("string"))
        )
        u = (h.cast("double") + F.lit(1.0)) / F.lit(float(1 << 60))
        rows = (
            batch.filter(w > 0)
            .withColumn("__wkey", F.log(u) / w)
            .orderBy(F.col("__wkey").desc(), F.col(self.id_col).asc())
            .limit(self.k)
            .select(
                F.col(self.id_col).alias("id"),
                F.col(self.weight_col).cast("double").alias("weight"),
                F.col("__wkey").alias("key"),
            )
            .collect()
        )
        return [
            {"id": r["id"], "weight": r["weight"], "key": r["key"]}
            for r in rows
        ]

    def process_batch(self, batch: DataFrame) -> None:
        st = self._load()
        if not batch.isEmpty():
            merged = {r["id"]: r for r in st["rows"]}
            for r in self._batch_topk(batch):
                merged[r["id"]] = r  # same id -> same key: idempotent
            st["rows"] = sorted(
                merged.values(), key=lambda r: (-r["key"], r["id"])
            )[: self.k]
        self._save(st)

    def sample(self) -> DataFrame:
        st = self._load()
        rows = [
            (r["id"], r["weight"], i + 1)
            for i, r in enumerate(st["rows"])
        ]
        return self.spark.createDataFrame(
            rows,
            f"{self.id_col} {self.id_type}, {self.weight_col} double, "
            "sample_rank int",
        )


def streaming_sample(
    spark: SparkSession,
    source_dir: str,
    state_path: str,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "weight",
    seed: str = "wsample",
    schema=None,
    checkpoint_dir: str | None = None,
):
    """Structured Streaming wiring (availableNow + foreachBatch), the
    same shape as streaming_corpus_overlap / streaming_bloom."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    ss = StreamingSample(spark, state_path, k, id_col, weight_col, seed)

    def handle(batch: DataFrame, batch_id: int) -> None:
        ss.process_batch(batch)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = stream.writeStream.foreachBatch(handle).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
