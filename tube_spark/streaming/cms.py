"""Streaming Count-Min sketch: the counter grid maintained across
micro-batches.

CMS counters are SUMS, so the grid over a stream is the cell-wise
addition of per-batch grids — after any batch schedule the state is
BIT-IDENTICAL to ``cms_build`` over everything seen (pinned by
tests/test_streaming_cms.py).  Addition is NOT redelivery-idempotent,
so the twin carries the ``last_batch_id`` watermark (the DSIR /
streaming-PCA / shards-sink contract) and skips already-applied
epochs.

Per batch the heavy work stays distributed (the same explode(depth) +
keyed count as the batch build, output bounded by d*w); the
accumulated state is at most d*w integers in one JSON file with the
atomic tmp+rename publish every streaming state here uses.
``estimate()`` probes any key frame against the CURRENT grid through
the identical expression the batch estimator uses, so the (eps, delta)
never-undercount guarantee covers everything ingested so far.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tube_spark.functions import fsio
from tube_spark.operators.cms import cms_build, cms_estimate


class StreamingCms:
    """Maintains a Count-Min grid over appended element batches.

    >>> sc = StreamingCms(spark, "/tmp/cms.json", width=544, depth=5)
    >>> sc.process_batch(batch, bid)     # rows with a key column
    >>> sc.estimate(probe_keys, "token") # never-undercount estimates
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        col: str = "value",
        width: int = 544,
        depth: int = 5,
        seed: str = "cms",
        weight_col: str | None = None,
    ) -> None:
        if width < 1 or depth < 1:
            raise ValueError(f"width/depth must be >= 1, got {width}/{depth}")
        self.spark = spark
        self.state_path = state_path
        self.col = col
        self.width = width
        self.depth = depth
        self.seed = seed
        self.weight_col = weight_col

    def _load(self) -> dict:
        if fsio.exists(self.spark, self.state_path):
            st = json.loads(fsio.read_text(self.spark, self.state_path))
            if (
                st["width"] != self.width
                or st["depth"] != self.depth
                or st["seed"] != self.seed
            ):
                raise ValueError(
                    f"state at {self.state_path} was built with "
                    f"width={st['width']} depth={st['depth']} "
                    f"seed={st['seed']!r}; this ingest is configured for "
                    f"width={self.width} depth={self.depth} "
                    f"seed={self.seed!r} — a sketch's geometry is frozen "
                    "at first build"
                )
            return st
        return {
            "width": self.width,
            "depth": self.depth,
            "seed": self.seed,
            "cells": {},
            "last_batch_id": None,
        }

    def _save(self, st: dict) -> None:
        parent = self.state_path.rsplit("/", 1)[0]
        if parent and parent != self.state_path:
            fsio.mkdirs(self.spark, parent)
        fsio.write_text(self.spark, self.state_path, json.dumps(st))

    def process_batch(self, batch: DataFrame, batch_id: int | None = None) -> None:
        st = self._load()
        if (
            batch_id is not None
            and st["last_batch_id"] is not None
            and batch_id <= int(st["last_batch_id"])
        ):
            return  # replayed epoch: already applied
        if not batch.isEmpty():
            rows = cms_build(
                batch, self.col, self.width, self.depth, self.seed,
                self.weight_col,
            ).collect()
            cells = st["cells"]
            for r in rows:
                k = f"{r['r']}:{r['b']}"
                cells[k] = cells.get(k, 0) + r["c"]
        if batch_id is not None:
            st["last_batch_id"] = int(batch_id)
        self._save(st)

    def grid(self) -> DataFrame:
        st = self._load()
        rows = [
            (int(k.split(":")[0]), int(k.split(":")[1]), int(c))
            for k, c in st["cells"].items()
        ]
        if not rows:
            rows = []
        return self.spark.createDataFrame(rows, "r int, b long, c long")

    def estimate(
        self, probes: DataFrame, key_col: str, est_col: str = "est"
    ) -> DataFrame:
        return cms_estimate(
            probes, key_col, self.grid(), self.width, self.depth,
            self.seed, est_col,
        )


def streaming_cms(
    spark: SparkSession,
    source_dir: str,
    state_path: str,
    col: str = "value",
    width: int = 544,
    depth: int = 5,
    seed: str = "cms",
    schema=None,
    checkpoint_dir: str | None = None,
):
    """Structured Streaming wiring (availableNow + foreachBatch), the
    same shape as streaming_corpus_overlap / streaming_bloom."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    sc = StreamingCms(spark, state_path, col, width, depth, seed)

    def handle(batch: DataFrame, batch_id: int) -> None:
        sc.process_batch(batch, batch_id)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = stream.writeStream.foreachBatch(handle).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
