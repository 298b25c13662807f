"""Streaming DDSketch quantiles: the per-group bucket counts
maintained across micro-batches.

Bucket counts are SUMS, so the sketch over a stream is the cell-wise
addition of per-batch sketches — after any batch schedule the state is
BIT-IDENTICAL to ``ddsketch_buckets`` over everything seen (pinned by
tests/test_streaming_ddsketch.py).  Addition is NOT
redelivery-idempotent, so the twin carries the ``last_batch_id``
watermark (the CMS / DSIR / shards-sink contract) and skips
already-applied epochs — unlike streaming HLL, whose max-merge needs
no watermark by algebra.

State size is groups x occupied-buckets (a few hundred integers per
group regardless of stream length — the whole point of the sketch),
one JSON file with the atomic tmp+rename publish every streaming state
here uses.  ``quantiles()`` runs the batch extraction expression over
the CURRENT grid, so the relative-error guarantee covers everything
ingested so far.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tube_spark.functions import fsio
from tube_spark.operators.ddsketch import _estimate_expr, ddsketch_buckets


class StreamingDDSketch:
    """Maintains per-group log-bucket counts over appended batches.

    >>> sd = StreamingDDSketch(spark, "/tmp/dd.json", "event_type", "value")
    >>> sd.process_batch(batch, bid)
    >>> sd.quantiles((0.5, 0.99))
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        group_col: str,
        value_col: str,
        sub_bits: int = 5,
    ) -> None:
        if not 1 <= sub_bits <= 12:
            raise ValueError(f"sub_bits must be in [1, 12], got {sub_bits}")
        self.spark = spark
        self.state_path = state_path
        self.group_col = group_col
        self.value_col = value_col
        self.sub_bits = sub_bits

    def _load(self) -> dict:
        if fsio.exists(self.spark, self.state_path):
            st = json.loads(fsio.read_text(self.spark, self.state_path))
            if st["sub_bits"] != self.sub_bits:
                raise ValueError(
                    f"state at {self.state_path} was built with "
                    f"sub_bits={st['sub_bits']}; this ingest is configured "
                    f"for sub_bits={self.sub_bits} — a sketch's mapping is "
                    "frozen at first build"
                )
            return st
        return {"sub_bits": self.sub_bits, "cells": {}, "last_batch_id": None}

    def _save(self, st: dict) -> None:
        parent = self.state_path.rsplit("/", 1)[0]
        if parent and parent != self.state_path:
            fsio.mkdirs(self.spark, parent)
        fsio.write_text(self.spark, self.state_path, json.dumps(st))

    def process_batch(
        self, batch: DataFrame, batch_id: int | None = None
    ) -> None:
        st = self._load()
        if (
            batch_id is not None
            and st["last_batch_id"] is not None
            and batch_id <= int(st["last_batch_id"])
        ):
            return  # replayed epoch: already applied
        if not batch.isEmpty():
            rows = ddsketch_buckets(
                batch, self.group_col, self.value_col, self.sub_bits
            ).collect()
            cells = st["cells"]
            for r in rows:
                k = f"{r[self.group_col]}\x00{r['bucket']}"
                cells[k] = cells.get(k, 0) + r["cnt"]
        if batch_id is not None:
            st["last_batch_id"] = int(batch_id)
        self._save(st)

    def buckets(self) -> DataFrame:
        st = self._load()
        rows = [
            (k.split("\x00")[0], int(k.split("\x00")[1]), int(c))
            for k, c in st["cells"].items()
        ]
        return self.spark.createDataFrame(
            rows, f"{self.group_col} string, bucket long, cnt long"
        )

    def quantiles(self, qs=(0.5, 0.9, 0.99)) -> DataFrame:
        """Batch-identical extraction over the accumulated grid."""
        g = self.group_col
        b = self.buckets()
        w = (
            Window.partitionBy(g)
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = b.select(
            g,
            "bucket",
            F.sum("cnt").over(w).alias("cum"),
            F.sum("cnt").over(Window.partitionBy(g)).alias("n"),
        )
        qf = F.array(*[F.lit(float(q)) for q in qs])
        ranked = cum.select(
            g, "bucket", "cum", "n", F.explode(qf).alias("q")
        ).filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        first = ranked.groupBy(g, "q").agg(
            F.min("bucket").alias("bucket"), F.max("n").alias("n_values")
        )
        return first.select(
            g,
            F.round("q", 4).alias("q"),
            F.round(
                _estimate_expr(F.col("bucket"), self.sub_bits), 6
            ).alias("est_value"),
            F.col("n_values"),
        )


def streaming_ddsketch(
    spark: SparkSession,
    source_dir: str,
    state_path: str,
    group_col: str,
    value_col: str,
    sub_bits: int = 5,
    schema=None,
    checkpoint_dir: str | None = None,
):
    """Structured Streaming wiring (availableNow + foreachBatch), the
    same shape as streaming_cms."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    sd = StreamingDDSketch(spark, state_path, group_col, value_col, sub_bits)

    def handle(batch: DataFrame, batch_id: int) -> None:
        sd.process_batch(batch, batch_id)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = stream.writeStream.foreachBatch(handle).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
