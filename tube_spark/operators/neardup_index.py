"""Persistent near-duplicate index: dedup new data AGAINST HISTORY.

The batch operators (operators/dedup.py) answer "which documents in
THIS frame duplicate each other".  A crawl pipeline's recurring
question is different: "which of today's N documents duplicate
anything in the 100 TB already ingested" — and recomputing pairwise
LSH over history + delta every day is O(corpus) daily.  This module
is the disk shape that makes the probe O(delta):

* **Index state** = two BUCKETED catalog tables (sinks/writer.py
  BucketedTableSink) + a frozen-config manifest:
    - ``<name>_buckets`` (id, bb)   bucketed on ``bb``
    - ``<name>_sigs``    (id, sig)  bucketed on ``id``
  ``bb = band * BAND_M + band_hash`` folds the band into ONE join
  column — a (band, bh) composite key would defeat the layout (hash
  partitioning on ``bh`` does not satisfy a two-column clustered
  distribution, so Spark would reshuffle the store).  Bucketing is
  the point: the probe's candidate join (delta bb rows vs history bb
  rows) and the verify join (candidate ids vs history signatures)
  both hit a pre-hashed layout, so the HISTORY side is never
  reshuffled — only the delta moves (tests assert the store side of
  both joins plans no Exchange).
* **Frozen config**: shingle n, num_hashes, bands, seed and bucket
  count are written to the manifest at build; ``append``/``probe``
  with a mismatched operator config raises — mixed-parameter
  signatures silently never collide (the streaming twin's
  frozen-codebook contract, streaming/lm.py).
* **probe(delta)** -> (new_id, indexed_id, est_jaccard >= threshold):
  banded-LSH candidates against history, verified by signature
  agreement (the same estimator the batch pairs use).  Probing does
  NOT mutate the index; ``append`` commits the delta's rows after
  (probe-then-append is the daily crawl loop).
* **append(delta)**: appends band rows + signatures (saveAsTable
  append keeps the bucket spec) and records the generation in the
  manifest.

Composes with the rest of the dedup family: probe hits feed
``connected_components`` / keep-best survivor election; the
Bloom gate (operators/bloomgate.py) remains the cheaper map-only
pre-filter when only exact membership matters.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tube_spark.operators.dedup import (
    minhash_buckets,
    minhash_est_jaccard,
    minhash_signatures,
)
from tube_spark.sinks.writer import BucketedTableSink


class NearDupIndex:
    def __init__(
        self,
        base_dir: str,
        name: str = "neardup",
        n: int = 3,
        num_hashes: int = 64,
        bands: int = 16,
        seed: int = 42,
        n_buckets: int = 32,
    ) -> None:
        if num_hashes % bands != 0:
            raise ValueError("num_hashes must be divisible by bands")
        self.base_dir = base_dir
        self.name = name
        self.config = {
            "n": n,
            "num_hashes": num_hashes,
            "bands": bands,
            "seed": seed,
            "n_buckets": n_buckets,
        }
        self._buckets = BucketedTableSink(
            f"{name}_buckets", ("bb",), n_buckets=n_buckets
        )
        self._sigs = BucketedTableSink(f"{name}_sigs", ("id",), n_buckets=n_buckets)

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.base_dir, f"{self.name}.neardup.json")

    def _manifest(self) -> dict | None:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return None

    def _check_config(self) -> dict:
        m = self._manifest()
        if m is None:
            raise ValueError(
                f"near-dup index {self.name!r} has no manifest — build() first"
            )
        if m["config"] != self.config:
            raise ValueError(
                "near-dup index config mismatch: index was built with "
                f"{m['config']}, operator configured with {self.config} — "
                "mixed-parameter signatures never collide; rebuild or match"
            )
        return m

    def _sign(self, docs: DataFrame, id_col: str, text_col: str):
        c = self.config
        sig = minhash_signatures(
            docs,
            id_col,
            text_col,
            n=c["n"],
            num_hashes=c["num_hashes"],
            seed=c["seed"],
        ).select(F.col(id_col).alias("id"), "sig")
        from tube_spark.operators.dedup import _BAND_M

        bkt = minhash_buckets(sig, "id", c["num_hashes"], c["bands"]).select(
            "id",
            (F.col("band") * F.lit(_BAND_M) + F.col("bh")).alias("bb"),
        )
        return sig, bkt

    def build(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> dict:
        """Create the index from scratch (overwrites any prior state)."""
        sig, bkt = self._sign(docs, id_col, text_col)
        self._buckets.write(bkt, mode="overwrite")
        self._sigs.write(sig, mode="overwrite")
        n_docs = self._sigs.read(docs.sparkSession).count()
        os.makedirs(self.base_dir, exist_ok=True)
        manifest = {"config": self.config, "generations": [{"op": "build", "n_docs": n_docs}]}
        with open(self._manifest_path, "w") as f:
            json.dump(manifest, f)
        return manifest

    def append(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> dict:
        """Add the delta's signatures/buckets to the index (same frozen
        config; saveAsTable append preserves the bucket spec)."""
        m = self._check_config()
        sig, bkt = self._sign(docs, id_col, text_col)
        self._buckets.write(bkt, mode="append")
        self._sigs.write(sig, mode="append")
        n_docs = docs.select(id_col).distinct().count()
        m["generations"].append({"op": "append", "n_docs": n_docs})
        with open(self._manifest_path, "w") as f:
            json.dump(m, f)
        return m

    def probe(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        threshold: float = 0.7,
    ) -> DataFrame:
        """(new_id, indexed_id, est_jaccard) for every delta document
        whose estimated Jaccard against an indexed document clears the
        threshold.  Read-only; history tables are consumed through
        their bucketed layout (no Exchange on the store side)."""
        self._check_config()
        spark: SparkSession = docs.sparkSession
        # appends may have come from another session (a streaming
        # micro-batch clone — streaming/neardup.py); refresh drops this
        # session's cached file listing so the probe sees them.  Cost:
        # one re-list per probe, which the probe job pays anyway.
        spark.catalog.refreshTable(self._buckets.table)
        spark.catalog.refreshTable(self._sigs.table)
        sig, bkt = self._sign(docs, id_col, text_col)
        sig = sig.localCheckpoint(eager=False)
        bkt = bkt.localCheckpoint(eager=False)
        cand = (
            bkt.withColumnRenamed("id", "new_id")
            .join(
                self._buckets.read(spark).withColumnRenamed("id", "indexed_id"),
                on="bb",
            )
            .select("new_id", "indexed_id")
            .distinct()
        )
        est = minhash_est_jaccard(self.config["num_hashes"])
        return (
            cand.join(sig.select(F.col("id").alias("new_id"), F.col("sig").alias("sig_a")), "new_id")
            .join(
                self._sigs.read(spark).select(
                    F.col("id").alias("indexed_id"), F.col("sig").alias("sig_b")
                ),
                "indexed_id",
            )
            .withColumn("est_jaccard", est)
            .filter(F.col("est_jaccard") >= threshold)
            .select(
                "new_id", "indexed_id", F.round("est_jaccard", 6).alias("est_jaccard")
            )
        )
