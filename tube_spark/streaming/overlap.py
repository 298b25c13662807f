"""Streaming corpus-overlap: KMV sketches maintained across
micro-batches.

KMV is mergeable EXACTLY (Beyer et al., SIGMOD 2007): the k smallest
distinct hashes of a union are the k smallest of the per-part k-minima
unioned — so maintaining the sketch over a stream gives, after any
batch schedule, BIT-IDENTICAL state to the batch sketch over
everything seen (pinned by tests/test_streaming_overlap.py).  Merging
is a set union, so at-least-once redelivery of a batch is a no-op —
idempotent by construction, no dedup bookkeeping needed.

Per batch the heavy work stays distributed (`kmv_minima`: hash +
threshold filter + tiny distinct); the merged state is ≤ k int64s per
corpus, persisted as one JSON file with the same atomic tmp+rename
contract as the other streaming state (`fsio.write_text`).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from tube_spark.functions import fsio
from tube_spark.operators.overlap import kmv_minima, kmv_overlap_stats


class StreamingCorpusOverlap:
    """Maintains per-corpus KMV minima over appended element batches.

    >>> inc = StreamingCorpusOverlap(spark, "/tmp/state.json", k=256)
    >>> inc.process_batch(batch_df)          # (corpus, element) rows
    >>> inc.overlap("crawl_a", "crawl_b")    # one-row estimate frame
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        corpus_col: str = "corpus",
        element_col: str = "element",
        k: int = 256,
        fast_hash: bool = False,
    ) -> None:
        if k <= 0:
            raise ValueError(f"k must be positive, got {k}")
        self.spark = spark
        self.state_path = state_path
        self.corpus_col = corpus_col
        self.element_col = element_col
        self.k = k
        self.fast_hash = fast_hash

    def _load(self) -> dict[str, list[int]]:
        if fsio.exists(self.spark, self.state_path):
            return json.loads(fsio.read_text(self.spark, self.state_path))
        return {}

    def _save(self, state: dict[str, list[int]]) -> None:
        parent = self.state_path.rsplit("/", 1)[0]
        if parent and parent != self.state_path:
            fsio.mkdirs(self.spark, parent)
        fsio.write_text(self.spark, self.state_path, json.dumps(state))

    def process_batch(self, batch: DataFrame) -> None:
        if batch.isEmpty():
            return
        state = self._load()
        per_corpus = kmv_minima(
            batch, self.corpus_col, self.element_col, self.k,
            fast_hash=self.fast_hash,
        ).collect()
        for r in per_corpus:
            c = str(r["corpus"])
            merged = set(state.get(c, [])) | set(int(h) for h in r["minima"])
            state[c] = sorted(merged)[: self.k]
        self._save(state)

    def minima(self, corpus: str) -> list[int]:
        return list(self._load().get(corpus, []))

    def overlap(self, corpus_a: str, corpus_b: str) -> DataFrame:
        """Same one-row schema as ``operators.overlap.corpus_overlap``,
        computed from the maintained sketches."""
        state = self._load()
        stats = kmv_overlap_stats(
            state.get(corpus_a, []), state.get(corpus_b, []), self.k
        )
        return self.spark.createDataFrame(
            [tuple(stats[c] for c in (
                "n_a_est", "n_b_est", "n_union_est", "jaccard_est",
                "n_intersection_est",
            ))],
            "n_a_est double, n_b_est double, n_union_est double, "
            "jaccard_est double, n_intersection_est double",
        )


def streaming_corpus_overlap(
    spark: SparkSession,
    source_dir: str,
    state_path: str,
    corpus_col: str = "corpus",
    element_col: str = "element",
    k: int = 256,
    fast_hash: bool = False,
    schema=None,
    checkpoint_dir: str | None = None,
):
    """Structured Streaming wiring (availableNow + foreachBatch), the
    same shape as streaming_hot_keys / streaming_dedup_groups."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    inc = StreamingCorpusOverlap(
        spark, state_path, corpus_col, element_col, k, fast_hash
    )

    def handle(batch: DataFrame, batch_id: int) -> None:
        inc.process_batch(batch)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = stream.writeStream.foreachBatch(handle).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
