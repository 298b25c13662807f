"""Streaming bigram LM: bigram counts maintained across micro-batches
under a FROZEN vocabulary.

Bigram counts are sums, so a training corpus that grows by appends
keeps a current perplexity model without rescanning — with one
contract: the ``<unk>`` vocabulary cut must be FROZEN up front (from a
seed corpus via ``operators.lm.top_vocab``, or supplied externally).
A top-V cut is a global order statistic and is NOT mergeable — tokens
counted as ``<unk>`` under yesterday's vocabulary cannot be re-binned
when today's data changes the top-V — so the streaming twin freezes
it, exactly the frozen-centroid / frozen-codebook / frozen-histogram-
bounds contract every other streaming artifact here uses.  Re-cutting
the vocabulary = a batch re-fit (``bigram_lm_perplexity``), the same
rebuild-vs-append trade the vector store documents.

Per batch the heavy work stays distributed (the same map-only bigram
construction + (w1, w2) groupBy as the batch fit, output bounded by
``(V+1)^2`` under the cap); accumulated state is one JSON file of
bigram counts with the atomic tmp+rename publish.  Counts are not
redelivery-idempotent, so the state carries a ``last_batch_id``
watermark (the shards-sink pattern).

``perplexity`` scores any document frame through
``operators.lm.score_with_bigram_counts`` — the identical float
expression as the batch fit, so when the streamed state has seen
exactly the batch corpus (same frozen vocab), scores are BIT-IDENTICAL
(pinned in tests/test_streaming_lm.py).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tube_spark.functions import fsio
from tube_spark.operators.lm import _doc_bigrams, score_with_bigram_counts

_SEP = "\t"


class StreamingBigramLM:
    """Maintains bigram counts over appended training batches.

    >>> lm = StreamingBigramLM(spark, "/tmp/state.json", vocab=words)
    >>> lm.process_batch(batch_df, batch_id)     # per micro-batch
    >>> lm.perplexity(docs)                      # score under current model
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        vocab: list[str] | None = None,
        id_col: str = "doc_id",
        text_col: str = "text",
        add_k: float = 0.5,
    ) -> None:
        self.spark = spark
        self.state_path = state_path
        self.vocab = sorted(set(vocab)) if vocab is not None else None
        self.id_col = id_col
        self.text_col = text_col
        self.add_k = add_k

    def _vocab_df(self) -> DataFrame | None:
        if self.vocab is None:
            return None
        return self.spark.createDataFrame(
            [(w,) for w in self.vocab], "term string"
        )

    def _load(self) -> dict:
        if fsio.exists(self.spark, self.state_path):
            st = json.loads(fsio.read_text(self.spark, self.state_path))
            if st["vocab"] != self.vocab:
                raise ValueError(
                    f"state at {self.state_path} was built under a "
                    "different frozen vocabulary — the <unk> cut is not "
                    "mergeable; re-fit in batch to change it"
                )
            return st
        return {"vocab": self.vocab, "c12": {}, "last_batch_id": None}

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
            rows = (
                _doc_bigrams(batch, self.id_col, self.text_col, self._vocab_df())
                .groupBy("w1", "w2")
                .agg(F.count(F.lit(1)).alias("c"))
                .collect()
            )
            c12 = st["c12"]
            for r in rows:
                k = f"{r['w1']}{_SEP}{r['w2']}"
                c12[k] = c12.get(k, 0) + r["c"]
        if batch_id is not None:
            st["last_batch_id"] = int(batch_id)
        self._save(st)

    def counts(self) -> DataFrame:
        """Current ``(w1, w2, c12)`` model frame."""
        st = self._load()
        rows = [
            (*k.split(_SEP, 1), int(v)) for k, v in sorted(st["c12"].items())
        ]
        return self.spark.createDataFrame(rows, "w1 string, w2 string, c12 long")

    def perplexity(self, docs: DataFrame) -> DataFrame:
        """Score ``docs`` under the current model — same output shape
        (and, given equal counts, bit-identical values) as the batch
        ``bigram_lm_perplexity`` under the same frozen vocabulary."""
        big = _doc_bigrams(docs, self.id_col, self.text_col, self._vocab_df())
        return score_with_bigram_counts(big, self.counts(), self.add_k, self.id_col)
