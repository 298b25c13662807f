"""Streaming DSIR: hashed-bucket bag models maintained across
micro-batches.

The DSIR fit (``operators/dsir.py``) reduces both corpora to
dim-bounded bucket-count tables — counts are SUMS, so a raw pool
and/or a target corpus that grow by appends keep a current importance
model without rescanning what was already counted.  Per batch the
heavy work stays distributed (the same map-only hash/explode +
groupBy(bucket) pass as the batch fit, output bounded by ``dim``);
the accumulated state is one JSON file of at most ``2*dim`` integers
with the atomic tmp+rename publish every streaming state here uses.

Raw and target sides are independent streams with independent
``last_batch_id`` watermarks (count addition is not redelivery-
idempotent — the shards-sink / streaming-PCA pattern).

``log_weights`` scores any document frame against the CURRENT model
through ``operators.dsir.score_against_model`` — the identical float
expression the batch fit uses, so when the streamed state has seen
exactly the batch corpora, the scores are BIT-IDENTICAL to
``dsir_log_weights`` (integer counts merge exactly; pinned in
tests/test_streaming_dsir.py).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tube_spark.functions import fsio
from tube_spark.operators.dsir import _doc_buckets, score_against_model


class StreamingDsir:
    """Maintains DSIR bucket counts over appended raw/target batches.

    >>> sd = StreamingDsir(spark, "/tmp/state.json", dim=512)
    >>> sd.process_batch(raw_batch, bid, side="raw")
    >>> sd.process_batch(tgt_batch, bid, side="target")
    >>> sd.log_weights(docs)        # scores under the current model
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        dim: int = 1024,
        add_k: float = 0.5,
        seed: str = "dsir",
    ) -> None:
        if dim <= 0:
            raise ValueError(f"dim must be positive, got {dim}")
        self.spark = spark
        self.state_path = state_path
        self.id_col = id_col
        self.text_col = text_col
        self.dim = dim
        self.add_k = add_k
        self.seed = seed

    def _load(self) -> dict:
        if fsio.exists(self.spark, self.state_path):
            st = json.loads(fsio.read_text(self.spark, self.state_path))
            if st["dim"] != self.dim or st["seed"] != self.seed:
                raise ValueError(
                    f"state at {self.state_path} was built with "
                    f"dim={st['dim']} seed={st['seed']!r}; this ingest "
                    f"is configured for dim={self.dim} seed={self.seed!r}"
                )
            return st
        return {
            "dim": self.dim,
            "seed": self.seed,
            "rc": {},
            "tc": {},
            "raw_last_batch_id": None,
            "target_last_batch_id": None,
        }

    def _save(self, st: dict) -> None:
        parent = self.state_path.rsplit("/", 1)[0]
        if parent and parent != self.state_path:
            fsio.mkdirs(self.spark, parent)
        fsio.write_text(self.spark, self.state_path, json.dumps(st))

    def process_batch(
        self, batch: DataFrame, batch_id: int | None = None, side: str = "raw"
    ) -> None:
        if side not in ("raw", "target"):
            raise ValueError(f"side must be 'raw' or 'target', got {side!r}")
        key, wm = ("rc", "raw_last_batch_id") if side == "raw" else (
            "tc", "target_last_batch_id"
        )
        st = self._load()
        if (
            batch_id is not None
            and st[wm] is not None
            and batch_id <= int(st[wm])
        ):
            return  # replayed epoch: already applied
        if not batch.isEmpty():
            rows = (
                _doc_buckets(batch, self.id_col, self.text_col, self.dim, self.seed)
                .groupBy("bucket")
                .agg(F.count(F.lit(1)).alias("c"))
                .collect()
            )
            counts = st[key]
            for r in rows:
                b = str(r["bucket"])
                counts[b] = counts.get(b, 0) + r["c"]
        if batch_id is not None:
            st[wm] = int(batch_id)
        self._save(st)

    def model(self) -> DataFrame:
        """Current ``(bucket, rc, tc)`` model frame (dim-bounded)."""
        st = self._load()
        buckets = sorted(set(st["rc"]) | set(st["tc"]), key=int)
        rows = [
            (int(b), st["rc"].get(b, 0), st["tc"].get(b, 0)) for b in buckets
        ]
        return self.spark.createDataFrame(
            rows, "bucket long, rc long, tc long"
        )

    def log_weights(self, docs: DataFrame) -> DataFrame:
        """Score ``docs`` under the current model — same output shape
        (and, given equal counts, bit-identical values) as the batch
        ``dsir_log_weights``."""
        b = _doc_buckets(docs, self.id_col, self.text_col, self.dim, self.seed)
        return score_against_model(
            b, self.model(), self.dim, self.add_k, self.id_col
        )
