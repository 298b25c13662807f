"""Streaming PCA: moment sums maintained across micro-batches.

The Gram/mean/count moments that ``operators.pca.pca_fit`` collects
are sums, so they merge across batches by ADDITION — a corpus that
grows by appends keeps a current PCA model without ever rescanning
what it already saw.  Per batch the heavy work stays distributed (the
same bounded Arrow moment pass as the batch fit: dim*(dim+1) numbers
per batch); the accumulated state is one JSON file of
``dim*(dim+1)/2 + dim + 2`` numbers with the atomic tmp+rename publish
every streaming state here uses.

Delivery semantics: float addition is not a set union, so redelivery
is NOT naturally idempotent — the state carries a ``last_batch_id``
watermark (the shards-sink pattern) and ``process_batch`` no-ops any
batch at or below it.  Equivalence to the batch fit is near-exact, not
bit-exact: the batch pass sums partition partials in Spark's reduction
order, the stream sums batch partials in arrival order — same
multiset of addends, different association, so eigenvalues agree to
float accumulation error (~1e-12 relative; pinned with tight
tolerances in tests/test_streaming_pca.py).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from tube_spark.functions import fsio
from tube_spark.operators.pca import PCAModel, collect_moments, model_from_moments


class StreamingMoments:
    """Maintains PCA moment sums over appended vector batches.

    >>> inc = StreamingMoments(spark, "/tmp/state.json", dim=64)
    >>> inc.process_batch(batch_df, batch_id)   # per micro-batch
    >>> inc.model(k=16)                         # current PCAModel
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        vec_col: str = "embedding",
        dim: int = 64,
    ) -> None:
        if dim <= 0:
            raise ValueError(f"dim must be positive, got {dim}")
        self.spark = spark
        self.state_path = state_path
        self.vec_col = vec_col
        self.dim = dim

    def _load(self) -> dict:
        if fsio.exists(self.spark, self.state_path):
            st = json.loads(fsio.read_text(self.spark, self.state_path))
            if st["dim"] != self.dim:
                raise ValueError(
                    f"state at {self.state_path} has dim {st['dim']}, "
                    f"this ingest is configured for {self.dim}"
                )
            return st
        tri = self.dim * (self.dim + 1) // 2
        return {
            "dim": self.dim,
            "n": 0,
            "s": [0.0] * self.dim,
            "g": [0.0] * tri,
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
        if batch.isEmpty():
            if batch_id is not None:
                st["last_batch_id"] = int(batch_id)
                self._save(st)
            return
        n, s, g = collect_moments(batch, self.vec_col, self.dim)
        st["n"] += n
        st["s"] = [a + b for a, b in zip(st["s"], s)]
        st["g"] = [a + b for a, b in zip(st["g"], g)]
        if batch_id is not None:
            st["last_batch_id"] = int(batch_id)
        self._save(st)

    def moments(self) -> tuple[int, list[float], list[float]]:
        st = self._load()
        return int(st["n"]), list(st["s"]), list(st["g"])

    def model(self, k: int = 16) -> PCAModel:
        n, s, g = self.moments()
        return model_from_moments(n, s, g, self.dim, k)


def streaming_pca_ingest(
    spark: SparkSession,
    source_dir: str,
    state_path: str,
    vec_col: str = "embedding",
    dim: int = 64,
    schema=None,
    checkpoint_dir: str | None = None,
):
    """Structured Streaming wiring (availableNow + foreachBatch), the
    same shape as streaming_corpus_overlap.  Pass a ``checkpoint_dir``
    in production: it scopes files to batch ids, and the state's
    last_batch_id watermark then makes redelivery a no-op."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    inc = StreamingMoments(spark, state_path, vec_col, dim)

    def handle(batch: DataFrame, batch_id: int) -> None:
        inc.process_batch(batch, batch_id)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = stream.writeStream.foreachBatch(handle).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
