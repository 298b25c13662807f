"""Streaming column profile: mergeable per-column statistics maintained
across micro-batches.

``operators/profile.py``'s batch profile is one aggregate pass; this is
its continuously-refreshed twin for an append-only corpus.  Everything
kept in state is MERGEABLE:

* moments — count / null count / sum / sum-of-squares / min / max are
  sums (or monotone extrema), so batches merge by addition;
* distinct counts — a per-column KMV sketch (the k smallest distinct
  portable hashes of the column's values, the exact machinery of
  ``operators/overlap.py``): union-and-truncate merges it, and the
  estimate is EXACT while the column has fewer than k distinct values,
  the Beyer et al. estimator beyond.

Per batch the heavy work stays distributed: one whole-stage aggregate
for the moments and one bounded top-k pass for the sketches, with the
incremental KMV lever that only rows hashing BELOW the current k-th
minimum can change the sketch — the pre-filter drops everything else
before the distinct shuffle, so a mature sketch makes later batches
nearly free.  Accumulated state is one JSON file (a handful of numbers
plus k hashes per profiled column) with the atomic tmp+rename publish
every streaming state here uses.

Delivery semantics: the KMV union is redelivery-idempotent (set
union), but the moment sums are not — the state carries a
``last_batch_id`` watermark (the shards-sink / streaming-PCA pattern)
and ``process_batch`` no-ops any batch at or below it.

Equivalence to the batch profile: n / n_null / min / max / distinct
(below k) are exact; mean and stddev are computed from the moment sums,
so they agree with the batch pass to float accumulation error (pinned
with tight tolerances in tests/test_streaming_profile.py).
"""

from __future__ import annotations

import json
import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tube_spark.functions import fsio
from tube_spark.functions.text import portable_hash60
from tube_spark.operators.overlap import _kmv_estimate
from tube_spark.operators.profile import _NUMERIC

_SPACE = float(1 << 60)


class StreamingProfile:
    """Maintains a mergeable per-column profile over appended batches.

    >>> sp = StreamingProfile(spark, "/tmp/state.json", cols=[...])
    >>> sp.process_batch(batch_df, batch_id)    # per micro-batch
    >>> sp.report()                             # current profile DF
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        cols: list[str],
        kmv_k: int = 256,
    ) -> None:
        if not cols:
            raise ValueError("cols must be non-empty")
        if kmv_k <= 0:
            raise ValueError(f"kmv_k must be positive, got {kmv_k}")
        self.spark = spark
        self.state_path = state_path
        self.cols = list(cols)
        self.k = kmv_k

    def _load(self) -> dict:
        if fsio.exists(self.spark, self.state_path):
            st = json.loads(fsio.read_text(self.spark, self.state_path))
            if st["cols"] != self.cols or st["k"] != self.k:
                raise ValueError(
                    f"state at {self.state_path} profiles "
                    f"{st['cols']} (k={st['k']}); this profiler is "
                    f"configured for {self.cols} (k={self.k})"
                )
            return st
        return {
            "cols": self.cols,
            "k": self.k,
            "n": 0,
            "stats": {
                c: {
                    "cnt": 0,
                    "sum": 0.0,
                    "sumsq": 0.0,
                    "min": None,
                    "max": None,
                    "minima": [],
                }
                for c in self.cols
            },
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
        types = {f.name: f.dataType for f in batch.schema.fields}
        missing = [c for c in self.cols if c not in types]
        if missing:
            raise ValueError(f"batch is missing profiled columns {missing}")
        if not batch.isEmpty():
            numeric = {c for c in self.cols if isinstance(types[c], _NUMERIC)}
            aggs = [F.count(F.lit(1)).alias("__n")]
            for i, c in enumerate(self.cols):
                aggs.append(F.count(F.col(c)).alias(f"__cnt{i}"))
                if c in numeric:
                    x = F.col(c).cast("double")
                    aggs += [
                        F.sum(x).alias(f"__s{i}"),
                        F.sum(x * x).alias(f"__q{i}"),
                        F.min(x).alias(f"__mn{i}"),
                        F.max(x).alias(f"__mx{i}"),
                    ]
            row = batch.agg(*aggs).collect()[0]
            st["n"] += row["__n"]
            for i, c in enumerate(self.cols):
                cs = st["stats"][c]
                cs["cnt"] += row[f"__cnt{i}"]
                if c in numeric and row[f"__mn{i}"] is not None:
                    cs["sum"] += row[f"__s{i}"]
                    cs["sumsq"] += row[f"__q{i}"]
                    cs["min"] = (
                        row[f"__mn{i}"]
                        if cs["min"] is None
                        else min(cs["min"], row[f"__mn{i}"])
                    )
                    cs["max"] = (
                        row[f"__mx{i}"]
                        if cs["max"] is None
                        else max(cs["max"], row[f"__mx{i}"])
                    )
            self._merge_sketches(st, batch)
        if batch_id is not None:
            st["last_batch_id"] = int(batch_id)
        self._save(st)

    def _merge_sketches(self, st: dict, batch: DataFrame) -> None:
        """Union-and-truncate the per-column KMV sketches with the
        batch's values.  Incremental lever: once a sketch holds k
        hashes, only hashes strictly below its current k-th minimum can
        enter — the CASE threshold drops everything else before the
        distinct shuffle."""
        stack = ", ".join(
            "'{0}', cast(`{0}` as string)".format(c) for c in self.cols
        )
        pairs = (
            batch.selectExpr(f"stack({len(self.cols)}, {stack}) as (c, v)")
            .where(F.col("v").isNotNull())
            .select("c", portable_hash60(F.col("v")).alias("h"))
        )
        thr = F.lit(None).cast("double")
        for c in self.cols:
            minima = st["stats"][c]["minima"]
            bound = float(minima[-1]) if len(minima) >= self.k else _SPACE
            thr = F.when(F.col("c") == F.lit(c), F.lit(bound)).otherwise(thr)
        survivors = pairs.filter(F.col("h") < thr).distinct()
        w = Window.partitionBy("c").orderBy(F.col("h").asc())
        rows = (
            survivors.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= self.k)
            .groupBy("c")
            .agg(F.sort_array(F.collect_list("h")).alias("minima"))
            .collect()
        )
        for r in rows:
            cs = st["stats"][r["c"]]
            cs["minima"] = sorted(set(cs["minima"]) | set(r["minima"]))[: self.k]

    def report(self) -> DataFrame:
        """Current profile: (column, n, n_null, n_distinct_est, min,
        max, mean, stddev) — the batch ``profile`` shape with the KMV
        distinct estimate (exact below k) in the distinct slot.
        Rounding mirrors the batch operator (6 decimals; sample
        stddev)."""
        st = self._load()
        out = []
        for c in self.cols:
            cs = st["stats"][c]
            n, cnt = st["n"], cs["cnt"]
            mean = std = None
            if cs["min"] is not None and cnt > 0:
                mean = cs["sum"] / cnt
                if cnt > 1:
                    var = (cs["sumsq"] - cs["sum"] * cs["sum"] / cnt) / (cnt - 1)
                    std = math.sqrt(max(var, 0.0))
            est = _kmv_estimate(cs["minima"], self.k)
            out.append(
                (
                    c,
                    n,
                    n - cnt,
                    int(round(est)),
                    round(cs["min"], 6) if cs["min"] is not None else None,
                    round(cs["max"], 6) if cs["max"] is not None else None,
                    round(mean, 6) if mean is not None else None,
                    round(std, 6) if std is not None else None,
                )
            )
        schema = T.StructType(
            [
                T.StructField("column", T.StringType()),
                T.StructField("n", T.LongType()),
                T.StructField("n_null", T.LongType()),
                T.StructField("n_distinct_est", T.LongType()),
                T.StructField("min", T.DoubleType()),
                T.StructField("max", T.DoubleType()),
                T.StructField("mean", T.DoubleType()),
                T.StructField("stddev", T.DoubleType()),
            ]
        )
        return self.spark.createDataFrame(out, schema)


def streaming_profile(
    spark: SparkSession,
    source_dir: str,
    state_path: str,
    checkpoint_dir: str,
    cols: list[str],
    kmv_k: int = 256,
    schema=None,
):
    """availableNow + foreachBatch wiring over a parquet file stream:
    drains what is currently in ``source_dir``, folds it into the
    profile state, and stops.  The checkpoint scopes each source file
    to exactly one batch_id; the state's last_batch_id watermark makes
    replayed epochs no-ops."""
    if not checkpoint_dir:
        raise ValueError(
            "streaming_profile requires a checkpoint_dir: it scopes "
            "each source file to exactly one batch_id, which the "
            "state watermark then makes replay-idempotent"
        )
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    sp = StreamingProfile(spark, state_path, cols, kmv_k)

    def handle(batch: DataFrame, batch_id: int) -> None:
        sp.process_batch(batch, batch_id)

    q = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(handle)
        .start()
    )
    q.awaitTermination()
    return sp
