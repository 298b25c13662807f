"""Streaming CUSUM: two-sided drift statistics maintained across
micro-batches against a FIXED baseline.

The batch operator (operators/changepoint.py) self-trains its baseline
from the whole series — right for retrospective analysis, impossible
on an unbounded feed.  The production monitoring shape is a baseline
(mu, sigma per series) frozen from a reference period and a detector
that carries only the current (s_hi, s_lo) pair per series — which is
exactly the CUSUM recursion's state.

Per batch the work stays distributed: with carry-in state s0, the
recursion over a sorted batch has the closed form

    s_n = max(c_n - min_{1<=k<=n} c_k,  c_n + s0)

(prefix sums c over the batch; the first term is the fresh-start
trajectory, the second the carry-through one) — two ordered window
aggregates per batch, evaluated on the executors; only the per-series
LAST row (the new carry) and the alarm count come back to the driver.
Deviations are the SAME integer micro-units as the batch operator, so
state replay is exact int64 arithmetic: feeding batches in event order
yields carries BIT-IDENTICAL to one batch run over the concatenation
(pinned by tests/test_streaming_cusum.py under any split).

Ordering contract: batches must arrive in per-series event-time order
(the shards/curation monotone contract); rows inside a batch are
sorted by (ts, tiebreak).  Replayed batches are refused by the
``last_batch_id`` watermark (CUSUM state is a running sum — addition,
not an idempotent lattice, the CMS contract, not the Bloom/HLL one).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tube_spark.functions import fsio


class StreamingCUSUM:
    """Maintains per-series two-sided CUSUM state over ordered batches.

    ``baseline``: {series: (mu, sigma)} — frozen reference statistics
    (round to 6 decimals for portability; done here defensively).

    >>> sc = StreamingCUSUM(spark, "/tmp/cusum.json",
    ...                     baseline={"click": (10.0, 0.5)}, k=0.5, h=5.0)
    >>> rep = sc.process_batch(events_batch, batch_id=0)
    >>> rep["alarms"], sc.state()["click"]
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        baseline: dict[str, tuple[float, float]],
        series_col: str = "event_type",
        ts_col: str = "ts",
        value_col: str = "value",
        k: float = 0.5,
        h: float = 5.0,
        tiebreak_col: str | None = None,
    ) -> None:
        if k < 0 or h <= 0:
            raise ValueError(f"need k >= 0 and h > 0, got k={k} h={h}")
        if not baseline:
            raise ValueError("baseline must name at least one series")
        self.spark = spark
        self.state_path = state_path
        self.baseline = {
            s: (round(float(mu), 6), round(float(sig), 6))
            for s, (mu, sig) in baseline.items()
        }
        self.series_col = series_col
        self.ts_col = ts_col
        self.value_col = value_col
        self.k = k
        self.h = h
        self.tiebreak_col = tiebreak_col

    def _load(self) -> dict:
        if fsio.exists(self.spark, self.state_path):
            return json.loads(fsio.read_text(self.spark, self.state_path))
        return {
            "s_hi": {s: 0 for s in self.baseline},
            "s_lo": {s: 0 for s in self.baseline},
            "alarms": 0,
            "last_batch_id": None,
            "n_batches": 0,
        }

    def _save(self, st: dict) -> None:
        parent = self.state_path.rsplit("/", 1)[0]
        if parent and parent != self.state_path:
            fsio.mkdirs(self.spark, parent)
        fsio.write_text(self.spark, self.state_path, json.dumps(st))

    def process_batch(self, batch: DataFrame, batch_id: int | None = None) -> dict:
        """Advance state through one ordered batch; returns
        {"alarms": new alarm rows, "series": carries}.  Rows whose
        series has no baseline are ignored (they cannot be scored)."""
        st = self._load()
        if (
            batch_id is not None
            and st["last_batch_id"] is not None
            and batch_id <= st["last_batch_id"]
        ):
            return {"alarms": 0, "series": {}, "replayed": True}
        bl = self.spark.createDataFrame(
            [(s, mu, sig) for s, (mu, sig) in self.baseline.items()],
            f"{self.series_col} string, __mu double, __sigma double",
        )
        s0 = self.spark.createDataFrame(
            [
                (s, int(st["s_hi"].get(s, 0)), int(st["s_lo"].get(s, 0)))
                for s in self.baseline
            ],
            f"{self.series_col} string, __s0_hi long, __s0_lo long",
        )
        order = [F.col(self.ts_col).asc()] + (
            [F.col(self.tiebreak_col).asc()] if self.tiebreak_col else []
        )
        w = (
            Window.partitionBy(self.series_col)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        y_hi = F.round(
            (F.col(self.value_col) - F.col("__mu") - F.lit(self.k) * F.col("__sigma"))
            * 1e6
        ).cast("long")
        y_lo = F.round(
            (F.col("__mu") - F.col(self.value_col) - F.lit(self.k) * F.col("__sigma"))
            * 1e6
        ).cast("long")
        thr = F.round(F.lit(self.h) * F.col("__sigma") * 1e6).cast("long")
        scored = (
            batch.filter(F.col(self.value_col).isNotNull())
            .join(F.broadcast(bl), self.series_col)
            .join(F.broadcast(s0), self.series_col)
            .withColumn("__c_hi", F.sum(y_hi).over(w))
            .withColumn("__c_lo", F.sum(y_lo).over(w))
            .withColumn(
                "__s_hi",
                F.greatest(
                    F.col("__c_hi") - F.min("__c_hi").over(w),
                    F.col("__c_hi") + F.col("__s0_hi"),
                ),
            )
            .withColumn(
                "__s_lo",
                F.greatest(
                    F.col("__c_lo") - F.min("__c_lo").over(w),
                    F.col("__c_lo") + F.col("__s0_lo"),
                ),
            )
            .withColumn("__alarm", (F.col("__s_hi") > thr) | (F.col("__s_lo") > thr))
        )
        # per-series carry (the LAST row) + alarm count: bounded driver
        # state — one row per series, one long
        last = (
            scored.groupBy(self.series_col)
            .agg(
                F.max_by("__s_hi", F.struct(*[c for c in
                    ([F.col(self.ts_col)] + ([F.col(self.tiebreak_col)] if self.tiebreak_col else []))
                ])).alias("s_hi"),
                F.max_by("__s_lo", F.struct(*[c for c in
                    ([F.col(self.ts_col)] + ([F.col(self.tiebreak_col)] if self.tiebreak_col else []))
                ])).alias("s_lo"),
                F.sum(F.col("__alarm").cast("long")).alias("alarms"),
            )
            .collect()
        )
        new_alarms = 0
        series_out = {}
        for r in last:
            s = r[self.series_col]
            st["s_hi"][s] = int(r["s_hi"])
            st["s_lo"][s] = int(r["s_lo"])
            new_alarms += int(r["alarms"])
            series_out[s] = (int(r["s_hi"]), int(r["s_lo"]))
        st["alarms"] += new_alarms
        if batch_id is not None:
            st["last_batch_id"] = int(batch_id)
        st["n_batches"] += 1
        self._save(st)
        return {"alarms": new_alarms, "series": series_out}

    def state(self) -> dict:
        st = self._load()
        return {
            s: (st["s_hi"].get(s, 0), st["s_lo"].get(s, 0))
            for s in self.baseline
        }


def streaming_cusum(
    spark: SparkSession,
    source_dir: str,
    state_path: str,
    baseline: dict[str, tuple[float, float]],
    series_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    k: float = 0.5,
    h: float = 5.0,
    tiebreak_col: str | None = None,
    schema=None,
    checkpoint_dir: str | None = None,
):
    """Structured Streaming wiring (availableNow + foreachBatch), the
    same shape as streaming_bloom / streaming_hll; the batch_id
    watermark makes redelivery a no-op."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    sc = StreamingCUSUM(
        spark, state_path, baseline, series_col, ts_col, value_col,
        k, h, tiebreak_col,
    )

    def handle(batch: DataFrame, batch_id: int) -> None:
        sc.process_batch(batch, batch_id)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = stream.writeStream.foreachBatch(handle).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
