"""Heavy-hitter (hot-key) detection with bounded memory.

At 100 TB the first question about any join or aggregation key is "is
it skewed, and on which values?".  ``groupBy(key).count()`` answers it
exactly but shuffles every distinct key — at billions of distinct
values that is itself a massive job just to learn that three keys hold
half the table.  The scale-correct shape is the classic two-scan
*candidates → exact verification* pattern over mergeable Misra-Gries
summaries (Misra & Gries 1982; mergeability per Agarwal et al.,
"Mergeable Summaries", PODS 2012):

* **Scan 1 — candidates.**  Each partition builds a Misra-Gries summary
  of at most ``k`` counters (``mapInPandas``, vectorized: accumulate a
  batch's value_counts, then shrink back to ``k`` by subtracting the
  (k+1)-th largest count from all and dropping non-positives — the
  standard mergeable reduction).  Per-partition guarantee: every key
  with local count > n_p/(k+1) survives.  Summing over partitions:
  any key with GLOBAL count > N/(k+1) must exceed the local threshold
  somewhere, so the union of partition summaries is a SUPERSET of the
  true heavy hitters.  Output is tiny: ≤ k rows per partition.
* **Scan 2 — exact verification.**  The candidate set (≤ k × partitions
  keys, usually far fewer) is broadcast back; a second scan counts ONLY
  candidate keys exactly (map-side filter; the shuffle carries just the
  candidates) and keeps those with share ≥ ``min_share``.

The final answer is therefore EXACT and deterministic — independent of
partitioning and arrival order (those affect only which extra
candidates get counted and discarded) — which is what makes the
``heavy_hitters`` query oracle-able against a plain DuckDB
``GROUP BY … HAVING``.

``hot_key_values`` feeds the result straight into
``operators/skew.py``'s ``salted_join`` / AQE tuning: detect on a
sample or yesterday's partition, salt today's join.

No reference counterpart (the reference has no skew tooling); new scope
in the spirit of SURVEY §2's scale notes.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries, unioned.

    Returns ``(key_col, mg_count)`` with ≤ ``k`` rows per input
    partition.  ``mg_count`` is a LOWER bound on the key's count within
    its partition (undercount ≤ n_p/(k+1)); it is diagnostic only —
    callers wanting real counts re-count exactly (see
    ``heavy_hitters``).  NULL keys are counted like any other value
    (emitted with key NULL).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    import pandas as pd  # executor-side

    field = df.schema[key_col]
    out_schema = f"`{key_col}` {field.dataType.simpleString()}, mg_count bigint"
    null_token = "\0__mg_null__"  # value_counts drops NaN; fold NULLs in

    def _summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = pd.Series(dtype="int64")
        for batch in batches:
            col = batch[key_col]
            if col.dtype == object:
                col = col.fillna(null_token)
            batch_counts = col.value_counts(dropna=False)
            counters = counters.add(batch_counts, fill_value=0).astype("int64")
            if len(counters) > k:
                # mergeable-summaries shrink: subtract the (k+1)-th
                # largest count from everything, keep the positives.
                # Memory high-water mark: k + distinct-in-batch.
                threshold = counters.nlargest(k + 1).iloc[-1]
                counters = counters[counters > threshold] - threshold
        if counters.empty:
            return
        keys = counters.index.to_series().reset_index(drop=True)
        if keys.dtype == object:
            keys = keys.mask(keys == null_token, None)
        yield pd.DataFrame(
            {key_col: keys, "mg_count": counters.reset_index(drop=True)}
        )

    return df.select(key_col).mapInPandas(_summarize, schema=out_schema)


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    min_share: float,
    k: int | None = None,
) -> DataFrame:
    """Exactly the keys holding ≥ ``min_share`` of ``df``'s rows, with
    exact counts and shares: ``(key_col, cnt, share)``.

    ``k`` (candidate summary width) defaults to ``ceil(2 / min_share)``
    so the superset guarantee (count > N/(k+1) ⇒ candidate) covers the
    ``min_share`` threshold with 2× headroom.  Raising ``k`` costs only
    candidate-set size, never correctness.
    """
    if not 0 < min_share <= 1:
        raise ValueError(f"min_share must be in (0, 1], got {min_share}")
    if k is None:
        k = int(2 / min_share) + 1
    if k < int(1 / min_share):
        raise ValueError(
            f"k={k} cannot cover min_share={min_share}: keys above the "
            f"threshold are only guaranteed to survive when k+1 > 1/min_share"
        )
    candidates = (
        misra_gries_candidates(df, key_col, k)
        .select(F.col(key_col).alias("__cand_key"))
        .distinct()
    )
    total = df.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    counted = (
        # null-safe equality (<=>): NULL is a countable key value, and
        # Spark still plans <=> as a broadcast hash equi-join
        df.join(
            F.broadcast(candidates),
            on=F.col(key_col).eqNullSafe(F.col("__cand_key")),
            how="left_semi",
        )
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(total))  # one-row aggregate broadcast
        .withColumn("share", F.col("cnt") / F.col("__n"))
        .filter(F.col("share") >= F.lit(min_share))
        .select(key_col, "cnt", F.round("share", 6).alias("share"))
    )


def hot_key_values(
    df: DataFrame, key_col: str, min_share: float, k: int | None = None
) -> list:
    """Driver-side list of hot-key values for ``salted_join`` /
    broadcast-exclusion plans.  Bounded: at most ``1/min_share`` keys
    can each hold ≥ ``min_share`` of the rows."""
    return [
        r[key_col] for r in heavy_hitters(df, key_col, min_share, k).collect()
    ]
