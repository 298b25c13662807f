"""Streaming joins: stream-static enrich and watermarked stream-stream
interval joins.

The reference is batch-only; these are the Structured Streaming twins
of the engine's batch equi-join (J1/J2) and banded range join
(``operators/rangejoin.py``), for pipelines where the fact side is an
unbounded stream:

* ``stream_static_enrich`` — enrich a stream with a (slowly-changing)
  dimension DataFrame.  Spark re-plans the static side per micro-batch,
  so a dimension refresh is picked up without restarting the query; no
  state is kept (the static side is just joined, broadcast when small).
* ``interval_join`` — stream⋈stream inner join on a key plus an
  event-time band: ``right_ts ∈ [left_ts - lookback, left_ts]``.
  BOTH sides must carry watermarks; Spark then derives how long each
  side's rows must be retained and evicts state beyond
  ``watermark + band`` — the property that keeps a continuous join
  bounded on an unbounded stream (an unwatermarked stream-stream join
  grows state forever and is rejected in append mode).

At 100 TB/day the state store, not the shuffle, is the scale limit:
the band width times the per-key arrival rate bounds rows held per
key, independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Join a streaming frame with a static dimension (stateless; the
    dimension is re-read each micro-batch, so publishing a new dim
    version takes effect on the next batch)."""
    return stream.join(F.broadcast(dim), on=on, how=how)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join: pairs of same-``on`` rows
    where ``right_ts`` falls in ``[left_ts - lookback, left_ts]``.

    Callers apply ``withWatermark`` to BOTH inputs first — the
    watermark delay plus ``lookback`` is exactly the state horizon
    Spark maintains per side.  Batch frames pass through the same
    plan (the condition is ordinary Column algebra), so the streaming
    query has a directly comparable batch twin.
    """
    overlap = (set(left.columns) & set(right.columns)) - {on}
    if overlap:
        raise ValueError(
            "interval_join: overlapping non-key columns "
            f"{sorted(overlap)} — rename one side (the flat output "
            "would carry duplicate column names)"
        )
    l, r = left.alias("l"), right.alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lookback}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
    )
    return l.join(r, cond, "inner").select(
        F.col(f"l.{on}").alias(on),
        *[F.col(f"l.{c}").alias(c) for c in left.columns if c != on],
        *[F.col(f"r.{c}").alias(c) for c in right.columns if c != on],
    )
