"""Ordered event funnels and cohort retention as library operators.

The reference engine stops at path aggregation (count/sum along the
graph); funnels and retention are the event-analytics extensions a
training-data / product pipeline needs on top.  Both are built so the
events table is shuffled ONCE:

* ``event_funnel`` expresses every "first time the user reached step
  N (strictly after step N-1)" as a running ``min(when(...))`` over
  the SAME window spec — Catalyst evaluates all steps in a single
  shuffle + per-partition sort, with no self-joins and no per-step
  scans.  At 100 TB this is the difference between one events shuffle
  and ``len(steps)`` of them.
* ``cohort_retention`` keys both aggregations on the user id so the
  events shuffle is reused, and broadcasts the (tiny) per-user cohort
  frame into the enrich join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_user_steps(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """One row per user: ``step_<i>_ts`` = first time the user reached
    step i via the ORDERED prefix (each step strictly after the
    previous one), NULL if never.

    All step columns are running mins over one window spec, so the
    whole funnel costs one shuffle on ``user_col`` regardless of
    ``len(steps)``.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, type_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = events.select(user_col, type_col, ts_col)
    prev: Column | None = None
    names = []
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) > prev)
        name = f"step_{i}_ts"
        df = df.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = F.col(name)
        names.append(name)
    return df.groupBy(user_col).agg(
        *[F.min(n).alias(n) for n in names]
    )


def funnel_report(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Funnel conversion summary: one row with per-step reach counts
    and the end-to-end conversion percentage."""
    per_user = funnel_user_steps(events, steps, user_col, type_col, ts_col)
    first, last = "step_0_ts", f"step_{len(steps) - 1}_ts"
    aggs = [F.count(F.lit(1)).alias("n_users")]
    aggs += [
        F.count(f"step_{i}_ts").alias(f"reached_{s}") for i, s in enumerate(steps)
    ]
    aggs.append(
        F.round(100.0 * F.count(last) / F.count(first), 6).alias("conversion_pct")
    )
    return per_user.agg(*aggs)


def cohort_retention(
    events: DataFrame,
    cohort_event: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ets",
    period: str = "week",
) -> DataFrame:
    """(cohort period, period offset) → distinct active users.

    Users are grouped by the truncated period of their first
    ``cohort_event``; later activity is bucketed by offset from that
    cohort period.  ``ts_col`` must be a timestamp column.
    """
    days = {"week": 7, "day": 1}
    if period not in days:
        raise ValueError(f"period must be one of {sorted(days)}")
    ev = events.select(user_col, type_col, F.col(ts_col).alias("_ets"))
    cohorts = (
        ev.filter(F.col(type_col) == cohort_event)
        .groupBy(user_col)
        .agg(F.date_trunc(period, F.min("_ets")).alias("cohort_period"))
    )
    return (
        ev.join(F.broadcast(cohorts), user_col)
        .withColumn(
            "period_offset",
            (
                F.datediff(F.date_trunc(period, F.col("_ets")), F.col("cohort_period"))
                / days[period]
            ).cast("bigint"),
        )
        .filter(F.col("period_offset") >= 0)
        .groupBy("cohort_period", "period_offset")
        .agg(F.countDistinct(user_col).alias("n_active"))
    )
