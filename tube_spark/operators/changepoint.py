"""CUSUM change-point detection (Page, Biometrika 1954) over keyed
event series.

The standard drift detector for metric streams: per series, the
cumulative sum of deviations beyond an allowance ``k*sigma`` ratchets
up while the level is shifted and resets while it is not; an alarm
fires when the statistic crosses ``h*sigma``.  Two-sided: ``s_hi``
tracks upward shifts, ``s_lo`` downward.  Complements
``profile.outlier_flags`` (pointwise IQR outliers): CUSUM accumulates
evidence across consecutive observations, so it catches small
SUSTAINED shifts a pointwise test never sees.

The recursion ``s_i = max(0, s_{i-1} + y_i)`` is not a plain window
aggregate, but its closed form is: with prefix sums
``c_i = sum_{j<=i} y_j``,

    s_i = c_i - min(0, min_{j<=i} c_j)

— two ordered window aggregates (a running sum and a running min), no
recursion, no Python, no iterative jobs.  Each series' windows run
under ``partitionBy(series)`` with a deterministic (ts, tiebreak)
order.  Deviations are quantized to integer MICRO-UNITS (1e-6) before
the cumulative sums: floating-point windowed sums are
association-order-dependent (DuckDB aggregates windows via segment
trees, Spark sequentially — measured last-ulp divergence), while
int64 sums are exact under ANY association, so the whole trajectory
replays bit-for-bit in SQL.  Quantization error is <= n/2 micro-units
over an n-point series — immaterial for a sigma-scaled drift
statistic (and the alarm threshold is quantized identically).

Scale shape: one baseline agg + one window pass, both keyed by the
series column — state per task is one running (sum, min) pair; a
series with millions of points streams through its sorted partition.
Skew note: ``Window.partitionBy(series)`` is one task per series —
right for many-series telemetry (the events table shape), wrong for
one giant global series (use the data_mixture range-partition prefix
trick there).

Reference anchor: beyond-parity analytics suite (SURVEY.md); the
streaming sibling for open-ended feeds is sessionize_stream's
applyInPandasWithState pattern with (c, min_c) as the state pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum_changepoints(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    value_col: str,
    k: float = 0.5,
    h: float = 5.0,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-row two-sided CUSUM statistics and alarms:

    ``(series, ts[, tiebreak], value, s_hi, s_lo, alarm_hi, alarm_lo)``

    * baseline per series: mean and population stddev (rounded to 6);
    * allowance ``k`` and threshold ``h`` in sigma units (Montgomery's
      textbook defaults 0.5 / 5 detect ~1-sigma sustained shifts);
    * constant series (sigma = 0) produce zero statistics, no alarms;
    * null values are dropped up front (matching StreamingCUSUM's
      per-batch filter) — a null deviation would otherwise be skipped
      by the windowed sums and silently inherit the prior statistic.
    """
    if k < 0 or h <= 0:
        raise ValueError(f"need k >= 0 and h > 0, got k={k} h={h}")
    df = df.filter(F.col(value_col).isNotNull())
    base = df.groupBy(series_col).agg(
        F.round(F.avg(value_col), 6).alias("__mu"),
        F.round(F.coalesce(F.stddev_pop(value_col), F.lit(0.0)), 6).alias(
            "__sigma"
        ),
    )
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = (
        Window.partitionBy(series_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # integer micro-units: exact cumulative sums under any association
    y_hi = F.round(
        (F.col(value_col) - F.col("__mu") - F.lit(k) * F.col("__sigma"))
        * 1e6
    ).cast("long")
    y_lo = F.round(
        (F.col("__mu") - F.col(value_col) - F.lit(k) * F.col("__sigma"))
        * 1e6
    ).cast("long")
    thr = F.round(F.lit(h) * F.col("__sigma") * 1e6).cast("long")
    out = (
        df.join(base, series_col)
        .withColumn("__c_hi", F.sum(y_hi).over(w))
        .withColumn("__c_lo", F.sum(y_lo).over(w))
        .withColumn(
            "__s_hi",
            F.col("__c_hi") - F.least(F.min("__c_hi").over(w), F.lit(0).cast("long")),
        )
        .withColumn(
            "__s_lo",
            F.col("__c_lo") - F.least(F.min("__c_lo").over(w), F.lit(0).cast("long")),
        )
    )
    keep = [series_col, ts_col] + ([tiebreak_col] if tiebreak_col else [])
    return out.select(
        *keep,
        F.col(value_col),
        F.round(F.col("__s_hi") / 1e6, 6).alias("s_hi"),
        F.round(F.col("__s_lo") / 1e6, 6).alias("s_lo"),
        (F.col("__s_hi") > thr).alias("alarm_hi"),
        (F.col("__s_lo") > thr).alias("alarm_lo"),
    )
