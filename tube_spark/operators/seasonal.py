"""Classical seasonal decomposition of keyed daily series.

The moving-average decomposition (Makridakis/Hyndman's "classical
decomposition"; the additive half of STL without loess): per key,

    observed(d) = trend(d) + seasonal(dow) + residual(d)

* trend    — centered moving average over a full ``period`` window
             (NULL at the edges where the window is short: a partial
             mean would fold the seasonal into the trend);
* seasonal — per-phase mean of the detrended values, re-centered to
             sum to zero over the period (otherwise level leaks from
             trend into seasonal);
* residual — what's left; the input to changepoint/outlier scans
             (operators/changepoint.py consumes exactly this shape).

Portability: the phase is ``datediff(day, epoch) mod period`` — pure
integer arithmetic, identical in every engine (the SQL dow functions
disagree on week start: Spark dayofweek is 1=Sunday, DuckDB dow is
0=Sunday).  Windows are ROWS-based over the per-key day sequence;
with gapless daily series ROWS == RANGE, and gappy series get the
standard practitioner's caveat (fill calendar gaps first).

Scale shape: one groupBy to days, one bounded window per key (period
rows), one per-(key, phase) mean joined back — all shuffles on the
key, no global windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_EPOCH = "1970-01-01"


def seasonal_decompose(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    period: int = 7,
) -> DataFrame:
    """(key, day, phase, observed, trend, seasonal, residual) per
    (key, calendar day); observed = sum(value) that day.

    ``trend``/``seasonal``/``residual`` are NULL on the ``period//2``
    edge days of each key's series (incomplete centered window).
    Rounded to 6 for oracle portability.
    """
    if period < 2 or period % 2 == 0:
        raise ValueError(f"period must be odd and >= 3, got {period}")
    half = period // 2
    day = F.to_date(F.col(ts_col))
    daily = (
        df.select(
            F.col(key_col).alias("key"), day.alias("day"), F.col(value_col)
        )
        .groupBy("key", "day")
        .agg(F.round(F.sum(value_col), 6).alias("observed"))
    )
    w = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(-half, half)
    )
    trend = F.when(
        F.count(F.lit(1)).over(w) == period, F.avg("observed").over(w)
    )
    phase = F.pmod(F.datediff(F.col("day"), F.lit(_EPOCH).cast("date")), F.lit(period))
    detrended = daily.select(
        "key",
        "day",
        "observed",
        phase.cast("int").alias("phase"),
        trend.alias("__trend"),
    )
    raw_seasonal = (
        detrended.filter(F.col("__trend").isNotNull())
        .groupBy("key", "phase")
        .agg(F.avg(F.col("observed") - F.col("__trend")).alias("__s_raw"))
    )
    centered = raw_seasonal.withColumn(
        "__seasonal",
        F.col("__s_raw")
        - F.avg("__s_raw").over(Window.partitionBy("key")),
    ).select("key", "phase", "__seasonal")
    return (
        detrended.join(centered, on=["key", "phase"], how="left")
        .select(
            "key",
            "day",
            "phase",
            "observed",
            F.round("__trend", 6).alias("trend"),
            F.when(
                F.col("__trend").isNotNull(), F.round("__seasonal", 6)
            ).alias("seasonal"),
            F.when(
                F.col("__trend").isNotNull(),
                F.round(
                    F.col("observed") - F.col("__trend") - F.col("__seasonal"),
                    6,
                ),
            ).alias("residual"),
        )
    )
