"""Session-scoped marketing attribution: first-touch / last-touch.

The standard web-analytics credit assignment: a conversion event
(purchase) credits the touch events (click / view) of the SAME
session — first-touch gives the credit to the session's earliest
touch, last-touch to the latest one before judging.  Session scoping
(vs a fixed lookback window) composes with the engine's existing
sessionization definition (operators/sessions.py: 30-minute
inactivity gap), so the attribution frame and the sessionization
rollup can never disagree about what a session is.

Deterministic: touches rank by (ts, event_id) — the same stable tie
break the funnel/sessionization family uses — so first/last are pure
functions of the event log and the whole frame replays in SQL.

Scale shape: one per-user session window (the sessionize shuffle),
two row_number windows over the per-(user, session) touch sequence,
one aggregation for conversion revenue, two slim joins back — every
shuffle keyed by user, nothing corpus-global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def session_attribution(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    gap_minutes: int = 30,
) -> DataFrame:
    """One row per session containing >= 1 conversion:
    (user, session_id, n_conversions, revenue, n_touches,
    first_touch_type, last_touch_type).

    ``revenue`` sums the conversion events' value column.  Sessions
    whose conversions have NO preceding-or-following touch keep the
    row with n_touches = 0 and NULL touch types — dark conversions
    are a number analysts ask for, not a dropped row.
    """
    id_col = "event_id"
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    sess = events.withColumn("__new", is_new).withColumn(
        "session_id", F.sum("__new").over(w)
    )
    conv = (
        sess.filter(F.col(type_col) == conversion_type)
        .groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.round(F.sum(value_col), 6).alias("revenue"),
        )
    )
    touches = sess.filter(F.col(type_col).isin(*touch_types))
    tw = Window.partitionBy(user_col, "session_id")
    ranked = touches.select(
        user_col,
        "session_id",
        F.col(type_col),
        F.row_number()
        .over(tw.orderBy(F.col(ts_col).asc(), F.col(id_col).asc()))
        .alias("__rn_first"),
        F.row_number()
        .over(tw.orderBy(F.col(ts_col).desc(), F.col(id_col).desc()))
        .alias("__rn_last"),
        F.count(F.lit(1)).over(tw).alias("n_touches"),
    )
    first = ranked.filter(F.col("__rn_first") == 1).select(
        user_col,
        "session_id",
        F.col(type_col).alias("first_touch_type"),
        "n_touches",
    )
    last = ranked.filter(F.col("__rn_last") == 1).select(
        user_col, "session_id", F.col(type_col).alias("last_touch_type")
    )
    return (
        conv.join(first, on=[user_col, "session_id"], how="left")
        .join(last, on=[user_col, "session_id"], how="left")
        .select(
            user_col,
            "session_id",
            "n_conversions",
            "revenue",
            F.coalesce("n_touches", F.lit(0)).cast("long").alias("n_touches"),
            "first_touch_type",
            "last_touch_type",
        )
    )
