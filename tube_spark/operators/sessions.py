"""Sessionization: gap-based event sessions per user.

Batch form (``sessionize``): the classic windowed formulation — a new
session starts when the gap to the previous event exceeds the timeout;
session id = running count of session starts.  Two window functions
over the same (user, ts) ordering → ONE shuffle keyed by user, both
windows computed in the same sort pass (verified: a single Exchange in
the plan).

Streaming form (``sessionize_stream``): the same semantics as a custom
stateful operator via ``applyInPandasWithState`` — per-user state holds
(last event time, open session aggregates); a session closes when the
event-time watermark passes last_ts + gap.  This is the engine's
example of a stateful operator Spark doesn't ship natively with this
exact shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-event session assignment + per-session rollup.

    Returns one row per session: (user, session_id, session_start,
    session_end, n_events).  Deterministic: ties in ts ordered by the
    full row via a stable secondary key is the caller's concern; the
    testdata has unique (user, ts).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    with_session = events.withColumn("__new", is_new).withColumn(
        "session_id", F.sum("__new").over(w)
    )
    return (
        with_session.groupBy(user_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


_STATE_SCHEMA = "last_ts long, session_start long, n_events long"
_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization with explicit per-user state.

    ``events`` must be a streaming DataFrame with (user_id long,
    ts timestamp).  Emits closed sessions; state for a user is dropped
    once the watermark passes their last event + gap (bounded state).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_s = gap_minutes * 60

    def fn(key, pdfs, state: GroupState):
        (user,) = key
        closed = []
        if state.hasTimedOut:
            if state.exists:
                last_ts, start, n = state.get
                closed.append((user, start, last_ts, n))
                state.remove()
        else:
            rows = pd.concat(list(pdfs)).sort_values("ts")
            ts_vals = (rows["ts"].astype("int64") // 1_000_000_000).tolist()
            if state.exists:
                last_ts, start, n = state.get
            else:
                last_ts, start, n = None, None, 0
            for t in ts_vals:
                if last_ts is not None and t - last_ts > gap_s:
                    closed.append((user, start, last_ts, n))
                    start, n = t, 0
                if start is None:
                    start = t
                n += 1
                last_ts = t
            state.update((last_ts, start, n))
            state.setTimeoutTimestamp((last_ts + gap_s) * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": pd.to_datetime([c[1] for c in closed], unit="s"),
                    "session_end": pd.to_datetime([c[2] for c in closed], unit="s"),
                    "n_events": [c[3] for c in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
