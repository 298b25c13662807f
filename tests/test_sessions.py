"""Sessionization: batch semantics + streaming stateful operator."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, 0) + dt.timedelta(minutes=minute)


def test_batch_sessionize(spark):
    from tube_spark.operators.sessions import sessionize

    rows = [
        # user 1: events at 0, 10, 20 min (one session), then 90, 95 (second)
        (1, _ts(0)), (1, _ts(10)), (1, _ts(20)), (1, _ts(90)), (1, _ts(95)),
        # user 2: single event
        (2, _ts(5)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = sorted(
        (r["user_id"], r["session_id"], r["n_events"]) for r in
        sessionize(df, gap_minutes=30).collect()
    )
    assert out == [(1, 1, 3), (1, 2, 2), (2, 1, 1)]


def test_batch_sessionize_single_shuffle(spark):
    """Both window functions and the rollup share one user-keyed shuffle."""
    from tube_spark.operators.sessions import sessionize

    df = spark.createDataFrame([(1, _ts(0))], "user_id long, ts timestamp")
    plan = sessionize(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_streaming_sessionize(spark, tmp_path):
    from tube_spark.operators.sessions import sessionize_stream

    src = str(tmp_path / "events")
    rows = [
        (1, _ts(0)), (1, _ts(10)), (1, _ts(90)),  # session closes at gap
        (2, _ts(0)),
        # a late "watermark pusher" far in the future closes everything
        (99, _ts(60 * 24)),
    ]
    spark.createDataFrame(rows, "user_id long, ts timestamp").write.parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = sessionize_stream(stream, gap_minutes=30, watermark="0 seconds")

    import uuid

    sink = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["n_events"]) for r in spark.table(sink).collect()
    }
    # user 1's first session (2 events) closed by the gap to minute 90;
    # open sessions (1@90, 2, 99) remain in state — not emitted
    assert (1, 2) in got
