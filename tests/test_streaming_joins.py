"""Streaming join semantics: stream-static enrich and the watermarked
stream-stream interval join, both checked against batch twins."""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F

from tube_spark.streaming.joins import interval_join, stream_static_enrich


def _drain(df, mode="append"):
    sink = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        df.writeStream.format("memory")
        .queryName(sink)
        .outputMode(mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(sink)


def test_stream_static_enrich_matches_batch(spark, tmp_path):
    src = str(tmp_path / "ev")
    spark.createDataFrame(
        [(1, 10, "c"), (2, 20, "v"), (3, 99, "c")], "event_id long, user_id long, t string"
    ).write.parquet(src)
    dim = spark.createDataFrame([(10, "gold"), (20, "basic")], "user_id long, tier string")

    stream = spark.readStream.schema("event_id long, user_id long, t string").parquet(src)
    got = {
        r["event_id"]: r["tier"]
        for r in _drain(stream_static_enrich(stream, dim, on="user_id")).collect()
    }
    assert got == {1: "gold", 2: "basic", 3: None}


def test_interval_join_stream_matches_batch(spark, tmp_path):
    """availableNow drain of the watermarked stream-stream join equals
    the identical plan over batch frames."""
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    mk = lambda s: F.to_timestamp(F.lit(s))  # noqa: E731
    left_rows = [(1, 100, "2024-01-01 10:00:00"), (2, 100, "2024-01-01 12:00:00"),
                 (3, 200, "2024-01-01 10:05:00")]
    right_rows = [(7, 100, "2024-01-01 09:45:00"), (8, 100, "2024-01-01 09:15:00"),
                  (9, 200, "2024-01-01 10:05:00"), (10, 300, "2024-01-01 10:00:00")]
    lb = spark.createDataFrame(left_rows, "lid long, user_id long, lt string").withColumn(
        "lt", F.to_timestamp("lt")
    )
    rb = spark.createDataFrame(right_rows, "rid long, user_id long, rt string").withColumn(
        "rt", F.to_timestamp("rt")
    )
    lb.write.parquet(lp)
    rb.write.parquet(rp)

    batch = {
        (r["lid"], r["rid"])
        for r in interval_join(lb, rb, "user_id", "lt", "rt", "30 minutes").collect()
    }
    # lid=1 matches rid=7 (15 min before), not rid=8 (45 min); lid=2
    # matches nothing (both right rows too old); lid=3 matches rid=9
    # (same instant, inclusive); user 300 never pairs
    assert batch == {(1, 7), (3, 9)}

    ls = (
        spark.readStream.schema(lb.schema).parquet(lp).withWatermark("lt", "1 hour")
    )
    rs = (
        spark.readStream.schema(rb.schema).parquet(rp).withWatermark("rt", "1 hour")
    )
    stream = {
        (r["lid"], r["rid"])
        for r in _drain(interval_join(ls, rs, "user_id", "lt", "rt", "30 minutes")).collect()
    }
    assert stream == batch


def test_interval_join_rejects_overlapping_columns(spark):
    # ADVICE r3: silent duplicate output columns break downstream selects
    import pytest

    l = spark.createDataFrame([(1, 1.0, "x")], "user_id long, lt double, v string")
    r = spark.createDataFrame([(1, 1.0, "y")], "user_id long, rt double, v string")
    with pytest.raises(ValueError, match="overlapping non-key columns.*'v'"):
        interval_join(l, r, "user_id", "lt", "rt")
