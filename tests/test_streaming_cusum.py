"""Streaming CUSUM: exact carry equivalence under any batch split,
python-recursion agreement, replay no-op, unknown-series handling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tube_spark.streaming.cusum import StreamingCUSUM, streaming_cusum

BASE = {"a": (10.0, 0.5), "b": (20.0, 1.0)}


def _rows(spark, rows):
    return spark.createDataFrame(rows, "event_type string, ts long, value double")


def _py_state(rows_by_series, k=0.5, h=5.0):
    """(micro-unit s_hi, s_lo, alarm count) per the textbook recursion."""
    out = {}
    alarms = 0
    for s, xs in rows_by_series.items():
        mu, sig = BASE[s]
        s_hi = s_lo = 0
        for x in xs:
            y_hi = round((x - mu - k * sig) * 1e6)
            y_lo = round((mu - x - k * sig) * 1e6)
            s_hi = max(0, s_hi + y_hi)
            s_lo = max(0, s_lo + y_lo)
            if s_hi > round(h * sig * 1e6) or s_lo > round(h * sig * 1e6):
                alarms += 1
        out[s] = (s_hi, s_lo)
    return out, alarms


def _data():
    rows = []
    xs_a = [10.2, 9.8, 10.1, 12.5, 12.8, 13.0, 9.9, 10.0]
    xs_b = [20.1, 19.9, 15.0, 14.5, 20.2, 20.0, 19.8, 20.1]
    for i, (xa, xb) in enumerate(zip(xs_a, xs_b)):
        rows.append(("a", i, xa))
        rows.append(("b", i, xb))
    return rows, {"a": xs_a, "b": xs_b}


@pytest.mark.parametrize("splits", [[16], [8, 8], [3, 7, 6], [1] * 16])
def test_any_batch_split_matches_recursion(spark, tmp_path, splits):
    rows, by_series = _data()
    sc = StreamingCUSUM(
        spark, str(tmp_path / "st.json"), BASE,
        series_col="event_type", ts_col="ts", value_col="value",
    )
    total_alarms = 0
    i = 0
    for bid, n in enumerate(splits):
        rep = sc.process_batch(_rows(spark, rows[i:i + n]), batch_id=bid)
        total_alarms += rep["alarms"]
        i += n
    want_state, want_alarms = _py_state(by_series)
    assert sc.state() == want_state
    assert total_alarms == want_alarms


def test_replay_is_noop(spark, tmp_path):
    rows, _ = _data()
    sc = StreamingCUSUM(
        spark, str(tmp_path / "st.json"), BASE,
        series_col="event_type", ts_col="ts", value_col="value",
    )
    sc.process_batch(_rows(spark, rows[:8]), batch_id=0)
    st1 = sc.state()
    rep = sc.process_batch(_rows(spark, rows[:8]), batch_id=0)  # redelivery
    assert rep.get("replayed") and sc.state() == st1
    sc.process_batch(_rows(spark, rows[8:]), batch_id=1)
    want_state, _ = _py_state(_data()[1])
    assert sc.state() == want_state


def test_unknown_series_ignored_and_validation(spark, tmp_path):
    sc = StreamingCUSUM(
        spark, str(tmp_path / "st.json"), BASE,
        series_col="event_type", ts_col="ts", value_col="value",
    )
    rep = sc.process_batch(
        _rows(spark, [("zzz", 0, 1.0), ("a", 0, 10.0)]), batch_id=0
    )
    assert set(rep["series"]) == {"a"}
    with pytest.raises(ValueError):
        StreamingCUSUM(spark, str(tmp_path / "x.json"), {})
    with pytest.raises(ValueError):
        StreamingCUSUM(spark, str(tmp_path / "x.json"), BASE, k=-1)


def test_streaming_wiring(spark, tmp_path):
    rows, by_series = _data()
    src = str(tmp_path / "src")
    _rows(spark, rows).write.parquet(src)
    q = streaming_cusum(
        spark, src, str(tmp_path / "st.json"), BASE,
        series_col="event_type", ts_col="ts", value_col="value",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    sc = StreamingCUSUM(
        spark, str(tmp_path / "st.json"), BASE,
        series_col="event_type", ts_col="ts", value_col="value",
    )
    want_state, _ = _py_state(by_series)
    assert sc.state() == want_state
