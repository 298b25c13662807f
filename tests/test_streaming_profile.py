"""Streaming column profile: batch equivalence across schedules,
redelivery idempotency, the incremental KMV threshold, end-to-end
availableNow wiring."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.profile import profile
from tube_spark.streaming.profile import StreamingProfile, streaming_profile

SF = "/root/testdata/sf0.001"
COLS = ["doc_id", "lang", "n_chars"]


@pytest.fixture()
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _report_map(df):
    return {
        r["column"]: r.asDict() for r in df.collect()
    }


def test_stream_equals_batch_any_schedule(spark, docs, tmp_path):
    """Three uneven batches vs the one-pass batch profile: counts /
    nulls / extrema / distinct (below k) exact, moments to float
    accumulation error."""
    sp = StreamingProfile(spark, str(tmp_path / "st.json"), COLS, kmv_k=1024)
    cuts = [(0, 101), (101, 137), (137, 10**9)]
    for bid, (lo, hi) in enumerate(cuts):
        sp.process_batch(
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), bid
        )
    got = _report_map(sp.report())
    want = _report_map(profile(docs, COLS))
    for c in COLS:
        g, w = got[c], want[c]
        assert g["n"] == w["n"] and g["n_null"] == w["n_null"]
        # corpus distinct counts sit far below k=1024: estimate is exact
        assert g["n_distinct_est"] == w["n_distinct"]
        assert g["min"] == w["min"] and g["max"] == w["max"]
        for field in ("mean", "stddev"):
            if w[field] is None:
                assert g[field] is None
            else:
                assert abs(g[field] - w[field]) <= 2e-6  # 6dp rounding + float
    # string column mirrors the batch contract: no moments
    assert got["lang"]["mean"] is None and got["lang"]["min"] is None


def test_redelivery_is_noop(spark, docs, tmp_path):
    path = str(tmp_path / "st.json")
    sp = StreamingProfile(spark, path, COLS, kmv_k=64)
    b0 = docs.filter(F.col("doc_id") < 200)
    sp.process_batch(b0, 0)
    s1 = json.dumps(json.loads(open(path).read()), sort_keys=True)
    sp.process_batch(b0, 0)  # exact replay
    assert json.dumps(json.loads(open(path).read()), sort_keys=True) == s1
    sp.process_batch(docs.filter(F.col("doc_id") >= 200), 1)
    s2 = json.dumps(json.loads(open(path).read()), sort_keys=True)
    sp.process_batch(b0, 0)  # stale replay after progress
    assert json.dumps(json.loads(open(path).read()), sort_keys=True) == s2


def test_incremental_threshold_keeps_sketch_correct(spark, docs, tmp_path):
    """A mature sketch (k smaller than the column's distinct count)
    must end up identical whether built in one pass or incrementally
    with the threshold pre-filter active."""
    one = StreamingProfile(spark, str(tmp_path / "one.json"), ["doc_id"], kmv_k=16)
    one.process_batch(docs, 0)
    inc = StreamingProfile(spark, str(tmp_path / "inc.json"), ["doc_id"], kmv_k=16)
    for bid, (lo, hi) in enumerate([(0, 150), (150, 320), (320, 10**9)]):
        inc.process_batch(
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), bid
        )
    a = json.loads(open(str(tmp_path / "one.json")).read())["stats"]["doc_id"]["minima"]
    b = json.loads(open(str(tmp_path / "inc.json")).read())["stats"]["doc_id"]["minima"]
    assert a == b and len(a) == 16


def test_streaming_wiring_end_to_end(spark, docs, tmp_path):
    src = str(tmp_path / "in")
    docs.filter(F.col("doc_id") < 250).write.parquet(src + "/p0")
    docs.filter(F.col("doc_id") >= 250).write.parquet(src + "/p1")
    # flatten into one dir of files (file stream reads a flat glob)
    import shutil
    from pathlib import Path

    flat = Path(tmp_path / "flat")
    flat.mkdir()
    n = 0
    for p in sorted(Path(src).rglob("*.parquet")):
        shutil.copy(p, flat / f"part{n}.parquet")
        n += 1
    sp = streaming_profile(
        spark,
        str(flat),
        str(tmp_path / "st.json"),
        str(tmp_path / "ck"),
        cols=COLS,
        kmv_k=1024,
    )
    got = _report_map(sp.report())
    want = _report_map(profile(docs, COLS))
    for c in COLS:
        assert got[c]["n"] == want[c]["n"]
        assert got[c]["n_distinct_est"] == want[c]["n_distinct"]


def test_schema_and_config_guards(spark, docs, tmp_path):
    path = str(tmp_path / "st.json")
    sp = StreamingProfile(spark, path, COLS, kmv_k=64)
    sp.process_batch(docs.limit(10), 0)
    with pytest.raises(ValueError, match="configured for"):
        StreamingProfile(spark, path, ["doc_id"], kmv_k=64)._load()
    with pytest.raises(ValueError, match="missing profiled columns"):
        sp.process_batch(docs.select("doc_id"), 1)
