"""Streaming DSIR: bit-exact batch equivalence, independent raw/target
watermarks, redelivery idempotency."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.dsir import dsir_log_weights
from tube_spark.streaming.dsir import StreamingDsir

SF = "/root/testdata/sf0.001"
DIM = 256


@pytest.fixture()
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text", "lang")


def _wmap(df):
    return {
        r["doc_id"]: (r["n_feats"], r["log_weight"], r["avg_log_weight"])
        for r in df.collect()
    }


def test_stream_equals_batch_bit_exact(spark, docs, tmp_path):
    """Raw in three uneven batches, target in two: counts are integer
    sums, and scoring goes through the shared expression — the scores
    equal the one-shot batch fit EXACTLY."""
    raw = docs
    tgt = docs.filter(F.col("lang") == "en")
    sd = StreamingDsir(spark, str(tmp_path / "st.json"), dim=DIM)
    for bid, (lo, hi) in enumerate([(0, 120), (120, 300), (300, 10**9)]):
        sd.process_batch(
            raw.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), bid, "raw"
        )
    for bid, (lo, hi) in enumerate([(0, 250), (250, 10**9)]):
        sd.process_batch(
            tgt.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
            bid,
            "target",
        )
    got = _wmap(sd.log_weights(raw))
    want = _wmap(dsir_log_weights(raw, tgt, dim=DIM))
    assert got == want


def test_independent_watermarks_and_redelivery(spark, docs, tmp_path):
    path = str(tmp_path / "st.json")
    sd = StreamingDsir(spark, path, dim=DIM)
    b0 = docs.filter(F.col("doc_id") < 100)
    sd.process_batch(b0, 0, "raw")
    s1 = open(path).read()
    sd.process_batch(b0, 0, "raw")  # raw replay: no-op
    assert open(path).read() == s1
    # the SAME batch_id on the target side must still apply (separate
    # watermark)
    sd.process_batch(b0, 0, "target")
    st = json.loads(open(path).read())
    assert st["tc"] and st["raw_last_batch_id"] == 0
    assert st["target_last_batch_id"] == 0
    s2 = open(path).read()
    sd.process_batch(b0, 0, "target")  # target replay: no-op
    assert open(path).read() == s2


def test_config_guard(spark, docs, tmp_path):
    path = str(tmp_path / "st.json")
    StreamingDsir(spark, path, dim=DIM).process_batch(docs.limit(5), 0, "raw")
    with pytest.raises(ValueError, match="configured for"):
        StreamingDsir(spark, path, dim=64)._load()
    with pytest.raises(ValueError, match="side must be"):
        StreamingDsir(spark, path, dim=DIM).process_batch(docs.limit(1), 1, "tgt")
