"""JSONL ingestion: schema-contract parse, exact clean/quarantine
split (nothing dropped), gzip transparency, one-scan plan."""

from __future__ import annotations

import gzip
import json

import pytest
from pyspark.sql import functions as F

from tube_spark.sources.jsonl import jsonl_ingest_report, read_jsonl

SCHEMA = "doc_id long, text string, lang string"


def _write(tmp_path, lines, name="part-0.jsonl", gz=False):
    d = tmp_path / "in"
    d.mkdir(exist_ok=True)
    p = d / (name + (".gz" if gz else ""))
    data = ("\n".join(lines) + "\n").encode()
    p.write_bytes(gzip.compress(data) if gz else data)
    return str(d)


GOOD = [json.dumps({"doc_id": i, "text": f"doc {i}", "lang": "en"}) for i in range(8)]
BROKEN = ['{"doc_id": 8, "text": "unterminated', "not json at all"]
MISSING = [json.dumps({"doc_id": 9, "lang": "en"}), json.dumps({"doc_id": None, "text": "x"})]


def test_split_is_exact_nothing_dropped(spark, tmp_path):
    src = _write(tmp_path, GOOD + BROKEN + MISSING)
    clean, quar = read_jsonl(spark, src, SCHEMA, required=["doc_id", "text"])
    assert clean.count() + quar.count() == len(GOOD + BROKEN + MISSING)
    assert clean.count() == 8
    reasons = sorted(r["reason"] for r in quar.collect())
    assert reasons == ["malformed", "malformed", "missing:doc_id", "missing:text"]
    # malformed lines keep their raw text verbatim
    raws = {r["raw"] for r in quar.filter(F.col("reason") == "malformed").collect()}
    assert raws == set(BROKEN)
    # clean rows are typed per the contract
    assert dict(clean.dtypes)["doc_id"] == "bigint"


def test_no_required_columns(spark, tmp_path):
    src = _write(tmp_path, GOOD + MISSING)
    clean, quar = read_jsonl(spark, src, SCHEMA)
    assert clean.count() == 10 and quar.count() == 0  # missing fields are valid JSON


def test_gzip_transparent(spark, tmp_path):
    src = _write(tmp_path, GOOD, name="part-0.jsonl", gz=True)
    clean, quar = read_jsonl(spark, src, SCHEMA, required=["doc_id"])
    assert clean.count() == 8 and quar.count() == 0


def test_ingest_report(spark, tmp_path):
    src = _write(tmp_path, GOOD + BROKEN + MISSING)
    clean, quar = read_jsonl(spark, src, SCHEMA, required=["doc_id", "text"])
    row = jsonl_ingest_report(clean, quar).collect()[0]
    assert row["n_clean"] == 8 and row["n_quarantined"] == 4
    assert row["reasons"] == "malformed=2,missing:doc_id=1,missing:text=1"


def test_validation_errors(spark, tmp_path):
    src = _write(tmp_path, GOOD)
    with pytest.raises(ValueError, match="_corrupt_record"):
        read_jsonl(spark, src, "a long, _corrupt_record string")
    with pytest.raises(ValueError, match="required column"):
        read_jsonl(spark, src, SCHEMA, required=["nope"])


def test_one_scan_no_python_stages(spark, tmp_path):
    """Both frames read the ONE pinned scan (localCheckpoint RDD), not
    the file source twice; everything stays JVM-side."""
    src = _write(tmp_path, GOOD + BROKEN)
    clean, quar = read_jsonl(spark, src, SCHEMA, required=["doc_id"])
    for df in (clean, quar):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "FileScan json" not in plan  # reads the pinned checkpoint
        assert "Scan ExistingRDD" in plan


def test_streaming_ingest_matches_batch(spark, tmp_path):
    """Streamed clean/quarantine equals the batch read_jsonl split;
    restart against the same checkpoint appends nothing twice; a late
    file is picked up exactly once."""
    from tube_spark.streaming.jsonl import streaming_jsonl_ingest

    src = _write(tmp_path, GOOD + BROKEN + MISSING)
    clean_d, quar_d = str(tmp_path / "clean"), str(tmp_path / "quar")
    ckpt = str(tmp_path / "ck")
    q = streaming_jsonl_ingest(
        spark, src, SCHEMA, clean_d, quar_d,
        required=["doc_id", "text"], checkpoint_dir=ckpt,
    )
    q.awaitTermination(120)
    got_clean = spark.read.parquet(clean_d).drop("batch")
    got_quar = spark.read.parquet(quar_d).drop("batch")
    want_clean, want_quar = read_jsonl(spark, src, SCHEMA, required=["doc_id", "text"])
    assert sorted(r["doc_id"] for r in got_clean.collect()) == sorted(
        r["doc_id"] for r in want_clean.collect()
    )
    assert sorted((r["reason"], r["raw"]) for r in got_quar.collect()) == sorted(
        (r["reason"], r["raw"]) for r in want_quar.collect()
    )
    # restart: redelivery opportunity, nothing doubles
    q = streaming_jsonl_ingest(
        spark, src, SCHEMA, clean_d, quar_d,
        required=["doc_id", "text"], checkpoint_dir=ckpt,
    )
    q.awaitTermination(120)
    assert spark.read.parquet(clean_d).count() == 8
    # late file arrives
    more = [__import__("json").dumps({"doc_id": 100 + i, "text": "late", "lang": "en"}) for i in range(3)]
    _write(tmp_path, more, name="part-1.jsonl")
    q = streaming_jsonl_ingest(
        spark, src, SCHEMA, clean_d, quar_d,
        required=["doc_id", "text"], checkpoint_dir=ckpt,
    )
    q.awaitTermination(120)
    assert spark.read.parquet(clean_d).count() == 11
