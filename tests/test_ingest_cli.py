"""tube_spark.ingest CLI: batch and streaming drains, quarantine gate
exit codes, JSON report shape."""

from __future__ import annotations

import json

import pytest

from tube_spark.ingest import main

SCHEMA = "doc_id long, text string"


def _write(tmp_path, lines, name="part-0.jsonl"):
    d = tmp_path / "raw"
    d.mkdir(exist_ok=True)
    (d / name).write_text("\n".join(lines) + "\n")
    return str(d)


def _lines(n_good, n_bad):
    good = [json.dumps({"doc_id": i, "text": f"doc {i}"}) for i in range(n_good)]
    return good + ["{broken"] * n_bad


def test_batch_ingest_and_gate(spark, tmp_path, capsys):
    src = _write(tmp_path, _lines(18, 2))
    rc = main([
        "--src", src, "--schema", SCHEMA, "--out", str(tmp_path / "out"),
        "--required", "doc_id,text", "--max-quarantine-frac", "0.5",
    ])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and rep["gate_ok"]
    assert rep["clean"] == 18 and rep["quarantined"] == 2
    assert rep["reasons"] == {"malformed": 2}
    assert spark.read.parquet(rep["clean_dir"]).count() == 18
    assert spark.read.parquet(rep["quarantine_dir"]).count() == 2


def test_gate_trips_on_garbage_crawl(spark, tmp_path, capsys):
    src = _write(tmp_path, _lines(5, 5))
    rc = main([
        "--src", src, "--schema", SCHEMA, "--out", str(tmp_path / "out2"),
        "--max-quarantine-frac", "0.1",
    ])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 3 and not rep["gate_ok"]
    assert rep["quarantine_frac"] == pytest.approx(0.5)


def test_streaming_ingest_cli(spark, tmp_path, capsys):
    src = _write(tmp_path, _lines(12, 1))
    rc = main([
        "--src", src, "--schema", SCHEMA, "--out", str(tmp_path / "out3"),
        "--required", "doc_id", "--streaming",
        "--checkpoint", str(tmp_path / "ck"),
    ])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert rep["clean"] == 12 and rep["quarantined"] == 1
    assert spark.read.parquet(rep["clean_dir"]).count() == 12
