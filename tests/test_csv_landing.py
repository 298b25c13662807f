"""CSV landing reader: schema-contract parse + quarantine split."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest

from tube_spark.sources.jsonl import read_csv_landing

SCHEMA = "doc_id long, text string, score double"

GOOD = [
    "doc_id,text,score",
    "1,hello world,0.5",
    "2,second doc,1.25",
]
BAD_TYPE = "xx,bad id row,0.1"          # doc_id fails the long cast
MISSING_TEXT = "3,,0.9"                 # empty text -> null -> required gate


def _write(tmp_path, lines, name="part0.csv"):
    d = tmp_path / "in"
    d.mkdir(exist_ok=True)
    (d / name).write_text("\n".join(lines) + "\n")
    return str(d)


def test_clean_and_quarantine_split(spark, tmp_path):
    src = _write(tmp_path, GOOD + [BAD_TYPE, MISSING_TEXT])
    clean, quar = read_csv_landing(
        spark, src, SCHEMA, required=["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in clean.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["text"] == "hello world" and rows[1]["score"] == 0.5
    q = {(r["reason"], r["raw"]) for r in quar.collect()}
    reasons = sorted(r for r, _ in q)
    assert reasons == ["malformed", "missing:text"]
    # the malformed row preserves the raw line
    assert any(r == "malformed" and BAD_TYPE in raw for r, raw in q)
    # nothing dropped
    assert clean.count() + quar.count() == 4


def test_typed_schema_no_inference(spark, tmp_path):
    src = _write(tmp_path, GOOD)
    clean, quar = read_csv_landing(spark, src, SCHEMA)
    assert [f.dataType.simpleString() for f in clean.schema.fields] == [
        "bigint", "string", "double"
    ]
    assert quar.count() == 0


def test_headerless_and_custom_sep(spark, tmp_path):
    src = _write(tmp_path, ["7|seven|7.0", "8|eight|8.0"], name="p.psv")
    clean, quar = read_csv_landing(
        spark, src, SCHEMA, header=False, sep="|"
    )
    assert {r["doc_id"] for r in clean.collect()} == {7, 8}
    assert quar.count() == 0


def test_corrupt_column_name_guard(spark, tmp_path):
    with pytest.raises(ValueError, match="_corrupt_record"):
        read_csv_landing(spark, "x", "a long, _corrupt_record string")


def test_ingest_cli_csv(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "a.csv").write_text("\n".join(GOOD + [BAD_TYPE]) + "\n")
    out = tmp_path / "out"
    proc = subprocess.run(
        [
            sys.executable, "-m", "tube_spark.ingest",
            "--src", str(d), "--format", "csv",
            "--schema", SCHEMA, "--out", str(out),
            "--required", "doc_id", "--max-quarantine-frac", "0.5",
            "--master", "local[2]",
        ],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rep["clean"] == 2 and rep["quarantined"] == 1 and rep["gate_ok"]
