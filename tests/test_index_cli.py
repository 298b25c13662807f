"""Index CLI: build -> search -> append round trip, tokenization of
the free-text query, error exits."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from tube_spark.index import main

SF = "/root/testdata/sf0.001"


def _run(capsys, *argv):
    rc = main(list(argv))
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


def test_build_search_append(spark, tmp_path, capsys):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    first = str(tmp_path / "first")
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(first)
    rest = str(tmp_path / "rest")
    docs.filter(F.col("doc_id") % 2 == 1).write.parquet(rest)
    idx = str(tmp_path / "idx")

    rc, rep = _run(capsys, "build", "--docs", first, "--index", idx,
                   "--n-buckets", "16")
    assert rc == 0 and rep["manifest"]["n_docs"] == docs.count() // 2 + docs.count() % 2

    rc, rep = _run(capsys, "search", "--index", idx,
                   "--query", "The Model, DATA training!", "--k", "5")
    assert rc == 0
    assert rep["query_terms"] == ["data", "model", "the", "training"]
    assert 0 < len(rep["hits"]) <= 5
    assert rep["hits"][0]["bm25"] >= rep["hits"][-1]["bm25"]

    rc, rep = _run(capsys, "build", "--docs", rest, "--index", idx, "--append")
    assert rc == 0 and rep["manifest"]["n_docs"] == docs.count()

    # post-append search sees the full corpus (equal to a full rebuild)
    from tube_spark.operators.searchindex import build_text_index, search_text_index

    full = str(tmp_path / "full")
    build_text_index(docs, full, n_buckets=16)
    rc, rep = _run(capsys, "search", "--index", idx, "--query", "data model", "--k", "8")
    want = [
        r["doc_id"]
        for r in search_text_index(spark, full, ["data", "model"], k=8).collect()
    ]
    assert [h["doc_id"] for h in rep["hits"]] == want


def test_compact_subcommand(spark, tmp_path, capsys):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    first = str(tmp_path / "first")
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(first)
    rest = str(tmp_path / "rest")
    docs.filter(F.col("doc_id") % 2 == 1).write.parquet(rest)
    idx = str(tmp_path / "idx")
    _run(capsys, "build", "--docs", first, "--index", idx, "--n-buckets", "8")
    _run(capsys, "build", "--docs", rest, "--index", idx, "--append")
    rc, before = _run(capsys, "search", "--index", idx,
                      "--query", "data model training", "--k", "5")
    assert rc == 0
    rc, rep = _run(capsys, "compact", "--index", idx)
    assert rc == 0
    assert rep["manifest"]["postings_dir"] == "postings-g1"
    assert rep["manifest"]["segments"] == []
    rc, after = _run(capsys, "search", "--index", idx,
                     "--query", "data model training", "--k", "5")
    assert rc == 0 and after["hits"] == before["hits"]


def test_unindexable_query_exits_2(spark, tmp_path, capsys):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(5)
    idx = str(tmp_path / "idx")
    p = str(tmp_path / "docs")
    docs.select("doc_id", "text").write.parquet(p)
    _run(capsys, "build", "--docs", p, "--index", idx, "--n-buckets", "4")
    rc, rep = _run(capsys, "search", "--index", idx, "--query", "123 !!!")
    assert rc == 2 and "error" in rep


def test_vector_store_cli_roundtrip(spark, tmp_path, capsys):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    first = str(tmp_path / "vfirst")
    emb.filter(F.col("vec_id") % 2 == 0).write.parquet(first)
    rest = str(tmp_path / "vrest")
    emb.filter(F.col("vec_id") % 2 == 1).write.parquet(rest)
    idx = str(tmp_path / "vidx")

    rc, rep = _run(capsys, "build-vectors", "--embeddings", first,
                   "--index", idx, "--n-clusters", "8")
    assert rc == 0 and rep["n_cells"] <= 8
    half = rep["n_vectors"]

    rc, rep = _run(capsys, "build-vectors", "--embeddings", rest,
                   "--index", idx, "--append")
    assert rc == 0 and rep["n_vectors"] > half

    rc, rep = _run(capsys, "search-vectors", "--index", idx,
                   "--embeddings", first, "--query-id", "0", "--k", "5")
    assert rc == 0
    assert [h["rank"] for h in rep["hits"]] == [1, 2, 3, 4, 5]
    assert 0 not in [h["neighbor_id"] for h in rep["hits"]]  # self excluded

    rc, rep = _run(capsys, "search-vectors", "--index", idx,
                   "--embeddings", first, "--query-id", "999999")
    assert rc == 2 and "error" in rep


def test_auto_compact_flag_enforces_segment_threshold(spark, tmp_path, capsys):
    # appends past --auto-compact N leave a single-root store (fresh
    # postings generation, zero committed segments) with identical
    # search results — the measured compaction rule wired into the CLI
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    parts = [str(tmp_path / f"p{i}") for i in range(4)]
    for i, p in enumerate(parts):
        docs.filter(F.col("doc_id") % 4 == i).write.parquet(p)
    idx = str(tmp_path / "idx")
    _run(capsys, "build", "--docs", parts[0], "--index", idx, "--n-buckets", "8")
    # two appends below the threshold: segments accumulate
    rc, rep = _run(capsys, "build", "--docs", parts[1], "--index", idx,
                   "--append", "--auto-compact", "3")
    assert rc == 0 and rep["manifest"]["segments"] == [0]
    rc, rep = _run(capsys, "build", "--docs", parts[2], "--index", idx,
                   "--append", "--auto-compact", "3")
    assert rc == 0 and rep["manifest"]["segments"] == [0, 1]
    # the third append reaches the threshold and compacts in-call
    rc, rep = _run(capsys, "build", "--docs", parts[3], "--index", idx,
                   "--append", "--auto-compact", "3")
    assert rc == 0
    assert rep["manifest"]["segments"] == []
    assert rep["manifest"]["postings_dir"] == "postings-g1"
    assert rep["manifest"]["n_docs"] == docs.count()
    # search over the compacted store equals a scratch full rebuild
    from tube_spark.operators.searchindex import (
        build_text_index,
        search_text_index,
    )

    full = str(tmp_path / "full")
    build_text_index(docs, full, n_buckets=8)
    rc, rep = _run(capsys, "search", "--index", idx,
                   "--query", "data model training", "--k", "8")
    want = [
        r["doc_id"]
        for r in search_text_index(
            spark, full, ["data", "model", "training"], k=8
        ).collect()
    ]
    assert rc == 0 and [h["doc_id"] for h in rep["hits"]] == want


def test_auto_compact_without_append_is_rejected(tmp_path, capsys):
    """ADVICE r12: --auto-compact counts appends; without --append it
    was silently ignored — must be a usage error for both subcommands."""
    import pytest

    for argv in (
        ["build", "--docs", "x", "--index", str(tmp_path / "i1"),
         "--auto-compact", "3"],
        ["build-vectors", "--embeddings", "x",
         "--index", str(tmp_path / "i2"), "--auto-compact", "3"],
    ):
        with pytest.raises(SystemExit) as ei:
            main(argv)
        assert ei.value.code == 2
        assert "--auto-compact requires --append" in capsys.readouterr().err


def test_auto_compact_rejected_before_session_startup(tmp_path, capsys, monkeypatch):
    """ADVICE r13: the usage error must fire BEFORE get_spark — invalid
    CLI input should not pay JVM/session startup just to exit."""
    import pytest

    import tube_spark.session as sess

    def _boom(*a, **k):  # noqa: ARG001
        raise AssertionError("get_spark called before CLI validation")

    monkeypatch.setattr(sess, "get_spark", _boom)
    with pytest.raises(SystemExit) as ei:
        main(["build", "--docs", "x", "--index", str(tmp_path / "i"),
              "--auto-compact", "3"])
    assert ei.value.code == 2
    capsys.readouterr()
