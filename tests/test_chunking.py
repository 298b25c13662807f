"""operators/chunking.py: overlapping token-window chunks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.chunking import chunk_documents


def _chunks(spark, text, chunk, overlap):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return sorted(
        (r["chunk_index"], r["start_token"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(df, chunk, overlap).collect()
    )


def test_exact_layout_with_overlap(spark):
    # 10 tokens, chunk 4, overlap 2 -> stride 2 -> windows at 0,2,4,6
    text = "ta tb tc td te tf tg th ti tj"
    got = _chunks(spark, text, 4, 2)
    assert got == [
        (0, 0, 4, "ta tb tc td"),
        (1, 2, 4, "tc td te tf"),
        (2, 4, 4, "te tf tg th"),
        (3, 6, 4, "tg th ti tj"),
    ]


def test_tail_chunk_short(spark):
    # 5 tokens, chunk 4, no overlap -> [4, 1] tokens
    got = _chunks(spark, "a b c d e", 4, 0)
    assert [g[2] for g in got] == [4, 1]
    assert got[1] == (1, 4, 1, "e")


def test_short_doc_single_chunk(spark):
    got = _chunks(spark, "only three words", 32, 8)
    assert got == [(0, 0, 3, "only three words")]


def test_tokenless_doc_dropped_and_no_shuffle(spark):
    df = spark.createDataFrame([(1, "1234 5678"), (2, "real text")], "doc_id long, text string")
    out = chunk_documents(df, 8, 2)
    assert [r["doc_id"] for r in out.collect()] == [2]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only


def test_every_token_covered(spark):
    text = " ".join(f"w{chr(97 + i // 26)}{chr(97 + i % 26)}" for i in range(57))
    got = _chunks(spark, text, 16, 4)
    covered = set()
    for _, start, n, _ in got:
        covered.update(range(start, start + n))
    assert covered == set(range(57))


def test_bad_params(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, 0)
    with pytest.raises(ValueError):
        chunk_documents(df, 8, 8)


def test_sentence_chunks_reference(spark):
    """Known text: sentence extraction, grouping, order, remainder."""
    import re

    from tube_spark.operators.chunking import sentence_chunks

    text = "One fish. Two fish! Red fish? Blue fish. End"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {
        r["chunk_id"]: (r["n_sentences"], r["chunk_text"])
        for r in sentence_chunks(df, sentences_per_chunk=2).collect()
    }
    sents = [s.strip() for s in re.findall(r"[^.!?]+[.!?]*", text) if s.strip()]
    assert sents == ["One fish.", "Two fish!", "Red fish?", "Blue fish.", "End"]
    assert got == {
        0: (2, "One fish. Two fish!"),
        1: (2, "Red fish? Blue fish."),
        2: (1, "End"),
    }


def test_sentence_chunks_order_is_layout_independent(spark):
    from tube_spark.operators.chunking import sentence_chunks

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {
        (r["doc_id"], r["chunk_id"]): r["chunk_text"]
        for r in sentence_chunks(docs).collect()
    }
    b = {
        (r["doc_id"], r["chunk_id"]): r["chunk_text"]
        for r in sentence_chunks(docs.repartition(17)).collect()
    }
    assert a == b and len(a) > 0
