"""Term-partitioned BM25 index: exact equality to the scan-time
scorer, append = rebuild, partition pruning plan-asserted, manifest
accounting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.retrieval import bm25_topk
from tube_spark.operators.searchindex import (
    append_text_index,
    build_text_index,
    search_text_index,
)

SF = "/root/testdata/sf0.001"
TERMS = ["data", "model", "training", "the"]


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_search_equals_scan_scorer_exactly(spark, tmp_path):
    docs = _docs(spark)
    build_text_index(docs, str(tmp_path / "idx"), n_buckets=16)
    got = search_text_index(spark, str(tmp_path / "idx"), TERMS, k=15)
    want = bm25_topk(docs, TERMS, k=15)
    assert _rows(got) == _rows(want)
    # single term too (different bucket set, different df join shape)
    assert _rows(
        search_text_index(spark, str(tmp_path / "idx"), ["model"], k=7)
    ) == _rows(bm25_topk(docs, ["model"], k=7))


def test_append_equals_full_rebuild(spark, tmp_path):
    docs = _docs(spark)
    first = docs.filter(F.col("doc_id") % 3 != 0)
    rest = docs.filter(F.col("doc_id") % 3 == 0)
    p = str(tmp_path / "idx")
    build_text_index(first, p, n_buckets=16)
    m = append_text_index(rest, p)
    assert m["n_docs"] == docs.count()
    got = search_text_index(spark, p, TERMS, k=15)
    p2 = str(tmp_path / "full")
    build_text_index(docs, p2, n_buckets=16)
    assert _rows(got) == _rows(search_text_index(spark, p2, TERMS, k=15))


def test_partition_pruning_and_schema(spark, tmp_path):
    docs = _docs(spark)
    build_text_index(docs, str(tmp_path / "idx"), n_buckets=32)
    df = search_text_index(spark, str(tmp_path / "idx"), ["model"], k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "tb" in plan.split("PartitionFilters", 1)[1][:200]
    # the term filter reaches the scan
    assert "PushedFilters" in plan and "term" in plan.split("PushedFilters", 1)[1][:300]


def test_manifest_accounting(spark, tmp_path):
    docs = _docs(spark).limit(50)
    m = build_text_index(docs, str(tmp_path / "idx"), n_buckets=8)
    assert m["n_docs"] == 50
    from tube_spark.operators.retrieval import term_stats

    _, doclen = term_stats(docs, "doc_id", "text")
    assert m["total_dl"] == doclen.agg(F.sum("dl")).first()[0]


def test_empty_terms_rejected(spark, tmp_path):
    build_text_index(_docs(spark).limit(5), str(tmp_path / "idx"), n_buckets=4)
    with pytest.raises(ValueError):
        search_text_index(spark, str(tmp_path / "idx"), [])


def test_append_watermark_skips_replay(spark, tmp_path):
    docs = _docs(spark)
    p = str(tmp_path / "idx")
    build_text_index(docs.filter(F.col("doc_id") % 2 == 0), p, n_buckets=8)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    append_text_index(batch, p, batch_id=1)
    once = _rows(search_text_index(spark, p, TERMS, k=10))
    m = append_text_index(batch, p, batch_id=1)  # redelivery
    assert _rows(search_text_index(spark, p, TERMS, k=10)) == once
    assert m["n_docs"] == docs.count()


def test_mid_append_crash_then_replay_does_not_double_insert(
    spark, tmp_path, monkeypatch
):
    """Crash AFTER the segment write but BEFORE the manifest commit:
    the uncommitted segment is invisible to search, and replaying the
    same append overwrites it before committing — postings and
    (n_docs, total_dl) are counted exactly once."""
    import tube_spark.operators.searchindex as si

    docs = _docs(spark)
    base = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    p = str(tmp_path / "idx")
    m0 = build_text_index(base, p, n_buckets=8)
    before = _rows(search_text_index(spark, p, TERMS, k=10))

    real_write = si._write_manifest

    def crash(*a, **kw):
        raise RuntimeError("simulated crash before manifest commit")

    monkeypatch.setattr(si, "_write_manifest", crash)
    with pytest.raises(RuntimeError):
        append_text_index(batch, p, batch_id=1)
    monkeypatch.setattr(si, "_write_manifest", real_write)

    # the segment was written but never committed: search still serves
    # the pre-append index with the pre-append stats
    assert _rows(search_text_index(spark, p, TERMS, k=10)) == before
    import json as _json

    m_after_crash = _json.loads(
        (tmp_path / "idx" / "_MANIFEST.json").read_text()
    )
    assert m_after_crash["n_docs"] == m0["n_docs"]

    # replay (same batch) commits exactly once
    m = append_text_index(batch, p, batch_id=1)
    assert m["n_docs"] == docs.count()
    p2 = str(tmp_path / "full")
    build_text_index(docs, p2, n_buckets=8)
    assert _rows(search_text_index(spark, p, TERMS, k=15)) == _rows(
        search_text_index(spark, p2, TERMS, k=15)
    )


def test_second_append_lands_in_new_segment(spark, tmp_path):
    docs = _docs(spark)
    p = str(tmp_path / "idx")
    build_text_index(docs.filter(F.col("doc_id") % 3 == 0), p, n_buckets=8)
    m1 = append_text_index(docs.filter(F.col("doc_id") % 3 == 1), p)
    m2 = append_text_index(docs.filter(F.col("doc_id") % 3 == 2), p)
    assert m1["segments"] == [0] and m2["segments"] == [0, 1]
    assert m2["next_seg"] == 2
    p2 = str(tmp_path / "full")
    build_text_index(docs, p2, n_buckets=8)
    assert _rows(search_text_index(spark, p, TERMS, k=15)) == _rows(
        search_text_index(spark, p2, TERMS, k=15)
    )


def test_compact_preserves_results_and_drops_segments(spark, tmp_path):
    from tube_spark.operators.searchindex import compact_text_index

    docs = _docs(spark)
    p = str(tmp_path / "idx")
    build_text_index(docs.filter(F.col("doc_id") % 3 == 0), p, n_buckets=8)
    append_text_index(docs.filter(F.col("doc_id") % 3 == 1), p)
    append_text_index(docs.filter(F.col("doc_id") % 3 == 2), p)
    before = _rows(search_text_index(spark, p, TERMS, k=15))
    m = compact_text_index(spark, p)
    assert m["segments"] == [] and m["postings_dir"] == "postings-g1"
    assert m["n_docs"] == docs.count()
    # results identical; superseded dirs cleaned; appends keep working
    assert _rows(search_text_index(spark, p, TERMS, k=15)) == before
    assert not (tmp_path / "idx" / "postings").exists()
    assert not (tmp_path / "idx" / "segments" / "seg-0").exists()
    more = docs.filter(F.col("doc_id") % 3 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    m2 = append_text_index(more, p)
    assert m2["segments"] == [2]  # next_seg watermark survived compaction
    # a second compaction folds the new segment into generation 2
    m3 = compact_text_index(spark, p)
    assert m3["postings_dir"] == "postings-g2" and m3["segments"] == []
    assert (
        search_text_index(spark, p, TERMS, k=15).count() == 15
    )


def test_compact_noop_without_segments(spark, tmp_path):
    from tube_spark.operators.searchindex import compact_text_index

    p = str(tmp_path / "idx")
    build_text_index(_docs(spark).limit(30), p, n_buckets=4)
    m = compact_text_index(spark, p)
    assert m.get("postings_dir", "postings") == "postings"
    assert (tmp_path / "idx" / "postings").exists()


def test_streaming_ingest_matches_batch_build(spark, tmp_path):
    from tube_spark.operators.searchindex import streaming_text_index

    docs = _docs(spark)
    src = str(tmp_path / "src")
    docs.filter(F.col("doc_id") % 3 == 0).write.parquet(src)
    p = str(tmp_path / "idx")
    q = streaming_text_index(
        spark, src, p, n_buckets=8, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    docs.filter(F.col("doc_id") % 3 != 0).write.mode("append").parquet(src)
    q2 = streaming_text_index(
        spark, src, p, n_buckets=8, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q2.awaitTermination(120)
    p2 = str(tmp_path / "full")
    build_text_index(docs, p2, n_buckets=8)
    assert _rows(search_text_index(spark, p, TERMS, k=15)) == _rows(
        search_text_index(spark, p2, TERMS, k=15)
    )


def test_inflight_search_survives_deferred_compaction(spark, tmp_path):
    """VERDICT r12 item 5: a search that resolved the gen-N roots must
    finish correctly when compact_text_index commits N+1 mid-flight
    with cleanup deferred; a later cleanup commit (even a no-segment
    noop compact) settles the recorded debt."""
    import tube_spark.operators.searchindex as si

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    path = str(tmp_path / "idx")
    si.build_text_index(docs.filter("doc_id % 2 = 0"), path, n_buckets=8)
    si.append_text_index(docs.filter("doc_id % 2 = 1"), path)
    terms = ["data", "model", "training"]
    inflight = si.search_text_index(spark, path, terms, k=10)
    want = [tuple(r) for r in inflight.collect()]
    m = si.compact_text_index(spark, path, cleanup=False)
    assert m["postings_dir"] == "postings-g1"
    assert "postings" in m["stale"] and "segments/seg-0" in m["stale"]
    assert (tmp_path / "idx" / "postings").exists()  # debt, not deleted
    # in-flight reader finishes against its resolved roots
    assert [tuple(r) for r in inflight.collect()] == want
    # a no-segment compact with cleanup settles the recorded debt
    m2 = si.compact_text_index(spark, path, cleanup=True)
    assert m2["stale"] == []
    assert not (tmp_path / "idx" / "postings").exists()
    assert not (tmp_path / "idx" / "segments" / "seg-0").exists()
    # and the compacted store still searches identically
    assert [
        tuple(r) for r in si.search_text_index(spark, path, terms, k=10).collect()
    ] == want
