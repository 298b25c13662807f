"""Incremental dedup-groups equals the batch recompute after replay.

The contract (streaming/dedup_groups.py): replaying the corpus in
appended batches through IncrementalDedupGroups yields the IDENTICAL
(doc_id, group_id, group_size, is_representative) output as running
batch minhash_lsh_pairs + dedup_groups over the full corpus — same
min-id group roots, not merely the same partition structure.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tube_spark.operators.components import dedup_groups
from tube_spark.operators.dedup import minhash_lsh_pairs
from tube_spark.streaming.dedup_groups import IncrementalDedupGroups, replay_stream

SF_DIR = "/root/testdata/sf0.001"
PARAMS = dict(n=2, num_hashes=64, bands=16, threshold=0.5, portable=True)


def _rows(df):
    return sorted(
        (r["doc_id"], r["group_id"], r["group_size"], r["is_representative"])
        for r in df.collect()
    )


def test_three_batch_replay_matches_batch(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    batches = [
        docs.filter(F.col("doc_id") % 3 == i).localCheckpoint() for i in range(3)
    ]
    got = replay_stream(spark, batches, str(tmp_path / "state"), **PARAMS)

    pairs = minhash_lsh_pairs(docs, "doc_id", "text", **PARAMS)
    want = dedup_groups(docs, pairs)

    assert _rows(got) == _rows(want)


def test_cross_batch_merge_of_existing_groups(spark, tmp_path):
    # batch 1 creates two separate groups {1,2} and {10,11}; batch 2's
    # doc 5 is near-dup of both sides -> the groups must MERGE to min id
    t_a = "alpha beta gamma delta epsilon zeta"
    t_b = "one two three four five six seven"
    rows1 = [(1, t_a), (2, t_a), (10, t_b), (11, t_b), (20, "totally unrelated text here")]
    rows2 = [(5, t_a), (6, t_b)]
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    inc = IncrementalDedupGroups(spark, str(tmp_path / "s2"), **PARAMS)
    inc.process_batch(mk(rows1))
    first = {r["doc_id"]: r["group_id"] for r in inc.assignments().collect()}
    assert first[1] == first[2] == 1
    assert first[10] == first[11] == 10
    assert first[20] == 20  # singleton

    inc.process_batch(mk(rows2))
    second = {r["doc_id"]: r["group_id"] for r in inc.assignments().collect()}
    assert second[5] == second[1] == second[2] == 1
    # doc 6 undercuts the old root 10: min-id semantics relabel the group
    assert second[6] == second[10] == second[11] == 6
    assert second[20] == 20  # untouched group carried over

    groups = {r["doc_id"]: r for r in inc.groups().collect()}
    assert groups[1]["group_size"] == 3 and groups[1]["is_representative"]
    assert groups[5]["group_size"] == 3 and not groups[5]["is_representative"]


def test_incremental_cost_reads_only_touched_groups(spark, tmp_path):
    # a batch with no near-dups must leave every prior assignment
    # byte-identical (carried over, not recomputed)
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    inc = IncrementalDedupGroups(spark, str(tmp_path / "s3"), **PARAMS)
    inc.process_batch(mk([(1, "aaa bbb ccc ddd"), (2, "aaa bbb ccc ddd")]))
    before = sorted((r["doc_id"], r["group_id"]) for r in inc.assignments().collect())
    inc.process_batch(mk([(99, "entirely different words appear in this one")]))
    after = sorted((r["doc_id"], r["group_id"]) for r in inc.assignments().collect())
    assert after == before + [(99, 99)]


def test_true_streaming_foreachbatch(spark, tmp_path):
    """streaming_dedup_groups over a real file stream (availableNow)
    matches the batch recompute on the same corpus."""
    from pyspark.sql import functions as F  # noqa: F811
    from tube_spark.streaming.dedup_groups import (
        IncrementalDedupGroups,
        streaming_dedup_groups,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    src = str(tmp_path / "stream_src")
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(src)

    q = streaming_dedup_groups(
        spark, src, str(tmp_path / "st"),
        checkpoint_dir=str(tmp_path / "ckpt"), **PARAMS,
    )
    q.awaitTermination(120)

    # drop a second file into the watched dir; a new availableNow pass
    # picks up only the unseen file (checkpoint tracks progress)
    docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(src)
    q2 = streaming_dedup_groups(
        spark, src, str(tmp_path / "st"),
        checkpoint_dir=str(tmp_path / "ckpt"), **PARAMS,
    )
    q2.awaitTermination(120)

    got = IncrementalDedupGroups(spark, str(tmp_path / "st"), **PARAMS).groups()

    pairs = minhash_lsh_pairs(docs, "doc_id", "text", **PARAMS)
    want = dedup_groups(docs, pairs)
    assert _rows(got) == _rows(want)


def test_at_least_once_redelivery_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-processing the same batch
    (duplicate bucket/sig state rows included) must leave the grouping
    unchanged."""
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    inc = IncrementalDedupGroups(spark, str(tmp_path / "s4"), **PARAMS)
    b1 = mk([(1, "aaa bbb ccc ddd eee"), (2, "aaa bbb ccc ddd eee"), (3, "other words entirely")])
    inc.process_batch(b1)
    first = _rows(inc.groups())
    inc.process_batch(b1)  # redelivery
    assert _rows(inc.groups()) == first
    b2 = mk([(4, "aaa bbb ccc ddd eee")])
    inc.process_batch(b2)  # later batch still merges correctly
    got = {r["doc_id"]: r["group_id"] for r in inc.assignments().collect()}
    assert got[4] == got[1] == got[2] == 1 and got[3] == 3


def test_lost_pointer_resumes_after_highest_version(spark, tmp_path):
    """ADVICE r5: a lost _CURRENT pointer must not restart publishing at
    assignments_0 over a directory in-flight readers may still scan —
    the next publish resumes after the highest version on disk."""
    import os

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    inc = IncrementalDedupGroups(spark, str(tmp_path / "s6"), **PARAMS)
    for i in range(2):  # publishes assignments_0, assignments_1
        inc.process_batch(mk([(200 + i, f"totally unique words {chr(97 + i)} here")]))
    os.remove(os.path.join(inc.state_dir, "_CURRENT"))
    inc.process_batch(mk([(300, "more unique words zeta here")]))
    vers = sorted(
        d for d in os.listdir(inc.state_dir) if d.startswith("assignments_")
    )
    assert "assignments_2" in vers  # resumed, not restarted
    assert open(os.path.join(inc.state_dir, "_CURRENT")).read().strip() == "assignments_2"
    # ADVICE r6: recovery must also preserve the CONTENT — the publish
    # after the loss still carries every pre-loss doc->group assignment
    # (previously prev=empty dropped them all)
    kept = {r.doc_id for r in inc.assignments().collect()}
    assert kept == {200, 201, 300}


def test_lost_pointer_read_recovers_assignments(spark, tmp_path):
    """ADVICE r6: assignments() with a lost _CURRENT pointer falls back
    to the highest complete version on disk and heals the pointer,
    instead of returning an empty frame."""
    import os

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    inc = IncrementalDedupGroups(spark, str(tmp_path / "s7"), **PARAMS)
    inc.process_batch(mk([(1, "alpha beta gamma delta unique")]))
    inc.process_batch(mk([(2, "epsilon zeta eta theta unique")]))
    os.remove(os.path.join(inc.state_dir, "_CURRENT"))
    recovered = {r.doc_id for r in inc.assignments().collect()}
    assert recovered == {1, 2}
    assert (
        open(os.path.join(inc.state_dir, "_CURRENT")).read().strip()
        == "assignments_1"
    )
    # a partial (uncommitted) higher version is skipped by the recovery
    os.remove(os.path.join(inc.state_dir, "_CURRENT"))
    partial = os.path.join(inc.state_dir, "assignments_9")
    os.makedirs(partial)  # no _SUCCESS marker: crash mid-write
    assert {r.doc_id for r in inc.assignments().collect()} == {1, 2}
    assert (
        open(os.path.join(inc.state_dir, "_CURRENT")).read().strip()
        == "assignments_1"
    )


def test_gc_versions_keeps_current(spark, tmp_path):
    import os

    import pytest

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    inc = IncrementalDedupGroups(spark, str(tmp_path / "s5"), **PARAMS)
    for i in range(4):  # four publishes -> assignments_0..3
        inc.process_batch(mk([(100 + i, f"unique words number {chr(97 + i)} here")]))
    before = sorted(d for d in os.listdir(inc.state_dir) if d.startswith("assignments_"))
    assert before == ["assignments_0", "assignments_1", "assignments_2", "assignments_3"]
    removed = inc.gc_versions(keep=2)
    assert removed == ["assignments_0", "assignments_1"]
    left = sorted(d for d in os.listdir(inc.state_dir) if d.startswith("assignments_"))
    assert left == ["assignments_2", "assignments_3"]
    assert inc.assignments().count() == 4  # current version untouched
    with pytest.raises(ValueError):
        inc.gc_versions(keep=0)
