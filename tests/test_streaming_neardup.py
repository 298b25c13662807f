"""Streaming probe-then-append near-dup loop (streaming/neardup.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.neardup_index import NearDupIndex
from tube_spark.streaming.neardup import StreamingNearDup, streaming_neardup_ingest

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the tall green tree near the old stone wall by the river "
)
OTHER = (
    "completely different content about spark shuffles and parquet row "
    "groups and adaptive query execution plans at scale today "
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def seeded(spark, tmp_path):
    idx = NearDupIndex(str(tmp_path / "ix"), name="ndix_st")
    idx.build(_docs(spark, [(1, BASE * 3), (2, OTHER * 3)]))
    proc = StreamingNearDup(idx, str(tmp_path / "hits"), threshold=0.6)
    yield idx, proc
    idx.drop(spark)


class TestStreamingNearDup:
    def test_later_batches_see_earlier_appends(self, spark, seeded):
        idx, proc = seeded
        # batch 0: near-dup of seed doc 1, plus a novel doc 200
        proc.process_batch(
            _docs(spark, [(100, BASE.replace("fox", "wolf") * 3),
                          (200, OTHER.replace("spark", "flink") * 3)]), 0
        )
        # batch 1: near-dup of the NOVEL doc from batch 0 — only
        # findable because batch 0 was appended after its probe
        proc.process_batch(
            _docs(spark, [(300, OTHER.replace("spark", "flink") * 3)]), 1
        )
        hits = proc.hits(spark)
        h0 = {(r["new_id"], r["indexed_id"]) for r in hits.filter("batch_id = 0").collect()}
        assert (100, 1) in h0
        h1 = {(r["new_id"], r["indexed_id"]) for r in hits.filter("batch_id = 1").collect()}
        assert (300, 200) in h1

    def test_redelivery_is_a_wholesale_noop(self, spark, seeded):
        idx, proc = seeded
        b = _docs(spark, [(100, BASE * 3)])
        proc.process_batch(b, 0)
        rows_before = sorted(proc.hits(spark).collect())
        gens_before = len(idx._manifest()["generations"])
        proc.process_batch(b, 0)  # redelivered
        assert sorted(proc.hits(spark).collect()) == rows_before
        assert len(idx._manifest()["generations"]) == gens_before

    def test_replay_after_crash_between_append_and_watermark(
        self, spark, seeded
    ):
        """ADVICE r11: a crash after index.append but before the
        watermark write must not double the index rows or log
        self-hits on replay."""
        idx, proc = seeded
        proc.process_batch(_docs(spark, [(100, BASE * 3)]), 0)
        batch = _docs(spark, [(110, BASE.replace("fox", "hen") * 3),
                              (210, OTHER.replace("row", "col") * 3)])
        # simulate the half-commit: intent recorded, append landed,
        # watermark never written (the crash window)
        st = proc._state()
        st["pending"] = {"batch_id": 1}
        proc._write_state(st)
        idx.append(batch)
        tables = idx.tables()
        rows_before = spark.table(tables["buckets"]).filter(
            F.col("id").isin(110, 210)
        ).count()
        proc.process_batch(batch, 1)  # the redelivery
        # no blind double append
        spark.catalog.refreshTable(tables["buckets"])
        assert spark.table(tables["buckets"]).filter(
            F.col("id").isin(110, 210)
        ).count() == rows_before
        # no self-hits: the batch is in the index at probe time, but
        # the hit log keeps the delta-vs-history contract
        h1 = proc.hits(spark).filter("batch_id = 1").collect()
        assert all(r["indexed_id"] not in (110, 210) for r in h1)
        assert {r["new_id"] for r in h1} >= {110}  # real history hit kept
        assert proc._state() == {"last_batch_id": 1}

    def test_replay_after_crash_before_append(self, spark, seeded):
        """Crash after the intent write but BEFORE the append: the
        compensated replay must still append the whole batch."""
        idx, proc = seeded
        batch = _docs(spark, [(120, BASE.replace("dog", "owl") * 3)])
        st = proc._state()
        st["pending"] = {"batch_id": 0}
        proc._write_state(st)
        proc.process_batch(batch, 0)  # redelivery; append never ran
        h0 = {(r["new_id"], r["indexed_id"])
              for r in proc.hits(spark).filter("batch_id = 0").collect()}
        assert (120, 1) in h0
        after = idx.probe(_docs(spark, [(130, BASE.replace("dog", "owl") * 3)]),
                          threshold=0.9)
        assert 120 in {r["indexed_id"] for r in after.collect()}

    def test_wired_stream_drains_files(self, spark, seeded, tmp_path):
        idx, proc = seeded
        src = tmp_path / "landing"
        _docs(spark, [(400, BASE * 3)]).write.parquet(str(src / "f1"))
        _docs(spark, [(500, BASE * 3)]).write.parquet(str(src / "f2"))
        q = streaming_neardup_ingest(
            spark, str(src / "*"), proc,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        q.awaitTermination(120)
        hits = proc.hits(spark)
        new_ids = {r["new_id"] for r in hits.collect()}
        assert {400, 500} <= new_ids
        # both drained docs are now themselves in the index
        after = idx.probe(_docs(spark, [(600, BASE * 3)]), threshold=0.9)
        assert {r["indexed_id"] for r in after.collect()} >= {400, 500}
