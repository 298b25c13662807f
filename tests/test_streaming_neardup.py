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

    def _simulate_half_commit(self, proc, batch, batch_id, append=True):
        """Reproduce the exact on-disk state a crash between append and
        watermark leaves behind: hit directory committed (the write
        order is hits -> intent -> append), pending intent recorded,
        and (optionally) the index append landed."""
        import os

        hits = proc.index.probe(
            batch, proc.id_col, proc.text_col, proc.threshold
        )
        hits.write.mode("overwrite").parquet(
            os.path.join(proc.hits_dir, f"batch_id={batch_id}")
        )
        st = proc._state()
        st["pending"] = {"batch_id": batch_id}
        proc._write_state(st)
        if append:
            proc.index.append(batch, proc.id_col, proc.text_col)

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
        self._simulate_half_commit(proc, batch, 1)
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

    def test_replay_keeps_hits_against_earlier_batches_same_id(
        self, spark, seeded
    ):
        """ADVICE r12: a doc id indexed by an EARLIER batch and
        re-ingested in the crashed batch is a legitimate hit target —
        the r12 replay anti-joined it away, diverging from the
        crash-free output.  The replay must keep it (it keeps the
        crash-free hit directory wholesale now)."""
        idx, proc = seeded
        txt = BASE.replace("cat", "bat") * 3
        proc.process_batch(_docs(spark, [(700, txt)]), 0)
        batch = _docs(spark, [(700, txt)])  # same id re-ingested
        self._simulate_half_commit(proc, batch, 1)
        proc.process_batch(batch, 1)  # the redelivery
        h1 = {(r["new_id"], r["indexed_id"])
              for r in proc.hits(spark).filter("batch_id = 1").collect()}
        assert (700, 700) in h1  # hit vs the batch-0 copy survives
        assert proc._state() == {"last_batch_id": 1}

    def test_replay_with_missing_hit_dir_raises(self, spark, seeded):
        """A pending intent without its committed hit directory cannot
        arise from a crash (the intent is written only after the hit
        log commits) — the loop refuses to guess instead of silently
        diverging."""
        idx, proc = seeded
        batch = _docs(spark, [(130, BASE * 3)])
        st = proc._state()
        st["pending"] = {"batch_id": 2}
        proc._write_state(st)
        with pytest.raises(RuntimeError, match="pending append intent"):
            proc.process_batch(batch, 2)

    def test_replay_after_crash_before_append(self, spark, seeded):
        """Crash after the intent write but BEFORE the append: the
        compensated replay must still append the whole batch."""
        idx, proc = seeded
        batch = _docs(spark, [(120, BASE.replace("dog", "owl") * 3)])
        self._simulate_half_commit(proc, batch, 0, append=False)
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
