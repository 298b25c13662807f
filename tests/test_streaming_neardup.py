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


class TestCrashRecoveryDrill:
    """VERDICT r12 stretch: the probe-then-append loop, many batches,
    a kill injected at EVERY commit boundary in rotation, with
    auto-compaction firing mid-run — the final hit log and index must
    equal the no-crash run bit-exactly."""

    N_BATCHES = 9

    def _batches(self, spark):
        out = []
        for k in range(self.N_BATCHES):
            rows = [
                # one near-dup of the seed per batch + one chained
                # near-dup of the PREVIOUS batch + one novel doc
                (1000 * k + 1, BASE.replace("fox", f"fox{k}") * 3),
                (1000 * k + 2, OTHER.replace("spark", f"eng{k // 2}") * 3),
                (1000 * k + 3, f"novel text number {k} about topic "
                               f"{k * 7} with unique words w{k}a w{k}b " * 4),
            ]
            out.append(_docs(spark, rows))
        return out

    def _run(self, spark, tmp_path, tag, crash_boundary=None):
        """crash_boundary: None = clean run; else a callable
        (batch_id) -> boundary in {None, 'pre-intent', 'post-append'}
        — the kill to inject for that batch before redelivery."""
        idx = NearDupIndex(str(tmp_path / f"ix_{tag}"), name=f"nd_{tag}")
        idx.build(_docs(spark, [(1, BASE * 3), (2, OTHER * 3)]))
        proc = StreamingNearDup(
            idx, str(tmp_path / f"hits_{tag}"), threshold=0.6,
            auto_compact_at=4,  # compaction fires mid-run
        )
        for k, batch in enumerate(self._batches(spark)):
            boundary = crash_boundary(k) if crash_boundary else None
            if boundary is not None:
                real = proc._write_state

                def crashing(state, _real=real, _b=boundary):
                    if _b == "pre-intent":
                        # kill BEFORE the intent lands (hits written)
                        if "pending" in state:
                            raise RuntimeError("kill pre-intent")
                    else:  # post-append: kill before the watermark
                        if "pending" not in state:
                            raise RuntimeError("kill post-append")
                    _real(state)

                proc._write_state = crashing
                with pytest.raises(RuntimeError, match="kill"):
                    proc.process_batch(batch, k)
                proc._write_state = real
            # the redelivery (or first delivery on a clean run)
            proc.process_batch(batch, k)
            # post-watermark "crash" = plain wholesale-skip redelivery
            proc.process_batch(batch, k)
        return idx, proc

    def test_killed_run_equals_clean_run_bit_exactly(self, spark, tmp_path):
        clean_idx, clean_proc = self._run(spark, tmp_path, "clean")
        boundaries = [None, "pre-intent", "post-append"]
        killed_idx, killed_proc = self._run(
            spark, tmp_path, "killed",
            crash_boundary=lambda k: boundaries[k % 3],
        )
        try:
            # hit logs identical
            clean_hits = sorted(map(tuple, clean_proc.hits(spark).collect()))
            killed_hits = sorted(map(tuple, killed_proc.hits(spark).collect()))
            assert killed_hits == clean_hits
            assert len(clean_hits) > self.N_BATCHES  # the drill saw hits
            # index state identical: same signatures, same probe result
            cs = sorted(map(tuple, spark.table(
                clean_idx.tables()["sigs"]).collect()))
            ks = sorted(map(tuple, spark.table(
                killed_idx.tables()["sigs"]).collect()))
            assert ks == cs
            delta = _docs(spark, [(99991, BASE * 3), (99992, OTHER * 3)])
            cp = sorted(map(tuple, clean_idx.probe(delta, threshold=0.6).collect()))
            kp = sorted(map(tuple, killed_idx.probe(delta, threshold=0.6).collect()))
            assert kp == cp
            # compaction really fired mid-run in both
            assert clean_idx._manifest()["table_gen"] >= 2
            assert killed_idx._manifest()["table_gen"] >= 2
            assert not killed_idx._manifest().get("pending")
        finally:
            clean_idx.drop(spark)
            killed_idx.drop(spark)
