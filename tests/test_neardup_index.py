"""Persistent near-dup index (operators/neardup_index.py): probe-
against-history semantics, frozen config, and the no-store-shuffle
plan contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.neardup_index import NearDupIndex

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the tall green tree near the old stone wall by the river "
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def history(spark, tmp_path):
    name = "ndix_t"
    idx = NearDupIndex(str(tmp_path), name=name, bands=16, num_hashes=64)
    hist = _docs(spark, [
        (1, BASE * 3),
        (2, "completely different content about spark shuffles and parquet "
            "row groups and adaptive query execution plans " * 3),
        (3, "a third unrelated document mentioning bloom filters and "
            "hyperloglog sketches and reservoir sampling methods " * 3),
    ])
    idx.build(hist)
    yield idx
    idx.drop(spark)


class TestNearDupIndex:
    def test_probe_finds_near_dup_of_history(self, spark, history):
        delta = _docs(spark, [
            # near-dup of doc 1: one word changed per repetition
            (101, (BASE.replace("lazy", "sleepy")) * 3),
            (102, "entirely novel text about krill and baleen whales in "
                  "the southern ocean feeding grounds " * 3),
        ])
        hits = history.probe(delta, threshold=0.5).collect()
        pairs = {(r["new_id"], r["indexed_id"]) for r in hits}
        assert (101, 1) in pairs
        assert all(r["new_id"] != 102 for r in hits)
        est = {r["new_id"]: r["est_jaccard"] for r in hits}
        assert est[101] >= 0.5

    def test_probe_is_readonly_and_append_commits(self, spark, history):
        delta = _docs(spark, [(201, BASE * 3)])
        assert history.probe(delta, threshold=0.9).count() >= 1
        # not appended yet: a second probe of the same doc still only
        # matches the original history rows, never 201 itself
        again = history.probe(delta, threshold=0.9)
        assert again.filter(F.col("indexed_id") == 201).count() == 0
        history.append(delta)
        after = history.probe(_docs(spark, [(202, BASE * 3)]), threshold=0.9)
        assert after.filter(F.col("indexed_id") == 201).count() == 1
        assert history._manifest()["generations"][-1] == {
            "op": "append", "n_docs": 1,
        }

    def test_frozen_config_enforced(self, spark, history, tmp_path):
        other = NearDupIndex(str(tmp_path), name="ndix_t", bands=8)
        with pytest.raises(ValueError, match="config mismatch"):
            other.probe(_docs(spark, [(1, "x")]))
        with pytest.raises(ValueError, match="config mismatch"):
            other.append(_docs(spark, [(1, "x")]))

    def test_build_required_before_probe(self, spark, tmp_path):
        idx = NearDupIndex(str(tmp_path), name="ndix_nope")
        with pytest.raises(ValueError, match="no manifest"):
            idx.probe(_docs(spark, [(1, "x")]))

    def test_store_side_never_reshuffles(self, spark, history):
        """Differential plan check: probing a bucketed store must plan
        strictly fewer hash exchanges than the same probe against
        unbucketed copies — the store-side Exchanges are the ones that
        disappear (both scans show Bucketed: true)."""
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            delta = _docs(spark, [(301, BASE * 3)])
            probe = history.probe(delta, threshold=0.5)
            plan = probe._jdf.queryExecution().executedPlan().toString()
            assert plan.count("Bucketed: true") >= 2, plan[:3000]

            # same joins against unbucketed snapshots of the store
            tables = history.tables()
            flat_b = spark.table(tables["buckets"]).localCheckpoint()
            flat_s = spark.table(tables["sigs"]).localCheckpoint()
            sig, bkt = history._sign(delta, "doc_id", "text")
            from tube_spark.operators.dedup import minhash_est_jaccard

            cand = (
                bkt.withColumnRenamed("id", "new_id")
                .join(flat_b.withColumnRenamed("id", "indexed_id"), on="bb")
                .select("new_id", "indexed_id")
                .distinct()
            )
            flat = (
                cand.join(
                    sig.select(
                        F.col("id").alias("new_id"), F.col("sig").alias("sig_a")
                    ),
                    "new_id",
                )
                .join(
                    flat_s.select(
                        F.col("id").alias("indexed_id"),
                        F.col("sig").alias("sig_b"),
                    ),
                    "indexed_id",
                )
                .withColumn("est_jaccard", minhash_est_jaccard(64))
                .filter(F.col("est_jaccard") >= 0.5)
            )
            flat_plan = flat._jdf.queryExecution().executedPlan().toString()
            n_bucketed = plan.count("Exchange hashpartitioning")
            n_flat = flat_plan.count("Exchange hashpartitioning")
            assert n_bucketed < n_flat, (n_bucketed, n_flat)
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )

    def test_divisibility_validation(self, tmp_path):
        with pytest.raises(ValueError):
            NearDupIndex(str(tmp_path), num_hashes=64, bands=10)

    def test_same_name_different_base_dirs_do_not_collide(
        self, spark, tmp_path
    ):
        # ADVICE r11: table names derived from `name` alone let two
        # indexes in different base_dirs silently share catalog tables
        a = NearDupIndex(str(tmp_path / "a"), name="ndix_dup")
        b = NearDupIndex(str(tmp_path / "b"), name="ndix_dup")
        try:
            a.build(_docs(spark, [(1, BASE * 3)]))
            b.build(_docs(spark, [(2, "unrelated words about whales and "
                                      "krill in the ocean " * 3)]))
            assert set(a.tables().values()).isdisjoint(b.tables().values())
            # a's store is untouched by b's build: probing a near-dup
            # of doc 1 still hits, and never yields b's doc 2
            hits = a.probe(
                _docs(spark, [(10, BASE * 3)]), threshold=0.9
            ).collect()
            assert {r["indexed_id"] for r in hits} == {1}
        finally:
            a.drop(spark)
            b.drop(spark)

    def test_append_if_absent_compensates_half_commit(self, spark, history):
        delta = _docs(spark, [(401, BASE.replace("river", "creek") * 3)])
        history.append(delta)  # the "half-committed" prior attempt
        tables = history.tables()
        rows_b = spark.table(tables["buckets"]).filter("id = 401").count()
        rows_s = spark.table(tables["sigs"]).filter("id = 401").count()
        assert rows_b > 0 and rows_s == 1
        history.append(delta, if_absent=True)  # the compensated replay
        spark.catalog.refreshTable(tables["buckets"])
        spark.catalog.refreshTable(tables["sigs"])
        assert spark.table(tables["buckets"]).filter("id = 401").count() == rows_b
        assert spark.table(tables["sigs"]).filter("id = 401").count() == 1


class TestCompaction:
    def test_compact_swaps_generation_and_preserves_results(
        self, spark, history
    ):
        for i in range(3):
            history.append(
                _docs(spark, [(500 + i, BASE.replace("dog", f"dog{i}") * 3)])
            )
        before_tables = history.tables()
        probe_docs = _docs(spark, [(900, BASE * 3)])
        before = sorted(
            (r["new_id"], r["indexed_id"], r["est_jaccard"])
            for r in history.probe(probe_docs, threshold=0.4).collect()
        )
        m = history.compact(spark)
        after_tables = history.tables()
        assert after_tables != before_tables
        assert m["table_gen"] == 1
        assert m["appends_since_compact"] == 0
        # superseded tables are dropped after the manifest commit
        existing = {t.name for t in spark.catalog.listTables()}
        assert not set(v.split(".")[-1] for v in before_tables.values()) & existing
        after = sorted(
            (r["new_id"], r["indexed_id"], r["est_jaccard"])
            for r in history.probe(probe_docs, threshold=0.4).collect()
        )
        assert after == before

    def test_auto_compact_triggers_at_threshold(self, spark, history):
        assert history._manifest().get("table_gen", 0) == 0
        history.append(
            _docs(spark, [(601, BASE.replace("cat", "kit") * 3)]),
            auto_compact_at=2,
        )
        assert history._manifest()["table_gen"] == 0  # 1 append < 2
        history.append(
            _docs(spark, [(602, BASE.replace("cat", "pup") * 3)]),
            auto_compact_at=2,
        )
        m = history._manifest()
        assert m["table_gen"] == 1
        assert m["generations"][-1]["op"] == "compact"
        # appended rows survived the rewrite
        hits = history.probe(
            _docs(spark, [(700, BASE.replace("cat", "pup") * 3)]),
            threshold=0.9,
        ).collect()
        assert 602 in {r["indexed_id"] for r in hits}

    def test_auto_compact_validation(self, spark, history):
        with pytest.raises(ValueError, match="auto_compact_at"):
            history.append(_docs(spark, [(1, "x")]), auto_compact_at=0)


def test_legacy_manifest_drop_and_rebuild(spark, tmp_path):
    """Pre-generation manifests carried no table names; drop() and a
    rebuild must clean up the LEGACY-named tables, not the
    generation-suffixed names that never existed (r12 review)."""
    import json

    name = "ndix_legacy"
    idx = NearDupIndex(str(tmp_path), name=name)
    idx.build(_docs(spark, [(1, BASE * 3)]))
    # rewrite the store into the legacy layout: legacy-named tables +
    # a manifest without the "tables" key
    tables = idx.tables()
    spark.sql(
        f"CREATE TABLE {name}_buckets AS SELECT * FROM {tables['buckets']}"
    )
    spark.sql(f"CREATE TABLE {name}_sigs AS SELECT * FROM {tables['sigs']}")
    spark.sql(f"DROP TABLE {tables['buckets']}")
    spark.sql(f"DROP TABLE {tables['sigs']}")
    m = idx._manifest()
    del m["tables"]
    with open(idx._manifest_path, "w") as f:
        json.dump(m, f)
    # probe still works through the legacy fallback
    hits = idx.probe(_docs(spark, [(9, BASE * 3)]), threshold=0.9).collect()
    assert {r["indexed_id"] for r in hits} == {1}
    # drop() removes the LEGACY tables
    idx.drop(spark)
    existing = {t.name for t in spark.catalog.listTables()}
    assert f"{name}_buckets" not in existing
    assert f"{name}_sigs" not in existing


class TestPendingAppendIntent:
    """VERDICT r12 item 3: a crashed plain append() (between the two
    table writes) must be detected and compensated on the next
    mutation REGARDLESS of caller flags."""

    def _crash_sigs_append(self, monkeypatch, idx):
        from tube_spark.sinks.writer import BucketedTableSink

        sigs_table = idx.tables()["sigs"]
        real = BucketedTableSink.write

        def crashing(self, df, mode="overwrite"):
            if self.table == sigs_table and mode == "append":
                raise RuntimeError("simulated crash between table appends")
            return real(self, df, mode=mode)

        monkeypatch.setattr(BucketedTableSink, "write", crashing)
        return real

    def test_plain_reappend_after_crash_self_heals(
        self, spark, history, monkeypatch
    ):
        from tube_spark.sinks.writer import BucketedTableSink

        batch = _docs(spark, [(501, BASE.replace("tree", "shrub") * 3)])
        real = self._crash_sigs_append(monkeypatch, history)
        with pytest.raises(RuntimeError, match="simulated crash"):
            history.append(batch)
        monkeypatch.setattr(BucketedTableSink, "write", real)

        m = history._manifest()
        assert m.get("pending")  # the write-ahead intent survived
        tables = history.tables()
        spark.catalog.refreshTable(tables["buckets"])
        rows_b = spark.table(tables["buckets"]).filter("id = 501").count()
        assert rows_b > 0  # buckets landed, sigs did not
        assert spark.table(tables["sigs"]).filter("id = 501").count() == 0

        # PLAIN re-append (caller knows nothing): must not double the
        # bucket rows, must land the signatures, must clear the intent
        history.append(batch)
        spark.catalog.refreshTable(tables["buckets"])
        spark.catalog.refreshTable(tables["sigs"])
        assert (
            spark.table(tables["buckets"]).filter("id = 501").count()
            == rows_b
        )
        assert spark.table(tables["sigs"]).filter("id = 501").count() == 1
        assert not history._manifest().get("pending")
        # the healed store probes like a clean one
        hits = history.probe(
            _docs(spark, [(502, BASE.replace("tree", "shrub") * 3)]),
            threshold=0.9,
        )
        assert 501 in {r["indexed_id"] for r in hits.collect()}

    def test_compact_repairs_never_redelivered_half_commit(
        self, spark, history, monkeypatch
    ):
        from tube_spark.sinks.writer import BucketedTableSink

        batch = _docs(spark, [(601, BASE.replace("wall", "fence") * 3)])
        real = self._crash_sigs_append(monkeypatch, history)
        with pytest.raises(RuntimeError, match="simulated crash"):
            history.append(batch)
        monkeypatch.setattr(BucketedTableSink, "write", real)
        assert history._manifest().get("pending")

        # the batch is never redelivered; compaction purges the orphan
        # bucket rows and clears the intent
        m = history.compact(spark)
        assert not m.get("pending")
        assert m["generations"][-1] == {
            "op": "compact", "table_gen": m["table_gen"], "repaired": True,
        }
        tables = history.tables()
        bkt_ids = {
            r["id"] for r in spark.table(tables["buckets"])
            .select("id").distinct().collect()
        }
        sig_ids = {
            r["id"] for r in spark.table(tables["sigs"])
            .select("id").distinct().collect()
        }
        assert 601 not in bkt_ids  # orphans purged
        assert bkt_ids == sig_ids  # store is internally consistent
        # and the repaired store still probes correctly
        hits = history.probe(_docs(spark, [(602, BASE * 3)]), threshold=0.9)
        assert 1 in {r["indexed_id"] for r in hits.collect()}

    def test_probe_is_correct_mid_recovery(self, spark, history, monkeypatch):
        """Orphan bucket rows (ids with no signatures) must never
        surface as hits: the signature-verify join drops them."""
        from tube_spark.sinks.writer import BucketedTableSink

        batch = _docs(spark, [(701, BASE.replace("dog", "pug") * 3)])
        real = self._crash_sigs_append(monkeypatch, history)
        with pytest.raises(RuntimeError, match="simulated crash"):
            history.append(batch)
        monkeypatch.setattr(BucketedTableSink, "write", real)
        hits = history.probe(
            _docs(spark, [(702, BASE.replace("dog", "pug") * 3)]),
            threshold=0.5,
        ).collect()
        assert 701 not in {r["indexed_id"] for r in hits}  # no sig, no hit
        assert 1 in {r["indexed_id"] for r in hits}  # history still hit


class TestConcurrentReaderCompaction:
    """VERDICT r12 item 5: an in-flight reader that resolved generation
    N must finish correctly when a compaction commits N+1 mid-flight
    (cleanup deferred), and the sweep only settles recorded debt at the
    next cleanup commit."""

    def test_inflight_probe_survives_deferred_compaction(
        self, spark, history
    ):
        history.append(_docs(spark, [(801, BASE.replace("cat", "kit") * 3)]))
        old_tables = history.tables()
        # resolve the probe plan against generation N
        inflight = history.probe(
            _docs(spark, [(802, BASE.replace("cat", "kit") * 3)]),
            threshold=0.8,
        )
        m = history.compact(spark, cleanup=False)  # commit N+1 mid-flight
        assert m["tables"] != old_tables
        # deferred: the old generation is recorded as debt, NOT dropped
        assert set(m["stale"]) == set(old_tables.values())
        for t in old_tables.values():
            assert spark.catalog.tableExists(t)
        # the in-flight reader finishes against its resolved generation
        assert 801 in {r["indexed_id"] for r in inflight.collect()}
        # the NEXT cleanup commit settles the debt (gen N and N+1)
        history.compact(spark)
        for t in old_tables.values():
            assert not spark.catalog.tableExists(t)
        assert history._manifest()["stale"] == []
