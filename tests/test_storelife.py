"""Shared store-lifecycle module (operators/storelife.py): manifest
pointer IO on both backends, generation naming, append accounting,
stale-debt sweep, write-ahead intent."""

from __future__ import annotations

import json
import os

import pytest

from tube_spark.operators.storelife import StoreManifest


class TestLocalBackend:
    def test_roundtrip_and_missing(self, tmp_path):
        sm = StoreManifest(str(tmp_path / "m.json"))
        assert not sm.exists() and sm.read() is None
        sm.commit({"a": 1})
        assert sm.exists() and sm.read() == {"a": 1}
        sm.remove()
        assert not sm.exists()
        sm.remove()  # idempotent

    def test_commit_is_atomic_rename(self, tmp_path):
        """No .tmp residue and no truncated-file window: the temp file
        is replaced into place."""
        p = tmp_path / "m.json"
        sm = StoreManifest(str(p))
        sm.commit({"gen": 1})
        sm.commit({"gen": 2})
        assert json.load(open(p)) == {"gen": 2}
        assert not os.path.exists(str(p) + ".tmp")

    def test_creates_parent_dir(self, tmp_path):
        sm = StoreManifest(str(tmp_path / "deep" / "er" / "m.json"))
        sm.commit({"x": 1})
        assert sm.read() == {"x": 1}


class TestFsioBackend:
    def test_roundtrip(self, spark, tmp_path):
        sm = StoreManifest(str(tmp_path / "m.json"), spark)
        assert sm.read() is None
        sm.commit({"tables": {"b": "t1"}})
        assert sm.read() == {"tables": {"b": "t1"}}
        sm.remove()
        assert not sm.exists()


class TestLifecycle:
    def test_gen_name(self):
        assert StoreManifest.gen_name("cells", 0) == "cells"
        assert StoreManifest.gen_name("cells", 3) == "cells_g3"
        assert StoreManifest.gen_name("postings", 2, sep="-g") == "postings-g2"

    def test_check_compact_at(self):
        StoreManifest.check_compact_at(None)
        StoreManifest.check_compact_at(1)
        with pytest.raises(ValueError, match="auto_compact_at"):
            StoreManifest.check_compact_at(0)

    def test_bump_appends_threshold_and_commit(self, tmp_path):
        sm = StoreManifest(str(tmp_path / "m.json"))
        m = {"appends_since_compact": 0}
        assert sm.bump_appends(m, None) is False
        assert sm.bump_appends(m, 3) is False
        assert sm.bump_appends(m, 3) is True  # reached 3
        # every bump committed durably
        assert sm.read()["appends_since_compact"] == 3

    def test_record_and_sweep_stale(self, tmp_path):
        sm = StoreManifest(str(tmp_path / "m.json"))
        m = {}
        StoreManifest.record_stale(m, ["b", "a"])
        StoreManifest.record_stale(m, ["a", "c"])
        assert m["stale"] == ["a", "b", "c"]  # set-union, sorted
        sm.commit(m)
        deleted = []
        sm.sweep_stale(m, deleted.append)
        assert deleted == ["a", "b", "c"]
        assert m["stale"] == [] and sm.read()["stale"] == []
        sm.sweep_stale(m, deleted.append)  # empty: no-op, no commit
        assert deleted == ["a", "b", "c"]

    def test_pending_intent_protocol(self, tmp_path):
        sm = StoreManifest(str(tmp_path / "m.json"))
        m = {"gen": 0}
        sm.set_pending(m, {"op": "append"})
        # the intent is DURABLE before the mutation's first write
        assert sm.read()["pending"] == {"op": "append"}
        StoreManifest.clear_pending(m)
        assert "pending" not in m
        sm.commit(m)  # the mutation's own commit clears it durably
        assert "pending" not in sm.read()
        StoreManifest.clear_pending(m)  # idempotent when absent
