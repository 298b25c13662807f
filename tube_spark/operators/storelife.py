"""Shared persistent-store lifecycle: the manifest-pointer discipline.

Three stores accrete files per append and periodically rewrite into a
fresh generation committed by ONE manifest write — the BM25 search
index (operators/searchindex.py), the near-dup LSH index
(operators/neardup_index.py), and the IVF vector store
(operators/vectorstore.py).  Each measured the same accretion rule
independently (SCALE.md "accretion rule"), and by round 12 each had
hand-implemented the same mechanics.  This module owns them once:

* **Pointer commit** — the manifest JSON is the transaction log:
  readers resolve table/dir names from it at call time, so a
  generation swap is atomic to them.  Writes go through temp + atomic
  rename (``fsio.write_text`` on Hadoop-FS paths, ``os.replace`` for
  driver-local state), so a crash mid-write can never leave truncated
  JSON that wedges every later open.
* **Generation naming** — ``gen_name("cells", 3) == "cells_g3"``;
  generation 0 keeps the bare name so fresh stores and pre-generation
  legacy layouts share a spelling.
* **Append accounting** — ``appends_since_compact`` increments at each
  append commit; ``bump_appends`` returns whether the caller's
  ``auto_compact_at`` threshold fired (the measured rule applied
  without an operator remembering).  ``check_compact_at`` validates
  the threshold BEFORE any write lands.
* **Stale-generation sweep** — a compaction/rebuild records the
  superseded names in the manifest at the commit, and ``sweep_stale``
  deletes them afterwards (or at the NEXT commit when the caller
  defers cleanup for in-flight readers).  A crash between commit and
  delete therefore never leaks a generation forever: the manifest
  still carries the debt.
* **Write-ahead intent** — ``set_pending``/``clear_pending`` record an
  in-flight non-idempotent mutation (e.g. the near-dup index's
  two-table append) BEFORE its first write, so a crash in the middle
  replays as a DETECTED half-commit the store compensates, never a
  blind re-run.

The stores keep their own domain state (segments, centroids, frozen
configs) in the same manifest dict — this module only owns the keys
above and the IO.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from tube_spark.functions import fsio


class StoreManifest:
    """Manifest-pointer IO + lifecycle accounting for one store.

    ``spark=None`` uses driver-local ``os`` IO with atomic
    ``os.replace`` (right when the manifest lives beside driver-local
    state, e.g. the near-dup index's config file); passing a session
    routes through ``fsio`` so the manifest can live on the same
    scheme as the data (``hdfs://``, ``s3a://``)."""

    def __init__(self, path: str, spark: SparkSession | None = None) -> None:
        self.path = path
        self.spark = spark

    # -- IO ------------------------------------------------------------

    def exists(self) -> bool:
        if self.spark is None:
            return os.path.exists(self.path)
        return fsio.exists(self.spark, self.path)

    def read(self) -> dict | None:
        if not self.exists():
            return None
        if self.spark is None:
            with open(self.path) as f:
                return json.load(f)
        return json.loads(fsio.read_text(self.spark, self.path))

    def commit(self, m: dict) -> None:
        """THE pointer commit: readers swap here.  Atomic rename on
        both backends — a reader never sees a partial manifest."""
        if self.spark is None:
            d = os.path.dirname(self.path)
            if d:
                os.makedirs(d, exist_ok=True)
            tmp = self.path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(m, f)
            os.replace(tmp, self.path)
            return
        parent = self.path.rsplit("/", 1)[0]
        fsio.mkdirs(self.spark, parent)
        fsio.write_text(self.spark, self.path, json.dumps(m))

    def remove(self) -> None:
        if self.spark is None:
            if os.path.exists(self.path):
                os.remove(self.path)
            return
        fsio.delete(self.spark, self.path)

    # -- generation naming ----------------------------------------------

    @staticmethod
    def gen_name(base: str, gen: int, sep: str = "_g") -> str:
        """``base`` at generation 0 (fresh/legacy layouts), else
        ``f"{base}{sep}{gen}"`` — searchindex spells it ``-g`` for its
        directories, the table stores ``_g``."""
        return base if gen == 0 else f"{base}{sep}{gen}"

    # -- append accounting ------------------------------------------------

    @staticmethod
    def check_compact_at(auto_compact_at: int | None) -> None:
        """Validate BEFORE any write lands, so bad input can't leave a
        half-applied append behind."""
        if auto_compact_at is not None and auto_compact_at < 1:
            raise ValueError(
                f"auto_compact_at must be >= 1, got {auto_compact_at}"
            )

    def bump_appends(self, m: dict, auto_compact_at: int | None) -> bool:
        """Increment ``appends_since_compact``, commit, and return
        whether the caller should compact now.  The append's commit
        lands FIRST, so a crash mid-compaction loses only the
        compaction, never the append."""
        m["appends_since_compact"] = (
            int(m.get("appends_since_compact", 0)) + 1
        )
        self.commit(m)
        return (
            auto_compact_at is not None
            and m["appends_since_compact"] >= auto_compact_at
        )

    # -- stale-generation sweep -------------------------------------------

    @staticmethod
    def record_stale(m: dict, names) -> None:
        """Union superseded names into the manifest's debt list (the
        caller's next ``commit`` carries them; nothing is deleted
        here)."""
        m["stale"] = sorted(set(m.get("stale") or []) | set(names))

    def sweep_stale(self, m: dict, delete) -> None:
        """Settle the debt: ``delete(name)`` per recorded name, then
        clear the list and commit.  Idempotent — ``delete`` must
        tolerate already-gone names (both ``fsio.delete`` and
        ``DROP TABLE IF EXISTS`` do)."""
        stale = m.get("stale") or []
        if not stale:
            return
        for name in stale:
            delete(name)
        m["stale"] = []
        self.commit(m)

    # -- write-ahead intent -------------------------------------------------

    def set_pending(self, m: dict, op: dict | bool = True) -> None:
        """Record a non-idempotent mutation BEFORE its first write and
        commit — a crash mid-mutation then replays as a DETECTED
        half-commit (``m['pending']`` survives) instead of a blind
        re-run."""
        m["pending"] = op
        self.commit(m)

    @staticmethod
    def clear_pending(m: dict) -> None:
        """Drop the intent; the caller's own commit (the mutation's
        commit point) makes it durable in the same write."""
        m.pop("pending", None)
