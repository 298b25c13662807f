"""Persistent near-duplicate index: dedup new data AGAINST HISTORY.

The batch operators (operators/dedup.py) answer "which documents in
THIS frame duplicate each other".  A crawl pipeline's recurring
question is different: "which of today's N documents duplicate
anything in the 100 TB already ingested" — and recomputing pairwise
LSH over history + delta every day is O(corpus) daily.  This module
is the disk shape that makes the probe O(delta):

* **Index state** = two BUCKETED catalog tables (sinks/writer.py
  BucketedTableSink) + a frozen-config manifest:
    - ``<prefix>_buckets_g<k>`` (id, bb)   bucketed on ``bb``
    - ``<prefix>_sigs_g<k>``    (id, sig)  bucketed on ``id``
  ``bb = band * BAND_M + band_hash`` folds the band into ONE join
  column — a (band, bh) composite key would defeat the layout (hash
  partitioning on ``bh`` does not satisfy a two-column clustered
  distribution, so Spark would reshuffle the store).  Bucketing is
  the point: the probe's candidate join (delta bb rows vs history bb
  rows) and the verify join (candidate ids vs history signatures)
  both hit a pre-hashed layout, so the HISTORY side is never
  reshuffled — only the delta moves (tests assert the store side of
  both joins plans no Exchange).
* **Table naming**: ``<prefix>`` = name + a digest of the absolute
  ``base_dir``, and the manifest records the committed table names —
  two indexes with the same ``name`` in different base_dirs can never
  share catalog tables (their manifests are independent, so sharing
  tables silently corrupted both).  ``g<k>`` is the compaction
  generation (below).
* **Frozen config**: shingle n, num_hashes, bands, seed and bucket
  count are written to the manifest at build; ``append``/``probe``
  with a mismatched operator config raises — mixed-parameter
  signatures silently never collide (the streaming twin's
  frozen-codebook contract, streaming/lm.py).
* **probe(delta)** -> (new_id, indexed_id, est_jaccard >= threshold):
  banded-LSH candidates against history, verified by signature
  agreement (the same estimator the batch pairs use).  Probing does
  NOT mutate the index; ``append`` commits the delta's rows after
  (probe-then-append is the daily crawl loop).
* **append(delta)**: appends band rows + signatures (saveAsTable
  append keeps the bucket spec) and records the generation in the
  manifest.  ``if_absent=True`` makes the append a compensation: ids
  already present per table are anti-joined away, so replaying a
  half-committed append (crash between table write and watermark)
  cannot double rows — each saveAsTable append is all-or-nothing at
  job commit, so presence is checked per table.
* **compact()**: every append accretes one file set per bucket (the
  same segment-accretion shape that degraded BM25 search 3.2x at 8
  segments — operators/searchindex.py), so the store is periodically
  rewritten into a fresh ``g<k+1>`` table pair and committed by the
  manifest pointer — a crash before the manifest commit leaves
  orphan staging tables the replay overwrites; readers resolve table
  names from the manifest at call time, so the swap is atomic to
  them.  ``append(auto_compact_at=N)`` applies the rule without an
  operator remembering (append's manifest commit lands first, so a
  crash mid-compaction loses only the compaction, never the append).

Composes with the rest of the dedup family: probe hits feed
``connected_components`` / keep-best survivor election; the
Bloom gate (operators/bloomgate.py) remains the cheaper map-only
pre-filter when only exact membership matters.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tube_spark.operators.dedup import (
    minhash_buckets,
    minhash_est_jaccard,
    minhash_signatures,
)
from tube_spark.operators.storelife import StoreManifest
from tube_spark.sinks.writer import BucketedTableSink


class NearDupIndex:
    def __init__(
        self,
        base_dir: str,
        name: str = "neardup",
        n: int = 3,
        num_hashes: int = 64,
        bands: int = 16,
        seed: int = 42,
        n_buckets: int = 32,
    ) -> None:
        if num_hashes % bands != 0:
            raise ValueError("num_hashes must be divisible by bands")
        self.base_dir = base_dir
        self.name = name
        self.config = {
            "n": n,
            "num_hashes": num_hashes,
            "bands": bands,
            "seed": seed,
            "n_buckets": n_buckets,
        }
        scope = hashlib.md5(
            os.path.abspath(base_dir).encode("utf-8")
        ).hexdigest()[:8]
        self._prefix = f"{name}_{scope}"

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.base_dir, f"{self.name}.neardup.json")

    @property
    def _sm(self) -> StoreManifest:
        # driver-local manifest (it lives beside the frozen config, not
        # the data, which is in catalog tables) — atomic os.replace IO
        return StoreManifest(self._manifest_path)

    def _manifest(self) -> dict | None:
        return self._sm.read()

    def _check_config(self) -> dict:
        m = self._manifest()
        if m is None:
            raise ValueError(
                f"near-dup index {self.name!r} has no manifest — build() first"
            )
        if m["config"] != self.config:
            raise ValueError(
                "near-dup index config mismatch: index was built with "
                f"{m['config']}, operator configured with {self.config} — "
                "mixed-parameter signatures never collide; rebuild or match"
            )
        m.setdefault("tables", self._legacy_tables())
        return m

    def _legacy_tables(self) -> dict:
        """Pre-generation manifests carried no table names (tables were
        derived from `name` alone) — the layout those stores still
        live in."""
        return {
            "buckets": f"{self.name}_buckets",
            "sigs": f"{self.name}_sigs",
        }

    def _gen_tables(self, gen: int) -> dict:
        return {
            "buckets": f"{self._prefix}_buckets_g{gen}",
            "sigs": f"{self._prefix}_sigs_g{gen}",
        }

    def _sinks(self, tables: dict) -> tuple[BucketedTableSink, BucketedTableSink]:
        nb = self.config["n_buckets"]
        return (
            BucketedTableSink(tables["buckets"], ("bb",), n_buckets=nb),
            BucketedTableSink(tables["sigs"], ("id",), n_buckets=nb),
        )

    def tables(self) -> dict:
        """The committed {'buckets': ..., 'sigs': ...} catalog table
        names (from the manifest — the compaction generation moves
        them)."""
        return dict(self._check_config()["tables"])

    def _sign(self, docs: DataFrame, id_col: str, text_col: str):
        c = self.config
        sig = minhash_signatures(
            docs,
            id_col,
            text_col,
            n=c["n"],
            num_hashes=c["num_hashes"],
            seed=c["seed"],
        ).select(F.col(id_col).alias("id"), "sig")
        from tube_spark.operators.dedup import _BAND_M

        bkt = minhash_buckets(sig, "id", c["num_hashes"], c["bands"]).select(
            "id",
            (F.col("band") * F.lit(_BAND_M) + F.col("bh")).alias("bb"),
        )
        return sig, bkt

    def build(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> dict:
        """Create the index from scratch (overwrites any prior state)."""
        spark = docs.sparkSession
        prior = self._manifest()
        sig, bkt = self._sign(docs, id_col, text_col)
        tables = self._gen_tables(0)
        b_sink, s_sink = self._sinks(tables)
        b_sink.write(bkt, mode="overwrite")
        s_sink.write(sig, mode="overwrite")
        n_docs = s_sink.read(spark).count()
        manifest = {
            "config": self.config,
            "tables": tables,
            "table_gen": 0,
            "appends_since_compact": 0,
            "generations": [{"op": "build", "n_docs": n_docs}],
        }
        if prior is not None:
            # a rebuilt index at a higher compaction generation (or on
            # a pre-generation legacy layout) leaves the superseded
            # tables orphaned — record them at the commit so a crash
            # before the drop never leaks them, then sweep
            StoreManifest.record_stale(
                manifest,
                [
                    t
                    for t in (
                        prior.get("tables") or self._legacy_tables()
                    ).values()
                    if t not in tables.values()
                ],
            )
        self._sm.commit(manifest)
        self._sm.sweep_stale(
            manifest, lambda t: spark.sql(f"DROP TABLE IF EXISTS {t}")
        )
        return manifest

    def append(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        if_absent: bool = False,
        auto_compact_at: int | None = None,
    ) -> dict:
        """Add the delta's signatures/buckets to the index (same frozen
        config; saveAsTable append preserves the bucket spec).

        ``if_absent=True`` anti-joins each frame against its store
        table first — the replay-compensation path for a redelivered
        batch whose earlier append may have half-committed (each
        table's append is all-or-nothing at job commit, so per-table
        id presence is the exact predicate).  ``auto_compact_at=N``
        triggers ``compact()`` once this append commits and N appends
        have accumulated since the last rewrite."""
        StoreManifest.check_compact_at(auto_compact_at)
        m = self._check_config()
        spark = docs.sparkSession
        if m.get("pending"):
            # a PRIOR append half-committed (crash between the two
            # table writes): buckets may hold ids with no signatures.
            # Orphans are probe-harmless (the signature-verify join
            # drops them) but a blind re-append of the same batch
            # would DOUBLE its bucket rows — force the compensation
            # path regardless of caller flags so the store self-heals
            # on the next append, whatever the caller knows.
            if_absent = True
        b_sink, s_sink = self._sinks(m["tables"])
        sig, bkt = self._sign(docs, id_col, text_col)
        if if_absent:
            spark.catalog.refreshTable(b_sink.table)
            spark.catalog.refreshTable(s_sink.table)
            bkt = bkt.join(
                b_sink.read(spark).select("id").distinct(), "id", "left_anti"
            )
            sig = sig.join(s_sink.read(spark).select("id"), "id", "left_anti")
        # write-ahead intent BEFORE the first non-idempotent table
        # append: the two saveAsTable appends are each all-or-nothing
        # at job commit, but not atomic TOGETHER — a crash in between
        # must replay as a detected half-commit, never a blind re-run
        self._sm.set_pending(m, {"op": "append"})
        b_sink.write(bkt, mode="append")
        s_sink.write(sig, mode="append")
        n_docs = docs.select(id_col).distinct().count()
        entry = {"op": "append", "n_docs": n_docs}
        if if_absent:
            entry["if_absent"] = True
        m["generations"].append(entry)
        StoreManifest.clear_pending(m)
        if self._sm.bump_appends(m, auto_compact_at):
            m = self.compact(spark)
        return m

    def compact(self, spark: SparkSession, cleanup: bool = True) -> dict:
        """Rewrite both store tables into a fresh ``g<k+1>`` generation
        (one file set per bucket again) and commit via the manifest
        pointer; ``cleanup`` drops the superseded tables after the
        commit.  Probe plans are unchanged (same bucket spec) — what
        compaction removes is the per-append file accretion inside
        each bucket, the BM25-measured scan/open overhead."""
        m = self._check_config()
        old = m["tables"]
        gen = int(m.get("table_gen", 0)) + 1
        new = self._gen_tables(gen)
        old_b, old_s = self._sinks(old)
        new_b, new_s = self._sinks(new)
        spark.catalog.refreshTable(old_b.table)
        spark.catalog.refreshTable(old_s.table)
        repair = bool(m.get("pending"))
        # force the BUCKETED read for the rewrite: with the auto-
        # bucketed-scan rule on, a plain table rewrite reads arbitrary
        # file splits (nothing in the plan "needs" the bucket layout),
        # and saveAsTable then emits one file per (task, bucket) pair —
        # thousands of files on an accreted store (measured: 4160 in ->
        # 1500 out).  Reading one partition PER BUCKET makes each write
        # task hold exactly its own bucket: one file per bucket per
        # table, and the probe returns to the fresh-build baseline.
        auto_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
        prior = spark.conf.get(auto_key, "true")
        spark.conf.set(auto_key, "false")
        try:
            bkt = old_b.read(spark)
            if repair:
                # a half-committed append left a pending intent that
                # no later append compensated (the batch was never
                # redelivered): buckets may carry ids with no
                # signatures.  Probe-harmless, but dead bytes — purge
                # them in the rewrite, then restore the one-file-per-
                # bucket layout the semi-join's shuffle disturbed.
                nb = self.config["n_buckets"]
                bkt = bkt.join(
                    old_s.read(spark).select("id").distinct(),
                    "id",
                    "left_semi",
                ).repartition(nb, F.col("bb"))
            new_b.write(bkt, mode="overwrite")
            new_s.write(old_s.read(spark), mode="overwrite")
        finally:
            spark.conf.set(auto_key, prior)
        m["tables"] = new
        m["table_gen"] = gen
        m["appends_since_compact"] = 0
        entry = {"op": "compact", "table_gen": gen}
        if repair:
            entry["repaired"] = True
        m["generations"].append(entry)
        StoreManifest.clear_pending(m)
        StoreManifest.record_stale(m, [old["buckets"], old["sigs"]])
        self._sm.commit(m)  # the commit point: readers swap here
        if cleanup:
            self._sm.sweep_stale(
                m, lambda t: spark.sql(f"DROP TABLE IF EXISTS {t}")
            )
        return m

    def drop(self, spark: SparkSession) -> None:
        """Remove the index: committed tables (plus any recorded stale
        debt) and the manifest."""
        m = self._manifest()
        if m is not None:
            names = set(
                (m.get("tables") or self._legacy_tables()).values()
            ) | set(m.get("stale") or [])
            for t in names:
                spark.sql(f"DROP TABLE IF EXISTS {t}")
            self._sm.remove()

    def probe(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        threshold: float = 0.7,
    ) -> DataFrame:
        """(new_id, indexed_id, est_jaccard) for every delta document
        whose estimated Jaccard against an indexed document clears the
        threshold.  Read-only; history tables are consumed through
        their bucketed layout (no Exchange on the store side)."""
        m = self._check_config()
        spark: SparkSession = docs.sparkSession
        b_sink, s_sink = self._sinks(m["tables"])
        # appends may have come from another session (a streaming
        # micro-batch clone — streaming/neardup.py); refresh drops this
        # session's cached file listing so the probe sees them.  Cost:
        # one re-list per probe, which the probe job pays anyway.
        spark.catalog.refreshTable(b_sink.table)
        spark.catalog.refreshTable(s_sink.table)
        sig, bkt = self._sign(docs, id_col, text_col)
        sig = sig.localCheckpoint(eager=False)
        bkt = bkt.localCheckpoint(eager=False)
        cand = (
            bkt.withColumnRenamed("id", "new_id")
            .join(
                b_sink.read(spark).withColumnRenamed("id", "indexed_id"),
                on="bb",
            )
            .select("new_id", "indexed_id")
            .distinct()
        )
        est = minhash_est_jaccard(self.config["num_hashes"])
        return (
            cand.join(sig.select(F.col("id").alias("new_id"), F.col("sig").alias("sig_a")), "new_id")
            .join(
                s_sink.read(spark).select(
                    F.col("id").alias("indexed_id"), F.col("sig").alias("sig_b")
                ),
                "indexed_id",
            )
            .withColumn("est_jaccard", est)
            .filter(F.col("est_jaccard") >= threshold)
            .select(
                "new_id", "indexed_id", F.round("est_jaccard", 6).alias("est_jaccard")
            )
        )
