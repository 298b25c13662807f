"""Hadoop-FS small-file I/O helpers (ADVICE r4: driver-side state must
not assume a driver-local filesystem).  Exercised through explicit
``file:`` URIs — the same code path hdfs:// and s3a:// take, resolved
per-path from the session's Hadoop configuration."""

from __future__ import annotations

import os

from tube_spark.functions import fsio


def test_roundtrip_and_atomic_replace(spark, tmp_path):
    base = f"file://{tmp_path}/state"
    path = fsio.join(base, "manifest.json")
    assert not fsio.exists(spark, path)
    fsio.mkdirs(spark, base)
    fsio.write_text(spark, path, '{"v": 1}')
    assert fsio.exists(spark, path)
    assert fsio.read_text(spark, path) == '{"v": 1}'
    # replace (tmp+rename) — no .tmp residue, new content wins
    fsio.write_text(spark, path, '{"v": 2}')
    assert fsio.read_text(spark, path) == '{"v": 2}'
    assert not fsio.exists(spark, path + ".tmp")
    # unicode survives the byte round-trip
    fsio.write_text(spark, path, "naïve — ünïcödé ✓")
    assert fsio.read_text(spark, path) == "naïve — ünïcödé ✓"


def test_list_and_is_dir(spark, tmp_path):
    base = f"file://{tmp_path}/store"
    assert fsio.list_names(spark, base) == []  # missing dir: empty, no raise
    assert not fsio.is_dir(spark, base)
    fsio.mkdirs(spark, fsio.join(base, "batch=1"))
    fsio.mkdirs(spark, fsio.join(base, "batch=2"))
    fsio.write_text(spark, fsio.join(base, "_meta"), "x")
    assert fsio.is_dir(spark, base)
    assert not fsio.is_dir(spark, fsio.join(base, "_meta"))
    assert sorted(fsio.list_names(spark, base)) == ["_meta", "batch=1", "batch=2"]
    # plain local paths (no scheme) work too — same FS resolution
    local = str(tmp_path / "plain")
    fsio.mkdirs(spark, local)
    assert os.path.isdir(local)


def test_join_preserves_scheme():
    assert fsio.join("s3a://bucket/a/", "b", "c") == "s3a://bucket/a/b/c"
    assert fsio.join("/tmp/x", "y.json") == "/tmp/x/y.json"
    assert fsio.join("hdfs://nn:8020/warehouse", "t") == "hdfs://nn:8020/warehouse/t"
