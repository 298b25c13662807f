"""Z-order layout: Morton math, clustered writes, file skipping."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.layout import (
    file_skipping_report,
    morton_code,
    write_zordered,
    zorder_key,
)


def _py_morton(vals: list[int], bits: int) -> int:
    z = 0
    for i in range(bits):
        for d, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * len(vals) + d)
    return z


def test_morton_matches_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 170, 255) for y in (0, 3, 128, 255)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x", "y", morton_code([F.col("x"), F.col("y")], bits=8).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _py_morton([r["x"], r["y"]], 8)


def test_zorder_key_fixed_bounds_identity(spark):
    """bounds (0, 2^bits - 1) make bucketization the identity, so the
    key is the pure Morton interleave — and appends with the same
    bounds land in the same code space."""
    df = spark.createDataFrame([(10, 20), (200, 5)], "a long, b long")
    frame, z = zorder_key(df, ["a", "b"], bits=8, bounds={"a": (0, 255), "b": (0, 255)})
    got = {(r["a"], r["b"]): r["z"] for r in frame.select("a", "b", z.alias("z")).collect()}
    assert got == {
        (10, 20): _py_morton([10, 20], 8),
        (200, 5): _py_morton([200, 5], 8),
    }


def test_zorder_validation(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError, match="at least one column"):
        zorder_key(df, [])
    with pytest.raises(ValueError, match="> 63"):
        zorder_key(df, ["a", "b"], bits=32)
    with pytest.raises(ValueError, match="bounds missing"):
        zorder_key(df, ["a", "b"], bits=8, bounds={"a": (0, 1)})


def test_file_skipping_vs_single_column_layout(spark, tmp_path):
    """The measurable payoff: a band filter on the SECOND dimension
    prunes files under Z-order but reads everything under a layout
    clustered only on the first dimension."""
    n = 20000
    df = spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.xxhash64("id") % 1000).alias("user_id"),
    )
    base, zdir = str(tmp_path / "base"), str(tmp_path / "zord")
    # baseline: clustered on event_id only
    df.repartitionByRange(8, "event_id").sortWithinPartitions(
        "event_id"
    ).write.parquet(base)
    write_zordered(df, zdir, ["event_id", "user_id"], num_files=8, bits=8)

    lo, hi = 100, 180  # narrow user_id band
    rb = file_skipping_report(spark, base, "user_id", lo, hi).collect()[0]
    rz = file_skipping_report(spark, zdir, "user_id", lo, hi).collect()[0]
    assert rb["files_total"] == rz["files_total"] == 8
    assert rb["frac_skipped"] == 0.0  # user_id scattered across every file
    assert rz["files_read"] < rz["files_total"]
    assert rz["frac_skipped"] >= 0.25

    # the first dimension still prunes under Z-order (multi-dim win)
    re_ = file_skipping_report(spark, zdir, "event_id", 0, n // 10).collect()[0]
    assert re_["frac_skipped"] >= 0.25

    # layout is a pure reordering: same rows
    assert (
        spark.read.parquet(zdir).orderBy("event_id").collect()
        == df.orderBy("event_id").collect()
    )


def test_compact_small_files(spark, tmp_path):
    """64 tiny files -> few target-size files, same rows, tight stats."""
    from tube_spark.operators.layout import compact, dir_bytes

    src, out = str(tmp_path / "small"), str(tmp_path / "compacted")
    df = spark.range(50000).select(
        F.col("id").alias("event_id"), (F.col("id") % 97).alias("k")
    )
    df.repartition(64).write.parquet(src)
    total = dir_bytes(spark, src)
    assert total > 0
    n = compact(spark, src, out, ["event_id"], target_bytes=total // 4)
    assert 4 <= n <= 6
    import glob

    files = glob.glob(f"{out}/part-*")
    assert len(files) == n
    assert (
        spark.read.parquet(out).orderBy("event_id").collect()
        == df.orderBy("event_id").collect()
    )
    # range-partitioned + sorted: a narrow band touches ~1 file
    rep = file_skipping_report(spark, out, "event_id", 100, 200).collect()[0]
    assert rep["files_read"] <= 2


def test_compact_validation(spark, tmp_path):
    from tube_spark.operators.layout import compact

    with pytest.raises(ValueError, match="target_bytes"):
        compact(spark, "x", "y", ["a"], target_bytes=0)
    with pytest.raises(ValueError, match="order column"):
        compact(spark, "x", "y", [])
