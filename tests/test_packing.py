"""Sequence-packing semantics (operators/packing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.packing import chunk_concat, pack_first_fit


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, (i * 37) % 90 + 1) for i in range(500)]  # counts 1..90
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_chunk_concat_matches_serial_layout(spark, docs):
    out = {
        r["doc_id"]: (r["start_seq"], r["end_seq"], r["start_offset"])
        for r in chunk_concat(docs, "doc_id", "n_tokens", 128).collect()
    }
    cum = 0
    for i in range(500):
        n = (i * 37) % 90 + 1
        assert out[i] == (cum // 128, (cum + n - 1) // 128, cum % 128)
        cum += n


def test_chunk_concat_partition_independent(spark, docs):
    a = sorted(map(tuple, chunk_concat(docs, "doc_id", "n_tokens", 64).collect()))
    b = sorted(
        map(tuple, chunk_concat(docs.repartition(17), "doc_id", "n_tokens", 64).collect())
    )
    assert a == b


def test_chunk_concat_drops_empty_docs_and_validates(spark):
    d = spark.createDataFrame([(1, 0), (2, 5)], "doc_id long, n_tokens long")
    rows = chunk_concat(d, "doc_id", "n_tokens", 16).collect()
    assert [r["doc_id"] for r in rows] == [2]
    with pytest.raises(ValueError, match="seq_len"):
        chunk_concat(d, "doc_id", "n_tokens", 0)


def test_chunk_concat_no_single_partition_exchange(docs):
    plan = (
        chunk_concat(docs, "doc_id", "n_tokens", 128)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan


def test_first_fit_bins_never_overflow(spark, docs):
    out = pack_first_fit(docs, "doc_id", "n_tokens", 128, partitions=8)
    per_bin = (
        out.groupBy("bin_id")
        .agg(F.sum("n_tokens").alias("fill"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert all(r["fill"] <= 128 for r in per_bin)
    # FFD should pack reasonably tight: not more than ~2x the lower bound
    lower = sum((i * 37) % 90 + 1 for i in range(500)) / 128
    assert len(per_bin) < 2 * lower


def test_first_fit_oversized_doc_gets_own_bin(spark):
    d = spark.createDataFrame(
        [(1, 500), (2, 10), (3, 10)], "doc_id long, n_tokens long"
    )
    out = pack_first_fit(d, "doc_id", "n_tokens", 128, partitions=1).collect()
    bins = {r["doc_id"]: r["bin_id"] for r in out}
    assert bins[1] not in {bins[2], bins[3]}
    assert bins[2] == bins[3]  # the two small docs share a bin


def test_first_fit_covers_all_docs_exactly_once(spark, docs):
    out = pack_first_fit(docs, "doc_id", "n_tokens", 128, partitions=8)
    ids = [r["doc_id"] for r in out.collect()]
    assert sorted(ids) == list(range(500))


def test_first_fit_survives_empty_partitions(spark):
    # partitions > rows → some tasks see zero Arrow batches; the pack
    # fn must yield nothing, not crash on pd.concat([]) (ADVICE r3)
    df = spark.createDataFrame([(1, 10), (2, 20)], "doc_id long, n_tokens long")
    out = pack_first_fit(df, "doc_id", "n_tokens", 64, partitions=16).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 2]


def test_chunk_concat_releases_storage(spark, docs):
    # the pinned layout must not pin executor storage forever (ADVICE
    # r3: .cache() leak).  localCheckpoint blocks are GC-cleaned by the
    # ContextCleaner; crucially nothing is registered in the
    # CacheManager, which holds .cache() entries until an explicit
    # unpersist.
    cm = spark._jsparkSession.sharedState().cacheManager()
    cm.clearCache()
    chunk_concat(docs, "doc_id", "n_tokens", 128).count()
    assert cm.isEmpty()
