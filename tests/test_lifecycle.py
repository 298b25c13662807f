"""Iterative operators must not accumulate localCheckpoint storage:
after an N-round run, at most the final round's blocks (plus the
operator's bounded working set) may remain registered."""

from __future__ import annotations

from pyspark.sql import functions as F

from tube_spark.plans.lifecycle import CheckpointRotor, persistent_rdd_ids, release_rdds


def test_rotor_releases_previous_round(spark):
    base = persistent_rdd_ids(spark)
    rotor = CheckpointRotor(spark)

    rotor.begin()
    a = spark.range(100).localCheckpoint(eager=False)
    assert a.count() == 100
    rotor.commit()
    after_a = persistent_rdd_ids(spark) - base
    assert len(after_a) >= 1

    rotor.begin()
    b = a.withColumn("x", F.col("id") * 2).localCheckpoint(eager=False)
    assert b.count() == 100
    rotor.commit()

    # a's blocks are gone, b's remain
    now = persistent_rdd_ids(spark) - base
    assert now and now.isdisjoint(after_a)

    rotor.release_all()
    assert (persistent_rdd_ids(spark) - base) == set()


def test_connected_components_storage_bounded(spark):
    from tube_spark.operators.components import connected_components

    base = persistent_rdd_ids(spark)
    # a 60-node path graph: worst-case chain forcing several CC rounds
    pairs = spark.range(59).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    cc = connected_components(pairs)
    rows = cc.collect()
    assert {r["component"] for r in rows} == {0}
    assert len(rows) == 60
    # only the final round's checkpoint may remain
    leftover = persistent_rdd_ids(spark) - base
    assert len(leftover) <= 1, leftover
    release_rdds(spark, leftover)


def test_bpe_training_storage_bounded(spark):
    from tube_spark.operators.bpe import train_bpe

    base = persistent_rdd_ids(spark)
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)],
        schema="doc_id long, text string",
    )
    merges, vocab = train_bpe(docs, num_merges=12, checkpoint_every=4)
    assert merges
    assert vocab.count() > 0
    leftover = persistent_rdd_ids(spark) - base
    assert len(leftover) <= 1, leftover
    release_rdds(spark, leftover)
