"""Hard-negative mining and class-balanced resampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.mining import class_balanced, hard_negatives

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_hard_negatives_labels_and_order(spark, emb):
    anchors = emb.filter(F.col("vec_id") < 5)
    out = hard_negatives(emb, k=3, candidate_k=30, anchors=anchors).collect()
    by_anchor: dict[int, list] = {}
    for r in out:
        assert r["anchor_label"] != r["negative_label"]
        by_anchor.setdefault(r["anchor_id"], []).append(r)
    for rows in by_anchor.values():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        cosines = [r["cosine"] for r in rows]
        assert cosines == sorted(cosines, reverse=True)
        assert len(rows) <= 3


def test_hard_negatives_validation(emb):
    with pytest.raises(ValueError, match="candidate_k"):
        hard_negatives(emb, k=10, candidate_k=5)


def test_class_balanced_up_and_down(spark):
    rows = [(i, "minor" if i < 4 else "major") for i in range(104)]
    df = spark.createDataFrame(rows, "vec_id long, label string")
    out = class_balanced(df, "label", target=10, id_col="vec_id")
    counts = {
        r["label"]: r["n"]
        for r in out.groupBy("label").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"minor": 10, "major": 10}
    # minority: 4 rows -> 2 copies each + 2 extras; every original id kept
    minor = out.filter(F.col("label") == "minor").collect()
    per_id = {}
    for r in minor:
        per_id.setdefault(r["vec_id"], []).append(r["copy"])
    assert set(per_id) == {0, 1, 2, 3}
    assert all(sorted(c) == list(range(len(c))) for c in per_id.values())
    # deterministic under repartitioning
    again = class_balanced(df.repartition(7), "label", target=10, id_col="vec_id")
    assert sorted((r["vec_id"], r["copy"]) for r in again.collect()) == sorted(
        (r["vec_id"], r["copy"]) for r in out.collect()
    )


def test_class_balanced_validation(spark):
    df = spark.createDataFrame([(1, "a")], "vec_id long, label string")
    with pytest.raises(ValueError, match="target"):
        class_balanced(df, "label", 0)


def test_association_rules_reference(spark):
    """Known baskets: counts, supports, confidence, lift vs hand math."""
    from tube_spark.operators.mining import association_rules

    rows = [
        (1, "x"), (1, "y"), (1, "z"),
        (2, "x"), (2, "y"),
        (3, "x"), (3, "z"),
        (4, "y"),
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {
        (r["a"], r["b"]): r
        for r in association_rules(df, "basket", "item", min_pair_count=2).collect()
    }
    # pairs in >=2 baskets: (x,y) in {1,2}; (x,z) in {1,3}
    assert set(got) == {("x", "y"), ("x", "z")}
    xy = got[("x", "y")]
    assert (xy["n_ab"], xy["n_a"], xy["n_b"]) == (2, 3, 3)
    assert xy["support"] == 0.5                  # 2/4 baskets
    assert xy["conf_a_b"] == xy["conf_b_a"] == round(2 / 3, 6)
    assert xy["lift"] == round(2 * 4 / 9, 6)


def test_association_rules_basket_cap(spark):
    from tube_spark.operators.mining import association_rules

    rows = [(1, f"i{j}") for j in range(20)] + [(2, "a"), (2, "b"), (3, "a"), (3, "b")]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = association_rules(df, "basket", "item", min_pair_count=2, max_basket=5)
    # the 20-item mega-basket is dropped BEFORE the pair join
    assert {(r["a"], r["b"]) for r in got.collect()} == {("a", "b")}
    # and N counts only surviving baskets
    assert got.first()["support"] == 1.0
