from __future__ import annotations

from pyspark.sql import functions as F

from tube_spark.operators.unnest import unnest_documents


def test_unnest_round_trip(spark):
    """nest → unnest round-trips the child rows."""
    docs = spark.createDataFrame(
        [
            (1, "a", [{"x": 10, "y": "p"}, {"x": 20, "y": "q"}]),
            (2, "b", []),
            (3, "c", None),
        ],
        "doc_id long, name string, kids array<struct<x: long, y: string>>",
    )
    flat = unnest_documents(docs, "kids").collect()
    assert sorted((r["doc_id"], r["x"], r["y"]) for r in flat) == [
        (1, 10, "p"),
        (1, 20, "q"),
    ]
    outer = unnest_documents(docs, "kids", outer=True).collect()
    assert {r["doc_id"] for r in outer} == {1, 2, 3}
    assert {r["x"] for r in outer if r["doc_id"] in (2, 3)} == {None}

    # keep= restricts carried columns
    slim = unnest_documents(docs, "kids", keep=("doc_id",))
    assert slim.columns == ["doc_id", "x", "y"]

    import pytest

    with pytest.raises(ValueError):
        unnest_documents(docs, "name")
