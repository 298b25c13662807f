"""Schema-evolution gate and row-level quarantine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tube_spark.operators.quarantine import (
    in_range,
    matches,
    non_null,
    rule,
    split_quarantine,
)
from tube_spark.sinks.evolution import check_evolution, diff_schemas


def _schema(*fields):
    return T.StructType([T.StructField(n, t, nullable) for n, t, nullable in fields])


def test_diff_classification():
    old = _schema(
        ("id", T.IntegerType(), False),
        ("name", T.StringType(), True),
        ("score", T.FloatType(), True),
        ("legacy", T.StringType(), True),
    )
    new = _schema(
        ("id", T.LongType(), False),        # widening: compatible
        ("name", T.IntegerType(), True),    # retype: breaking
        ("score", T.FloatType(), False),    # nullability tighten: reported ok
        ("extra", T.StringType(), True),    # added: compatible
    )                                        # legacy dropped: breaking
    changes = {(c.kind, c.field): c for c in diff_schemas(old, new)}
    assert changes[("retyped", "id")].compatible
    assert not changes[("retyped", "name")].compatible
    assert changes[("nullability", "score")].compatible
    assert changes[("added", "extra")].compatible
    assert not changes[("dropped", "legacy")].compatible


def test_gate_raises_and_allows():
    old = _schema(("a", T.StringType(), True))
    new = _schema(("b", T.StringType(), True))
    with pytest.raises(ValueError, match="dropped a"):
        check_evolution(old, new)
    changes = check_evolution(old, new, allow_breaking=True)
    assert {c.kind for c in changes} == {"added", "dropped"}
    # pure-compatible evolution passes silently
    wider = _schema(("a", T.StringType(), True), ("n", T.LongType(), True))
    assert all(c.compatible for c in check_evolution(old, wider))


def test_quarantine_split(spark):
    rows = [
        (1, "ok@x.io", 10.0),
        (2, None, 20.0),          # null email
        (3, "bad-addr", 999.0),   # bad email AND out of range
        (4, "fine@y.io", None),   # null val passes in_range by design
    ]
    df = spark.createDataFrame(rows, "id long, email string, val double")
    clean, rejected = split_quarantine(
        df,
        [non_null("email"), matches("email", "^[^@]+@[^@]+$"), in_range("val", 0, 100)],
    )
    assert {r["id"] for r in clean.collect()} == {1, 4}
    rej = {r["id"]: set(r["violations"]) for r in rejected.collect()}
    assert rej[2] == {"email_not_null"}
    assert rej[3] == {"email_matches", "val_in_range"}


def test_quarantine_custom_rule_and_validation(spark):
    df = spark.createDataFrame([(1, 5)], "id long, v long")
    clean, rejected = split_quarantine(df, [rule("v_odd", F.col("v") % 2 == 1)])
    assert clean.count() == 1 and rejected.count() == 0
    with pytest.raises(ValueError, match="at least one rule"):
        split_quarantine(df, [])
    with pytest.raises(ValueError, match="duplicate rule names"):
        split_quarantine(df, [non_null("id"), non_null("id")])
