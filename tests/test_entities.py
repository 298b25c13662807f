"""Entity resolution: blocking, scoring, clustering, canonical election."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tube_spark.operators.entities import (
    candidate_pairs,
    resolve_entities,
    similarity,
)


@pytest.fixture(scope="module")
def records(spark):
    rows = [
        (1, "Acme Corporation", "NYC"),
        (2, "Acme Corporatio", "NYC"),   # typo of 1
        (3, "Acme Corp", "NYC"),         # too different at 0.9
        (4, "Beta Industries", "LA"),
        (5, "Beta Industrees", "LA"),    # typo of 4
        (6, "Gamma LLC", "SF"),          # singleton
        (7, "Acme Corporation", "BOS"),  # same name, other block
    ]
    return spark.createDataFrame(rows, "rid long, name string, city string")


def test_blocking_bounds_pairs(spark, records):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in candidate_pairs(records, "rid", F.col("city")).collect()
    }
    assert pairs == {(1, 2), (1, 3), (2, 3), (4, 5)}  # only within-city
    capped = candidate_pairs(records, "rid", F.col("city"), max_block=2).collect()
    assert {(r["id_a"], r["id_b"]) for r in capped} == {(4, 5)}  # NYC block dropped


def test_similarity_scores(spark, records):
    pairs = candidate_pairs(records, "rid", F.col("city"))
    scored = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in similarity(records, pairs, "rid", [("name", 1.0)]).collect()
    }
    assert scored[(1, 2)] == pytest.approx(1 - 1 / 16, abs=1e-6)  # one deletion
    assert scored[(1, 3)] < 0.7  # 'Acme Corp' vs full name
    # multi-field: exact city always matches inside a block
    multi = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in similarity(
            records, pairs, "rid", [("name", 2.0), ("city", 1.0)]
        ).collect()
    }
    assert multi[(1, 2)] == pytest.approx((2 * (1 - 1 / 16) + 1) / 3, abs=1e-6)


def test_resolve_clusters_and_canonicals(spark, records):
    out = {
        r["rid"]: r
        for r in resolve_entities(
            records, "rid", F.col("city"), [("name", 1.0)], threshold=0.9
        ).collect()
    }
    assert out[1]["entity_id"] == out[2]["entity_id"] == 1
    assert out[4]["entity_id"] == out[5]["entity_id"] == 4
    assert out[3]["entity_id"] == 3  # not merged at 0.9
    assert out[6]["entity_id"] == 6 and out[6]["cluster_size"] == 1
    assert out[7]["entity_id"] == 7  # blocked away despite identical name
    assert out[1]["is_canonical"] and not out[2]["is_canonical"]
    assert out[1]["cluster_size"] == 2


def test_validation(spark, records):
    pairs = candidate_pairs(records, "rid", F.col("city"))
    with pytest.raises(ValueError, match="at least one"):
        similarity(records, pairs, "rid", [])
    with pytest.raises(ValueError, match="positive"):
        similarity(records, pairs, "rid", [("name", 0.0)])


def test_collapse_exact_equivalence(spark):
    """rep-first resolution returns the same entities as naive when
    exact duplicates are present (they score 1.0 either way)."""
    rows = [
        (1, "Acme Corporation", "NYC"),
        (2, "Acme Corporation", "NYC"),   # exact dup of 1
        (3, "Acme Corporatio", "NYC"),    # typo
        (4, "Acme Corporation", "NYC"),   # exact dup of 1
        (5, "Beta Industries", "LA"),
        (6, "Beta Industries", "LA"),     # exact dup of 5
        (7, "Gamma LLC", "SF"),
    ]
    df = spark.createDataFrame(rows, "rid long, name string, city string")
    kw = dict(threshold=0.9)
    naive = {
        r["rid"]: (r["entity_id"], r["cluster_size"], r["is_canonical"])
        for r in resolve_entities(
            df, "rid", F.col("city"), [("name", 1.0)], **kw
        ).collect()
    }
    repf = {
        r["rid"]: (r["entity_id"], r["cluster_size"], r["is_canonical"])
        for r in resolve_entities(
            df, "rid", F.col("city"), [("name", 1.0)], collapse_exact=True, **kw
        ).collect()
    }
    assert naive == repf
    assert naive[2][0] == 1 and naive[3][0] == 1 and naive[1][1] == 4


def test_collapse_exact_null_fields_not_dropped(spark):
    """ADVICE r4 (high): collapse_exact=True must not silently drop
    records whose similarity fields or block key contain NULLs — the
    rep join is null-safe, and NULL-bearing tuples only collapse when
    the naive path would actually have merged them (block key non-NULL
    and self-score ≥ threshold; a NULL field scores 0 against
    anything, so identical NULL tuples below threshold stay
    singletons).  Asserts full row-set equality collapse vs naive."""
    rows = [
        (1, None, "NYC"),                 # NULL field
        (2, None, "NYC"),                 # identical NULL tuple — naive
        (3, "Acme Corporation", "NYC"),   #   keeps 1,2 as singletons
        (4, "Acme Corporation", None),    # NULL block key
        (5, "Acme Corporation", None),    # identical, NULL block key
        (6, None, None),                  # all NULL
        (7, "Acme Corporatio", "NYC"),    # typo of 3
        (8, "Acme Corporation", "NYC"),   # exact dup of 3
    ]
    df = spark.createDataFrame(rows, "rid long, name string, city string")
    for fields, threshold in [
        ([("name", 1.0)], 0.9),
        ([("name", 2.0), ("city", 1.0)], 0.6),  # NULL city still eligible
    ]:
        naive = {
            r["rid"]: (r["entity_id"], r["cluster_size"], r["is_canonical"])
            for r in resolve_entities(
                df, "rid", F.col("city"), fields, threshold=threshold
            ).collect()
        }
        repf = {
            r["rid"]: (r["entity_id"], r["cluster_size"], r["is_canonical"])
            for r in resolve_entities(
                df,
                "rid",
                F.col("city"),
                fields,
                threshold=threshold,
                collapse_exact=True,
            ).collect()
        }
        assert set(naive) == {1, 2, 3, 4, 5, 6, 7, 8}, "records dropped"
        assert naive == repf, f"collapse/no-collapse diverge for {fields}"
    # NULL-block and NULL-field records are singletons in both modes
    assert naive[1][0] == 1 and naive[2][0] == 2
    assert naive[4][0] == 4 and naive[5][0] == 5 and naive[6][0] == 6
    assert naive[3][0] == naive[7][0] == naive[8][0] == 3
