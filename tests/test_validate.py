from __future__ import annotations

from tests.conftest import clinic_dictionary
from tube_spark.config.mapping import parse_mapping
from tube_spark.config.validate import validate_mapping


def _v(raw):
    return validate_mapping(parse_mapping(raw), clinic_dictionary())


def test_valid_mapping_passes():
    assert _v(
        {
            "name": "m", "doc_type": "participant", "type": "aggregator", "root": "participant",
            "props": [{"name": "submitter_id"}],
            "parent_props": [{"path": "centers[country]"}],
            "flatten_props": [
                {"path": "visits", "props": [{"name": "bmi"}], "sorted_by": "age_at_visit, desc"}
            ],
            "aggregated_props": [{"name": "n", "path": "samples", "fn": "count"}],
            "nested_props": [
                {"name": "v", "path": "visits", "props": [{"name": "bmi"}],
                 "filter": {"op": ">", "prop": "bmi", "value": 20}}
            ],
            "filter": {"op": "=", "prop": "submitter_id", "value": "A"},
        }
    ) == []


def test_catches_unknown_root_and_steps():
    assert "root node 'nope' not in dictionary" in _v(
        {"name": "m", "doc_type": "x", "type": "aggregator", "root": "nope"}
    )[0]
    probs = _v(
        {
            "name": "m", "doc_type": "participant", "type": "aggregator", "root": "participant",
            "aggregated_props": [{"name": "n", "path": "widgets", "fn": "count"}],
        }
    )
    assert any("widgets" in p for p in probs)


def test_catches_unknown_prop_and_fanout_flatten():
    probs = _v(
        {
            "name": "m", "doc_type": "participant", "type": "aggregator", "root": "participant",
            "props": [{"name": "no_such_prop"}],
            "flatten_props": [{"path": "visits", "props": [{"name": "bmi"}]}],
        }
    )
    assert any("no_such_prop" in p for p in probs)
    assert any("sorted_by" in p for p in probs)


def test_catches_child_in_parent_path_and_bad_filter():
    probs = _v(
        {
            "name": "m", "doc_type": "participant", "type": "aggregator", "root": "participant",
            "props": [{"name": "submitter_id"}],
            "parent_props": [{"path": "samples[quantity]"}],
            "filter": {"op": "=", "prop": "ghost_col", "value": 1},
        }
    )
    assert any("CHILD" in p for p in probs)
    assert any("ghost_col" in p for p in probs)


def test_collector_validation():
    probs = _v(
        {
            "name": "m", "doc_type": "f", "type": "collector", "category": "no_such_cat",
            "injecting_props": {"ghost": {"props": [{"name": "x"}]}},
        }
    )
    assert any("no_such_cat" in p for p in probs)
    assert any("ghost" in p for p in probs)
