"""Collector (injection) dataflow on the clinic fixture graph."""

from __future__ import annotations

from tube_spark.config.mapping import parse_mapping
from tube_spark.plans.translator import Collector


def test_collector_union_and_injection(clinic_source):
    mapping = parse_mapping(
        {
            "name": "clinic_file",
            "doc_type": "file",
            "type": "collector",
            "category": "data_file",
            "props": [
                {"name": "submitter_id"},
                {"name": "sample_type"},
                {"name": "source_node"},
            ],
            "injecting_props": {
                "participant": {
                    "props": [
                        {"name": "participant_id", "src": "id"},
                        {"name": "project_id"},
                    ]
                }
            },
        }
    )
    rows = {r["_doc_id"]: r.asDict() for r in Collector(clinic_source, mapping).translate().collect()}
    # one doc per sample node (category data_file), tagged with origin
    assert set(rows) == {"samp1", "samp2", "samp3"}
    assert all(r["source_node"] == "sample" for r in rows.values())
    # leaf props present
    assert rows["samp1"]["sample_type"] == "Blood"
    # injected ancestor props
    assert rows["samp1"]["participant_id"] == "partA"
    assert rows["samp3"]["participant_id"] == "partB"
    assert rows["samp1"]["project_id"] == "DEV-P1"


def test_collector_declared_fn_injection(clinic_source):
    """fn: set on an injected prop surfaces as an array even when the
    injection path is unique (reference A7 semantics)."""
    mapping = parse_mapping(
        {
            "name": "files", "doc_type": "file", "type": "collector",
            "category": "data_file",
            "props": [{"name": "submitter_id"}],
            "injecting_props": {
                "participant": {
                    "props": [{"name": "participant_ids", "src": "id", "fn": "set"}]
                }
            },
        }
    )
    rows = {r["_doc_id"]: r.asDict() for r in Collector(clinic_source, mapping).translate().collect()}
    assert rows["samp1"]["participant_ids"] == ["partA"]
    assert rows["samp3"]["participant_ids"] == ["partB"]


def test_collector_multi_hop_injection(clinic_source):
    """Inject a grandparent+ prop (center country) into sample docs."""
    mapping = parse_mapping(
        {
            "name": "files",
            "doc_type": "file",
            "type": "collector",
            "category": "data_file",
            "props": [{"name": "submitter_id"}],
            "injecting_props": {
                "center": {"props": [{"name": "center_country", "src": "country"}]}
            },
        }
    )
    rows = {r["_doc_id"]: r.asDict() for r in Collector(clinic_source, mapping).translate().collect()}
    assert all(r["center_country"] == "US" for r in rows.values())
