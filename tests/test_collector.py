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


def test_collector_plan_broadcasts_injection(spark):
    """Scale posture, pinned: the ancestor-injection side must broadcast
    (ancestors are small by construction) and the whole collector plan
    must shuffle only for the semantic doc-key dedup — no stray
    hash-exchanges from the injection joins or the union."""
    from tube_spark.sources.relational import star_schema_source

    src = star_schema_source(spark, "/root/testdata/sf0.001")
    mapping = parse_mapping(
        {
            "name": "facts", "doc_type": "fact", "type": "collector", "category": "fact",
            "props": [{"name": "source_node"}],
            "injecting_props": {"customer": {"props": [{"name": "cust_id", "src": "id"}]}},
        }
    )
    df = Collector(src, mapping).translate().select("_doc_id", "source_node", "cust_id")
    df.count()  # AQE finalizes the executed plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan, plan[:2000]
    non_broadcast = plan.count("Exchange hashpartitioning")
    assert non_broadcast <= 2, f"{non_broadcast} hash exchanges\n" + plan[:3000]
