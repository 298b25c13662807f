"""Deeper mapping-language semantics: nested filters, fan-out parents,
first/list fns, post-process plugins."""

from __future__ import annotations

from pyspark.sql import functions as F

from tube_spark.config.mapping import parse_mapping
from tube_spark.plans.translator import Aggregator


def test_nested_filter(clinic_source):
    mapping = parse_mapping(
        {
            "name": "m", "doc_type": "participant", "type": "aggregator", "root": "participant",
            "props": [{"name": "submitter_id"}],
            "nested_props": [
                {
                    "name": "old_visits",
                    "path": "visits",
                    "props": [{"name": "age_at_visit"}, {"name": "bmi"}],
                    "filter": {"op": ">", "prop": "age_at_visit", "value": 30},
                }
            ],
        }
    )
    rows = {r["submitter_id"]: r.asDict() for r in Aggregator(clinic_source, mapping).translate().collect()}
    # participant A has visits at ages 30, 31 → only 31 survives the filter
    assert [v["age_at_visit"] for v in rows["A"]["old_visits"]] == [31]
    assert [v["age_at_visit"] for v in rows["B"]["old_visits"]] == [50]


def test_first_and_list_fns(clinic_source):
    mapping = parse_mapping(
        {
            "name": "m", "doc_type": "participant", "type": "aggregator", "root": "participant",
            "props": [{"name": "submitter_id"}],
            "aggregated_props": [
                {"name": "first_type", "src": "sample_type", "path": "samples", "fn": "first"},
                {"name": "all_q", "src": "quantity", "path": "samples", "fn": "list"},
            ],
        }
    )
    rows = {r["submitter_id"]: r.asDict() for r in Aggregator(clinic_source, mapping).translate().collect()}
    # deterministic first = min over natural order (documented divergence)
    assert rows["A"]["first_type"] == "Blood"
    assert sorted(rows["A"]["all_q"]) == [1.5, 2.0]


def test_parent_fanout_set_agg(spark):
    """A child with TWO parents on one link level → parent props collect
    as sorted distinct sets (reference 1-n chain semantics)."""
    from tube_spark.dictionary import Dictionary, Link, NodeDef, PropType
    from tube_spark.sources.graph import DataFrameGraphSource

    d = Dictionary(
        [
            NodeDef("study", {"code": PropType("string")}),
            NodeDef("subject", {"name": PropType("string")}),
        ],
        [Link("subject", "study", "subject_memberof_study", multiplicity="many_to_many")],
    )
    nodes = {
        "study": spark.createDataFrame(
            [("st1", "S-A"), ("st2", "S-B")], "_study_id string, code string"
        ),
        "subject": spark.createDataFrame([("su1", "bob")], "_subject_id string, name string"),
    }
    edges = {
        ("subject", "study"): spark.createDataFrame(
            [("su1", "st1"), ("su1", "st2")], "_subject_id string, _study_id string"
        )
    }
    src = DataFrameGraphSource(d, nodes, edges)
    mapping = parse_mapping(
        {
            "name": "m", "doc_type": "subject", "type": "aggregator", "root": "subject",
            "props": [{"name": "name"}],
            "parent_props": [{"path": "studies[study_codes:code]"}],
        }
    )
    row = Aggregator(src, mapping).translate().collect()[0]
    assert row["study_codes"] == ["S-A", "S-B"]  # sorted distinct set


def test_postprocess_plugins(spark):
    from tube_spark.plans.postprocess import add_auth_resource_path, add_project_id

    df = spark.createDataFrame(
        [("DEV", "P1"), ("OPEN", "my-proj")], "program_name string, project_code string"
    )
    out = add_auth_resource_path(add_project_id(df)).collect()
    by_pid = {r["project_id"]: r["auth_resource_path"] for r in out}
    assert by_pid["DEV-P1"] == "/programs/DEV/projects/P1"
    # project codes containing hyphens split on the FIRST hyphen only
    assert by_pid["OPEN-my-proj"] == "/programs/OPEN/projects/my-proj"

    # override map wins over derivation
    out2 = add_auth_resource_path(
        add_project_id(df), overrides={"DEV-P1": "/open/projects/custom"}
    ).collect()
    m = {r["project_id"]: r["auth_resource_path"] for r in out2}
    assert m["DEV-P1"] == "/open/projects/custom"
    assert m["OPEN-my-proj"] == "/programs/OPEN/projects/my-proj"

    # array-valued project_id maps element-wise
    adf = spark.createDataFrame([(["A-x", "B-y"],)], "project_id array<string>")
    arr = add_auth_resource_path(adf).collect()[0]["auth_resource_path"]
    assert arr == ["/programs/A/projects/x", "/programs/B/projects/y"]


def test_missing_column_null_pads_declared_type(spark):
    """A prop whose physical column is absent must null-pad with the
    DICTIONARY-declared type — a string pad on one leaf would make the
    collector union silently widen the whole field to string."""
    from tube_spark.dictionary import Dictionary, NodeDef, PropType
    from tube_spark.sources.graph import DataFrameGraphSource

    d = Dictionary(
        [NodeDef("sample", {"quantity": PropType("number"), "ok": PropType("boolean")})],
        [],
    )
    # physical frame carries neither declared prop
    nodes = {"sample": spark.createDataFrame([("s1",)], "_sample_id string")}
    src = DataFrameGraphSource(d, nodes, {})
    df = src.node_df(
        "sample",
        props=parse_mapping(
            {
                "name": "m", "doc_type": "sample", "type": "aggregator",
                "root": "sample",
                "props": [{"name": "quantity"}, {"name": "ok"}],
            }
        ).props,
    )
    types = dict(df.dtypes)
    assert types["quantity"] == "double"
    assert types["ok"] == "boolean"
