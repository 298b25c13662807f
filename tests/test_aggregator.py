"""Aggregator semantics on the clinic fixture graph (FIXTURES.md §2)."""

from __future__ import annotations

import yaml
from pyspark.sql import functions as F

from tube_spark.config.mapping import parse_mapping
from tube_spark.plans.translator import Aggregator

MAPPING_YAML = """
name: clinic_participant
doc_type: participant
type: aggregator
root: participant
props:
  - name: submitter_id
  - name: project_id
  - name: consortium
    src: consortium_id
  - name: proband
    src: relationship_to_proband
    value_mappings:
      - Unknown: Not Reported
parent_props:
  - path: centers[country,center_name:name].projects[data_type]
flatten_props:
  - path: visits
    props:
      - name: bmi
      - name: height
    sorted_by: age_at_visit, desc
aggregated_props:
  - name: _samples_count
    path: samples
    fn: count
  - name: sample_types
    src: sample_type
    path: samples
    fn: set
  - name: total_quantity
    src: quantity
    path: samples
    fn: sum
  - name: min_bmi
    src: bmi
    path: visits
    fn: min
  - name: max_bmi
    src: bmi
    path: visits
    fn: max
nested_props:
  - name: participant_visits
    path: visits
    props:
      - name: age_at_visit
      - name: bmi
"""


def _rows(df):
    return {r["submitter_id"]: r.asDict() for r in df.collect()}


def test_full_aggregator(clinic_source):
    mapping = parse_mapping(yaml.safe_load(MAPPING_YAML))
    df = Aggregator(clinic_source, mapping).translate()
    rows = _rows(df)
    assert set(rows) == {"A", "B"}
    a, b = rows["A"], rows["B"]

    # props + rename + value_mappings
    assert a["consortium"] == 7
    assert a["proband"] == "Not Reported"  # Unknown -> Not Reported
    assert b["proband"] == "Self"  # unmapped passes through

    # parent_props: chain is unique → scalars; array prop stays array
    assert a["country"] == "US"
    assert a["center_name"] == "Center A"
    assert sorted(a["data_type"]) == ["WGS", "WXS"]

    # flatten_props sorted_by age desc → visit vis2 for A (age 31)
    assert a["bmi"] == 23.5 and a["height"] == 171.0
    assert b["bmi"] == 28.0

    # aggregated_props
    assert a["_samples_count"] == 2 and b["_samples_count"] == 1
    assert a["sample_types"] == ["Blood", "Saliva"] and b["sample_types"] == ["Blood"]
    assert a["total_quantity"] == 3.5 and b["total_quantity"] == 0.5
    assert a["min_bmi"] == 22.0 and a["max_bmi"] == 23.5  # real max, not reference's bug

    # nested
    assert [v["age_at_visit"] for v in a["participant_visits"]] == [30, 31]

    # id columns
    assert a["_participant_id"] == "partA" and a["node_id"] == "partA"


def test_count_zero_fill(clinic_source):
    mapping = parse_mapping(
        {
            "name": "counts",
            "doc_type": "participant",
            "type": "aggregator",
            "root": "program",
            "props": [{"name": "name"}],
            "aggregated_props": [
                {"name": "n_projects", "path": "projects", "fn": "count"}
            ],
        }
    )
    df = Aggregator(clinic_source, mapping).translate()
    assert df.collect()[0]["n_projects"] == 1


def test_two_hop_aggregation(clinic_source):
    mapping = parse_mapping(
        {
            "name": "rollup",
            "doc_type": "center",
            "type": "aggregator",
            "root": "center",
            "props": [{"name": "country"}],
            "aggregated_props": [
                {"name": "n_samples", "path": "participants.samples", "fn": "count"},
                {
                    "name": "all_sample_types",
                    "src": "sample_type",
                    "path": "participants.samples",
                    "fn": "set",
                },
                {
                    "name": "total_q",
                    "src": "quantity",
                    "path": "participants.samples",
                    "fn": "sum",
                },
            ],
        }
    )
    rows = Aggregator(clinic_source, mapping).translate().collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_samples"] == 3
    assert r["all_sample_types"] == ["Blood", "Saliva"]
    assert r["total_q"] == 4.0


def test_two_hop_sorted_list(clinic_source):
    """sorted_list engine extension: deterministic order survives the
    two-hop partial/merge roll-up (flatten then sort at the top)."""
    mapping = parse_mapping(
        {
            "name": "rollup",
            "doc_type": "center",
            "type": "aggregator",
            "root": "center",
            "props": [{"name": "country"}],
            "aggregated_props": [
                {
                    "name": "sample_types",
                    "src": "sample_type",
                    "path": "participants.samples",
                    "fn": "sorted_list",
                },
            ],
        }
    )
    rows = Aggregator(clinic_source, mapping).translate().collect()
    assert len(rows) == 1
    # duplicates preserved (unlike set), order deterministic (unlike list)
    assert rows[0]["sample_types"] == ["Blood", "Blood", "Saliva"]


def test_filter_dsl(clinic_source):
    mapping = parse_mapping(
        {
            "name": "filtered",
            "doc_type": "participant",
            "type": "aggregator",
            "root": "participant",
            "props": [{"name": "submitter_id"}, {"name": "consent_codes"}],
            "filter": {
                "op": "and",
                "logics": [
                    {"op": "contains", "prop": "consent_codes", "value": "c2"},
                    {"op": "!=", "prop": "submitter_id", "value": "Z"},
                ],
            },
        }
    )
    rows = Aggregator(clinic_source, mapping).translate().collect()
    assert [r["submitter_id"] for r in rows] == ["B"]


def test_props_json_source(spark, props_json_dir):
    from tests.conftest import clinic_dictionary
    from tube_spark.sources.graph import PropsJsonGraphSource

    source = PropsJsonGraphSource(spark, props_json_dir, clinic_dictionary())
    mapping = parse_mapping(
        {
            "name": "m",
            "doc_type": "participant",
            "type": "aggregator",
            "root": "participant",
            "props": [{"name": "submitter_id"}, {"name": "consented_for_data_sharing"}],
            "aggregated_props": [
                {"name": "_samples_count", "path": "samples", "fn": "count"}
            ],
        }
    )
    rows = {r["submitter_id"]: r.asDict() for r in Aggregator(source, mapping).translate().collect()}
    assert rows["A"]["_samples_count"] == 2
    assert rows["A"]["consented_for_data_sharing"] is True


def test_missing_table_empty_frame(spark, props_json_dir, tmp_path):
    """A node table absent from storage yields a typed empty frame, and
    downstream aggregation still compiles (reference zero-frame S5)."""
    import shutil

    from tests.conftest import clinic_dictionary
    from tube_spark.sources.graph import PropsJsonGraphSource

    partial = tmp_path / "partial"
    shutil.copytree(props_json_dir, partial)
    shutil.rmtree(partial / "node_sample")

    source = PropsJsonGraphSource(spark, str(partial), clinic_dictionary())
    mapping = parse_mapping(
        {
            "name": "m",
            "doc_type": "participant",
            "type": "aggregator",
            "root": "participant",
            "props": [{"name": "submitter_id"}],
            "aggregated_props": [
                {"name": "types", "src": "sample_type", "path": "samples", "fn": "set"},
                {"name": "_samples_count", "path": "samples", "fn": "count"},
            ],
        }
    )
    rows = {r["submitter_id"]: r.asDict() for r in Aggregator(source, mapping).translate().collect()}
    # edges still exist but sample props are gone: count from edge = 2
    assert rows["A"]["_samples_count"] == 2
    assert rows["A"]["types"] == []


def test_joining_prop_inherits_source_index_type(spark):
    """Cross-index second pass (reference base/parser.py:83-97): a
    joining_props prop's type comes from the SOURCE index's declared
    prop type — here orders' double o_totalprice — and must survive
    _join_index re-aggregation as array<double> (fn=set) / double
    (fn=max), feeding the ES mapping as float, never widening to
    string."""
    from tube_spark.plans.translator import Pipeline
    from tube_spark.sinks.es_mapping import es_mapping
    from tube_spark.sources.relational import star_schema_source

    src = star_schema_source(spark, "/root/testdata/sf0.001")
    host = parse_mapping(
        {
            "name": "cust_idx", "doc_type": "customer", "type": "aggregator",
            "root": "customer",
            "props": [{"name": "c_name"}, {"name": "join_key", "src": "id"}],
            "joining_props": [
                {
                    "index": "ord_idx",
                    "join_on": "join_key",
                    "props": [
                        {"name": "all_prices", "src": "o_totalprice", "fn": "set"},
                        {"name": "max_price", "src": "o_totalprice", "fn": "max"},
                        {"name": "n_orders", "src": "o_orderkey", "fn": "count"},
                    ],
                }
            ],
        }
    )
    other = parse_mapping(
        {
            "name": "ord_idx", "doc_type": "orders", "type": "aggregator",
            "root": "orders",
            "props": [
                {"name": "join_key", "src": "o_custkey"},
                {"name": "o_totalprice"},
                {"name": "o_orderkey"},
            ],
        }
    )
    out = Pipeline(src, [host, other]).run()["cust_idx"]
    types = dict(out.dtypes)
    assert types["all_prices"] == "array<double>"
    assert types["max_price"] == "double"
    assert types["n_orders"] == "bigint"
    props = es_mapping(out, "customer")["mappings"]["properties"]
    assert props["max_price"] == {"type": "float"}
    assert props["all_prices"] == {"type": "float"}
    assert props["n_orders"] == {"type": "long"}
    # values sane: max over a customer's orders is positive where present
    row = out.filter(F.col("max_price").isNotNull()).first()
    assert row is None or row["max_price"] > 0
