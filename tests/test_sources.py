"""Source-layer tests: CSV (Sqoop-format) graph dumps, prop pruning."""

from __future__ import annotations

import json

from tube_spark.config.mapping import PropSpec, parse_mapping
from tube_spark.plans.translator import Aggregator
from tube_spark.sources.graph import PropsJsonGraphSource


def test_csv_sqoop_format(spark, tmp_path):
    """The reference's physical format: headerless CSV shards with
    _props JSON — engine reads them with explicit schemas."""
    from tests.conftest import EDGES, NODES, clinic_dictionary

    d = clinic_dictionary()
    base = tmp_path / "csvgraph"
    base.mkdir()
    for label, rows in NODES.items():
        data = [("2024-01-01", "{}", "{}", json.dumps(props), nid) for nid, props in rows]
        spark.createDataFrame(
            data, "created string, acl string, _sysan string, _props string, node_id string"
        ).repartition(1).write.mode("overwrite").option("quote", '"').option(
            "escape", '"'
        ).csv(str(base / f"node_{label}"))
    for (child, parent), rows in EDGES.items():
        link = d.link_between(child, parent)
        data = [("2024-01-01", "{}", "{}", "{}", s, t) for s, t in rows]
        spark.createDataFrame(
            data,
            "created string, acl string, _sysan string, _props string, src_id string, dst_id string",
        ).repartition(1).write.mode("overwrite").csv(str(base / f"edge_{link.edge}"))

    source = PropsJsonGraphSource(spark, str(base), d, fmt="csv")
    mapping = parse_mapping(
        {
            "name": "m", "doc_type": "participant", "type": "aggregator", "root": "participant",
            "props": [{"name": "submitter_id"}, {"name": "consortium_id"}],
            "aggregated_props": [
                {"name": "n_samples", "path": "samples", "fn": "count"},
                {"name": "avg_na", "src": "quantity", "path": "samples", "fn": "sum"},
            ],
        }
    )
    rows = {r["submitter_id"]: r.asDict() for r in Aggregator(source, mapping).translate().collect()}
    assert rows["A"]["n_samples"] == 2 and rows["A"]["avg_na"] == 3.5
    assert rows["B"]["consortium_id"] == 8


def test_json_prop_pruning(spark, props_json_dir):
    """from_json parses only requested props — the parse schema must not
    widen to the full dictionary."""
    from tests.conftest import clinic_dictionary

    source = PropsJsonGraphSource(spark, props_json_dir, clinic_dictionary())
    df = source.node_df("participant", (PropSpec(name="submitter_id"),))
    assert set(df.columns) == {"_participant_id", "submitter_id"}
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the from_json schema in the optimized plan carries a single field
    assert "consent_codes" not in plan and "consortium_id" not in plan
