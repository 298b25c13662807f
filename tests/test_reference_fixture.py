"""Interop test: run the engine on the REFERENCE'S OWN test fixture —
its Gen3 data dictionary (schema.json), its etlMapping.yaml, and its
Sqoop-format CSV graph dumps — and differentially check the result
against DuckDB aggregations over the same raw CSVs.

This proves format-level parity end-to-end: dictionary parsing (.yaml
keys, $ref props, link stubs, psqlgraph edge-table naming), quoted-CSV
ingestion, and aggregator semantics on real Gen3-shaped data.  Skipped
when the reference checkout is absent (the repo stays standalone).
"""

from __future__ import annotations

import json
import os

import pytest

REF = "/root/reference/tests/dataframe_tests/test_data/parent"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixture checkout not available"
)


@pytest.fixture(scope="module")
def ref_source(spark):
    from tube_spark.dictionary import dictionary_from_json_schemas
    from tube_spark.sources.graph import PropsJsonGraphSource

    with open(f"{REF}/schema.json") as f:
        dictionary = dictionary_from_json_schemas(json.load(f))
    return PropsJsonGraphSource(spark, f"{REF}/graphs", dictionary, fmt="csv")


def _duck(sql: str):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"""CREATE VIEW participant AS SELECT * FROM read_csv('{REF}/graphs/node_participant/part-m-*',
            columns={{'created':'VARCHAR','acl':'VARCHAR','sysan':'VARCHAR','props':'VARCHAR','node_id':'VARCHAR'}}, header=false)"""
    )
    con.execute(
        f"""CREATE VIEW sample_edges AS SELECT * FROM read_csv('{REF}/graphs/edge_samplederivedfromparticipant/part-m-*',
            columns={{'created':'VARCHAR','acl':'VARCHAR','sysan':'VARCHAR','props':'VARCHAR','src_id':'VARCHAR','dst_id':'VARCHAR'}}, header=false)"""
    )
    return con.execute(sql).fetchall()


def test_reference_mapping_end_to_end(ref_source):
    import yaml

    from tube_spark.config.mapping import parse_mapping
    from tube_spark.plans.translator import Aggregator

    with open(f"{REF}/etlMapping.yaml") as f:
        mapping = parse_mapping(yaml.safe_load(f)["mappings"][0])
    df = Aggregator(ref_source, mapping).translate()
    rows = {r["_participant_id"]: r.asDict() for r in df.collect()}

    # one document per participant node
    (n_participants,) = _duck("SELECT count(*) FROM participant")[0]
    assert len(rows) == n_participants > 0

    # _samples_count = per-participant edge-row counts (DuckDB oracle)
    counts = dict(
        _duck("SELECT dst_id, count(*) FROM sample_edges GROUP BY 1")
    )
    for pid, row in rows.items():
        assert row["_samples_count"] == counts.get(pid, 0), pid

    # props parsed out of the _props JSON blob
    sub = dict(
        _duck("SELECT node_id, props->>'submitter_id' FROM participant")
    )
    for pid, row in rows.items():
        assert row["submitter_id"] == sub[pid]

    # parent chain center→project: many_to_many fan-out yields array props
    some = next(iter(rows.values()))
    assert isinstance(some["country"], list)
    # nested visits: no visit data in the fixture → null/empty arrays, but
    # the column exists with the declared nested shape
    assert "participant_visits" in some


def test_reference_collector_category(ref_source):
    """Category query over the Gen3 dictionary (biospecimen = sample)."""
    assert ref_source.dictionary.nodes["sample"].category == "biospecimen"
    from tube_spark.config.mapping import parse_mapping
    from tube_spark.plans.translator import Collector

    mapping = parse_mapping(
        {
            "name": "specimens", "doc_type": "specimen", "type": "collector",
            "category": "biospecimen",
            "props": [{"name": "submitter_id"}, {"name": "source_node"}],
            "injecting_props": {
                "participant": {"props": [{"name": "participant_id", "src": "id"}]}
            },
        }
    )
    df = Collector(ref_source, mapping).translate()
    rows = [r.asDict() for r in df.collect()]
    (n_samples,) = _duck(
        "SELECT count(*) FROM read_csv('%s/graphs/node_sample/part-m-*', "
        "columns={'c':'VARCHAR','a':'VARCHAR','s':'VARCHAR','p':'VARCHAR','node_id':'VARCHAR'}, header=false)"
        % REF
    )[0]
    by_node = {}
    for r in rows:
        by_node.setdefault(r["source_node"], []).append(r)
    assert len(by_node["sample"]) == n_samples
    # every sample doc got its participant injected via the edge table
    linked = {a for a, _ in _duck("SELECT src_id, dst_id FROM sample_edges")}
    for r in by_node["sample"]:
        if r["_doc_id"] in linked:
            assert r["participant_id"] is not None
