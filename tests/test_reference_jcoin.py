"""Interop: jcoin fixture with psqlgraph HASH-TRUNCATED edge-table names
(e.g. ``edge_f4044444_debadepa``), resolved by id-sampling discovery —
flatten values differentially checked against DuckDB over the raw CSVs.
"""

from __future__ import annotations

import json
import os

import pytest

REF = "/root/reference/tests/dataframe_tests/test_data/jcoin"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixture checkout not available"
)


def test_jcoin_flatten_with_discovered_edges(spark):
    import duckdb
    import yaml

    from tube_spark.config.mapping import parse_mappings_yaml
    from tube_spark.dictionary import dictionary_from_json_schemas
    from tube_spark.plans.translator import Aggregator
    from tube_spark.sources.graph import PropsJsonGraphSource, discover_edge_tables

    with open(f"{REF}/schema.json") as f:
        dictionary = dictionary_from_json_schemas(json.load(f))
    overrides = discover_edge_tables(spark, f"{REF}/graphs", dictionary, fmt="csv")
    assert ("demographic_baseline", "participant") in overrides

    source = PropsJsonGraphSource(
        spark, f"{REF}/graphs", dictionary, fmt="csv", edge_overrides=overrides
    )
    mappings = parse_mappings_yaml(open(f"{REF}/etlMapping.yaml").read())
    m = next(x for x in mappings if x.root == "participant")
    df = Aggregator(source, m).translate()
    rows = {r["_participant_id"]: r.asDict() for r in df.collect()}

    con = duckdb.connect()
    ncols = "{'c':'VARCHAR','a':'VARCHAR','s':'VARCHAR','props':'VARCHAR','node_id':'VARCHAR'}"
    ecols = "{'c':'VARCHAR','a':'VARCHAR','s':'VARCHAR','p':'VARCHAR','src_id':'VARCHAR','dst_id':'VARCHAR'}"
    demo_table = overrides[("demographic_baseline", "participant")]
    genders = dict(
        con.execute(
            f"""SELECT e.dst_id, max(n.props->>'gender')
                FROM read_csv('{REF}/graphs/{demo_table}/part-m-*', columns={ecols}, header=false) e
                JOIN read_csv('{REF}/graphs/node_demographicbaseline/part-m-*', columns={ncols}, header=false) n
                  ON n.node_id = e.src_id
                GROUP BY 1"""
        ).fetchall()
    )
    assert genders, "fixture should link at least one demographic row"
    checked = 0
    for pid, g in genders.items():
        if pid in rows:
            assert rows[pid]["gender"] == g, pid
            checked += 1
    assert checked == len(genders)
    # participants without demographics have null flatten values
    some_null = [r for r in rows.values() if r["gender"] is None]
    assert len(some_null) == len(rows) - checked
