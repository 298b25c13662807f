"""Interop: the reference's MIDRC fixture — a realistic multi-modality
imaging dictionary with multi-hop aggregations, multi-hop nested paths,
and psqlgraph-stripped physical table names.  Differentially checked
against DuckDB over the raw CSVs; skipped without the reference checkout.
"""

from __future__ import annotations

import json
import os

import pytest

REF = "/root/reference/tests/dataframe_tests/test_data/midrc"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixture checkout not available"
)


def _csv_view(con, name: str, table_dir: str, cols: dict):
    collist = ", ".join(f"'{k}':'{v}'" for k, v in cols.items())
    con.execute(
        f"CREATE VIEW {name} AS SELECT * FROM read_csv('{REF}/graphs/{table_dir}/part-m-*',"
        f" columns={{{collist}}}, header=false)"
    )


def test_midrc_case_mapping(spark):
    import duckdb
    import yaml

    from tube_spark.config.mapping import parse_mapping
    from tube_spark.dictionary import dictionary_from_json_schemas
    from tube_spark.plans.translator import Aggregator
    from tube_spark.sources.graph import PropsJsonGraphSource

    with open(f"{REF}/schema.json") as f:
        dictionary = dictionary_from_json_schemas(json.load(f))
    source = PropsJsonGraphSource(spark, f"{REF}/graphs", dictionary, fmt="csv")

    with open(f"{REF}/etlMapping.yaml") as f:
        mapping = parse_mapping(yaml.safe_load(f)["mappings"][0])  # midrc_case
    rows = {
        r["_case_id"]: r.asDict()
        for r in Aggregator(source, mapping).translate().collect()
    }

    con = duckdb.connect()
    node_cols = {"created": "VARCHAR", "acl": "VARCHAR", "sysan": "VARCHAR",
                 "props": "VARCHAR", "node_id": "VARCHAR"}
    edge_cols = {"created": "VARCHAR", "acl": "VARCHAR", "sysan": "VARCHAR",
                 "props": "VARCHAR", "src_id": "VARCHAR", "dst_id": "VARCHAR"}
    _csv_view(con, "cases", "node_case", node_cols)
    _csv_view(con, "is_edges", "edge_imagingstudyrelatedtocase", edge_cols)
    _csv_view(con, "ct_edges", "edge_ctseriesfilerelatedtoimagingstudy", edge_cols)

    (n_cases,) = con.execute("SELECT count(*) FROM cases").fetchone()
    assert len(rows) == n_cases > 0

    # 1-hop count: imaging studies per case
    is_counts = dict(
        con.execute("SELECT dst_id, count(*) FROM is_edges GROUP BY 1").fetchall()
    )
    # 2-hop roll-up: ct series files per case via imaging studies
    ct_counts = dict(
        con.execute(
            """SELECT i.dst_id, count(*) FROM ct_edges c
               JOIN is_edges i ON c.dst_id = i.src_id GROUP BY 1"""
        ).fetchall()
    )
    for cid, row in rows.items():
        assert row["_imaging_studies_count"] == is_counts.get(cid, 0), cid
        assert row["_ct_series_file_count"] == ct_counts.get(cid, 0), cid

    # props parsed from the JSON blob
    sexes = dict(con.execute("SELECT node_id, props->>'sex' FROM cases").fetchall())
    for cid, row in rows.items():
        assert row["sex"] == sexes[cid]

    # multi-hop nested path (imaging_studies.annotations) compiled and
    # produced the declared column even though annotation tables are empty
    some = next(iter(rows.values()))
    assert "imaging_study_annotations" in some
    # 1-hop nested over a populated path carries real sub-documents
    total_nested_is = sum(len(r["imaging_studies"] or []) for r in rows.values())
    (n_is_edges,) = con.execute("SELECT count(*) FROM is_edges").fetchone()
    assert total_nested_is == n_is_edges
