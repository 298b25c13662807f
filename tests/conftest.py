from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from tube_spark.dictionary import Dictionary, Link, NodeDef, PropType
from tube_spark.session import get_spark
from tube_spark.sources.graph import DataFrameGraphSource


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "tube_spark-tests",
        master="local[4]",
        extra_conf={"spark.sql.shuffle.partitions": "4", "spark.ui.enabled": "false"},
    )
    yield s


def clinic_dictionary() -> Dictionary:
    nodes = [
        NodeDef("program", {"name": PropType("string")}),
        NodeDef(
            "project",
            {
                "code": PropType("string"),
                "name": PropType("string"),
                "data_type": PropType("array", "string"),
            },
        ),
        NodeDef(
            "center",
            {
                "country": PropType("string"),
                "name": PropType("string"),
                "investigator_name": PropType("string"),
            },
        ),
        NodeDef(
            "participant",
            {
                "submitter_id": PropType("string"),
                "project_id": PropType("string"),
                "consortium_id": PropType("integer"),
                "consent_codes": PropType("array", "string"),
                "consented_for_data_sharing": PropType("boolean"),
                "relationship_to_proband": PropType("string"),
                "updated_datetime": PropType("string"),
            },
        ),
        NodeDef(
            "sample",
            {
                "submitter_id": PropType("string"),
                "sample_type": PropType("string"),
                "quantity": PropType("number"),
            },
            category="data_file",
        ),
        NodeDef(
            "visit",
            {
                "age_at_visit": PropType("integer"),
                "bmi": PropType("number"),
                "ever_transferred": PropType("boolean"),
                "height": PropType("number"),
                "pregnancy_status": PropType("boolean"),
            },
        ),
    ]
    links = [
        Link("project", "program", "project_memberof_program"),
        Link("center", "project", "center_contributedto_project"),
        Link("participant", "center", "participant_recruitedat_center"),
        Link("sample", "participant", "sample_derivedfrom_participant"),
        Link("visit", "participant", "visit_describes_participant"),
    ]
    return Dictionary(nodes, links)


# deterministic little graph:
#   program p1 ← project pj1 ← center c1 ← participants a, b ← samples/visits
NODES = {
    "program": [("prog1", {"name": "DEV"})],
    "project": [("proj1", {"code": "P1", "name": "Project One", "data_type": ["WGS", "WXS"]})],
    "center": [("cent1", {"country": "US", "name": "Center A", "investigator_name": "Dr X"})],
    "participant": [
        (
            "partA",
            {
                "submitter_id": "A",
                "project_id": "DEV-P1",
                "consortium_id": 7,
                "consent_codes": ["c1"],
                "consented_for_data_sharing": True,
                "relationship_to_proband": "Unknown",
                "updated_datetime": "2024-01-01",
            },
        ),
        (
            "partB",
            {
                "submitter_id": "B",
                "project_id": "DEV-P1",
                "consortium_id": 8,
                "consent_codes": ["c2", "c3"],
                "consented_for_data_sharing": False,
                "relationship_to_proband": "Self",
                "updated_datetime": "2024-02-01",
            },
        ),
    ],
    "sample": [
        ("samp1", {"submitter_id": "S1", "sample_type": "Blood", "quantity": 1.5}),
        ("samp2", {"submitter_id": "S2", "sample_type": "Saliva", "quantity": 2.0}),
        ("samp3", {"submitter_id": "S3", "sample_type": "Blood", "quantity": 0.5}),
    ],
    "visit": [
        ("vis1", {"age_at_visit": 30, "bmi": 22.0, "ever_transferred": False, "height": 170.0, "pregnancy_status": False}),
        ("vis2", {"age_at_visit": 31, "bmi": 23.5, "ever_transferred": True, "height": 171.0, "pregnancy_status": False}),
        ("vis3", {"age_at_visit": 50, "bmi": 28.0, "ever_transferred": False, "height": 180.0, "pregnancy_status": False}),
    ],
}
EDGES = {
    ("project", "program"): [("proj1", "prog1")],
    ("center", "project"): [("cent1", "proj1")],
    ("participant", "center"): [("partA", "cent1"), ("partB", "cent1")],
    ("sample", "participant"): [("samp1", "partA"), ("samp2", "partA"), ("samp3", "partB")],
    ("visit", "participant"): [("vis1", "partA"), ("vis2", "partA"), ("vis3", "partB")],
}


@pytest.fixture(scope="session")
def clinic_source(spark):
    d = clinic_dictionary()
    nodes = {}
    for label, rows in NODES.items():
        schema = T.StructType(
            [
                T.StructField(f"_{label}_id", T.StringType(), False),
                *d.props_schema(label).fields,
            ]
        )
        data = [
            (nid, *[props.get(f.name) for f in d.props_schema(label).fields])
            for nid, props in rows
        ]
        nodes[label] = spark.createDataFrame(data, schema)
    edges = {}
    for (child, parent), rows in EDGES.items():
        schema = T.StructType(
            [
                T.StructField(f"_{child}_id", T.StringType(), False),
                T.StructField(f"_{parent}_id", T.StringType(), False),
            ]
        )
        edges[(child, parent)] = spark.createDataFrame(rows, schema)
    return DataFrameGraphSource(d, nodes, edges)


@pytest.fixture(scope="session")
def props_json_dir(spark, tmp_path_factory):
    """The same clinic graph in the reference's physical format:
    node_*/edge_* parquet with a ``_props`` JSON string column."""
    base = tmp_path_factory.mktemp("graph")
    d = clinic_dictionary()
    for label, rows in NODES.items():
        data = [
            ("2024-01-01", "{}", "{}", json.dumps(props), nid) for nid, props in rows
        ]
        df = spark.createDataFrame(
            data, "created string, acl string, _sysan string, _props string, node_id string"
        )
        df.repartition(1).write.mode("overwrite").parquet(str(base / f"node_{label}"))
    for (child, parent), rows in EDGES.items():
        link = d.link_between(child, parent)
        data = [("2024-01-01", "{}", "{}", "{}", s, t) for s, t in rows]
        df = spark.createDataFrame(
            data,
            "created string, acl string, _sysan string, _props string, src_id string, dst_id string",
        )
        df.repartition(1).write.mode("overwrite").parquet(str(base / f"edge_{link.edge}"))
    return str(base)
