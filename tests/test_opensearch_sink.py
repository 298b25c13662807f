"""OpenSearchSink versioning/alias/freshness against a mock client.

The mock implements exactly the opensearchpy surface the sink uses, so
these tests pin the REST-call orchestration of the reference
(`tube/etl/outputs/es/writer.py:55-77`, `versioning.py:94-162`,
`timestamp.py:20-98`) without a live cluster.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from tube_spark.sinks.opensearch import (
    OpenSearchSink,
    check_to_run_etl,
    latest_succeeded_transaction_time,
    timestamp_alias,
)


class _Indices:
    def __init__(self):
        self.indices: dict[str, dict] = {}  # name -> {"aliases": {alias: {}}}

    def exists(self, index):
        return index in self.indices

    def exists_alias(self, name):
        return any(name in meta["aliases"] for meta in self.indices.values())

    def get_alias(self, index=None, name=None):
        import fnmatch

        out = {}
        for idx, meta in self.indices.items():
            if index is not None and idx != index:
                continue
            aliases = meta["aliases"]
            if name is not None:
                aliases = {a: v for a, v in aliases.items() if fnmatch.fnmatch(a, name)}
                if not aliases and index is None:
                    continue
            out[idx] = {"aliases": aliases}
        return out

    def create(self, index, body=None):
        assert index not in self.indices, f"index {index} already exists"
        self.indices[index] = {"aliases": {}, "mapping": body}

    def put_alias(self, index, name):
        self.indices[index]["aliases"][name] = {}

    def delete_alias(self, index, name):
        self.indices[index]["aliases"].pop(name, None)


class MockClient:
    def __init__(self):
        self.indices = _Indices()
        self.docs: list[tuple[str, dict, str]] = []

    def index(self, index, body, id):
        self.docs.append((index, body, id))


@pytest.fixture()
def client():
    return MockClient()


def _sink(client, recorder, alias="etl"):
    return OpenSearchSink(
        client,
        alias,
        nodes="os-node1,os-node2",
        port=9200,
        ssl=True,
        username="u",
        password="p",
        write_fn=lambda df, index: recorder.append((df, index)),
    )


def test_versioned_publish_and_alias_swap(spark, client):
    writes = []
    sink = _sink(client, writes)
    df = spark.createDataFrame([(1, "a")], "id long, v string")

    i0 = sink.write(df, mapping={"properties": {"v": {"type": "keyword"}}})
    assert i0 == "etl_0"
    assert writes == [(df, "etl_0")]
    assert client.indices.get_alias(name="etl") == {"etl_0": {"aliases": {"etl": {}}}}
    # mapping was created BEFORE the bulk write
    assert client.indices.indices["etl_0"]["mapping"] == {
        "mappings": {"properties": {"v": {"type": "keyword"}}}
    }

    i1 = sink.write(df)
    assert i1 == "etl_1"
    # alias moved atomically: on the new index, gone from the old one
    assert list(client.indices.get_alias(name="etl")) == ["etl_1"]
    assert "etl" not in client.indices.indices["etl_0"]["aliases"]


def test_next_index_skips_taken_names(client):
    sink = OpenSearchSink(client, "etl", write_fn=lambda df, i: None)
    client.indices.create("etl_0")
    client.indices.put_alias("etl_0", "etl")
    # a squatter index without the alias occupies the next name
    client.indices.create("etl_1")
    assert sink.next_index_name() == "etl_2"


def test_connector_options_surface(client):
    sink = _sink(client, [])
    opts = sink.connector_options("etl_0")
    assert opts["opensearch.nodes"] == "os-node1,os-node2"
    assert opts["opensearch.resource"] == "etl_0"
    assert opts["opensearch.nodes.wan.only"] == "true"
    assert opts["opensearch.net.ssl"] == "true"
    assert opts["opensearch.net.http.auth.user"] == "u"
    assert opts["opensearch.net.http.auth.pass"] == "p"
    # no auth options without credentials
    anon = OpenSearchSink(client, "etl").connector_options("x")
    assert "opensearch.net.http.auth.user" not in anon


def test_array_config_side_index(spark, client):
    sink = _sink(client, [])
    ts = datetime(2026, 8, 13, 10, 0, 0)
    idx = sink.write_array_config("etl_subject", ["samples", "files.ids"], ts)
    assert idx == "etl_subject-array-config_0"
    (doc_index, body, doc_id) = client.docs[0]
    assert doc_index == idx and doc_id == "etl_subject"
    assert body["array"] == ["samples", "files.ids"]
    aliases = client.indices.indices[idx]["aliases"]
    assert "etl_subject-array-config" in aliases
    assert "etl_array-config" in aliases  # short alias: prefix before '_'
    assert timestamp_alias(ts) in aliases


def _tx(spark, rows):
    return spark.createDataFrame(
        rows, "id long, state string, created_datetime timestamp"
    )


def test_latest_succeeded_transaction_time(spark):
    t1 = datetime(2026, 8, 1, 12, 0, 0)
    t2 = datetime(2026, 8, 2, 12, 0, 0)
    tx = _tx(spark, [(1, "SUCCEEDED", t1), (2, "FAILED", t2)])
    assert latest_succeeded_transaction_time(tx) == t1  # FAILED rows ignored
    assert latest_succeeded_transaction_time(tx.filter("state = 'MISSING'")) is None


def test_freshness_gate_skip_and_run(spark, client):
    writes = []
    sink = _sink(client, writes)
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    t1 = datetime(2026, 8, 1, 12, 0, 0)

    # no alias yet -> run
    tx = _tx(spark, [(1, "SUCCEEDED", t1)])
    assert check_to_run_etl(client, ["etl"], tx) is True

    sink.write(df, transaction_time=t1)
    # published at the latest SUCCEEDED time -> skip
    assert check_to_run_etl(client, ["etl"], tx) is False

    # a newer SUCCEEDED transaction -> run
    t2 = datetime(2026, 8, 2, 12, 0, 0)
    tx2 = _tx(spark, [(1, "SUCCEEDED", t1), (2, "SUCCEEDED", t2)])
    assert check_to_run_etl(client, ["etl"], tx2) is True

    # a newer FAILED transaction does NOT trigger a run
    tx3 = _tx(spark, [(1, "SUCCEEDED", t1), (2, "FAILED", t2)])
    assert check_to_run_etl(client, ["etl"], tx3) is False

    # no SUCCEEDED row at all -> always run
    assert check_to_run_etl(client, ["etl"], tx.filter("state = 'X'")) is True


def test_writer_selection(client, tmp_path):
    """run.py's sink switch: file -> VersionedIndexWriter, opensearch ->
    OpenSearchSink with the injected client, unknown -> error."""
    from tube_spark.sinks import VersionedIndexWriter, select_sink

    w = select_sink("file", "etl", out_dir=str(tmp_path))
    assert isinstance(w, VersionedIndexWriter) and w.index == "etl"

    s = select_sink("opensearch", "etl", client=client, nodes="n1", port=9201)
    assert isinstance(s, OpenSearchSink)
    assert s.client is client and s.alias == "etl" and s.port == 9201

    with pytest.raises(ValueError, match="unknown sink"):
        select_sink("kafka", "etl")
    with pytest.raises(ValueError, match="out_dir"):
        select_sink("file", "etl")
    # no injected client and no opensearchpy in this environment
    with pytest.raises(RuntimeError, match="opensearchpy"):
        select_sink("opensearch", "etl", hosts="localhost:9200")


def test_freshness_gate_multi_index_disagreement(spark, client):
    """Two target aliases built at DIFFERENT watermarks -> run (the
    reference requires all indices to agree, timestamp.py:52-68)."""
    t1 = datetime(2026, 8, 1, 12, 0, 0)
    t2 = datetime(2026, 8, 2, 12, 0, 0)
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    _sink(client, [], alias="etl_a").write(df, transaction_time=t1)
    _sink(client, [], alias="etl_b").write(df, transaction_time=t2)
    tx = _tx(spark, [(1, "SUCCEEDED", t1)])
    assert check_to_run_etl(client, ["etl_a", "etl_b"], tx) is True
    # rebuilt at the same watermark -> skip
    client2 = MockClient()
    _sink(client2, [], alias="etl_a").write(df, transaction_time=t2)
    _sink(client2, [], alias="etl_b").write(df, transaction_time=t2)
    assert check_to_run_etl(client2, ["etl_a", "etl_b"], tx) is False
