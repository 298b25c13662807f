"""OpenSearch sink: connector write + versioned alias swap + freshness gate.

Re-expresses the reference's live Elasticsearch/OpenSearch output path
(`tube/etl/outputs/es/writer.py:55-77`, `versioning.py:94-162`,
`timestamp.py:20-98`) against an injected client:

* **Connector write** — the reference wrote through
  ``org.elasticsearch.spark.sql`` with ``coalesce(1)`` (a single writer
  task, ``writer.py:59``).  We emit the same option surface for the
  OpenSearch connector (``org.opensearch.spark.sql``) but keep the
  write PARALLEL: one connector task per partition, each bulk-indexing
  its split — the difference between one node and the whole cluster
  feeding OpenSearch at 100 TB.  ``os_write_parallelism`` optionally
  repartitions to bound concurrent bulk connections.
* **Versioned publish** — every publish targets a fresh
  ``<alias>_<N>`` index; the alias then atomically repoints
  (``put_alias`` new → ``delete_alias`` old), so readers of ``alias``
  never see a half-written index (reference
  ``versioning.py:get_next_index_version/putting_new_version_tag``).
* **Timestamp alias** — the published index is tagged with a
  ``time_<UTC>`` alias recording the transaction high-watermark
  (reference ``timestamp.py:82-98``); the freshness gate reads it back.
* **Freshness gate** — ``check_to_run_etl`` skips the ETL when every
  target alias exists and carries a timestamp at-or-after the latest
  *SUCCEEDED* ``transaction_logs`` row (reference
  ``timestamp.py:20-43,71-79``).  The reference read postgres; we take
  a ``transaction_logs``-shaped DataFrame — same contract, any source.

The client is duck-typed to the ``opensearchpy.OpenSearch`` surface
actually used (``indices.exists_alias/get_alias/exists/create/
put_alias/delete_alias``, ``index``), so tests inject a mock and a
deployment passes the real client; no import of opensearchpy here.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONNECTOR_FORMAT = "org.opensearch.spark.sql"

_TIME_FMT = "%Y%m%dT%H%M%SZ"


def timestamp_alias(dt: datetime) -> str:
    """``time_<UTC>`` alias name for a transaction high-watermark
    (reference ``timestamp.py:82-83``)."""
    return f"time_{dt.strftime(_TIME_FMT)}"


def parse_timestamp_alias(name: str) -> datetime:
    return datetime.strptime(name.replace("plus", "+")[5:], _TIME_FMT)


def latest_succeeded_transaction_time(tx_df: DataFrame) -> datetime | None:
    """Latest ``created_datetime`` of a *SUCCEEDED* row in a
    ``transaction_logs``-shaped frame (id, state, created_datetime) —
    the reference's freshness high-watermark (``timestamp.py:20-43``),
    read from a DataFrame instead of a live postgres.  Returns None when
    no transaction has succeeded (the gate then always runs)."""
    row = (
        tx_df.filter(F.col("state") == "SUCCEEDED")
        .agg(F.max("created_datetime").alias("t"))
        .first()
    )
    if row is None or row["t"] is None:
        return None
    t = row["t"]
    # second precision: the reference round-trips through %Y%m%dT%H%M%SZ
    return t.replace(microsecond=0)


class OpenSearchSink:
    """Versioned OpenSearch document sink (DocumentSink-compatible:
    ``write(df)`` publishes to ``alias``).

    ``client`` is an opensearchpy-compatible client; ``write_fn``
    overrides the connector write (tests pass a recorder; a deployment
    without the connector jar can plug any bulk writer).
    """

    def __init__(
        self,
        client,
        alias: str,
        nodes: str = "localhost",
        port: int = 9200,
        ssl: bool = False,
        username: str | None = None,
        password: str | None = None,
        write_fn=None,
        os_write_parallelism: int | None = None,
    ):
        self.client = client
        self.alias = alias
        self.nodes = nodes
        self.port = port
        self.ssl = ssl
        self.username = username
        self.password = password
        self.write_fn = write_fn
        self.os_write_parallelism = os_write_parallelism

    # ------------------------------------------------------------------
    # connector surface (reference writer.py:55-77, opensearch-hadoop
    # option names instead of es.*)
    def connector_options(self, index: str) -> dict[str, str]:
        opts = {
            "opensearch.nodes": self.nodes,
            "opensearch.port": str(self.port),
            "opensearch.resource": index,
            "opensearch.nodes.wan.only": "true",
            "opensearch.nodes.discovery": "false",
            "opensearch.nodes.data.only": "false",
            "opensearch.nodes.client.only": "false",
            "opensearch.net.ssl": str(self.ssl).lower(),
            # parallel bulk writes retry on cluster pushback instead of
            # failing the stage
            "opensearch.batch.write.retry.count": "3",
        }
        if self.username is not None and self.password is not None:
            opts["opensearch.net.http.auth.user"] = self.username
            opts["opensearch.net.http.auth.pass"] = self.password
        return opts

    def _connector_write(self, df: DataFrame, index: str) -> None:
        out = df
        if self.os_write_parallelism is not None:
            out = out.repartition(self.os_write_parallelism)
        (
            out.write.format(CONNECTOR_FORMAT)
            .options(**self.connector_options(index))
            .mode("append")
            .save(index)
        )

    # ------------------------------------------------------------------
    # versioning (reference versioning.py:94-162)
    def _alias_indices(self, alias: str) -> list[str]:
        if not self.client.indices.exists_alias(name=alias):
            return []
        return sorted(self.client.indices.get_alias(name=alias).keys())

    def next_index_name(self, alias: str | None = None) -> str:
        """``<alias>_<N>``: N-1 = highest version the alias points at;
        skips names already taken by unaliased indices (reference
        ``versioning.py:get_next_index_version``)."""
        alias = alias or self.alias
        current = self._alias_indices(alias)
        if not current:
            return f"{alias}_0"
        m = re.match(r".*?([0-9]+)$", current[-1])
        version = int(m.group(1)) + 1 if m else 0
        name = f"{alias}_{version}"
        while self.client.indices.exists(index=name):
            version += 1
            name = f"{alias}_{version}"
        return name

    def _swap_alias(self, new_index: str, alias: str) -> None:
        """Atomic repoint: alias onto the new index, then off the old
        ones (reference ``putting_new_version_tag`` + ``clean_up``)."""
        old = [i for i in self._alias_indices(alias) if i != new_index]
        self.client.indices.put_alias(index=new_index, name=alias)
        for stale in old:
            self.client.indices.delete_alias(index=stale, name=alias)

    # ------------------------------------------------------------------
    def write(
        self,
        df: DataFrame,
        mapping: dict | None = None,
        transaction_time: datetime | None = None,
    ) -> str:
        """Publish ``df`` as a NEW versioned index and swap the alias.

        Order matters for zero-downtime: create index (with the ES
        mapping) → bulk write → alias swap → timestamp tag.  A failure
        before the swap leaves the previous version live."""
        index = self.next_index_name()
        self.client.indices.create(
            index=index, body={"mappings": mapping} if mapping else None
        )
        (self.write_fn or self._connector_write)(df, index)
        self._swap_alias(index, self.alias)
        if transaction_time is not None:
            self.client.indices.put_alias(
                index=index, name=timestamp_alias(transaction_time)
            )
        return index

    def write_array_config(
        self,
        etl_index_name: str,
        array_fields: list[str],
        transaction_time: datetime | None = None,
    ) -> str:
        """Guppy array-config side index (reference ``writer.py:79-118``):
        one document listing the array-typed fields, published under its
        own versioned index + two aliases."""
        index_alias = f"{etl_index_name}-array-config"
        short_alias = f"{etl_index_name.split('_')[0]}_array-config"
        ts = transaction_time or datetime.now(timezone.utc).replace(
            microsecond=0, tzinfo=None
        )
        index = self.next_index_name(index_alias)
        self.client.indices.create(
            index=index,
            body={
                "mappings": {
                    "properties": {
                        "timestamp": {"type": "date"},
                        "array": {"type": "keyword"},
                    }
                }
            },
        )
        self.client.index(
            index,
            body={"timestamp": ts.isoformat(), "array": list(array_fields)},
            id=etl_index_name,
        )
        self._swap_alias(index, index_alias)
        self._swap_alias(index, short_alias)
        self.client.indices.put_alias(index=index, name=timestamp_alias(ts))
        return index


# ----------------------------------------------------------------------
# freshness gate (reference timestamp.py:45-79)
def get_timestamp_from_index(client, versioned_index: str) -> datetime | None:
    """The ``time_*`` alias on a versioned index, parsed back to UTC."""
    res = client.indices.get_alias(index=versioned_index, name="time_*")
    aliases = list(res.get(versioned_index, {}).get("aliases", {}).keys())
    if not aliases:
        return None
    return parse_timestamp_alias(aliases[0])


def check_to_run_etl(client, index_names: list[str], tx_df: DataFrame) -> bool:
    """True when the ETL must run: some target alias is missing, or any
    published timestamp is absent/disagrees/predates the latest
    SUCCEEDED transaction (reference ``timestamp.py:45-79``).  False
    only when every alias exists and all carry the SAME timestamp
    at-or-after the transaction high-watermark — the skip path."""
    for name in index_names:
        if not client.indices.exists_alias(name=name):
            return True
    timestamp = None
    for name in index_names:
        versioned = sorted(client.indices.get_alias(name=name).keys())[0]
        t = get_timestamp_from_index(client, versioned)
        if t is None:
            return True
        if timestamp is None:
            timestamp = t
        elif t != timestamp:
            return True  # indices built at different watermarks
    latest = latest_succeeded_transaction_time(tx_df)
    if latest is None:
        return True
    return timestamp < latest
