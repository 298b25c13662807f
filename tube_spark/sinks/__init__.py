from __future__ import annotations

from tube_spark.sinks.opensearch import (
    OpenSearchSink,
    check_to_run_etl,
    latest_succeeded_transaction_time,
)
from tube_spark.sinks.writer import (
    BucketedTableSink,
    DocumentSink,
    VersionedIndexWriter,
    array_config,
    freshness_check,
)


def select_sink(
    kind: str,
    index: str,
    out_dir: str | None = None,
    client=None,
    **os_opts,
):
    """Writer selection (the reference picks file vs ES output in
    ``run_etl.py``): ``file`` → VersionedIndexWriter under ``out_dir``;
    ``opensearch`` → OpenSearchSink against ``client`` (an
    opensearchpy-compatible client; constructed from ``os_opts['hosts']``
    when omitted, which requires the opensearchpy package)."""
    if kind == "file":
        if out_dir is None:
            raise ValueError("file sink requires out_dir")
        return VersionedIndexWriter(out_dir, index)
    if kind == "opensearch":
        hosts = os_opts.pop("hosts", None)
        if client is None:
            try:
                from opensearchpy import OpenSearch
            except ImportError as e:  # pragma: no cover - env-dependent
                raise RuntimeError(
                    "opensearch sink needs either an injected client or the "
                    "opensearchpy package"
                ) from e
            client = OpenSearch(hosts)
        # The Spark connector does NOT go through `client` — derive its
        # nodes/port from the same host list, or bulk writes silently
        # target localhost:9200 while index create / alias swap hit the
        # real cluster (alias swapped onto a never-populated index).
        if hosts and "nodes" not in os_opts:
            first = hosts[0] if isinstance(hosts, (list, tuple)) else hosts
            if isinstance(first, dict):
                os_opts["nodes"] = first.get("host", "localhost")
                os_opts.setdefault("port", int(first.get("port", 9200)))
            else:
                name, _, port = str(first).partition(":")
                os_opts["nodes"] = name or "localhost"
                if port:
                    os_opts.setdefault("port", int(port))
        return OpenSearchSink(client, index, **os_opts)
    raise ValueError(f"unknown sink kind {kind!r} (expected file|opensearch)")


__all__ = [
    "BucketedTableSink",
    "DocumentSink",
    "OpenSearchSink",
    "VersionedIndexWriter",
    "array_config",
    "check_to_run_etl",
    "freshness_check",
    "latest_succeeded_transaction_time",
    "select_sink",
]
