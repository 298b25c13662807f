"""Schema-cached parquet reads for immutable input tables.

Every bare ``spark.read.parquet(path)`` runs a schema-inference job
(``parallelize`` + ``mapPartitions`` over the file footers) **per
call** — Spark does not cache the inferred schema, so a query that
reads four tables pays four jobs before its action even starts, and a
best-of-3 bench pays them three times over (measured on local[32]:
~0.16 s per call inferred vs ~0.04 s with an explicit schema, and the
explicit-schema path submits ZERO jobs).

``read_parquet`` infers once per (session, path, file-signature) and
replays the cached schema through ``spark.read.schema(...)`` on every
later call.  This is metadata caching, not result caching: the scan,
filters and every downstream computation still execute from the
parquet bytes on each action.  On a real cluster the same latency is
what a catalog (``spark.table``) removes by declaring schemas; this
helper gives path-based reads the same property without a metastore.

Staleness: the cache key includes ``os.stat`` (mtime_ns, size) of the
path — a rewritten file or a directory whose part-files changed gets
re-inferred.  Paths that cannot be stat'ed locally (object stores) are
never cached, so the helper degrades to exactly the stock behavior.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# (applicationId, path) -> ((mtime_ns, size), schema)
_CACHE: "dict[tuple[str, str], tuple[tuple[int, int], StructType]]" = {}
# tests spin up many short-lived sessions/tempdirs; bound the dict so a
# long pytest run cannot grow it without limit (entries are tiny — this
# is a safety valve, not an LRU)
_CACHE_MAX = 4096


def _signature(path: str) -> "tuple[int, int] | None":
    try:
        st = os.stat(path)
    except OSError:
        return None
    return (st.st_mtime_ns, st.st_size)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet(path)`` with the inferred schema cached per
    (session, path, file signature) — skips the per-call footer job."""
    sig = _signature(path)
    if sig is None:
        return spark.read.parquet(path)
    key = (spark.sparkContext.applicationId, path)
    hit = _CACHE.get(key)
    if hit is not None and hit[0] == sig:
        return spark.read.schema(hit[1]).parquet(path)
    df = spark.read.parquet(path)
    if len(_CACHE) >= _CACHE_MAX:
        _CACHE.clear()
    _CACHE[key] = (sig, df.schema)
    return df
