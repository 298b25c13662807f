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

Staleness contract: the cache key includes a local-filesystem
signature of the path — for a regular file its ``os.stat``
(mtime_ns, size); for a directory, that stat **plus one of every
direct entry** (name, mtime_ns, size), so an in-place rewrite of a
part file, or an added/removed/renamed part file, re-infers.  Entries
inside *nested* partition subdirectories are only covered one level
down (their directory's own stat), so partition-style layouts that
mutate leaf files in place should not rely on this cache — the
engine's inputs are flat, immutable tables.  Paths that are relative
(Spark may resolve them against a different filesystem than
``os.stat``) or cannot be stat'ed locally (object stores) are never
cached, so the helper degrades to exactly the stock behavior.

Thread-safety: lookups and inserts hold a module lock, so concurrent
query drivers in one session never observe a torn entry; the worst
concurrent outcome is two threads both paying the inference job once.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# (applicationId, path) -> (signature, schema)
_CACHE: "dict[tuple[str, str], tuple[tuple, StructType]]" = {}
_LOCK = threading.Lock()
# tests spin up many short-lived sessions/tempdirs; bound the dict so a
# long pytest run cannot grow it without limit (entries are tiny — this
# is a safety valve, not an LRU)
_CACHE_MAX = 4096


def _signature(path: str) -> "tuple | None":
    if not os.path.isabs(path):
        # Spark resolves relative paths against its default filesystem /
        # working dir, os.stat against the Python CWD — they can name
        # different objects, so never cache a relative path.
        return None
    try:
        st = os.stat(path)
    except OSError:
        return None
    if not os.path.isdir(path):
        return (st.st_mtime_ns, st.st_size)
    # directory: the dir's own mtime only moves when direct entries are
    # added/removed/renamed, so fold in each direct entry's stat — an
    # in-place part-file rewrite then changes the signature too
    try:
        with os.scandir(path) as it:
            entries = tuple(
                sorted(
                    (e.name, s.st_mtime_ns, s.st_size)
                    for e in it
                    for s in (e.stat(follow_symlinks=False),)
                )
            )
    except OSError:
        return None
    return (st.st_mtime_ns, st.st_size, entries)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet(path)`` with the inferred schema cached per
    (session, path, file signature) — skips the per-call footer job."""
    sig = _signature(path)
    if sig is None:
        return spark.read.parquet(path)
    key = (spark.sparkContext.applicationId, path)
    with _LOCK:
        hit = _CACHE.get(key)
    if hit is not None and hit[0] == sig:
        return spark.read.schema(hit[1]).parquet(path)
    df = spark.read.parquet(path)
    with _LOCK:
        if len(_CACHE) >= _CACHE_MAX:
            _CACHE.clear()
        _CACHE[key] = (sig, df.schema)
    return df
