"""Training-shard export: deterministic fixed-size shards + manifest.

The last mile of a training-data pipeline: packed sequences (or any
keyed rows) leave the lakehouse as numbered shards a dataloader can
address directly — shard k holds EXACTLY rows
``rank ∈ [k*rows_per_shard, (k+1)*rows_per_shard)`` of a deterministic
global order, so any worker can map (shard, offset) → sample without
an index server, and a re-export of the same input is byte-stable.

Design (Spark-first):

* **Global order without a global sort bottleneck**: the order key is
  either the natural key (``shuffle_seed=None``) or
  ``xxhash64(seed, key)`` (the seeded corpus shuffle every trainer
  wants).  Ranks come from a two-phase distributed prefix count — the
  same range-partition + broadcast-offsets shape as
  ``operators/packing.py`` — never a single-partition window.
* **One file per shard**: rows are hash-partitioned BY shard id before
  the write (``repartition(n_shards, shard)`` + ``partitionBy``), so
  each shard directory holds one part file and writers never contend.
  Shards are dataloader-sized (10^4-10^6 rows), so one task per shard
  is the right granularity at any corpus size; at 100 TB you have more
  shards, not bigger ones.
* **Manifest + verification**: `_MANIFEST.json` (atomic
  ``fsio.write_text`` rename-publish) records per-shard row counts and
  an order-independent ``bit_xor(xxhash64(key))`` content fingerprint;
  ``verify_shards`` recomputes both from the files and reports
  per-shard ok/mismatch — the freshness/integrity gate a training job
  runs before touching the data.

Reference: the reference engine's terminal stage is an ES bulk load
(tube/etl/outputs, see SURVEY §2.1 S7); this sink is the analogous
terminal stage for the training-pipeline extension family.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tube_spark.functions import fsio

_MANIFEST = "_MANIFEST.json"


def _ranked(df: DataFrame, key_col: str, shuffle_seed: int | None) -> DataFrame:
    """Add ``__rank`` (0-based, dense, deterministic): position in the
    global order of ``order_key`` (ties broken by the key itself).
    Distributed prefix count — range partition on the order key, count
    per partition, broadcast cumulative offsets, local row_number."""
    from pyspark.sql import Window

    if shuffle_seed is None:
        order = F.col(key_col).cast("string")
    else:
        order = F.xxhash64(F.lit(str(shuffle_seed)), F.col(key_col).cast("string"))
    keyed = df.withColumn("__ok", order)
    parts = keyed.repartitionByRange("__ok", key_col).withColumn(
        "__pid", F.spark_partition_id()
    )
    # per-partition counts are tiny (one row per partition): broadcast
    counts = parts.groupBy("__pid").count()
    rows = sorted((r["__pid"], r["count"]) for r in counts.collect())
    offsets, acc = {}, 0
    for pid, c in rows:
        offsets[pid] = acc
        acc += c
    off = F.lit(None).cast("long")
    for pid, o in offsets.items():
        off = F.when(F.col("__pid") == pid, F.lit(o)).otherwise(off)
    w = Window.partitionBy("__pid").orderBy("__ok", key_col)
    return (
        parts.withColumn("__local", F.row_number().over(w) - 1)
        .withColumn("__rank", (off + F.col("__local")).cast("long"))
        .drop("__ok", "__pid", "__local")
    )


def export_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    rows_per_shard: int,
    shuffle_seed: int | None = None,
) -> dict:
    """Write ``df`` as ``shard=K`` parquet directories of exactly
    ``rows_per_shard`` rows each (last shard ragged) in a deterministic
    global order, publish the manifest, and return it."""
    if rows_per_shard <= 0:
        raise ValueError(f"rows_per_shard must be positive, got {rows_per_shard}")
    spark = df.sparkSession
    if df.isEmpty():
        raise ValueError("export_shards: input frame is empty")
    ranked = _ranked(df, key_col, shuffle_seed)
    sharded = ranked.withColumn(
        "shard", (F.col("__rank") / rows_per_shard).cast("long")
    )
    n_rows = sharded.count()
    n_shards = max(1, -(-n_rows // rows_per_shard))
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("__rank")
        .drop("__rank")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(fsio.join(path, "data"))
    )
    # per-shard facts recomputed FROM THE FILES (what a reader sees),
    # not from the pre-write frame
    stats = (
        spark.read.parquet(fsio.join(path, "data"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor(F.xxhash64(F.col(key_col).cast("string"))).alias("fp"),
        )
        .collect()
    )
    manifest = {
        "key_col": key_col,
        "rows_per_shard": rows_per_shard,
        "shuffle_seed": shuffle_seed,
        "n_rows": n_rows,
        "n_shards": n_shards,
        "shards": {
            str(r["shard"]): {"n_rows": r["n_rows"], "fp": r["fp"]}
            for r in sorted(stats, key=lambda r: r["shard"])
        },
    }
    fsio.write_text(spark, fsio.join(path, _MANIFEST), json.dumps(manifest))
    return manifest


def read_manifest(spark: SparkSession, path: str) -> dict:
    return json.loads(fsio.read_text(spark, fsio.join(path, _MANIFEST)))


def verify_shards(spark: SparkSession, path: str) -> DataFrame:
    """Integrity gate: recompute per-shard row counts and fingerprints
    from the files and compare with the manifest.  Returns
    ``(shard, expected_rows, actual_rows, ok)`` — ``ok`` covers both
    the count and the content fingerprint; missing shards appear with
    actual_rows 0."""
    m = read_manifest(spark, path)
    actual = {
        r["shard"]: (r["n_rows"], r["fp"])
        for r in spark.read.parquet(fsio.join(path, "data"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor(F.xxhash64(F.col(m["key_col"]).cast("string"))).alias("fp"),
        )
        .collect()
    }
    rows = []
    for sid, want in m["shards"].items():
        got = actual.get(int(sid), (0, None))
        rows.append(
            (
                int(sid),
                int(want["n_rows"]),
                int(got[0]),
                got[0] == want["n_rows"] and got[1] == want["fp"],
            )
        )
    return spark.createDataFrame(
        sorted(rows),
        "shard long, expected_rows long, actual_rows long, ok boolean",
    )


def append_shards(
    df: DataFrame,
    path: str,
) -> dict:
    """Incremental export: rank ONLY the new rows (under the
    manifest's frozen key/seed/shard-size contract), continue the
    global rank after the published ``n_rows``, and write the new
    shards.  Published shard directories are never rewritten — except
    the boundary shard when it was ragged: the append FILLS it by
    rewriting that one directory with old+new rows (one shard of I/O,
    never the corpus), so ``(shard, offset)`` addressing stays exact
    after any number of appends.

    Note the order contract: the global order is
    append-arrival-ordered — each batch's rows are ordered among
    themselves (by the manifest's seed/key), after everything already
    published.  A re-export from scratch with the same seed orders the
    UNION globally instead; both are deterministic, they are just
    different contracts (incremental vs rebuild), mirroring
    append_vectors' frozen-centroid semantics."""
    spark = df.sparkSession
    m = read_manifest(spark, path)
    key_col, rps = m["key_col"], int(m["rows_per_shard"])
    if df.isEmpty():
        return m
    base = int(m["n_rows"])
    ranked = _ranked(df, key_col, m["shuffle_seed"]).withColumn(
        "__rank", F.col("__rank") + F.lit(base)
    )
    boundary = base // rps if base % rps else None
    sharded = ranked.withColumn(
        "shard", (F.col("__rank") / rps).cast("long")
    )
    n_new = sharded.count()
    if boundary is not None:
        # fill the ragged boundary shard: rewrite that ONE directory
        # with published + new rows in rank order
        # localCheckpoint materializes the published rows BEFORE the
        # overwrite below — without it the write plan reads the very
        # directory it replaces (Spark rejects the self-overwrite)
        old = (
            spark.read.parquet(fsio.join(path, "data"))
            .filter(F.col("shard") == boundary)
            .drop("shard")
            .localCheckpoint()
        )
        # published rows of the boundary shard keep their order: they
        # ranked [boundary*rps, base); re-derive their in-shard order
        # from the frozen order key
        old_ranked = _ranked(old, key_col, m["shuffle_seed"]).withColumn(
            "__rank", F.col("__rank") + F.lit(boundary * rps)
        )
        fill = sharded.filter(F.col("shard") == boundary).unionByName(
            old_ranked.withColumn("shard", F.lit(boundary).cast("long"))
        )
        (
            fill.repartition(1)
            .sortWithinPartitions("__rank")
            .drop("__rank", "shard")
            .write.mode("overwrite")
            .parquet(fsio.join(path, "data", f"shard={boundary}"))
        )
        rest = sharded.filter(F.col("shard") != boundary)
    else:
        rest = sharded
    n_shards_new = -(-(base + n_new) // rps)
    if not rest.isEmpty():
        (
            rest.repartition(max(1, n_shards_new - m["n_shards"]), "shard")
            .sortWithinPartitions("__rank")
            .drop("__rank")
            .write.mode("append")
            .partitionBy("shard")
            .parquet(fsio.join(path, "data"))
        )
    stats = (
        spark.read.parquet(fsio.join(path, "data"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor(F.xxhash64(F.col(key_col).cast("string"))).alias("fp"),
        )
        .collect()
    )
    manifest = {
        **m,
        "n_rows": base + n_new,
        "n_shards": n_shards_new,
        "shards": {
            str(r["shard"]): {"n_rows": r["n_rows"], "fp": r["fp"]}
            for r in sorted(stats, key=lambda r: r["shard"])
        },
    }
    fsio.write_text(spark, fsio.join(path, _MANIFEST), json.dumps(manifest))
    return manifest
