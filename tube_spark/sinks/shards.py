"""Training-shard export: deterministic fixed-size shards + manifest.

The last mile of a training-data pipeline: packed sequences (or any
keyed rows) leave the lakehouse as numbered shards a dataloader can
address directly — in ROW mode shard k holds EXACTLY rows
``rank ∈ [k*rows_per_shard, (k+1)*rows_per_shard)`` of a deterministic
global order; in TOKEN mode a shard holds the whole documents whose
cumulative token position starts inside its budget window (shards of
~equal token mass — what trainers actually provision by — each within
±max_doc_tokens of the budget, ids may skip past an over-budget doc).
Re-exports of the same input are byte-stable.

Design (Spark-first):

* **Global order without a global sort bottleneck**: the order key is
  either the natural key (``shuffle_seed=None``) or
  ``xxhash64(seed, key)`` (the seeded corpus shuffle every trainer
  wants).  Ranks and token prefix sums come from a two-phase
  distributed prefix count — the same range-partition +
  broadcast-offsets shape as ``operators/packing.py`` — never a
  single-partition window.
* **One file per shard**: rows are hash-partitioned BY shard id before
  the write (``repartition(n, shard)`` + ``partitionBy``), so each
  shard directory holds one part file and writers never contend.
  Shards are dataloader-sized, so one task per shard is the right
  granularity at any corpus size; at 100 TB you have more shards, not
  bigger ones.
* **Manifest + verification**: `_MANIFEST.json` (atomic
  ``fsio.write_text`` rename-publish) records per-shard row/token
  counts and an order-independent ``bit_xor(xxhash64(key))`` content
  fingerprint; ``verify_shards`` recomputes everything from the files
  and reports per-shard ok/mismatch — the freshness/integrity gate a
  training job runs before touching the data.
* **Persisted rank**: every row carries its global ``rank`` in the
  shard files — the dataloader's direct address, and the order key
  boundary-shard fills sort by on append (never re-derived from the
  natural key, which would interleave earlier append generations).
* **Incremental**: ``append_shards`` continues the rank/token space
  after the published tail under the manifest's frozen contract,
  filling the ragged boundary shard with a one-shard rewrite.
  ``batch_id`` + the manifest's ``last_batch_id`` watermark make the
  append idempotent per streaming epoch.

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


def _ranked(
    df: DataFrame,
    key_col: str,
    shuffle_seed: int | None,
    token_count_col: str | None = None,
    base_rank: int = 0,
    base_tokens: int = 0,
    order_col: str | None = None,
) -> DataFrame:
    """Add ``__rank`` (0-based, dense, deterministic): position in the
    global order of ``order_key`` (ties broken by the key itself), and
    — when ``token_count_col`` is given — ``__tok_before``: tokens
    preceding the row in that order.  Distributed prefix count — range
    partition on the order key, per-partition totals (one row each),
    broadcast cumulative offsets, local window.  ``base_rank`` /
    ``base_tokens`` shift the space for rank-continuing appends."""
    from pyspark.sql import Window

    if order_col is not None:
        # caller-supplied order key (e.g. a portable md5 hash so a SQL
        # oracle can replay the layout — see plan_shards)
        order = F.col(order_col)
    elif shuffle_seed is None:
        order = F.col(key_col).cast("string")
    else:
        order = F.xxhash64(F.lit(str(shuffle_seed)), F.col(key_col).cast("string"))
    keyed = df.withColumn("__ok", order)
    # Pin the sampled range-partition layout: boundaries are sampled per
    # execution, and the pid->offset map collected below is only valid
    # for THIS layout — the totals collect and the downstream write must
    # see the same partitioning.  localCheckpoint (not cache) pins it
    # and releases blocks on GC (same hazard + fix as operators/
    # packing.py:59-71).
    parts = (
        keyed.repartitionByRange("__ok", key_col)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    aggs = [F.count(F.lit(1)).alias("c")]
    if token_count_col is not None:
        aggs.append(F.sum(F.col(token_count_col)).alias("t"))
    totals = sorted(
        (r["__pid"], r["c"], r["t"] if token_count_col else 0)
        for r in parts.groupBy("__pid").agg(*aggs).collect()
    )
    offsets, acc_c, acc_t = [], base_rank, base_tokens
    for pid, c, t in totals:
        offsets.append((pid, acc_c, acc_t))
        acc_c += c
        acc_t += int(t or 0)
    # broadcast-join the per-partition offsets (one row each) instead
    # of a when-chain: at thousands of partitions the chain pays a py4j
    # round-trip per arm and a deep codegen CASE — the packing.py shape.
    # local_df: LocalRelation, not a 32-task Python-RDD scan (r14).
    from tube_spark.functions.localrel import local_df

    off = local_df(
        df.sparkSession, offsets, "__pid int, __offc long, __offt long"
    )
    w = Window.partitionBy("__pid").orderBy("__ok", key_col)
    out = (
        parts.join(F.broadcast(off), on="__pid")
        .withColumn("__local", F.row_number().over(w) - 1)
        .withColumn("__rank", (F.col("__offc") + F.col("__local")).cast("long"))
    )
    if token_count_col is not None:
        wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        out = out.withColumn(
            "__tok_before",
            (
                F.col("__offt")
                + F.sum(F.col(token_count_col)).over(wsum)
                - F.col(token_count_col)
            ).cast("long"),
        )
    return out.drop("__ok", "__pid", "__local", "__offc", "__offt")


def epoch_order(
    df: DataFrame, key_col: str, epoch: int, seed: str = "epoch"
) -> DataFrame:
    """Deterministic per-epoch dataloader permutation WITHOUT rewriting
    the store: adds ``__epoch_pos`` — the row's 0-based position in
    epoch ``epoch``'s global shuffle order.  Dataloaders re-shuffle the
    corpus every epoch; materializing a re-shuffled copy per epoch is
    O(corpus) writes, but the permutation itself is just a rank over a
    salted portable hash of the stable key — one distributed prefix
    count (the ``_ranked`` machinery: range partition + broadcast
    offsets, never a single-task global window), zero data movement of
    the payload beyond the rank shuffle.

    The order key is ``md5(seed|epoch|key)`` (``portable_hash60``), so
    a SQL oracle replays the full permutation bit-for-bit and any two
    engines agree on every epoch's layout; ties (60-bit collisions)
    break deterministically by the key.  Different epochs yield
    independent permutations under the same contract.
    """
    from tube_spark.functions.text import portable_hash60

    if epoch < 0:
        raise ValueError(f"epoch must be >= 0, got {epoch}")
    keyed = df.withColumn(
        "__eok",
        portable_hash60(
            F.concat_ws(
                "|",
                F.lit(seed),
                F.lit(str(epoch)),
                F.col(key_col).cast("string"),
            )
        ),
    )
    return (
        _ranked(keyed, key_col, None, order_col="__eok")
        .withColumnRenamed("__rank", "__epoch_pos")
        .drop("__eok")
    )


def _shard_col(m: dict):
    if m.get("token_budget"):
        return (F.col("__tok_before") / m["token_budget"]).cast("long")
    return (F.col("__rank") / m["rows_per_shard"]).cast("long")


def _drop_cols(m: dict) -> list[str]:
    # __rank is RENAMED to a persisted ``rank`` column before the write
    # (see export_shards); only the token prefix sum is transient.
    return ["__tok_before"] if m.get("token_budget") else []


def _shard_stats(spark: SparkSession, path: str, m: dict) -> dict:
    """Per-shard facts recomputed FROM THE FILES (what a reader sees)."""
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor(F.xxhash64(F.col(m["key_col"]).cast("string"))).alias("fp"),
    ]
    if m.get("token_budget"):
        aggs.append(F.sum(F.col(m["token_count_col"])).alias("n_tokens"))
    stats = (
        spark.read.parquet(fsio.join(path, "data")).groupBy("shard").agg(*aggs)
    ).collect()
    out = {}
    for r in sorted(stats, key=lambda r: r["shard"]):
        entry = {"n_rows": r["n_rows"], "fp": r["fp"]}
        if m.get("token_budget"):
            entry["n_tokens"] = int(r["n_tokens"])
        out[str(r["shard"])] = entry
    return out


def export_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    rows_per_shard: int | None = None,
    shuffle_seed: int | None = None,
    token_budget: int | None = None,
    token_count_col: str | None = None,
) -> dict:
    """Write ``df`` as ``shard=K`` parquet directories in a
    deterministic global order and publish the manifest.  Exactly one
    of ``rows_per_shard`` (row mode: exact sizes, last shard ragged)
    or ``token_budget`` + ``token_count_col`` (token mode: whole-doc
    shards of ~budget tokens each) must be given."""
    if (rows_per_shard is None) == (token_budget is None):
        raise ValueError(
            "exactly one of rows_per_shard or token_budget must be set"
        )
    if rows_per_shard is not None and rows_per_shard <= 0:
        raise ValueError(f"rows_per_shard must be positive, got {rows_per_shard}")
    if token_budget is not None:
        if token_budget <= 0:
            raise ValueError(f"token_budget must be positive, got {token_budget}")
        if not token_count_col:
            raise ValueError("token mode needs token_count_col")
    spark = df.sparkSession
    if df.isEmpty():
        raise ValueError("export_shards: input frame is empty")
    m = {
        "key_col": key_col,
        "rows_per_shard": rows_per_shard,
        "token_budget": token_budget,
        "token_count_col": token_count_col,
        "shuffle_seed": shuffle_seed,
    }
    ranked = _ranked(df, key_col, shuffle_seed, token_count_col)
    sharded = ranked.withColumn("shard", _shard_col(m)).withColumnRenamed(
        "__rank", "rank"
    )
    # one job for both facts; one write task per shard directory
    agg = sharded.agg(
        F.count(F.lit(1)).alias("n"), F.max("shard").alias("mx")
    ).collect()[0]
    n_rows, n_part = agg["n"], max(1, int(agg["mx"]) + 1)
    # The global ``rank`` is PERSISTED in the shard files: it is the
    # dataloader's direct address, and it is what boundary-shard fills
    # sort already-published rows by on append — re-deriving order from
    # the key would interleave earlier append batches (the arrival-order
    # contract orders rows by generation first, key second).
    (
        sharded.repartition(n_part, "shard")
        .sortWithinPartitions("rank")
        .drop(*_drop_cols(m))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(fsio.join(path, "data"))
    )
    shards = _shard_stats(spark, path, m)
    manifest = {
        **m,
        "n_rows": n_rows,
        "n_tokens": sum(v.get("n_tokens", 0) for v in shards.values()),
        "n_shards": len(shards),
        "shards": shards,
    }
    fsio.write_text(spark, fsio.join(path, _MANIFEST), json.dumps(manifest))
    return manifest


def read_manifest(spark: SparkSession, path: str) -> dict:
    return json.loads(fsio.read_text(spark, fsio.join(path, _MANIFEST)))


def verify_shards(spark: SparkSession, path: str) -> DataFrame:
    """Integrity gate: recompute per-shard facts from the files and
    compare with the manifest.  Returns ``(shard, expected_rows,
    actual_rows, ok)`` — ``ok`` covers the row count, the content
    fingerprint, and (token mode) the token count; missing shards
    appear with actual_rows 0, and ORPHAN shards (on disk but absent
    from the manifest — the residue of an append that crashed before
    its manifest publish) appear with expected_rows 0 and ok=false."""
    m = read_manifest(spark, path)
    actual = {int(s): v for s, v in _shard_stats(spark, path, m).items()}
    rows = []
    for sid, want in m["shards"].items():
        got = actual.pop(int(sid), {"n_rows": 0, "fp": None})
        rows.append(
            (
                int(sid),
                int(want["n_rows"]),
                int(got["n_rows"]),
                got == want,
            )
        )
    for sid, got in actual.items():  # orphans: never ok
        rows.append((int(sid), 0, int(got["n_rows"]), False))
    return spark.createDataFrame(
        sorted(rows),
        "shard long, expected_rows long, actual_rows long, ok boolean",
    )


def append_shards(
    df: DataFrame,
    path: str,
    batch_id: int | None = None,
) -> dict:
    """Incremental export: rank ONLY the new rows under the manifest's
    frozen key/seed/size contract, continue the global rank/token
    space after the published tail, and write the new shards.
    Published shard directories are never rewritten — except the
    boundary shard the new rows land into, which is FILLED by
    rewriting that one directory with old+new rows (one shard of I/O,
    never the corpus), so addressing stays exact after any number of
    appends.  Published rows keep their PERSISTED ``rank`` (written by
    the original export) — the fill never re-derives order from the
    key, so earlier append generations are never interleaved.

    ``batch_id`` (optional) makes the append idempotent per epoch for
    streaming callers: the id of the last applied batch is recorded in
    the manifest, and a call whose ``batch_id`` is <= that watermark is
    a no-op returning the current manifest — a replayed foreachBatch
    epoch (Structured Streaming is at-least-once for side effects)
    does not double-append.

    Note the order contract: the global order is
    append-arrival-ordered — each batch's rows are ordered among
    themselves (by the manifest's seed/key), after everything already
    published.  A re-export from scratch with the same seed orders the
    UNION globally instead; both are deterministic, they are just
    different contracts (incremental vs rebuild), mirroring
    append_vectors' frozen-centroid semantics."""
    spark = df.sparkSession
    m = read_manifest(spark, path)
    key_col = m["key_col"]
    if batch_id is not None:
        last = m.get("last_batch_id")
        if last is not None and batch_id <= int(last):
            return m
    if df.isEmpty():
        return m
    base_rank, base_tokens = int(m["n_rows"]), int(m.get("n_tokens") or 0)
    ranked = _ranked(
        df, key_col, m["shuffle_seed"], m["token_count_col"],
        base_rank, base_tokens,
    )
    sharded = ranked.withColumn("shard", _shard_col(m)).withColumnRenamed(
        "__rank", "rank"
    )
    nagg = sharded.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("shard").alias("mn"),
        F.max("shard").alias("mx"),
    ).collect()[0]
    n_new = nagg["n"]
    if m.get("token_budget"):
        boundary = base_tokens // m["token_budget"] if base_tokens else None
    else:
        boundary = base_rank // m["rows_per_shard"] if base_rank % m["rows_per_shard"] else None
    boundary_dir = (
        fsio.join(path, "data", f"shard={boundary}") if boundary is not None else None
    )
    if boundary is not None and not fsio.exists(spark, boundary_dir):
        boundary = None
    if boundary is not None:
        # fill the boundary shard: rewrite that ONE directory with
        # published + new rows, ordered by the persisted global rank
        # (old ranks all precede the continuation ranks by
        # construction).  localCheckpoint materializes the published
        # rows BEFORE the overwrite (Spark rejects reading the
        # directory a write replaces).
        old = (
            spark.read.parquet(fsio.join(path, "data"))
            .filter(F.col("shard") == boundary)
            .drop("shard")
            .localCheckpoint()
        )
        new_b = sharded.filter(F.col("shard") == boundary).drop(
            "shard", *_drop_cols(m)
        )
        fill = old.unionByName(new_b)
        (
            fill.repartition(1)
            .sortWithinPartitions("rank")
            .write.mode("overwrite")
            .parquet(boundary_dir)
        )
        rest = sharded.filter(F.col("shard") != boundary)
    else:
        rest = sharded
    if not rest.isEmpty():
        # one task per appended shard directory
        n_part = max(1, int(nagg["mx"]) - int(nagg["mn"]) + 1)
        (
            rest.repartition(n_part, "shard")
            .sortWithinPartitions("rank")
            .drop(*_drop_cols(m))
            .write.mode("append")
            .partitionBy("shard")
            .parquet(fsio.join(path, "data"))
        )
    shards = _shard_stats(spark, path, m)
    manifest = {
        **m,
        "n_rows": base_rank + n_new,
        "n_tokens": sum(v.get("n_tokens", 0) for v in shards.values()),
        "n_shards": len(shards),
        "shards": shards,
    }
    if batch_id is not None:
        manifest["last_batch_id"] = int(batch_id)
    fsio.write_text(spark, fsio.join(path, _MANIFEST), json.dumps(manifest))
    return manifest


def repair_shards(spark: SparkSession, path: str) -> DataFrame:
    """Roll the store back to its last published manifest — the
    recovery step after an append crashed between its data writes and
    its manifest publish (the one at-least-once window the streaming
    export's batch_id watermark cannot cover, because the watermark
    only commits WITH the manifest).

    The persisted ``rank`` makes this exact: every published row has
    ``rank < manifest.n_rows``, every row from the crashed append has
    ``rank >= n_rows`` — so repair rewrites each damaged shard keeping
    only published ranks and deletes orphan directories wholesale.
    After repair, ``verify_shards`` is all-ok and replaying the crashed
    batch (same batch_id > last_batch_id) lands it exactly once.

    Returns the post-repair ``verify_shards`` frame (callers gate on
    ``ok``)."""
    m = read_manifest(spark, path)
    n_rows = int(m["n_rows"])
    status = verify_shards(spark, path).collect()
    for r in status:
        if r["ok"]:
            continue
        sdir = fsio.join(path, "data", f"shard={r['shard']}")
        if r["expected_rows"] == 0:
            # orphan directory: entirely from the crashed append
            fsio.delete(spark, sdir)
        elif r["actual_rows"] > r["expected_rows"]:
            # boundary shard half-filled by the crashed append: keep
            # only the published rank space (one-shard rewrite, the
            # same I/O unit as the fill itself)
            kept = (
                spark.read.parquet(sdir)
                .filter(F.col("rank") < n_rows)
                .localCheckpoint()
            )
            (
                kept.repartition(1)
                .sortWithinPartitions("rank")
                .write.mode("overwrite")
                .parquet(sdir)
            )
        # actual < expected (lost files) is NOT repairable from the
        # store itself — leave the row flagged for the caller
    return verify_shards(spark, path)


def plan_shards(
    df: DataFrame,
    key_col: str,
    token_count_col: str,
    token_budget: int,
    order_col: str | None = None,
    shuffle_seed: int | None = None,
) -> DataFrame:
    """The token-budget shard LAYOUT as a queryable frame — the same
    cumulative-position assignment ``export_shards`` writes, without
    touching storage: ``(shard, n_docs, n_tokens)`` per shard.  With
    ``order_col`` pointing at a portable (md5) hash column the whole
    layout is SQL-replayable, giving the sink's core math a
    differential oracle (the engine-native xxhash64 path in
    ``export_shards`` shares this code, so the oracle exercises the
    same prefix-sum and assignment logic — the ann_lsh_topk_portable
    pairing)."""
    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive, got {token_budget}")
    ranked = _ranked(
        df, key_col, shuffle_seed, token_count_col, order_col=order_col
    )
    return (
        ranked.withColumn(
            "shard", (F.col("__tok_before") / token_budget).cast("long")
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col(token_count_col)).cast("long").alias("n_tokens"),
        )
    )
