"""Training-shard export: exact shard sizes, deterministic order and
seeded shuffle, manifest integrity gate, one file per shard."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from tube_spark.sinks.shards import export_shards, read_manifest, verify_shards

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def test_exact_shard_sizes_and_addressing(spark, tmp_path):
    """Shard k holds exactly ranks [k*R, (k+1)*R) of the global order —
    (shard, offset) addressing without an index server."""
    p = str(tmp_path / "out")
    m = export_shards(_docs(spark), p, "doc_id", rows_per_shard=64)
    n = _docs(spark).count()
    assert m["n_rows"] == n
    assert m["n_shards"] == -(-n // 64)
    sizes = {int(s): v["n_rows"] for s, v in m["shards"].items()}
    full, last = divmod(n, 64)
    for k in range(full):
        assert sizes[k] == 64
    if last:
        assert sizes[full] == last
    # natural order (no seed): shard 0 holds the 64 smallest doc_ids
    # (string order of the key — the documented order key)
    got = [
        r["doc_id"]
        for r in spark.read.parquet(f"{p}/data")
        .filter(F.col("shard") == 0)
        .collect()
    ]
    want = sorted(
        (r["doc_id"] for r in _docs(spark).collect()), key=str
    )[:64]
    assert sorted(got) == sorted(want)


def test_one_file_per_shard(spark, tmp_path):
    p = str(tmp_path / "out1")
    m = export_shards(_docs(spark), p, "doc_id", rows_per_shard=100)
    for k in range(m["n_shards"]):
        files = glob.glob(f"{p}/data/shard={k}/*.parquet")
        assert len(files) == 1, f"shard {k}: {files}"


def test_seeded_shuffle_deterministic_and_different(spark, tmp_path):
    """Same seed => byte-stable manifest across exports; different seed
    => different order (different shard membership)."""
    p1, p2, p3 = (str(tmp_path / d) for d in ("a", "b", "c"))
    m1 = export_shards(_docs(spark), p1, "doc_id", 64, shuffle_seed=7)
    m2 = export_shards(_docs(spark), p2, "doc_id", 64, shuffle_seed=7)
    m3 = export_shards(_docs(spark), p3, "doc_id", 64, shuffle_seed=8)
    assert m1["shards"] == m2["shards"]  # incl. content fingerprints
    assert m1["shards"] != m3["shards"]
    # shuffled shard 0 differs from natural-order shard 0
    nat = export_shards(_docs(spark), str(tmp_path / "n"), "doc_id", 64)
    assert m1["shards"]["0"]["fp"] != nat["shards"]["0"]["fp"]


def test_verify_shards_gate(spark, tmp_path):
    """verify_shards passes on a clean export and flags a damaged
    shard (count and fingerprint both checked)."""
    import shutil

    p = str(tmp_path / "v")
    export_shards(_docs(spark), p, "doc_id", rows_per_shard=100)
    ok = verify_shards(spark, p)
    assert ok.filter(~F.col("ok")).count() == 0
    # damage: drop shard 1 entirely
    shutil.rmtree(f"{p}/data/shard=1")
    bad = {r["shard"]: r for r in verify_shards(spark, p).collect()}
    assert bad[1]["actual_rows"] == 0 and not bad[1]["ok"]
    assert bad[0]["ok"]


def test_empty_and_bad_args(spark, tmp_path):
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty"):
        export_shards(empty, str(tmp_path / "e"), "doc_id", 10)
    with pytest.raises(ValueError, match="positive"):
        export_shards(_docs(spark), str(tmp_path / "z"), "doc_id", 0)


def test_rank_order_within_shard_file(spark, tmp_path):
    """Rows inside a shard file appear in global-order position — a
    dataloader streaming the file sees the intended order."""
    p = str(tmp_path / "ord")
    export_shards(_docs(spark), p, "doc_id", 64, shuffle_seed=3)
    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{p}/data/shard=0/").collect()
    ]
    h = {
        r["doc_id"]: r["h"]
        for r in _docs(spark)
        .select(
            "doc_id",
            F.xxhash64(F.lit("3"), F.col("doc_id").cast("string")).alias("h"),
        )
        .collect()
    }
    keys = [(h[i], str(i)) for i in ids]
    assert keys == sorted(keys)


def test_append_fills_boundary_and_extends(spark, tmp_path):
    """Append under the frozen manifest contract: the ragged boundary
    shard is filled (one-shard rewrite), new shards continue the rank
    space, and (shard, offset) addressing stays exact — verify_shards
    green throughout."""
    from tube_spark.sinks.shards import append_shards

    docs = _docs(spark)
    first = docs.filter(F.col("doc_id") < 90)   # 90 rows: shard1 ragged (26)
    later = docs.filter(F.col("doc_id") >= 90)
    p = str(tmp_path / "app")
    m0 = export_shards(first, p, "doc_id", rows_per_shard=64, shuffle_seed=5)
    assert m0["shards"]["1"]["n_rows"] == 26
    m1 = append_shards(later, p)
    n = docs.count()
    assert m1["n_rows"] == n
    sizes = {int(s): v["n_rows"] for s, v in m1["shards"].items()}
    full, last = divmod(n, 64)
    for k in range(full):
        assert sizes[k] == 64, f"shard {k}: {sizes[k]}"
    if last:
        assert sizes[full] == last
    assert verify_shards(spark, p).filter(~F.col("ok")).count() == 0
    # shard 0 was never rewritten: fingerprint unchanged from m0
    assert m1["shards"]["0"] == m0["shards"]["0"]
    # content completeness: xor of per-shard fingerprints (all rows
    # exactly once) equals the fingerprint of the full corpus
    fp_all = 0
    for v in m1["shards"].values():
        fp_all ^= v["fp"]
    want = docs.agg(
        F.bit_xor(F.xxhash64(F.col("doc_id").cast("string")))
    ).collect()[0][0]
    assert fp_all == want


def test_append_on_exact_boundary(spark, tmp_path):
    """No ragged shard: append only creates new directories."""
    from tube_spark.sinks.shards import append_shards

    docs = _docs(spark)
    p = str(tmp_path / "app2")
    m0 = export_shards(
        docs.filter(F.col("doc_id") < 128), p, "doc_id", rows_per_shard=64
    )
    assert all(v["n_rows"] == 64 for v in m0["shards"].values())
    m1 = append_shards(docs.filter(F.col("doc_id") >= 128), p)
    assert m1["shards"]["0"] == m0["shards"]["0"]
    assert m1["shards"]["1"] == m0["shards"]["1"]
    assert verify_shards(spark, p).filter(~F.col("ok")).count() == 0


def test_streaming_shard_export(spark, tmp_path):
    """File stream drains into the shard store; manifest and integrity
    gate correct after the stream, checkpoint mandatory."""
    from tube_spark.sinks.shards import append_shards, read_manifest
    from tube_spark.streaming.shards import streaming_shard_export

    docs = _docs(spark)
    p = str(tmp_path / "stream_store")
    export_shards(docs.filter(F.col("doc_id") < 100), p, "doc_id", 64, shuffle_seed=1)
    src = str(tmp_path / "incoming")
    docs.filter(F.col("doc_id") >= 100).write.parquet(src)
    with pytest.raises(ValueError, match="checkpoint"):
        streaming_shard_export(spark, src, p, checkpoint_dir="")
    q = streaming_shard_export(
        spark, src, p, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    m = read_manifest(spark, p)
    assert m["n_rows"] == docs.count()
    assert verify_shards(spark, p).filter(~F.col("ok")).count() == 0


def test_token_budget_mode(spark, tmp_path):
    """Token mode: whole-doc shards of ~budget tokens; every shard's
    token mass within budget ± max_doc_tokens; union complete."""
    from tube_spark.functions.text import token_count_bpe_ish
    from tube_spark.sinks.shards import append_shards

    docs = _docs(spark).withColumn("n_tok", token_count_bpe_ish(F.col("text")))
    p = str(tmp_path / "tok")
    budget = 2000
    m = export_shards(
        docs, p, "doc_id", token_budget=budget, token_count_col="n_tok",
        shuffle_seed=2,
    )
    total = docs.agg(F.sum("n_tok")).collect()[0][0]
    assert m["n_tokens"] == total
    assert m["n_rows"] == docs.count()
    max_doc = docs.agg(F.max("n_tok")).collect()[0][0]
    for v in m["shards"].values():
        assert v["n_tokens"] <= budget + max_doc
    # every shard except possibly the last reaches the budget window
    sizes = [v["n_tokens"] for _, v in sorted(m["shards"].items(), key=lambda kv: int(kv[0]))]
    for s in sizes[:-1]:
        assert s > budget - max_doc
    assert verify_shards(spark, p).filter(~F.col("ok")).count() == 0

    # token-mode append: boundary fill + continuation stays verified
    p2 = str(tmp_path / "tok2")
    first = docs.filter(F.col("doc_id") < 300)
    later = docs.filter(F.col("doc_id") >= 300)
    export_shards(
        first, p2, "doc_id", token_budget=budget, token_count_col="n_tok",
        shuffle_seed=2,
    )
    m2 = append_shards(later, p2)
    assert m2["n_tokens"] == total and m2["n_rows"] == docs.count()
    for v in m2["shards"].values():
        assert v["n_tokens"] <= budget + max_doc
    assert verify_shards(spark, p2).filter(~F.col("ok")).count() == 0
    fp_all = 0
    for v in m2["shards"].values():
        fp_all ^= v["fp"]
    want = docs.agg(
        F.bit_xor(F.xxhash64(F.col("doc_id").cast("string")))
    ).collect()[0][0]
    assert fp_all == want


def test_mode_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="exactly one"):
        export_shards(_docs(spark), str(tmp_path / "x"), "doc_id")
    with pytest.raises(ValueError, match="exactly one"):
        export_shards(
            _docs(spark), str(tmp_path / "y"), "doc_id",
            rows_per_shard=10, token_budget=10, token_count_col="n",
        )
    with pytest.raises(ValueError, match="token_count_col"):
        export_shards(
            _docs(spark), str(tmp_path / "z"), "doc_id", token_budget=10
        )


def test_append_replay_idempotent(spark, tmp_path):
    """Replayed foreachBatch epochs are manifest-level no-ops: a second
    append_shards with the same (or an older) batch_id leaves the store
    byte-identical — the at-least-once replay cannot double-append."""
    from tube_spark.sinks.shards import append_shards

    docs = _docs(spark)
    p = str(tmp_path / "replay")
    export_shards(docs.filter(F.col("doc_id") < 90), p, "doc_id", 64, shuffle_seed=5)
    b1 = docs.filter((F.col("doc_id") >= 90) & (F.col("doc_id") < 200))
    b2 = docs.filter(F.col("doc_id") >= 200)
    m1 = append_shards(b1, p, batch_id=0)
    assert m1["last_batch_id"] == 0
    # exact replay of epoch 0: no-op (same manifest, same files)
    m1r = append_shards(b1, p, batch_id=0)
    assert m1r == m1
    assert read_manifest(spark, p) == m1
    m2 = append_shards(b2, p, batch_id=1)
    assert m2["last_batch_id"] == 1 and m2["n_rows"] == docs.count()
    # replay of an OLDER epoch after newer ones committed: also a no-op
    m2r = append_shards(b1, p, batch_id=0)
    assert m2r == m2 and read_manifest(spark, p) == m2
    assert verify_shards(spark, p).filter(~F.col("ok")).count() == 0


def test_streaming_restart_no_double_append(spark, tmp_path):
    """Restarting the availableNow stream against the same checkpoint
    (a full redelivery opportunity) appends nothing twice; a new source
    file after the restart is picked up exactly once."""
    from tube_spark.streaming.shards import streaming_shard_export

    docs = _docs(spark)
    p = str(tmp_path / "srestart")
    export_shards(docs.filter(F.col("doc_id") < 100), p, "doc_id", 64, shuffle_seed=1)
    src = str(tmp_path / "sincoming")
    ckpt = str(tmp_path / "sckpt")
    docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 300)).write.parquet(src)
    q = streaming_shard_export(spark, src, p, checkpoint_dir=ckpt)
    q.awaitTermination(120)
    m1 = read_manifest(spark, p)
    assert m1["n_rows"] == 300
    # restart with no new data: no-op
    q = streaming_shard_export(spark, src, p, checkpoint_dir=ckpt)
    q.awaitTermination(120)
    assert read_manifest(spark, p) == m1
    # new file arrives; restart processes ONLY it
    docs.filter(F.col("doc_id") >= 300).write.mode("append").parquet(src)
    q = streaming_shard_export(spark, src, p, checkpoint_dir=ckpt)
    q.awaitTermination(120)
    m2 = read_manifest(spark, p)
    assert m2["n_rows"] == docs.count()
    assert verify_shards(spark, p).filter(~F.col("ok")).count() == 0
    fp_all = 0
    for v in m2["shards"].values():
        fp_all ^= v["fp"]
    want = docs.agg(
        F.bit_xor(F.xxhash64(F.col("doc_id").cast("string")))
    ).collect()[0][0]
    assert fp_all == want


def test_second_append_preserves_generation_order(spark, tmp_path):
    """Two successive appends into the SAME still-ragged boundary shard:
    file order stays generation-then-key (the persisted rank), never a
    key-interleave of already-published rows."""
    from tube_spark.sinks.shards import append_shards

    docs = _docs(spark)
    p = str(tmp_path / "gen")
    a = docs.filter(F.col("doc_id") < 10)
    b = docs.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 20))
    c = docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 30))
    export_shards(a, p, "doc_id", rows_per_shard=64, shuffle_seed=9)
    append_shards(b, p)
    append_shards(c, p)  # boundary shard 0 still ragged both times
    rows = spark.read.parquet(f"{p}/data/shard=0/").collect()
    ids_in_file_order = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    gens = [0 if i < 10 else (1 if i < 20 else 2) for i in ids_in_file_order]
    assert gens == sorted(gens), f"generations interleaved: {ids_in_file_order}"
    # ranks are the contiguous global address space 0..n-1
    assert sorted(r["rank"] for r in rows) == list(range(30))
    assert verify_shards(spark, p).filter(~F.col("ok")).count() == 0


def test_verify_flags_orphan_shards(spark, tmp_path):
    """A shard directory on disk but absent from the manifest (residue
    of an append that crashed before its manifest publish) is flagged."""
    p = str(tmp_path / "orph")
    m = export_shards(_docs(spark), p, "doc_id", rows_per_shard=100)
    k = m["n_shards"]
    spark.read.parquet(f"{p}/data/shard=0/").write.parquet(f"{p}/data/shard={k}")
    bad = {r["shard"]: r for r in verify_shards(spark, p).collect()}
    assert not bad[k]["ok"] and bad[k]["expected_rows"] == 0
    assert all(bad[i]["ok"] for i in range(k))


def test_repair_after_mid_append_crash(spark, tmp_path):
    """Crash simulation for the one uncovered at-least-once window: an
    append's data files land but its manifest publish never happens.
    repair_shards rolls the store back to the published rank space
    (orphan dirs deleted, half-filled boundary rewritten), after which
    the replayed batch lands exactly once — end state identical to a
    crash-free run."""
    import json

    from tube_spark.sinks.shards import append_shards, repair_shards

    docs = _docs(spark)
    seed = docs.filter(F.col("doc_id") < 90)     # shard 1 ragged (26)
    batch = docs.filter(F.col("doc_id") >= 90)
    p, ctrl = str(tmp_path / "crash"), str(tmp_path / "ctrl")

    m0 = export_shards(seed, p, "doc_id", rows_per_shard=64, shuffle_seed=5)
    export_shards(seed, ctrl, "doc_id", rows_per_shard=64, shuffle_seed=5)

    # crash: run the append fully, then restore the OLD manifest —
    # exactly the on-disk state of dying before the manifest publish
    # (via fsio so the local FS checksum shadow file stays consistent)
    from tube_spark.functions import fsio

    append_shards(batch, p, batch_id=0)
    fsio.write_text(spark, f"{p}/_MANIFEST.json", json.dumps(m0))

    bad = verify_shards(spark, p).filter(~F.col("ok"))
    assert bad.count() > 0  # the damage is visible to the gate
    fixed = repair_shards(spark, p)
    assert fixed.filter(~F.col("ok")).count() == 0
    assert read_manifest(spark, p)["n_rows"] == 90

    # replay the "lost" epoch; compare against a crash-free control
    m1 = append_shards(batch, p, batch_id=0)
    m2 = append_shards(batch, ctrl, batch_id=0)
    assert m1["shards"] == m2["shards"] and m1["n_rows"] == m2["n_rows"]
    assert verify_shards(spark, p).filter(~F.col("ok")).count() == 0


def test_repair_is_noop_on_clean_store(spark, tmp_path):
    from tube_spark.sinks.shards import repair_shards

    p = str(tmp_path / "clean")
    m = export_shards(_docs(spark), p, "doc_id", rows_per_shard=100)
    fixed = repair_shards(spark, p)
    assert fixed.filter(~F.col("ok")).count() == 0
    assert read_manifest(spark, p) == m


def test_epoch_order_is_portable_permutation(spark):
    """Every epoch is an exact permutation of [0, N), bit-identical to
    the md5-sorted python reference, repartition-invariant, and
    distinct across epochs."""
    import hashlib

    from tube_spark.sinks.shards import epoch_order

    docs = _docs(spark)
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    n = len(ids)

    def ref(epoch):
        def key(i):
            h = hashlib.md5(f"epoch|{epoch}|{i}".encode()).hexdigest()
            return (int(h[:15], 16), i)

        return {i: pos for pos, i in enumerate(sorted(ids, key=key))}

    for epoch in (0, 3):
        got = {
            r["doc_id"]: r["__epoch_pos"]
            for r in epoch_order(docs, "doc_id", epoch).collect()
        }
        assert sorted(got.values()) == list(range(n))
        assert got == ref(epoch)
    # repartition invariance: the permutation is a pure function of
    # the key, not the layout
    skewed = {
        r["doc_id"]: r["__epoch_pos"]
        for r in epoch_order(docs.repartition(17), "doc_id", 3).collect()
    }
    assert skewed == ref(3)
    assert ref(0) != ref(3)
