"""Span-level duplication: hand-computed coverage on a tiny corpus."""

from __future__ import annotations

from pyspark.sql import functions as F


def _stats(spark, rows, **kw):
    from tube_spark.operators.spandedup import span_dup_stats

    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = span_dup_stats(df, **kw)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_shared_span_coverage(spark):
    # docs 1 and 2 share the 5-token span "a b c d e"; doc 3 is clean
    rows = [
        (1, "a b c d e x y z"),
        (2, "p q a b c d e"),
        (3, "u v w u v w u v w"),
    ]
    s = _stats(spark, rows, k=3)
    # doc 1: windows at pos 0,1,2 (abc,bcd,cde) duplicated -> 5 tokens
    assert s[1]["n_dup_windows"] == 3 and s[1]["dup_tokens"] == 5
    assert s[1]["n_tokens"] == 8 and abs(s[1]["dup_fraction"] - 0.625) < 1e-9
    # doc 2: same three windows at pos 2,3,4
    assert s[2]["n_dup_windows"] == 3 and s[2]["dup_tokens"] == 5
    # doc 3 repeats ITSELF only — cross-doc semantics say clean
    assert s[3]["n_dup_windows"] == 0 and s[3]["dup_fraction"] == 0.0


def test_disjoint_spans_sum(spark):
    # two separate shared spans inside doc 1: coverage = union, not 2*k
    rows = [
        (1, "a b c z z z z a b c"),
        (2, "a b c"),
    ]
    s = _stats(spark, rows, k=3)
    # doc1 windows: pos0 (abc) and pos7 (abc) duplicated -> 3 + 3 tokens
    assert s[1]["n_dup_windows"] == 2 and s[1]["dup_tokens"] == 6
    assert s[2]["n_dup_windows"] == 1 and s[2]["dup_tokens"] == 3


def test_short_docs_and_filter(spark):
    from tube_spark.operators.spandedup import span_dup_filter

    rows = [
        (1, "a b"),  # shorter than k: no windows, fraction 0
        (2, "a b c d e f g h"),
        (3, "a b c d e f g h"),  # full duplicate of 2
    ]
    s = _stats(spark, rows, k=4)
    assert s[1]["n_dup_windows"] == 0 and s[1]["dup_fraction"] == 0.0
    assert s[2]["dup_fraction"] == 1.0 and s[3]["dup_fraction"] == 1.0

    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    kept = span_dup_filter(df, k=4, max_fraction=0.5)
    assert {r["doc_id"] for r in kept.collect()} == {1}


def test_portable_matches_xxhash_semantics(spark):
    rows = [(i, f"x y z w {i} common tail one two three") for i in range(6)]
    a = _stats(spark, rows, k=3, portable=False)
    b = _stats(spark, rows, k=3, portable=True)
    assert a == b


def test_dedup_lines_rewrite(spark):
    from tube_spark.operators.spandedup import dedup_lines

    rows = [
        (1, "alpha beta\nshared line one\nunique a"),
        (2, "shared line one\ngamma delta\nshared line one"),
        (3, "unique b\nshared line one"),
        (4, "xy\nxy"),  # short lines exempt from dedup
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_lines(df, min_docs=2, min_line_chars=5).collect()}
    # doc 1 is the lowest-id holder: keeps the shared line
    assert out[1]["text"] == "alpha beta\nshared line one\nunique a"
    assert out[1]["n_lines_removed"] == 0
    # doc 2 loses BOTH occurrences, order of the rest preserved
    assert out[2]["text"] == "gamma delta"
    assert out[2]["n_lines_removed"] == 2
    assert out[3]["text"] == "unique b" and out[3]["n_lines_removed"] == 1
    # short lines never removed even when repeated across docs
    assert out[4]["text"] == "xy\nxy" and out[4]["n_lines_removed"] == 0
    assert all(out[i]["n_lines"] >= 1 for i in out)


def test_dedup_lines_all_removed_and_partitioning(spark):
    from tube_spark.operators.spandedup import dedup_lines

    rows = [(1, "only shared line"), (2, "only shared line")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_lines(df).collect()}
    assert out[1]["text"] == "only shared line"
    assert out[2]["text"] == "" and out[2]["n_lines_removed"] == 1

    big = spark.createDataFrame(
        [(i, f"common header line\nbody {i} text here") for i in range(50)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, dedup_lines(big).collect()))
    b = sorted(map(tuple, dedup_lines(big.repartition(7)).collect()))
    assert a == b
    kept = [t for t in a if "common header line" in t[1]]
    assert len(kept) == 1 and kept[0][0] == 0


def test_dedup_lines_null_text_preserved(spark):
    """VERDICT r6: a NULL-text document must not vanish from the
    rewrite output — it normalizes to empty text and survives."""
    from tube_spark.operators.spandedup import dedup_lines

    df = spark.createDataFrame(
        [(1, "shared boilerplate line\nunique alpha"), (2, None),
         (3, "shared boilerplate line\nunique beta")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup_lines(df, min_docs=2, min_line_chars=5).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2]["text"] == "" and out[2]["n_lines"] == 1
    assert out[2]["n_lines_removed"] == 0
    assert "shared boilerplate line" in out[1]["text"]
    assert "shared boilerplate line" not in out[3]["text"]


def test_dedup_lines_hash_path_equivalence(spark):
    """VERDICT r6 #3: hash_lines=True (xxhash64 pre-filter + textual
    verify) must produce output IDENTICAL to the textual path — checked
    on the real sf0.01 documents under the driver query's line split."""
    from pyspark.sql import functions as F

    from tube_spark.operators.spandedup import dedup_lines

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "doc_id",
        F.regexp_replace("text", r"((\S+ ){3}\S+) ", "$1\n").alias("text"),
    )
    textual = dedup_lines(docs, min_docs=2, min_line_chars=5)
    hashed = dedup_lines(docs, min_docs=2, min_line_chars=5, hash_lines=True)
    a = sorted(map(tuple, textual.collect()))
    b = sorted(map(tuple, hashed.collect()))
    assert a == b
    # and the hash path's dup-stat pre-aggregate exchanges the 8-byte
    # hash key, not the raw line
    plan = hashed._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan
