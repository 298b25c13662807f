"""Search-index entry point — build and query the persistent retrieval
stores from the command line (the serving-side sibling of
``tube_spark.curate``, which produces the corpora these index).

Build (or append to) the term-partitioned BM25 text index:

    python -m tube_spark.index build \
        --docs /data/corpus.parquet --index /data/text_idx \
        [--n-buckets 64] [--append] [--auto-compact N] [--master local[8]]

Query it:

    python -m tube_spark.index search \
        --index /data/text_idx --query "model training data" \
        [--k 10] [--master local[8]]

Stages (documented in COVERAGE.md):
  build  -> ``operators.searchindex.build_text_index`` /
            ``append_text_index`` (postings partitioned by term-hash
            bucket; manifest carries corpus stats; appends never
            rewrite published buckets)
  search -> ``operators.searchindex.search_text_index`` (reads ONLY
            the query terms' bucket partitions + term rows; provably
            result-identical to the scan-time ``bm25_topk``)

And the IVF vector store (operators/vectorstore.py):

    python -m tube_spark.index build-vectors \
        --embeddings /data/embeddings.parquet --index /data/vec_idx \
        [--n-clusters 16] [--append]

    python -m tube_spark.index search-vectors \
        --index /data/vec_idx --query-id 7 \
        --embeddings /data/embeddings.parquet [--k 10] [--nprobe 4]

Prints one JSON line: the manifest/stats (build) or the ranked hits
(search).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build or append the text index")
    b.add_argument("--docs", required=True, help="documents parquet")
    b.add_argument("--index", required=True, help="index root")
    b.add_argument("--id-col", default="doc_id")
    b.add_argument("--text-col", default="text")
    b.add_argument("--n-buckets", type=int, default=64)
    b.add_argument("--append", action="store_true",
                   help="add NEW doc_ids to an existing index")
    b.add_argument(
        "--auto-compact", type=int, default=0, metavar="N",
        help="with --append: compact into a fresh postings generation "
             "once the committed segment count reaches N (measured rule: "
             "4-8 segments; 3.2x search payoff at 8 — 0 disables)",
    )
    b.add_argument("--master", default="local[8]")

    c = sub.add_parser(
        "compact",
        help="merge committed append segments into a fresh postings "
             "generation (manifest-committed swap)",
    )
    c.add_argument("--index", required=True, help="index root")
    c.add_argument("--keep-old", action="store_true",
                   help="leave superseded directories on disk")
    c.add_argument("--master", default="local[8]")

    s = sub.add_parser("search", help="query the text index")
    s.add_argument("--index", required=True, help="index root")
    s.add_argument("--query", required=True, help="free-text query")
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--master", default="local[8]")

    bv = sub.add_parser("build-vectors", help="build/append the IVF vector store")
    bv.add_argument("--embeddings", required=True, help="embeddings parquet")
    bv.add_argument("--index", required=True, help="store root")
    bv.add_argument("--id-col", default="vec_id")
    bv.add_argument("--vec-col", default="embedding")
    bv.add_argument("--n-clusters", type=int, default=16)
    bv.add_argument("--append", action="store_true",
                    help="assign NEW vectors under the frozen centroids")
    bv.add_argument("--auto-compact", type=int, default=0, metavar="N",
                    help="rewrite the store once N appends accreted "
                         "(one file per cell; see compact_store)")
    bv.add_argument("--master", default="local[8]")

    sv = sub.add_parser("search-vectors", help="query the IVF vector store")
    sv.add_argument("--index", required=True, help="store root")
    sv.add_argument("--embeddings", required=True,
                    help="parquet holding the query vector")
    sv.add_argument("--query-id", type=int, required=True,
                    help="id of the query vector inside --embeddings")
    sv.add_argument("--id-col", default="vec_id")
    sv.add_argument("--vec-col", default="embedding")
    sv.add_argument("--k", type=int, default=10)
    sv.add_argument("--nprobe", type=int, default=4)
    sv.add_argument("--master", default="local[8]")

    args = ap.parse_args(argv)

    if getattr(args, "auto_compact", 0) and not getattr(args, "append", False):
        # --auto-compact counts APPENDS; a fresh build has none and the
        # flag would be silently ignored — refuse ambiguous input.
        # Validated BEFORE get_spark(): bad CLI input should not pay
        # JVM/session startup just to exit (ADVICE r13).
        ap.error("--auto-compact requires --append")

    from tube_spark.session import get_spark

    spark = get_spark(
        "tube_spark-index",
        master=args.master,
        extra_conf={"spark.ui.enabled": "false"},
    )

    if args.cmd == "build":
        from tube_spark.operators.searchindex import (
            append_text_index,
            build_text_index,
        )

        docs = spark.read.parquet(args.docs)
        if args.append:
            m = append_text_index(
                docs, args.index, args.id_col, args.text_col,
                auto_compact_at=args.auto_compact or None,
            )
        else:
            m = build_text_index(
                docs, args.index, args.id_col, args.text_col, args.n_buckets
            )
        print(json.dumps({"action": "append" if args.append else "build",
                          "index": args.index, "manifest": m}))
        return 0

    if args.cmd == "compact":
        from tube_spark.operators.searchindex import compact_text_index

        m = compact_text_index(spark, args.index, cleanup=not args.keep_old)
        print(json.dumps({"action": "compact", "index": args.index,
                          "manifest": m}))
        return 0

    from pyspark.sql import functions as F

    if args.cmd == "build-vectors":
        from tube_spark.operators.vectorstore import (
            append_vectors,
            build_ivf_store,
            cell_stats,
        )

        emb = spark.read.parquet(args.embeddings).select(
            F.col(args.id_col),
            F.transform(args.vec_col, lambda x: x.cast("double")).alias(
                args.vec_col
            ),
        )
        if args.append:
            append_vectors(
                emb, args.index, args.id_col, args.vec_col,
                auto_compact_at=args.auto_compact or None,
            )
        else:
            build_ivf_store(
                emb, args.index, args.id_col, args.vec_col, args.n_clusters
            )
        stats = {
            int(r["cell"]): r["count"]
            for r in cell_stats(spark, args.index).collect()
        }
        print(json.dumps({
            "action": "append" if args.append else "build",
            "index": args.index,
            "n_vectors": sum(stats.values()),
            "n_cells": len(stats),
        }))
        return 0

    if args.cmd == "search-vectors":
        from tube_spark.operators.vectorstore import search_store

        emb = spark.read.parquet(args.embeddings).select(
            F.col(args.id_col),
            F.transform(args.vec_col, lambda x: x.cast("double")).alias(
                args.vec_col
            ),
        )
        q = emb.filter(F.col(args.id_col) == args.query_id)
        if q.isEmpty():
            print(json.dumps({"error": f"query id {args.query_id} not found"}))
            return 2
        hits = [
            {"neighbor_id": r["neighbor_id"], "rank": r["rank"],
             "cosine": r["cosine"]}
            for r in search_store(
                spark, args.index, q, args.id_col, args.vec_col,
                k=args.k, nprobe=args.nprobe,
            ).orderBy("rank").collect()
        ]
        print(json.dumps({"query_id": args.query_id, "hits": hits}))
        return 0

    from tube_spark.functions.text import tokens as tokens_expr

    from tube_spark.operators.searchindex import search_text_index

    terms = [
        r["t"]
        for r in spark.createDataFrame([(args.query,)], "q string")
        .select(F.explode(tokens_expr(F.col("q"))).alias("t"))
        .distinct()
        .collect()
    ]
    if not terms:
        print(json.dumps({"error": "query has no indexable terms"}))
        return 2
    hits = [
        {"doc_id": r["doc_id"], "bm25": r["bm25"],
         "n_matched_terms": r["n_matched_terms"]}
        for r in search_text_index(spark, args.index, terms, k=args.k).collect()
    ]
    print(json.dumps({"query_terms": sorted(terms), "hits": hits}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
