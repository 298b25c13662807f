"""Search-index entry point — build and query the persistent retrieval
stores from the command line (the serving-side sibling of
``tube_spark.curate``, which produces the corpora these index).

Build (or append to) the term-partitioned BM25 text index:

    python -m tube_spark.index build \
        --docs /data/corpus.parquet --index /data/text_idx \
        [--n-buckets 64] [--append] [--master local[8]]

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

Prints one JSON line: the manifest (build) or the ranked hits
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
    b.add_argument("--master", default="local[8]")

    s = sub.add_parser("search", help="query the text index")
    s.add_argument("--index", required=True, help="index root")
    s.add_argument("--query", required=True, help="free-text query")
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--master", default="local[8]")

    args = ap.parse_args(argv)

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
            m = append_text_index(docs, args.index, args.id_col, args.text_col)
        else:
            m = build_text_index(
                docs, args.index, args.id_col, args.text_col, args.n_buckets
            )
        print(json.dumps({"action": "append" if args.append else "build",
                          "index": args.index, "manifest": m}))
        return 0

    from tube_spark.functions.text import tokens as tokens_expr
    from pyspark.sql import functions as F

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
