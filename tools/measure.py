"""Per-query measurement harness for optimization rounds.

Times individual registered queries with EXACTLY the bench.py
methodology (same session factory, same warm-up, best-of-3 ``count()``)
so before/after numbers are comparable to BENCH_SELF records, and
optionally dumps ``explain("formatted")`` per query for the committed
plan evidence (plans/r<N>/<query>_{before,after}.txt).

Usage::

    python tools/measure.py SF_DIR QUERY [QUERY ...] [--runs N]
        [--plans DIR] [--suffix before|after] [--noop]

``--noop`` times ``df.write.format("noop")`` instead of ``count()``
(guide §1.4) — count() can prune columns, so noop is the honest signal
when a change touches projected-but-uncounted work; bench.py keeps
count() for round-over-round comparability, and this flag exists to
check the two agree in shape.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dir for explain output")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--noop", action="store_true")
    args = ap.parse_args()

    from __spark_entry__ import extra_queries, queries
    from tube_spark.session import get_spark
    import bench

    la = bench._settle()  # same loaded-machine discipline as bench.py
    print(f"# loadavg at start: {la}", file=sys.stderr)
    spark = get_spark(
        "tube_spark-measure", extra_conf={"spark.ui.enabled": "false"}
    )
    qs = {**queries(), **extra_queries()}
    # bench.py warm-up: JVM + parquet footer + Arrow worker pool
    spark.read.parquet(f"{args.sf_dir}/region.parquet").count()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    timings: dict[str, float] = {}
    for name in args.names:
        fn = qs[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, args.sf_dir)
            with open(
                os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                ))
        if args.runs == 0:
            print(f"# {name}: plan captured", file=sys.stderr)
            continue
        best, n = float("inf"), 0
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"measure:{name}")
            t0 = time.time()
            df = fn(spark, args.sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df.count()
            best = min(best, time.time() - t0)
            spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)
        # same per-query storage isolation as bench.py (r15): drop the
        # finished query's cached/checkpointed blocks so a multi-query
        # invocation measures each query on a clean store
        from tube_spark.plans.lifecycle import persistent_rdd_ids, release_rdds

        spark.catalog.clearCache()
        release_rdds(spark, persistent_rdd_ids(spark))
    print(json.dumps(timings))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
