"""Interleaved A/B for the link_prediction pin (variance-controlled:
alternating arms in one session, so host drift hits both equally)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tube_spark.session import get_spark
from tube_spark.operators.linkpred import link_prediction
from tube_spark.operators.triangles import cooccurrence_edges


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("ab-linkpred", extra_conf={"spark.ui.enabled": "false"})
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    def run(pin: bool) -> float:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
            F.col("l_orderkey") % 4 == 0
        )
        edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", max_group=10)
        t0 = time.time()
        df = link_prediction(edges, k=100, max_degree=15, pin=pin)
        n = df.count()
        return time.time() - t0, n

    # warm both arms once (uncounted)
    run(False)
    run(True)
    a, b = [], []
    rows = set()
    for i in range(reps):
        ta, na = run(False)
        tb, nb = run(True)
        rows.update([na, nb])
        a.append(ta)
        b.append(tb)
        print(f"rep {i}: unpinned {ta:.2f}s  pinned {tb:.2f}s", flush=True)
    print(f"rows seen: {rows}")
    print(f"unpinned min {min(a):.2f} med {sorted(a)[len(a)//2]:.2f}")
    print(f"pinned   min {min(b):.2f} med {sorted(b)[len(b)//2]:.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
