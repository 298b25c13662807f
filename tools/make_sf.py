"""Scale the driver testdata up by integer replication for headroom runs.

``python tools/make_sf.py /root/testdata/sf0.1 /tmp/sf1 10`` writes a
10x copy of every table: fact tables (lineitem, orders, events,
documents, embeddings) and the scaling dimensions (customer, supplier,
part) are replicated with shifted keys so join fan-outs and group
cardinalities scale like real data; region/nation stay fixed (they are
fixed-size in TPC-H too).  Entirely executor-side — a cross join
against a replica-index frame, no driver materialization.

This exists because the driver's generator isn't in-repo; replication
preserves value distributions and key relationships, which is what the
scaling check needs (is any plan superlinear in data size?).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# key columns shifted per replica: table -> {col: stride-source-table}
_FACTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
_FIXED = ["region", "nation"]
# the stride for each key column comes from the table that OWNS the key,
# so foreign keys stay consistent across replicas
_KEY_OWNER = {
    "c_custkey": "customer", "o_custkey": "customer", "user_id": "customer",
    "s_suppkey": "supplier", "l_suppkey": "supplier",
    "p_partkey": "part", "l_partkey": "part",
    "o_orderkey": "orders", "l_orderkey": "orders",
    "event_id": "events",
    "doc_id": "documents",
    "vec_id": "embeddings",
}


def _stride(spark: SparkSession, src: str, table: str, cache: dict) -> int:
    if table not in cache:
        key = next(c for c, o in _KEY_OWNER.items() if o == table)
        m = (
            spark.read.parquet(f"{src}/{table}.parquet")
            .agg(F.max(key))
            .first()[0]
        )
        # next power of 10 above max id keeps replica ids readable
        s = 1
        while s <= m:
            s *= 10
        cache[table] = s
    return cache[table]


def replicate(
    spark: SparkSession, src: str, table: str, factor: int, strides: dict
) -> DataFrame:
    df = spark.read.parquet(f"{src}/{table}.parquet")
    reps = spark.range(factor).select(F.col("id").alias("_rep"))
    out = df.crossJoin(F.broadcast(reps))
    for col in _FACTS[table]:
        stride = _stride(spark, src, _KEY_OWNER[col], strides)
        out = out.withColumn(col, F.col(col) + F.col("_rep") * F.lit(stride))
    # replicas must NOT be near-duplicates of each other, or dedup /
    # similarity pair counts explode quadratically in the factor — a
    # data artifact that would masquerade as plan superlinearity.
    # Perturb content deterministically per replica:
    if table == "documents":
        # letter rotation changes most shingles -> cross-replica Jaccard
        # drops below any dedup threshold; within-replica structure intact
        alpha = "abcdefghijklmnopqrstuvwxyz"
        rotated = F.col("text")
        for r in range(1, factor):
            rot = alpha[r:] + alpha[:r]
            rotated = F.when(
                F.col("_rep") == r, F.translate(F.col("text"), alpha, rot)
            ).otherwise(rotated)
        out = out.withColumn("text", rotated)
    if table == "embeddings":
        # circular shift of the vector per replica preserves the norm but
        # decorrelates it from the original (random-vector rotations)
        dim = len(df.first()["embedding"])
        shifted = F.col("embedding")
        for r in range(1, factor):
            k = (r * 7) % dim or 1
            shifted = F.when(
                F.col("_rep") == r,
                F.concat(
                    F.slice("embedding", k + 1, dim - k),
                    F.slice("embedding", 1, k),
                ),
            ).otherwise(shifted)
        out = out.withColumn("embedding", shifted)
    return out.drop("_rep")


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tube_spark.session import get_spark

    spark = get_spark("make_sf", extra_conf={"spark.ui.enabled": "false"})
    os.makedirs(dst, exist_ok=True)
    strides: dict = {}
    for t in _FIXED:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
        print(f"copied {t}")
    for t in _FACTS:
        # write factor*4 part files (min 8): the broadcast cross-join
        # preserves the source's file count, so a 1-file source used to
        # yield a 1-file replica — every scan-bound sf1 bench then ran
        # its heavy stage on maxPartitionBytes splits of ONE file (2
        # tasks for documents), an artifact no production corpus has.
        # File count must scale with data or the harness measures the
        # artifact, not the plan.
        key = _FACTS[t][0]
        n_files = max(8, 4 * factor)
        replicate(spark, src, t, factor, strides).repartition(
            n_files, key
        ).write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        n = spark.read.parquet(f"{dst}/{t}.parquet").count()
        print(f"replicated {t} x{factor}: {n} rows, {n_files} files")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
