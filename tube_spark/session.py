"""SparkSession factory tuned for the engine.

Scale notes: these defaults are what we want on a real cluster reading
~100 TB — AQE on (runtime shuffle-partition coalescing + skew-join
splitting), broadcast joins enabled, Arrow for any Pandas-UDF path.
Locally tests override parallelism via ``local[N]``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for scale-out correctness; every one is overridable.
_DEFAULT_CONF = {
    # AQE: runtime coalescing of shuffle partitions, skew-join splitting,
    # and dynamic join-strategy switching. At 100 TB, static shuffle
    # partition counts are always wrong for at least one stage.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Let AQE re-plan the output partitioning of cached plans too —
    # otherwise a .cache() freezes whatever spark.sql.shuffle.partitions
    # was at materialization time and every downstream stage inherits it
    # (measured: minhash's cached signatures at partitions=200 cost 4x).
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    # Arrow transfer for the few Pandas-UDF operators (multimodal decode,
    # embedding kernels). Never row-at-a-time Python UDFs.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Broadcast small dimension tables (region/nation/dictionary maps).
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Read-side split sizing; 128 MB splits keep 100 TB ≈ 800k tasks,
    # which a 1000-executor cluster digests fine.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Don't let timestamps silently shift; testdata is timestamp[ms/ns].
    "spark.sql.session.timeZone": "UTC",
    # Parquet TIMESTAMP(NANOS) columns surface as long nanoseconds
    # instead of failing the scan (harmless for micro-precision data;
    # kept so a nanos-written events table still loads).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.shuffle.partitions": "64",
}


def get_spark(
    app_name: str = "tube_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster leave it unset and let spark-submit decide.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULT_CONF)
    if master.startswith("local"):
        # In local mode the driver JVM IS every executor; pyspark's 1 GiB
        # default heap is what 32 worker threads would otherwise share
        # (measured: GC-locker thrash and flaky shuffle OOMs at sf1).
        # -Xmx reserves address space, not RSS, so a generous ceiling is
        # safe.  On a real cluster master is non-local and this never
        # applies — executor/driver memory comes from spark-submit.
        conf.setdefault("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "24g"))
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
