"""Explicit storage lifecycle for ``localCheckpoint``'d frames.

``DataFrame.localCheckpoint`` persists the frame's blocks in executor
storage (MEMORY_AND_DISK) and truncates lineage — the right tool for
iterative operators (connected components, BPE training) whose plans
would otherwise grow per round.  But Spark only releases those blocks
when the JVM-side RDD becomes unreachable and the ContextCleaner reaps
it, a chain that runs Python GC → py4j finalizer → driver JVM GC →
async cleaner.  On a long-lived session with a large driver heap the
JVM may not GC for hours, so an N-round iterative operator holds N
rounds of dead blocks instead of 1 — storage that squeezes execution
memory (same unified pool) and shows up as spills long before anything
"leaks" visibly.

``CheckpointRotor`` makes the release explicit and bounded: each round,
snapshot the persistent-RDD set before creating the new checkpoint,
``commit()`` once it is materialized, and the rotor unpersists the
PREVIOUS round's blocks (which the new round consumed and no longer
needs).  At any instant at most two rounds of blocks are live; the
final round's blocks survive for the caller's result frame.

Not thread-safe across concurrently-iterating operators on the same
session: attribution of "blocks created this round" is a set-diff of
the session-global persistent-RDD registry.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of every RDD currently holding storage blocks (cached or
    checkpointed) in this session."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(i) for i in jmap.keySet().toArray()}


def release_rdds(spark: SparkSession, ids: set[int]) -> int:
    """Unpersist (non-blocking) the given RDD ids; returns how many
    were still registered."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    for rid in ids:
        if jmap.containsKey(rid):
            jmap.get(rid).unpersist(False)
            n += 1
    return n


class CheckpointRotor:
    """Round-based release of iterative ``localCheckpoint`` storage.

    Usage per round::

        rotor.begin()
        df = build_next_round(prev_df).localCheckpoint(eager=False)
        materialize(df)          # any action covering all partitions
        rotor.commit()           # frees the PREVIOUS round's blocks

    ``commit`` must come after the new checkpoint is fully materialized:
    the previous round's blocks are its input.  Call ``release_all()``
    only if the final frame is also dead (e.g. the operator copied its
    result out of the checkpointed lineage).
    """

    def __init__(self, spark: SparkSession) -> None:
        self._spark = spark
        self._prev: set[int] = set()
        self._before: set[int] | None = None

    def begin(self) -> None:
        self._before = persistent_rdd_ids(self._spark)

    def commit(self) -> None:
        if self._before is None:
            raise RuntimeError("CheckpointRotor.commit() without begin()")
        mine = persistent_rdd_ids(self._spark) - self._before
        release_rdds(self._spark, self._prev)
        self._prev = mine
        self._before = None

    def release_all(self) -> None:
        release_rdds(self._spark, self._prev)
        self._prev = set()
        self._before = None
