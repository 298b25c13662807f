"""The ``_scan_floor`` partition-count memo (r15 optimization).

``df.rdd.getNumPartitions()`` materializes a Python RDD handle —
~0.14 s of driver work per call on local[32] — and the scan's
partition count is plan METADATA, fixed for an immutable input within
one session (the same contract as pqread's schema cache).  The memo
probes once per (session, path) and replays thereafter; the floor
decision, the physical plan, and every computed value are identical
either way.
"""

from __future__ import annotations

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"
DOCS = f"{SF_DIR}/documents.parquet"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_probe_memoized_and_floor_fires(spark):
    E._NPART_CACHE.clear()
    d = E._docs(spark, SF_DIR)
    key = (spark.sparkContext.applicationId, DOCS)
    # testdata is a single-row-group file: one scan partition, memoized
    assert E._NPART_CACHE.get(key) == 1
    # local[4] > 1 partition: the parallelism floor must fire
    assert "REPARTITION_BY_NUM" in _plan(d)


def test_memo_is_consulted_on_later_constructions(spark):
    E._NPART_CACHE.clear()
    E._docs(spark, SF_DIR)
    key = (spark.sparkContext.applicationId, DOCS)
    # poison the memo with "already parallel": if the second
    # construction consulted the probe instead of the memo, the floor
    # would fire — its absence proves the replay path
    E._NPART_CACHE[key] = 9999
    d2 = E._docs(spark, SF_DIR)
    assert "REPARTITION_BY_NUM" not in _plan(d2)
    E._NPART_CACHE.clear()


def test_floor_decision_and_rows_unchanged(spark):
    E._NPART_CACHE.clear()
    first = E._docs(spark, SF_DIR)
    second = E._docs(spark, SF_DIR)  # memo hit
    assert _plan(first).replace("#", "") .split("Exchange")[0] != ""  # smoke
    assert first.count() == second.count()
    E._NPART_CACHE.clear()
