"""Structural profile of one registered query: Spark jobs, stages,
shuffle bytes — parsed from the event log of a single isolated run.

Where bench.py answers "how long", this answers "where does it go"
(guide §1/§7): per-job wall time, per-stage task count, shuffle
read/write and input bytes, so shuffle-count/byte claims in
OPTIMIZATION notes are measured, not inferred from explain() (which
for iterative operators only shows the LAST round's truncated plan).

Usage::

    python tools/profile_query.py SF_DIR QUERY [QUERY ...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]

    from __spark_entry__ import extra_queries, queries
    from tube_spark.session import get_spark

    evdir = tempfile.mkdtemp(prefix="spark-ev-")
    spark = get_spark(
        "tube_spark-profile",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    qs = {**queries(), **extra_queries()}
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    marks: list[tuple[str, float, float]] = []
    for name in names:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        t1 = time.time()
        marks.append((name, t0 * 1000, t1 * 1000))
        print(f"# {name}: {n} rows in {t1 - t0:.2f}s", file=sys.stderr)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # Spark 4 event-log v2: a directory holding events_* part files
    paths = []
    for f in sorted(os.listdir(evdir)):
        full = os.path.join(evdir, f)
        if os.path.isdir(full) and app_id in f:
            paths = [
                os.path.join(full, p)
                for p in sorted(os.listdir(full))
                if p.startswith("events")
            ]
        elif app_id in f:
            paths = [full]
    if not paths:
        raise FileNotFoundError(f"no event log for {app_id} in {evdir}")
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    lines = []
    for path in paths:
        with open(path) as fh:
            lines.extend(fh)
    if True:
        for line in lines:
            ev = json.loads(line)
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "start": ev["Submission Time"],
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    ),
                }
            elif et == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
            elif et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                acc = {
                    a["Name"]: a.get("Value", 0)
                    for a in si.get("Accumulables", [])
                }

                def num(key):
                    v = acc.get(key, 0)
                    try:
                        return int(v)
                    except (TypeError, ValueError):
                        return 0

                scopes = []
                for ri in si.get("RDD Info", []):
                    sc = ri.get("Scope")
                    if sc:
                        try:
                            nm = json.loads(sc).get("name", "")
                        except (ValueError, AttributeError):
                            nm = ""
                        if nm and nm not in scopes:
                            scopes.append(nm)
                stages[si["Stage ID"]] = {
                    "scopes": ",".join(reversed(scopes))[:90],
                    "name": si.get("Stage Name", si.get("Name", "?")).split("\n")[0][:60],
                    "tasks": si["Number of Tasks"],
                    "in_mb": num("internal.metrics.input.bytesRead") / 1e6,
                    "sr_mb": (
                        num(
                            "internal.metrics.shuffle.read.localBytesRead"
                        )
                        + num(
                            "internal.metrics.shuffle.read.remoteBytesRead"
                        )
                    )
                    / 1e6,
                    "sw_mb": num(
                        "internal.metrics.shuffle.write.bytesWritten"
                    )
                    / 1e6,
                    "ms": (
                        si.get("Completion Time", 0)
                        - si.get("Submission Time", 0)
                    ),
                }

    for name, t0, t1 in marks:
        print(f"\n== {name} ==")
        njobs = 0
        for jid in sorted(jobs):
            j = jobs[jid]
            if not (t0 <= j["start"] <= t1):
                continue
            njobs += 1
            dur = (j.get("end", j["start"]) - j["start"]) / 1000.0
            ran = [s for s in j["stages"] if s in stages]
            print(f"job {jid} {dur:6.2f}s  stages_declared={len(j['stages'])} ran={len(ran)}")
            for sid in sorted(ran):
                s = stages[sid]
                print(
                    f"   stage {sid:4d} {s['ms']/1000:6.2f}s tasks={s['tasks']:4d}"
                    f" in={s['in_mb']:8.2f}MB sread={s['sr_mb']:8.2f}MB"
                    f" swrite={s['sw_mb']:8.2f}MB  {s['scopes'] or s['name']}"
                )
        print(f"total jobs: {njobs}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
