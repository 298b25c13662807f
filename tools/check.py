"""Local correctness harness mimicking the driver's differential check.

Runs every ``queries()`` entry at a given scale factor, runs its
``oracle_sql()`` twin in DuckDB over the same parquet tables, and
compares row count, column names, and an order-insensitive value hash
(floats rounded).  Usage::

    python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import sys
import time

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, 6):.6f}"
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm(v[k])}" for k in sorted(v)) + "}"
    if hasattr(v, "asDict"):  # Row
        d = v.asDict()
        return "{" + ",".join(f"{k}:{_norm(d[k])}" for k in sorted(d)) + "}"
    return repr(v)


def value_hash(rows: list[dict]) -> str:
    lines = sorted(
        "|".join(_norm(r[k]) for k in sorted(r)) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    from __spark_entry__ import extra_oracle_sql, extra_queries, oracle_sql, queries
    from tube_spark.session import get_spark

    use_extras = "--extras" in only
    only.discard("--extras")

    spark = get_spark(master="local[16]", extra_conf={"spark.ui.enabled": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    if use_extras:
        qs, oracles = extra_queries(), extra_oracle_sql()
    else:
        qs, oracles = queries(), oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            # The driver's canonicalizer pandas-sort_values every column;
            # ndarray/dict cells raise `unhashable type` and score the query
            # as err.  Reject complex output types here so local green
            # implies driver green.
            complex_cols = [
                f.name
                for f in sdf.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            if complex_cols:
                print(
                    f"FAIL  {name}: complex output column(s) {complex_cols} "
                    "would break the driver canonicalizer — serialize with "
                    "array_join/to_json"
                )
                failures += 1
                continue
            srows = [r.asDict(recursive=True) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        took = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"rows  {name}: {len(srows)} rows ({took:.1f}s) [no oracle]")
            continue
        try:
            # Single execution via the relation API: column types come
            # from bind-time metadata, rows from one fetchall().
            # Driver-fidelity dtype probe: the driver fetches via .df(),
            # where HUGEINT renders float64 and breaks the value hash
            # even though fetchall() yields Python ints and passes
            # (tests/test_oracle_dtypes.py pins the class).  The lossy
            # "float dtype without NaNs" .df() signature is replaced by
            # reading the DuckDB logical type directly: an integral
            # Spark column whose oracle type is HUGEINT is the drift.
            rel = con.sql(sql)
            cols = list(rel.columns)
            otypes = dict(zip(cols, (str(t) for t in rel.types)))
            orows = [dict(zip(cols, row)) for row in rel.fetchall()]
            integral = {
                f.name
                for f in sdf.schema.fields
                if f.dataType.typeName() in ("byte", "short", "integer", "long")
            }
            drift = [
                c
                for c in cols
                if c in integral and otypes[c] in ("HUGEINT", "UHUGEINT")
            ]
            if drift:
                print(
                    f"FAIL  {name}: oracle dtype drift (driver .df() floats "
                    f"integral column(s) {drift} — add ::BIGINT)"
                )
                failures += 1
                continue
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        s_cols, o_cols = sorted(srows[0]) if srows else [], sorted(orows[0]) if orows else []
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if srows and orows and s_cols != o_cols:
            problems.append(f"columns {s_cols} vs {o_cols}")
        if not problems:
            hs, ho = value_hash(srows), value_hash(orows)
            if hs != ho:
                problems.append(f"value-hash {hs} vs {ho}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} ({took:.1f}s)")
            if srows and orows:
                sset = {"|".join(_norm(r[k]) for k in sorted(r)) for r in srows}
                oset = {"|".join(_norm(r[k]) for k in sorted(r)) for r in orows}
                for d in sorted(sset - oset)[:3]:
                    print(f"        spark-only: {d[:200]}")
                for d in sorted(oset - sset)[:3]:
                    print(f"        oracle-only: {d[:200]}")
            failures += 1
        else:
            print(f"ok    {name}: {len(srows)} rows match ({took:.1f}s)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
