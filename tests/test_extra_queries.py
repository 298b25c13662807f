"""Differential verification of the extras tier.

The extras tier (``_EXTRA_QUERY_NAMES`` — the test below sizes itself
from it) holds every oracled query currently outside the driver's
50-row correctness window: redundant TPC-H / window plan shapes,
queries rotated out after earning a green driver row, and new
operators queued for a future rotation.  They remain full queries with
DuckDB oracles; this test runs the same rows+columns+value-hash
comparison the driver runs, at sf0.001, so "outside the window" still
means "verified".
"""

from __future__ import annotations

import importlib.util
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
from tools.check import value_hash  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _entry():
    spec = importlib.util.spec_from_file_location("entry_mod", "__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


_M = _entry()


@pytest.mark.parametrize("name", sorted(_M.extra_queries()))
def test_extra_query_matches_oracle(spark, duck, name):
    fn = _M.extra_queries()[name]
    sql = _M.extra_oracle_sql()[name]

    sdf = fn(spark, SF_DIR)
    srows = [r.asDict(recursive=True) for r in sdf.collect()]

    cur = duck.execute(sql)
    cols = [d[0] for d in cur.description]
    orows = [dict(zip(cols, row)) for row in cur.fetchall()]

    assert len(srows) == len(orows), f"rowcount {len(srows)} vs {len(orows)}"
    if srows:
        assert sorted(srows[0]) == sorted(orows[0])
    assert value_hash(srows) == value_hash(orows)
