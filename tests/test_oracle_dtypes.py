"""Oracle-dtype contract: no DuckDB HUGEINT may reach the driver.

Three rounds in a row an oracle broke the driver's value hash the same
way (``returnflag_priority`` r3; ``dataset_splits`` and
``sequence_packing`` r4): DuckDB ``sum()`` over integers returns
HUGEINT, pandas maps HUGEINT to float64, and the driver canonicalizer
hashes ``3.000000`` against Spark's ``3``.  The repo's contract is that
every such aggregate carries ``::BIGINT`` — this test pins the whole
class by executing every oracle (windowed + extras) through the same
``duckdb ... .df()`` path the driver uses and asserting that wherever
the Spark twin's schema is integral, the pandas column is an integer
dtype (never float64, never object).

The Spark side is schema-only (``fn(spark, sf_dir).schema`` — plan
analysis, no job), so the test stays cheap; the DuckDB side must
actually execute, at sf0.001.
"""

from __future__ import annotations

import importlib.util
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

INTEGRAL_SPARK = {"byte", "short", "integer", "long"}


def _entry():
    spec = importlib.util.spec_from_file_location("entry_mod", "__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


_M = _entry()
_WINDOWED = _M.oracle_sql()
_EXTRAS = _M.extra_oracle_sql()
_ALL_ORACLES = {**_WINDOWED, **_EXTRAS}


def _query_fn(name):
    if name in _M.queries():
        return _M.queries()[name]
    return _M.extra_queries()[name]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_ALL_ORACLES))
def test_oracle_integral_columns_stay_integral(spark, duck, name):
    spark_schema = _query_fn(name)(spark, SF_DIR).schema
    spark_types = {f.name: f.dataType.typeName() for f in spark_schema.fields}

    pdf = duck.execute(_ALL_ORACLES[name]).df()

    assert sorted(pdf.columns) == sorted(spark_types), (
        f"{name}: oracle columns {sorted(pdf.columns)} != "
        f"spark columns {sorted(spark_types)}"
    )
    bad = []
    for col in pdf.columns:
        kind = pdf[col].dtype.kind
        st = spark_types[col]
        if st in INTEGRAL_SPARK and kind not in "iu":
            # A NULL-bearing integer column legitimately becomes float64
            # (and does so SYMMETRICALLY — Spark toPandas floats it too,
            # so the driver hash still matches; scd2_history/time_rollup
            # were driver-green in r4 exactly this way).  float64 with
            # ZERO NaNs is the HUGEINT signature: the DuckDB side floats
            # while the Spark side stays integral, and the hash breaks.
            if kind == "f" and bool(pdf[col].isna().any()):
                continue
            bad.append(f"{col}: spark={st} but duckdb.df() dtype={pdf[col].dtype}")
        if st in ("double", "float", "decimal") and kind == "O":
            bad.append(f"{col}: spark={st} but duckdb.df() dtype=object")
    assert not bad, (
        f"{name}: oracle dtype drift (HUGEINT/DECIMAL missing an explicit "
        f"cast — the driver will hash-mismatch): {bad}"
    )
