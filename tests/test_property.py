"""Property-based differential tests: random graphs + aggregation specs
executed by the engine vs a pure-Python oracle.

The engine's hardest semantics are the partial/final merge rules of the
aggregation tree (count→sum-of-counts, set→flatten-distinct) over
arbitrary fan-out.  Hypothesis drives random two-level graphs through
them; the oracle is a direct dict-based computation.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tube_spark.config.mapping import parse_mapping
from tube_spark.dictionary import Dictionary, Link, NodeDef, PropType
from tube_spark.plans.translator import Aggregator
from tube_spark.sources.graph import DataFrameGraphSource


def _dictionary() -> Dictionary:
    return Dictionary(
        [
            NodeDef("root", {"tag": PropType("string")}),
            NodeDef("mid", {"m": PropType("integer")}),
            NodeDef("leaf", {"v": PropType("number"), "s": PropType("string")}),
        ],
        [
            Link("mid", "root", "mid_of_root"),
            Link("leaf", "mid", "leaf_of_mid"),
        ],
    )


graph_strategy = st.builds(
    dict,
    n_roots=st.integers(1, 4),
    mid_edges=st.lists(st.tuples(st.integers(0, 7), st.integers(0, 3)), max_size=12),
    leaf_edges=st.lists(st.tuples(st.integers(0, 14), st.integers(0, 7)), max_size=25),
    leaf_vals=st.lists(
        st.tuples(st.floats(-100, 100, allow_nan=False), st.sampled_from("abcde")),
        min_size=15,
        max_size=15,
    ),
)


@pytest.fixture(scope="module")
def prop_spark(spark):
    return spark


@given(g=graph_strategy)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_agg_tree_matches_python_oracle(prop_spark, g):
    spark = prop_spark
    n_roots = g["n_roots"]
    mids = sorted({m for m, _ in g["mid_edges"]})
    mid_edges = sorted({(m, r % n_roots) for m, r in g["mid_edges"]})
    leaf_edges = sorted(
        {(l, m % (len(mids) or 1)) for l, m in g["leaf_edges"] if mids}
    )
    leaves = sorted({l for l, _ in g["leaf_edges"]})
    leaf_vals = {l: g["leaf_vals"][l] for l in leaves}

    d = _dictionary()
    nodes = {
        "root": spark.createDataFrame(
            [(f"r{i}", f"t{i}") for i in range(n_roots)], "_root_id string, tag string"
        ),
        "mid": spark.createDataFrame(
            [(f"m{m}", m) for m in mids] or [("m_unused", 0)],
            "_mid_id string, m bigint",
        ),
        "leaf": spark.createDataFrame(
            [(f"l{l}", leaf_vals[l][0], leaf_vals[l][1]) for l in leaves]
            or [("l_unused", 0.0, "a")],
            "_leaf_id string, v double, s string",
        ),
    }
    edges = {
        ("mid", "root"): spark.createDataFrame(
            [(f"m{m}", f"r{r}") for m, r in mid_edges] or [("m_none", "r_none")],
            "_mid_id string, _root_id string",
        ),
        ("leaf", "mid"): spark.createDataFrame(
            [(f"l{l}", f"m{mids[mi]}") for l, mi in leaf_edges] or [("l_none", "m_none")],
            "_leaf_id string, _mid_id string",
        ),
    }
    src = DataFrameGraphSource(d, nodes, edges)
    mapping = parse_mapping(
        {
            "name": "p", "doc_type": "root", "type": "aggregator", "root": "root",
            "props": [{"name": "tag"}],
            "aggregated_props": [
                {"name": "n_leaves", "path": "mids.leafs", "fn": "count"},
                {"name": "sum_v", "src": "v", "path": "mids.leafs", "fn": "sum"},
                {"name": "max_v", "src": "v", "path": "mids.leafs", "fn": "max"},
                {"name": "set_s", "src": "s", "path": "mids.leafs", "fn": "set"},
                {"name": "n_mids", "path": "mids", "fn": "count"},
            ],
        }
    )
    got = {r["_root_id"]: r.asDict() for r in Aggregator(src, mapping).translate().collect()}

    # python oracle
    mid_to_root = {}
    for m, r in mid_edges:
        mid_to_root.setdefault(m, set()).add(r)
    for i in range(n_roots):
        rid = f"r{i}"
        exp_leaves = [
            l
            for l, mi in leaf_edges
            if i in mid_to_root.get(mids[mi], set())
        ]
        row = got[rid]
        assert row["n_leaves"] == len(exp_leaves)
        assert row["n_mids"] == sum(1 for m, r in mid_edges if r == i)
        if exp_leaves:
            assert math.isclose(row["sum_v"], sum(leaf_vals[l][0] for l in exp_leaves),
                                rel_tol=1e-9, abs_tol=1e-9)
            assert row["max_v"] == max(leaf_vals[l][0] for l in exp_leaves)
            assert row["set_s"] == sorted({leaf_vals[l][1] for l in exp_leaves})
        else:
            assert row["sum_v"] is None and row["max_v"] is None
            assert row["set_s"] in (None, [])
