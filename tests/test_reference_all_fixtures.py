"""Smoke-interop: every mapping in every reference fixture set compiles
and executes through the engine on the fixture's own data + dictionary.

Assertions are structural (doc count matches root/category cardinality
where computable); the deep differential checks live in the parent and
midrc interop tests.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

BASE = "/root/reference/tests/dataframe_tests/test_data"
FIXTURES = [p for p in ("parent", "ibdgc", "midrc", "jcoin") if os.path.isdir(f"{BASE}/{p}")]

pytestmark = pytest.mark.skipif(
    not FIXTURES, reason="reference fixture checkout not available"
)


def _count_rows(graph_dir: str, label: str) -> int | None:
    for name in (f"node_{label}", f"node_{label.replace('_', '')}"):
        d = os.path.join(graph_dir, name)
        if os.path.isdir(d):
            return sum(
                sum(1 for line in open(f) if line.strip())
                for f in glob.glob(f"{d}/part-m-*")
            )
    return None


@pytest.mark.parametrize("fixture", FIXTURES)
def test_fixture_mappings_run(spark, fixture):
    import yaml

    from tube_spark.config.mapping import parse_mappings_yaml
    from tube_spark.dictionary import dictionary_from_json_schemas
    from tube_spark.plans.translator import build_translator
    from tube_spark.sources.graph import PropsJsonGraphSource

    root_dir = f"{BASE}/{fixture}"
    with open(f"{root_dir}/schema.json") as f:
        dictionary = dictionary_from_json_schemas(json.load(f))
    source = PropsJsonGraphSource(spark, f"{root_dir}/graphs", dictionary, fmt="csv")
    with open(f"{root_dir}/etlMapping.yaml") as f:
        mappings = parse_mappings_yaml(f.read())
    assert mappings

    failures = []
    for m in mappings:
        try:
            df = build_translator(source, m).translate()
            n = df.count()
        except Exception as e:  # noqa: BLE001 — we report all failures at once
            failures.append(f"{fixture}/{m.name}: {type(e).__name__}: {e}")
            continue
        if m.type == "aggregator":
            expected = _count_rows(f"{root_dir}/graphs", m.root)
            if expected is not None and n != expected:
                failures.append(
                    f"{fixture}/{m.name}: {n} docs != {expected} root rows"
                )
    assert not failures, "\n".join(failures)
