"""Every registered query must have a row in PLAN_REPORT.md.

Stale plan evidence is how an unaudited plan ships (VERDICT r5 #6:
the report predated embedding_near_dup_scale and silently lacked it).
This pins report coverage to the registry; regenerate with
``python tools/plan_report.py`` after adding a query.
"""

from __future__ import annotations

import importlib.util
import re

# mirrors tools/plan_report.py: iterative/streaming builders are
# audited by their own operator tests, not planned in the report
SKIP = {
    "streaming_events_window",
    "bpe_tokenize",
    "pagerank",
    "entity_resolution",
}


def test_plan_report_covers_registry():
    spec = importlib.util.spec_from_file_location("entry_mod", "__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    registered = (set(m.queries()) | set(m.extra_queries())) - SKIP

    with open("PLAN_REPORT.md") as f:
        text = f.read()
    reported = set(re.findall(r"^\| (\w+) \|", text, re.MULTILINE)) - {"query"}

    missing = sorted(registered - reported)
    assert not missing, (
        f"queries missing from PLAN_REPORT.md: {missing} — "
        "run `python tools/plan_report.py`"
    )
    stale = sorted(reported - registered)
    assert not stale, (
        f"PLAN_REPORT.md rows for unregistered queries: {stale} — "
        "run `python tools/plan_report.py`"
    )
    assert "ERROR" not in text, "PLAN_REPORT.md contains error rows"
