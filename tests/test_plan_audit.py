"""Registry-wide physical-plan audit: NO query may plan a scale-killer.

Sweeps every `queries()` + `extra_queries()` entry at sf0.001 and
asserts the executed plan contains:

* no ``BatchEvalPython`` — row-at-a-time Python UDFs are banned
  everywhere, including the similarity/multimodal paths (those must use
  Arrow: ``ArrowEvalPython`` / ``MapInPandas``);
* no ``CartesianProduct`` — an unbroadcast cross join is never the
  plan we want;
* Arrow Python stages (``ArrowEvalPython`` / ``MapInPandas`` /
  ``FlatMapGroupsInPandas``) only in queries declared to use them —
  the relational path stays whole-stage-codegen JVM;
* ``BroadcastNestedLoopJoin`` only where the build side is a
  one-row/tiny aggregate by construction (declared below).

Individual operator tests pin positive properties (pushdown, broadcast,
no-exchange bucketing); this is the negative sweep that keeps future
queries from regressing the global invariants.
"""

from __future__ import annotations

import importlib.util

import pytest

SF_DIR = "/root/testdata/sf0.001"

# queries whose plans legitimately contain Arrow Python stages
ARROW_OK = {
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_cosine_topk",
    "ann_recall_report",
    "embedding_near_dup",
    "embedding_near_dup_scale",  # same Arrow cosine kernel as embedding_near_dup
    "embedding_near_dup_exact",
    "semantic_dedup",
    "sequence_packing",
    "multimodal_decode",
    "bpe_tokenize",
    "sessionization",
    "hybrid_retrieval",
    "heavy_hitters",  # Misra-Gries summaries run as MapInPandas
    "ann_lsh_topk_portable",  # Arrow signature kernel, like ann_lsh_topk
    "hard_negatives",  # rides cosine_topk's Arrow cosine kernel
}

# queries where a BroadcastNestedLoopJoin is the intended plan: the
# build side is a single-row (or k-row, k tiny) aggregate broadcast
# against the stream side — the standard scalar-subquery-join shape
BNLJ_OK = {
    "promo_revenue_share",
    "small_qty_revenue",
    "forecast_revenue",
    "top_supplier",
    "market_share",
    "ann_cosine_topk",
    "ann_recall_report",
    "embedding_near_dup_exact",
    "bm25_search",
    "hybrid_retrieval",
    "lm_score",
    "decontamination",
    "data_mixture",
    "curation_report",
    "corpus_curation",
    "sketch_report",
    "sketch_rollup",
    "stats_summary",
    "event_funnel",
    "dataset_splits",
    "excess_quantity_suppliers",
    "idle_high_balance_customers",
    "important_nation_volume",
    "cheapest_supplier",
    "heavy_hitters",  # one-row corpus-total broadcast for the share division
    "hard_negatives",  # cosine_topk's broadcast-queries shape
    "cluster_terms",  # one-row avg-tokens-per-cluster broadcast
    "psi_drift",  # one-row histogram-totals broadcast
}

# queries that execute driver-side work or streams when *built* — they
# are audited by their own operator tests; planning them here would
# re-run training loops / streaming queries for no added signal
SKIP = {
    "streaming_events_window",
    "bpe_tokenize",
    "pagerank",  # iterative: building the frame runs the training loop
    "entity_resolution",  # iterative: CC convergence loop runs on build
}


def _entry():
    spec = importlib.util.spec_from_file_location("entry_mod", "__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


_M = _entry()
_ALL = {**_M.queries(), **_M.extra_queries()}


@pytest.mark.parametrize("name", sorted(n for n in _ALL if n not in SKIP))
def test_plan_has_no_scale_killers(spark, name):
    df = _ALL[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()

    assert "BatchEvalPython" not in plan, f"{name}: row-wise Python UDF\n{plan[:1500]}"
    assert "CartesianProduct" not in plan, f"{name}: cartesian product\n{plan[:1500]}"

    arrow = any(
        tok in plan
        for tok in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
    )
    if arrow:
        assert name in ARROW_OK, f"{name}: undeclared Arrow Python stage\n{plan[:1500]}"

    if "BroadcastNestedLoopJoin" in plan:
        assert name in BNLJ_OK, f"{name}: undeclared BNLJ\n{plan[:1500]}"
