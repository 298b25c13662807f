"""Aggregation-fn expression builder.

The mapping language's ``fn`` ∈ {count,sum,min,max,set,list,first} (+ engine
extension ``sorted_list``)
(reference docs/configuration_file.md:224-231) compiles to native
Catalyst aggregate expressions — no Python UDFs anywhere (the reference
used flatten/concat UDFs, ``base/lambdas.py:339-350``; we use
``F.flatten`` / ``F.array_distinct`` which stay inside whole-stage
codegen).

Two modes per fn, mirroring the reference's partial/final ("merging")
semantics (``base/translator.py:273-306``):

* ``agg_expr``   — first aggregation over raw child values.
* ``merge_expr`` — re-aggregation of already-aggregated values while
  rolling up a path tree: a ``count`` of counts is a ``sum``; ``set`` /
  ``list`` of arrays flatten (set additionally distinct-ifies).

Deliberate divergence: the reference's ``fn: max`` computes **min**
(bug, ``base/translator.py:303-304``); we compute a real max.

All partial aggregations here benefit from map-side combine: Spark
plans ``partial_count/sum/min/max`` and ``partial collect_*`` before
the shuffle, so rolling up a 100 TB child table moves only one row per
(parent, agg) across the wire.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def agg_expr(fn: str, src: Column, is_array_input: bool = False) -> Column:
    """Aggregate raw values of ``src`` with mapping-fn semantics.

    ``is_array_input`` marks an array-typed source prop, for which
    ``set``/``list`` union the element sets rather than nesting arrays
    (reference ``base/translator.py:283-300``).
    """
    if fn == "count":
        # count of non-null child values (count of rows when src is the id)
        return F.count(src)
    if fn == "sum":
        return F.sum(src)
    if fn == "min":
        return F.min(src)
    if fn == "max":
        return F.max(src)
    if fn == "first":
        # Deterministic variant of the reference's unordered `first`:
        # min over the natural ordering (documented divergence; the
        # reference's F.first is partition-order-dependent).
        return F.min(src)
    if fn == "set":
        if is_array_input:
            return F.array_distinct(F.flatten(F.collect_list(src)))
        return F.sort_array(F.collect_set(src))
    if fn == "list":
        if is_array_input:
            return F.flatten(F.collect_list(src))
        return F.collect_list(src)
    if fn == "sorted_list":
        # Engine extension: `list` with a deterministic (sorted) order.
        # The reference's fn: list is partition-order-dependent, which
        # makes documents unstable across runs; sorted_list trades the
        # original insertion order for reproducibility at zero extra
        # shuffle cost (sort_array runs post-aggregation, per group).
        if is_array_input:
            return F.sort_array(F.flatten(F.collect_list(src)))
        return F.sort_array(F.collect_list(src))
    raise ValueError(f"unknown aggregation fn {fn!r}")


def merge_expr(fn: str, src: Column) -> Column:
    """Re-aggregate already-aggregated values one level up the path tree."""
    if fn == "count":
        return F.sum(src)  # sum of child counts
    if fn == "sum":
        return F.sum(src)
    if fn == "min":
        return F.min(src)
    if fn == "max":
        return F.max(src)
    if fn == "first":
        return F.min(src)
    if fn == "set":
        return F.sort_array(F.array_distinct(F.flatten(F.collect_list(src))))
    if fn == "list":
        return F.flatten(F.collect_list(src))
    if fn == "sorted_list":
        return F.sort_array(F.flatten(F.collect_list(src)))
    raise ValueError(f"unknown aggregation fn {fn!r}")


def zero_value(fn: str) -> Column | None:
    """Fill value for roots with no children on the path.

    count → 0 (a participant with no samples has `_samples_count = 0`,
    not null); other fns stay null/empty.
    """
    if fn == "count":
        return F.lit(0)
    return None
