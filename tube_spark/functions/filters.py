"""Filter DSL → Catalyst ``Column`` predicate.

Same grammar as the reference (``tube/etl/indexers/base/logic.py``):
leaves ``{op, prop, value}`` with op ∈ {=, ==, !=, >, >=, <, <=, in,
contains}; compounds ``{op: and|or, logics: [...]}``.

The reference compiled to a SQL string plus temporary
``__new_field_condition_N`` columns for ``contains`` and dropped them
afterwards (``logic.py:13-55``).  We build a real ``Column`` tree —
no temp columns, no string quoting bugs, and Catalyst can push the
predicate below joins/aggregations when referenced props allow.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from tube_spark.config.mapping import FilterNode


def compile_filter(node: FilterNode) -> Column:
    if node.is_compound:
        parts = [compile_filter(c) for c in node.children]
        out = parts[0]
        for p in parts[1:]:
            out = (out & p) if node.op == "and" else (out | p)
        return out
    col = F.col(node.prop)
    op = node.op
    if op in ("=", "=="):
        return col == F.lit(node.value)
    if op == "!=":
        return col != F.lit(node.value)
    if op == ">":
        return col > F.lit(node.value)
    if op == ">=":
        return col >= F.lit(node.value)
    if op == "<":
        return col < F.lit(node.value)
    if op == "<=":
        return col <= F.lit(node.value)
    if op == "in":
        vals = node.value if isinstance(node.value, (list, tuple)) else [node.value]
        return col.isin(*vals)
    if op == "contains":
        return F.array_contains(col, F.lit(node.value))
    if op == "like":
        # SQL LIKE pattern (% / _) — extension beyond the reference DSL
        return col.like(str(node.value))
    raise ValueError(f"unknown filter op {op!r}")
