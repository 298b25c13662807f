"""Value-mapping (dict decode) as a pure Catalyst expression.

The mapping language's ``value_mappings`` rewrites raw stored values to
display values (``f → Female``).  The reference used a broadcast dict +
row-at-a-time Python UDF (``base/lambdas.py:353-357``); we compile the
(small, static) map into a literal ``CASE WHEN`` chain so the decode
runs inside whole-stage codegen — zero Python in the hot path, and the
expression is visible to Catalyst (constant-foldable, pushdown-safe).
Unmapped values pass through unchanged (reference semantics).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def value_map_col(col: Column, mappings: tuple[tuple[str, str], ...]) -> Column:
    if not mappings:
        return col
    out = None
    for raw, display in mappings:
        cond = col == F.lit(raw)
        out = F.when(cond, F.lit(display)) if out is None else out.when(cond, F.lit(display))
    return out.otherwise(col)
