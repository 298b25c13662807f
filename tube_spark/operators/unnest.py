"""Document un-nesting: the inverse of nested assembly.

Consumers of published indexes often need child rows back out of
``ArrayType(StructType)`` columns (re-indexing a nested level, feeding a
training pipeline one child per row).  ``unnest_documents`` explodes a
nested column into one row per child struct, carrying chosen document
columns alongside — map-only, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def unnest_documents(
    df: DataFrame,
    nested_col: str,
    keep: tuple[str, ...] = (),
    outer: bool = False,
) -> DataFrame:
    """One row per element of ``nested_col`` with its struct fields
    flattened to top-level columns.  ``outer=True`` keeps documents whose
    array is null/empty (child columns null)."""
    dtype = df.schema[nested_col].dataType
    if not isinstance(dtype, T.ArrayType) or not isinstance(dtype.elementType, T.StructType):
        raise ValueError(f"{nested_col!r} is not an array<struct> column")
    ex = F.explode_outer(nested_col) if outer else F.explode(nested_col)
    keep_cols = list(keep) or [
        f.name for f in df.schema.fields if f.name != nested_col
    ]
    out = df.select(*keep_cols, ex.alias("__child"))
    child_fields = [
        F.col(f"__child.{f.name}").alias(f.name) for f in dtype.elementType.fields
    ]
    return out.select(*keep_cols, *child_fields)
