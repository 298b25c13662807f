"""Document post-processing plugins.

Mirrors the reference's plugin stage (``tube/etl/plugins/post_process.py``)
as pure Catalyst expressions:

* ``add_project_id`` — ``program_name-project_code``
  (``new_translator.py:372-384``).
* ``add_auth_resource_path`` — ``/programs/<p>/projects/<c>`` derived
  from ``project_id``, with an optional override map (the reference's
  user.yaml consent codes) applied as a broadcast CASE chain instead of
  the reference's row-at-a-time ``udf_auth``
  (``plugins/post_process.py:7-44``).  Handles array-valued
  ``project_id`` with ``transform`` (list-aware like the reference).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def add_project_id(
    df: DataFrame, program_col: str = "program_name", project_col: str = "project_code"
) -> DataFrame:
    return df.withColumn("project_id", F.concat_ws("-", F.col(program_col), F.col(project_col)))


def add_auth_resource_path(
    df: DataFrame,
    project_id_col: str = "project_id",
    overrides: dict[str, str] | None = None,
) -> DataFrame:
    """``project_id`` → ``auth_resource_path``; array project_ids map
    element-wise (reference ``utils/general.py:20-55`` list handling)."""
    ov = tuple((k, v) for k, v in (overrides or {}).items())
    col = F.col(project_id_col)
    dtype = df.schema[project_id_col].dataType
    if isinstance(dtype, T.ArrayType):
        out = F.transform(col, lambda x: _expr_one(x, ov))
    else:
        out = _expr_one(col, ov)
    return df.withColumn("auth_resource_path", out)


def _expr_one(pid: Column, overrides: tuple[tuple[str, str], ...]) -> Column:
    # program = text before the FIRST hyphen; project = everything after
    # (project codes may themselves contain hyphens)
    program = F.substring_index(pid, "-", 1)
    project = F.regexp_replace(pid, "^[^-]*-", "")
    base = F.concat(F.lit("/programs/"), program, F.lit("/projects/"), project)
    if not overrides:
        return base
    mapped = None
    for raw, display in overrides:
        cond = pid == F.lit(raw)
        mapped = F.when(cond, F.lit(display)) if mapped is None else mapped.when(cond, F.lit(display))
    return mapped.otherwise(base)
