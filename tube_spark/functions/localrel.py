"""Driver-literal DataFrames as LocalRelation, not Python-RDD scans.

``spark.createDataFrame(rows, schema)`` on a plain Python list plans a
``Scan ExistingRDD``: the driver pickles the rows into an RDD of
``defaultParallelism`` slices and EVERY action on the frame runs that
many Python-worker tasks — measured 0.7-2.8 s per call on ``local[32]``
for sub-10-row offset lists (tools/profile_query.py, r14: the
two-phase prefix-sum kernels paid it once per ranking, ``rfm_scores``
three times, ``spearman`` twice).  Routing the same rows through a
pandas DataFrame makes ``createDataFrame`` emit a ``LocalTableScan``
(an Arrow-backed LocalRelation): no RDD, no Python workers, no extra
Spark jobs, and broadcast-ready — the right plan at ANY scale for
driver-held literals, which are bounded by contract everywhere this is
used (per-partition offsets, centroid lists, sketch snapshot rows,
query-literal vectors).

Values are passed positionally; the pandas frame's columns are renamed
to the schema's field names before conversion so the Arrow path maps
fields by name without ambiguity.  Nested arrays ride as Python lists
in object columns (Arrow converts against the declared schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType, _parse_datatype_string


def schema_of(schema: str | StructType) -> StructType:
    if isinstance(schema, StructType):
        return schema
    parsed = _parse_datatype_string(schema)
    if not isinstance(parsed, StructType):
        raise TypeError(f"not a struct schema: {schema!r}")
    return parsed


def local_df(spark: SparkSession, rows, schema: str | StructType) -> DataFrame:
    """LocalRelation frame from driver-held ``rows`` (iterable of
    tuples/lists, matched to ``schema`` positionally).  Empty input
    stays on the stock path (already a trivial plan, and pandas cannot
    carry the column types of zero rows)."""
    import pandas as pd

    st = schema_of(schema)
    data = [tuple(r) for r in rows]
    if not data:
        return spark.createDataFrame([], st)
    pdf = pd.DataFrame(data, columns=st.names)
    return spark.createDataFrame(pdf, st)
