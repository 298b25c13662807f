"""Search-index mapping generation from DataFrame schemas.

The reference derives an Elasticsearch mapping from its prop-type
bookkeeping (``base/parser.py:13,63-81``: str → keyword with an
``analyzed`` text subfield, float → float, int → long, bool → keyword;
nested docs → ``"type": "nested"`` trees, ``nested/parser.py:103-154``).
We derive the same shape directly from the Spark schema — the schema IS
the type bookkeeping — so any sink (OpenSearch connector or a file
index) can create its target mapping without a second type system.

Divergence (documented): booleans map to ``boolean`` unless
``legacy_bool_as_string`` asked for keyword-compat at source level, in
which case they are already strings by the time they reach a schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_KEYWORD = {
    "type": "keyword",
    "fields": {"analyzed": {"type": "text"}},
}


def _field_mapping(dtype: T.DataType) -> dict:
    if isinstance(dtype, T.ArrayType):
        # ES has no array type: arrays take the element's mapping;
        # arrays OF STRUCTS become nested documents
        return _field_mapping(dtype.elementType)
    if isinstance(dtype, T.StructType):
        return {
            "type": "nested",
            "properties": {f.name: _field_mapping(f.dataType) for f in dtype.fields},
        }
    if isinstance(dtype, T.StringType):
        return dict(_KEYWORD)
    if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType)):
        return {"type": "long"}
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return {"type": "float"}
    if isinstance(dtype, T.BooleanType):
        return {"type": "boolean"}
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return {"type": "date"}
    return dict(_KEYWORD)


def es_mapping(df: DataFrame, doc_type: str | None = None) -> dict:
    """Index mapping dict for a document DataFrame."""
    props = {f.name: _field_mapping(f.dataType) for f in df.schema.fields}
    return {"mappings": {"properties": props}}
