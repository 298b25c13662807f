from tube_spark.sources.graph import DataFrameGraphSource, GraphSource, PropsJsonGraphSource
from tube_spark.sources.relational import RelationalGraphSource, TableSpec, star_schema_source

__all__ = [
    "DataFrameGraphSource",
    "GraphSource",
    "PropsJsonGraphSource",
    "RelationalGraphSource",
    "TableSpec",
    "star_schema_source",
]
