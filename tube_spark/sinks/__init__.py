from tube_spark.sinks.writer import (
    BucketedTableSink,
    DocumentSink,
    VersionedIndexWriter,
    array_config,
    freshness_check,
)

__all__ = [
    "BucketedTableSink",
    "DocumentSink",
    "VersionedIndexWriter",
    "array_config",
    "freshness_check",
]
