from tube_spark.sinks.writer import (
    DocumentSink,
    VersionedIndexWriter,
    array_config,
    freshness_check,
)

__all__ = ["DocumentSink", "VersionedIndexWriter", "array_config", "freshness_check"]
