from tube_spark.sinks.opensearch import (
    OpenSearchSink,
    check_to_run_etl,
    latest_succeeded_transaction_time,
)
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
    "OpenSearchSink",
    "VersionedIndexWriter",
    "array_config",
    "check_to_run_etl",
    "freshness_check",
    "latest_succeeded_transaction_time",
]
