from tube_spark.config.mapping import (
    AggregatedProp,
    FilterNode,
    FlattenProp,
    InjectingProps,
    JoiningProp,
    Mapping,
    NestedProp,
    ParentPath,
    PropSpec,
    parse_mapping,
    parse_mappings_yaml,
)

__all__ = [
    "AggregatedProp",
    "FilterNode",
    "FlattenProp",
    "InjectingProps",
    "JoiningProp",
    "Mapping",
    "NestedProp",
    "ParentPath",
    "PropSpec",
    "parse_mapping",
    "parse_mappings_yaml",
]
