"""``nested_props``: array-of-struct sub-documents, built bottom-up.

Each entry nests child rows of a path as ``ArrayType(StructType)``
columns on the parent document, recursively (grandchildren nest inside
children first).  Matches the reference's leaf-first build
(``nested/translator.py:24-85``): per level, optional filter → attach
already-nested children → ``collect_list(struct(...))`` keyed by the
hop parent.

Differences from the reference, on purpose:

* arrays are wrapped in ``array_sort`` so document content is
  deterministic (the reference's bare ``collect_list`` is
  partition-order-dependent);
* the whole assembly is one Catalyst plan — no per-level Parquet
  checkpointing — so column pruning reaches the leaf scans.

Scale note: ``collect_list(struct)`` is the one operator here whose
per-key state is proportional to fan-out.  That is inherent to the
semantics (the document *contains* all children); the plan keeps it
cheap by aggregating each level to its immediate parent (bounded
fan-out per hop) instead of joining everything to the root first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tube_spark.config.mapping import NestedProp
from tube_spark.functions.filters import compile_filter
from tube_spark.operators.paths import resolve_path
from tube_spark.sources.graph import GraphSource, id_col


def nested_props_df(source: GraphSource, parent_label: str, spec: NestedProp) -> DataFrame:
    """(parent_id, <spec.name> array<struct>) for one nested tree level."""
    walk = resolve_path(source, parent_label, spec.path)
    target = walk.target

    df = source.node_df(target, spec.props)
    if spec.filter is not None:
        df = df.filter(compile_filter(spec.filter))

    # grandchildren first: each becomes an array column on this level;
    # rows with no children get an EMPTY array, not null — document
    # consumers (and the differential oracle) treat "no children" as []
    child_names: list[str] = []
    for child in spec.children:
        cdf = nested_props_df(source, target, child)
        child_type = cdf.schema[child.name].dataType
        df = df.join(cdf, on=id_col(target), how="left").withColumn(
            child.name,
            F.coalesce(F.col(child.name), F.expr("array()").cast(child_type)),
        )
        child_names.append(child.name)

    # climb to the immediate parent of this nested level
    hop_parent = [parent_label, *walk.labels][-2]
    edge = source.edge_df(target, hop_parent)
    df = df.join(edge, on=id_col(target), how="inner")

    struct_cols = [F.col(p.name) for p in spec.props] + [F.col(n) for n in child_names]
    nested = df.groupBy(id_col(hop_parent)).agg(
        F.array_sort(F.collect_list(F.struct(*struct_cols))).alias(spec.name)
    )

    # if the path was multi-hop, climb remaining hops toward parent_label,
    # flattening arrays-of-arrays at each level
    labels = [parent_label, *walk.labels]
    for i in range(len(labels) - 2, 0, -1):
        child_l, parent_l = labels[i], labels[i - 1]
        edge = source.edge_df(child_l, parent_l)
        nested = (
            nested.join(edge, on=id_col(child_l), how="inner")
            .groupBy(id_col(parent_l))
            .agg(F.array_sort(F.flatten(F.collect_list(spec.name))).alias(spec.name))
        )
    return nested
