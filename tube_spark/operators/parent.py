"""``parent_props``: walk ancestor chains, collecting props per level.

A path like ``centers[country,center_name:name].projects[data_type]``
climbs root→center→project, fetching the bracketed props at each hop
and attaching them to the root document (reference
``new_translator.py:432-472``).  When the chain is unique (1-1 the
whole way) values attach as scalars; when an ancestor level fans out
(a root with several parents) values aggregate as distinct sets —
``set`` for 1-n, ``first`` for 1-1 per the reference.  Array-typed
parent props flatten to a distinct array (reference
``test_dataframe_aggregation.py:98-128``).

Scale note: ancestor dimension tables are small by construction
(programs, projects, centers…), so every join here is broadcast-able;
we wrap them in ``F.broadcast`` to pin that choice rather than trusting
the size estimator at 100 TB root cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tube_spark.config.mapping import ParentPath, PropSpec
from tube_spark.sources.graph import GraphSource, id_col


def parent_props_df(
    source: GraphSource, root: str, spec: ParentPath, broadcast_parents: bool = True
) -> tuple[DataFrame, list[str]]:
    """Returns (frame keyed by root id with one column per prop, prop names)."""
    df: DataFrame | None = None  # (_root_id, _current_id, props so far)
    current = root
    unique = True
    prop_cols: list[tuple[str, bool]] = []  # (name, value_is_array)

    for step in spec.steps:
        label, link, is_child = source.dictionary.resolve_step(current, step.label)
        if is_child:
            raise ValueError(f"parent_props path step {step.label!r} is not an ancestor")
        edge = source.edge_df(current, label)  # (_current_id, _label_id)
        if df is None:
            df = edge
        else:
            df = df.join(edge, on=id_col(current), how="inner").drop(id_col(current))
        if step.props:
            df = df.join(
                _maybe_broadcast(source.node_df(label, step.props), broadcast_parents),
                on=id_col(label),
                how="inner",
            )
        unique = unique and link.child_unique
        for p in step.props:
            t = source.dictionary.prop_type(label, p.source)
            prop_cols.append((p.name, bool(t and t.kind == "array")))
        current = label

    assert df is not None
    names = [n for n, _ in prop_cols]
    # ALWAYS aggregate back to one row per root: even "unique" declared
    # chains meet data that violates the declared multiplicity (observed
    # in the reference's own ibdgc fixture: participants with two
    # centers), and a fanned-out parent join would duplicate documents.
    # Unique chains keep scalar shape via deterministic min (exactly the
    # declared value when the data IS unique); fan-out chains collect
    # sorted distinct sets (reference 1-n semantics).
    aggs = []
    for name, is_arr in prop_cols:
        if is_arr:
            aggs.append(F.array_distinct(F.flatten(F.collect_list(name))).alias(name))
        elif unique:
            aggs.append(F.min(name).alias(name))
        else:
            aggs.append(F.sort_array(F.collect_set(name)).alias(name))
    return df.groupBy(id_col(root)).agg(*aggs), names


def _maybe_broadcast(df: DataFrame, enabled: bool) -> DataFrame:
    return F.broadcast(df) if enabled else df
