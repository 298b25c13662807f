"""Bottom-up path aggregation (the mapping language's ``aggregated_props``).

Semantics (reference ``aggregation/parser.py`` + ``new_translator.py:67-232``):
each entry names a multi-hop child path and an fn; the fn aggregates
*leaf* values (or leaf row counts) per root document, rolled up through
the intermediate levels with merge semantics (count→sum of counts,
set/list→flatten).

Execution strategy — built for the 100 TB case:

* **Aggregate early, join late.**  We partially aggregate at the leaf's
  parent level first, then roll partials up hop by hop
  (``merge_expr``).  The shuffle that crosses the wire at each hop is
  one row per (intermediate id, agg) — never raw leaf rows.  Spark adds
  map-side partial aggregation below each of these shuffles for free.
* **Count never touches the node table.**  ``fn: count`` without a
  ``src`` aggregates the edge frame alone (two columns off Parquet) —
  the reference's A4 optimization (``new_translator.py:109-148``),
  generalized to any depth.
* **One groupBy per path.**  All fns sharing a path are computed in a
  single aggregation pass.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tube_spark.config.mapping import AggregatedProp
from tube_spark.functions.aggs import agg_expr, merge_expr, zero_value
from tube_spark.operators.paths import resolve_path
from tube_spark.sources.graph import GraphSource, id_col


def aggregated_props_df(
    source: GraphSource, root: str, specs: tuple[AggregatedProp, ...]
) -> list[DataFrame]:
    """One (root_id, *agg_cols) frame per distinct path."""
    by_path: dict[tuple[str, ...], list[AggregatedProp]] = defaultdict(list)
    for s in specs:
        by_path[s.path].append(s)
    return [_aggregate_path(source, root, path, group) for path, group in by_path.items()]


def _aggregate_path(
    source: GraphSource,
    root: str,
    path: tuple[str, ...],
    specs: list[AggregatedProp],
) -> DataFrame:
    walk = resolve_path(source, root, path)
    labels = [root, *walk.labels]
    leaf = walk.target

    # --- leaf level: raw aggregation keyed by the leaf's hop-parent ------
    hop_parent = labels[-2]
    src_props = sorted({s.src for s in specs if s.src})

    ewp = getattr(source, "edge_with_props", None)
    if src_props and ewp is not None and walk.is_child[-1]:
        # single-scan fast path: edge + leaf props off the child table
        # (no edge⋈node self-join of the fact table)
        base = ewp(leaf, hop_parent, src_props)
    elif src_props:
        from tube_spark.config.mapping import PropSpec

        leaf_vals = source.node_df(leaf, tuple(PropSpec(name=p) for p in src_props))
        edge = source.edge_df(leaf, hop_parent)
        base = edge.join(leaf_vals, on=id_col(leaf), how="left")
    else:
        base = source.edge_df(leaf, hop_parent)

    def leaf_col(s: AggregatedProp) -> F.Column:
        if s.src:
            t = source.dictionary.prop_type(leaf, s.src)
            is_arr = bool(t and t.kind == "array")
            return agg_expr(s.fn, F.col(s.src), is_array_input=is_arr)
        if s.fn == "count":
            # count of edge rows: no reference to the leaf id, so the
            # scan prunes to the FK column(s) alone (SURVEY A4 at any
            # depth — for a relational source this reads 1-2 columns of
            # the fact table and nothing else)
            return F.count(F.lit(1))
        # other src-less fns aggregate the leaf id itself
        return agg_expr(s.fn, F.col(id_col(leaf)))

    partial = base.groupBy(id_col(hop_parent)).agg(
        *[leaf_col(s).alias(s.name) for s in specs]
    )

    # --- roll up through intermediate levels toward the root -------------
    for i in range(len(labels) - 2, 0, -1):
        child, parent = labels[i], labels[i - 1]
        edge = source.edge_df(child, parent)
        rolled = edge.join(partial, on=id_col(child), how="inner")
        partial = rolled.groupBy(id_col(parent)).agg(
            *[merge_expr(s.fn, F.col(s.name)).alias(s.name) for s in specs]
        )
    return partial


def join_aggregates(root_df: DataFrame, root: str, frames: list[DataFrame],
                    specs: tuple[AggregatedProp, ...]) -> DataFrame:
    """Left-join agg frames onto the root and null-fill counts to 0."""
    out = root_df
    for f in frames:
        out = out.join(f, on=id_col(root), how="left")
    for s in specs:
        z = zero_value(s.fn)
        if z is not None:
            out = out.withColumn(s.name, F.coalesce(F.col(s.name), z))
    return out
