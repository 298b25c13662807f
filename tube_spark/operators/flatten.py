"""``flatten_props``: pull child-node props onto the root row.

One-to-one relations are a plain left join.  One-to-many relations with
``sorted_by`` pick the top-1 child per root.  The reference implemented
top-1 as ``collect_list(struct) → sort_array → getItem(0)``
(``new_translator.py:234-289``) which materializes every child row into
an in-memory array per root — at 100 TB fan-out that is an OOM.  We use
``max_by``/``min_by`` (Spark's native argmax aggregate): a single
hash aggregation with map-side partials, constant memory per key, no
array buildup and no window sort.

Many-to-many without ``sorted_by`` is rejected, matching the
reference's multiplicity guard (``aggregation/parser.py:380-408``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tube_spark.config.mapping import FlattenProp
from tube_spark.operators.paths import bridge_df, resolve_path
from tube_spark.sources.graph import GraphSource, id_col


def flatten_props_df(source: GraphSource, root: str, spec: FlattenProp) -> DataFrame:
    """(root_id, props…) with at most one row per root."""
    walk = resolve_path(source, root, spec.path)
    target = walk.target
    bridge = bridge_df(source, root, walk)

    props = spec.props
    need_sort = spec.sort_col is not None
    fetch = props
    if need_sort and all(p.source != spec.sort_col for p in props):
        from tube_spark.config.mapping import PropSpec

        fetch = (*props, PropSpec(name="__sort", src=spec.sort_col))
    child = source.node_df(target, fetch)
    joined = bridge.join(child, on=id_col(target), how="inner").drop(id_col(target))

    if not need_sort:
        if not walk.unique_per_root:
            raise ValueError(
                f"flatten_props path {'.'.join(spec.path)} is one-to-many; "
                "declare sorted_by to pick the top-1 child"
            )
        return joined

    sort_key = "__sort" if fetch is not props else next(
        p.name for p in props if p.source == spec.sort_col
    )
    pick = F.max_by if spec.desc else F.min_by
    # argmax over a struct keyed by (sort_col, …props): comparing the
    # whole struct makes tie-breaks deterministic (struct comparison is
    # lexicographic by field, and sort_key leads the struct).
    payload = F.struct(F.col(sort_key).alias("__k"), *[F.col(p.name) for p in props])
    out = joined.groupBy(id_col(root)).agg(pick(payload, payload).alias("__top"))
    return out.select(
        id_col(root), *[F.col(f"__top.{p.name}").alias(p.name) for p in props]
    )
