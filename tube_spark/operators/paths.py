"""Graph-path walking: resolve a mapping path to an id-bridge DataFrame.

Every aggregator feature (flatten_props, aggregated_props, parent_props,
nested_props) needs the same primitive: given the root label and a path
of step names, a DataFrame bridging ``_<root>_id`` to ``_<target>_id``.
All hops are equi-joins over two-column edge frames, so the bridge for
an N-hop path scans N edge projections and nothing else — node tables
are only read when actual props are requested (this preserves the
reference's count-without-scan optimization, SURVEY A4 /
``new_translator.py:109-148``, and generalizes it to every path).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from tube_spark.dictionary import Link
from tube_spark.sources.graph import GraphSource, id_col


@dataclass
class PathWalk:
    """Result of walking a path: the visited labels, their links, and
    whether the full relation root→target is unique (≤1 target per root)."""

    labels: list[str]  # labels step by step, excluding root
    links: list[Link]
    is_child: list[bool]  # per step: target of the hop is a child of previous

    @property
    def target(self) -> str:
        return self.labels[-1]

    @property
    def unique_per_root(self) -> bool:
        """True when every root row sees at most one target row."""
        for link, child_dir in zip(self.links, self.is_child):
            # descending to a child: unique iff parent has ≤1 child
            # ascending to a parent: unique iff child has ≤1 parent
            if child_dir and not link.parent_unique:
                return False
            if not child_dir and not link.child_unique:
                return False
        return True


def resolve_path(source: GraphSource, root: str, steps: tuple[str, ...]) -> PathWalk:
    labels, links, is_child = [], [], []
    current = root
    for step in steps:
        label, link, child_dir = source.dictionary.resolve_step(current, step)
        labels.append(label)
        links.append(link)
        is_child.append(child_dir)
        current = label
    return PathWalk(labels=labels, links=links, is_child=is_child)


def bridge_df(source: GraphSource, root: str, walk: PathWalk) -> DataFrame:
    """(_<root>_id, _<target>_id) bridge via chained edge joins.

    Intermediate id columns are dropped as soon as the next hop consumes
    them, keeping shuffle rows at two columns regardless of path depth.
    """
    df: DataFrame | None = None
    current = root
    for label, child_dir in zip(walk.labels, walk.is_child):
        edge = (
            source.edge_df(label, current) if child_dir else source.edge_df(current, label)
        )
        if df is None:
            df = edge
        else:
            df = df.join(edge, on=id_col(current), how="inner")
            if current != root:
                df = df.drop(id_col(current))
        current = label
    assert df is not None, "empty path"
    return df.select(id_col(root), id_col(walk.target))
