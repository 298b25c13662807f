"""Graph sources: typed node / edge DataFrames from storage.

A ``GraphSource`` yields, for any node label, a DataFrame with the node
id aliased ``_<label>_id`` plus requested (typed, renamed) props; and
for any link, a two-column edge DataFrame ``(_<child>_id, _<parent>_id)``.
Every graph walk in the engine is then an equi-join over these frames.

``PropsJsonGraphSource`` reads the reference's physical format — tables
``node_<label>`` / ``edge_<rel>`` whose domain properties live in a
``_props`` JSON string column (format evidence:
``tube/etl/indexers/base/lambdas.py:10-71``; the reference parsed CSV
lines with Python lambdas into RDDs, ``base/translator.py:100-193``).
We instead read Parquet/CSV with ``spark.read`` and parse ``_props``
with ``from_json`` against a schema **pruned to the requested props** —
JSON parse width is the dominant scan cost for wide dictionaries, and
Catalyst cannot prune inside ``from_json`` on its own.

Missing table ⇒ correctly-typed empty DataFrame (the reference's
"zero-frame" synthesis, ``base/translator.py:94-98,195-212``) so
downstream joins/aggs compile without ``isEmpty()`` job-triggering
checks.
"""

from __future__ import annotations

import os
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tube_spark.config.mapping import PropSpec
from tube_spark.dictionary import Dictionary
from tube_spark.functions.valuemap import value_map_col


def id_col(label: str) -> str:
    return f"_{label}_id"


class GraphSource(Protocol):
    dictionary: Dictionary

    def node_df(self, label: str, props: tuple[PropSpec, ...] = ()) -> DataFrame: ...

    def edge_df(self, child: str, parent: str) -> DataFrame: ...


def _apply_prop_specs(df: DataFrame, label: str, props: tuple[PropSpec, ...]) -> DataFrame:
    """Select id + props with rename + value-mapping applied.

    ``src: id`` resolves to the node id column (reference
    ``base/translator.py:123-153``).
    """
    cols = [F.col(id_col(label))]
    for p in props:
        src = id_col(label) if p.source == "id" else p.source
        c = F.col(src)
        if p.value_mappings:
            c = value_map_col(c, p.value_mappings)
        cols.append(c.alias(p.name))
    return df.select(*cols)


class PropsJsonGraphSource:
    """Reference-format source: ``node_<label>`` / ``edge_<rel>`` tables
    with a ``_props`` JSON column, stored as Parquet under ``base_dir``."""

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        dictionary: Dictionary,
        legacy_bool_as_string: bool = False,
    ):
        self.spark = spark
        self.base_dir = base_dir
        self.dictionary = dictionary
        self.legacy_bool_as_string = legacy_bool_as_string

    def _table_path(self, table: str) -> str | None:
        for ext in ("", ".parquet"):
            p = os.path.join(self.base_dir, table + ext)
            if os.path.exists(p):
                return p
        return None

    def node_df(self, label: str, props: tuple[PropSpec, ...] = ()) -> DataFrame:
        wanted = sorted({p.source for p in props if p.source != "id"})
        schema = self.dictionary.props_schema(
            label, only=wanted, legacy_bool_as_string=self.legacy_bool_as_string
        )
        path = self._table_path(f"node_{label}")
        if path is None:
            out_schema = T.StructType(
                [T.StructField(id_col(label), T.StringType(), True), *schema.fields]
            )
            empty = self.spark.createDataFrame([], out_schema)
            return _apply_prop_specs(empty, label, props)
        raw = self.spark.read.parquet(path)
        parsed = raw.select(
            F.col("node_id").alias(id_col(label)),
            F.from_json(F.col("_props"), schema).alias("_p"),
        ).select(id_col(label), "_p.*")
        return _apply_prop_specs(parsed, label, props)

    def edge_df(self, child: str, parent: str) -> DataFrame:
        link = self.dictionary.link_between(child, parent)
        path = self._table_path(f"edge_{link.edge}")
        if path is None:
            schema = T.StructType(
                [
                    T.StructField(id_col(child), T.StringType(), True),
                    T.StructField(id_col(parent), T.StringType(), True),
                ]
            )
            return self.spark.createDataFrame([], schema)
        raw = self.spark.read.parquet(path)
        return raw.select(
            F.col("src_id").alias(id_col(child)),
            F.col("dst_id").alias(id_col(parent)),
        )


class DataFrameGraphSource:
    """In-memory source for tests: pre-built node/edge DataFrames.

    ``nodes[label]`` must carry ``_<label>_id`` + prop columns;
    ``edges[(child, parent)]`` the two id columns.
    """

    def __init__(
        self,
        dictionary: Dictionary,
        nodes: dict[str, DataFrame],
        edges: dict[tuple[str, str], DataFrame],
    ):
        self.dictionary = dictionary
        self._nodes = nodes
        self._edges = edges

    def node_df(self, label: str, props: tuple[PropSpec, ...] = ()) -> DataFrame:
        return _apply_prop_specs(self._nodes[label], label, props)

    def edge_df(self, child: str, parent: str) -> DataFrame:
        return self._edges[(child, parent)].select(id_col(child), id_col(parent))
