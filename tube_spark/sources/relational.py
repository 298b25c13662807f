"""Relational adapter: plain FK-linked tables exposed as a graph source.

The reference can only ingest its own node/edge dump format; real
warehouses hold ordinary relational tables.  This adapter maps a star /
snowflake schema onto the engine's graph model: every table is a node
label, every foreign key is a child→parent edge, and the edge DataFrame
is *derived from the child table itself* (``SELECT child_id, fk``) — no
physical edge table, no extra scan beyond the two columns involved
(Parquet column pruning makes this near-free).

Scale note: because the "edge table" is a projection of the child
table, a count-from-edge aggregation (SURVEY A4) over a 100 TB fact
table reads exactly two columns, and joins against the parent use the
same key the fact table would naturally be bucketed on.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tube_spark.config.mapping import PropSpec
from tube_spark.dictionary import Dictionary, Link, NodeDef
from tube_spark.functions.pqread import read_parquet
from tube_spark.sources.graph import _apply_prop_specs, id_col


@dataclass
class TableSpec:
    """One relational table acting as a node.

    ``id_expr`` is a SQL expression producing a unique row id (a single
    pk column, or e.g. a concat for composite keys).  ``fks`` maps
    fk-column → parent label.  ``category`` feeds collector mappings.
    """

    label: str
    path: str
    id_expr: str
    fks: dict[str, str] = field(default_factory=dict)
    category: str | None = None
    unique_parent_fks: tuple[str, ...] = ()


class RelationalGraphSource:
    def __init__(self, spark: SparkSession, tables: list[TableSpec]):
        self.spark = spark
        self.tables = {t.label: t for t in tables}
        links = []
        for t in tables:
            for fk, parent in t.fks.items():
                links.append(
                    Link(
                        child=t.label,
                        parent=parent,
                        edge=f"{t.label}__{fk}",
                        multiplicity="one_to_one" if fk in t.unique_parent_fks else "many_to_one",
                    )
                )
        nodes = [NodeDef(label=t.label, props={}, category=t.category) for t in tables]
        self.dictionary = Dictionary(nodes, links)

    def _read(self, label: str) -> DataFrame:
        # schema-cached read: a mapping translation touches the same
        # table several times (node scan, per-FK edge projections) and
        # would otherwise pay one footer-inference job per touch
        return read_parquet(self.spark, self.tables[label].path)

    def raw_df(self, label: str) -> DataFrame:
        """Full table with the graph id attached (native column types)."""
        t = self.tables[label]
        df = self._read(label)
        return df.withColumn(id_col(label), F.expr(t.id_expr))

    def node_df(self, label: str, props: tuple[PropSpec, ...] = ()) -> DataFrame:
        return _apply_prop_specs(self.raw_df(label), label, props)

    def edge_df(self, child: str, parent: str) -> DataFrame:
        """Child→parent edge projected straight out of the child table."""
        t = self.tables[child]
        fk = next((k for k, p in t.fks.items() if p == parent), None)
        if fk is None:
            raise KeyError(f"no FK {child} -> {parent}")
        df = self._read(child)
        return df.select(
            F.expr(t.id_expr).alias(id_col(child)),
            F.col(fk).alias(id_col(parent)),
        )

    def node_with_fks_df(
        self, label: str, parents: tuple[str, ...], props: tuple[PropSpec, ...] = ()
    ) -> DataFrame:
        """Node props + graph id + one FK id per requested parent, in ONE
        scan of the table.

        This is the collector's single-scan injection path: because a
        relational edge is a projection of the child table, the leaf's
        first-hop parent id can ride along with its props, so ancestor
        props join on the (small-int) parent key instead of re-scanning
        the leaf and self-joining on its (possibly long, string) doc id.
        At 100 TB that removes a second full scan of the fact table plus
        a fact⋈fact sort-merge join per injected ancestor.
        """
        t = self.tables[label]
        extra = []
        for parent in parents:
            fk = next((k for k, p in t.fks.items() if p == parent), None)
            if fk is None:
                raise KeyError(f"no FK {label} -> {parent}")
            extra.append(F.col(fk).alias(id_col(parent)))
        df = self._read(label).withColumn(id_col(label), F.expr(t.id_expr))
        return _apply_prop_specs(df, label, props, extra=tuple(extra))

    def edge_with_props(
        self, child: str, parent: str, props: list[str]
    ) -> DataFrame:
        """Edge + child props in ONE scan of the child table.

        For relational sources the edge is a projection of the child
        table, so fetching child props alongside it avoids the
        edge⋈node self-join entirely — at 100 TB that removes a full
        shuffle of the fact table (and is immune to non-unique child
        ids, which a self-join would fan out on).
        """
        t = self.tables[child]
        fk = next((k for k, p in t.fks.items() if p == parent), None)
        if fk is None:
            raise KeyError(f"no FK {child} -> {parent}")
        df = self._read(child)
        return df.select(
            F.expr(t.id_expr).alias(id_col(child)),
            F.col(fk).alias(id_col(parent)),
            *[F.col(p) for p in props],
        )


def star_schema_source(spark: SparkSession, sf_dir: str) -> RelationalGraphSource:
    """The driver's TPC-H-ish testdata as a graph:
    ``region ← nation ← customer ← orders ← lineitem``,
    ``supplier/part ← lineitem``, ``events`` keyed by customer.
    """
    p = lambda name: f"{sf_dir}/{name}.parquet"
    return RelationalGraphSource(
        spark,
        [
            TableSpec("region", p("region"), "r_regionkey"),
            TableSpec("nation", p("nation"), "n_nationkey", fks={"n_regionkey": "region"}),
            TableSpec("customer", p("customer"), "c_custkey", fks={"c_nationkey": "nation"}),
            TableSpec("orders", p("orders"), "o_orderkey", fks={"o_custkey": "customer"}),
            TableSpec(
                "lineitem",
                p("lineitem"),
                # (l_orderkey, l_linenumber) is NOT unique in the synthetic
                # data; the 6-column concat is verified unique at every SF
                # and formats identically in Spark and DuckDB.
                "concat(l_orderkey,'_',l_linenumber,'_',l_partkey,'_',l_suppkey,"
                "'_',l_quantity,'_',l_extendedprice)",
                fks={"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"},
                category="fact",
            ),
            TableSpec("supplier", p("supplier"), "s_suppkey", fks={"s_nationkey": "nation"}),
            TableSpec("part", p("part"), "p_partkey"),
            TableSpec(
                "events", p("events"), "event_id", fks={"user_id": "customer"}, category="fact"
            ),
        ],
    )
