"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md §2
(or a beyond-reference pipeline operator) THROUGH the engine's public
API, and ``oracle_sql()`` holds the DuckDB-equivalent ANSI SQL the
driver runs side-by-side at sf0.01.

Conventions keeping the differential compare byte-stable:
* every aggregate/computed column is aliased identically on both sides;
* sets are sorted arrays on both sides; float outputs are rounded;
* Spark ``size``/``count`` outputs are cast to long (BIGINT twin);
* money sums are rounded to 2 decimals on both sides (double summation
  order differs between engines at the last ulp).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tube_spark.config.mapping import parse_mapping
from tube_spark.queries import tpch as _tpch
from tube_spark.plans.translator import Aggregator, Collector, Pipeline
from tube_spark.functions.pqread import read_parquet as _pq
from tube_spark.sources.relational import star_schema_source

SF0001 = "/root/testdata/sf0.001"


def _ensure(spark: SparkSession) -> SparkSession:
    """Session confs the queries rely on, set at runtime so they hold in
    ANY caller-provided session (the driver builds its own):
    - nanosAsLong: events.ts is parquet TIMESTAMP(NANOS), unreadable by
      Spark 4 otherwise;
    - UTC: timestamp values must not shift vs the DuckDB oracle;
    - Arrow: the similarity/multimodal kernels use pandas_udfs.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    return spark


def _scan_floor(df: DataFrame, key: str, path: str | None = None) -> DataFrame:
    """Parallelism floor for compute-heavy scans (guide §2.5 "input
    skew: one huge unsplittable file … repartition immediately after
    the read").  The testdata tables are single-row-group parquet, so
    every scan-side narrow stage (shingle explode + minhash partial
    agg, Arrow codec decode, text analysis) otherwise runs in ONE task
    regardless of core count — measured 6.3 s serial for dedup_groups'
    signature stage at sf0.1 (tools/profile_query.py).  Hash
    repartition on the id (deterministic row→partition by VALUE — no
    round-robin position dependence, retry-safe) and only when the
    scan yields fewer partitions than cores: at 100 TB the scan has
    thousands of splits and this is a structural no-op.

    The scan's partition count is memoized per (session, path) when
    ``path`` is given: ``df.rdd.getNumPartitions()`` materializes a
    Python RDD handle (~0.14 s measured on local[32]) and the count is
    plan METADATA — fixed for an immutable input within one session,
    like the schema pqread caches; every action still computes from
    the parquet bytes.  Callers with mutable inputs pass path=None and
    pay the probe each call."""
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    if path is not None:
        ck = (sc.applicationId, path)
        parts = _NPART_CACHE.get(ck)
        if parts is None:
            parts = df.rdd.getNumPartitions()
            if len(_NPART_CACHE) >= 4096:  # same safety valve as pqread
                _NPART_CACHE.clear()
            _NPART_CACHE[ck] = parts
    else:
        parts = df.rdd.getNumPartitions()
    if parts < n:
        return df.repartition(n, F.col(key))
    return df


# (applicationId, path) -> scan partition count (see _scan_floor)
_NPART_CACHE: "dict[tuple[str, str], int]" = {}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure(spark)
    p = f"{sf_dir}/documents.parquet"
    return _scan_floor(_pq(spark, p), "doc_id", path=p)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No ``_scan_floor`` here, by measurement: the embeddings frame's
    consumers are Arrow/pandas-UDF kernels and broadcast-side joins
    whose per-row work is tiny, so a parallelism floor only buys an
    extra Exchange + 32 micro-batches of Python-worker overhead —
    A/B at sf0.1 (best-of-3, both directions): ann_ivf_topk 3.2→5.6 s,
    embedding_near_dup_scale 3.5→5.2 s, embedding_covariance 0.7→1.3 s
    WITH the floor; no _emb consumer measured faster with it.  The
    _docs floor stays (shingle/minhash/codec scans are compute-bound:
    exact_spans 9.7→6.1 s, dedup_groups 10.7→5.3 s WITH it)."""
    _ensure(spark)
    return _pq(spark, f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1-style pricing summary at sf0.001."""
    return q_pricing_summary(_ensure(spark), SF0001)


# ---------------------------------------------------------------------------
# engine-mapping probes over the star schema (SURVEY §2 operators)
# ---------------------------------------------------------------------------


def q_props_value_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P3: projection + rename + value_mappings (CASE-chain decode)."""
    src = star_schema_source(spark, sf_dir)
    m = parse_mapping(
        {
            "name": "cust", "doc_type": "customer", "type": "aggregator", "root": "customer",
            "props": [
                {"name": "c_name"},
                {"name": "balance", "src": "c_acctbal"},
                {
                    "name": "segment",
                    "src": "c_mktsegment",
                    "value_mappings": [{"BUILDING": "Construction"}, {"AUTOMOBILE": "Cars"}],
                },
            ],
        }
    )
    df = Aggregator(src, m).translate()
    return df.select("_customer_id", "c_name", "balance", "segment")


def q_parent_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/parent_props: customer ← nation[name] ← region[name] chain."""
    src = star_schema_source(spark, sf_dir)
    m = parse_mapping(
        {
            "name": "cust", "doc_type": "customer", "type": "aggregator", "root": "customer",
            "props": [{"name": "c_name"}],
            "parent_props": [{"path": "nations[nation_name:n_name].regions[region_name:r_name]"}],
        }
    )
    df = Aggregator(src, m).translate()
    return df.select("_customer_id", "c_name", "nation_name", "region_name")


def q_flatten_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: sorted_by top-1 flatten — latest order per customer."""
    src = star_schema_source(spark, sf_dir)
    m = parse_mapping(
        {
            "name": "cust", "doc_type": "customer", "type": "aggregator", "root": "customer",
            "props": [{"name": "c_name"}],
            "flatten_props": [
                {
                    "path": "orders",
                    "props": [
                        {"name": "latest_orderdate", "src": "o_orderdate"},
                        {"name": "latest_totalprice", "src": "o_totalprice"},
                    ],
                    "sorted_by": "o_orderdate, desc",
                }
            ],
        }
    )
    df = Aggregator(src, m).translate()
    return df.select("_customer_id", "c_name", "latest_orderdate", "latest_totalprice")


def q_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A4: count/sum/min/max over a 1-hop path (zero-filled counts)."""
    src = star_schema_source(spark, sf_dir)
    m = parse_mapping(
        {
            "name": "cust", "doc_type": "customer", "type": "aggregator", "root": "customer",
            "props": [{"name": "c_name"}],
            "aggregated_props": [
                {"name": "order_count", "path": "orders", "fn": "count"},
                {"name": "total_spend", "src": "o_totalprice", "path": "orders", "fn": "sum"},
                {"name": "first_orderdate", "src": "o_orderdate", "path": "orders", "fn": "min"},
                {"name": "last_orderdate", "src": "o_orderdate", "path": "orders", "fn": "max"},
            ],
        }
    )
    df = Aggregator(src, m).translate()
    return df.select(
        "_customer_id",
        "order_count",
        F.round("total_spend", 2).alias("total_spend"),
        "first_orderdate",
        "last_orderdate",
    )


def q_agg_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 set: sorted distinct child values per root."""
    src = star_schema_source(spark, sf_dir)
    m = parse_mapping(
        {
            "name": "cust", "doc_type": "customer", "type": "aggregator", "root": "customer",
            "props": [{"name": "c_name"}],
            "aggregated_props": [
                {"name": "statuses", "src": "o_orderstatus", "path": "orders", "fn": "set"}
            ],
        }
    )
    df = Aggregator(src, m).translate()
    # Array columns are serialized to strings for the driver's differential
    # check (its canonicalizer cannot hash ndarray cells); the set semantics
    # (sorted, distinct) are preserved in the joined representation.
    return df.select(
        "_customer_id",
        F.array_join(
            F.coalesce("statuses", F.expr("cast(array() as array<string>)")), "|"
        ).alias("statuses"),
    )


def q_agg_sorted_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine extension fn: sorted_list — `list` with deterministic
    (sorted) order; the reference's fn: list is partition-order-dependent
    and therefore unstable across runs."""
    src = star_schema_source(spark, sf_dir)
    m = parse_mapping(
        {
            "name": "cust", "doc_type": "customer", "type": "aggregator", "root": "customer",
            "props": [{"name": "c_name"}],
            "aggregated_props": [
                {"name": "order_dates", "src": "o_orderdate", "path": "orders",
                 "fn": "sorted_list"}
            ],
        }
    )
    df = Aggregator(src, m).translate()
    # Serialized as epoch-microsecond strings (driver canonicalizer cannot
    # hash array cells); order (sorted ascending) is preserved in the join.
    return df.select(
        "_customer_id",
        F.array_join(
            F.transform(
                F.coalesce("order_dates", F.expr("cast(array() as array<timestamp>)")),
                lambda x: F.unix_micros(x).cast("string"),
            ),
            "|",
        ).alias("order_dates"),
    )


def q_two_hop_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3: two-hop roll-up (sum-of-counts merge), count from edges only."""
    src = star_schema_source(spark, sf_dir)
    m = parse_mapping(
        {
            "name": "cust", "doc_type": "customer", "type": "aggregator", "root": "customer",
            "props": [{"name": "c_name"}],
            "aggregated_props": [
                {"name": "lineitem_count", "path": "orders.lineitems", "fn": "count"},
                {
                    "name": "total_qty",
                    "src": "l_quantity",
                    "path": "orders.lineitems",
                    "fn": "sum",
                },
            ],
        }
    )
    df = Aggregator(src, m).translate()
    return df.select(
        "_customer_id",
        "lineitem_count",
        F.round("total_qty", 2).alias("total_qty"),
    )


def q_nested_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2: nested array-of-struct documents (orders nested on customer)."""
    src = star_schema_source(spark, sf_dir)
    m = parse_mapping(
        {
            "name": "cust", "doc_type": "customer", "type": "aggregator", "root": "customer",
            "props": [{"name": "c_name"}],
            "nested_props": [
                {
                    "name": "customer_orders",
                    "path": "orders",
                    "props": [{"name": "o_orderdate"}, {"name": "o_totalprice"}],
                }
            ],
        }
    )
    df = Aggregator(src, m).translate()
    # Serialize the array-of-struct to a sorted joined string for the driver
    # check: each order becomes "<epoch_us>,<totalprice>"; string-sorting on
    # both sides makes the comparison order-insensitive yet content-exact.
    return df.filter(F.col("customer_orders").isNotNull()).select(
        "_customer_id",
        F.array_join(
            F.sort_array(
                F.transform(
                    "customer_orders",
                    lambda s: F.concat_ws(
                        ",",
                        F.unix_micros(s["o_orderdate"].cast("timestamp")).cast("string"),
                        s["o_totalprice"].cast("decimal(18,2)").cast("string"),
                    ),
                )
            ),
            "|",
        ).alias("customer_orders"),
    )


def q_nested_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 recursion: customer → orders[] → lineitems[] as nested structs."""
    src = star_schema_source(spark, sf_dir)
    m = parse_mapping(
        {
            "name": "cust", "doc_type": "customer", "type": "aggregator", "root": "customer",
            "props": [{"name": "c_name"}],
            "nested_props": [
                {
                    "name": "orders_docs",
                    "path": "orders",
                    "props": [{"name": "o_orderdate"}, {"name": "o_totalprice"}],
                    "nested_props": [
                        {
                            "name": "lineitems",
                            "path": "lineitems",
                            "props": [{"name": "l_linenumber"}, {"name": "l_quantity"}],
                        }
                    ],
                }
            ],
        }
    )
    df = Aggregator(src, m).translate()
    # Two-level serialization for the driver check:
    # order -> "<epoch_us>,<price>[<line>:<qty>;...]" with both levels sorted.
    return df.filter(F.col("orders_docs").isNotNull()).select(
        "_customer_id",
        F.array_join(
            F.sort_array(
                F.transform(
                    "orders_docs",
                    lambda s: F.concat(
                        F.unix_micros(s["o_orderdate"].cast("timestamp")).cast("string"),
                        F.lit(","),
                        s["o_totalprice"].cast("decimal(18,2)").cast("string"),
                        F.lit("["),
                        F.coalesce(
                            F.array_join(
                                F.sort_array(
                                    F.transform(
                                        s["lineitems"],
                                        lambda li: F.concat_ws(
                                            ":",
                                            li["l_linenumber"].cast("string"),
                                            li["l_quantity"].cast("decimal(18,2)").cast("string"),
                                        ),
                                    )
                                ),
                                ";",
                            ),
                            F.lit(""),
                        ),
                        F.lit("]"),
                    ),
                )
            ),
            "|",
        ).alias("orders_docs"),
    )


def q_filter_dsl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: filter DSL compiled to a Column predicate."""
    src = star_schema_source(spark, sf_dir)
    m = parse_mapping(
        {
            "name": "ord", "doc_type": "orders", "type": "aggregator", "root": "orders",
            "props": [
                {"name": "o_orderstatus"},
                {"name": "o_totalprice"},
                {"name": "o_orderpriority"},
            ],
            "filter": {
                "op": "and",
                "logics": [
                    {"op": "=", "prop": "o_orderstatus", "value": "F"},
                    {"op": ">", "prop": "o_totalprice", "value": 200000},
                    {
                        "op": "in",
                        "prop": "o_orderpriority",
                        "value": ["1-URGENT", "2-HIGH"],
                    },
                ],
            },
        }
    )
    df = Aggregator(src, m).translate()
    return df.select("_orders_id", "o_orderstatus", "o_totalprice", "o_orderpriority")


def q_collector_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3/U2: collector — union category leaves (lineitem+events) with
    injected ancestor (customer) id."""
    src = star_schema_source(spark, sf_dir)
    m = parse_mapping(
        {
            "name": "facts", "doc_type": "fact", "type": "collector", "category": "fact",
            "props": [{"name": "source_node"}],
            "injecting_props": {"customer": {"props": [{"name": "cust_id", "src": "id"}]}},
        }
    )
    df = Collector(src, m).translate()
    return df.select("_doc_id", "source_node", "cust_id")


def q_joining_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: cross-index join — customer index pulls a set-aggregated prop
    from the orders index on the shared key."""
    src = star_schema_source(spark, sf_dir)
    cust = parse_mapping(
        {
            "name": "cust_idx", "doc_type": "customer", "type": "aggregator", "root": "customer",
            "props": [{"name": "c_name"}, {"name": "join_key", "src": "id"}],
            "joining_props": [
                {
                    "index": "ord_idx",
                    "join_on": "join_key",
                    "props": [{"name": "order_statuses", "src": "o_orderstatus", "fn": "set"}],
                }
            ],
        }
    )
    ords = parse_mapping(
        {
            "name": "ord_idx", "doc_type": "orders", "type": "aggregator", "root": "orders",
            "props": [{"name": "join_key", "src": "o_custkey"}, {"name": "o_orderstatus"}],
        }
    )
    out = Pipeline(src, [cust, ords]).run()["cust_idx"]
    return out.select(
        F.col("join_key").alias("_customer_id"),
        "c_name",
        F.array_join(
            F.coalesce("order_statuses", F.expr("cast(array() as array<string>)")), "|"
        ).alias("order_statuses"),
    )


# ---------------------------------------------------------------------------
# classic analytics (flagship + bench)
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem."""
    li = _pq(spark, f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_top_revenue_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join aggregate: revenue by nation (broadcast dims)."""
    li = _pq(spark, f"{sf_dir}/lineitem.parquet")
    o = _pq(spark, f"{sf_dir}/orders.parquet")
    c = _pq(spark, f"{sf_dir}/customer.parquet")
    n = _pq(spark, f"{sf_dir}/nation.parquet")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc())
    )


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective filters on three tables pushed to the
    scans, two equi-joins, revenue aggregate, global top-10.  The
    orderBy+limit compiles to TakeOrderedAndProject — per-partition
    top-k then a 10-row driver merge, never a full sort."""
    cutoff = F.to_timestamp(F.lit("1995-03-15"))
    c = _pq(spark, f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = _pq(spark, f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderdate").cast("timestamp") < cutoff
    )
    li = _pq(spark, f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_shipdate").cast("timestamp") > cutoff
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate_us"),
            "revenue",
        )
    )


def q_returnflag_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional PIVOT aggregation — per return
    flag, count high- vs low-priority lineitems via CASE inside SUM
    (one scan, one join, one shuffle; the predicate pair never needs a
    second pass or a real pivot operator)."""
    li = _pq(spark, f"{sf_dir}/lineitem.parquet")
    o = _pq(spark, f"{sf_dir}/orders.parquet")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: five-way join where customer and supplier must
    share a nation inside one region.  nation/region/customer/supplier
    are broadcast dims; lineitem->orders is the only shuffled join, so
    the big fact table is shuffled exactly once on its join key."""
    lo = F.to_timestamp(F.lit("1996-01-01"))
    hi = F.to_timestamp(F.lit("1997-01-01"))
    r = _pq(spark, f"{sf_dir}/region.parquet").filter(
        F.col("r_name") == "ASIA"
    )
    n = (
        _pq(spark, f"{sf_dir}/nation.parquet")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    c = _pq(spark, f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    s = _pq(spark, f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    o = _pq(spark, f"{sf_dir}/orders.parquet").filter(
        (F.col("o_orderdate").cast("timestamp") >= lo)
        & (F.col("o_orderdate").cast("timestamp") < hi)
    )
    li = _pq(spark, f"{sf_dir}/lineitem.parquet")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc())
    )


def q_late_shipment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-style left-semi join with an extra range
    predicate (lineitem shipped >60 days after the order date), then a
    count per order priority.  The semi join never materializes the
    matched lineitems — Spark keeps only the orders-side columns."""
    lo = F.to_timestamp(F.lit("1996-01-01"))
    hi = F.to_timestamp(F.lit("1996-07-01"))
    o = _pq(spark, f"{sf_dir}/orders.parquet").filter(
        (F.col("o_orderdate").cast("timestamp") >= lo)
        & (F.col("o_orderdate").cast("timestamp") < hi)
    )
    li = _pq(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate"
    )
    late = (
        F.col("l_shipdate").cast("timestamp")
        > F.col("o_orderdate").cast("timestamp") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, (o.o_orderkey == li.l_orderkey) & late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer in one
    half-year, top 20 by revenue.  The orderBy+limit compiles to
    TakeOrderedAndProject (per-partition top-k, 20-row driver merge)."""
    lo = F.to_timestamp(F.lit("1996-01-01"))
    hi = F.to_timestamp(F.lit("1996-07-01"))
    o = _pq(spark, f"{sf_dir}/orders.parquet").filter(
        (F.col("o_orderdate").cast("timestamp") >= lo)
        & (F.col("o_orderdate").cast("timestamp") < hi)
    )
    li = _pq(spark, f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_returnflag") == "R"
    )
    c = _pq(spark, f"{sf_dir}/customer.parquet")
    n = _pq(spark, f"{sf_dir}/nation.parquet")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer left join orders (with a join-side
    filter), orders-per-customer count, then a histogram of those
    counts.  Two inherent shuffles (per-customer, then per-count) —
    the second operates on |customers| rows, not |orders|."""
    c = _pq(spark, f"{sf_dir}/customer.parquet").select("c_custkey")
    o = _pq(spark, f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: single-month lineitem scan joined to the part
    dim (broadcast), conditional aggregate ratio — promo revenue as a
    percentage of total.  One shuffle-free map side join + one
    single-group aggregate."""
    lo = F.to_timestamp(F.lit("1996-09-01"))
    hi = F.to_timestamp(F.lit("1996-10-01"))
    li = _pq(spark, f"{sf_dir}/lineitem.parquet").filter(
        (F.col("l_shipdate").cast("timestamp") >= lo)
        & (F.col("l_shipdate").cast("timestamp") < hi)
    )
    p = _pq(spark, f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_type"
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0))
                / F.sum(disc),
                6,
            ).alias("promo_revenue_pct")
        )
    )


def q_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: find orders whose total quantity exceeds a
    threshold (groupBy + having over the fact table), then semi-join
    the qualifying keys back through orders to customers.  The
    qualifying-key set is tiny, so it broadcasts into both joins."""
    li = _pq(spark, f"{sf_dir}/lineitem.parquet")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    o = _pq(spark, f"{sf_dir}/orders.parquet")
    c = _pq(spark, f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name"
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "o_orderdate_us"
            ),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


def q_idle_high_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance
    and no recent orders (none since 2000) — a scalar aggregate
    broadcast into the filter, then a left-anti join against the
    filtered orders, grouped by nation.  The scalar avg stays in-plan
    (cross join of a 1-row broadcast), never a driver collect."""
    c = _pq(spark, f"{sf_dir}/customer.parquet")
    o = (
        _pq(spark, f"{sf_dir}/orders.parquet")
        .filter(
            F.col("o_orderdate").cast("timestamp")
            >= F.to_timestamp(F.lit("2000-01-01"))
        )
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time daily windows per event_type (batch twin of the
    streaming windowed aggregation in tube_spark.streaming)."""
    ev = _pq(spark, f"{sf_dir}/events.parquet")
    # events.ts is parquet TIMESTAMP(NANOS) read as long ns (see session.py)
    ts = F.col("ts").cast("timestamp")
    return (
        ev.groupBy(
            F.date_trunc("day", ts).alias("day"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel (view -> click -> purchase) per user.

    Delegates to ``operators/funnel.py`` (library home since r4): all
    "first time reaching step N" columns are running mins over the
    SAME window spec (user_id, ordered by ts), so Catalyst computes
    the whole funnel in ONE shuffle + one per-partition sort — no
    self-joins, no per-step passes over the events table.  The final
    step-count aggregation runs on one row per user."""
    from tube_spark.operators.funnel import funnel_report

    ev = _pq(spark, f"{sf_dir}/events.parquet").select(
        "user_id",
        F.col("event_type"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return funnel_report(
        ev, ["view", "click", "purchase"], ts_col="ts_us"
    ).select(
        "n_users",
        "reached_view",
        "reached_click",
        "reached_purchase",
        F.col("conversion_pct").alias("view_to_purchase_pct"),
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their
    first signup event; activity counted per week offset from that
    cohort week.  Delegates to ``operators/funnel.py`` (library home
    since r4): both aggregations key on user_id first, so the events
    shuffle is reused; the per-user cohort frame is tiny and
    broadcasts into the enrich join."""
    from tube_spark.operators.funnel import cohort_retention

    ev = _pq(spark, f"{sf_dir}/events.parquet").select(
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").alias("ets"),
    )
    return (
        cohort_retention(ev, "signup", ts_col="ets", period="week")
        .select(
            F.unix_micros(F.col("cohort_period")).alias("cohort_week_us"),
            F.col("period_offset").alias("week_offset"),
            "n_active",
        )
        .orderBy("cohort_week_us", "week_offset")
    )


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MERGE (operators/merge.py): a deterministic delta
    derived from orders — updates (key % 7 == 0, price bump, status
    'U'), deletes (key % 21 == 0), inserts (key % 13 == 5, shifted
    keys) — upserted into the orders table, then summarized per
    status.  The merge is anti-join + union: the 100 TB target
    shuffles once, the delta is broadcast-sized, and no full-outer
    wide row is ever built."""
    from tube_spark.operators.merge import merge_upsert

    o = _pq(spark, f"{sf_dir}/orders.parquet")
    updates = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", F.col("o_totalprice") + 1000.0)
        .withColumn("_deleted", F.col("o_orderkey") % 21 == 0)
    )
    inserts = (
        o.filter(F.col("o_orderkey") % 13 == 5)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
        .withColumn("o_orderstatus", F.lit("N"))
        .withColumn("_deleted", F.lit(False))
    )
    delta = updates.unionByName(inserts)
    merged = merge_upsert(o, delta, ["o_orderkey"], delete_flag="_deleted")
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_totalprice"),
        )
        .orderBy("o_orderstatus")
    )


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 historization (operators/merge.py): each user's event
    stream becomes validity intervals of their current event_type,
    collapsing consecutive same-type deliveries.  One shuffle + one
    sort for lag-collapse AND lead-intervals (shared window spec;
    plan-asserted in tests/test_merge.py)."""
    from tube_spark.operators.merge import scd2

    ev = _pq(spark, f"{sf_dir}/events.parquet").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type",
    )
    hist = scd2(ev, ["user_id"], "ts_us", ["event_type"], collapse=True)
    return hist.select(
        "user_id",
        "event_type",
        F.col("valid_from").alias("valid_from_us"),
        F.col("valid_to").alias("valid_to_us"),
        "is_current",
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): each event + the customer's
    latest order at-or-before the event time.  One shuffle of |L|+|R|
    on the key — no per-key range cross-product; oracle is DuckDB's
    native ASOF JOIN."""
    from tube_spark.operators.asof import asof_join

    ev = _pq(spark, f"{sf_dir}/events.parquet").select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp").alias("ev_ts"),
    )
    # determinism: reduce right to ONE row per (key, t) — ties in order
    # date resolved to the highest orderkey on both sides
    orders = (
        _pq(spark, f"{sf_dir}/orders.parquet")
        .groupBy(F.col("o_custkey").alias("user_id"), F.col("o_orderdate"))
        .agg(
            F.max("o_orderkey").alias("last_orderkey"),
            F.max_by("o_totalprice", "o_orderkey").alias("last_totalprice"),
        )
        # NULL-payload probe: one-in-three right rows carries NULL here.
        # Per-column carry-forward would back-fill it from an OLDER
        # order (phantom row); the struct carry must return the NULL.
        .withColumn(
            "maybe_price",
            F.when(F.col("last_orderkey") % 3 != 0, F.col("last_totalprice")),
        )
    )
    out = asof_join(ev, orders, on="user_id", left_time="ev_ts", right_time="o_orderdate")
    return out.select(
        "event_id",
        "user_id",
        "last_orderkey",
        F.round("last_totalprice", 2).alias("last_totalprice"),
        F.round("maybe_price", 2).alias("maybe_price"),
    )


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed band join (operators/rangejoin.py): per event, how many
    orders the same customer placed in the 30 days up to the event.
    Times are integer microseconds on both sides so the BETWEEN
    boundaries are exact in Spark and DuckDB alike."""
    from tube_spark.operators.rangejoin import interval_point_join

    ev = _pq(spark, f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("ev_us")
    )
    orders = _pq(spark, f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("user_id"),
        # NTZ → TZ cast is identity under the UTC session timezone
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("ord_us"),
        "o_orderkey",
    )
    month_us = 30 * 24 * 3600 * 1_000_000
    pairs = interval_point_join(
        ev, orders, "ev_us", "ord_us", lower=-month_us, upper=0, on="user_id"
    )
    counts = pairs.groupBy("event_id").agg(F.count(F.lit(1)).alias("n_recent_orders"))
    return (
        ev.join(counts, "event_id", "left")
        .select(
            "event_id",
            F.coalesce("n_recent_orders", F.lit(0)).cast("long").alias("n_recent_orders"),
        )
    )


def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution time rollup: one pass emits
    day, month, year, and grand-total aggregates via GROUP BY ROLLUP on
    the time hierarchy (Catalyst plans a single shuffle with partial
    aggregation — the continuous-aggregate pattern at any scale)."""
    ev = _pq(spark, f"{sf_dir}/events.parquet")
    ts = F.col("ts").cast("timestamp")
    return (
        ev.select(
            F.year(ts).cast("long").alias("y"),
            F.month(ts).cast("long").alias("m"),
            F.dayofmonth(ts).cast("long").alias("d"),
            "value",
        )
        .rollup("y", "m", "d")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def q_sketch_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch accuracy, measured not assumed: HyperLogLog++ distinct
    counts and KLL-style approx quantiles scored against exact twins.

    Driver-matchable design (the r3 verdict's remaining no-oracle hole):
    each row carries an exact-side value DuckDB recomputes verbatim plus
    a within-bound boolean the sketch must genuinely satisfy —
    * hll_distinct_orderkeys: |approx-exact|/exact <= 0.05 (2.5 sigma at
      rsd=0.02);
    * kll_median_rank: the exact rank of the approx median must land in
      [0.45, 0.55] (rank-error contract of approx_percentile, acc 1e4).
    The booleans are computed from the real sketch outputs Spark-side;
    the oracle asserts TRUE — a sketch drifting out of bound flips the
    hash red.  Error floors additionally asserted in
    tests/test_sketches.py."""
    li = _pq(spark, f"{sf_dir}/lineitem.parquet")
    agg = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("cd_exact"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("cd_approx"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("med_approx"),
    )
    # exact rank of the approx median: one broadcast of a 1-row aggregate
    rank = li.crossJoin(F.broadcast(agg.select("med_approx"))).agg(
        F.avg(
            F.when(F.col("l_extendedprice") <= F.col("med_approx"), 1.0).otherwise(0.0)
        ).alias("rank_le")
    )
    both = agg.crossJoin(rank)
    row_ct = both.select(
        F.lit("exact_rowcount").alias("metric"),
        F.col("n_rows").cast("double").alias("exact_value"),
        F.lit(True).alias("within_bound"),
    )
    hll = both.select(
        F.lit("hll_distinct_orderkeys").alias("metric"),
        F.col("cd_exact").cast("double").alias("exact_value"),
        (
            F.abs(F.col("cd_approx") - F.col("cd_exact")) / F.col("cd_exact")
            <= F.lit(0.05)
        ).alias("within_bound"),
    )
    kll = both.select(
        F.lit("kll_median_rank").alias("metric"),
        F.lit(0.5).alias("exact_value"),
        (F.abs(F.col("rank_le") - F.lit(0.5)) <= F.lit(0.05)).alias("within_bound"),
    )
    return row_ct.unionByName(hll).unionByName(kll)


def q_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE sketches — the property that matters at 100 TB: build
    HLL (distinct orderkeys) and KLL (price quantiles) sketches PER
    GROUP, then produce the global figures by MERGING the tiny group
    sketches (hll_union_agg; KLL folded pairwise with reduce) instead
    of rescanning the fact table.  Same driver contract as
    sketch_report: each row carries a DuckDB-recomputable exact value
    plus within-bound booleans computed from the real sketch outputs —
    * hll: |est−exact|/exact ≤ 0.05;
    * kll: the exact rank of the sketch median lands in [0.45, 0.55]
    (both also hold for the MERGED sketches, proving the union/merge
    path, not just the direct path)."""
    li = _pq(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", "l_orderkey", "l_extendedprice"
    )
    per = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_orderkey").alias("hs"),
        F.kll_sketch_agg_double("l_extendedprice").alias("ks"),
        F.countDistinct("l_orderkey").alias("cd_exact"),
    )
    merged = per.agg(
        F.hll_union_agg("hs").alias("hs"),
        F.collect_list("ks").alias("kss"),
    ).select(
        F.lit("merged").alias("scope"),
        "hs",
        F.reduce(
            F.slice("kss", 2, 1_000_000),
            F.col("kss")[0],
            lambda acc, x: F.kll_sketch_merge_double(acc, x),
        ).alias("ks"),
    )
    g_exact = li.agg(F.countDistinct("l_orderkey").alias("cd_exact"))
    scopes = (
        per.select(F.col("l_returnflag").alias("scope"), "hs", "ks", "cd_exact")
        .unionByName(merged.crossJoin(F.broadcast(g_exact)))
        .withColumn("est", F.hll_sketch_estimate("hs"))
        .withColumn(
            "med", F.kll_sketch_get_quantile_double("ks", F.lit(0.5))
        )
        .select("scope", "cd_exact", "est", "med")
    )
    # exact rank of each scope's sketch median: one broadcast of the
    # 4-row (scope, med) frame onto the fact scan
    meds = scopes.select("scope", "med")
    ranks = (
        li.select("l_returnflag", "l_extendedprice")
        .crossJoin(F.broadcast(meds))
        .filter((F.col("scope") == F.col("l_returnflag")) | (F.col("scope") == "merged"))
        .groupBy("scope")
        .agg(
            F.avg(
                F.when(F.col("l_extendedprice") <= F.col("med"), 1.0).otherwise(0.0)
            ).alias("rank_le")
        )
    )
    return (
        scopes.join(ranks, "scope")
        .select(
            "scope",
            F.col("cd_exact").cast("double").alias("exact_distinct"),
            (F.abs(F.col("est") - F.col("cd_exact")) / F.col("cd_exact") <= 0.05).alias(
                "hll_within_bound"
            ),
            (F.abs(F.col("rank_le") - 0.5) <= 0.05).alias("kll_rank_within_bound"),
        )
    )


def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: ranking window — top-2 orders per customer by price."""
    from pyspark.sql import Window

    o = _pq(spark, f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("price_rank", F.row_number().over(w))
        .filter(F.col("price_rank") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "price_rank")
    )


def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: analytic lag — days since the customer's previous order."""
    from pyspark.sql import Window

    o = _pq(spark, f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).cast("long").alias("days_since_prev"),
    )


def q_rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: ROLLUP subtotals over (returnflag, linestatus)."""
    li = _pq(spark, f"{sf_dir}/lineitem.parquet")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    )


def q_cube_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: CUBE over (returnflag, linestatus)."""
    li = _pq(spark, f"{sf_dir}/lineitem.parquet")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


def q_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: set ops — customers with both finished AND open orders, minus
    the BUILDING segment."""
    o = _pq(spark, f"{sf_dir}/orders.parquet")
    c = _pq(spark, f"{sf_dir}/customer.parquet")
    f_cust = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    o_cust = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    return f_cust.intersect(o_cust).exceptAll(building.distinct()).select(
        F.col("k").alias("custkey")
    )


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: left-anti join — customers with no orders."""
    c = _pq(spark, f"{sf_dir}/customer.parquet")
    o = _pq(spark, f"{sf_dir}/orders.parquet")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction (the engine's _props model applied to the
    events.props blob): per event_type stats over a JSON-embedded field."""
    ev = _pq(spark, f"{sf_dir}/events.parquet")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(k).alias("n_with_k"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: ntile quartiles of order value.  The tile comes from the
    distributed global rank (operators/ranking.ntile_distributed —
    bit-identical to ``ntile(4) OVER (ORDER BY …)``, which the oracle
    replays), never a single-task global window over the data-scale
    orders frame (r14: the last such window was audited out;
    tests/test_plan_audit.py now bans the shape registry-wide)."""
    from tube_spark.operators.ranking import ntile_distributed

    o = _pq(spark, f"{sf_dir}/orders.parquet")
    t = ntile_distributed(
        o, 4, ["o_totalprice", "o_orderkey"], tile_col="quartile"
    )
    return t.groupBy("quartile").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


def q_ntile_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path twin of window_ntile: SQL NTILE semantics via
    range-partition + per-partition local windows + offset arithmetic —
    no single-partition global window anywhere in the plan (the
    TeraSort-style distributed global rank, operators/ranking.py)."""
    from tube_spark.operators.ranking import ntile_distributed

    o = _pq(spark, f"{sf_dir}/orders.parquet")
    tiles = ntile_distributed(
        o, k=7, order_cols=["o_totalprice", "o_orderkey"], tile_col="tile"
    )
    return tiles.select("o_orderkey", "tile")


def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-DSL LIKE extension over the mapping compiler."""
    src = star_schema_source(spark, sf_dir)
    m = parse_mapping(
        {
            "name": "p", "doc_type": "part", "type": "aggregator", "root": "part",
            "props": [{"name": "p_name"}, {"name": "p_type"}, {"name": "p_size"}],
            "filter": {
                "op": "and",
                "logics": [
                    {"op": "like", "prop": "p_type", "value": "S%"},
                    {"op": ">=", "prop": "p_size", "value": 10},
                ],
            },
        }
    )
    df = Aggregator(src, m).translate()
    return df.select("_part_id", "p_name", "p_type", "p_size")


def q_stats_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per segment: exact median (interpolated
    percentile), stddev, correlation."""
    o = _pq(spark, f"{sf_dir}/orders.parquet")
    c = _pq(spark, f"{sf_dir}/customer.parquet")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    return j.groupBy("c_mktsegment").agg(
        F.round(F.percentile("o_totalprice", 0.5), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", 0.9), 4).alias("p90_price"),
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_price"),
        F.round(F.corr("o_totalprice", "c_acctbal"), 6).alias("price_balance_corr"),
        F.count(F.lit(1)).alias("n"),
    )


def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per priority with one column per status."""
    o = _pq(spark, f"{sf_dir}/orders.parquet")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
    )


def q_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/regex functions: numeric suffix of c_name, length, case ops."""
    c = _pq(spark, f"{sf_dir}/customer.parquet")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)$", 1).cast("long").alias("name_num"),
        F.length("c_name").cast("long").alias("name_len"),
        F.upper(F.substring("c_name", 1, 8)).alias("prefix_upper"),
    )


def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions per user over the events stream (batch form)."""
    from tube_spark.operators.sessions import sessionize

    ev = _pq(spark, f"{sf_dir}/events.parquet").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    return sessionize(ev, gap_minutes=30)


def q_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: global sort + limit — 20 most expensive orders."""
    o = _pq(spark, f"{sf_dir}/orders.parquet")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# corpus-curation operators (beyond-reference scope)
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tube_spark.operators.dedup import exact_duplicates

    out = exact_duplicates(_docs(spark, sf_dir), "doc_id", "text", normalized=False)
    # member_ids serialized (sorted ascending) for the driver canonicalizer.
    return out.select(
        "content_hash",
        "canonical_id",
        "n_copies",
        F.array_join(
            F.transform("member_ids", lambda x: x.cast("string")), "|"
        ).alias("member_ids"),
    )


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tube_spark.operators.text_analysis import text_stats

    return text_stats(_docs(spark, sf_dir))


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition filter (Rae et al. 2021):
    per doc, the most-frequent-k-gram coverage and repeated-k-gram
    fraction for k=1,2,3 plus an is_repetitive verdict.  One exploded
    pass, every aggregation keyed on doc_id — linear in corpus tokens,
    no per-document quadratic work (operators/text_analysis.py)."""
    from tube_spark.operators.text_analysis import repetition_stats

    return repetition_stats(_docs(spark, sf_dir))


def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/decontamination.py): flag
    training docs sharing word 5-grams with a held-out benchmark slice
    (doc_id % 17 == 0).  Benchmark shingle index broadcast; corpus
    streams map-side; one shuffle keyed on the contaminated pair."""
    from tube_spark.operators.decontamination import contamination_pairs

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    corpus = docs.filter(F.col("doc_id") % 17 != 0)
    return contamination_pairs(corpus, bench, n=5, min_hits=1)


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key detection (operators/heavyhitters.py): per-partition
    Misra-Gries candidate summaries (bounded memory, ≤k rows emitted
    per partition) + broadcast-candidate exact re-count — the two-scan
    pattern that finds skewed join/agg keys at 100 TB without
    shuffling every distinct key.  Result is exact and partitioning-
    independent, hence the plain GROUP BY/HAVING oracle."""
    from tube_spark.operators.heavyhitters import heavy_hitters

    _ensure(spark)
    events = _pq(spark, f"{sf_dir}/events.parquet")
    return heavy_hitters(events, "user_id", min_share=0.0075)


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key (operators/layout.py): the code
    that ``write_zordered`` range-partitions on so parquet min/max
    stats prune multi-dimensional band predicates.  Fixed bounds
    (0, 255) make bucketization the identity, so the oracle replays
    the interleave with exact integer bit math."""
    from tube_spark.operators.layout import zorder_key

    _ensure(spark)
    ev = _pq(spark, f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", (F.col("event_id") % 256).alias("e8")
    )
    frame, z = zorder_key(
        ev, ["user_id", "e8"], bits=8, bounds={"user_id": (0, 255), "e8": (0, 255)}
    )
    return frame.select("event_id", "user_id", z.alias("zval"))


def q_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality suite (operators/quality_checks.py):
    every row-level constraint on a table compiles into ONE aggregate
    pass (Deequ-style); FK containment is a broadcast left join.  All
    metrics are deterministic fractions, hence the SQL oracle."""
    from tube_spark.operators.quality_checks import (
        accepted_values,
        completeness,
        in_bounds,
        matches,
        referential,
        row_count,
        uniqueness,
        validate,
    )

    _ensure(spark)
    orders = _pq(spark, f"{sf_dir}/orders.parquet")
    lineitem = _pq(spark, f"{sf_dir}/lineitem.parquet")
    customer = _pq(spark, f"{sf_dir}/customer.parquet")
    return (
        validate(
            orders,
            [
                completeness("o_custkey"),
                uniqueness("o_orderkey"),
                accepted_values("o_orderstatus", ["O", "F", "P"]),
                row_count(1000),
            ],
        )
        .unionByName(
            validate(
                lineitem,
                [in_bounds("l_quantity", 1, 50), in_bounds("l_discount", 0.0, 0.1)],
            )
        )
        .unionByName(validate(customer, [matches("c_name", "^Customer#")]))
        .unionByName(referential(lineitem, "l_orderkey", orders, "o_orderkey"))
        .unionByName(referential(orders, "o_custkey", customer, "c_custkey"))
    )


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus version diff (operators/snapshot.py): one fingerprint-
    compare full-outer join between snapshot v1 (documents as-is) and a
    deterministically mutated v2 (every 13th doc removed, every 7th
    text changed, every 17th re-added under a new id)."""
    from tube_spark.operators.snapshot import snapshot_diff

    docs = _docs(spark, sf_dir)
    v2 = (
        docs.filter(F.col("doc_id") % 13 != 5)
        .withColumn(
            "text",
            F.when(F.col("doc_id") % 7 == 0, F.upper("text")).otherwise(
                F.col("text")
            ),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 17 == 3).withColumn(
                "doc_id", F.col("doc_id") + F.lit(1000000)
            )
        )
    )
    return snapshot_diff(docs, v2, "doc_id", compare_cols=["text"])


def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiler (operators/profile.py): counts,
    nulls, exact distinct, min/max/mean/stddev for every profiled
    column from ONE aggregate over one scan."""
    from tube_spark.operators.profile import profile

    _ensure(spark)
    orders = _pq(spark, f"{sf_dir}/orders.parquet")
    return profile(
        orders, ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"]
    )


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-width histogram with frozen bounds
    (operators/profile.py): deterministic, append-comparable bins;
    out-of-range values clamp into the edge bins."""
    from tube_spark.operators.profile import histogram

    _ensure(spark)
    lineitem = _pq(spark, f"{sf_dir}/lineitem.parquet")
    return histogram(lineitem, "l_extendedprice", 0.0, 60000.0, bins=12)


def q_ann_lsh_topk_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH top-k pipeline under portable integer-lattice
    hyperplanes (operators/similarity.py ``portable_hyperplanes``):
    identical plumbing to the rows-only gaussian ``ann_lsh_topk`` —
    Arrow signatures, band buckets, id-only candidate join, exact
    cosine re-score, per-query ranking — but every stage is
    reproducible in SQL, so the WHOLE pipeline gets a DuckDB oracle
    (the same portability trade as ``semantic_dedup``)."""
    from tube_spark.operators.similarity import portable_hyperplanes, rhp_lsh_topk

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 29 == 0)
    return rhp_lsh_topk(
        emb,
        queries,
        dim=64,
        k=10,
        bits=16,
        bands=4,
        planes=portable_hyperplanes(64, 16),
    )


def q_stratified_fixed_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k per-stratum sampling (operators/sampling.py
    ``stratified_fixed_k``): two-phase skew-resistant selection whose
    result is identical to a single salted-hash window — which is
    exactly what the oracle replays."""
    from tube_spark.operators.sampling import stratified_fixed_k

    return stratified_fixed_k(_docs(spark, sf_dir), "lang", 20, "doc_id")


def q_grouped_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant grouped top-k (operators/ranking.py
    ``grouped_topk``): two-phase candidate selection equal to the
    per-group window definition — which is what the oracle replays."""
    from tube_spark.operators.ranking import grouped_topk

    _ensure(spark)
    orders = _pq(spark, f"{sf_dir}/orders.parquet")
    return grouped_topk(
        orders, ["o_orderpriority"], "o_totalprice", 3, tiebreak_col="o_orderkey"
    ).select("o_orderpriority", "o_orderkey", "o_totalprice", "rank")


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (operators/sampling.py ``weighted_sample_k``, Efraimidis-Spirakis
    keys from the portable hash): TakeOrderedAndProject plan, oracle
    replays ln(u)/w ranking in SQL."""
    from tube_spark.operators.sampling import weighted_sample_k

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
    return weighted_sample_k(docs, "n_chars", 50, "doc_id")


def q_outlier_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier gating per group (operators/profile.py
    ``iqr_outliers``): one grouped exact-quartile aggregate broadcast
    back against the stream side."""
    from tube_spark.operators.profile import iqr_outliers

    _ensure(spark)
    li = _pq(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )
    return iqr_outliers(li, "l_extendedprice", by="l_returnflag")


def q_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-free text embeddings via the hashing trick
    (operators/featurize.py): signed-hash word-bigram features,
    L2-normalized, in sparse (doc_id, idx, val) form — the
    fully-oracled on-ramp from documents into the vector operators."""
    from tube_spark.operators.featurize import hashed_ngram_features_sparse

    return hashed_ngram_features_sparse(
        _docs(spark, sf_dir), dim=64, n=2
    ).select("doc_id", "idx", "val")


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining (operators/mining.py): exact
    top-candidate_k cosine search, label anti-match, re-rank to k —
    the oracle replays the same two-window pipeline."""
    from tube_spark.operators.mining import hard_negatives

    emb = _emb(spark, sf_dir)
    return hard_negatives(
        # .limit(5) = structural bound for the plan audit (the filter
        # already yields exactly vec_ids 0-4)
        emb, k=3, candidate_k=30, anchors=emb.filter(F.col("vec_id") < 5).limit(5)
    )


def q_class_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic class-balanced resampling (operators/mining.py):
    exactly `target` rows per label via hash-ranked replication /
    downsampling; output is (vec_id, label, copy)."""
    from tube_spark.operators.mining import class_balanced

    emb = _emb(spark, sf_dir).select("vec_id", "label")
    return class_balanced(emb, "label", target=50).select(
        "vec_id", "label", F.col("copy").cast("integer").alias("copy")
    )


def q_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-ordered triangle count (operators/triangles.py) on the
    part co-occurrence graph: parts are adjacent when they appear in
    the same order (a deterministic 25% order sample — l_orderkey%4=0 —
    of the lineitem projection; hot groups capped at 10 members before
    the pair join).  Exact triangle work is inherently Sum(outdeg^2)
    wedges, so the census runs on a fixed sample fraction; the operator
    itself is general.  Parts and orders both scale
    linearly, so the graph's density is sf-INVARIANT (~25 avg degree)
    — unlike the supplier projection, which densifies toward a clique
    as orders outgrow the supplier pool.  Orientation bounds the wedge
    join's fan-out by O(sqrt(m)) per vertex regardless of hub degree."""
    from tube_spark.operators.triangles import cooccurrence_edges, triangle_stats

    li = _pq(spark, f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_orderkey") % 4 == 0
    )
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", max_group=10)
    return triangle_stats(edges)


def q_triangle_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOULION edge-sparsified triangle estimate (p=0.7) over the same
    part co-occurrence graph as triangle_stats — the census scale dial:
    wedge work shrinks ~1/p^3 while the estimate stays unbiased.
    Deterministic salted-hash sparsification, fully SQL-replayed."""
    from tube_spark.operators.triangles import (
        cooccurrence_edges,
        triangle_stats_sampled,
    )

    li = _pq(spark, f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_orderkey") % 4 == 0
    )
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", max_group=10)
    return triangle_stats_sampled(edges, p=0.7)


def q_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous label propagation (operators/
    communities.py), 3 rounds over the same part co-occurrence graph
    as triangle_stats — per-node community labels, trajectory replayed
    exactly by the unrolled SQL oracle."""
    from tube_spark.operators.communities import label_propagation
    from tube_spark.operators.triangles import cooccurrence_edges

    li = _pq(spark, f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_orderkey") % 4 == 0
    )
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", max_group=10)
    return label_propagation(edges, iters=3)


def q_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling (operators/kcore.py), k=16, 3 fixed synchronous
    rounds over the same part co-occurrence graph as triangle_stats —
    the dense-backbone extractor completing the graph family.  Fixed
    rounds = portable trajectory: the oracle unrolls the identical
    peel rounds, and rounds past the fixpoint are provably no-ops, so
    the contract holds at any scale factor regardless of convergence."""
    from tube_spark.operators.kcore import k_core
    from tube_spark.operators.triangles import cooccurrence_edges

    li = _pq(spark, f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_orderkey") % 4 == 0
    )
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", max_group=10)
    return k_core(edges, k=16, rounds=3)


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PageRank (operators/pagerank.py) on the supplier-part
    bipartite graph from lineitem (parts offset by 1e6 to keep node ids
    disjoint; both directions, so no dangling mass).  Fixed 3
    iterations — the oracle unrolls the identical trajectory in SQL,
    the kmeans/classifier portable-trajectory pattern."""
    from tube_spark.operators.pagerank import pagerank

    _ensure(spark)
    li = _pq(spark, f"{sf_dir}/lineitem.parquet")
    fwd = li.select(
        F.col("l_suppkey").alias("src"),
        (F.col("l_partkey") + 1000000).alias("dst"),
    ).distinct()
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return pagerank(edges, iterations=3).select("node", "rank")


def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution (operators/entities.py): part names + typo
    variants (every 7th part, last char mutated) resolve through
    prefix blocking, normalized-Levenshtein scoring, and the shared
    connected-components clustering; oracle = Levenshtein + recursive
    closure in SQL."""
    from tube_spark.operators.entities import resolve_entities

    _ensure(spark)
    part = _pq(spark, f"{sf_dir}/part.parquet")
    base = part.select(F.col("p_partkey").alias("rid"), F.col("p_name").alias("name"))
    variants = part.filter(F.col("p_partkey") % 7 == 0).select(
        (F.col("p_partkey") + 1000000).alias("rid"),
        F.concat(
            F.expr("substring(p_name, 1, length(p_name) - 1)"), F.lit("x")
        ).alias("name"),
    )
    recs = base.unionByName(variants)
    # collapse_exact = the scale path (identical results: exact-equal
    # names score 1.0 either way; proven in test_entities.py and by
    # this very oracle, which models the naive all-pairs form)
    return resolve_entities(
        recs, "rid", F.substring("name", 1, 6), [("name", 1.0)],
        threshold=0.88, collapse_exact=True,
    )


def q_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided containment detection (operators/dedup.py
    ``ngram_containment_pairs``): trigram |A∩B|/|A| catches quoted /
    subset documents that symmetric Jaccard misses; same inverted-index
    shape, fully oracled."""
    from tube_spark.operators.dedup import ngram_containment_pairs

    return ngram_containment_pairs(
        _docs(spark, sf_dir), "doc_id", "text", n=3, threshold=0.5
    )


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the early and late halves of
    lineitem by ship date (operators/profile.py ``psi_drift``): frozen
    value_histogram bins, epsilon-floored log, top-contributing bin."""
    from tube_spark.operators.profile import psi_drift

    _ensure(spark)
    li = _pq(spark, f"{sf_dir}/lineitem.parquet")
    old = li.filter(F.col("l_shipdate") < F.lit("1995-06-01"))
    new = li.filter(F.col("l_shipdate") >= F.lit("1995-06-01"))
    return psi_drift(old, new, "l_extendedprice", 0.0, 60000.0, bins=12)


def q_cluster_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c-TF-IDF cluster labeling (operators/topics.py): top distinctive
    terms per document source (clusters are opaque ints in production;
    source is the deterministic stand-in here)."""
    from tube_spark.operators.topics import cluster_terms

    docs = _docs(spark, sf_dir).withColumn("cluster", F.col("source"))
    return cluster_terms(docs, "cluster", top_k=5).select(
        "cluster", "term", "tf", "score", "rank"
    )


def q_data_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-weighted mixture under a token budget
    (operators/mixture.py): web-scale mixture assembly with a
    distributed two-phase per-source prefix sum (packing.py pattern,
    NOT a one-task-per-source window), salted-hash selection order."""
    from tube_spark.functions.text import tokens as _tokens
    from tube_spark.operators.mixture import mixture_sample

    docs = _docs(spark, sf_dir).select(
        "doc_id", "source", F.size(_tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    sel = mixture_sample(
        docs, {"src1": 2.0, "src2": 1.0, "src3": 1.0, "src5": 1.0}, 6000
    )
    return sel.select("doc_id", "source", "n_tokens", "cum_before")


def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style document chunking (operators/chunking.py): overlapping
    32-token windows with stride 24, stable (doc, index) identity and
    offsets.  Map-only — no shuffle in the plan."""
    from tube_spark.operators.chunking import chunk_documents

    return chunk_documents(_docs(spark, sf_dir), chunk_tokens=32, overlap=8)


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-SPAN coverage (the Lee et al.,
    ACL 2022 fixed-width-window approximation of suffix-array substring
    dedup; operators/spandedup.py): per document, how many 6-token
    windows also appear verbatim in another document, and the fraction
    of its tokens covered by the union of those windows.  Pure
    inverted-index membership — no pair join anywhere; the corpus is
    scanned twice instead of persisting a corpus-sized positional
    index (SCALE note in the module docstring)."""
    from tube_spark.operators.spandedup import span_dup_stats

    return span_dup_stats(_docs(spark, sf_dir), k=6, portable=True)


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus distributed Lloyd k-means (operators/clustering.py):
    k=4, 3 iterations, portable smallest-ids init, centers rounded to 6
    decimals each update so the whole trajectory is bit-reproducible in
    DuckDB.  Assignment is map-only codegen; each update shuffles only
    k×dim partial means."""
    from tube_spark.operators.clustering import kmeans

    emb = _pq(spark, f"{sf_dir}/embeddings.parquet")
    return kmeans(emb, "vec_id", "embedding", k=4, iters=3, round_to=6).select(
        "vec_id", "cluster"
    )


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trainable reference-like-document classifier
    (operators/classifier.py): logistic regression over four native
    text features, full-batch GD (10 iterations, lr 1.0) — the
    CCNet-style quality gate.  Labels: a composite editorial rule
    (stopword presence AND lexical diversity) the linear model must
    approximate, reaching ~0.85 accuracy here.  Per iteration: one
    partial-aggregated scan producing a 5-value gradient row; weights
    rounded to 6 decimals so the DuckDB oracle replays the identical
    trajectory and hash-matches every per-doc score."""
    from tube_spark.operators.classifier import quality_classifier, text_features

    docs = _docs(spark, sf_dir)
    feats = text_features(F.col("text"))
    label = (feats["f_stopfrac"] > 0.05) & (feats["f_distinct"] > 0.45)
    return quality_classifier(docs, label, lr=1.0, iters=10)


def q_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash (winnowing) document fingerprints — any shared run
    of ≥ k+window−1 words between two docs shares a fingerprint."""
    from tube_spark.operators.text_analysis import winnowing_fingerprints

    out = winnowing_fingerprints(_docs(spark, sf_dir), "doc_id", "text", k=3, window=4)
    # fingerprints serialized (sorted distinct) for the driver canonicalizer.
    return out.select(
        "doc_id",
        F.array_join(
            F.transform("fingerprints", lambda x: x.cast("string")), "|"
        ).alias("fingerprints"),
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact unigram-Jaccard pairs via PPJoin-style prefix filtering
    (operators/dedup.py _jaccard_pairs_prefix): LOSSLESS for the
    threshold, so the oracle is the same exact-pair SQL as the full
    inverted-index path — but only each document's rarest
    sz - ceil(t*sz) + 1 shingles enter the self-join (5.3x at sf0.1:
    158.8 -> 30.0 s, identical 2.97M pairs; the full path is the
    pytest-pinned equivalence twin)."""
    from tube_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _docs(spark, sf_dir), "doc_id", "text", n=1, threshold=0.8,
        prefix_filter=True,
    )


def q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs → dedup GROUPS: MinHash-LSH candidate pairs fed through
    distributed connected components (large-star/small-star,
    operators/components.py), every document labeled with its
    duplicate-cluster id, cluster size, and a keep/drop verdict — the
    real dedup pipeline shape (banded LSH candidates, never all-pairs;
    an exact unigram-Jaccard edge source was tried and OOMed at sf0.1
    on the dense synthetic vocab).  The oracle recomputes the full
    portable LSH pipeline and closes it transitively with a recursive
    CTE — a full-value check of an ITERATIVE algorithm."""
    from tube_spark.operators.components import dedup_groups
    from tube_spark.operators.dedup import minhash_lsh_pairs

    docs = _docs(spark, sf_dir)
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", n=2, num_hashes=64, bands=16,
        threshold=0.5, portable=True,
    )
    return dedup_groups(docs, pairs)


def q_dataset_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/val/test assignment + nested 10% subsample
    (operators/sampling.py): membership keys off a salted portable md5
    hash of the id — map-only, partition-independent, recomputable by
    any external system.  Per split: doc count, BPE-ish token budget,
    and the deterministic 10%-sample size."""
    from tube_spark.functions.text import token_count_bpe_ish
    from tube_spark.operators.sampling import hash_split, stratified_sample

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    split = hash_split(docs)
    sampled = stratified_sample(
        split.select("doc_id", "split"), "split",
        {"train": 0.1, "val": 0.1, "test": 0.1},
    ).select("doc_id", F.lit(1).alias("in_sample"))
    return (
        split.join(sampled, "doc_id", "left")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count_bpe_ish(F.col("text"))).alias("n_tokens"),
            F.count("in_sample").alias("n_sample_10pct"),
        )
    )


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-group-aware train/val/test split
    (operators/sampling.py leakage_safe_split): near-duplicate
    documents (same MinHash-LSH pairs as `dedup_groups`) are first
    closed into connected components, then the salted portable-hash
    split bucket is computed on the GROUP id — so a near-copy of a
    test document can never sit in train.  Output: every document with
    its group and split; the oracle recomputes the LSH pipeline, the
    transitive closure, and the md5 bucket chain end to end."""
    from tube_spark.operators.dedup import minhash_lsh_pairs
    from tube_spark.operators.sampling import leakage_safe_split

    docs = _docs(spark, sf_dir).select("doc_id")
    pairs = minhash_lsh_pairs(
        _docs(spark, sf_dir), "doc_id", "text", n=2, num_hashes=64,
        bands=16, threshold=0.5, portable=True,
    )
    return leakage_safe_split(docs, pairs).select("doc_id", "group_id", "split")


def q_corpus_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-overlap estimation WITHOUT a join (operators/overlap.py):
    split the corpus into two halves by doc_id parity, sketch each
    half's word-bigram set with K-Minimum-Values (k=256, md5-portable
    hashes), and estimate per-half distinct counts, union size,
    Jaccard, and intersection size from the sketches alone — the
    set-INTERSECTION capability HLL union cannot give.  The oracle
    replays shingling, the k minima, and the KMV estimator arithmetic
    end to end."""
    from tube_spark.functions.text import tokens, word_shingles
    from tube_spark.operators.overlap import corpus_overlap

    docs = _docs(spark, sf_dir)
    el = docs.select(
        F.when(F.col("doc_id") % 2 == 0, F.lit("even"))
        .otherwise(F.lit("odd"))
        .alias("corpus"),
        F.explode(word_shingles(tokens(F.col("text")), 2)).alias("element"),
    )
    out = corpus_overlap(el, "even", "odd", k=256)
    return out.select(*[F.round(F.col(c), 4).alias(c) for c in out.columns])


def q_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs corpus overlap (operators/overlap.py overlap_matrix):
    split the corpus into four sources by doc_id mod 4, sketch each
    source's word-bigram set ONCE with K-Minimum-Values (k=256,
    md5-portable hashes), and report every unordered pair's distinct /
    union / Jaccard / intersection estimates — the mixture-design
    "how redundant are my sources?" view from one sketch pass.  The
    oracle replays the per-corpus sketches and the C(4,2) pairwise
    estimator arithmetic via a self-join over the sketch CTE."""
    from tube_spark.functions.text import tokens, word_shingles
    from tube_spark.operators.overlap import overlap_matrix

    docs = _docs(spark, sf_dir)
    el = docs.select(
        F.concat(F.lit("c"), (F.col("doc_id") % 4).cast("string")).alias("corpus"),
        F.explode(word_shingles(tokens(F.col("text")), 2)).alias("element"),
    )
    out = overlap_matrix(el, k=256)
    num = [c for c in out.columns if c not in ("corpus_a", "corpus_b")]
    return out.select(
        "corpus_a", "corpus_b",
        *[F.round(F.col(c), 4).alias(c) for c in num],
    )


def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA's moment pass (operators/pca.py gram_matrix):
    the 64x64 upper-triangle second-moment sums of the embedding
    corpus, computed as ONE Arrow pass of bounded per-batch output
    (a BLAS Gram partial per batch, dim*(dim+1)/2 rows reduced by a
    tiny groupBy — never an exploded self-join).  Elements are
    quantized to int64 (round-half-up at scale 1e4) so the sums are
    exact integers any SQL engine reproduces regardless of summation
    order; pca_fit consumes the full-precision float twin of this
    pass.  The oracle materializes the same entries via an exploded
    per-row self-join — the O(n*dim^2) shape this operator exists to
    avoid."""
    from tube_spark.operators.pca import gram_matrix

    return gram_matrix(_emb(spark, sf_dir), dim=64).orderBy("i", "j")


def q_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights (operators/mixture.py
    mixture_weights): per-source token mass -> sampling weight
    w_i = n_i^0.5 / sum_j n_j^0.5 (the multilingual upsampling recipe)
    and the token allocation under a 1M budget — the step that
    COMPUTES the weights data_mixture then samples under.  alpha=0.5
    keeps the oracle exact: sqrt is correctly rounded IEEE in both
    engines, so only the 3-addend normalization sum can differ (last
    bit, absorbed by the 6 dp rounding)."""
    from tube_spark.functions.text import token_count_bpe_ish
    from tube_spark.operators.mixture import mixture_weights

    src = (
        F.when(F.col("doc_id") % 10 < 6, F.lit("web"))
        .when(F.col("doc_id") % 10 < 9, F.lit("books"))
        .otherwise(F.lit("code"))
    )
    d = _docs(spark, sf_dir).select(
        src.alias("source"), token_count_bpe_ish(F.col("text")).alias("n_tok")
    )
    return mixture_weights(
        d, "source", "n_tok", alpha=0.5, total_budget=1_000_000
    ).orderBy("source")


def q_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard LAYOUT (sinks/shards.py plan_shards): the
    cumulative-token assignment the training-shard export sink writes,
    as a queryable frame — documents ordered by a portable md5 shuffle
    hash, whole docs landing in the 2000-token window their first
    token starts in; output (shard, n_docs, n_tokens).  This gives the
    sink's prefix-sum + assignment math a full DuckDB oracle (the
    engine-native xxhash64 export path shares the same code — the
    ann_lsh_topk_portable pairing)."""
    from tube_spark.functions.text import portable_hash60, token_count_bpe_ish
    from tube_spark.sinks.shards import plan_shards

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        token_count_bpe_ish(F.col("text")).alias("n_tok"),
        portable_hash60(
            F.concat(F.lit("shard"), F.col("doc_id").cast("string"))
        ).alias("ok"),
    )
    return plan_shards(docs, "doc_id", "n_tok", 2000, order_col="ok")


def q_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeepWalk-style walk corpus (operators/walks.py): 2 deterministic
    3-step walks per node over the shared part co-occurrence graph —
    graph-embedding training data.  The "random" choice at each step
    is the salted-hash argmax over the frontier's neighbors, so the
    oracle replays every step (unrolled row_number rounds)."""
    from tube_spark.operators.triangles import cooccurrence_edges
    from tube_spark.operators.walks import random_walks

    li = _pq(spark, f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_orderkey") % 4 == 0
    )
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", max_group=10)
    return random_walks(edges, walk_len=3, walks_per_node=2)


def q_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF keyword extraction (operators/retrieval.py
    doc_keywords): top-3 smooth-TF-IDF terms per document via the
    funnel-free grouped top-k; ranks order by the unrounded score with
    term tie-breaks, so the oracle's row_number replay is exact."""
    from tube_spark.operators.retrieval import doc_keywords

    return doc_keywords(_docs(spark, sf_dir), k=3)


def q_k_truss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-truss peeling (operators/kcore.py k_truss), k=6, 2 fixed
    synchronous rounds over the same part co-occurrence graph as the
    census — the EDGE-cohesion analog of k_core: membership requires
    triangle embeddedness, not just degree.  Fixed rounds = portable
    trajectory; the oracle unrolls identical support->filter rounds."""
    from tube_spark.operators.kcore import k_truss
    from tube_spark.operators.triangles import cooccurrence_edges

    li = _pq(spark, f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_orderkey") % 4 == 0
    )
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", max_group=10)
    return k_truss(edges, k=6, rounds=2)


def q_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (operators/mining.py
    association_rules): part pairs co-ordered in >= 2 orders
    (mega-baskets capped at 10 items before the quadratic pair join —
    the cooccurrence_edges hazard), with support / both confidences /
    lift.  The oracle replays membership, cap, pair counts, and the
    ratio arithmetic."""
    from tube_spark.operators.mining import association_rules

    li = _pq(spark, f"{sf_dir}/lineitem.parquet")
    return association_rules(
        li, "l_orderkey", "l_partkey", min_pair_count=2, max_basket=10
    )


def q_sentence_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-window RAG chunking (operators/chunking.py
    sentence_chunks): sentences extracted on the Java/RE2 common
    regex subset, grouped 3 per chunk, text rejoined in explicit
    sentence order (never collect_list arrival order).  Map-only
    until the per-(doc, chunk) regroup; the oracle replays the
    extraction and grouping character-for-character."""
    from tube_spark.operators.chunking import sentence_chunks

    return sentence_chunks(_docs(spark, sf_dir), sentences_per_chunk=3)


def q_neardup_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How group-like is the near-dup relation BEFORE connected
    components runs: the degree-ordered triangle census
    (operators/triangles.py) over the portable MinHash-LSH pair graph
    (operators/dedup.py — the exact minhash_lsh driver query's pairs).
    High global clustering means LSH pairs close into cliques (dup
    GROUPS, safe to pick one survivor per component); low clustering
    means chains, where transitive grouping over-merges.  Oracle =
    the full LSH pipeline CTE feeding the SAME census SQL as
    triangle_stats — two independently-oracled operators composed, and
    the composition re-oracled end to end."""
    from tube_spark.operators.dedup import minhash_lsh_pairs
    from tube_spark.operators.triangles import triangle_stats

    pairs = minhash_lsh_pairs(
        _docs(spark, sf_dir), "doc_id", "text", n=2, num_hashes=64,
        bands=16, threshold=0.5, portable=True,
    )
    return triangle_stats(
        pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    )


def _span_candidate_pairs(docs: DataFrame) -> DataFrame:
    """The SHARED candidate set for q_exact_spans and
    q_span_quarantine (their oracles replay the same construction, so
    the two queries must never drift apart): portable MinHash-LSH
    pairs UNION the deterministic consecutive-id probe set."""
    from tube_spark.operators.dedup import minhash_lsh_pairs

    lsh = minhash_lsh_pairs(
        docs, "doc_id", "text", n=2, num_hashes=64,
        bands=16, threshold=0.5, portable=True,
    ).select("id_a", "id_b")
    ids = docs.select("doc_id")
    probe = ids.select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b")
    ).join(ids.select(F.col("doc_id").alias("id_b")), "id_b").select(
        "id_a", "id_b"
    )
    return lsh.unionByName(probe)


def q_exact_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact maximal duplicate substrings (operators/exactspans.py,
    the suffix-array semantics of Lee et al. resolved pair-exactly):
    candidate pairs = the portable MinHash-LSH pairs (full near-dups,
    whose maximal span is the whole shared text) UNION a deterministic
    consecutive-id probe set (partial template-phrase overlaps), spans
    of >= 20 characters with exact 1-based positions.  The oracle
    replays the LSH pipeline, the L-gram index (static series cross
    join), the pair-local gram match, and the diagonal
    gaps-and-islands run detection.

    The hostile-pair guard is wired at the measured 10M budget
    (exact_spans_with_quarantine is the pipeline twin that also emits
    the skipped-pair list): pair volumes here peak at ~507 at sf0.01,
    so the guard is structurally a no-op on this data and the
    unguarded oracle stays exact."""
    from tube_spark.operators.exactspans import exact_duplicate_spans

    docs = _docs(spark, sf_dir)
    return exact_duplicate_spans(
        docs, _span_candidate_pairs(docs), min_len=20,
        max_pair_matches=10_000_000,
    )


def q_span_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact-spans guard's quarantine arithmetic, ORACLED: the
    overweight-pair list (operators/exactspans.py
    exact_spans_overweight_pairs) over the same candidate set as
    q_exact_spans (shared _span_candidate_pairs helper, so the two can
    never drift apart), at a deliberately LOW budget (100) so the list
    is populated on this data (real volumes peak at ~507) — the oracle
    replays the LSH pipeline, the distinct-20-gram counts, the exact
    sum(ca*cb) shared-gram volume per pair, and the budget cut.  This
    pins the guard's NUMBERS, not just the verdict bit the hostile-pair
    pytest checks."""
    from tube_spark.operators.exactspans import exact_spans_overweight_pairs

    docs = _docs(spark, sf_dir)
    return exact_spans_overweight_pairs(
        docs, _span_candidate_pairs(docs), min_len=20, max_pair_matches=100
    )


def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar / common-neighbor / Jaccard link prediction
    (operators/linkpred.py) over the SAME part co-occurrence graph as
    the census family: top-100 non-edges by AA score with the
    deterministic (aa desc, cn desc, u, v) total order, hub wedges
    capped at degree 15 (a z adjacent to everything predicts nothing —
    the Adamic-Adar insight made structural; measured 12 -> 3 s at
    sf0.1).  The oracle replays the wedge join with the cap, the
    1/ln(deg) sum, the existing-edge anti-join, and the ranked cut."""
    from tube_spark.operators.linkpred import link_prediction
    from tube_spark.operators.triangles import cooccurrence_edges

    li = _pq(spark, f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_orderkey") % 4 == 0
    )
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", max_group=10)
    return link_prediction(edges, k=100, max_degree=15)


def q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM drift detection (operators/changepoint.py) per
    event_type over the event value series — the sustained-shift
    detector complementing outlier_flags' pointwise IQR test.  The
    oracle replays the rounded per-series baseline and the
    prefix-sum-minus-running-min closed form with the identical
    (ts, event_id) order, so the ordered cumulative sums agree
    bitwise."""
    from tube_spark.operators.changepoint import cusum_changepoints

    ev = _pq(spark, f"{sf_dir}/events.parquet").filter(
        F.col("value").isNotNull()
    )
    return cusum_changepoints(
        ev.select("event_type", "ts", "event_id", "value"),
        "event_type", "ts", "value", k=0.5, h=5.0, tiebreak_col="event_id",
    )


def q_weighted_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted (multiset) Jaccard rescoring
    (operators/dedup.py weighted_jaccard_pairs) over the SAME
    candidate pair set as exact_spans (portable LSH pairs UNION the
    consecutive-id probe): tf-weighted near-dup verification where
    repetition is signal.  Pure integer arithmetic until the final
    ratio — the oracle replays tf counts, the shared-term
    intersection, and the totals with no floating-point caveats."""
    from tube_spark.operators.dedup import minhash_lsh_pairs, weighted_jaccard_pairs

    docs = _docs(spark, sf_dir)
    lsh = minhash_lsh_pairs(
        docs, "doc_id", "text", n=2, num_hashes=64,
        bands=16, threshold=0.5, portable=True,
    ).select("id_a", "id_b")
    ids = docs.select("doc_id")
    probe = ids.select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b")
    ).join(ids.select(F.col("doc_id").alias("id_b")), "id_b").select(
        "id_a", "id_b"
    )
    return weighted_jaccard_pairs(docs, lsh.unionByName(probe))


def q_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (operators/pagerank.py) on the same
    supplier-part bipartite graph as q_pagerank, restarting on the
    every-5th-supplier seed set (scale-invariant: present at every SF)
    — proximity-to-seeds scoring (random walk with restart).  Fixed 3
    iterations; the oracle unrolls the identical trajectory INCLUDING
    the dangling-mass term (rank' = 0.15*p + 0.85*(inflow + dm*p)), so
    parity is structural even if a seed supplier has no lineitem rows
    at some SF (on this bidirectional graph dm is usually 0, but the
    oracle no longer assumes it)."""
    from tube_spark.operators.pagerank import personalized_pagerank

    _ensure(spark)
    li = _pq(spark, f"{sf_dir}/lineitem.parquet")
    fwd = li.select(
        F.col("l_suppkey").alias("src"),
        (F.col("l_partkey") + 1000000).alias("dst"),
    ).distinct()
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    srcs = (
        _pq(spark, f"{sf_dir}/supplier.parquet")
        .filter(F.col("s_suppkey") % 5 == 0)
        .select(F.col("s_suppkey").alias("node"))
    )
    return personalized_pagerank(edges, srcs, iterations=3).select(
        "node", "rank"
    )


def q_hll_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language distinct-token estimates via HyperLogLog
    (operators/hll.py, p=10 -> 1024 registers) joined with the exact
    distinct counts, so the driver row witnesses the sketch's accuracy
    directly.  The oracle replays the md5 register assignment, the
    max-rank registers, and the corrected estimator bit-for-bit — the
    Count-Min/Bloom differential story for the cardinality sketch."""
    from tube_spark.functions.text import tokens
    from tube_spark.operators.hll import hll_grouped

    docs = _docs(spark, sf_dir).filter(
        F.col("lang").isNotNull() & F.col("text").isNotNull()
    )
    tok = docs.select(
        "lang", F.explode(tokens(F.col("text"))).alias("tok")
    )
    est = hll_grouped(tok, "lang", "tok", p=10)
    exact = tok.groupBy("lang").agg(F.countDistinct("tok").alias("exact"))
    return est.join(exact, "lang")


def q_ddsketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value quantiles (p50/p90/p99) via the
    integer-exact DDSketch-style log-bucket sketch
    (operators/ddsketch.py), joined with the EXACT rank-ceil(q*n)
    quantile so the driver row witnesses the sketch's relative-error
    bound directly (the hll_cardinality pattern).  The oracle replays
    micro-unit quantization, bit-length octaves, mantissa sub-buckets,
    cumulative rank selection, and the integer bucket midpoint — no
    float-association caveats anywhere."""
    from pyspark.sql import Window

    from tube_spark.operators.ddsketch import ddsketch_quantiles

    _ensure(spark)
    ev = _pq(spark, f"{sf_dir}/events.parquet").filter(
        F.col("value").isNotNull() & (F.col("value") >= 0)
    )
    est = ddsketch_quantiles(
        ev, "event_type", "value", quantiles=(0.5, 0.9, 0.99)
    )
    w = Window.partitionBy("event_type").orderBy("value")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("__n"),
    )
    qs = F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
    exact = (
        ranked.select("event_type", "value", "__rn", "__n",
                      F.explode(qs).alias("q"))
        .filter(F.col("__rn") == F.ceil(F.col("q") * F.col("__n")))
        .select(
            "event_type",
            F.round("q", 4).alias("q"),
            F.col("value").alias("exact_value"),
        )
    )
    return est.join(exact, ["event_type", "q"])


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 3-gram novelty against the earlier corpus
    (operators/text_analysis.py ngram_novelty): share of a doc's
    distinct word trigrams whose corpus-wide first occurrence is this
    doc — the "is the crawl still adding new text" curve.  Dedup asks
    "is this a copy of one doc"; novelty asks "how much of this doc
    exists anywhere earlier".  The oracle replays gram explosion,
    min-id first-occurrence attribution, and the per-doc ratio."""
    from tube_spark.operators.text_analysis import ngram_novelty

    _ensure(spark)
    return ngram_novelty(_docs(spark, sf_dir), "doc_id", "text", n=3)


def q_reciprocal_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual nearest-neighbor alignment (operators/similarity.py
    reciprocal_nn) between the even-label and odd-label halves of the
    embeddings table — the bitext/cross-modal pairing primitive: a
    pair survives only when each side is the other's top-1, killing
    one-way hub matches.  Exact brute-force tier (the IVF store is the
    scale path); the oracle replays both directional argmaxes and the
    mutual join."""
    from tube_spark.operators.similarity import reciprocal_nn

    emb = _emb(spark, sf_dir).select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    return reciprocal_nn(
        emb.filter(F.col("label") % 2 == 0),
        emb.filter(F.col("label") % 2 == 1),
    )


def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining over the documents corpus
    (operators/mining.py collocations): top-100 adjacent word pairs by
    LIFT = N*c(ab)/(c(a)*c(b)) with a min-count cut — phrase/vocab
    discovery.  Lift, not PMI: the log is rank-neutral and a
    cross-engine libm log would poison the oracle; one IEEE division
    rounds portably.  The oracle replays tokenization, lead-window
    bigrams, the count cut, and the deterministic ranked cut."""
    from tube_spark.operators.mining import collocations

    return collocations(_docs(spark, sf_dir), min_count=5, k=100)


def q_template_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template/boilerplate mining (operators/text_analysis.py
    structural_templates): letter runs -> 'w', digit runs -> '0',
    whitespace squeezed; documents from the same fill-in template
    collapse to one skeleton that near-dup shingling misses (slot
    values differ everywhere).  The oracle replays the regex skeleton
    and the count/distinct/min/total aggregation."""
    from tube_spark.operators.text_analysis import structural_templates

    return structural_templates(_docs(spark, sf_dir), min_docs=2)


def q_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-domain scene-cut detection over real MJPEG-AVI
    containers (operators/multimodal.py detect_scene_cuts): doc_ids
    divisible by 4 carry a synthesized AVI (id%5+2 frames, frame
    bodies repeating in scenes of 2); the kernel demuxes the RIFF
    container, takes a 256-bin byte histogram per frame body, and cuts
    where the normalized L1 jump crosses the threshold.  The oracle
    replays the scene arithmetic from doc_id alone — sound because
    within a scene the frame bytes are IDENTICAL (distance exactly 0)
    and across a boundary the synthesized filler multiset shifts by
    31 mod 256, which cannot fix a 16-element multiset (orbit size 256
    > 16), so the distance is >= 2/122 > the 0.01 threshold — the cut
    set provably equals the scene boundaries at any scale factor."""
    from tube_spark.operators.multimodal import (
        detect_scene_cuts,
        synthesize_video_col,
    )

    vids = synthesize_video_col(
        _docs(spark, sf_dir).select("doc_id").filter(F.col("doc_id") % 4 == 0),
        scene_len=2,
    )
    return detect_scene_cuts(vids, threshold=0.01).select(
        "doc_id", "frame_idx", "ts_ms", "is_cut", "scene_id"
    )


def q_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (operators/cms.py): 3x512 counter grid over
    the corpus token stream, probed at the 50 most frequent tokens —
    output carries the exact count, the sketch estimate, and the
    overcount so the never-undercount guarantee is visible in the
    diff.  The oracle replays every counter and every probe (the grid
    is d*w rows regardless of corpus size; the probe join broadcasts)."""
    from tube_spark.functions.text import tokens
    from tube_spark.operators.cms import cms_build, cms_estimate

    toks = _docs(spark, sf_dir).select(
        F.explode(tokens(F.col("text"))).alias("token")
    )
    grid = cms_build(toks, "token", width=512, depth=3)
    probes = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact"))
        .orderBy(F.col("exact").desc(), F.col("token"))
        .limit(50)
    )
    return cms_estimate(probes, "token", grid, width=512, depth=3).select(
        "token",
        "exact",
        "est",
        (F.col("est") - F.col("exact")).alias("overcount"),
    )


def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-page boilerplate stripping (operators/text_extract.py):
    documents wrapped in a synthetic page (head with style+script —
    the script body contains raw '<' and '&amp;' — a nav anchor and a
    comment) and extracted back: script/style/comment elements
    dropped, tags to spaces, single-pass entity decode, whitespace
    collapse, plus anchor count and link density.  Map-only JVM regex
    kernel on the Java/RE2 common subset; the oracle replays it
    character-for-character."""
    from tube_spark.operators.text_extract import html_extract

    docs = _docs(spark, sf_dir)
    html = docs.select(
        "doc_id",
        F.concat(
            F.lit(
                "<html><head><style>p{margin:0}</style>"
                "<script>if(a<b){go('&amp;')}</script></head><body><h1>Doc "
            ),
            F.col("doc_id").cast("string"),
            F.lit("</h1><p>"),
            F.coalesce(F.col("text"), F.lit("")),
            F.lit('</p><a href="/doc?id='),
            F.col("doc_id").cast("string"),
            F.lit('">more &amp; related</a><!-- generated --></body></html>'),
        ).alias("html"),
    )
    return html_extract(html, "html").select(
        "doc_id", "text_extracted", "n_links", "link_density"
    )


def q_bloom_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable Bloom-filter blocklist gate (operators/bloomgate.py):
    every-7th document's text builds a 2016-bit / 3-hash filter; the
    corpus scan then probes it as a MAP-ONLY expression (the filter is
    a plan literal — no join, no broadcast of raw values).  Guaranteed
    no false negatives; the oracle replays every word and every probe
    bit-for-bit.  ``in_blocklist`` is the exact truth column so the
    comparison itself witnesses the guarantee."""
    from tube_spark.operators.bloomgate import bloom_build, bloom_gate

    docs = _docs(spark, sf_dir)
    words = bloom_build(
        docs.filter(F.col("doc_id") % 7 == 0), "text", m_bits=2016, n_hashes=3
    )
    return bloom_gate(docs, "text", words, m_bits=2016, n_hashes=3).select(
        "doc_id",
        ((F.col("doc_id") % 7 == 0) & F.col("text").isNotNull()).alias(
            "in_blocklist"
        ),
        "maybe_blocked",
    )


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-epoch dataloader permutation (sinks/shards.py epoch_order):
    every document's 0-based position in epoch 3's deterministic
    global shuffle — rank over md5(seed|epoch|key) via the distributed
    prefix count (range partition + broadcast offsets, never a
    single-task global window).  Re-shuffling per epoch WITHOUT
    rewriting the shard store; the oracle replays the permutation
    bit-for-bit as one row_number."""
    from tube_spark.sinks.shards import epoch_order

    docs = _docs(spark, sf_dir).select("doc_id")
    return epoch_order(docs, "doc_id", epoch=3).select(
        "doc_id", F.col("__epoch_pos").alias("epoch_pos")
    )


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing (operators/packing.py): documents
    concatenated in doc_id order and cut into 512-token training
    sequences; each doc reports which sequences its tokens land in.
    The global prefix sum is distributed (range partition + broadcast
    offsets — never a single-partition window); summarized per
    start_seq bucket of 50 to keep the output compact."""
    from tube_spark.functions.text import token_count_bpe_ish
    from tube_spark.operators.packing import chunk_concat

    docs = _docs(spark, sf_dir).select(
        "doc_id", token_count_bpe_ish(F.col("text")).alias("n_tokens")
    )
    placed = chunk_concat(docs, "doc_id", "n_tokens", 512)
    return (
        placed.groupBy((F.col("start_seq") / 50).cast("bigint").alias("seq_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum(
                F.when(F.col("end_seq") > F.col("start_seq"), 1).otherwise(0)
            ).alias("n_straddling"),
            F.min("start_offset").alias("min_start_offset"),
            F.max("start_offset").alias("max_start_offset"),
        )
        .orderBy("seq_bucket")
    )


def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (functions/text.py): deterministic emails /
    phones / IPs are injected into documents keyed off doc_id, then
    redacted with chained codegen'd regexp_replace — a pure map-only
    projection that fuses into the scan.  The report counts each PII
    kind before redaction, proves zero residual matches after, and
    checksums the redacted corpus with the portable 60-bit md5 hash."""
    from tube_spark.functions.text import pii_count, portable_hash60, redact_pii

    d = F.col("doc_id")
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    t = F.col("text")
    t = F.when(
        d % 5 == 0,
        F.concat(t, F.lit(" contact user"), d.cast("string"), F.lit("@example.com now")),
    ).otherwise(t)
    t = F.when(d % 7 == 0, F.concat(t, F.lit(" call 555-123-4567 today"))).otherwise(t)
    t = F.when(
        d % 11 == 0,
        F.concat(t, F.lit(" from 10.0."), (d % 256).cast("string"), F.lit(".1")),
    ).otherwise(t)
    inj = docs.select("doc_id", t.alias("t"))
    r = redact_pii(F.col("t"))
    residual = (
        pii_count(r, "email") + pii_count(r, "phone") + pii_count(r, "ipv4")
    )
    return inj.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(pii_count(F.col("t"), "email")).alias("n_emails"),
        F.sum(pii_count(F.col("t"), "phone")).alias("n_phones"),
        F.sum(pii_count(F.col("t"), "ipv4")).alias("n_ipv4"),
        F.sum(residual).alias("residual_pii"),
        F.bit_xor(portable_hash60(r)).alias("redacted_checksum"),
    )


def q_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequencies: explode tokens, two-phase count
    (map-side partial agg absorbs the token explosion before the
    single shuffle), global top-50 via TakeOrderedAndProject.  Also
    reports document frequency per term (count of distinct docs) —
    the building block for TF-IDF / stopword discovery."""
    from tube_spark.functions.text import tokens

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    return (
        tok.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.col("tf").desc(), F.col("term").asc())
        .limit(50)
    )


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval over the documents table for a fixed
    3-term query.  Delegates to ``operators/retrieval.py`` (library
    home since r4): corpus statistics (N, avgdl, per-term df) are tiny
    aggregates broadcast into the scoring join; per-(doc, term)
    frequencies come from one explode + one shuffle.  Top-20 via
    TakeOrderedAndProject.  k1=1.2, b=0.75."""
    from tube_spark.operators.retrieval import bm25_topk

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    return bm25_topk(docs, ["join", "spark", "dup"], k=20)


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-correct dedup with QUALITY-based survivor selection: LSH
    pairs → connected components → keep the highest-quality document of
    every duplicate cluster (rounded score, doc_id tiebreak).  Unlike
    the pairwise higher-id drop rule, a transitive chain a~b~c keeps
    exactly one document per CLUSTER — no over-dropping of documents
    that only relate through an intermediate."""
    from pyspark.sql import Window

    from tube_spark.operators.components import dedup_groups
    from tube_spark.operators.dedup import minhash_lsh_pairs
    from tube_spark.operators.text_analysis import text_stats

    docs = _docs(spark, sf_dir)
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", n=2, num_hashes=64, bands=16,
        threshold=0.5, portable=True,
    )
    groups = dedup_groups(docs, pairs)
    quality = text_stats(docs).select(
        "doc_id", F.round("quality_score", 6).alias("quality_score")
    )
    w = Window.partitionBy("group_id").orderBy(
        F.col("quality_score").desc(), F.col("doc_id").asc()
    )
    return (
        groups.join(quality, "doc_id")
        .withColumn("keep", F.row_number().over(w) == 1)
        .select("doc_id", "group_id", "group_size", "quality_score", "keep")
    )


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tube_spark.operators.dedup import minhash_lsh_pairs

    # bigram shingles: unigram sets over the synthetic vocab are so dense
    # that near-dup pairs are the majority of the pair space — bigrams
    # make "near duplicate" mean near-duplicate *sequences*.
    # portable=True: every intermediate is md5/arithmetic-based so the
    # DuckDB oracle reproduces the full LSH pipeline bit-for-bit.
    return minhash_lsh_pairs(
        _docs(spark, sf_dir), "doc_id", "text", n=2, num_hashes=64, bands=16,
        threshold=0.5, portable=True,
    )


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tube_spark.operators.dedup import simhash_pairs

    # portable=True: 60-bit md5-derived hash → the DuckDB oracle
    # reproduces the whole simhash+banding pipeline.  max_hamming < bands
    # so the pigeonhole blocking is recall-complete.
    return simhash_pairs(
        _docs(spark, sf_dir), "doc_id", "text", max_hamming=3, bands=4, portable=True
    )


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tube_spark.operators.similarity import cosine_topk

    emb = _emb(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    # .limit(5) = structural bound for the plan audit (the filter
    # already yields exactly vec_ids 0-4)
    queries = emb.filter(F.col("vec_id") < 5).limit(5)
    return cosine_topk(emb, queries, k=10)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tube_spark.operators.similarity import rhp_lsh_topk

    emb = _emb(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 5)
    # bits=48/bands=12: the 32/8 config measured 0.56 recall at sf0.01
    # (under the report's 0.6 floor); 48/12 measures 0.86 @ sf0.001 and
    # 0.74 @ sf0.01 — more bands = more independent collision chances,
    # paid in candidate re-scores, the documented LSH dial
    return rhp_lsh_topk(emb, queries, dim=64, k=10, bits=48, bands=12)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tube_spark.operators.similarity import ivf_topk

    emb = _emb(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 5)
    # nprobe=8 of 16 cells: measured recall 0.84 vs 0.56 at nprobe=4 on
    # this corpus (uniform-random embeddings — the worst case for IVF;
    # clustered real corpora get higher recall at lower nprobe/n_clusters
    # ratios) at equal wall-clock.
    return ivf_topk(emb, queries, k=10, n_clusters=16, nprobe=8)


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tube_spark.operators.similarity import embedding_near_duplicates

    emb = _emb(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    return embedding_near_duplicates(emb, threshold=0.3, bits=32, bands=8)


def q_embedding_near_dup_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB near-dup configuration (bits=64, bands=8, θ=0.9):
    band width 8 keeps bucket occupancy — and therefore Σ bucket²
    candidate volume — bounded as the corpus grows (measured sf0.1→sf1
    ratio 3.3× vs 60.4× for the dense θ=0.3/width-4 instance,
    BENCH_NOTES).  This is the headline near-dup bench entry; the
    θ=0.3 ``embedding_near_dup`` instance is kept as a labeled recall
    hard case.  The synthetic embeddings are random (max pairwise
    cosine ≈0.51), so the result set is empty by construction — the
    bench measures the scale path's cost: normalization, 64-bit
    hyperplane signatures, and the banded bucket self-join."""
    from tube_spark.operators.similarity import embedding_near_duplicates

    emb = _emb(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    return embedding_near_duplicates(emb, threshold=0.9, bits=64, bands=8)


def q_embedding_near_dup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force all-pairs cosine ≥ θ — the exact oracle-checked
    baseline the LSH path (embedding_near_dup) is recall-measured
    against.  O(n²): correctness baseline only; LSH is the scale path."""
    from tube_spark.operators.similarity import exact_near_pairs

    emb = _emb(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    return exact_near_pairs(emb, threshold=0.3)


def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE: learn 30 merges on the documents corpus
    (map-reduce formulation — the iterated state is the DISTINCT-word
    vocabulary, never the corpus), then report the top-50 token
    frequencies from the trained segmentations.  Iterative argmax
    training is not SQL-expressible → rows-only here; the correctness
    gate is exact merge-sequence equality with a pure-Python reference
    implementation of Sennrich et al.'s algorithm
    (tests/test_bpe.py)."""
    from tube_spark.operators.bpe import token_frequencies, train_bpe

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    _, vocab = train_bpe(docs, 30)
    return token_frequencies(docs, vocab, k=50)


def q_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid sparse+dense retrieval with reciprocal-rank fusion: BM25
    top-30 for a 3-term query fused (RRF, k=60) with the exact-cosine
    top-30 against document 0's embedding ("more like this").  Rank-only
    fusion needs no score calibration between branches; full pipeline
    reproduced by the DuckDB oracle including both rank lists."""
    from tube_spark.operators.retrieval import hybrid_topk

    return hybrid_topk(
        _docs(spark, sf_dir).select("doc_id", "text"),
        _emb(spark, sf_dir),
        ["join", "spark", "dup"],
        query_vec_id=0,
        k=20,
        pool=30,
    )


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster → within-cluster pairwise
    cosine → keep-lowest-id verdict, with PORTABLE integer-lattice
    centroids so the entire pipeline (assignment argmax included) is
    reproduced value-for-value by the DuckDB oracle — the same
    portability device as ``minhash_lsh``.  The k-means path
    (``centroids="kmeans"``, the paper's quantizer) is recall-checked in
    tests/test_semdedup.py instead.  θ=0.4 because the synthetic
    embeddings have no true near-duplicates (max pairwise cosine ≈0.51);
    the verdict logic is threshold-independent."""
    from tube_spark.operators.semdedup import lattice_centroids, semdedup_report

    emb = _emb(spark, sf_dir)
    return semdedup_report(
        emb, threshold=0.4, centroids=lattice_centroids(8, 64)
    ).select("vec_id", "cluster", "cluster_size", "n_near_dups", "is_kept")


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation pipeline: quality gate → exact dedup → near-dup
    drop → embedding enrichment, one Catalyst plan."""
    from tube_spark.operators.curation import curate_corpus

    return curate_corpus(
        _docs(spark, sf_dir),
        _emb(spark, sf_dir),
        min_quality=0.5,
        ngram_n=1,
        jaccard_threshold=0.8,
    )


def q_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document curation verdicts — the full round-4 gate stack in
    ONE plan with per-stage observability (why was each doc dropped):
    quality gate, Gopher repetition gate, benchmark decontamination
    (5-gram leak vs the doc_id%17==0 eval slice), exact-dup canonical
    selection among gate survivors, and near-dup drop among canonicals.
    ``selected`` ANDs the stages in pipeline order.  Every flag is
    independently recomputed by the DuckDB oracle.

    The near-dup stage uses TRIGRAM Jaccard: a unigram inverted index
    over a small shared vocabulary degenerates toward all-pairs as the
    corpus grows (measured at sf1), while 3-word runs keep the index
    sparse at any scale — the selectivity-vs-n trade every shingle
    pipeline must make."""
    from tube_spark.operators.decontamination import contamination_pairs
    from tube_spark.operators.dedup import exact_duplicates, ngram_jaccard_pairs
    from tube_spark.operators.text_analysis import repetition_stats, text_stats

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    corpus = docs.filter(F.col("doc_id") % 17 != 0)

    q = text_stats(corpus).select(
        "doc_id", (F.col("quality_score") >= 0.5).alias("passed_quality")
    )
    r = repetition_stats(corpus).select(
        "doc_id", (~F.col("is_repetitive")).alias("passed_repetition")
    )
    contaminated = (
        contamination_pairs(corpus, bench, n=5, min_hits=1)
        .select(F.col("train_id").alias("doc_id"))
        .distinct()
        .withColumn("_contaminated", F.lit(True))
    )
    flags = (
        corpus.select("doc_id", "text")
        .join(q, "doc_id")
        .join(r, "doc_id")
        .join(contaminated, "doc_id", "left")
        .withColumn("not_contaminated", F.coalesce(~F.col("_contaminated"), F.lit(True)))
        .drop("_contaminated")
    )
    survivors = flags.filter(
        F.col("passed_quality") & F.col("passed_repetition") & F.col("not_contaminated")
    ).select("doc_id", "text")
    canon = exact_duplicates(survivors, "doc_id", "text", normalized=False).select(
        F.col("canonical_id").alias("doc_id"), F.lit(True).alias("_canon")
    )
    canon_docs = survivors.join(canon.select("doc_id"), "doc_id")
    near_dropped = (
        ngram_jaccard_pairs(canon_docs, "doc_id", "text", n=3, threshold=0.5)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
        .withColumn("_neardup", F.lit(True))
    )
    return (
        flags.join(canon, "doc_id", "left")
        .join(near_dropped, "doc_id", "left")
        .select(
            "doc_id",
            "passed_quality",
            "passed_repetition",
            "not_contaminated",
            F.coalesce("_canon", F.lit(False)).alias("is_canonical"),
            (
                F.coalesce("_canon", F.lit(False))
                & F.coalesce(~F.col("_neardup"), F.lit(True))
            ).alias("selected"),
        )
    )


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embeddings table
    (operators/quantize.py): per-dimension affine codes in [-127, 127]
    with bit-reproducible floor(x+0.5) rounding.  Output is
    integer-exact per-vector code checksums, so the driver hash-checks
    the quantization kernel itself, not a float approximation."""
    from tube_spark.operators.quantize import quantize_embeddings

    emb = _emb(spark, sf_dir)
    q = quantize_embeddings(emb)
    return q.select(
        "vec_id",
        "n_dims",
        F.aggregate("codes", F.lit(0).cast("long"), lambda a, c: a + c).alias(
            "code_sum"
        ),
        F.array_min("codes").cast("long").alias("code_min"),
        F.array_max("codes").cast("long").alias("code_max"),
    )


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram LM quality signal (operators/retrieval.py): per-doc
    average negative log-likelihood + perplexity under the corpus
    unigram model with add-1 smoothing — vocabulary-sized model
    broadcast, linear in corpus tokens."""
    from tube_spark.operators.retrieval import unigram_lm_score

    return unigram_lm_score(_docs(spark, sf_dir))


def q_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style bigram LM perplexity (operators/lm.py): add-k
    smoothed bigram model self-trained on the corpus under a 20-token
    vocabulary cap (rare tokens -> <unk>), scored per document.
    Map-only bigram construction, broadcast keep-list/context joins,
    model bounded by the vocab cap."""
    from tube_spark.operators.lm import bigram_lm_perplexity

    return bigram_lm_perplexity(_docs(spark, sf_dir), vocab_size=20, add_k=0.5)


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (operators/dsir.py): hashed unigram+
    bigram bag models over 512 portable-hash buckets; target = the
    English subset, raw = the full corpus.  Model tables bounded by
    dim; scoring is one broadcast join + per-doc aggregation."""
    from tube_spark.operators.dsir import dsir_log_weights

    docs = _docs(spark, sf_dir)
    return dsir_log_weights(
        docs, docs.filter(F.col("lang") == "en"), dim=512, add_k=0.5
    )


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real multimodal decode: deterministic MJPEG AVIs (doc_id%4==0),
    BMP images (other even doc_ids) and PCM WAVs (odd doc_ids) are
    synthesized as genuine container bytes, then parsed back by the
    numpy header-walking kernels through Arrow-batched mapInPandas.
    The oracle predicts every decoded stat (dimensions, byte counts,
    frame-count duration, pixel mean, sample RMS) from doc_id alone —
    a full-value check that the parsers actually read the headers and
    payload they were handed."""
    from tube_spark.operators.multimodal import decode_features, synthesize_media_col

    docs = synthesize_media_col(_docs(spark, sf_dir).select("doc_id"))
    return decode_features(docs).withColumn("value_mean", F.round("value_mean", 6))


def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling over real MJPEG-in-AVI containers: doc_ids
    divisible by 4 carry a synthesized AVI (id%5+2 frames at 10 fps,
    32x24); sample_video_frames demuxes the RIFF container and emits
    the first frame at or after each 200 ms boundary — frame indices
    0, 2, 4... bounded by the frame count, each with its timestamp and
    the dimensions read from the frame's own JPEG SOF marker.  The
    oracle replays the cadence arithmetic from doc_id alone (every
    synthesized frame body is exactly 61 bytes)."""
    from tube_spark.operators.multimodal import (
        sample_video_frames,
        synthesize_media_col,
    )

    docs = synthesize_media_col(
        _docs(spark, sf_dir).select("doc_id").filter(F.col("doc_id") % 4 == 0)
    )
    return sample_video_frames(docs, every_ms=200).select(
        "doc_id", "frame_idx", "ts_ms", "width", "height", "frame_bytes"
    )


def q_product_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (the FAISS IVF-PQ building block): 64-dim
    embeddings split into 8 subspaces of 8 dims, each encoded as the
    argmin-L2 index into a 16-entry codebook — 64x compression.
    Integer-lattice codebooks make every distance (and the tie-to-
    lowest-index argmin) bit-reproducible in DuckDB, so the driver
    hash-checks the full encode: per-vector code string AND total
    squared reconstruction error.  Map-only native expressions — one
    corpus scan, zero shuffles (plan-audited)."""
    from tube_spark.operators.quantize import pq_encode

    emb = _emb(spark, sf_dir)
    return pq_encode(emb, dim=64, m=8, k=16).select(
        "vec_id",
        F.array_join("codes", "-").alias("codes_str"),
        F.round("sq_error", 6).alias("sq_error"),
    )


def q_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ index scan via asymmetric distance computation (ADC): encode
    the corpus once, then score every stored vector as m lookup-table
    reads against vector 0's query subvectors — the scan touches ONLY
    the codes column (64x fewer bytes than the float corpus).  The
    oracle replays codes, table, and ranking in SQL; ties broken by
    vec_id in both engines."""
    from tube_spark.operators.quantize import pq_encode, pq_search

    emb = _emb(spark, sf_dir)
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    codes = pq_encode(emb, dim=64, m=8, k=16).select("vec_id", "codes")
    return pq_search(codes, qv, dim=64, m=8, k=16, topk=10).select(
        "vec_id", F.round("approx_sq_dist", 6).alias("approx_sq_dist")
    )


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide duplicated-line removal (RefinedWeb/C4 pass,
    operators/spandedup.py dedup_lines): documents are split into
    4-word lines, any line held by >=2 distinct documents survives only
    in the lowest-id holder, and each document is rebuilt in original
    line order.  Output is (doc_id, md5 of the rebuilt text, line
    counts) so the driver hash-checks the REWRITE itself, not just the
    counts."""
    from tube_spark.operators.spandedup import dedup_lines

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.regexp_replace("text", r"((\S+ ){3}\S+) ", "$1\n").alias("text"),
    )
    out = dedup_lines(docs, min_docs=2, min_line_chars=5)
    return out.select(
        "doc_id", F.md5("text").alias("text_md5"), "n_lines", "n_lines_removed"
    )


def q_streaming_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming availableNow twin of q_events_window."""
    from tube_spark.streaming.refresh import streaming_daily_event_counts

    return streaming_daily_event_counts(spark, f"{sf_dir}/events.parquet")


def q_nn_descent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate kNN GRAPH by NN-descent (operators/knngraph.py):
    top-10 cosine neighbors for EVERY corpus vector in 3
    neighbor-of-neighbor rounds — O(n*k^2) candidate scores per round
    instead of the O(n^2) brute force.  Rows-only by design (the output
    is approximate); quality is MEASURED, not assumed: recall floors in
    tests/test_knngraph.py and the ``nn_descent_graph`` row of
    ``ann_recall_report`` (0.76 at iters=3 on the uniform-random hard
    case, 0.98 on clustered data)."""
    from tube_spark.operators.knngraph import nn_descent

    emb = _emb(spark, sf_dir).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    return nn_descent(emb, k=10, iters=3)


def q_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall of the approximate ANN indexes (LSH, IVF) against
    the exact brute-force top-k, plus the near-dup LSH pair set against
    brute-force all-pairs.  Self-certifying quality report for the
    rows-only approximate queries: deterministic given the fixed seeds.
    The ``floor`` column mirrors the assertion thresholds in
    tests/test_ann_recall.py and ``meets_floor`` records pass/fail in
    the driver-visible output itself."""
    from tube_spark.operators.similarity import (
        cosine_topk as cosine_topk_fn,
        exact_near_pairs,
        pair_recall,
        topk_recall,
    )

    emb = _emb(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    exact = q_ann_cosine_topk(spark, sf_dir)
    # floors mirror tests/test_ann_recall.py (random-vector hard case)
    macro = lambda df, name, floor: (  # noqa: E731
        df.agg(F.round(F.avg("recall"), 4).alias("recall"))
        .select(
            F.lit(name).alias("method"),
            "recall",
            F.lit(floor).alias("floor"),
            (F.col("recall") >= floor).alias("meets_floor"),
        )
    )
    lsh = macro(topk_recall(exact, q_ann_lsh_topk(spark, sf_dir)), "lsh_topk", 0.6)
    ivf = macro(topk_recall(exact, q_ann_ivf_topk(spark, sf_dir)), "ivf_topk", 0.4)
    near = (
        pair_recall(
            exact_near_pairs(emb, threshold=0.3),
            q_embedding_near_dup(spark, sf_dir),
        )
        .select(
            F.lit("near_dup_pairs").alias("method"),
            "recall",
            F.lit(0.5).alias("floor"),
            (F.col("recall") >= 0.5).alias("meets_floor"),
        )
    )
    # PQ/ADC path: trained codebooks (m=16 sub_dim=4, 6-bit — the
    # parameterization that clears a meaningful floor on random
    # vectors, see tests/test_vectorstore.py ADC floor), bare ADC scan
    # over all codes vs the exact L2 top-k (the metric ADC
    # approximates; labeled exact baseline — broadcast query set)
    from pyspark.sql import Window as _W

    from tube_spark.operators.quantize import pq_encode, pq_train

    # iters=1: the deterministic seeded init + one Lloyd round already
    # clears the floor (measured 0.620 at sf0.01); each extra iteration
    # and each per-query LUT is a fresh literal expression compile, so
    # the report pays codegen, not scan (SCALE.md iterative rules)
    from pyspark.sql import Window as _W2

    from tube_spark.operators.quantize import pq_search_many

    books = pq_train(emb, dim=64, m=16, k=64, iters=1)
    # localCheckpoint: the batched search's two top-k phases rescan the
    # codes — without it each rescan re-runs the (large) encode
    # expression
    codes = (
        pq_encode(emb, dim=64, m=16, k=64, codebooks=books)
        .select("vec_id", "codes")
        .localCheckpoint()
    )
    qrows = emb.filter(F.col("vec_id") < 5).collect()
    # ONE plan for all 5 queries (pq_search_many: shared scoring
    # expression, LUTs as broadcast rows — replaces the old per-query
    # union, which paid a codegen compile and a scan per query).
    # topk=11 then drop self and re-rank by the ADC order: if the
    # query is NOT in its own ADC top-11 (possible under quantization)
    # 11 rows survive, and an unranked cut would be nondeterministic.
    qs = [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in qrows]
    w_adc = _W2.partitionBy("query_id").orderBy(
        F.col("approx_sq_dist").asc(), F.col("neighbor_id").asc()
    )
    adc = (
        pq_search_many(codes, qs, dim=64, m=16, k=64, topk=11, codebooks=books)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "approx_sq_dist")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("rn", F.row_number().over(w_adc))
        .filter(F.col("rn") <= 10)
        .select("query_id", "neighbor_id")
    )
    qq = spark.createDataFrame(
        [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in qrows],
        "query_id long, q_vec array<double>",
    )
    cc = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_vec"))
    d = F.aggregate(
        F.zip_with(F.col("q_vec"), F.col("c_vec"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wl2 = _W.partitionBy("query_id").orderBy(F.col("sq").asc(), F.col("neighbor_id").asc())
    exact_l2 = (
        cc.crossJoin(F.broadcast(qq))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", d.alias("sq"))
        .withColumn("rn", F.row_number().over(wl2))
        .filter(F.col("rn") <= 10)
        .select("query_id", "neighbor_id")
    )
    pq_row = macro(topk_recall(exact_l2, adc), "pq_adc_topk", 0.5)
    # NN-descent kNN graph vs the exact graph on a deterministic 10%
    # node sample (full n^2 exact would defeat the point of the graph
    # being approximate); floor mirrors tests/test_knngraph.py's
    # uniform-random hard case (measured 0.76 at iters=3)
    exact_graph = cosine_topk_fn(
        emb, emb.filter(F.col("vec_id") % 10 == 0), k=10
    )
    nnd = macro(
        topk_recall(exact_graph, q_nn_descent(spark, sf_dir)),
        "nn_descent_graph",
        0.6,
    )
    return (
        lsh.unionByName(ivf)
        .unionByName(near)
        .unionByName(pq_row)
        .unionByName(nnd)
    )


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-rule signals (operators/quality_rules.py
    gopher_signals — Rae et al. 2021 Appendix A) over synthetic pages
    built from the documents corpus: each doc gains a duplicated body
    line (id%4), a bullet line (id%3), an ellipsis trailer (id%5) and
    a hash-symbol tag line (id%7), so every rule's numerator moves.
    Map-only expression pipeline; the oracle replays page synthesis
    and every signal (word/line splits, symbol and duplicate-line
    arithmetic, required-stopword hits, the composite pass flag)."""
    from tube_spark.operators.quality_rules import gopher_signals

    docs = _docs(spark, sf_dir)
    d = F.col("doc_id")
    base = F.coalesce(F.col("text"), F.lit(""))
    page = F.concat(
        base,
        F.when(d % 4 == 0, F.concat(F.lit("\n"), base)).otherwise(F.lit("")),
        F.when(
            d % 3 == 0,
            F.concat(F.lit("\n- item number "), d.cast("string")),
        ).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.lit("\nto be continued ...")).otherwise(F.lit("")),
        F.when(
            d % 7 == 0,
            F.concat(F.lit("\n# tag "), d.cast("string"), F.lit(" #")),
        ).otherwise(F.lit("")),
    )
    return gopher_signals(docs.select("doc_id", page.alias("text")))


def q_c4_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-level cleaning (operators/quality_rules.py
    c4_line_filter — Raffel et al. 2020 §2.2) over synthetic pages:
    a proper opening sentence, the raw doc body (no terminal
    punctuation — always dropped), a javascript line (even ids) vs a
    keepable sentence (odd ids), a too-short line (id%3), a quoted
    closer (id%5), a lorem-ipsum page poison (id%11) and a curly-brace
    page poison (id%13).  The oracle replays line split, every
    line-level predicate, the cleaned-text re-join, and the page
    gate."""
    from tube_spark.operators.quality_rules import c4_line_filter

    docs = _docs(spark, sf_dir)
    d = F.col("doc_id")
    base = F.coalesce(F.col("text"), F.lit(""))
    page = F.concat(
        F.lit("The opening sentence of document "),
        d.cast("string"),
        F.lit(" has plenty of words."),
        F.lit("\n"),
        base,
        F.when(
            d % 2 == 0,
            F.lit("\nThis line mentions javascript frameworks and gets dropped."),
        ).otherwise(F.lit("\nAnother proper sentence appears right here today!")),
        F.when(d % 3 == 0, F.lit("\nToo short.")).otherwise(F.lit("")),
        F.when(
            d % 5 == 0,
            F.concat(
                F.lit("\nDocument "),
                d.cast("string"),
                F.lit(' closes with a quoted ending of sorts."'),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 11 == 0,
            F.lit("\nSprinkle some lorem ipsum into the page body here."),
        ).otherwise(F.lit("")),
        F.when(d % 13 == 0, F.lit("\nconfig = { nested: true }")).otherwise(
            F.lit("")
        ),
    )
    return c4_line_filter(docs.select("doc_id", page.alias("text")))


def q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking (operators/entities.py
    sorted_neighborhood_pairs — Hernandez & Stolfo 1995) over part
    names: rank all parts by (p_name, p_partkey) via the distributed
    prefix count (range partition + broadcast offsets — never a
    single-task global window) and pair each with the next 3 in
    order, then score each pair with JVM levenshtein.  Complements
    equal-key blocking: typo'd keys land in different equality blocks
    but stay sort-adjacent.  The oracle replays the rank, the
    neighbor join, and the edit distances."""
    from tube_spark.operators.entities import sorted_neighborhood_pairs

    part = _pq(spark, f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_name"
    )
    pairs = sorted_neighborhood_pairs(part, "p_partkey", F.col("p_name"), window=4)
    na = part.select(
        F.col("p_partkey").alias("id_a"), F.col("p_name").alias("__name_a")
    )
    nb = part.select(
        F.col("p_partkey").alias("id_b"), F.col("p_name").alias("__name_b")
    )
    return (
        pairs.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            "rank_a",
            "rank_b",
            F.levenshtein("__name_a", "__name_b").cast("long").alias("lev_dist"),
        )
    )


def q_graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-graph degree summary + Newman assortativity
    (operators/graphstats.py) over the SAME part co-occurrence graph
    as the triangle census (deterministic 25% order sample, hot-group
    cap 10) — the cheap pre-flight every graph stage wants: size,
    density, degree skew, and whether hubs attach to hubs (r > 0) or
    to leaves (r < 0), which predicts how hard the orientation and
    hub-cap tricks will pay.  Pearson over both edge orientations;
    the oracle shares the graph CTE with the census so the graphs can
    never diverge."""
    from tube_spark.operators.graphstats import graph_degree_stats
    from tube_spark.operators.triangles import cooccurrence_edges

    li = _pq(spark, f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_orderkey") % 4 == 0
    )
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", max_group=10)
    return graph_degree_stats(
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus unigram distribution
    (operators/text_analysis.py zipf_fit): OLS of ln(tf) on ln(rank)
    for the top-1000 terms — slope ≈ -1 and r² near 1 for natural
    text; templated/generated corpora bend the curve.  Closed-form
    OLS via covar_pop/var_pop (the n-vs-n-1 convention cancels), so
    the oracle replays the whole fit; ln enters only the final
    rounded doubles, never an ordering."""
    from tube_spark.operators.text_analysis import zipf_fit

    return zipf_fit(_docs(spark, sf_dir), top_n=1000)


def q_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 2-hop reachability per node (operators/graphstats.py
    khop_reach) over the census part co-occurrence graph: distinct
    nodes within <= 2 hops, self excluded — the exact small-k
    neighborhood function (hyperball is the HLL-counter scale form).
    Frontier extension is one equi-join + distinct; the pair frame is
    wedge-volume, the same cost class the census already bounds with
    the hot-group cap.  The oracle replays the frontier union."""
    from tube_spark.operators.graphstats import khop_reach
    from tube_spark.operators.triangles import cooccurrence_edges

    li = _pq(spark, f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_orderkey") % 4 == 0
    )
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", max_group=10)
    return khop_reach(
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst")), k=2
    )


def q_hyperball(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall neighborhood estimation (operators/graphstats.py
    hyperball — Boldi & Vigna 2013), 2 rounds at p=7, over the same
    part co-occurrence graph: per-node HLL ball counters merged along
    edges (elementwise max — idempotent, order-free), estimating
    |{v} ∪ B(v, 2)| with m=128 registers per node instead of the exact
    frontier's Σ|B| pair rows — the 100 TB path for the neighborhood
    function / effective-diameter curve.  Counters use the portable
    60-bit md5 register split, so the oracle replays the init, BOTH
    merge rounds, and the estimator bit-for-bit."""
    from tube_spark.operators.graphstats import hyperball
    from tube_spark.operators.triangles import cooccurrence_edges

    li = _pq(spark, f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_orderkey") % 4 == 0
    )
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", max_group=10)
    return hyperball(
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        rounds=2,
        p=7,
    )


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease / Flesch-Kincaid grade
    (operators/quality_rules.py readability) over synthetic pages with
    1-3 sentences (80-char slices of the doc text closed with . ! ?
    by doc_id mod 3).  Sentence split, whitespace words, and
    vowel-group syllables are all on the shared regex subset; the
    oracle replays the page synthesis, every count, and the two
    score formulas."""
    from tube_spark.operators.quality_rules import readability

    docs = _docs(spark, sf_dir)
    d = F.col("doc_id")
    base = F.coalesce(F.col("text"), F.lit(""))
    page = F.concat(
        F.substring(base, 1, 80),
        F.lit(". "),
        F.when(
            d % 3 >= 1, F.concat(F.substring(base, 81, 80), F.lit("! "))
        ).otherwise(F.lit("")),
        F.when(
            d % 3 == 2, F.concat(F.substring(base, 161, 80), F.lit("? "))
        ).otherwise(F.lit("")),
    )
    return readability(docs.select("doc_id", page.alias("text")))


def q_effective_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-function curve + 90% effective diameter
    (operators/graphstats.py neighborhood_function — the readout
    HyperBall exists for, Boldi & Vigna 2013 §4): per round t,
    Σ_v |B(v, t)| estimated from the per-node HLL ball counters, the
    ratio to the final mass, and the first round reaching 90%.
    3 rounds at p=7 over the census part co-occurrence graph; the
    oracle replays every counter round, every per-node estimate, the
    per-round sums, and the 90% readout."""
    from tube_spark.operators.graphstats import neighborhood_function
    from tube_spark.operators.triangles import cooccurrence_edges

    li = _pq(spark, f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_orderkey") % 4 == 0
    )
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", max_group=10)
    return neighborhood_function(
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        max_rounds=3,
        p=7,
    )


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity release report (operators/privacy.py
    anonymity_report — Sweeney 2002, Machanavajjhala 2007) over
    customers: quasi-identifiers (nation, market segment, 1000-unit
    balance band), sensitive attribute = exact balance, k=5, l=3.
    One map-side-combinable groupBy; the oracle replays the banding,
    the class counts, and both gates."""
    from tube_spark.operators.privacy import anonymity_report

    cust = _pq(spark, f"{sf_dir}/customer.parquet").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
        "c_acctbal",
    )
    return anonymity_report(
        cust,
        ["c_nationkey", "c_mktsegment", "bal_band"],
        sensitive_col="c_acctbal",
        k=5,
        l=3,
    )


def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition
    (operators/seasonal.py): per event_type daily value series split
    into centered-7-day-MA trend, zero-centered day-of-week seasonal,
    and residual.  The phase is datediff-mod-7 integer arithmetic
    (the SQL dow functions disagree on week start); edge days keep
    NULL components instead of folding seasonality into a partial
    trend.  The oracle replays the daily rollup, the bounded window,
    the per-phase means, the re-centering, and the subtraction."""
    from tube_spark.operators.seasonal import seasonal_decompose

    events = _pq(spark, f"{sf_dir}/events.parquet")
    return seasonal_decompose(events, "event_type", "ts", "value", period=7)


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-scoped first/last-touch attribution
    (operators/attribution.py): purchases credit the click/view
    touches of the SAME 30-minute-gap session (the engine's
    sessionization definition, shared so the frames can never
    disagree); deterministic (ts, event_id) tie-breaks; dark
    conversions (touchless sessions) keep their rows.  The oracle
    replays the session window, both touch rankings, and the
    revenue rollup."""
    from tube_spark.operators.attribution import session_attribution

    events = _pq(spark, f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return session_attribution(events)


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams (operators/behavior.py event_transitions): consecutive
    event-type pairs under deterministic (ts, event_id) ordering,
    counts + row-normalized probabilities.  One lag window (shuffle
    on user) + one count agg; the normalizing window partitions by
    the event-type enum, so it is bounded.  The oracle replays the
    lag pairs and the normalization."""
    from tube_spark.operators.behavior import event_transitions

    events = _pq(spark, f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return event_transitions(events)


def q_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quartile segmentation (operators/behavior.py rfm_scores —
    Hughes 1994) over purchase events: per user, last conversion
    time / count / total value, each ntile(4)-scored with
    deterministic (metric, user) ordering, plus the concatenated
    segment code.  Report grain: the rollup reduces to |users| rows
    before any corpus-wide window.  The oracle replays the rollup,
    all three ntiles, and the segment."""
    from tube_spark.operators.behavior import rfm_scores

    events = _pq(spark, f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return rfm_scores(events)


def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample A/B statistic (operators/behavior.py ab_test) on
    purchase value with a deterministic synthetic assignment
    (user_id parity -> control/treatment): per-arm n / mean /
    population variance and the Welch-denominator z statistic —
    plain arithmetic end to end (the p-value mapping is a caller-side
    table lookup; engines disagree on erf).  One conditional-sum
    aggregation; the oracle replays every sum and the z formula."""
    from tube_spark.operators.behavior import ab_test

    events = _pq(spark, f"{sf_dir}/events.parquet")
    arms = events.filter(F.col("event_type") == "purchase").select(
        F.when(F.col("user_id") % 2 == 0, F.lit("control"))
        .otherwise(F.lit("treatment"))
        .alias("arm"),
        "value",
    )
    return ab_test(arms, "arm", "value", "control", "treatment")


def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: the documents table's labeled
    lang vs text_stats' stopword-vote lang_pred
    (operators/text_analysis.py lang_id_col), with per-cell counts —
    the standard evaluation view of the heuristic classifier, and a
    drift alarm when the corpus mix shifts.  One map-only score pass
    + one groupBy; the oracle replays the stopword votes, the
    deterministic tie-break, and the cell counts."""
    from tube_spark.operators.text_analysis import text_stats

    docs = _docs(spark, sf_dir)
    stats = text_stats(docs).select("doc_id", "lang_pred")
    return (
        docs.select("doc_id", "lang")
        .join(stats, on="doc_id")
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q_benford_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford leading-digit analysis (operators/stats_tests.py
    benford_digits — Newcomb 1881 / Benford 1938) over lineitem
    extended prices: per-digit observed vs log10(1+1/d) expected
    shares plus the chi² statistic — the classic fabricated-data
    screen.  One groupBy over 9 digit classes; the oracle replays the
    digit extraction (shared double log10 arithmetic), the shares,
    and every chi² term with identical embedded constants."""
    from tube_spark.operators.stats_tests import benford_digits

    li = _pq(spark, f"{sf_dir}/lineitem.parquet")
    return benford_digits(li, "l_extendedprice")


def q_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of order revenue over ordering customers
    (operators/stats_tests.py gini_coefficient — the rank formula
    with deterministic tie-breaks).  Report grain: the per-customer
    rollup reduces to |customers| rows before the rank window.  The
    oracle replays the rollup, the rank, and the closed-form
    coefficient."""
    from tube_spark.operators.stats_tests import gini_coefficient

    orders = _pq(spark, f"{sf_dir}/orders.parquet")
    return gini_coefficient(orders, "o_custkey", "o_totalprice")


def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence of market segment × nation over
    customers (operators/stats_tests.py chi_square_independence):
    margins, expected counts, the chi² sum — with structurally-empty
    cells contributing their full expected mass (omitting them
    understates the statistic) — and the (r−1)(c−1) degrees of
    freedom.  The oracle replays margins, expectations, and the
    empty-cell correction."""
    from tube_spark.operators.stats_tests import chi_square_independence

    cust = _pq(spark, f"{sf_dir}/customer.parquet")
    return chi_square_independence(cust, "c_mktsegment", "c_nationkey")


def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov over order pricing: is
    o_totalprice distributed identically in urgent vs low-priority
    orders (operators/stats_tests.py ks_two_sample)?  Max ECDF gap
    over the pooled distinct values plus Smirnov's asymptotic 95%
    threshold — distribution drift ACROSS slices, where cusum_drift
    is drift across time.  The oracle replays the per-value group
    counts, the cumulative ECDFs, and the sqrt threshold."""
    from tube_spark.operators.stats_tests import ks_two_sample

    orders = _pq(spark, f"{sf_dir}/orders.parquet")
    return ks_two_sample(
        orders, "o_totalprice", "o_orderpriority", "1-URGENT", "5-LOW"
    )


def q_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real GIF decode under a full-value oracle: every document gets
    a deterministic 2-frame animated GIF (multimodal.synthesize_gif —
    real variable-width LZW bytes, odd ids interlaced), decoded by the
    pure-numpy codec (operators/gif.py) through gif_frame_stats'
    Arrow mapInPandas; the oracle replays the palette arithmetic from
    doc_id alone (channel means per composited frame, presentation
    timestamps from the first frame's delay) — so a hash match proves
    the LZW entropy decode, deinterlace, and compositing byte-exactly,
    the multimodal_decode pattern extended to the LZW family."""
    from tube_spark.operators.multimodal import (
        gif_frame_stats,
        synthesize_gif_col,
    )

    docs = synthesize_gif_col(_docs(spark, sf_dir).select("doc_id"))
    out = gif_frame_stats(docs)
    return out.select(
        "doc_id",
        "frame_idx",
        "ts_ms",
        "width",
        "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-priority outlier screen over order totals
    (operators/stats_tests.py mad_outliers): median + MAD per group,
    values beyond k·MAD flagged — the 50%-breakdown alternative to
    mean/stddev z-scores whose scale estimate the outliers themselves
    inflate.  k=2.0 (≈1.35σ if normal) so the screen discriminates on
    this data: some priorities flag a tail, others none.  The oracle
    replays both exact-percentile aggregations and the fence."""
    from tube_spark.operators.stats_tests import mad_outliers

    orders = _pq(spark, f"{sf_dir}/orders.parquet")
    return mad_outliers(
        orders, "o_orderpriority", "o_totalprice", k=2.0
    ).orderBy("o_orderpriority")


def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum over lineitem pricing: does
    l_extendedprice sit higher for returned (R) than accepted (A)
    lineitems
    (operators/stats_tests.py mann_whitney_u)?  Midranks over the
    pooled distinct values via the same distributed two-phase prefix
    sum as ks_test, then the tie-corrected normal z.  Completes the
    nonparametric drift family: KS detects any shape difference,
    rank-sum targets location and keeps power under heavy tails where
    ab_test's mean z does not.  The oracle replays the per-value group
    counts, the midrank cumulative sums, the tie correction, and the
    z arithmetic with identical association order."""
    from tube_spark.operators.stats_tests import mann_whitney_u

    li = _pq(spark, f"{sf_dir}/lineitem.parquet")
    return mann_whitney_u(li, "l_extendedprice", "l_returnflag", "R", "A")


def q_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of lineitem quantity vs extended
    price (operators/stats_tests.py spearman_corr): midrank ties via
    the shared distributed prefix-sum kernel, centered sums (rank mean
    is exactly (n+1)/2), rho + the large-sample z.  The monotone-
    association screen Pearson's moment form cannot give.  The oracle
    replays midranks as avg(row_number) over value groups — exact
    0.5-multiples in both engines — and the identical centered-sum
    arithmetic."""
    from tube_spark.operators.stats_tests import spearman_corr

    li = _pq(spark, f"{sf_dir}/lineitem.parquet")
    return spearman_corr(li, "l_quantity", "l_extendedprice")


def q_kruskal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis rank test of event value across ALL event types
    (operators/stats_tests.py kruskal_wallis) — the k-group
    generalization of mann_whitney over the same midrank kernel:
    per-group rank sums from a value-level join (midranks depend only
    on the value), H plus the tie-corrected H.  The oracle replays the
    midranks, the per-group rank sums, and the H arithmetic with
    identical association order."""
    from tube_spark.operators.stats_tests import kruskal_wallis

    ev = _pq(spark, f"{sf_dir}/events.parquet")
    return kruskal_wallis(ev, "value", "event_type")


def q_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of lineitem quantity across return flags
    (operators/stats_tests.py anova_oneway): per-group conditional
    sums -> between/within sums of squares -> the F statistic, one
    map-side-combinable groupBy + a k-row aggregation.  The parametric
    sibling of kruskal (same question, mean-based).  The measure is
    INTEGER-VALUED (l_quantity), so every group sum is an exact double
    in both engines and the oracle replays the sums-of-squares
    arithmetic bit-for-bit — for fractional measures cross-engine
    summation order would perturb the quadratic terms (a harness
    constraint, not an operator one; the pytest reference covers
    fractional data with tolerances)."""
    from tube_spark.operators.stats_tests import anova_oneway

    li = _pq(spark, f"{sf_dir}/lineitem.parquet")
    return anova_oneway(li, "l_quantity", "l_returnflag")


def q_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information of market segment x nation over customers
    (operators/stats_tests.py mutual_information) — the information-
    theoretic statistic on the same contingency frame as chi_square:
    entropies, MI in nats, and the normalized MI feature-selection /
    leakage screen.  The oracle replays the cells, margins, and every
    p*ln ratio with identical association order (the zipf_fit
    shared-double-log precedent)."""
    from tube_spark.operators.stats_tests import mutual_information

    cust = _pq(spark, f"{sf_dir}/customer.parquet")
    return mutual_information(cust, "c_mktsegment", "c_nationkey")


def q_tiff_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real baseline-TIFF decode under a full-value oracle: every
    document gets a deterministic strip-organized TIFF
    (multimodal.synthesize_tiff — odd ids PackBits-compressed with
    real run-length bytes, ids%3==0 big-endian, ids%5==0 multi-strip),
    decoded by the pure-numpy codec (operators/tiff.py) through
    image_channel_stats' Arrow mapInPandas; the oracle replays the
    channel arithmetic from doc_id alone — a hash match proves the IFD
    walk, strip reassembly, and PackBits expansion byte-exactly (the
    gif_decode pattern extended to the strip family)."""
    from tube_spark.operators.multimodal import (
        image_channel_stats,
        synthesize_tiff_col,
    )

    docs = synthesize_tiff_col(_docs(spark, sf_dir).select("doc_id"))
    out = image_channel_stats(docs)
    return out.select(
        "doc_id",
        "width",
        "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_ensure(spark), sf_dir)

        run.__name__ = fn.__name__
        run.__doc__ = fn.__doc__
        return run

    return {k: wrap(v) for k, v in _QUERIES.items()}


_ALL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "props_value_map": q_props_value_map,
        "parent_chain": q_parent_chain,
        "flatten_top1": q_flatten_top1,
        "agg_basic": q_agg_basic,
        "agg_set": q_agg_set,
        "agg_sorted_list": q_agg_sorted_list,
        "two_hop_count": q_two_hop_count,
        "nested_docs": q_nested_docs,
        "nested_two_level": q_nested_two_level,
        "filter_dsl": q_filter_dsl,
        "collector_union": q_collector_union,
        "joining_props": q_joining_props,
        "pricing_summary": q_pricing_summary,
        "shipping_priority": q_shipping_priority,
        "returnflag_priority": q_returnflag_priority,
        "local_supplier_volume": q_local_supplier_volume,
        "late_shipment_orders": q_late_shipment_orders,
        "returned_item_customers": q_returned_item_customers,
        "order_count_distribution": q_order_count_distribution,
        "promo_revenue_share": q_promo_revenue_share,
        "large_order_customers": q_large_order_customers,
        "idle_high_balance_customers": q_idle_high_balance_customers,
        "top_revenue_nations": q_top_revenue_nations,
        "events_window": q_events_window,
        "event_funnel": q_event_funnel,
        "cohort_retention": q_cohort_retention,
        "merge_upsert": q_merge_upsert,
        "scd2_history": q_scd2_history,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "time_rollup": q_time_rollup,
        "sketch_report": q_sketch_report,
        "window_rank": q_window_rank,
        "window_lag": q_window_lag,
        "rollup_pricing": q_rollup_pricing,
        "cube_pricing": q_cube_pricing,
        "intersect_except": q_intersect_except,
        "anti_join": q_anti_join,
        "global_topk": q_global_topk,
        "stats_summary": q_stats_summary,
        "events_json_extract": q_events_json_extract,
        "window_ntile": q_window_ntile,
        "ntile_distributed": q_ntile_distributed,
        "filter_like": q_filter_like,
        "pivot_status": q_pivot_status,
        "regexp_extract": q_regexp_extract,
        "repetition_stats": q_repetition_stats,
        "heavy_hitters": q_heavy_hitters,
        "zorder_layout": q_zorder_layout,
        "quality_checks": q_quality_checks,
        "snapshot_diff": q_snapshot_diff,
        "column_profile": q_column_profile,
        "value_histogram": q_value_histogram,
        "ann_lsh_topk_portable": q_ann_lsh_topk_portable,
        "stratified_fixed_k": q_stratified_fixed_k,
        "grouped_topk": q_grouped_topk,
        "weighted_sample": q_weighted_sample,
        "hashed_features": q_hashed_features,
        "hard_negatives": q_hard_negatives,
        "class_balanced": q_class_balanced,
        "pagerank": q_pagerank,
        "triangle_stats": q_triangle_stats,
        "triangle_sample": q_triangle_sample,
        "lpa_communities": q_lpa_communities,
        "k_core": q_k_core,
        "entity_resolution": q_entity_resolution,
        "ngram_containment": q_ngram_containment,
        "psi_drift": q_psi_drift,
        "cluster_terms": q_cluster_terms,
        "outlier_flags": q_outlier_flags,
        "decontamination": q_decontamination,
        "data_mixture": q_data_mixture,
        "doc_chunking": q_doc_chunking,
        "span_dedup": q_span_dedup,
        "kmeans_clusters": q_kmeans_clusters,
        "quality_classifier": q_quality_classifier,
        "sketch_rollup": q_sketch_rollup,
        "curation_report": q_curation_report,
        "embedding_quantize": q_embedding_quantize,
        "lm_score": q_lm_score,
        "bigram_perplexity": q_bigram_perplexity,
        "dsir_weights": q_dsir_weights,
        "sessionization": q_sessionization,
        "dedup_exact": q_dedup_exact,
        "text_stats": q_text_stats,
        "winnow_fingerprint": q_winnow_fingerprint,
        "ngram_jaccard": q_ngram_jaccard,
        "dedup_groups": q_dedup_groups,
        "dedup_keep_best": q_dedup_keep_best,
        "dataset_splits": q_dataset_splits,
        "leakage_safe_split": q_leakage_safe_split,
        "corpus_overlap": q_corpus_overlap,
        "overlap_matrix": q_overlap_matrix,
        "embedding_covariance": q_embedding_covariance,
        "mixture_plan": q_mixture_plan,
        "shard_plan": q_shard_plan,
        "epoch_shuffle": q_epoch_shuffle,
        "bloom_gate": q_bloom_gate,
        "html_extract": q_html_extract,
        "cms_counts": q_cms_counts,
        "scene_cuts": q_scene_cuts,
        "neardup_transitivity": q_neardup_transitivity,
        "exact_spans": q_exact_spans,
        "span_quarantine": q_span_quarantine,
        "hll_cardinality": q_hll_cardinality,
        "link_prediction": q_link_prediction,
        "cusum_drift": q_cusum_drift,
        "weighted_jaccard": q_weighted_jaccard,
        "personalized_pagerank": q_personalized_pagerank,
        "ddsketch_quantiles": q_ddsketch_quantiles,
        "ngram_novelty": q_ngram_novelty,
        "template_mining": q_template_mining,
        "collocations": q_collocations,
        "reciprocal_nn": q_reciprocal_nn,
        "gopher_rules": q_gopher_rules,
        "c4_filter": q_c4_filter,
        "sorted_neighborhood": q_sorted_neighborhood,
        "graph_degree_stats": q_graph_degree_stats,
        "zipf_fit": q_zipf_fit,
        "khop_reach": q_khop_reach,
        "hyperball": q_hyperball,
        "readability": q_readability,
        "effective_diameter": q_effective_diameter,
        "k_anonymity": q_k_anonymity,
        "seasonal_decompose": q_seasonal_decompose,
        "attribution": q_attribution,
        "event_transitions": q_event_transitions,
        "rfm_scores": q_rfm_scores,
        "ab_test": q_ab_test,
        "lang_confusion": q_lang_confusion,
        "benford_law": q_benford_law,
        "revenue_gini": q_revenue_gini,
        "chi_square": q_chi_square,
        "ks_test": q_ks_test,
        "mad_outliers": q_mad_outliers,
        "mann_whitney": q_mann_whitney,
        "spearman": q_spearman,
        "kruskal": q_kruskal,
        "anova": q_anova,
        "mutual_info": q_mutual_info,
        "tiff_decode": q_tiff_decode,
        "gif_decode": q_gif_decode,
        "sentence_chunks": q_sentence_chunks,
        "basket_rules": q_basket_rules,
        "k_truss": q_k_truss,
        "doc_keywords": q_doc_keywords,
        "random_walks": q_random_walks,
        "sequence_packing": q_sequence_packing,
        "pii_redaction": q_pii_redaction,
        "term_frequencies": q_term_frequencies,
        "bm25_search": q_bm25_search,
        "minhash_lsh": q_minhash_lsh,
        "simhash": q_simhash,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "embedding_near_dup": q_embedding_near_dup,
        "embedding_near_dup_scale": q_embedding_near_dup_scale,
        "embedding_near_dup_exact": q_embedding_near_dup_exact,
        "corpus_curation": q_corpus_curation,
        "multimodal_decode": q_multimodal_decode,
        "video_frames": q_video_frames,
        "product_quantize": q_product_quantize,
        "pq_search": q_pq_search,
        "line_dedup": q_line_dedup,
        "streaming_events_window": q_streaming_events_window,
        "nn_descent": q_nn_descent,
        "ann_recall_report": q_ann_recall_report,
        "bpe_tokenize": q_bpe_tokenize,
        # TPC-H shape completion (tube_spark/queries/tpch.py) — with the
        # ten shapes above this covers all 22 TPC-H query shapes
        "semantic_dedup": q_semantic_dedup,
        "hybrid_retrieval": q_hybrid_retrieval,
        "forecast_revenue": _tpch.forecast_revenue,
        "volume_shipping": _tpch.volume_shipping,
        "market_share": _tpch.market_share,
        "product_profit": _tpch.product_profit,
        "cheapest_supplier": _tpch.cheapest_supplier,
        "important_nation_volume": _tpch.important_nation_volume,
        "top_supplier": _tpch.top_supplier,
        "parts_supplier_counts": _tpch.parts_supplier_counts,
        "small_qty_revenue": _tpch.small_qty_revenue,
        "discounted_brand_revenue": _tpch.discounted_brand_revenue,
        "excess_quantity_suppliers": _tpch.excess_quantity_suppliers,
        "waiting_suppliers": _tpch.waiting_suppliers,
    }


# The driver's correctness check covers the FIRST 50 registry entries in
# order (CORRECTNESS_r03 post-mortem: 19 oracled queries overflowed the
# window in round 3 and got no verification).  The contract below is
# enforced by tests/test_registry_window.py:
#   * positions 1-50: every query has an oracle_sql() twin (driver can
#     hash-match all of them);
#   * positions 51+: the permanently rows-only queries (engine-specific
#     hash/sampling choices or non-SQL-expressible streaming/iterative
#     work; exactly the entries of the _ROWS_ONLY tuple below, however
#     many it holds — tests/test_registry_window.py derives the count) —
#     window slots spent on them can never go green, so they sit last;
#   * redundant TPC-H/window shapes that would overflow the window are
#     demoted to extra_queries()/extra_oracle_sql(), differentially
#     verified by pytest (tests/test_extra_queries.py) instead of the
#     driver.
_ROWS_ONLY = (
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_near_dup",
    # dedup-grade LSH config (the 100 TB parameterization; empty on the
    # random synthetic embeddings by construction — see its docstring)
    "embedding_near_dup_scale",
    "streaming_events_window",
    "nn_descent",
    "ann_recall_report",
    # iterative argmax training — not SQL-expressible; differentially
    # verified against a pure-Python reference in tests/test_bpe.py
    "bpe_tokenize",
)

_EXTRA_QUERY_NAMES = (
    # r15 window queue (round-14 additions; the pre-r14 backlog is 0 —
    # the r14 rotation promoted all 11 queued entries).  r15 promotes
    # these, demoting an equal count of green r14 rows.
    "mann_whitney",
    "spearman",
    "kruskal",
    "anova",
    "mutual_info",
    "tiff_decode",
    # -- round-14 rotation: the sorted_neighborhood..attribution block
    # plus k_truss (green CORRECTNESS_r13 driver rows) demoted to the
    # extras tier (pytest-verified) to make room for the full 11-entry
    # r14 queue (event_transitions .. gif_decode) --
    "sorted_neighborhood",
    "graph_degree_stats",
    "zipf_fit",
    "khop_reach",
    "hyperball",
    "readability",
    "effective_diameter",
    "k_anonymity",
    "seasonal_decompose",
    "attribution",
    "k_truss",
    # -- round-13 rotation: the triangle_stats..c4_filter block (green
    # CORRECTNESS_r12 driver rows) demoted to the extras tier
    # (pytest-verified) to make room for the first 10 of the r13 queue
    # (sorted_neighborhood .. attribution) --
    "triangle_stats",
    "triangle_sample",
    "lpa_communities",
    "ddsketch_quantiles",
    "ngram_novelty",
    "template_mining",
    "collocations",
    "reciprocal_nn",
    "gopher_rules",
    "c4_filter",
    # -- round-12 rotation: the exact_spans..dsir_weights block (green
    # CORRECTNESS_r11 driver rows) demoted to the extras tier
    # (pytest-verified) to make room for the first 10 of the r12 queue
    # (triangle_stats .. c4_filter) --
    "exact_spans",
    "hll_cardinality",
    "link_prediction",
    "cusum_drift",
    "weighted_jaccard",
    "personalized_pagerank",
    "doc_keywords",
    "random_walks",
    "bigram_perplexity",
    "dsir_weights",
    # -- round-11 rotation: the merge_upsert..mixture_plan block (green
    # CORRECTNESS_r10 driver rows) demoted to the extras tier
    # (pytest-verified) to make room for the first 10 of the r11 queue
    # (exact_spans .. dsir_weights) --
    "merge_upsert",
    "scd2_history",
    "asof_join",
    "range_join",
    "time_rollup",
    "sketch_report",
    "shard_plan",
    "overlap_matrix",
    "embedding_covariance",
    "mixture_plan",
    # -- round-10 rotation: the column_profile..corpus_overlap block
    # (green CORRECTNESS_r09 driver rows) demoted to the extras tier
    # (pytest-verified) to make room for the first 10 round-9 queued
    # queries --
    "column_profile",
    "value_histogram",
    "weighted_sample",
    "class_balanced",
    "outlier_flags",
    "volume_shipping",
    "market_share",
    "product_profit",
    "leakage_safe_split",
    "corpus_overlap",
    "shipping_priority",
    "local_supplier_volume",
    "late_shipment_orders",
    "returned_item_customers",
    "order_count_distribution",
    "promo_revenue_share",
    "large_order_customers",
    "idle_high_balance_customers",
    "window_lag",
    "window_ntile",
    "cube_pricing",
    "filter_like",
    "stats_summary",
    "regexp_extract",
    # -- round-9 rotation: the 8 TPC-H re-shapes plus
    # forecast_revenue/zorder_layout (green r8 window rows) demoted to
    # the extras tier (pytest-verified) to make room for the backlog
    # promotion (shard_plan/overlap_matrix/embedding_covariance/
    # mixture_plan) and the analytics returns (merge_upsert ...
    # sketch_report) --
    "cheapest_supplier",
    "important_nation_volume",
    "top_supplier",
    "parts_supplier_counts",
    "small_qty_revenue",
    "discounted_brand_revenue",
    "excess_quantity_suppliers",
    "waiting_suppliers",
    "forecast_revenue",
    "zorder_layout",
    # -- round-8 rotation: the round-7 batch (green CORRECTNESS_r07
    # driver rows) and the analytics-extensions block (green since r4)
    # demoted to the extras tier (pytest-verified) to make room for the
    # 20-slot backlog drain --
    "video_frames",
    "product_quantize",
    "pq_search",
    "line_dedup",
    "quality_checks",
    "repetition_stats",
    "grouped_topk",
    "snapshot_diff",
    "stratified_fixed_k",
    "ann_lsh_topk_portable",
    "pricing_summary",
    "returnflag_priority",
    "top_revenue_nations",
    "rollup_pricing",
    # -- round-7 rotation: the round-6 batch, each with a green
    # CORRECTNESS_r06 driver row, demoted to the extras tier
    # (pytest-verified) --
    "ngram_containment",
    "cluster_terms",
    "psi_drift",
    "hashed_features",
    "hard_negatives",
    "embedding_quantize",
    "lm_score",
    "data_mixture",
    "decontamination",
    "doc_chunking",
    # -- round-6 rotation: flagships with green CORRECTNESS_r05 driver
    # rows, demoted back to the extras tier (pytest-verified) --
    "pagerank",
    "entity_resolution",
    "kmeans_clusters",
    "quality_classifier",
    "semantic_dedup",
    "hybrid_retrieval",
    "curation_report",
    "span_dedup",
    "sketch_rollup",
    "heavy_hitters",
    # -- round-5 rotation: previously-windowed analytics shapes (each
    # carries a green CORRECTNESS_r04 driver row; now pytest-verified) --
    "events_window",
    "event_funnel",
    "cohort_retention",
    "window_rank",
    "ntile_distributed",
    "pivot_status",
    "intersect_except",
    "anti_join",
    "global_topk",
    "events_json_extract",
)

_QUERY_ORDER = (
    # -- reference-parity core (SURVEY §2 S/P/J/A/W/U/N/C rows) --
    "props_value_map",
    "parent_chain",
    "flatten_top1",
    "agg_basic",
    "agg_set",
    "agg_sorted_list",
    "two_hop_count",
    "nested_docs",
    "nested_two_level",
    "filter_dsl",
    "collector_union",
    "joining_props",
    # -- LLM-pipeline suite (dedup / similarity / curation / text) --
    "sessionization",
    "dedup_exact",
    "text_stats",
    "winnow_fingerprint",
    "ngram_jaccard",
    "dedup_groups",
    "dedup_keep_best",
    "dataset_splits",
    "sequence_packing",
    "pii_redaction",
    "term_frequencies",
    "bm25_search",
    "minhash_lsh",
    "simhash",
    "ann_cosine_topk",
    "embedding_near_dup_exact",
    "corpus_curation",
    "multimodal_decode",
    # -- round-14 rotation (executes the r13 schedule comment exactly):
    # the full 11-entry queue takes slots 31-41 — the 7 remaining
    # round-11 entries (event_transitions .. chi_square),
    # span_quarantine (r12), and ks_test / mad_outliers / gif_decode
    # (r13).  Demoted to _EXTRA_QUERY_NAMES (still differentially
    # verified by pytest, tests/test_extra_queries.py): the
    # sorted_neighborhood .. attribution block (green CORRECTNESS_r13
    # rows) plus k_truss from the round-10 block.  Backlog after this
    # rotation: 0 pre-existing; the r15 queue is exactly the round-14
    # additions (mann_whitney .. — see the _EXTRA_QUERY_NAMES head).
    "event_transitions",
    "rfm_scores",
    "ab_test",
    "lang_confusion",
    "benford_law",
    "revenue_gini",
    "chi_square",
    "span_quarantine",
    "ks_test",
    "mad_outliers",
    "gif_decode",
    # -- round-10 promotions: first driver rows for the round-9 work --
    "k_core",
    "epoch_shuffle",
    "bloom_gate",
    "html_extract",
    "cms_counts",
    "scene_cuts",
    "neardup_transitivity",
    "sentence_chunks",
    "basket_rules",
    # -- positions 51+: permanently rows-only (len(_ROWS_ONLY) entries) --
) + _ROWS_ONLY

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    k: _ALL_QUERIES[k] for k in _QUERY_ORDER
}


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Oracled queries demoted from the driver's 50-row correctness
    window; differentially verified by tests/test_extra_queries.py."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_ensure(spark), sf_dir)

        run.__name__ = fn.__name__
        run.__doc__ = fn.__doc__
        return run

    return {k: wrap(_ALL_QUERIES[k]) for k in _EXTRA_QUERY_NAMES}


def extra_oracle_sql() -> dict[str, str]:
    full = _all_oracle_sql()
    return {k: full[k] for k in _EXTRA_QUERY_NAMES if k in full}


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_TOK = "list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '')"


def oracle_sql() -> dict[str, str]:
    """Driver-facing oracles, in registry-window order (50 entries —
    every windowed query except the rows-only tails in _ROWS_ONLY)."""
    full = _all_oracle_sql()
    return {k: full[k] for k in _QUERY_ORDER if k in full}


def _kmeans_oracle_sql(k: int = 4, iters: int = 3) -> str:
    """Unrolled Lloyd iterations as chained CTEs: assignment = lowest-
    distance (ties to lowest cid) via row_number; update = per-(cid,dim)
    mean rounded to 6 decimals — the identical trajectory to
    operators/clustering.py's round_to=6 fit (same float→double
    promotion, same dim-sequential distance fold)."""

    def assign(src: str, cent: str) -> str:
        return f"""
            SELECT vec_id, v, cid FROM (
                SELECT e.vec_id, e.v, c.cid,
                       row_number() OVER (PARTITION BY e.vec_id ORDER BY
                           list_sum(list_transform(generate_series(1, len(e.v)),
                               j -> (e.v[j]::DOUBLE - c.c[j]) ^ 2)), c.cid) AS rn
                FROM {src} e, {cent} c
            ) WHERE rn = 1"""

    def update(a: str) -> str:
        return f"""
            SELECT cid, list(mval ORDER BY dim) AS c FROM (
                SELECT cid, dim, round(avg(val), 6) AS mval FROM (
                    SELECT cid,
                           unnest(generate_series(1, len(v))) AS dim,
                           unnest(list_transform(generate_series(1, len(v)),
                               j -> v[j]::DOUBLE)) AS val
                    FROM {a}
                ) GROUP BY cid, dim
            ) GROUP BY cid"""

    ctes = [
        "e AS (SELECT vec_id, embedding AS v FROM embeddings)",
        f"""c0 AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
                   list_transform(v, x -> x::DOUBLE) AS c
            FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {k})
        )""",
    ]
    for i in range(iters):
        ctes.append(f"a{i + 1} AS ({assign('e', f'c{i}')})")
        ctes.append(f"c{i + 1} AS ({update(f'a{i + 1}')})")
    final = assign("e", f"c{iters}")
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT vec_id, cid::INTEGER AS cluster FROM ({final})"
    )


def _logreg_oracle_sql(iters: int = 10, lr: float = 1.0) -> str:
    """Unrolled full-batch logistic-regression GD matching
    operators/classifier.py: identical feature expressions, rounded
    standardization stats, per-iteration gradients rounded to 6
    decimals, scores rounded to 4.  Weight CTEs chain via scalar
    subqueries; expression shapes (left-assoc dot product, 1/(1+exp(-z))
    sigmoid) mirror the Spark column algebra so doubles stay
    bit-identical below the rounding grain."""
    feats = {
        "f_loglen": "ln(1 + len(t))",
        "f_wordlen": "coalesce(list_sum(list_transform(t, x -> len(x)))::DOUBLE"
        " / nullif(len(t), 0), 0.0)",
        "f_stopfrac": "coalesce(len(list_filter(t, x -> x IN"
        " ('the','a','of','and','to','in')))::DOUBLE / nullif(len(t), 0), 0.0)",
        "f_distinct": "coalesce(len(list_distinct(t))::DOUBLE"
        " / nullif(len(t), 0), 0.0)",
    }
    names = list(feats)
    feat_sel = ",\n                ".join(f"{e} AS {n}" for n, e in feats.items())
    stat_sel = ",\n                ".join(
        f"round(avg({n}), 6) AS m_{n}, round(stddev_pop({n}), 6) AS s_{n}"
        for n in names
    )
    std_sel = ",\n                ".join(
        f"({n} - (SELECT m_{n} FROM st)) / (CASE WHEN (SELECT s_{n} FROM st) = 0"
        f" THEN 1 ELSE (SELECT s_{n} FROM st) END) AS {n}"
        for n in names
    )

    def margin(wk: str) -> str:
        z = f"(SELECT b FROM {wk})"
        for n in names:
            z += f" + (SELECT w_{n} FROM {wk}) * {n}"
        return "(" + z + ")"

    # MATERIALIZED: DuckDB inlines plain CTEs per reference; the weight
    # chain references each predecessor several times per iteration, so
    # inlining is exponential in iters (observed: file-handle exhaustion
    # from thousands of replayed parquet scans).  Materializing makes
    # each stage compute once — the same shape the Spark side executes.
    ctes = [
        f"""f AS MATERIALIZED (
            SELECT doc_id,
                {feat_sel},
                CASE WHEN f_stopfrac > 0.05 AND f_distinct > 0.45
                     THEN 1.0 ELSE 0.0 END AS y
            FROM (SELECT doc_id, {_TOK} AS t FROM documents)
        )""",
        f"""st AS MATERIALIZED (
            SELECT {stat_sel} FROM f
        )""",
        f"""z AS MATERIALIZED (
            SELECT doc_id, y,
                {std_sel}
            FROM f
        )""",
        "w0 AS MATERIALIZED (SELECT "
        + ", ".join(f"0.0 AS w_{n}" for n in names)
        + ", 0.0 AS b)",
    ]
    for k in range(1, iters + 1):
        prev = f"w{k - 1}"
        sig = f"1 / (1 + exp(-{margin(prev)}))"
        cols = [
            f"round((SELECT w_{n} FROM {prev}) - {lr} * avg(({sig} - y) * {n}), 6)"
            f" AS w_{n}"
            for n in names
        ]
        cols.append(
            f"round((SELECT b FROM {prev}) - {lr} * avg({sig} - y), 6) AS b"
        )
        ctes.append(
            f"w{k} AS MATERIALIZED (SELECT "
            + ",\n                ".join(cols)
            + " FROM z)"
        )
    final_sig = f"round(1 / (1 + exp(-{margin(f'w{iters}')})), 4)"
    return (
        "WITH " + ",\n".join(ctes) + f"""
        SELECT doc_id, {final_sig} AS score,
               ({final_sig} >= 0.5)::INTEGER AS predicted,
               y::INTEGER AS label
        FROM z"""
    )



def _part_graph_cte(edge_filter: str = "") -> str:
    """Shared part co-occurrence edge construction (deterministic 25%
    order sample, hot-group cap 10) — ONE text used by the triangle
    census, the DOULION sample, and the LPA oracle so the graphs can
    never diverge."""
    return f"""
            WITH mem AS (
                SELECT DISTINCT l_orderkey AS g, l_partkey AS n FROM lineitem
                WHERE l_orderkey % 4 = 0
            ),
            memc AS (
                SELECT g, n FROM mem
                QUALIFY count(*) OVER (PARTITION BY g) <= 10
            ),
            e AS (
                SELECT DISTINCT x.n AS a, y.n AS b
                FROM memc x JOIN memc y USING (g)
                WHERE x.n < y.n {edge_filter}
            )"""


def _census_ctes() -> str:
    """The degree-ordered triangle-census CTE chain over an ``e(a, b)``
    edge CTE — ONE text shared by the part-graph census, the DOULION
    sample, and the near-dup transitivity report so the census math can
    never diverge across graphs."""
    return """,
            deg AS (
                SELECT n, count(*) AS d FROM (
                    SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e
                ) GROUP BY 1
            ),
            ed AS (
                SELECT a, b, da.d AS da, db.d AS db
                FROM e JOIN deg da ON da.n = e.a JOIN deg db ON db.n = e.b
            ),
            dir AS (
                SELECT CASE WHEN da < db OR (da = db AND a < b)
                            THEN a ELSE b END AS src,
                       CASE WHEN da < db OR (da = db AND a < b)
                            THEN b ELSE a END AS dst,
                       CASE WHEN da < db OR (da = db AND a < b)
                            THEN db ELSE da END AS dst_d
                FROM ed
            ),
            wed AS (
                SELECT e1.dst AS v, e2.dst AS w
                FROM dir e1 JOIN dir e2 ON e1.src = e2.src
                WHERE e1.dst_d < e2.dst_d
                   OR (e1.dst_d = e2.dst_d AND e1.dst < e2.dst)
            ),
            tri AS (
                SELECT count(*) AS n_triangles FROM wed
                WHERE EXISTS (
                    SELECT 1 FROM dir WHERE dir.src = wed.v AND dir.dst = wed.w
                )
            )"""


_CENSUS_SELECT = """
            SELECT (SELECT count(*) FROM deg) AS n_nodes,
                   (SELECT count(*) FROM e) AS n_edges,
                   (SELECT sum(d * (d - 1) / 2) FROM deg)::BIGINT AS n_wedges,
                   n_triangles,
                   CASE WHEN (SELECT sum(d * (d - 1) / 2) FROM deg) > 0
                        THEN round(3.0 * n_triangles /
                             (SELECT sum(d * (d - 1) / 2) FROM deg), 6)
                        ELSE 0.0 END AS global_clustering
            FROM tri
        """


def _tri_oracle_sql(sampled: bool) -> str:
    """Triangle-census DuckDB oracle; the sampled (DOULION) variant
    shares the exact construction with an edge-hash filter + 1/p^3
    scaling so the two can never diverge."""
    edge_filter = ""
    if sampled:
        edge_filter = (
            "AND ('0x' || substr(md5('tri' || '|' || x.n::VARCHAR || '|' "
            "|| y.n::VARCHAR), 1, 15))::BIGINT % 1000000 < 700000"
        )
    core = _part_graph_cte(edge_filter) + _census_ctes()
    if sampled:
        return core + """
            SELECT 0.7::DOUBLE AS p,
                   (SELECT count(*) FROM e) AS n_edges_sampled,
                   n_triangles AS n_triangles_sampled,
                   round(n_triangles / (0.7::DOUBLE * 0.7::DOUBLE
                                        * 0.7::DOUBLE), 2) AS n_triangles_est
            FROM tri
        """
    return core + _CENSUS_SELECT


def _neardup_transitivity_oracle_sql() -> str:
    """Census over the MinHash-LSH near-dup pair graph: the full
    portable LSH pipeline (the ``minhash_lsh`` oracle, embedded as a
    subquery CTE — the leakage_safe_split pattern) feeding the SAME
    census CTE chain as the part-graph triangle oracle."""
    return (
        f"""
            WITH pairs AS (
                {_minhash_oracle()}
            ),
            e AS (SELECT id_a AS a, id_b AS b FROM pairs)"""
        + _census_ctes()
        + _CENSUS_SELECT
    )


def _linkpred_oracle_sql(k: int = 100, max_degree: int = 15) -> str:
    """Replays operators/linkpred.py over the shared part graph:
    directed doubling, degrees, hub-capped wedge self-join on the
    shared neighbor, 1/ln(deg) Adamic-Adar sum, existing-edge
    exclusion, degree-normalized Jaccard (full degrees — the cap only
    drops hub WEDGES), deterministic ranked cut."""
    return (
        _part_graph_cte()
        + f""",
            lp_dir AS (
                SELECT a AS n, b AS z FROM e
                UNION ALL
                SELECT b AS n, a AS z FROM e
            ),
            lp_deg AS (
                SELECT z, count(*) AS deg FROM lp_dir GROUP BY 1
            ),
            lp_hop AS (
                SELECT d.n, d.z, g.deg FROM lp_dir d JOIN lp_deg g USING (z)
                WHERE g.deg <= {max_degree}
            ),
            lp_cand AS (
                SELECT x.n AS u, y.n AS v,
                       count(*) AS cn,
                       sum(1.0 / ln(x.deg)) AS aa_raw
                FROM lp_hop x JOIN lp_hop y USING (z)
                WHERE x.n < y.n
                GROUP BY 1, 2
            ),
            lp_non AS (
                SELECT c.* FROM lp_cand c
                WHERE NOT EXISTS (
                    SELECT 1 FROM e WHERE e.a = c.u AND e.b = c.v
                )
            )
            SELECT n.u, n.v, n.cn,
                   round(n.cn * 1.0 / (du.deg + dv.deg - n.cn), 6) AS jaccard,
                   round(n.aa_raw, 6) AS aa
            FROM lp_non n
            JOIN lp_deg du ON du.z = n.u
            JOIN lp_deg dv ON dv.z = n.v
            ORDER BY aa DESC, cn DESC, u ASC, v ASC
            LIMIT {k}"""
    )


def _weighted_jaccard_oracle_sql() -> str:
    """Replays dedup.weighted_jaccard_pairs over the exact_spans pair
    set: tf counts, shared-term min-sum, totals — integer arithmetic
    end to end."""
    return f"""
            WITH lsh AS (
                {_minhash_oracle()}
            ),
            wj_probe AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
            ),
            wj_pairs AS (
                SELECT id_a, id_b FROM lsh
                UNION
                SELECT id_a, id_b FROM wj_probe
            ),
            wj_tok AS (
                SELECT doc_id, unnest(list_filter(
                    regexp_split_to_array(lower(text), '[^a-z]+'),
                    x -> x <> ''
                )) AS term
                FROM documents WHERE text IS NOT NULL
            ),
            wj_tf AS (
                SELECT doc_id, term, count(*) AS tf FROM wj_tok GROUP BY 1, 2
            ),
            wj_tot AS (
                SELECT doc_id, sum(tf)::BIGINT AS tot FROM wj_tf GROUP BY 1
            ),
            wj_inter AS (
                SELECT p.id_a, p.id_b,
                       count(*) AS n_common_terms,
                       sum(least(a.tf, b.tf))::BIGINT AS w_inter
                FROM wj_pairs p
                JOIN wj_tf a ON a.doc_id = p.id_a
                JOIN wj_tf b ON b.doc_id = p.id_b AND b.term = a.term
                GROUP BY 1, 2
            )
            SELECT p.id_a, p.id_b,
                   coalesce(i.n_common_terms, 0)::BIGINT AS n_common_terms,
                   coalesce(i.w_inter, 0)::BIGINT AS w_intersection,
                   (coalesce(ta.tot, 0) + coalesce(tb.tot, 0)
                    - coalesce(i.w_inter, 0))::BIGINT AS w_union,
                   CASE WHEN coalesce(ta.tot, 0) + coalesce(tb.tot, 0)
                             - coalesce(i.w_inter, 0) > 0
                        THEN round(coalesce(i.w_inter, 0) * 1.0
                             / (coalesce(ta.tot, 0) + coalesce(tb.tot, 0)
                                - coalesce(i.w_inter, 0)), 6)
                        ELSE 0.0 END AS weighted_jaccard
            FROM wj_pairs p
            LEFT JOIN wj_inter i USING (id_a, id_b)
            LEFT JOIN wj_tot ta ON ta.doc_id = p.id_a
            LEFT JOIN wj_tot tb ON tb.doc_id = p.id_b"""


def _ppr_oracle_sql(iters: int = 3, d: float = 0.85) -> str:
    """Unrolled personalized-PageRank trajectory on the bidirectional
    supplier-part graph: rank' = (1-d)*p + d*(inflow + dm*p), p uniform
    over every-5th suppliers, dm the dangling (edge-isolated seed) mass
    — carried structurally even though this graph usually has dm = 0."""
    rounds = []
    for i in range(iters):
        # dangling mass term mirrors personalized_pagerank exactly:
        # rank' = (1-d)*p + d*(inflow + dm*p), dm summed over seed
        # nodes with no outgoing edge (the only possible dangling nodes
        # on a bidirectional graph) — structural parity, not the
        # data-dependent assumption that dm happens to be zero
        rounds.append(f"""r{i + 1} AS MATERIALIZED (
                SELECT pv.node, pv.p,
                       {1 - d} * pv.p
                       + {d} * (coalesce(i.inflow, 0.0) + dm.m * pv.p) AS rank
                FROM pv LEFT JOIN (
                    SELECT e.dst AS node, sum(r{i}.rank / od.outdeg) AS inflow
                    FROM e JOIN r{i} ON r{i}.node = e.src
                           JOIN od ON od.src = e.src
                    GROUP BY e.dst
                ) i USING (node)
                CROSS JOIN (
                    SELECT coalesce(sum(r{i}.rank), 0.0) AS m
                    FROM r{i} JOIN dang ON dang.node = r{i}.node
                ) dm
            )""")
    return f"""
            WITH fwd AS (
                SELECT DISTINCT l_suppkey AS src,
                       l_partkey + 1000000 AS dst
                FROM lineitem
            ), e AS (
                SELECT src, dst FROM fwd
                UNION ALL
                SELECT dst, src FROM fwd
            ), srcs AS (
                SELECT s_suppkey AS node FROM supplier WHERE s_suppkey % 5 = 0
            ), nodes AS (
                SELECT DISTINCT src AS node FROM e
                UNION
                SELECT DISTINCT dst FROM e
                UNION
                SELECT node FROM srcs
            ), ns AS (
                SELECT count(*)::DOUBLE AS n FROM srcs
            ), pv AS (
                SELECT nodes.node,
                       CASE WHEN srcs.node IS NOT NULL
                            THEN 1.0 / (SELECT n FROM ns)
                            ELSE 0.0 END AS p
                FROM nodes LEFT JOIN srcs USING (node)
            ), od AS (
                SELECT src, count(*)::DOUBLE AS outdeg FROM e GROUP BY src
            ), dang AS MATERIALIZED (
                SELECT node FROM nodes
                WHERE node NOT IN (SELECT src FROM od)
            ), r0 AS MATERIALIZED (
                SELECT node, p, p AS rank FROM pv
            ), {", ".join(rounds)}
            SELECT node, round(rank, 8) AS rank FROM r{iters}"""


def _cusum_oracle_sql(k: float = 0.5, h: float = 5.0) -> str:
    """Replays operators/changepoint.py cusum_changepoints: rounded
    per-series baseline, INTEGER micro-unit deviations (exact int64
    cumulative sums — float windowed sums diverge between engines at
    the last ulp because DuckDB aggregates windows via segment trees),
    running min, two-sided statistics and alarms."""
    return f"""
            WITH cp_base AS (
                SELECT event_type,
                       round(avg(value), 6) AS mu,
                       round(coalesce(stddev_pop(value), 0.0), 6) AS sigma
                FROM events WHERE value IS NOT NULL GROUP BY 1
            ),
            cp_c AS (
                SELECT e.event_type, e.ts, e.event_id, e.value,
                       round({h} * b.sigma * 1e6)::BIGINT AS thr,
                       sum(round((e.value - b.mu - {k} * b.sigma) * 1e6)::BIGINT)
                           OVER w AS c_hi,
                       sum(round((b.mu - e.value - {k} * b.sigma) * 1e6)::BIGINT)
                           OVER w AS c_lo
                FROM events e JOIN cp_base b USING (event_type)
                WHERE e.value IS NOT NULL
                WINDOW w AS (PARTITION BY e.event_type
                             ORDER BY e.ts, e.event_id
                             ROWS UNBOUNDED PRECEDING)
            ),
            cp_s AS (
                SELECT event_type, ts, event_id, value, thr,
                       c_hi - least(min(c_hi) OVER w, 0) AS s_hi,
                       c_lo - least(min(c_lo) OVER w, 0) AS s_lo
                FROM cp_c
                WINDOW w AS (PARTITION BY event_type
                             ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING)
            )
            SELECT event_type, ts, event_id, value,
                   round(s_hi / 1e6, 6) AS s_hi,
                   round(s_lo / 1e6, 6) AS s_lo,
                   s_hi > thr AS alarm_hi,
                   s_lo > thr AS alarm_lo
            FROM cp_s"""


def _ddsketch_oracle_sql(sub_bits: int = 5) -> str:
    """Replays operators/ddsketch.py end to end in integers: micro-unit
    quantization, bit-length octave (length(bin(v)) — same exact-log2
    rule as the HLL oracle), mantissa sub-bucket via dynamic shifts,
    per-group cumulative rank selection at ceil(q*n), integer bucket
    midpoint; plus the exact rank-quantile witness column."""
    m = sub_bits
    two_m = 1 << m
    return f"""
            WITH dd_v AS (
                SELECT event_type,
                       round(value * 1e6)::BIGINT AS vi,
                       value
                FROM events
                WHERE value IS NOT NULL AND value >= 0
            ),
            dd_b AS (
                SELECT event_type,
                       CASE
                           WHEN vi <= 0 THEN -1
                           WHEN vi < {two_m} THEN vi
                           ELSE (length(bin(vi)) - 1 - {m} + 1) * {two_m}
                                + ((vi >> (length(bin(vi)) - 1 - {m}))
                                   - {two_m})
                       END AS bucket
                FROM dd_v
            ),
            dd_cnt AS (
                SELECT event_type, bucket, count(*) AS cnt
                FROM dd_b GROUP BY 1, 2
            ),
            dd_cum AS (
                SELECT event_type, bucket,
                       sum(cnt) OVER (PARTITION BY event_type
                                      ORDER BY bucket
                                      ROWS UNBOUNDED PRECEDING) AS cum,
                       sum(cnt) OVER (PARTITION BY event_type) AS n
                FROM dd_cnt
            ),
            dd_q AS (
                -- DOUBLE, not DECIMAL: ceil(0.9 * 10) is 10 in IEEE
                -- doubles (0.9 rounds up) but 9 in decimal — Spark
                -- computes doubles, so the oracle must too
                SELECT * FROM (VALUES (0.5::DOUBLE), (0.9::DOUBLE),
                                      (0.99::DOUBLE)) t(q)
            ),
            dd_sel AS (
                SELECT event_type, q, min(bucket) AS bucket, max(n) AS n
                FROM dd_cum CROSS JOIN dd_q
                WHERE cum >= ceil(q * n)::BIGINT
                GROUP BY 1, 2
            ),
            dd_est AS (
                SELECT event_type, round(q, 4) AS q,
                       CASE
                           WHEN bucket <= -1 THEN 0.0
                           WHEN bucket < {two_m} THEN bucket / 1e6
                           ELSE ((({two_m} + bucket % {two_m})
                                  * (1::BIGINT << (bucket // {two_m} - 1))
                                  + (({two_m} + bucket % {two_m})
                                     * (1::BIGINT << (bucket // {two_m} - 1))
                                     + (1::BIGINT << (bucket // {two_m} - 1))
                                     - 1)) // 2) / 1e6
                       END AS est_value,
                       n::BIGINT AS n_values
                FROM dd_sel
            ),
            dd_rank AS (
                SELECT event_type, value,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY value) AS rn,
                       count(*) OVER (PARTITION BY event_type) AS n
                FROM dd_v
            ),
            dd_exact AS (
                SELECT event_type, round(q, 4) AS q,
                       value AS exact_value
                FROM dd_rank CROSS JOIN dd_q
                WHERE rn = ceil(q * n)::BIGINT
            )
            SELECT e.event_type, e.q,
                   round(e.est_value, 6) AS est_value,
                   e.n_values, x.exact_value
            FROM dd_est e JOIN dd_exact x USING (event_type, q)"""


def _hll_oracle_sql(p: int = 10, seed: str = "hll") -> str:
    """Replays operators/hll.py hll_grouped bit-for-bit: the 60-bit md5
    hash, low-bits register index / high-bits rank split (rank via the
    exact binary-string length — both engines' ``bin`` drops leading
    zeros identically), max-rank registers, and the corrected
    estimator, joined with exact distincts."""
    from tube_spark.operators.hll import _alpha

    m = 1 << p
    w_bits = 60 - p
    alpha = repr(_alpha(m))
    return f"""
            WITH hll_tok AS (
                SELECT lang, unnest(list_filter(
                    regexp_split_to_array(lower(text), '[^a-z]+'),
                    x -> x <> ''
                )) AS tok
                FROM documents
                WHERE lang IS NOT NULL AND text IS NOT NULL
            ),
            hll_rnk AS (
                SELECT lang,
                       h % {m} AS j,
                       CASE WHEN h // {m} > 0
                            THEN {w_bits} - length(bin(h // {m})) + 1
                            ELSE {w_bits} + 1 END AS rank
                FROM (
                    SELECT lang,
                           ('0x' || substr(md5('{seed}|' || tok), 1, 15))::BIGINT AS h
                    FROM hll_tok
                )
            ),
            hll_regs AS (
                SELECT lang, j, max(rank) AS m_rank FROM hll_rnk GROUP BY 1, 2
            ),
            hll_agg AS (
                SELECT lang,
                       sum(power(2.0, -m_rank)) AS s_present,
                       count(*) AS n_present
                FROM hll_regs GROUP BY 1
            ),
            hll_est AS (
                SELECT lang,
                       {m} AS m,
                       ({m} - n_present) AS n_zero,
                       {alpha}::DOUBLE * {m} * {m}
                           / (s_present + ({m} - n_present)) AS raw
                FROM hll_agg
            ),
            hll_fin AS (
                SELECT lang, m, n_zero,
                       round(CASE WHEN raw <= 2.5 * {m} AND n_zero > 0
                             THEN {m}.0 * ln({m}.0 / n_zero)
                             ELSE raw END, 4) AS estimate
                FROM hll_est
            ),
            hll_ex AS (
                SELECT lang, count(DISTINCT tok) AS exact FROM hll_tok GROUP BY 1
            )
            SELECT f.lang, f.m, f.n_zero, f.estimate, e.exact
            FROM hll_fin f JOIN hll_ex e USING (lang)"""


def _benford_oracle_sql() -> str:
    """Replays operators/stats_tests.py benford_digits over lineitem
    extended prices — the expected-share constants are the SAME
    python-computed log10(1+1/d) doubles the operator embeds, so the
    two engines compare literals, not libm calls."""
    import math

    vals = ",".join(
        f"({d}, {math.log10(1 + 1 / d)!r}::DOUBLE)" for d in range(1, 10)
    )
    return f"""
            WITH bf AS (
                SELECT floor(abs(l_extendedprice)
                       / power(10, floor(log10(abs(l_extendedprice)))))
                       ::INTEGER AS digit
                FROM lineitem
                WHERE l_extendedprice IS NOT NULL
                  AND abs(l_extendedprice) > 0
                  AND NOT isnan(l_extendedprice)
                  AND isfinite(l_extendedprice)
            ),
            bc AS (
                SELECT digit, count(*)::BIGINT AS n FROM bf GROUP BY 1
            ),
            be AS (SELECT * FROM (VALUES {vals}) v(digit, ep)),
            bj AS (
                SELECT bc.digit, bc.n, be.ep,
                       sum(bc.n) OVER () AS t
                FROM bc JOIN be USING (digit)
            ),
            bx AS (
                SELECT digit, n, ep, t,
                       t * (n / t - ep) * (n / t - ep) / ep AS chi_term
                FROM bj
            )
            SELECT digit, n,
                   round(n / t, 6) AS observed_p,
                   round(ep, 6) AS expected_p,
                   round(chi_term, 6) AS chi2_term,
                   round(sum(chi_term) OVER (), 6) AS chi2_total
            FROM bx"""


def _hb_round_ctes(rounds: int, p: int, seed: str) -> list[str]:
    """CTE chain replaying operators/graphstats.py HyperBall counters
    over the census part co-occurrence graph: singleton register init
    from the portable 60-bit md5 hash of the node id, then ``rounds``
    unrolled merge rounds (union own registers with every
    in-neighbor's, max per (node, j)) — hb_r0 .. hb_r{rounds}."""
    m = 1 << p
    w_bits = 60 - p
    ctes = [
        _part_graph_cte(),
        """
            hb_dir AS (
                SELECT a AS u, b AS v FROM e
                UNION ALL SELECT b AS u, a AS v FROM e
            )""",
        f"""
            hb_r0 AS (
                SELECT node,
                       (h % {m})::INTEGER AS j,
                       (CASE WHEN h // {m} > 0
                             THEN {w_bits} - length(bin(h // {m})) + 1
                             ELSE {w_bits} + 1 END)::INTEGER AS m_rank
                FROM (
                    SELECT node,
                           ('0x' || substr(md5('{seed}|' || node::VARCHAR),
                                           1, 15))::BIGINT AS h
                    FROM (SELECT DISTINCT u AS node FROM hb_dir)
                )
            )""",
    ]
    for t in range(1, rounds + 1):
        ctes.append(f"""
            hb_r{t} AS (
                SELECT node, j, max(m_rank) AS m_rank FROM (
                    SELECT node, j, m_rank FROM hb_r{t - 1}
                    UNION ALL
                    SELECT d.u AS node, r.j, r.m_rank
                    FROM hb_dir d JOIN hb_r{t - 1} r ON r.node = d.v
                ) GROUP BY 1, 2
            )""")
    return ctes


def _hb_estimate_sql(reg_cte: str, p: int) -> str:
    """Per-node estimator arithmetic (hll.py hll_estimate_by) over a
    register CTE — SELECT node, raw, n_zero -> rounded estimate."""
    from tube_spark.operators.hll import _alpha

    m = 1 << p
    alpha = repr(_alpha(m))
    return f"""
                SELECT node, ({m} - n_present) AS n_zero,
                       round(CASE WHEN {alpha}::DOUBLE * {m} * {m}
                                       / (s_present + ({m} - n_present))
                                  <= 2.5 * {m} AND ({m} - n_present) > 0
                             THEN {m}.0 * ln({m}.0 / ({m} - n_present))
                             ELSE {alpha}::DOUBLE * {m} * {m}
                                  / (s_present + ({m} - n_present))
                             END, 4) AS estimate
                FROM (
                    SELECT node,
                           sum(power(2.0, -m_rank)) AS s_present,
                           count(*) AS n_present
                    FROM {reg_cte} GROUP BY 1
                )"""


def _hyperball_oracle_sql(rounds: int = 2, p: int = 5, seed: str = "hb") -> str:
    """Per-node HyperBall ball estimates — q_hyperball's twin."""
    m = 1 << p
    ctes = _hb_round_ctes(rounds, p, seed)
    return (
        ",".join(ctes)
        + f"""
            SELECT node, {m} AS m, n_zero::BIGINT AS n_zero, estimate
            FROM ({_hb_estimate_sql(f'hb_r{rounds}', p)})"""
    )


def _nf_oracle_sql(max_rounds: int = 3, p: int = 7, seed: str = "hb") -> str:
    """Neighborhood-function curve — q_effective_diameter's twin: the
    same unrolled counter rounds, a per-round estimate sum, and the
    90%-of-final effective-diameter readout."""
    ctes = _hb_round_ctes(max_rounds, p, seed)
    for t in range(max_rounds + 1):
        ctes.append(f"""
            hb_nf{t} AS (
                SELECT {t} AS round, round(sum(estimate), 4) AS nf_est
                FROM ({_hb_estimate_sql(f'hb_r{t}', p)})
            )""")
    union = "\n                UNION ALL ".join(
        f"SELECT * FROM hb_nf{t}" for t in range(max_rounds + 1)
    )
    ctes.append(f"""
            hb_nf AS (
                {union}
            ),
            hb_tot AS (SELECT max(nf_est) AS total FROM hb_nf),
            hb_first AS (
                SELECT min(round) AS first90
                FROM hb_nf, hb_tot WHERE nf_est / total >= 0.9
            )""")
    return (
        ",".join(ctes)
        + """
            SELECT round, nf_est,
                   round(nf_est / total, 6) AS nf_ratio,
                   (round = first90) AS is_effective
            FROM hb_nf, hb_tot, hb_first
            ORDER BY round"""
    )


def _exact_spans_oracle_sql(L: int = 20) -> str:
    """Replays operators/exactspans.py exactly: candidate pairs (the
    portable LSH pipeline UNION the consecutive-id probe), a character
    L-gram index per participating doc (static series cross join —
    DuckDB's generate_series is not lateral-correlatable), the
    pair-local gram match, and the diagonal gaps-and-islands maximal
    runs with span_len = run + L - 1."""
    return f"""
            WITH lsh AS (
                {_minhash_oracle()}
            ),
            probe AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
            ),
            pairs AS (
                SELECT id_a, id_b FROM lsh
                UNION
                SELECT id_a, id_b FROM probe
            ),
            es_ids AS (SELECT id_a AS id FROM pairs UNION SELECT id_b FROM pairs),
            es_t AS (
                SELECT doc_id, text FROM documents
                WHERE length(text) >= {L} AND doc_id IN (SELECT id FROM es_ids)
            ),
            es_series AS (
                SELECT unnest(generate_series(
                    1, (SELECT max(length(text)) FROM documents)
                )) AS i
            ),
            es_grams AS MATERIALIZED (
                SELECT t.doc_id, s.i AS pos, substr(t.text, s.i::INT, {L}) AS gram
                FROM es_t t JOIN es_series s ON s.i <= length(t.text) - {L} + 1
            ),
            es_m AS (
                SELECT p.id_a, p.id_b, ga.pos AS pos_a, gb.pos AS pos_b
                FROM pairs p
                JOIN es_grams ga ON ga.doc_id = p.id_a
                JOIN es_grams gb ON gb.doc_id = p.id_b AND gb.gram = ga.gram
            ),
            es_runs AS (
                SELECT id_a, id_b, pos_a, pos_b, pos_a - pos_b AS diag,
                       pos_a - row_number() OVER (
                           PARTITION BY id_a, id_b, pos_a - pos_b
                           ORDER BY pos_a
                       ) AS island
                FROM es_m
            )
            SELECT id_a, id_b, min(pos_a) AS pos_a, min(pos_b) AS pos_b,
                   count(*) + {L} - 1 AS span_len
            FROM es_runs GROUP BY id_a, id_b, diag, island"""


def _span_quarantine_oracle_sql(L: int = 20, budget: int = 100) -> str:
    """Replays exact_spans_overweight_pairs: same candidate pairs as
    the exact_spans oracle, distinct L-gram counts per participating
    doc, exact shared-gram volume sum(ca*cb) per pair, budget cut.
    (The operator's two-tier screen changes WHERE the counting runs,
    never the result — sum(ca*cb) <= na*nb bounds the skipped pairs.)"""
    return f"""
            WITH lsh AS (
                {_minhash_oracle()}
            ),
            probe AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
            ),
            pairs AS (
                SELECT id_a, id_b FROM lsh
                UNION
                SELECT id_a, id_b FROM probe
            ),
            sq_ids AS (SELECT id_a AS id FROM pairs UNION SELECT id_b FROM pairs),
            sq_t AS (
                SELECT doc_id, text FROM documents
                WHERE length(text) >= {L} AND doc_id IN (SELECT id FROM sq_ids)
            ),
            sq_series AS (
                SELECT unnest(generate_series(
                    1, (SELECT max(length(text)) FROM documents)
                )) AS i
            ),
            sq_cnt AS MATERIALIZED (
                SELECT doc_id, gram, count(*) AS c FROM (
                    SELECT t.doc_id, substr(t.text, s.i::INT, {L}) AS gram
                    FROM sq_t t
                    JOIN sq_series s ON s.i <= length(t.text) - {L} + 1
                ) GROUP BY 1, 2
            ),
            sq_vol AS (
                SELECT p.id_a, p.id_b,
                       sum(ca.c * cb.c)::BIGINT AS est_matches
                FROM pairs p
                JOIN sq_cnt ca ON ca.doc_id = p.id_a
                JOIN sq_cnt cb ON cb.doc_id = p.id_b AND cb.gram = ca.gram
                GROUP BY 1, 2
            )
            SELECT id_a, id_b, est_matches
            FROM sq_vol WHERE est_matches > {budget}"""


def _lpa_oracle_sql(iters: int = 3) -> str:
    """Unrolled synchronous LPA trajectory over the shared part graph:
    per round, each node adopts the most frequent neighbor label (ties
    to the smallest) — replayed as count + row_number CTE pairs, the
    pagerank/kmeans unrolled-trajectory pattern."""
    ctes = [
        """dir2 AS (
                SELECT a AS src, b AS dst FROM e
                UNION ALL
                SELECT b AS src, a AS dst FROM e
            )""",
        """l0 AS (
                SELECT n, n AS community FROM (
                    SELECT DISTINCT a AS n FROM e
                    UNION
                    SELECT DISTINCT b AS n FROM e
                )
            )""",
    ]
    for i in range(iters):
        ctes.append(f"""c{i} AS (
                SELECT d.src AS n, l.community, count(*) AS c
                FROM dir2 d JOIN l{i} l ON l.n = d.dst
                GROUP BY 1, 2
            )""")
        ctes.append(f"""l{i + 1} AS (
                SELECT n, community FROM (
                    SELECT n, community,
                           row_number() OVER (PARTITION BY n
                               ORDER BY c DESC, community ASC) AS rn
                    FROM c{i}
                ) WHERE rn = 1
            )""")
    return (
        _part_graph_cte()
        + ",\n            "
        + ",\n            ".join(ctes)
        + f"\n            SELECT n, community FROM l{iters}"
    )


def _kcore_oracle_sql(k: int = 16, rounds: int = 3) -> str:
    """Unrolled k-core peel trajectory over the shared part graph:
    per round, degrees on the residual edge set -> keep nodes with
    d >= k -> induce the surviving subgraph; output = residual degrees
    after the last round — the identical fixed-round contract to
    operators/kcore.py ``k_core(edges, k, rounds)``."""
    ctes = ["e0 AS (SELECT a, b FROM e)"]
    for i in range(rounds):
        ctes.append(f"""d{i} AS (
                SELECT n, count(*) AS d FROM (
                    SELECT a AS n FROM e{i} UNION ALL SELECT b AS n FROM e{i}
                ) GROUP BY 1
            )""")
        ctes.append(f"""k{i} AS (SELECT n FROM d{i} WHERE d >= {k})""")
        ctes.append(f"""e{i + 1} AS (
                SELECT a, b FROM e{i}
                WHERE a IN (SELECT n FROM k{i})
                  AND b IN (SELECT n FROM k{i})
            )""")
    return (
        _part_graph_cte()
        + ",\n            "
        + ",\n            ".join(ctes)
        + f"""
            SELECT n, count(*) AS core_deg FROM (
                SELECT a AS n FROM e{rounds}
                UNION ALL SELECT b AS n FROM e{rounds}
            ) GROUP BY 1"""
    )


def _ktruss_oracle_sql(k: int = 6, rounds: int = 2) -> str:
    """Unrolled k-truss peel trajectory over the shared part graph:
    per round, per-edge triangle support via the SAME degree-ordered
    orientation as the census -> drop edges with support < k-2 ->
    repeat; output = the residual edges with support recomputed on the
    final graph — the identical fixed-round contract to
    operators/kcore.py ``k_truss(edges, k, rounds)``."""
    ctes = ["e0 AS MATERIALIZED (SELECT a, b FROM e)"]
    for i in range(rounds + 1):
        ctes.append(f"""deg{i} AS MATERIALIZED (
                SELECT n, count(*) AS d FROM (
                    SELECT a AS n FROM e{i} UNION ALL SELECT b AS n FROM e{i}
                ) GROUP BY 1
            )""")
        ctes.append(f"""dir{i} AS MATERIALIZED (
                SELECT CASE WHEN da < db OR (da = db AND a < b)
                            THEN a ELSE b END AS src,
                       CASE WHEN da < db OR (da = db AND a < b)
                            THEN b ELSE a END AS dst,
                       CASE WHEN da < db OR (da = db AND a < b)
                            THEN db ELSE da END AS dst_d
                FROM (SELECT ee.a, ee.b, x.d AS da, y.d AS db
                      FROM e{i} ee
                      JOIN deg{i} x ON x.n = ee.a
                      JOIN deg{i} y ON y.n = ee.b)
            )""")
        ctes.append(f"""tri{i} AS MATERIALIZED (
                SELECT w1.src AS u, w1.dst AS v, w2.dst AS w
                FROM dir{i} w1 JOIN dir{i} w2 ON w1.src = w2.src
                WHERE (w1.dst_d < w2.dst_d
                       OR (w1.dst_d = w2.dst_d AND w1.dst < w2.dst))
                  AND EXISTS (SELECT 1 FROM dir{i} c
                              WHERE c.src = w1.dst AND c.dst = w2.dst)
            )""")
        ctes.append(f"""sup{i} AS MATERIALIZED (
                SELECT least(x, y) AS a, greatest(x, y) AS b,
                       count(*) AS s
                FROM (SELECT u AS x, v AS y FROM tri{i}
                      UNION ALL SELECT u AS x, w AS y FROM tri{i}
                      UNION ALL SELECT v AS x, w AS y FROM tri{i})
                GROUP BY 1, 2
            )""")
        if i < rounds:
            ctes.append(f"""e{i + 1} AS MATERIALIZED (
                SELECT ee.a, ee.b FROM e{i} ee
                JOIN sup{i} s ON s.a = ee.a AND s.b = ee.b
                WHERE s.s >= {k - 2}
            )""")
    return (
        _part_graph_cte()
        + ",\n            "
        + ",\n            ".join(ctes)
        + f"""
            SELECT ee.a, ee.b, coalesce(s.s, 0) AS support
            FROM e{rounds} ee
            LEFT JOIN sup{rounds} s ON s.a = ee.a AND s.b = ee.b"""
    )


def _walks_oracle_sql(walk_len: int = 3, wpn: int = 2) -> str:
    """Unrolled random-walk trajectory over the shared part graph:
    per step, each walk moves to the neighbor with the largest salted
    hash (ties to the smallest id) — replayed as a row_number round per
    step; the kcore/LPA unrolled-trajectory pattern.  MATERIALIZED
    CTEs stop DuckDB from inlining the multiply-referenced adjacency
    (the k_truss lesson)."""
    js = ", ".join(str(j) for j in range(wpn))
    ctes = [
        """adjw AS MATERIALIZED (
                SELECT a AS src, b AS dst FROM e
                UNION ALL SELECT b AS src, a AS dst FROM e
            )""",
        f"""w0 AS MATERIALIZED (
                SELECT n * {wpn} + j AS walk_id, n AS start, n AS node
                FROM (SELECT DISTINCT src AS n FROM adjw),
                     (SELECT unnest([{js}]) AS j)
            )""",
    ]
    for i in range(1, walk_len + 1):
        ctes.append(f"""w{i} AS MATERIALIZED (
                SELECT walk_id, start, node FROM (
                    SELECT w.walk_id, w.start, adjw.dst AS node,
                           row_number() OVER (PARTITION BY w.walk_id
                               ORDER BY ('0x' || substr(md5('walk' || '|'
                                   || w.walk_id::VARCHAR || '|' || '{i}'
                                   || '|' || adjw.dst::VARCHAR),
                                   1, 15))::BIGINT DESC,
                               adjw.dst ASC) AS rn
                    FROM w{i - 1} w JOIN adjw ON adjw.src = w.node
                ) WHERE rn = 1
            )""")
    steps = "\n            UNION ALL ".join(
        f"SELECT walk_id, start, {i} AS step, node FROM w{i}"
        for i in range(walk_len + 1)
    )
    return (
        _part_graph_cte()
        + ",\n            "
        + ",\n            ".join(ctes)
        + "\n            "
        + steps
    )


def _all_oracle_sql() -> dict[str, str]:
    return {
        "props_value_map": """
            SELECT c_custkey AS _customer_id, c_name,
                   c_acctbal AS balance,
                   CASE c_mktsegment WHEN 'BUILDING' THEN 'Construction'
                                     WHEN 'AUTOMOBILE' THEN 'Cars'
                                     ELSE c_mktsegment END AS segment
            FROM customer
        """,
        "parent_chain": """
            SELECT c.c_custkey AS _customer_id, c.c_name,
                   n.n_name AS nation_name, r.r_name AS region_name
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
        """,
        "flatten_top1": """
            SELECT c.c_custkey AS _customer_id, c.c_name,
                   o.o_orderdate AS latest_orderdate,
                   o.o_totalprice AS latest_totalprice
            FROM customer c
            LEFT JOIN (
                SELECT o_custkey, o_orderdate, o_totalprice,
                       row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate DESC, o_totalprice DESC) AS rn
                FROM orders
            ) o ON o.o_custkey = c.c_custkey AND o.rn = 1
        """,
        "agg_basic": """
            SELECT c.c_custkey AS _customer_id,
                   count(o.o_orderkey) AS order_count,
                   round(sum(o.o_totalprice), 2) AS total_spend,
                   min(o.o_orderdate) AS first_orderdate,
                   max(o.o_orderdate) AS last_orderdate
            FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY 1
        """,
        "agg_set": """
            SELECT c.c_custkey AS _customer_id,
                   array_to_string(coalesce(list_sort(list_distinct(list(o.o_orderstatus)
                       FILTER (WHERE o.o_orderstatus IS NOT NULL))), []), '|') AS statuses
            FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY 1
        """,
        "agg_sorted_list": """
            SELECT c.c_custkey AS _customer_id,
                   array_to_string(list_transform(
                       coalesce(list_sort(list(o.o_orderdate)
                           FILTER (WHERE o.o_orderdate IS NOT NULL)), []),
                       x -> epoch_us(x)), '|') AS order_dates
            FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY 1
        """,
        "two_hop_count": """
            SELECT c.c_custkey AS _customer_id,
                   count(l.l_orderkey) AS lineitem_count,
                   round(coalesce(sum(l.l_quantity), NULL), 2) AS total_qty
            FROM customer c
            LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY 1
        """,
        "dedup_groups": f"""
            WITH RECURSIVE pairs AS (
                {_minhash_oracle()}
            ), sym AS (
                SELECT id_a AS u, id_b AS v FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs
            ), reach(node, r) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT reach.node, sym.v FROM reach JOIN sym ON sym.u = reach.r
            ), comp AS (
                SELECT node AS doc_id, min(r) AS group_id FROM reach GROUP BY 1
            ), gs AS (
                SELECT group_id, count(*) AS group_size FROM comp GROUP BY 1
            )
            SELECT c.doc_id, c.group_id, g.group_size,
                   c.doc_id = c.group_id AS is_representative
            FROM comp c JOIN gs g USING (group_id)
        """,
        "corpus_overlap": f"""
            WITH tok AS (
                SELECT doc_id, {_TOK} AS t FROM documents
            ), grams AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           generate_series(1, greatest(len(t) - 1, 0)),
                           i -> concat(t[i], ' ', t[i+1]))) AS gs
                FROM tok
            ), el AS (
                SELECT CASE WHEN doc_id % 2 = 0 THEN 'even' ELSE 'odd' END
                           AS corpus,
                       ('0x' || substr(md5(unnest(gs)), 1, 15))::BIGINT AS h
                FROM grams
            ), dist AS (
                SELECT DISTINCT corpus, h FROM el
            ), rk AS (
                SELECT corpus, h,
                       row_number() OVER (PARTITION BY corpus ORDER BY h) AS rn
                FROM dist
            ), kmv AS (
                SELECT corpus, list(h ORDER BY h) AS minima
                FROM rk WHERE rn <= 256 GROUP BY 1
            ), a AS (SELECT minima FROM kmv WHERE corpus = 'even'),
            b AS (SELECT minima FROM kmv WHERE corpus = 'odd'),
            u AS (
                SELECT list_sort(list_distinct(
                           flatten([a.minima, b.minima])))[1:256] AS mu,
                       a.minima AS ma, b.minima AS mb
                FROM a, b
            ), est AS (
                SELECT
                    CASE WHEN len(ma) < 256 THEN len(ma)::DOUBLE
                         ELSE (255::DOUBLE * 1152921504606846976::DOUBLE)
                              / ma[256]::DOUBLE END AS n_a_est,
                    CASE WHEN len(mb) < 256 THEN len(mb)::DOUBLE
                         ELSE (255::DOUBLE * 1152921504606846976::DOUBLE)
                              / mb[256]::DOUBLE END AS n_b_est,
                    CASE WHEN len(mu) < 256 THEN len(mu)::DOUBLE
                         ELSE (255::DOUBLE * 1152921504606846976::DOUBLE)
                              / mu[256]::DOUBLE END AS n_union_est,
                    len(list_filter(mu, x -> list_contains(ma, x)
                        AND list_contains(mb, x)))::DOUBLE
                        / len(mu)::DOUBLE AS jaccard_est
                FROM u
            )
            SELECT round(n_a_est, 4) AS n_a_est,
                   round(n_b_est, 4) AS n_b_est,
                   round(n_union_est, 4) AS n_union_est,
                   round(jaccard_est, 4) AS jaccard_est,
                   round(jaccard_est * n_union_est, 4) AS n_intersection_est
            FROM est
        """,
        "overlap_matrix": f"""
            WITH tok AS (
                SELECT doc_id, {_TOK} AS t FROM documents
            ), grams AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           generate_series(1, greatest(len(t) - 1, 0)),
                           i -> concat(t[i], ' ', t[i+1]))) AS gs
                FROM tok
            ), el AS (
                SELECT 'c' || cast(doc_id % 4 AS VARCHAR) AS corpus,
                       ('0x' || substr(md5(unnest(gs)), 1, 15))::BIGINT AS h
                FROM grams
            ), dist AS (
                SELECT DISTINCT corpus, h FROM el
            ), rk AS (
                SELECT corpus, h,
                       row_number() OVER (PARTITION BY corpus ORDER BY h) AS rn
                FROM dist
            ), kmv AS (
                SELECT corpus, list(h ORDER BY h) AS minima
                FROM rk WHERE rn <= 256 GROUP BY 1
            ), pairs AS (
                SELECT a.corpus AS corpus_a, b.corpus AS corpus_b,
                       a.minima AS ma, b.minima AS mb,
                       list_sort(list_distinct(
                           flatten([a.minima, b.minima])))[1:256] AS mu
                FROM kmv a JOIN kmv b ON a.corpus < b.corpus
            ), est AS (
                SELECT corpus_a, corpus_b,
                    CASE WHEN len(ma) < 256 THEN len(ma)::DOUBLE
                         ELSE (255::DOUBLE * 1152921504606846976::DOUBLE)
                              / ma[256]::DOUBLE END AS n_a_est,
                    CASE WHEN len(mb) < 256 THEN len(mb)::DOUBLE
                         ELSE (255::DOUBLE * 1152921504606846976::DOUBLE)
                              / mb[256]::DOUBLE END AS n_b_est,
                    CASE WHEN len(mu) < 256 THEN len(mu)::DOUBLE
                         ELSE (255::DOUBLE * 1152921504606846976::DOUBLE)
                              / mu[256]::DOUBLE END AS n_union_est,
                    len(list_filter(mu, x -> list_contains(ma, x)
                        AND list_contains(mb, x)))::DOUBLE
                        / len(mu)::DOUBLE AS jaccard_est
                FROM pairs
            )
            SELECT corpus_a, corpus_b,
                   round(n_a_est, 4) AS n_a_est,
                   round(n_b_est, 4) AS n_b_est,
                   round(n_union_est, 4) AS n_union_est,
                   round(jaccard_est, 4) AS jaccard_est,
                   round(jaccard_est * n_union_est, 4) AS n_intersection_est
            FROM est
        """,
        "embedding_covariance": """
            WITH x AS (
                SELECT vec_id,
                       generate_subscripts(embedding, 1) - 1 AS i,
                       CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                            * 10000.0 + 0.5) AS BIGINT) AS q
                FROM embeddings
            )
            SELECT a.i::INT AS i, b.i::INT AS j, sum(a.q * b.q)::BIGINT AS s_q
            FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
            GROUP BY 1, 2
            ORDER BY 1, 2
        """,
        "mixture_plan": """
            WITH d AS (
                SELECT CASE WHEN doc_id % 10 < 6 THEN 'web'
                            WHEN doc_id % 10 < 9 THEN 'books'
                            ELSE 'code' END AS source,
                       len(regexp_extract_all(text,
                           '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]')) AS n_tok
                FROM documents
            ), per AS (
                SELECT source, count(*)::BIGINT AS n_docs,
                       sum(n_tok)::BIGINT AS n_tokens
                FROM d GROUP BY 1
            ), s AS (
                SELECT *, pow(n_tokens::DOUBLE, 0.5) AS pw FROM per
            ), t AS (SELECT sum(pw) AS tot FROM s)
            SELECT source, n_docs, n_tokens,
                   round(pw / tot, 6) AS weight,
                   floor(pw / tot * 1000000)::BIGINT AS alloc_tokens
            FROM s, t ORDER BY source
        """,
        "shard_plan": """
            WITH d AS (
                SELECT doc_id,
                       len(regexp_extract_all(text,
                           '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]')) AS n_tok,
                       ('0x' || substr(md5('shard' || cast(doc_id AS VARCHAR)),
                        1, 15))::BIGINT AS ok
                FROM documents
            ), c AS (
                SELECT n_tok,
                       sum(n_tok) OVER (ORDER BY ok, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           - n_tok AS tb
                FROM d
            )
            SELECT (tb // 2000)::BIGINT AS shard, count(*)::BIGINT AS n_docs,
                   sum(n_tok)::BIGINT AS n_tokens
            FROM c GROUP BY 1
        """,
        "neardup_transitivity": _neardup_transitivity_oracle_sql(),
        "exact_spans": _exact_spans_oracle_sql(20),
        "span_quarantine": _span_quarantine_oracle_sql(20, 100),
        "hll_cardinality": _hll_oracle_sql(10),
        "link_prediction": _linkpred_oracle_sql(100),
        "cusum_drift": _cusum_oracle_sql(0.5, 5.0),
        "weighted_jaccard": _weighted_jaccard_oracle_sql(),
        "personalized_pagerank": _ppr_oracle_sql(3),
        "ddsketch_quantiles": _ddsketch_oracle_sql(5),
        "ngram_novelty": f"""
            WITH nv_gr AS (
                SELECT doc_id, list_distinct(list_transform(
                           generate_series(1, greatest(len({_TOK}) - 2, 0)),
                           i -> array_to_string(({_TOK})[i:i+2], ' ')
                       )) AS grams
                FROM documents
            ),
            nv_g AS (
                SELECT doc_id, unnest(grams) AS gram FROM nv_gr
            ),
            nv_first AS (
                SELECT gram, min(doc_id) AS first_id FROM nv_g GROUP BY 1
            ),
            nv_doc AS (
                SELECT g.doc_id, count(*) AS n_grams,
                       sum(CASE WHEN f.first_id = g.doc_id
                                THEN 1 ELSE 0 END) AS n_novel
                FROM nv_g g JOIN nv_first f USING (gram)
                GROUP BY 1
            )
            SELECT d.doc_id,
                   coalesce(n.n_grams, 0)::BIGINT AS n_grams,
                   coalesce(n.n_novel, 0)::BIGINT AS n_novel,
                   CASE WHEN coalesce(n.n_grams, 0) > 0
                        THEN round(n.n_novel * 1.0 / n.n_grams, 6)
                   END AS novelty
            FROM documents d LEFT JOIN nv_doc n USING (doc_id)""",
        "template_mining": r"""
            WITH tm AS (
                SELECT doc_id, text,
                       trim(regexp_replace(regexp_replace(regexp_replace(
                           lower(text), '[a-z]+', 'w', 'g'),
                           '[0-9]+', '0', 'g'),
                           '\s+', ' ', 'g')) AS skeleton
                FROM documents WHERE text IS NOT NULL
            )
            SELECT skeleton,
                   count(*)::BIGINT AS n_docs,
                   count(DISTINCT text)::BIGINT AS n_texts,
                   min(doc_id) AS example_doc_id,
                   sum(length(text))::BIGINT AS total_chars
            FROM tm GROUP BY 1 HAVING count(*) >= 2""",
        "collocations": f"""
            WITH co_tok AS (
                SELECT doc_id,
                       unnest({_TOK}) AS tok,
                       generate_subscripts({_TOK}, 1) AS pos
                FROM documents
            ),
            co_uni AS (
                SELECT tok, count(*) AS c FROM co_tok GROUP BY 1
            ),
            co_n AS (
                SELECT count(*)::BIGINT AS n_tokens FROM co_tok
            ),
            co_big AS (
                SELECT tok AS term_a,
                       lead(tok) OVER (PARTITION BY doc_id
                                       ORDER BY pos) AS term_b
                FROM co_tok
            ),
            co_cab AS (
                SELECT term_a, term_b, count(*) AS c_ab
                FROM co_big WHERE term_b IS NOT NULL
                GROUP BY 1, 2 HAVING count(*) >= 5
            ),
            co_sc AS (
                SELECT b.term_a, b.term_b,
                       b.c_ab::BIGINT AS c_ab,
                       ua.c::BIGINT AS c_a,
                       ub.c::BIGINT AS c_b,
                       round(n.n_tokens * b.c_ab * 1.0
                             / (ua.c * ub.c), 6) AS lift
                FROM co_cab b
                JOIN co_uni ua ON ua.tok = b.term_a
                JOIN co_uni ub ON ub.tok = b.term_b
                CROSS JOIN co_n n
            )
            SELECT rank, term_a, term_b, c_ab, c_a, c_b, lift
            FROM (
                SELECT *, row_number() OVER (
                    ORDER BY lift DESC, term_a, term_b) AS rank
                FROM co_sc
            ) WHERE rank <= 100""",
        "reciprocal_nn": """
            WITH rn_e AS (
                SELECT vec_id, label, embedding::DOUBLE[] AS v
                FROM embeddings
            ),
            rn_a AS (SELECT vec_id AS id_a, v AS va FROM rn_e
                     WHERE label % 2 = 0),
            rn_b AS (SELECT vec_id AS id_b, v AS vb FROM rn_e
                     WHERE label % 2 = 1),
            rn_sc AS (
                SELECT a.id_a, b.id_b,
                       list_dot_product(a.va, b.vb)
                         / (sqrt(list_dot_product(a.va, a.va))
                            * sqrt(list_dot_product(b.vb, b.vb))) AS cos_raw
                FROM rn_a a CROSS JOIN rn_b b
            ),
            rn_na AS (
                SELECT id_a, id_b, cos_raw FROM (
                    SELECT *, row_number() OVER (PARTITION BY id_a
                                ORDER BY cos_raw DESC, id_b) AS r
                    FROM rn_sc
                ) WHERE r = 1
            ),
            rn_nb AS (
                SELECT id_a, id_b FROM (
                    SELECT *, row_number() OVER (PARTITION BY id_b
                                ORDER BY cos_raw DESC, id_a) AS r
                    FROM rn_sc
                ) WHERE r = 1
            )
            SELECT a.id_a, a.id_b, round(a.cos_raw, 6) AS cosine
            FROM rn_na a JOIN rn_nb b USING (id_a, id_b)""",
        "gopher_rules": r"""
            WITH gp AS (
                SELECT doc_id,
                       coalesce(text, '')
                       || CASE WHEN doc_id % 4 = 0
                               THEN chr(10) || coalesce(text, '')
                               ELSE '' END
                       || CASE WHEN doc_id % 3 = 0
                               THEN chr(10) || '- item number '
                                    || doc_id::VARCHAR
                               ELSE '' END
                       || CASE WHEN doc_id % 5 = 0
                               THEN chr(10) || 'to be continued ...'
                               ELSE '' END
                       || CASE WHEN doc_id % 7 = 0
                               THEN chr(10) || '# tag ' || doc_id::VARCHAR
                                    || ' #'
                               ELSE '' END AS t
                FROM documents
            ),
            gw AS (
                SELECT doc_id, t,
                       list_filter(regexp_split_to_array(t, '\s+'),
                                   x -> x <> '') AS words,
                       list_filter(list_transform(string_split(t, chr(10)),
                                   x -> trim(x)), x -> x <> '') AS lines
                FROM gp
            ),
            gs AS (
                SELECT doc_id,
                       len(words) AS n_words,
                       greatest(len(words), 1) AS nw1,
                       coalesce(list_sum(list_transform(words,
                           x -> length(x))), 0) AS sum_len,
                       len(list_filter(words,
                           x -> regexp_matches(x, '[A-Za-z]'))) AS alpha_words,
                       length(t) - length(replace(t, '#', '')) AS hash_chars,
                       (length(t) - length(replace(t, '...', ''))) / 3
                           AS ellipses,
                       greatest(len(lines), 1) AS nl1,
                       len(list_filter(lines,
                           x -> substr(x, 1, 1) IN ('-', '*'))) AS bullets,
                       len(list_filter(lines,
                           x -> ends_with(x, '...'))) AS ell_lines,
                       coalesce(list_sum(list_transform(lines,
                           x -> length(x))), 0) AS line_chars,
                       coalesce(list_sum(list_transform(
                           list_filter(lines, x -> len(list_filter(lines,
                               y -> y = x)) > 1),
                           x -> length(x))), 0) AS dup_chars,
                       len(list_intersect(list_transform(words,
                           x -> lower(x)),
                           ['the','be','to','of','and','that','have','with']))
                           AS stop_hits
                FROM gw
            ),
            gr AS (
                SELECT doc_id, n_words, stop_hits,
                       sum_len / nw1 AS mean_word_len,
                       alpha_words / nw1 AS alpha_ratio,
                       (hash_chars + ellipses) / nw1 AS symbol_ratio,
                       bullets / nl1 AS bullet_ratio,
                       ell_lines / nl1 AS ellipsis_ratio,
                       dup_chars / greatest(line_chars, 1) AS dup_ratio
                FROM gs
            )
            SELECT doc_id,
                   n_words::BIGINT AS n_words,
                   round(mean_word_len, 6) AS mean_word_len,
                   round(alpha_ratio, 6) AS alpha_word_ratio,
                   round(symbol_ratio, 6) AS symbol_word_ratio,
                   round(bullet_ratio, 6) AS bullet_line_ratio,
                   round(ellipsis_ratio, 6) AS ellipsis_line_ratio,
                   round(dup_ratio, 6) AS dup_line_char_ratio,
                   stop_hits::BIGINT AS stop_hits,
                   (n_words BETWEEN 50 AND 100000
                    AND mean_word_len BETWEEN 3 AND 10
                    AND symbol_ratio <= 0.1
                    AND bullet_ratio <= 0.9
                    AND ellipsis_ratio <= 0.3
                    AND alpha_ratio >= 0.8
                    AND stop_hits >= 2
                    AND dup_ratio <= 0.2) AS gopher_pass
            FROM gr""",
        "c4_filter": r"""
            WITH c4p AS (
                SELECT doc_id,
                       'The opening sentence of document '
                       || doc_id::VARCHAR || ' has plenty of words.'
                       || chr(10) || coalesce(text, '')
                       || CASE WHEN doc_id % 2 = 0
                               THEN chr(10) || 'This line mentions javascript'
                                    || ' frameworks and gets dropped.'
                               ELSE chr(10) || 'Another proper sentence'
                                    || ' appears right here today!' END
                       || CASE WHEN doc_id % 3 = 0
                               THEN chr(10) || 'Too short.' ELSE '' END
                       || CASE WHEN doc_id % 5 = 0
                               THEN chr(10) || 'Document ' || doc_id::VARCHAR
                                    || ' closes with a quoted ending of'
                                    || ' sorts."'
                               ELSE '' END
                       || CASE WHEN doc_id % 11 = 0
                               THEN chr(10) || 'Sprinkle some lorem ipsum'
                                    || ' into the page body here.'
                               ELSE '' END
                       || CASE WHEN doc_id % 13 = 0
                               THEN chr(10) || 'config = { nested: true }'
                               ELSE '' END AS t
                FROM documents
            ),
            c4l AS (
                SELECT doc_id, t,
                       list_filter(list_transform(string_split(t, chr(10)),
                                   x -> trim(x)), x -> x <> '') AS lines
                FROM c4p
            ),
            c4k AS (
                SELECT doc_id, t, lines,
                       list_filter(lines, x ->
                           substr(x, length(x), 1) IN ('.', '!', '?', '"')
                           AND len(list_filter(
                                   regexp_split_to_array(x, '\s+'),
                                   w -> w <> '')) >= 5
                           AND NOT contains(lower(x), 'javascript')) AS kept
                FROM c4l
            )
            SELECT doc_id,
                   len(lines)::BIGINT AS n_lines,
                   len(kept)::BIGINT AS n_kept,
                   array_to_string(kept, chr(10)) AS text_clean,
                   (len(kept) >= 3
                    AND NOT contains(lower(t), 'lorem ipsum')
                    AND NOT contains(t, '{')) AS page_pass
            FROM c4k""",
        "sorted_neighborhood": """
            WITH snr AS (
                SELECT p_partkey, p_name,
                       row_number() OVER (ORDER BY p_name, p_partkey) - 1
                           AS rnk
                FROM part
            )
            SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
                   a.rnk AS rank_a, b.rnk AS rank_b,
                   levenshtein(a.p_name, b.p_name)::BIGINT AS lev_dist
            FROM snr a JOIN snr b
              ON b.rnk > a.rnk AND b.rnk <= a.rnk + 3""",
        "graph_degree_stats": _part_graph_cte()
        + """,
            gd_deg AS (
                SELECT n, count(*) AS degree FROM (
                    SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e
                ) GROUP BY 1
            ),
            gd_dir AS (
                SELECT a AS u, b AS v FROM e
                UNION ALL SELECT b AS u, a AS v FROM e
            ),
            gd_pair AS (
                SELECT gd_dir.u, du.degree AS deg_u, dv.degree AS deg_v
                FROM gd_dir
                JOIN gd_deg du ON du.n = gd_dir.u
                JOIN gd_deg dv ON dv.n = gd_dir.v
            )
            SELECT (SELECT count(*) FROM gd_deg)::BIGINT AS n_nodes,
                   (SELECT (sum(degree) / 2)::BIGINT FROM gd_deg) AS n_edges,
                   (SELECT round(sum(degree) / count(*), 6) FROM gd_deg)
                       AS avg_degree,
                   (SELECT max(degree) FROM gd_deg)::BIGINT AS max_degree,
                   (SELECT round(sum(degree * degree) / count(*)
                           - (sum(degree) / count(*))
                             * (sum(degree) / count(*)), 6) FROM gd_deg)
                       AS degree_variance,
                   (SELECT round(covar_pop(deg_u, deg_v)
                           / nullif(stddev_pop(deg_u)
                                    * stddev_pop(deg_v), 0), 6)
                    FROM gd_pair) AS degree_assortativity""",
        "zipf_fit": f"""
            WITH zc AS (
                SELECT tok AS term, count(*) AS tf FROM (
                    SELECT unnest({_TOK}) AS tok FROM documents
                ) GROUP BY 1
            ),
            zt AS (
                SELECT tf,
                       row_number() OVER (ORDER BY tf DESC, term) AS rnk
                FROM zc ORDER BY tf DESC, term LIMIT 1000
            ),
            zx AS (
                SELECT ln(rnk::DOUBLE) AS x, ln(tf::DOUBLE) AS y FROM zt
            ),
            zf AS (
                SELECT count(*)::BIGINT AS n_fit,
                       covar_pop(x, y) / nullif(var_pop(x), 0) AS slope,
                       avg(x) AS mx, avg(y) AS my,
                       covar_pop(x, y) / nullif(stddev_pop(x)
                                                * stddev_pop(y), 0) AS r
                FROM zx
            )
            SELECT (SELECT count(*) FROM zc)::BIGINT AS n_terms,
                   n_fit,
                   round(slope, 6) AS zipf_slope,
                   round(my - slope * mx, 6) AS zipf_intercept,
                   round(r * r, 6) AS zipf_r2
            FROM zf""",
        "khop_reach": _part_graph_cte()
        + """,
            kr_dir AS (
                SELECT a AS u, b AS v FROM e
                UNION ALL SELECT b AS u, a AS v FROM e
            ),
            kr2 AS (
                SELECT u, v FROM kr_dir
                UNION
                SELECT x.u, y.v FROM kr_dir x JOIN kr_dir y ON x.v = y.u
                WHERE y.v <> x.u
            ),
            kr_deg AS (
                SELECT u, count(*) AS degree FROM kr_dir GROUP BY 1
            )
            SELECT r.u AS node, d.degree::BIGINT AS degree,
                   count(*)::BIGINT AS reach
            FROM kr2 r JOIN kr_deg d USING (u)
            GROUP BY r.u, d.degree""",
        "hyperball": _hyperball_oracle_sql(rounds=2, p=7),
        "effective_diameter": _nf_oracle_sql(max_rounds=3, p=7),
        "k_anonymity": """
            SELECT c_nationkey, c_mktsegment,
                   floor(c_acctbal / 1000)::BIGINT AS bal_band,
                   count(*)::BIGINT AS n_records,
                   count(DISTINCT c_acctbal)::BIGINT AS n_sensitive,
                   count(*) >= 5 AS meets_k,
                   count(DISTINCT c_acctbal) >= 3 AS meets_l
            FROM customer
            GROUP BY 1, 2, 3""",
        "seasonal_decompose": """
            WITH sd_d AS (
                SELECT event_type AS key, ts::DATE AS day,
                       round(sum(value), 6) AS observed
                FROM events GROUP BY 1, 2
            ),
            sd_t AS (
                SELECT key, day, observed,
                       ((day - DATE '1970-01-01') % 7)::INTEGER AS phase,
                       CASE WHEN count(*) OVER w = 7
                            THEN avg(observed) OVER w END AS tr
                FROM sd_d
                WINDOW w AS (PARTITION BY key ORDER BY day
                             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
            ),
            sd_s AS (
                SELECT key, phase, avg(observed - tr) AS s_raw
                FROM sd_t WHERE tr IS NOT NULL GROUP BY 1, 2
            ),
            sd_c AS (
                SELECT key, phase,
                       s_raw - avg(s_raw) OVER (PARTITION BY key) AS seas
                FROM sd_s
            )
            SELECT t.key, t.day, t.phase, t.observed,
                   round(t.tr, 6) AS trend,
                   CASE WHEN t.tr IS NOT NULL
                        THEN round(c.seas, 6) END AS seasonal,
                   CASE WHEN t.tr IS NOT NULL
                        THEN round(t.observed - t.tr - c.seas, 6)
                   END AS residual
            FROM sd_t t LEFT JOIN sd_c c USING (key, phase)""",
        "attribution": """
            WITH at_e AS (
                SELECT event_id, user_id, ts, event_type, value,
                       CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w IS NULL
                              OR epoch(ts) - lag(epoch(ts)) OVER w > 1800
                            THEN 1 ELSE 0 END AS is_new
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            at_s AS (
                SELECT *,
                       sum(is_new) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
                FROM at_e
            ),
            at_c AS (
                SELECT user_id, session_id,
                       count(*)::BIGINT AS n_conversions,
                       round(sum(value), 6) AS revenue
                FROM at_s WHERE event_type = 'purchase' GROUP BY 1, 2
            ),
            at_t AS (
                SELECT user_id, session_id, event_type,
                       row_number() OVER (PARTITION BY user_id, session_id
                           ORDER BY ts, event_id) AS rf,
                       row_number() OVER (PARTITION BY user_id, session_id
                           ORDER BY ts DESC, event_id DESC) AS rl,
                       count(*) OVER (PARTITION BY user_id, session_id)
                           AS n_touches
                FROM at_s WHERE event_type IN ('click', 'view')
            )
            SELECT c.user_id, c.session_id::BIGINT AS session_id,
                   c.n_conversions, c.revenue,
                   coalesce(f.n_touches, 0)::BIGINT AS n_touches,
                   f.event_type AS first_touch_type,
                   l.event_type AS last_touch_type
            FROM at_c c
            LEFT JOIN (SELECT user_id, session_id, event_type, n_touches
                       FROM at_t WHERE rf = 1) f USING (user_id, session_id)
            LEFT JOIN (SELECT user_id, session_id, event_type
                       FROM at_t WHERE rl = 1) l USING (user_id, session_id)""",
        "event_transitions": """
            WITH et_p AS (
                SELECT lag(event_type) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS from_type,
                       event_type AS to_type
                FROM events
            ),
            et_c AS (
                SELECT from_type, to_type, count(*)::BIGINT AS n
                FROM et_p WHERE from_type IS NOT NULL GROUP BY 1, 2
            )
            SELECT from_type, to_type, n,
                   round(n / sum(n) OVER (PARTITION BY from_type), 6) AS p
            FROM et_c""",
        "rfm_scores": """
            WITH rf_u AS (
                SELECT user_id, max(ts) AS last_ts,
                       count(*)::BIGINT AS frequency,
                       round(sum(value), 6) AS monetary
                FROM events WHERE event_type = 'purchase' GROUP BY 1
            ),
            rf_s AS (
                SELECT user_id, last_ts, frequency, monetary,
                       ntile(4) OVER (ORDER BY last_ts, user_id) AS r_score,
                       ntile(4) OVER (ORDER BY frequency, user_id) AS f_score,
                       ntile(4) OVER (ORDER BY monetary, user_id) AS m_score
                FROM rf_u
            )
            SELECT user_id, last_ts, frequency, monetary,
                   r_score, f_score, m_score,
                   r_score::VARCHAR || f_score::VARCHAR || m_score::VARCHAR
                       AS segment
            FROM rf_s""",
        "ab_test": """
            WITH ab AS (
                SELECT CASE WHEN user_id % 2 = 0 THEN 'control'
                            ELSE 'treatment' END AS arm,
                       value AS x
                FROM events WHERE event_type = 'purchase'
            ),
            ab_g AS (
                SELECT sum(CASE WHEN arm = 'control' THEN 1 ELSE 0 END)
                           ::BIGINT AS n_a,
                       sum(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END)
                           ::BIGINT AS n_b,
                       sum(CASE WHEN arm = 'control' THEN x ELSE 0.0 END)
                           AS s_a,
                       sum(CASE WHEN arm = 'treatment' THEN x ELSE 0.0 END)
                           AS s_b,
                       sum(CASE WHEN arm = 'control' THEN x * x
                                ELSE 0.0 END) AS q_a,
                       sum(CASE WHEN arm = 'treatment' THEN x * x
                                ELSE 0.0 END) AS q_b
                FROM ab
            ),
            ab_m AS (
                SELECT n_a, n_b,
                       s_a / nullif(n_a, 0) AS mean_a,
                       s_b / nullif(n_b, 0) AS mean_b,
                       greatest(q_a / nullif(n_a, 0)
                                - (s_a / nullif(n_a, 0))
                                  * (s_a / nullif(n_a, 0)), 0.0) AS var_a,
                       greatest(q_b / nullif(n_b, 0)
                                - (s_b / nullif(n_b, 0))
                                  * (s_b / nullif(n_b, 0)), 0.0) AS var_b
                FROM ab_g
            )
            SELECT n_a, n_b,
                   round(mean_a, 6) AS mean_a,
                   round(mean_b, 6) AS mean_b,
                   round(var_a, 6) AS var_a,
                   round(var_b, 6) AS var_b,
                   round((mean_a - mean_b)
                         / nullif(sqrt(var_a / n_a + var_b / n_b), 0), 6)
                       AS z_stat
            FROM ab_m""",
        "lang_confusion": f"""
            WITH lc_t AS (
                SELECT doc_id, lang, {_TOK} AS toks FROM documents
            ),
            lc_s AS (
                SELECT doc_id, lang,
                       len(list_intersect(toks, ['the','and','of','to','in',
                           'is','that','for','with','as'])) AS sc_en,
                       len(list_intersect(toks, ['el','la','de','que','y','en',
                           'los','del','las','por'])) AS sc_es,
                       len(list_intersect(toks, ['le','la','de','et','les',
                           'des','en','un','du','une'])) AS sc_fr,
                       len(list_intersect(toks, ['der','die','und','das','von',
                           'den','mit','für','auf','ist'])) AS sc_de
                FROM lc_t
            ),
            lc_p AS (
                SELECT lang,
                       CASE WHEN greatest(sc_en, sc_es, sc_fr, sc_de) = 0
                                THEN 'und'
                            WHEN sc_de = greatest(sc_en, sc_es, sc_fr, sc_de)
                                THEN 'de'
                            WHEN sc_en = greatest(sc_en, sc_es, sc_fr, sc_de)
                                THEN 'en'
                            WHEN sc_es = greatest(sc_en, sc_es, sc_fr, sc_de)
                                THEN 'es'
                            ELSE 'fr' END AS lang_pred
                FROM lc_s
            )
            SELECT lang, lang_pred, count(*)::BIGINT AS n_docs
            FROM lc_p GROUP BY 1, 2""",
        "benford_law": _benford_oracle_sql(),
        "revenue_gini": """
            WITH gn_u AS (
                SELECT o_custkey, coalesce(sum(o_totalprice), 0) AS x
                FROM orders GROUP BY 1
            ),
            gn_r AS (
                SELECT x,
                       row_number() OVER (ORDER BY x, o_custkey) AS i
                FROM gn_u
            )
            SELECT count(*)::BIGINT AS n,
                   round(sum(x), 2) AS total,
                   round(2.0 * sum(i * x) / (count(*) * sum(x))
                         - (count(*) + 1) / count(*), 6) AS gini
            FROM gn_r""",
        "chi_square": """
            WITH cs_c AS (
                SELECT c_mktsegment, c_nationkey, count(*) AS o
                FROM customer GROUP BY 1, 2
            ),
            cs_m AS (
                SELECT c_mktsegment, c_nationkey, o,
                       sum(o) OVER (PARTITION BY c_mktsegment) AS ra,
                       sum(o) OVER (PARTITION BY c_nationkey) AS cb,
                       sum(o) OVER () AS nn
                FROM cs_c
            ),
            cs_a AS (
                SELECT max(nn) AS n,
                       count(DISTINCT c_mktsegment)
                       + max(CASE WHEN c_mktsegment IS NULL
                             THEN 1 ELSE 0 END) AS n_a,
                       count(DISTINCT c_nationkey)
                       + max(CASE WHEN c_nationkey IS NULL
                             THEN 1 ELSE 0 END) AS n_b,
                       sum((o - ra * cb / nn) * (o - ra * cb / nn)
                           / (ra * cb / nn)) AS chi_obs,
                       sum(ra * cb / nn) AS e_obs
                FROM cs_m
            )
            SELECT n::BIGINT AS n, n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
                   ((n_a - 1) * (n_b - 1))::BIGINT AS dof,
                   round(chi_obs + (n - e_obs), 6) AS chi2
            FROM cs_a""",
        "ks_test": """
            WITH ks_p AS (
                SELECT o_totalprice AS v,
                       CASE WHEN o_orderpriority = '1-URGENT'
                            THEN 1 ELSE 0 END AS a,
                       CASE WHEN o_orderpriority = '5-LOW'
                            THEN 1 ELSE 0 END AS b
                FROM orders
                WHERE o_totalprice IS NOT NULL
                  AND NOT isnan(CAST(o_totalprice AS DOUBLE))
                  AND o_orderpriority IN ('1-URGENT', '5-LOW')
            ),
            ks_v AS (
                SELECT v, sum(a) AS ca, sum(b) AS cb FROM ks_p GROUP BY v
            ),
            ks_c AS (
                SELECT sum(ca) OVER (ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cuma,
                       sum(cb) OVER (ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cumb,
                       sum(ca) OVER () AS na,
                       sum(cb) OVER () AS nb
                FROM ks_v
            )
            SELECT max(na)::BIGINT AS n_a, max(nb)::BIGINT AS n_b,
                   round(max(abs(cuma / na - cumb / nb)), 6) AS ks_d,
                   round(max(1.358 * sqrt(CAST(na + nb AS DOUBLE)
                                          / CAST(na * nb AS DOUBLE))),
                         6) AS critical_95,
                   max(abs(cuma / na - cumb / nb))
                   > max(1.358 * sqrt(CAST(na + nb AS DOUBLE)
                                      / CAST(na * nb AS DOUBLE)))
                       AS reject_95
            FROM ks_c""",
        "mutual_info": """
            WITH mi_c AS (
                SELECT c_mktsegment AS a, c_nationkey AS b,
                       count(*) AS o
                FROM customer GROUP BY a, b
            ),
            mi_m AS (
                SELECT o,
                       sum(o) OVER (PARTITION BY a) AS ra,
                       sum(o) OVER (PARTITION BY b) AS cb,
                       sum(o) OVER () AS nn
                FROM mi_c
            )
            SELECT CAST(coalesce(max(nn), 0) AS BIGINT) AS n,
                   round(-sum((CAST(o AS DOUBLE) / CAST(nn AS DOUBLE))
                              * ln(CAST(ra AS DOUBLE)
                                   / CAST(nn AS DOUBLE))), 6) AS h_a,
                   round(-sum((CAST(o AS DOUBLE) / CAST(nn AS DOUBLE))
                              * ln(CAST(cb AS DOUBLE)
                                   / CAST(nn AS DOUBLE))), 6) AS h_b,
                   round(sum((CAST(o AS DOUBLE) / CAST(nn AS DOUBLE))
                             * ln((CAST(o AS DOUBLE) * CAST(nn AS DOUBLE))
                                  / (CAST(ra AS DOUBLE)
                                     * CAST(cb AS DOUBLE)))), 6) AS mi,
                   round(sum((CAST(o AS DOUBLE) / CAST(nn AS DOUBLE))
                             * ln((CAST(o AS DOUBLE) * CAST(nn AS DOUBLE))
                                  / (CAST(ra AS DOUBLE)
                                     * CAST(cb AS DOUBLE))))
                         / sqrt((-sum((CAST(o AS DOUBLE)
                                       / CAST(nn AS DOUBLE))
                                      * ln(CAST(ra AS DOUBLE)
                                           / CAST(nn AS DOUBLE))))
                                * (-sum((CAST(o AS DOUBLE)
                                         / CAST(nn AS DOUBLE))
                                        * ln(CAST(cb AS DOUBLE)
                                             / CAST(nn AS DOUBLE))))),
                         6) AS nmi
            FROM mi_m""",
        "anova": """
            WITH av_p AS (
                SELECT CAST(l_quantity AS DOUBLE) AS v, l_returnflag AS g
                FROM lineitem
                WHERE l_quantity IS NOT NULL
                  AND NOT isnan(CAST(l_quantity AS DOUBLE))
            ),
            av_g AS (
                SELECT g, count(*) AS nj, sum(v) AS sj, sum(v * v) AS qj
                FROM av_p GROUP BY g
            ),
            av_s AS (
                SELECT CAST(sum(nj) AS BIGINT) AS n,
                       CAST(count(*) AS INTEGER) AS k,
                       sum(sj) AS s,
                       sum((sj * sj) / CAST(nj AS DOUBLE)) AS b,
                       sum(qj - (sj * sj) / CAST(nj AS DOUBLE)) AS w
                FROM av_g
            )
            SELECT n, k,
                   round(b - (s * s) / CAST(n AS DOUBLE), 2) AS ss_between,
                   round(w, 2) AS ss_within,
                   round(((b - (s * s) / CAST(n AS DOUBLE)) / (k - 1.0))
                         / (w / (n - CAST(k AS DOUBLE))), 6) AS f
            FROM av_s""",
        "spearman": """
            WITH sp_p AS (
                SELECT CAST(l_quantity AS DOUBLE) AS x,
                       CAST(l_extendedprice AS DOUBLE) AS y
                FROM lineitem
                WHERE l_quantity IS NOT NULL
                  AND NOT isnan(CAST(l_quantity AS DOUBLE))
                  AND l_extendedprice IS NOT NULL
                  AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
            ),
            sp_n AS (SELECT count(*) AS c FROM sp_p),
            sp_rx AS (
                SELECT x AS v, avg(rn) AS mx
                FROM (SELECT x, row_number() OVER (ORDER BY x) AS rn
                      FROM sp_p)
                GROUP BY x
            ),
            sp_ry AS (
                SELECT y AS v, avg(rn) AS my
                FROM (SELECT y, row_number() OVER (ORDER BY y) AS rn
                      FROM sp_p)
                GROUP BY y
            ),
            sp_j AS (
                SELECT mx - ((SELECT c FROM sp_n) + 1) / 2.0 AS dx,
                       my - ((SELECT c FROM sp_n) + 1) / 2.0 AS dy
                FROM sp_p
                JOIN sp_rx ON sp_p.x = sp_rx.v
                JOIN sp_ry ON sp_p.y = sp_ry.v
            )
            SELECT CAST(count(*) AS BIGINT) AS n,
                   round(sum(dx * dy)
                         / sqrt(sum(dx * dx) * sum(dy * dy)), 6) AS rho,
                   round(sum(dx * dy)
                         / sqrt(sum(dx * dx) * sum(dy * dy))
                         * sqrt((SELECT c FROM sp_n) - 1.0), 6) AS z,
                   coalesce(abs(sum(dx * dy)
                                / sqrt(sum(dx * dx) * sum(dy * dy))
                                * sqrt((SELECT c FROM sp_n) - 1.0))
                            > 1.96, false) AS reject_95
            FROM sp_j""",
        "kruskal": """
            WITH kw_p AS (
                SELECT CAST(value AS DOUBLE) AS v, event_type AS g
                FROM events
                WHERE value IS NOT NULL
                  AND NOT isnan(CAST(value AS DOUBLE))
            ),
            kw_n AS (SELECT count(*) AS c FROM kw_p),
            kw_m AS (
                SELECT v, count(*) AS cv, avg(rn) AS mid
                FROM (SELECT v, row_number() OVER (ORDER BY v) AS rn
                      FROM kw_p)
                GROUP BY v
            ),
            kw_vg AS (SELECT v, g, count(*) AS cg FROM kw_p GROUP BY v, g),
            kw_g AS (
                SELECT g, sum(cg) AS nj, sum(cg * mid) AS rj
                FROM kw_vg JOIN kw_m USING (v)
                GROUP BY g
            ),
            kw_t AS (SELECT sum(cv * cv * cv - cv) AS tie FROM kw_m),
            kw_h AS (
                SELECT CAST(sum(nj) AS BIGINT) AS n,
                       CAST(count(*) AS INTEGER) AS k,
                       (12.0 / (CAST((SELECT c FROM kw_n) AS DOUBLE)
                                * ((SELECT c FROM kw_n) + 1)))
                       * sum((rj * rj) / CAST(nj AS DOUBLE))
                       - 3.0 * ((SELECT c FROM kw_n) + 1) AS h_raw
                FROM kw_g
            )
            SELECT n, k, round(h_raw, 6) AS h,
                   round(h_raw
                         / (1.0 - CAST((SELECT tie FROM kw_t) AS DOUBLE)
                            / (CAST((SELECT c FROM kw_n) AS DOUBLE)
                               * (SELECT c FROM kw_n)
                               * (SELECT c FROM kw_n)
                               - (SELECT c FROM kw_n))), 6)
                       AS h_tie_corrected
            FROM kw_h""",
        "tiff_decode": """
            WITH td AS (
                SELECT doc_id,
                       doc_id % 9 + 2 AS w,
                       doc_id % 6 + 2 AS h
                FROM documents
            )
            SELECT doc_id,
                   cast(w AS INTEGER) AS width,
                   cast(h AS INTEGER) AS height,
                   round(list_sum(list_transform(range(0, w*h), p ->
                       (doc_id*17 + p*23) % 256))
                       / cast(w*h AS DOUBLE), 6) AS mean_r,
                   round(list_sum(list_transform(range(0, w*h), p ->
                       (doc_id*17 + p*23 + 29) % 256))
                       / cast(w*h AS DOUBLE), 6) AS mean_g,
                   round(list_sum(list_transform(range(0, w*h), p ->
                       (doc_id*17 + p*23 + 58) % 256))
                       / cast(w*h AS DOUBLE), 6) AS mean_b
            FROM td""",
        "mann_whitney": """
            WITH mw_p AS (
                SELECT l_extendedprice AS v,
                       CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS a,
                       CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS b
                FROM lineitem
                WHERE l_extendedprice IS NOT NULL
                  AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
                  AND l_returnflag IN ('R', 'A')
            ),
            mw_v AS (
                SELECT v, sum(a) AS ca, sum(b) AS cb FROM mw_p GROUP BY v
            ),
            mw_c AS (
                SELECT ca, ca + cb AS c,
                       sum(ca + cb) OVER (ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW)
                         - (ca + cb) + (ca + cb + 1) / 2.0 AS mid
                FROM mw_v
            ),
            mw_s AS (
                SELECT CAST(sum(ca) AS BIGINT) AS na,
                       CAST(sum(c - ca) AS BIGINT) AS nb,
                       sum(ca * mid) AS ra,
                       CAST(sum(c * c * c - c) AS BIGINT) AS tie
                FROM mw_c
            )
            SELECT na AS n_a, nb AS n_b,
                   round(ra - (na * (na + 1)) / 2.0, 1) AS u_a,
                   round(CAST(na * nb AS DOUBLE)
                         - (ra - (na * (na + 1)) / 2.0), 1) AS u_b,
                   round((ra - (na * (na + 1)) / 2.0
                          - CAST(na * nb AS DOUBLE) / 2.0)
                         / sqrt(CAST(na * nb AS DOUBLE) / 12.0
                                * (CAST(na + nb + 1 AS DOUBLE)
                                   - CAST(tie AS DOUBLE)
                                     / CAST((na + nb) * (na + nb - 1)
                                            AS DOUBLE))), 6) AS z,
                   coalesce(abs((ra - (na * (na + 1)) / 2.0
                                 - CAST(na * nb AS DOUBLE) / 2.0)
                                / sqrt(CAST(na * nb AS DOUBLE) / 12.0
                                       * (CAST(na + nb + 1 AS DOUBLE)
                                          - CAST(tie AS DOUBLE)
                                            / CAST((na + nb)
                                                   * (na + nb - 1)
                                                   AS DOUBLE))))
                            > 1.96, false) AS reject_95
            FROM mw_s""",
        "gif_decode": """
            WITH gd AS (
                SELECT doc_id,
                       doc_id % 9 + 2 AS w,
                       doc_id % 6 + 2 AS h,
                       (doc_id % 20 + 1) * 10 AS delay0
                FROM documents
            ),
            fr AS (
                SELECT doc_id, w, h, delay0, unnest([0, 1]) AS fi
                FROM gd
            )
            SELECT doc_id,
                   cast(fi AS INTEGER) AS frame_idx,
                   cast(CASE WHEN fi = 0 THEN 0 ELSE delay0 END
                        AS BIGINT) AS ts_ms,
                   cast(w AS INTEGER) AS width,
                   cast(h AS INTEGER) AS height,
                   round(list_sum(list_transform(range(0, w*h), p ->
                       (doc_id*11
                        + ((doc_id*13 + fi*4 + p*29) % 8) * 37) % 256))
                       / cast(w*h AS DOUBLE), 6) AS mean_r,
                   round(list_sum(list_transform(range(0, w*h), p ->
                       (doc_id*11
                        + ((doc_id*13 + fi*4 + p*29) % 8) * 37
                        + 71) % 256))
                       / cast(w*h AS DOUBLE), 6) AS mean_g,
                   round(list_sum(list_transform(range(0, w*h), p ->
                       (doc_id*11
                        + ((doc_id*13 + fi*4 + p*29) % 8) * 37
                        + 142) % 256))
                       / cast(w*h AS DOUBLE), 6) AS mean_b
            FROM fr""",
        "mad_outliers": """
            WITH mo_v AS (
                SELECT o_orderpriority AS g,
                       CAST(o_totalprice AS DOUBLE) AS x
                FROM orders
                WHERE o_totalprice IS NOT NULL
                  AND NOT isnan(CAST(o_totalprice AS DOUBLE))
            ),
            mo_m AS (
                SELECT g, quantile_cont(x, 0.5) AS med
                FROM mo_v GROUP BY g
            ),
            mo_d AS (
                SELECT mo_v.g AS g, x, med, abs(x - med) AS adev
                FROM mo_v JOIN mo_m ON mo_v.g = mo_m.g
            ),
            mo_s AS (
                SELECT g, quantile_cont(adev, 0.5) AS mad
                FROM mo_d GROUP BY g
            )
            SELECT mo_d.g AS o_orderpriority,
                   count(*)::BIGINT AS n,
                   round(max(med), 6) AS med,
                   round(max(mo_s.mad), 6) AS mad,
                   sum(CASE WHEN adev > 2.0 * mo_s.mad
                            THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
                   round(avg(CASE WHEN adev > 2.0 * mo_s.mad
                                  THEN 1.0 ELSE 0.0 END), 6)
                       AS outlier_share
            FROM mo_d JOIN mo_s ON mo_d.g = mo_s.g
            GROUP BY mo_d.g
            ORDER BY o_orderpriority""",
        "readability": r"""
            WITH rd_p AS (
                SELECT doc_id,
                       substr(coalesce(text, ''), 1, 80) || '. '
                       || CASE WHEN doc_id % 3 >= 1
                               THEN substr(coalesce(text, ''), 81, 80)
                                    || '! '
                               ELSE '' END
                       || CASE WHEN doc_id % 3 = 2
                               THEN substr(coalesce(text, ''), 161, 80)
                                    || '? '
                               ELSE '' END AS t
                FROM documents
            ),
            rd_w AS (
                SELECT doc_id,
                       list_filter(list_transform(
                           regexp_split_to_array(t, '[.!?]+'),
                           x -> trim(x)), x -> x <> '') AS sentences,
                       list_filter(regexp_split_to_array(t, '\s+'),
                                   x -> x <> '') AS words
                FROM rd_p
            ),
            rd_s AS (
                SELECT doc_id,
                       len(sentences) AS n_sentences,
                       len(words) AS n_words,
                       coalesce(list_sum(list_transform(words,
                           x -> greatest(len(list_filter(
                               regexp_split_to_array(lower(x), '[^aeiouy]+'),
                               g -> g <> '')), 1))), 0) AS n_syll,
                       greatest(len(sentences), 1) AS ns1,
                       greatest(len(words), 1) AS nw1
                FROM rd_w
            )
            SELECT doc_id,
                   n_sentences::BIGINT AS n_sentences,
                   n_words::BIGINT AS n_words,
                   n_syll::BIGINT AS n_syllables,
                   round(206.835 - 1.015 * (nw1 / ns1)
                         - 84.6 * (n_syll / nw1), 6) AS flesch_ease,
                   round(0.39 * (nw1 / ns1) + 11.8 * (n_syll / nw1)
                         - 15.59, 6) AS fk_grade
            FROM rd_s""",
        "doc_keywords": f"""
            WITH tok AS (
                SELECT doc_id, unnest({_TOK}) AS term FROM documents
            ),
            tf AS (
                SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
            ),
            dfr AS (
                SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1
            ),
            nd AS (SELECT count(*) AS n FROM documents),
            scored AS (
                SELECT tf.doc_id, tf.term,
                       tf.tf * (ln((1.0 + nd.n) / (1.0 + dfr.df)) + 1.0)
                           AS score0
                FROM tf JOIN dfr USING (term) CROSS JOIN nd
            )
            SELECT doc_id, rank, term, round(score0, 6) AS score
            FROM (
                SELECT doc_id, term, score0,
                       row_number() OVER (PARTITION BY doc_id
                           ORDER BY score0 DESC, term ASC) AS rank
                FROM scored
            ) WHERE rank <= 3
        """,
        "basket_rules": """
            WITH mem AS (
                SELECT DISTINCT l_orderkey AS g, l_partkey AS n FROM lineitem
            ),
            memc AS (
                SELECT g, n FROM mem
                QUALIFY count(*) OVER (PARTITION BY g) <= 10
            ),
            supp AS (SELECT n, count(*) AS cnt FROM memc GROUP BY 1),
            nb AS (SELECT count(DISTINCT g) AS N FROM memc),
            pairs AS (
                SELECT x.n AS a, y.n AS b, count(*) AS n_ab
                FROM memc x JOIN memc y USING (g)
                WHERE x.n < y.n GROUP BY 1, 2 HAVING count(*) >= 2
            )
            SELECT a, b, n_ab, sa.cnt AS n_a, sb.cnt AS n_b,
                   round(n_ab / CAST(nb.N AS DOUBLE), 6) AS support,
                   round(n_ab / CAST(sa.cnt AS DOUBLE), 6) AS conf_a_b,
                   round(n_ab / CAST(sb.cnt AS DOUBLE), 6) AS conf_b_a,
                   round(n_ab * CAST(nb.N AS DOUBLE)
                         / (sa.cnt * sb.cnt), 6) AS lift
            FROM pairs
            JOIN supp sa ON sa.n = pairs.a
            JOIN supp sb ON sb.n = pairs.b
            CROSS JOIN nb
        """,
        "sentence_chunks": """
            WITH s AS (
                SELECT doc_id,
                       list_filter(list_transform(
                           regexp_extract_all(text, '[^.!?]+[.!?]*'),
                           x -> trim(x)), x -> x <> '') AS arr
                FROM documents
            ), e AS (
                SELECT doc_id, i - 1 AS pos, arr[i] AS sentence
                FROM s, unnest(generate_series(1, len(arr))) AS u(i)
            )
            SELECT doc_id, (pos // 3)::BIGINT AS chunk_id,
                   count(*)::BIGINT AS n_sentences,
                   string_agg(sentence, ' ' ORDER BY pos) AS chunk_text
            FROM e GROUP BY 1, 2
        """,
        "scene_cuts": """
            SELECT doc_id,
                   cast(i AS INTEGER) AS frame_idx,
                   cast(i * 100 AS BIGINT) AS ts_ms,
                   (i > 0 AND i % 2 = 0) AS is_cut,
                   cast(i // 2 AS INTEGER) AS scene_id
            FROM (SELECT doc_id, doc_id % 5 + 2 AS n_frames
                  FROM documents WHERE doc_id % 4 = 0),
                 unnest(range(0, n_frames)) AS u(i)
        """,
        "cms_counts": f"""
            WITH tok AS (
                SELECT unnest({_TOK}) AS token FROM documents
            ), rs AS (SELECT unnest([0, 1, 2]) AS r),
            grid AS (
                SELECT rs.r,
                       ('0x' || substr(md5('cms' || '|' || rs.r::VARCHAR
                           || '|' || token), 1, 15))::BIGINT % 512 AS b,
                       count(*)::BIGINT AS c
                FROM tok CROSS JOIN rs GROUP BY 1, 2
            ),
            probes AS (
                SELECT token, count(*)::BIGINT AS exact FROM tok
                GROUP BY 1 ORDER BY exact DESC, token LIMIT 50
            ),
            pe AS (
                SELECT p.token, p.exact, min(coalesce(g.c, 0)) AS est
                FROM probes p CROSS JOIN rs
                LEFT JOIN grid g ON g.r = rs.r AND g.b =
                    ('0x' || substr(md5('cms' || '|' || rs.r::VARCHAR
                        || '|' || p.token), 1, 15))::BIGINT % 512
                GROUP BY 1, 2
            )
            SELECT token, exact, est, est - exact AS overcount FROM pe
        """,
        "html_extract": """
            WITH h AS (
                SELECT doc_id,
                       '<html><head><style>p{margin:0}</style>'
                       || '<script>if(a<b){go(''&amp;'')}</script>'
                       || '</head><body><h1>Doc '
                       || cast(doc_id AS VARCHAR) || '</h1><p>'
                       || coalesce(text, '') || '</p><a href="/doc?id='
                       || cast(doc_id AS VARCHAR)
                       || '">more &amp; related</a>'
                       || '<!-- generated --></body></html>' AS html
                FROM documents
            ), s AS (
                SELECT doc_id,
                       regexp_replace(regexp_replace(regexp_replace(
                           regexp_replace(html,
                               '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                               '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                               '(?s)<!--.*?-->', ' ', 'g'),
                               '<[^>]+>', ' ', 'g') AS t1,
                       regexp_replace(array_to_string(regexp_extract_all(
                           html, '(?is)<a\\b[^>]*>(.*?)</a>', 1), ' '),
                           '<[^>]+>', ' ', 'g') AS a1,
                       len(regexp_extract_all(html,
                           '(?is)<a\\b[^>]*>(.*?)</a>', 1)) AS n_links
                FROM h
            ), d AS (
                SELECT doc_id, n_links,
                       trim(regexp_replace(replace(replace(replace(replace(
                           replace(replace(t1, '&nbsp;', ' '), '&lt;', '<'),
                           '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
                           '&amp;', '&'), '\\s+', ' ', 'g'))
                           AS text_extracted,
                       trim(regexp_replace(replace(replace(replace(replace(
                           replace(replace(a1, '&nbsp;', ' '), '&lt;', '<'),
                           '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
                           '&amp;', '&'), '\\s+', ' ', 'g')) AS atext
                FROM s
            )
            SELECT doc_id, text_extracted, n_links,
                   CASE WHEN len(text_extracted) > 0
                        THEN round(len(atext)::DOUBLE
                             / len(text_extracted), 6)
                        ELSE 0.0 END AS link_density
            FROM d
        """,
        "bloom_gate": """
            WITH js AS (SELECT unnest([0, 1, 2]) AS j),
            blp AS (
                SELECT ('0x' || substr(md5('bloomgate' || '|'
                           || j::VARCHAR || '|' || text), 1, 15))::BIGINT
                       % 2016 AS h
                FROM documents CROSS JOIN js
                WHERE doc_id % 7 = 0 AND text IS NOT NULL
            ),
            words AS (
                SELECT h // 63 AS w,
                       bit_or(1::BIGINT << (h % 63)::INT) AS bits
                FROM blp GROUP BY 1
            ),
            cp AS (
                SELECT d.doc_id,
                       (d.doc_id % 7 = 0 AND d.text IS NOT NULL)
                           AS in_blocklist,
                       ('0x' || substr(md5('bloomgate' || '|'
                           || j::VARCHAR || '|' || d.text), 1, 15))::BIGINT
                       % 2016 AS h
                FROM documents d CROSS JOIN js
            )
            SELECT cp.doc_id, any_value(cp.in_blocklist) AS in_blocklist,
                   bool_and(coalesce((words.bits >> (cp.h % 63)::INT)
                       & 1, 0) = 1) AS maybe_blocked
            FROM cp LEFT JOIN words ON words.w = cp.h // 63
            GROUP BY cp.doc_id
        """,
        "epoch_shuffle": """
            SELECT doc_id,
                   (row_number() OVER (ORDER BY
                        ('0x' || substr(md5('epoch' || '|' || '3' || '|'
                            || cast(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                        doc_id) - 1)::BIGINT AS epoch_pos
            FROM documents
        """,
        "leakage_safe_split": f"""
            WITH RECURSIVE pairs AS (
                {_minhash_oracle()}
            ), sym AS (
                SELECT id_a AS u, id_b AS v FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs
            ), reach(node, r) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT reach.node, sym.v FROM reach JOIN sym ON sym.u = reach.r
            ), comp AS (
                SELECT node AS doc_id, min(r) AS group_id FROM reach GROUP BY 1
            ), b AS (
                SELECT doc_id, group_id,
                       ('0x' || substr(md5('split' || cast(group_id AS VARCHAR)),
                        1, 15))::BIGINT % 10000 AS bucket
                FROM comp
            )
            SELECT doc_id, group_id,
                   CASE WHEN bucket < 8000 THEN 'train'
                        WHEN bucket < 9000 THEN 'val'
                        ELSE 'test' END AS split
            FROM b
        """,
        "dataset_splits": """
            WITH b AS (
                SELECT doc_id, text,
                       ('0x' || substr(md5('split' || cast(doc_id AS VARCHAR)),
                            1, 15))::BIGINT % 10000 AS sb,
                       ('0x' || substr(md5('sample' || cast(doc_id AS VARCHAR)),
                            1, 15))::BIGINT % 10000 AS smb
                FROM documents
            ), s AS (
                SELECT doc_id, text, smb,
                       CASE WHEN sb < 8000 THEN 'train'
                            WHEN sb < 9000 THEN 'val' ELSE 'test' END AS split
                FROM b
            )
            SELECT split,
                   count(*) AS n_docs,
                   sum(len(regexp_extract_all(text,
                       '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]')))::BIGINT AS n_tokens,
                   sum(CASE WHEN smb < 1000 THEN 1 ELSE 0 END)::BIGINT
                       AS n_sample_10pct
            FROM s GROUP BY 1
        """,
        "dedup_keep_best": f"""
            WITH RECURSIVE pairs AS (
                {_minhash_oracle()}
            ), sym AS (
                SELECT id_a AS u, id_b AS v FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs
            ), reach(node, r) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT reach.node, sym.v FROM reach JOIN sym ON sym.u = reach.r
            ), comp AS (
                SELECT node AS doc_id, min(r) AS group_id FROM reach GROUP BY 1
            ), gs AS (
                SELECT group_id, count(*) AS group_size FROM comp GROUP BY 1
            ), tq AS (
                SELECT doc_id, {_TOK} AS toks, text FROM documents
            ), q AS (
                SELECT doc_id,
                       round(least(len(toks) / 50.0, 1.0) * 0.4
                         + CASE WHEN list_sum(list_transform(toks, x -> length(x)))
                                     / greatest(len(toks), 1) >= 3
                                 AND list_sum(list_transform(toks, x -> length(x)))
                                     / greatest(len(toks), 1) <= 10
                                THEN 0.3 ELSE 0.0 END
                         + least(len(list_filter(toks, x -> x IN ('the','and','of',
                               'to','in','is','that','for','with','as')))
                             / cast(greatest(len(toks), 1) AS DOUBLE) * 3, 0.3),
                           6) AS quality_score
                FROM tq
            )
            SELECT c.doc_id, c.group_id, g.group_size, q.quality_score,
                   row_number() OVER (PARTITION BY c.group_id
                       ORDER BY q.quality_score DESC, c.doc_id) = 1 AS keep
            FROM comp c JOIN gs g USING (group_id) JOIN q USING (doc_id)
        """,
        "nested_docs": """
            SELECT c.c_custkey AS _customer_id,
                   array_to_string(list_sort(list(
                       concat(epoch_us(o.o_orderdate), ',', o.o_totalprice::DECIMAL(18,2)))), '|')
                       AS customer_orders
            FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY 1
        """,
        "nested_two_level": """
            WITH li AS (
                SELECT l_orderkey,
                       list_sort(list(concat(l_linenumber, ':', l_quantity::DECIMAL(18,2)))) AS lis
                FROM lineitem GROUP BY 1
            ), od AS (
                SELECT o.o_custkey,
                       concat(epoch_us(o.o_orderdate), ',', o.o_totalprice::DECIMAL(18,2), '[',
                              array_to_string(coalesce(li.lis, []), ';'), ']') AS od_s
                FROM orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey
            )
            SELECT c.c_custkey AS _customer_id,
                   array_to_string(list_sort(list(od_s)), '|') AS orders_docs
            FROM customer c JOIN od ON od.o_custkey = c.c_custkey
            GROUP BY 1
        """,
        "filter_dsl": """
            SELECT o_orderkey AS _orders_id, o_orderstatus, o_totalprice, o_orderpriority
            FROM orders
            WHERE o_orderstatus = 'F' AND o_totalprice > 200000
              AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        """,
        "collector_union": """
            SELECT concat(l_orderkey,'_',l_linenumber,'_',l_partkey,'_',l_suppkey,
                          '_',l_quantity,'_',l_extendedprice) AS _doc_id,
                   'lineitem' AS source_node, o.o_custkey AS cust_id
            FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
            UNION ALL
            SELECT cast(event_id AS VARCHAR) AS _doc_id,
                   'events' AS source_node, c.c_custkey AS cust_id
            FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        """,
        "joining_props": """
            SELECT c.c_custkey AS _customer_id, c.c_name,
                   array_to_string(coalesce(list_sort(list_distinct(list(o.o_orderstatus)
                       FILTER (WHERE o.o_orderstatus IS NOT NULL))), []), '|')
                       AS order_statuses
            FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        """,
        "shipping_priority": """
            SELECT l.l_orderkey,
                   epoch_us(o.o_orderdate) AS o_orderdate_us,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1995-03-15'
              AND l.l_shipdate > TIMESTAMP '1995-03-15'
            GROUP BY 1, 2
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10
        """,
        "returnflag_priority": """
            SELECT l.l_returnflag,
                   sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
                   sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE 1 END)::BIGINT AS low_line_count
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY 1
        """,
        "event_funnel": """
            WITH e AS (
                SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
            ), s1 AS (
                SELECT *, min(CASE WHEN event_type = 'view' THEN ts_us END)
                    OVER w AS first_view
                FROM e WINDOW w AS (PARTITION BY user_id
                    ORDER BY ts_us, event_type ROWS UNBOUNDED PRECEDING)
            ), s2 AS (
                SELECT *, min(CASE WHEN event_type = 'click'
                                    AND ts_us > first_view THEN ts_us END)
                    OVER w AS first_click
                FROM s1 WINDOW w AS (PARTITION BY user_id
                    ORDER BY ts_us, event_type ROWS UNBOUNDED PRECEDING)
            ), s3 AS (
                SELECT *, min(CASE WHEN event_type = 'purchase'
                                    AND ts_us > first_click THEN ts_us END)
                    OVER w AS first_buy
                FROM s2 WINDOW w AS (PARTITION BY user_id
                    ORDER BY ts_us, event_type ROWS UNBOUNDED PRECEDING)
            ), pu AS (
                SELECT user_id, min(first_view) AS v, min(first_click) AS c,
                       min(first_buy) AS b
                FROM s3 GROUP BY 1
            )
            SELECT count(*) AS n_users,
                   count(v) AS reached_view,
                   count(c) AS reached_click,
                   count(b) AS reached_purchase,
                   round(100.0 * count(b) / count(v), 6) AS view_to_purchase_pct
            FROM pu
        """,
        "cohort_retention": """
            WITH co AS (
                SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
                FROM events WHERE event_type = 'signup' GROUP BY 1
            )
            SELECT epoch_us(co.cohort_week::TIMESTAMP) AS cohort_week_us,
                   (datediff('day', co.cohort_week,
                             date_trunc('week', e.ts)) // 7) AS week_offset,
                   count(DISTINCT e.user_id) AS n_active
            FROM events e JOIN co USING (user_id)
            WHERE datediff('day', co.cohort_week, date_trunc('week', e.ts)) >= 0
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "sequence_packing": f"""
            WITH toks AS (
                SELECT doc_id,
                       len(regexp_extract_all(text,
                           '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]'))::BIGINT AS n_tokens
                FROM documents
            ), placed AS (
                SELECT doc_id, n_tokens,
                       sum(n_tokens) OVER (ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before
                FROM toks WHERE n_tokens > 0
            ), spans AS (
                SELECT doc_id, n_tokens,
                       cum_before // 512 AS start_seq,
                       (cum_before + n_tokens - 1) // 512 AS end_seq,
                       cum_before % 512 AS start_offset
                FROM placed
            )
            SELECT (start_seq // 50)::BIGINT AS seq_bucket,
                   count(*) AS n_docs,
                   sum(n_tokens)::BIGINT AS n_tokens,
                   sum(CASE WHEN end_seq > start_seq THEN 1 ELSE 0 END)::BIGINT
                       AS n_straddling,
                   min(start_offset)::BIGINT AS min_start_offset,
                   max(start_offset)::BIGINT AS max_start_offset
            FROM spans GROUP BY 1 ORDER BY 1
        """,
        "pii_redaction": """
            WITH i1 AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 5 = 0 THEN text || ' contact user'
                            || cast(doc_id AS VARCHAR) || '@example.com now'
                            ELSE text END AS t
                FROM documents
            ), i2 AS (
                SELECT doc_id, CASE WHEN doc_id % 7 = 0
                            THEN t || ' call 555-123-4567 today'
                            ELSE t END AS t
                FROM i1
            ), i3 AS (
                SELECT doc_id, CASE WHEN doc_id % 11 = 0
                            THEN t || ' from 10.0.'
                                 || cast(doc_id % 256 AS VARCHAR) || '.1'
                            ELSE t END AS t
                FROM i2
            ), red AS (
                SELECT doc_id, t,
                       regexp_replace(regexp_replace(regexp_replace(t,
                           '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}',
                           '[EMAIL]', 'g'),
                           '\\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}',
                           '[PHONE]', 'g'),
                           '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b',
                           '[IPV4]', 'g') AS r
                FROM i3
            )
            SELECT count(*) AS n_docs,
                   sum(len(regexp_extract_all(t,
                       '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')))::BIGINT
                       AS n_emails,
                   sum(len(regexp_extract_all(t,
                       '\\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}')))::BIGINT
                       AS n_phones,
                   sum(len(regexp_extract_all(t,
                       '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')))::BIGINT
                       AS n_ipv4,
                   sum(len(regexp_extract_all(r,
                       '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}'))
                     + len(regexp_extract_all(r,
                       '\\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}'))
                     + len(regexp_extract_all(r,
                       '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')))::BIGINT
                       AS residual_pii,
                   bit_xor(('0x' || substr(md5(r), 1, 15))::BIGINT)
                       AS redacted_checksum
            FROM red
        """,
        "bm25_search": f"""
            WITH tok AS (
                SELECT doc_id, unnest({_TOK}) AS term FROM documents
            ), doclen AS (
                SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1
            ), stats AS (
                SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doclen
            ), tf AS (
                SELECT doc_id, term, count(*) AS tf FROM tok
                WHERE term IN ('join', 'spark', 'dup') GROUP BY 1, 2
            ), dfs AS (
                SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1
            )
            SELECT tf.doc_id,
                   round(sum(
                       ln(1.0 + (s.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
                       * (tf.tf * 2.2)
                       / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
                   ), 6) AS bm25,
                   count(*) AS n_matched_terms
            FROM tf
            JOIN dfs USING (term)
            JOIN doclen dl USING (doc_id)
            CROSS JOIN stats s
            GROUP BY 1
            ORDER BY bm25 DESC, doc_id ASC
            LIMIT 20
        """,
        "term_frequencies": f"""
            WITH tok AS (
                SELECT doc_id, unnest({_TOK}) AS term FROM documents
            )
            SELECT term, count(*) AS tf,
                   count(DISTINCT doc_id) AS df
            FROM tok GROUP BY 1
            ORDER BY tf DESC, term ASC
            LIMIT 50
        """,
        "merge_upsert": """
            WITH delta AS (
                SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                       o_totalprice + 1000.0 AS o_totalprice,
                       o_orderdate, o_orderpriority,
                       (o_orderkey % 21 = 0) AS _deleted
                FROM orders WHERE o_orderkey % 7 = 0
                UNION ALL
                SELECT o_orderkey + 10000000, o_custkey, 'N',
                       o_totalprice, o_orderdate, o_orderpriority, FALSE
                FROM orders WHERE o_orderkey % 13 = 5
            ), merged AS (
                SELECT o.* FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM delta d
                                  WHERE d.o_orderkey = o.o_orderkey)
                UNION ALL
                SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                       o_orderdate, o_orderpriority
                FROM delta WHERE NOT coalesce(_deleted, FALSE)
            )
            SELECT o_orderstatus, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS sum_totalprice
            FROM merged GROUP BY 1 ORDER BY 1
        """,
        "scd2_history": """
            WITH e AS (
                SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events
            ), collapsed AS (
                SELECT * FROM (
                    SELECT user_id, ts_us, event_type,
                           lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts_us) AS prev_type
                    FROM e)
                WHERE event_type IS DISTINCT FROM prev_type
            )
            SELECT user_id, event_type,
                   ts_us AS valid_from_us,
                   lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
                       AS valid_to_us,
                   lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
                       IS NULL AS is_current
            FROM collapsed
        """,
        "local_supplier_volume": """
            SELECT n.n_name,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
                           AND c.c_nationkey = s.s_nationkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'ASIA'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY 1 ORDER BY revenue DESC
        """,
        "late_shipment_orders": """
            SELECT o.o_orderpriority, count(*) AS order_count
            FROM orders o
            WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1996-07-01'
              AND EXISTS (
                  SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
            GROUP BY 1 ORDER BY 1
        """,
        "returned_item_customers": """
            SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE l.l_returnflag = 'R'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1996-07-01'
            GROUP BY 1, 2, 3, 4
            ORDER BY revenue DESC, c_custkey ASC
            LIMIT 20
        """,
        "order_count_distribution": """
            SELECT c_count, count(*) AS custdist
            FROM (
                SELECT c.c_custkey, count(o.o_orderkey) AS c_count
                FROM customer c
                LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                                  AND o.o_orderpriority <> '1-URGENT'
                GROUP BY 1)
            GROUP BY 1 ORDER BY custdist DESC, c_count DESC
        """,
        "promo_revenue_share": """
            SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                       THEN l.l_extendedprice * (1 - l.l_discount)
                       ELSE 0.0 END)
                   / sum(l.l_extendedprice * (1 - l.l_discount)), 6)
                   AS promo_revenue_pct
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
              AND l.l_shipdate < TIMESTAMP '1996-10-01'
        """,
        "large_order_customers": """
            SELECT c.c_custkey, c.c_name, o.o_orderkey,
                   epoch_us(o.o_orderdate) AS o_orderdate_us,
                   o.o_totalprice, b.sum_qty
            FROM orders o
            JOIN (
                SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
                FROM lineitem GROUP BY 1
                HAVING sum(l_quantity) > 300) b
              ON o.o_orderkey = b.l_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
            LIMIT 100
        """,
        "idle_high_balance_customers": """
            SELECT c.c_nationkey, count(*) AS numcust,
                   round(sum(c.c_acctbal), 2) AS totacctbal
            FROM customer c
            WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer
                                 WHERE c_acctbal > 0)
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderdate >= TIMESTAMP '2000-01-01')
            GROUP BY 1 ORDER BY 1
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2000-09-01'
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "top_revenue_nations": """
            SELECT n.n_name,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1 ORDER BY revenue DESC
        """,
        "events_window": """
            SELECT date_trunc('day', ts)::TIMESTAMP AS day, event_type,
                   count(*) AS n_events,
                   round(sum(value), 2) AS total_value,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1, 2
        """,
        "asof_join": """
            WITH ev AS (
                SELECT event_id, user_id, ts::TIMESTAMP AS ev_ts FROM events
            ), ord AS (
                SELECT o_custkey AS user_id, o_orderdate,
                       max(o_orderkey) AS last_orderkey,
                       max_by(o_totalprice, o_orderkey) AS last_totalprice,
                       CASE WHEN max(o_orderkey) % 3 != 0
                            THEN max_by(o_totalprice, o_orderkey) END AS maybe_price
                FROM orders GROUP BY 1, 2
            )
            SELECT e.event_id, e.user_id, o.last_orderkey,
                   round(o.last_totalprice, 2) AS last_totalprice,
                   round(o.maybe_price, 2) AS maybe_price
            FROM ev e ASOF LEFT JOIN ord o
              ON e.user_id = o.user_id AND o.o_orderdate <= e.ev_ts
        """,
        "range_join": """
            WITH ev AS (
                SELECT event_id, user_id, epoch_us(ts::TIMESTAMP) AS ev_us FROM events
            )
            SELECT e.event_id,
                   count(o.o_orderkey) AS n_recent_orders
            FROM ev e LEFT JOIN orders o
              ON o.o_custkey = e.user_id
             AND epoch_us(o.o_orderdate) BETWEEN e.ev_us - 2592000000000 AND e.ev_us
            GROUP BY 1
        """,
        "time_rollup": """
            SELECT year(ts::TIMESTAMP)::BIGINT AS y,
                   month(ts::TIMESTAMP)::BIGINT AS m,
                   day(ts::TIMESTAMP)::BIGINT AS d,
                   count(*) AS n_events,
                   round(sum(value), 2) AS total_value
            FROM events
            GROUP BY ROLLUP (1, 2, 3)
        """,
        "window_rank": """
            SELECT o_custkey, o_orderkey, o_totalprice,
                   cast(rn AS INTEGER) AS price_rank
            FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders
            ) WHERE rn <= 2
        """,
        "window_lag": """
            SELECT o_custkey, o_orderkey,
                   datediff('day',
                       lag(o_orderdate) OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey),
                       o_orderdate) AS days_since_prev
            FROM orders
        """,
        "rollup_pricing": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_extendedprice), 2) AS sum_price,
                   count(*) AS n
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "anti_join": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """,
        "cube_pricing": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "intersect_except": """
            SELECT k AS custkey FROM (
                SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
                INTERSECT
                SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
            )
            EXCEPT ALL
            SELECT DISTINCT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        """,
        "global_topk": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
        """,
        "stats_summary": """
            SELECT c.c_mktsegment,
                   round(quantile_cont(o.o_totalprice, 0.5), 4) AS median_price,
                   round(quantile_cont(o.o_totalprice, 0.9), 4) AS p90_price,
                   round(stddev_samp(o.o_totalprice), 4) AS sd_price,
                   round(corr(o.o_totalprice, c.c_acctbal), 6) AS price_balance_corr,
                   count(*) AS n
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1
        """,
        "heavy_hitters": """
            SELECT user_id, count(*)::BIGINT AS cnt,
                   round(count(*) / (SELECT count(*)::DOUBLE FROM events), 6)
                       AS share
            FROM events
            GROUP BY user_id
            HAVING count(*) / (SELECT count(*)::DOUBLE FROM events) >= 0.0075
        """,
        "zorder_layout": """
            SELECT event_id, user_id,
                   ("""
        + " + ".join(
            f"(((user_id >> {i}) & 1) << {2 * i}) + "
            f"((((event_id % 256) >> {i}) & 1) << {2 * i + 1})"
            for i in range(8)
        )
        + """)::BIGINT AS zval
            FROM events
        """,
        "quality_checks": """
            SELECT 'completeness' AS constraint, 'o_custkey' AS "column",
                   round(count(o_custkey) / count(*), 6) AS metric,
                   1.0::DOUBLE AS threshold,
                   count(o_custkey) / count(*) >= 1.0 AS passed
            FROM orders
            UNION ALL
            SELECT 'uniqueness', 'o_orderkey',
                   round(count(DISTINCT o_orderkey) / count(o_orderkey), 6),
                   1.0::DOUBLE,
                   count(DISTINCT o_orderkey) / count(o_orderkey) >= 1.0
            FROM orders
            UNION ALL
            SELECT 'accepted_values', 'o_orderstatus',
                   round(sum((o_orderstatus IN ('O','F','P'))::BIGINT)
                         / count(o_orderstatus), 6),
                   1.0::DOUBLE,
                   sum((o_orderstatus IN ('O','F','P'))::BIGINT)
                       / count(o_orderstatus) >= 1.0
            FROM orders
            UNION ALL
            SELECT 'row_count', '*', round(count(*)::DOUBLE, 6), 1000.0::DOUBLE,
                   count(*) >= 1000
            FROM orders
            UNION ALL
            SELECT 'in_bounds', 'l_quantity',
                   round(sum((l_quantity BETWEEN 1 AND 50)::BIGINT)
                         / count(l_quantity), 6),
                   1.0::DOUBLE,
                   sum((l_quantity BETWEEN 1 AND 50)::BIGINT)
                       / count(l_quantity) >= 1.0
            FROM lineitem
            UNION ALL
            SELECT 'in_bounds', 'l_discount',
                   round(sum((l_discount BETWEEN 0.0 AND 0.1)::BIGINT)
                         / count(l_discount), 6),
                   1.0::DOUBLE,
                   sum((l_discount BETWEEN 0.0 AND 0.1)::BIGINT)
                       / count(l_discount) >= 1.0
            FROM lineitem
            UNION ALL
            SELECT 'matches', 'c_name',
                   round(sum(regexp_matches(c_name, '^Customer#')::BIGINT)
                         / count(c_name), 6),
                   1.0::DOUBLE,
                   sum(regexp_matches(c_name, '^Customer#')::BIGINT)
                       / count(c_name) >= 1.0
            FROM customer
            UNION ALL
            SELECT 'referential', 'l_orderkey',
                   round(sum((l_orderkey IN (SELECT o_orderkey FROM orders))::BIGINT)
                         / count(*), 6),
                   1.0::DOUBLE,
                   sum((l_orderkey IN (SELECT o_orderkey FROM orders))::BIGINT)
                       / count(*) >= 1.0
            FROM lineitem WHERE l_orderkey IS NOT NULL
            UNION ALL
            SELECT 'referential', 'o_custkey',
                   round(sum((o_custkey IN (SELECT c_custkey FROM customer))::BIGINT)
                         / count(*), 6),
                   1.0::DOUBLE,
                   sum((o_custkey IN (SELECT c_custkey FROM customer))::BIGINT)
                       / count(*) >= 1.0
            FROM orders WHERE o_custkey IS NOT NULL
        """,
        "snapshot_diff": """
            WITH v2 AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 7 = 0 THEN upper(text)
                            ELSE text END AS text
                FROM documents WHERE doc_id % 13 <> 5
                UNION ALL
                SELECT doc_id + 1000000, text
                FROM documents WHERE doc_id % 17 = 3
            )
            SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                   CASE WHEN o.doc_id IS NULL THEN 'added'
                        WHEN n.doc_id IS NULL THEN 'removed'
                        WHEN o.text <> n.text THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM documents o FULL OUTER JOIN v2 n ON o.doc_id = n.doc_id
        """,
        "column_profile": """
            SELECT 'o_orderkey' AS "column", count(*)::BIGINT AS n,
                   (count(*) - count(o_orderkey))::BIGINT AS n_null,
                   count(DISTINCT o_orderkey)::BIGINT AS n_distinct,
                   round(min(o_orderkey)::DOUBLE, 6) AS min,
                   round(max(o_orderkey)::DOUBLE, 6) AS max,
                   round(avg(o_orderkey::DOUBLE), 6) AS mean,
                   round(stddev(o_orderkey::DOUBLE), 6) AS stddev
            FROM orders
            UNION ALL
            SELECT 'o_custkey', count(*)::BIGINT,
                   (count(*) - count(o_custkey))::BIGINT,
                   count(DISTINCT o_custkey)::BIGINT,
                   round(min(o_custkey)::DOUBLE, 6),
                   round(max(o_custkey)::DOUBLE, 6),
                   round(avg(o_custkey::DOUBLE), 6),
                   round(stddev(o_custkey::DOUBLE), 6)
            FROM orders
            UNION ALL
            SELECT 'o_totalprice', count(*)::BIGINT,
                   (count(*) - count(o_totalprice))::BIGINT,
                   count(DISTINCT o_totalprice)::BIGINT,
                   round(min(o_totalprice)::DOUBLE, 6),
                   round(max(o_totalprice)::DOUBLE, 6),
                   round(avg(o_totalprice::DOUBLE), 6),
                   round(stddev(o_totalprice::DOUBLE), 6)
            FROM orders
            UNION ALL
            SELECT 'o_orderstatus', count(*)::BIGINT,
                   (count(*) - count(o_orderstatus))::BIGINT,
                   count(DISTINCT o_orderstatus)::BIGINT,
                   NULL::DOUBLE, NULL::DOUBLE, NULL::DOUBLE, NULL::DOUBLE
            FROM orders
        """,
        "value_histogram": """
            WITH b AS (
                SELECT least(greatest(
                           floor((l_extendedprice::DOUBLE - 0.0) / 5000.0),
                           0), 11)::BIGINT AS bin
                FROM lineitem WHERE l_extendedprice IS NOT NULL
            )
            SELECT bin, round((bin * 5000.0)::DOUBLE, 6) AS bin_lo,
                   round(((bin + 1) * 5000.0)::DOUBLE, 6) AS bin_hi,
                   count(*)::BIGINT AS n
            FROM b GROUP BY bin ORDER BY bin
        """,
        "ann_lsh_topk_portable": """
            WITH pl AS (
                SELECT j, list_transform(range(0, 64),
                           i -> ((j * 31 + i * 7) % 11 - 5)::DOUBLE) AS p
                FROM (SELECT unnest(range(0, 16)) AS j)
            ), e AS (
                SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ), bits AS (
                SELECT vec_id, j,
                       (list_dot_product(v, p) > 0)::BIGINT AS bit
                FROM e CROSS JOIN pl
            ), bands AS (
                SELECT vec_id, (j // 4)::BIGINT AS cb,
                       sum(bit << (j % 4))::BIGINT AS cv
                FROM bits GROUP BY vec_id, cb
            ), qb AS (
                SELECT vec_id AS query_id, cb, cv
                FROM bands WHERE vec_id % 29 = 0
            ), cand AS (
                SELECT DISTINCT qb.query_id, c.vec_id AS neighbor_id
                FROM qb JOIN bands c USING (cb, cv)
                WHERE c.vec_id <> qb.query_id
            ), scored AS (
                SELECT cand.query_id, cand.neighbor_id,
                       list_dot_product(q.v, n.v)
                         / (sqrt(list_dot_product(q.v, q.v))
                            * sqrt(list_dot_product(n.v, n.v))) AS cos_raw
                FROM cand
                JOIN e q ON q.vec_id = cand.query_id
                JOIN e n ON n.vec_id = cand.neighbor_id
            )
            SELECT query_id, neighbor_id, cast(rn AS INTEGER) AS rank,
                   round(cos_raw, 6) AS cosine
            FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY cos_raw DESC, neighbor_id) AS rn FROM scored)
            WHERE rn <= 10
        """,
        "weighted_sample": """
            SELECT doc_id, lang, n_chars, sample_rank::INTEGER AS sample_rank
            FROM (
                SELECT doc_id, lang, n_chars, row_number() OVER (
                    ORDER BY ln((('0x' || substr(md5('wsample' || doc_id), 1, 15))::BIGINT
                                 + 1.0) / 1152921504606846976.0)
                             / n_chars::DOUBLE DESC,
                             doc_id
                ) AS sample_rank
                FROM documents WHERE n_chars > 0
            ) WHERE sample_rank <= 50
        """,
        "outlier_flags": """
            WITH q AS (
                SELECT l_returnflag,
                       quantile_cont(l_extendedprice, 0.25) AS q1,
                       quantile_cont(l_extendedprice, 0.75) AS q3
                FROM lineitem GROUP BY l_returnflag
            )
            SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
                   l.l_extendedprice,
                   round(q.q1, 6) AS q1, round(q.q3, 6) AS q3,
                   round(q.q1 - 1.5 * (q.q3 - q.q1), 6) AS lo_fence,
                   round(q.q3 + 1.5 * (q.q3 - q.q1), 6) AS hi_fence,
                   (l.l_extendedprice < q.q1 - 1.5 * (q.q3 - q.q1)
                    OR l.l_extendedprice > q.q3 + 1.5 * (q.q3 - q.q1)) AS is_outlier
            FROM lineitem l JOIN q USING (l_returnflag)
        """,
        "grouped_topk": """
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   rank::INTEGER AS rank
            FROM (
                SELECT o_orderpriority, o_orderkey, o_totalprice,
                       row_number() OVER (
                           PARTITION BY o_orderpriority
                           ORDER BY o_totalprice DESC, o_orderkey
                       ) AS rank
                FROM orders
            ) WHERE rank <= 3
        """,
        "stratified_fixed_k": """
            SELECT doc_id, text, lang, source, n_chars,
                   sample_rank::INTEGER AS sample_rank
            FROM (
                SELECT d.*, row_number() OVER (
                    PARTITION BY lang
                    ORDER BY ('0x' || substr(md5('fixedk' || doc_id), 1, 15))::BIGINT,
                             doc_id
                ) AS sample_rank
                FROM documents d
            ) WHERE sample_rank <= 20
        """,
        "hashed_features": f"""
            WITH tok AS (
                SELECT doc_id, {_TOK} AS t FROM documents
            ), grams AS (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(1, greatest(len(t) - 1, 0)),
                           i -> concat(t[i], ' ', t[i + 1]))) AS g
                FROM tok
            ), h AS (
                SELECT doc_id,
                       ('0x' || substr(md5('feat' || g), 1, 15))::BIGINT AS hv
                FROM grams
            ), sp AS (
                SELECT doc_id, hv % 64 AS idx,
                       sum(CASE WHEN (hv // 64) % 2 = 1
                                THEN -1.0 ELSE 1.0 END) AS v
                FROM h GROUP BY doc_id, hv % 64
            )
            SELECT doc_id, idx::BIGINT AS idx,
                   round(CASE WHEN nrm > 0 THEN v / nrm ELSE 0.0 END, 6) AS val
            FROM (
                SELECT *, sqrt(sum(v * v) OVER (PARTITION BY doc_id)) AS nrm
                FROM sp
            )
        """,
        "hard_negatives": """
            WITH e AS (
                SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
            ), scored AS (
                SELECT a.vec_id AS anchor_id, b.vec_id AS neighbor_id,
                       a.label AS anchor_label, b.label AS negative_label,
                       list_dot_product(a.v, b.v)
                         / (sqrt(list_dot_product(a.v, a.v))
                            * sqrt(list_dot_product(b.v, b.v))) AS cos_raw
                FROM e a JOIN e b ON b.vec_id <> a.vec_id
                WHERE a.vec_id < 5
            ), cand AS (
                SELECT * FROM (
                    SELECT *, row_number() OVER (PARTITION BY anchor_id
                               ORDER BY cos_raw DESC, neighbor_id) AS rn0
                    FROM scored
                ) WHERE rn0 <= 30
            )
            SELECT anchor_id, neighbor_id AS negative_id,
                   rank::INTEGER AS rank, round(cos_raw, 6) AS cosine,
                   anchor_label, negative_label
            FROM (
                SELECT *, row_number() OVER (PARTITION BY anchor_id
                           ORDER BY round(cos_raw, 6) DESC, neighbor_id) AS rank
                FROM cand WHERE anchor_label <> negative_label
            ) WHERE rank <= 3
        """,
        "class_balanced": """
            WITH c AS (
                SELECT label, count(*) AS n FROM embeddings GROUP BY label
            ), r AS (
                SELECT e.vec_id, e.label, c.n,
                       row_number() OVER (PARTITION BY e.label
                           ORDER BY ('0x' || substr(md5('balance' || e.vec_id), 1, 15))::BIGINT,
                                    e.vec_id) AS rk
                FROM embeddings e JOIN c USING (label)
            ), x AS (
                SELECT vec_id, label,
                       CASE WHEN n >= 50
                            THEN CASE WHEN rk <= 50 THEN 1 ELSE 0 END
                            ELSE (50 // n) + CASE WHEN rk <= 50 % n
                                                  THEN 1 ELSE 0 END
                       END AS copies
                FROM r
            )
            SELECT vec_id, label, unnest(range(0, copies))::INTEGER AS copy
            FROM x WHERE copies > 0
        """,
        "pagerank": """
            WITH fwd AS (
                SELECT DISTINCT l_suppkey AS src,
                       l_partkey + 1000000 AS dst
                FROM lineitem
            ), e AS (
                SELECT src, dst FROM fwd
                UNION ALL
                SELECT dst, src FROM fwd
            ), nodes AS (
                SELECT DISTINCT src AS node FROM e
                UNION
                SELECT DISTINCT dst FROM e
            ), nn AS (
                SELECT count(*)::DOUBLE AS n FROM nodes
            ), od AS (
                SELECT src, count(*)::DOUBLE AS outdeg FROM e GROUP BY src
            ), r0 AS (
                SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes
            ), r1 AS (
                SELECT nodes.node,
                       (1.0 - 0.85) / (SELECT n FROM nn)
                       + 0.85 * coalesce(i.inflow, 0.0) AS rank
                FROM nodes LEFT JOIN (
                    SELECT e.dst AS node, sum(r0.rank / od.outdeg) AS inflow
                    FROM e JOIN r0 ON r0.node = e.src
                           JOIN od ON od.src = e.src
                    GROUP BY e.dst
                ) i USING (node)
            ), r2 AS (
                SELECT nodes.node,
                       (1.0 - 0.85) / (SELECT n FROM nn)
                       + 0.85 * coalesce(i.inflow, 0.0) AS rank
                FROM nodes LEFT JOIN (
                    SELECT e.dst AS node, sum(r1.rank / od.outdeg) AS inflow
                    FROM e JOIN r1 ON r1.node = e.src
                           JOIN od ON od.src = e.src
                    GROUP BY e.dst
                ) i USING (node)
            ), r3 AS (
                SELECT nodes.node,
                       (1.0 - 0.85) / (SELECT n FROM nn)
                       + 0.85 * coalesce(i.inflow, 0.0) AS rank
                FROM nodes LEFT JOIN (
                    SELECT e.dst AS node, sum(r2.rank / od.outdeg) AS inflow
                    FROM e JOIN r2 ON r2.node = e.src
                           JOIN od ON od.src = e.src
                    GROUP BY e.dst
                ) i USING (node)
            )
            SELECT node, round(rank, 8) AS rank FROM r3
        """,
        "entity_resolution": """
            WITH RECURSIVE recs AS (
                SELECT p_partkey AS rid, p_name AS name FROM part
                UNION ALL
                SELECT p_partkey + 1000000,
                       substr(p_name, 1, len(p_name) - 1) || 'x'
                FROM part WHERE p_partkey % 7 = 0
            ), keyed AS (
                SELECT rid, name, substr(name, 1, 6) AS bk FROM recs
            ), pairs AS (
                SELECT a.rid AS id_a, b.rid AS id_b
                FROM keyed a JOIN keyed b
                  ON a.bk = b.bk AND a.rid < b.rid
                WHERE round(1.0 - levenshtein(a.name, b.name)::DOUBLE
                        / greatest(len(a.name), len(b.name), 1), 6) >= 0.88
            ), sym AS (
                SELECT id_a AS u, id_b AS v FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs
            ), reach(node, r) AS (
                SELECT rid, rid FROM recs
                UNION
                SELECT reach.node, sym.v FROM reach JOIN sym ON sym.u = reach.r
            ), comp AS (
                SELECT node AS rid, min(r) AS entity_id FROM reach GROUP BY 1
            ), cs AS (
                SELECT entity_id, count(*) AS cluster_size FROM comp GROUP BY 1
            )
            SELECT c.rid, c.entity_id, s.cluster_size,
                   c.rid = c.entity_id AS is_canonical
            FROM comp c JOIN cs s USING (entity_id)
        """,
        "ngram_containment": f"""
            WITH tok AS (
                SELECT doc_id, {_TOK} AS t FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       unnest(list_distinct(list_transform(
                           generate_series(1, greatest(len(t) - 2, 0)),
                           i -> concat(t[i], ' ', t[i + 1], ' ', t[i + 2])))) AS s
                FROM tok
            ), sizes AS (
                SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
            ), inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   round(n_inter / sa.sz::DOUBLE, 6) AS containment_a_in_b,
                   round(n_inter / sb.sz::DOUBLE, 6) AS containment_b_in_a,
                   round(n_inter / (sa.sz + sb.sz - n_inter)::DOUBLE, 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE greatest(n_inter / sa.sz::DOUBLE,
                           n_inter / sb.sz::DOUBLE) >= 0.5
        """,
        "psi_drift": """
            WITH ho AS (
                SELECT least(greatest(floor((l_extendedprice::DOUBLE - 0.0)
                           / 5000.0), 0), 11)::BIGINT AS bin,
                       count(*) AS n_old
                FROM lineitem
                WHERE l_shipdate < '1995-06-01' AND l_extendedprice IS NOT NULL
                GROUP BY 1
            ), hn AS (
                SELECT least(greatest(floor((l_extendedprice::DOUBLE - 0.0)
                           / 5000.0), 0), 11)::BIGINT AS bin,
                       count(*) AS n_new
                FROM lineitem
                WHERE l_shipdate >= '1995-06-01' AND l_extendedprice IS NOT NULL
                GROUP BY 1
            ), j AS (
                SELECT coalesce(ho.bin, hn.bin) AS bin,
                       coalesce(n_old, 0) AS n_old,
                       coalesce(n_new, 0) AS n_new
                FROM ho FULL OUTER JOIN hn ON ho.bin = hn.bin
            ), t AS (
                SELECT sum(n_old)::DOUBLE AS t_old,
                       sum(n_new)::DOUBLE AS t_new
                FROM j
            ), c AS (
                SELECT bin, n_old, n_new,
                       (n_new / t.t_new - n_old / t.t_old)
                       * ln(greatest(n_new / t.t_new, 1e-6)
                            / greatest(n_old / t.t_old, 1e-6)) AS c
                FROM j CROSS JOIN t
            )
            SELECT round(sum(c), 6) AS psi,
                   sum(n_old)::BIGINT AS n_old,
                   sum(n_new)::BIGINT AS n_new,
                   (SELECT bin FROM c ORDER BY c DESC, bin LIMIT 1) AS top_bin,
                   (SELECT round(c, 6) FROM c ORDER BY c DESC, bin LIMIT 1)
                       AS top_contrib
            FROM c
        """,
        "cluster_terms": f"""
            WITH tok AS (
                SELECT source AS cluster, unnest({_TOK}) AS term
                FROM documents
            ), tf AS (
                SELECT cluster, term, count(*) AS tf
                FROM tok GROUP BY 1, 2
            ), dfreq AS (
                SELECT term, count(*) AS df FROM tok GROUP BY 1
            ), a AS (
                SELECT avg(n) AS A FROM (
                    SELECT cluster, count(*) AS n FROM tok GROUP BY 1
                )
            ), scored AS (
                SELECT tf.cluster, tf.term, tf.tf,
                       tf.tf * ln(1.0 + a.A / dfreq.df) AS raw
                FROM tf JOIN dfreq USING (term) CROSS JOIN a
            )
            SELECT cluster, term, tf, round(raw, 6) AS score,
                   rank::INTEGER AS rank
            FROM (
                SELECT *, row_number() OVER (PARTITION BY cluster
                           ORDER BY raw DESC, term) AS rank
                FROM scored
            ) WHERE rank <= 5
        """,
        "repetition_stats": f"""
            WITH tok AS (
                SELECT doc_id, {_TOK} AS t FROM documents
            ),
            grams AS (
                SELECT doc_id,
                       t AS g1,
                       list_transform(generate_series(1, greatest(len(t) - 1, 0)),
                                      i -> concat(t[i], ' ', t[i + 1])) AS g2,
                       list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                                      i -> concat(t[i], ' ', t[i + 1], ' ', t[i + 2])) AS g3
                FROM tok
            ),
            fr AS (
                SELECT doc_id,
                       round(list_max(list_prepend(0, list_transform(list_distinct(g1),
                             d -> len(list_filter(g1, x -> x = d)))))
                             / greatest(len(g1), 1), 6) AS top_1gram_frac,
                       round((len(g1) - len(list_distinct(g1)))::DOUBLE
                             / greatest(len(g1), 1), 6) AS dup_1gram_frac,
                       round(list_max(list_prepend(0, list_transform(list_distinct(g2),
                             d -> len(list_filter(g2, x -> x = d)))))
                             / greatest(len(g2), 1), 6) AS top_2gram_frac,
                       round((len(g2) - len(list_distinct(g2)))::DOUBLE
                             / greatest(len(g2), 1), 6) AS dup_2gram_frac,
                       round(list_max(list_prepend(0, list_transform(list_distinct(g3),
                             d -> len(list_filter(g3, x -> x = d)))))
                             / greatest(len(g3), 1), 6) AS top_3gram_frac,
                       round((len(g3) - len(list_distinct(g3)))::DOUBLE
                             / greatest(len(g3), 1), 6) AS dup_3gram_frac
                FROM grams
            )
            SELECT doc_id, top_1gram_frac, dup_1gram_frac,
                   top_2gram_frac, dup_2gram_frac,
                   top_3gram_frac, dup_3gram_frac,
                   (top_2gram_frac > 0.20 OR dup_3gram_frac > 0.30) AS is_repetitive
            FROM fr
        """,
        "decontamination": f"""
            WITH tok AS (
                SELECT doc_id, {_TOK} AS t FROM documents
            ),
            sh AS (
                SELECT doc_id, ('0x' || substr(md5(g), 1, 8))::BIGINT AS sh
                FROM (
                    SELECT doc_id,
                           unnest(list_distinct(list_transform(
                               generate_series(1, greatest(len(t) - 4, 0)),
                               i -> array_to_string(t[i:i+4], ' ')))) AS g
                    FROM tok
                )
            ),
            train AS (SELECT doc_id AS train_id, sh FROM sh WHERE doc_id % 17 <> 0),
            bench AS (SELECT doc_id AS bench_id, sh FROM sh WHERE doc_id % 17 = 0),
            bn AS (SELECT bench_id, count(*) AS bench_n FROM bench GROUP BY 1),
            hits AS (
                SELECT train_id, bench_id, count(*) AS n_shared
                FROM train JOIN bench USING (sh) GROUP BY 1, 2
            )
            SELECT train_id, bench_id, n_shared,
                   round(n_shared / greatest(bench_n, 1), 6) AS bench_frac
            FROM hits JOIN bn USING (bench_id)
        """,
        "data_mixture": f"""
            WITH alloc(source, a) AS (
                VALUES ('src1', 2400), ('src2', 1200), ('src3', 1200), ('src5', 1200)
            ),
            t AS (
                SELECT doc_id, source,
                       len({_TOK}) AS n_tokens,
                       ('0x' || substr(md5('mixture|' || doc_id), 1, 8))::BIGINT AS h
                FROM documents
                WHERE source IN (SELECT source FROM alloc)
            ),
            cum AS (
                SELECT doc_id, source, n_tokens,
                       sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                                           ROWS UNBOUNDED PRECEDING) - n_tokens
                           AS cum_before
                FROM t WHERE n_tokens > 0
            )
            SELECT c.doc_id, c.source, c.n_tokens::BIGINT AS n_tokens,
                   c.cum_before::BIGINT AS cum_before
            FROM cum c JOIN alloc USING (source)
            WHERE c.cum_before < alloc.a
        """,
        "doc_chunking": f"""
            WITH tok AS (
                SELECT doc_id, {_TOK} AS t FROM documents
            ),
            base AS (SELECT doc_id, t, len(t) AS n FROM tok WHERE len(t) > 0),
            w AS (
                SELECT doc_id, t,
                       unnest(generate_series(0,
                           cast(ceil(greatest(n - 32, 0) / 24.0) AS INTEGER))) AS i
                FROM base
            )
            SELECT doc_id,
                   i::BIGINT AS chunk_index,
                   (i * 24)::BIGINT AS start_token,
                   len(t[i*24+1 : i*24+32])::BIGINT AS n_tokens,
                   array_to_string(t[i*24+1 : i*24+32], ' ') AS chunk_text
            FROM w
        """,
        "span_dedup": f"""
            WITH info AS (
                SELECT doc_id, {_TOK} AS t FROM documents
            ),
            grams AS (
                SELECT doc_id,
                       unnest(generate_series(1, len(t) - 5)) AS pos,
                       unnest(list_transform(generate_series(1, len(t) - 5),
                           i -> ('0x' || substr(md5(array_to_string(t[i:i+5], ' ')), 1, 15))::BIGINT)) AS sh
                FROM info WHERE len(t) >= 6
            ),
            dup AS (
                SELECT sh FROM (
                    SELECT sh, count(DISTINCT doc_id) AS c FROM grams GROUP BY 1
                ) WHERE c >= 2
            ),
            hits AS (
                SELECT doc_id,
                       least(6, coalesce(pos - lag(pos) OVER (
                           PARTITION BY doc_id ORDER BY pos), 6)) AS covered
                FROM grams WHERE sh IN (SELECT sh FROM dup)
            ),
            cov AS (
                SELECT doc_id, count(*) AS n_dup_windows,
                       sum(covered)::BIGINT AS dup_tokens
                FROM hits GROUP BY 1
            )
            SELECT i.doc_id,
                   len(i.t)::BIGINT AS n_tokens,
                   coalesce(c.n_dup_windows, 0)::BIGINT AS n_dup_windows,
                   coalesce(c.dup_tokens, 0)::BIGINT AS dup_tokens,
                   coalesce(round(coalesce(c.dup_tokens, 0)::DOUBLE
                        / nullif(len(i.t), 0), 6), 0.0) AS dup_fraction
            FROM info i LEFT JOIN cov c USING (doc_id)
        """,
        "kmeans_clusters": _kmeans_oracle_sql(k=4, iters=3),
        "quality_classifier": _logreg_oracle_sql(iters=10, lr=1.0),
        "sketch_rollup": """
            SELECT l_returnflag AS scope,
                   count(DISTINCT l_orderkey)::DOUBLE AS exact_distinct,
                   TRUE AS hll_within_bound,
                   TRUE AS kll_rank_within_bound
            FROM lineitem GROUP BY 1
            UNION ALL
            SELECT 'merged', count(DISTINCT l_orderkey)::DOUBLE, TRUE, TRUE
            FROM lineitem
        """,
        "curation_report": f"""
            WITH corpus AS (
                SELECT doc_id, text FROM documents WHERE doc_id % 17 <> 0
            ),
            tok AS (SELECT doc_id, text, {_TOK} AS toks FROM corpus),
            q AS (
                SELECT doc_id,
                       round(least(len(toks) / 50.0, 1.0) * 0.4
                             + CASE WHEN list_sum(list_transform(toks, x -> length(x)))
                                         / greatest(len(toks), 1) BETWEEN 3 AND 10
                                    THEN 0.3 ELSE 0.0 END
                             + least(len(list_filter(toks, x -> x IN ('the','and','of',
                                   'to','in','is','that','for','with','as')))
                                   / cast(greatest(len(toks), 1) AS DOUBLE) * 3, 0.3),
                             6) >= 0.5 AS passed_quality
                FROM tok
            ),
            grams AS (
                SELECT doc_id,
                       list_transform(generate_series(1, greatest(len(toks) - 1, 0)),
                                      i -> concat(toks[i], ' ', toks[i + 1])) AS g2,
                       list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
                                      i -> concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2])) AS g3
                FROM tok
            ),
            rep AS (
                SELECT doc_id,
                       NOT (round(list_max(list_prepend(0, list_transform(list_distinct(g2),
                                  d -> len(list_filter(g2, x -> x = d)))))
                                  / greatest(len(g2), 1), 6) > 0.20
                            OR round((len(g3) - len(list_distinct(g3)))::DOUBLE
                                  / greatest(len(g3), 1), 6) > 0.30) AS passed_repetition
                FROM grams
            ),
            sh5 AS (
                SELECT doc_id, ('0x' || substr(md5(g), 1, 8))::BIGINT AS sh
                FROM (
                    SELECT doc_id,
                           unnest(list_distinct(list_transform(
                               generate_series(1, greatest(len({_TOK}) - 4, 0)),
                               i -> array_to_string(({_TOK})[i:i+4], ' ')))) AS g
                    FROM documents
                )
            ),
            contaminated AS (
                SELECT DISTINCT t.doc_id
                FROM sh5 t JOIN sh5 b ON t.sh = b.sh
                WHERE t.doc_id % 17 <> 0 AND b.doc_id % 17 = 0
            ),
            flags AS (
                SELECT tok.doc_id, tok.text, q.passed_quality, rep.passed_repetition,
                       tok.doc_id NOT IN (SELECT doc_id FROM contaminated) AS not_contaminated
                FROM tok JOIN q USING (doc_id) JOIN rep USING (doc_id)
            ),
            surv AS (
                SELECT doc_id, text FROM flags
                WHERE passed_quality AND passed_repetition AND not_contaminated
            ),
            canon AS (
                SELECT doc_id,
                       doc_id = min(doc_id) OVER (PARTITION BY text) AS is_canonical
                FROM surv
            ),
            cd AS (
                SELECT s.doc_id, s.text FROM surv s JOIN canon c USING (doc_id)
                WHERE c.is_canonical
            ),
            shu AS (
                SELECT DISTINCT doc_id,
                       unnest(list_distinct(list_transform(
                           generate_series(1, greatest(len({_TOK}) - 2, 0)),
                           i -> array_to_string(({_TOK})[i:i+2], ' ')))) AS s
                FROM cd
            ),
            sizes AS (SELECT doc_id, count(*) AS sz FROM shu GROUP BY 1),
            inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
                FROM shu a JOIN shu b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            neardup AS (
                SELECT DISTINCT i.id_b AS doc_id
                FROM inter i JOIN sizes sa ON i.id_a = sa.doc_id
                             JOIN sizes sb ON i.id_b = sb.doc_id
                WHERE i.n_inter / cast(sa.sz + sb.sz - i.n_inter AS DOUBLE) >= 0.5
            )
            SELECT f.doc_id, f.passed_quality, f.passed_repetition, f.not_contaminated,
                   coalesce(c.is_canonical, FALSE) AS is_canonical,
                   (coalesce(c.is_canonical, FALSE)
                    AND f.doc_id NOT IN (SELECT doc_id FROM neardup)) AS selected
            FROM flags f LEFT JOIN canon c USING (doc_id)
        """,
        "embedding_quantize": """
            WITH ex AS (
                SELECT vec_id,
                       unnest(generate_series(1, len(embedding))) AS i,
                       unnest(embedding)::DOUBLE AS x
                FROM embeddings
            ),
            rng AS (
                SELECT i, min(x) AS lo, max(x) AS hi FROM ex GROUP BY 1
            ),
            codes AS (
                SELECT e.vec_id,
                       CASE WHEN r.hi > r.lo
                            THEN floor((e.x - r.lo) / ((r.hi - r.lo) / 254.0)
                                       + 0.5)::BIGINT - 127
                            ELSE 0 END AS code
                FROM ex e JOIN rng r USING (i)
            )
            SELECT vec_id, count(*)::BIGINT AS n_dims,
                   sum(code)::BIGINT AS code_sum,
                   min(code)::BIGINT AS code_min,
                   max(code)::BIGINT AS code_max
            FROM codes GROUP BY 1
        """,
        "lm_score": f"""
            WITH tok AS (
                SELECT doc_id, unnest({_TOK}) AS term FROM documents
            ),
            counts AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
            totals AS (SELECT sum(cnt) AS total, count(*) AS vocab FROM counts)
            SELECT t.doc_id,
                   count(*)::BIGINT AS n_tokens,
                   round(avg(-ln((c.cnt + 1.0) / (tt.total + tt.vocab))), 6)
                       AS avg_nll,
                   round(exp(avg(-ln((c.cnt + 1.0) / (tt.total + tt.vocab)))), 4)
                       AS ppl
            FROM tok t JOIN counts c USING (term) CROSS JOIN totals tt
            GROUP BY 1
        """,
        "triangle_stats": _tri_oracle_sql(False),
        "triangle_sample": _tri_oracle_sql(True),
        "lpa_communities": _lpa_oracle_sql(3),
        "k_core": _kcore_oracle_sql(16, 3),
        "k_truss": _ktruss_oracle_sql(6, 2),
        "random_walks": _walks_oracle_sql(3, 2),
        "bigram_perplexity": f"""
            WITH tok AS (
                SELECT doc_id, unnest(t) AS term,
                       generate_subscripts(t, 1) AS pos
                FROM (SELECT doc_id, {_TOK} AS t FROM documents)
            ),
            vc AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
            keep AS (
                SELECT term FROM (
                    SELECT term,
                           row_number() OVER (ORDER BY cnt DESC, term) AS rn
                    FROM vc
                ) WHERE rn <= 20
            ),
            m AS (
                SELECT t.doc_id, t.pos,
                       CASE WHEN k.term IS NULL THEN '<unk>' ELSE t.term END
                           AS term
                FROM tok t LEFT JOIN keep k USING (term)
            ),
            big AS (
                SELECT doc_id, w1, w2 FROM (
                    SELECT doc_id, term AS w1,
                           lead(term) OVER (PARTITION BY doc_id ORDER BY pos)
                               AS w2
                    FROM m
                ) WHERE w2 IS NOT NULL
            ),
            c12 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
            c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
            vev AS (SELECT count(DISTINCT w2) AS vev FROM big)
            SELECT b.doc_id,
                   count(*)::BIGINT AS n_bigrams,
                   round(avg(-ln((c12.c12 + 0.5) / (c1.c1 + 0.5 * vev.vev))), 6)
                       AS avg_nll,
                   round(exp(avg(-ln((c12.c12 + 0.5)
                                     / (c1.c1 + 0.5 * vev.vev)))), 4) AS ppl
            FROM big b JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
            CROSS JOIN vev
            GROUP BY 1
        """,
        "dsir_weights": f"""
            WITH d AS (SELECT doc_id, {_TOK} AS t FROM documents),
            g AS (
                SELECT doc_id, unnest(list_concat(
                    t,
                    list_transform(
                        generate_series(1, greatest(len(t) - 1, 0)),
                        i -> array_to_string(t[i:i+1], ' '))
                )) AS gram
                FROM d
            ),
            b AS (
                SELECT doc_id,
                       ('0x' || substr(md5('dsir' || gram), 1, 15))::BIGINT
                           % 512 AS bucket
                FROM g
            ),
            tb AS (
                SELECT b.bucket FROM b
                JOIN documents USING (doc_id) WHERE lang = 'en'
            ),
            rc AS (SELECT bucket, count(*) AS rc FROM b GROUP BY 1),
            tc AS (SELECT bucket, count(*) AS tc FROM tb GROUP BY 1),
            model AS (
                SELECT bucket, coalesce(rc, 0) AS rc, coalesce(tc, 0) AS tc
                FROM rc FULL JOIN tc USING (bucket)
            ),
            tot AS (SELECT sum(rc) AS rt, sum(tc) AS tt FROM model),
            lr AS (
                SELECT bucket,
                       ln((tc + 0.5) / (tt + 0.5 * 512))
                       - ln((rc + 0.5) / (rt + 0.5 * 512)) AS lr
                FROM model CROSS JOIN tot
            )
            SELECT b.doc_id,
                   count(*)::BIGINT AS n_feats,
                   round(sum(lr.lr), 6) AS log_weight,
                   round(avg(lr.lr), 6) AS avg_log_weight
            FROM b JOIN lr USING (bucket)
            GROUP BY 1
        """,
        "events_json_extract": """
            SELECT event_type,
                   count(cast(props->>'k' AS BIGINT)) AS n_with_k,
                   cast(sum(cast(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
                   min(cast(props->>'k' AS BIGINT)) AS min_k,
                   max(cast(props->>'k' AS BIGINT)) AS max_k
            FROM events GROUP BY 1
        """,
        "window_ntile": """
            SELECT quartile, count(*) AS n, round(sum(o_totalprice), 2) AS total
            FROM (
                SELECT cast(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey)
                            AS INTEGER) AS quartile,
                       o_totalprice
                FROM orders
            ) GROUP BY 1
        """,
        "ntile_distributed": """
            SELECT o_orderkey,
                   ntile(7) OVER (ORDER BY o_totalprice, o_orderkey) AS tile
            FROM orders
        """,
        "filter_like": """
            SELECT p_partkey AS _part_id, p_name, p_type, p_size
            FROM part WHERE p_type LIKE 'S%' AND p_size >= 10
        """,
        "pivot_status": """
            SELECT o_orderpriority,
                   count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
                   count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
                   count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
            FROM orders GROUP BY 1
        """,
        "regexp_extract": """
            SELECT c_custkey,
                   cast(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS name_num,
                   cast(length(c_name) AS BIGINT) AS name_len,
                   upper(substr(c_name, 1, 8)) AS prefix_upper
            FROM customer
        """,
        "sessionization": """
            WITH e AS (
                SELECT user_id, ts,
                       CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w IS NULL
                              OR epoch(ts) - lag(epoch(ts)) OVER w > 1800
                            THEN 1 ELSE 0 END AS is_new
                FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), s AS (
                SELECT user_id, ts,
                       sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
                FROM e
            )
            SELECT user_id, cast(session_id AS BIGINT) AS session_id,
                   min(ts) AS session_start, max(ts) AS session_end,
                   count(*) AS n_events
            FROM s GROUP BY 1, 2
        """,
        "dedup_exact": """
            SELECT md5(text) AS content_hash,
                   min(doc_id) AS canonical_id,
                   count(*) AS n_copies,
                   array_to_string(list_sort(list(doc_id)), '|') AS member_ids
            FROM documents GROUP BY 1
        """,
        "winnow_fingerprint": """
            WITH tokd AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                                   x -> x <> '') AS t
                FROM documents
            ), grams AS (
                SELECT doc_id,
                       list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                                      i -> array_to_string(t[i:i+2], ' ')) AS g
                FROM tokd
            ), hashes AS (
                SELECT doc_id,
                       list_transform(g, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS h
                FROM grams
            )
            SELECT doc_id,
                   array_to_string(list_sort(list_distinct(list_transform(
                       generate_series(1, greatest(len(h) - 3, 0)),
                       i -> list_min(h[i:i+3])))), '|') AS fingerprints
            FROM hashes
        """,
        "text_stats": f"""
            WITH t AS (
                SELECT doc_id, text, {_TOK} AS toks FROM documents
            ), s AS (
                SELECT doc_id, text, toks,
                       length(text) AS n_chars,
                       len(toks) AS n_tokens,
                       len(regexp_extract_all(text,
                           '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]')) AS n_tokens_bpe,
                       list_sum(list_transform(toks, x -> length(x)))
                           / greatest(len(toks), 1) AS avg_tok,
                       len(list_filter(toks, x -> x IN ('the','and','of','to','in',
                           'is','that','for','with','as')))
                           / cast(greatest(len(toks), 1) AS DOUBLE) AS stop_ratio,
                       length(regexp_replace(text, '[^A-Z]', '', 'g'))
                           / cast(greatest(length(text), 1) AS DOUBLE) AS upper_ratio,
                       length(regexp_replace(text, '[^0-9]', '', 'g'))
                           / cast(greatest(length(text), 1) AS DOUBLE) AS digit_ratio,
                       len(list_intersect(toks, ['the','and','of','to','in','is',
                           'that','for','with','as'])) AS sc_en,
                       len(list_intersect(toks, ['el','la','de','que','y','en',
                           'los','del','las','por'])) AS sc_es,
                       len(list_intersect(toks, ['le','la','de','et','les','des',
                           'en','un','du','une'])) AS sc_fr,
                       len(list_intersect(toks, ['der','die','und','das','von',
                           'den','mit','für','auf','ist'])) AS sc_de
                FROM t
            )
            SELECT doc_id, n_chars, n_tokens, n_tokens_bpe,
                   round(cast(avg_tok AS DOUBLE), 6) AS avg_token_len,
                   round(stop_ratio, 6) AS stopword_ratio,
                   round(upper_ratio, 6) AS upper_ratio,
                   round(digit_ratio, 6) AS digit_ratio,
                   round(least(n_tokens / 50.0, 1.0) * 0.4
                         + CASE WHEN avg_tok >= 3 AND avg_tok <= 10 THEN 0.3 ELSE 0.0 END
                         + least(stop_ratio * 3, 0.3), 6) AS quality_score,
                   CASE WHEN greatest(sc_en, sc_es, sc_fr, sc_de) = 0 THEN 'und'
                        WHEN sc_de = greatest(sc_en, sc_es, sc_fr, sc_de) THEN 'de'
                        WHEN sc_en = greatest(sc_en, sc_es, sc_fr, sc_de) THEN 'en'
                        WHEN sc_es = greatest(sc_en, sc_es, sc_fr, sc_de) THEN 'es'
                        ELSE 'fr' END AS lang_pred,
                   md5(trim(regexp_replace(regexp_replace(lower(text),
                       '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS fingerprint
            FROM s
        """,
        "ngram_jaccard": f"""
            WITH sh AS (
                SELECT DISTINCT doc_id, unnest(list_distinct({_TOK})) AS s
                FROM documents
            ), sizes AS (
                SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
            ), inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   round(n_inter / cast(sa.sz + sb.sz - n_inter AS DOUBLE), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE n_inter / cast(sa.sz + sb.sz - n_inter AS DOUBLE) >= 0.8
        """,
        "ann_cosine_topk": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
            scored AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       list_dot_product(q.qv, e.v)
                         / (sqrt(list_dot_product(q.qv, q.qv))
                            * sqrt(list_dot_product(e.v, e.v))) AS cos_raw
                FROM q, e WHERE e.vec_id <> q.query_id
            )
            SELECT query_id, neighbor_id,
                   cast(rn AS INTEGER) AS rank, round(cos_raw, 6) AS cosine
            FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_raw DESC, neighbor_id) AS rn
                FROM scored
            ) WHERE rn <= 10
        """,
        "embedding_near_dup_exact": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            p AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       list_dot_product(a.v, b.v)
                         / (sqrt(list_dot_product(a.v, a.v))
                            * sqrt(list_dot_product(b.v, b.v))) AS cos_raw
                FROM e a JOIN e b ON a.vec_id < b.vec_id
            )
            SELECT id_a, id_b, round(cos_raw, 6) AS cosine
            FROM p WHERE cos_raw >= 0.3
        """,
        "line_dedup": """
            WITH d AS (
                SELECT doc_id,
                       regexp_replace(text, '((\\S+ ){3}\\S+) ',
                                      '\\1' || chr(10), 'g') AS text
                FROM documents
            ), split AS (
                -- NULL text normalizes to '' (doc preserved), matching
                -- dedup_lines' coalesce contract
                SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS ls
                FROM d
            ), l AS (
                SELECT doc_id, i AS pos, ls[i] AS line
                FROM split, unnest(range(1, len(ls) + 1)) AS g(i)
            ), s AS (
                SELECT line, min(doc_id) AS keeper
                FROM l WHERE length(line) >= 5
                GROUP BY line HAVING count(DISTINCT doc_id) >= 2
            ), k AS (
                SELECT l.doc_id, l.pos, l.line,
                       (s.line IS NULL OR l.doc_id = s.keeper) AS keep
                FROM l LEFT JOIN s USING (line)
            )
            SELECT doc_id,
                   md5(coalesce(string_agg(CASE WHEN keep THEN line END,
                       chr(10) ORDER BY pos), '')) AS text_md5,
                   count(*)::BIGINT AS n_lines,
                   sum(CASE WHEN keep THEN 0 ELSE 1 END)::BIGINT
                       AS n_lines_removed
            FROM k GROUP BY doc_id
        """,
        "pq_search": """
            WITH e AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings
            ), q AS (
                SELECT v AS qv FROM e WHERE vec_id = 0
            ), enc AS (
                SELECT vec_id,
                    list_transform(range(0, 8), s ->
                        list_position(
                            list_transform(range(0, 16), j ->
                                list_sum(list_transform(range(0, 8), i ->
                                    (v[s*8 + i + 1]
                                     - ((s*13 + j*31 + i*7) % 11 - 5))
                                    * (v[s*8 + i + 1]
                                       - ((s*13 + j*31 + i*7) % 11 - 5))))),
                            list_min(
                                list_transform(range(0, 16), j ->
                                    list_sum(list_transform(range(0, 8), i ->
                                        (v[s*8 + i + 1]
                                         - ((s*13 + j*31 + i*7) % 11 - 5))
                                        * (v[s*8 + i + 1]
                                           - ((s*13 + j*31 + i*7) % 11 - 5))))))
                        ) - 1) AS codes
                FROM e
            ), tab AS (
                SELECT list_transform(range(0, 8), s ->
                    list_transform(range(0, 16), j ->
                        list_sum(list_transform(range(0, 8), i ->
                            (qv[s*8 + i + 1] - ((s*13 + j*31 + i*7) % 11 - 5))
                            * (qv[s*8 + i + 1]
                               - ((s*13 + j*31 + i*7) % 11 - 5)))))) AS t
                FROM q
            )
            SELECT vec_id,
                   round(list_sum(list_transform(range(0, 8),
                       s -> t[s + 1][codes[s + 1] + 1])), 6) AS approx_sq_dist
            FROM enc, tab
            ORDER BY list_sum(list_transform(range(0, 8),
                       s -> t[s + 1][codes[s + 1] + 1])) ASC, vec_id ASC
            LIMIT 10
        """,
        "product_quantize": """
            WITH e AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings
            ), d AS (
                SELECT vec_id,
                    list_transform(range(0, 8), s ->
                        list_transform(range(0, 16), j ->
                            list_sum(list_transform(range(0, 8), i ->
                                (v[s*8 + i + 1]
                                 - ((s*13 + j*31 + i*7) % 11 - 5))
                                * (v[s*8 + i + 1]
                                   - ((s*13 + j*31 + i*7) % 11 - 5)))))) AS dmat
                FROM e
            )
            SELECT vec_id,
                   array_to_string(list_transform(dmat,
                       dd -> list_position(dd, list_min(dd)) - 1), '-') AS codes_str,
                   round(list_sum(list_transform(dmat, dd -> list_min(dd))), 6)
                       AS sq_error
            FROM d
        """,
        "video_frames": """
            SELECT doc_id,
                   cast(i AS INTEGER) AS frame_idx,
                   cast(i * 100 AS BIGINT) AS ts_ms,
                   32 AS width, 24 AS height,
                   cast(61 AS BIGINT) AS frame_bytes
            FROM (SELECT doc_id, doc_id % 5 + 2 AS n_frames
                  FROM documents WHERE doc_id % 4 = 0),
                 unnest(range(0, n_frames)) AS u(i)
            WHERE i % 2 = 0
        """,
        "multimodal_decode": """
            WITH dims AS (
                SELECT doc_id,
                       doc_id % 13 + 1 AS w,
                       doc_id % 7 + 1 AS h,
                       doc_id % 50 + 10 AS n_samp,
                       doc_id % 5 + 2 AS n_frames
                FROM documents
            )
            SELECT doc_id,
                   CASE WHEN doc_id % 4 = 0 THEN 'video'
                        WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
                   CASE WHEN doc_id % 4 = 0 THEN 32
                        WHEN doc_id % 2 = 0 THEN cast(w AS INTEGER) END AS width,
                   CASE WHEN doc_id % 4 = 0 THEN 24
                        WHEN doc_id % 2 = 0 THEN cast(h AS INTEGER) END AS height,
                   -- AVI: fixed 224-byte container + 70 bytes/frame
                   -- (8-byte chunk header + 61-byte JPEG + 1 pad)
                   CASE WHEN doc_id % 4 = 0
                        THEN cast(224 + 70 * n_frames AS BIGINT)
                        WHEN doc_id % 2 = 0
                        THEN cast(54 + ((3*w + 3) // 4 * 4) * h AS BIGINT)
                        ELSE cast(44 + 2 * n_samp AS BIGINT) END AS n_bytes,
                   CASE WHEN doc_id % 2 = 1 THEN 8000 END AS sample_rate,
                   CASE WHEN doc_id % 4 = 0
                        THEN cast(n_frames * 100 AS BIGINT)
                        WHEN doc_id % 2 = 1
                        THEN cast(n_samp * 1000 // 8000 AS BIGINT) END AS duration_ms,
                   CASE WHEN doc_id % 4 = 0 THEN NULL
                        WHEN doc_id % 2 = 0
                        THEN round(list_sum(list_transform(range(0, 3*w*h),
                                 i -> (doc_id*31 + i) % 256))
                             / cast(3*w*h AS DOUBLE), 6)
                        ELSE round(sqrt(list_sum(list_transform(range(0, n_samp),
                                 i -> cast(((doc_id*7 + i*13) % 1024 - 512)
                                      * ((doc_id*7 + i*13) % 1024 - 512) AS DOUBLE)))
                             / n_samp), 6) END AS value_mean
            FROM dims
        """,
        "corpus_curation": f"""
            WITH t AS (
                SELECT doc_id, text, {_TOK} AS toks FROM documents
            ), stats AS (
                SELECT doc_id, text,
                       len(toks) AS n_tokens,
                       list_sum(list_transform(toks, x -> length(x)))
                           / greatest(len(toks), 1) AS avg_tok,
                       len(list_filter(toks, x -> x IN ('the','and','of','to','in',
                           'is','that','for','with','as')))
                           / cast(greatest(len(toks), 1) AS DOUBLE) AS stop_ratio,
                       len(list_intersect(toks, ['the','and','of','to','in','is',
                           'that','for','with','as'])) AS sc_en,
                       len(list_intersect(toks, ['el','la','de','que','y','en',
                           'los','del','las','por'])) AS sc_es,
                       len(list_intersect(toks, ['le','la','de','et','les','des',
                           'en','un','du','une'])) AS sc_fr,
                       len(list_intersect(toks, ['der','die','und','das','von',
                           'den','mit','für','auf','ist'])) AS sc_de
                FROM t
            ), scored AS (
                SELECT doc_id, text, cast(n_tokens AS BIGINT) AS n_tokens,
                       round(least(n_tokens / 50.0, 1.0) * 0.4
                         + CASE WHEN avg_tok >= 3 AND avg_tok <= 10 THEN 0.3 ELSE 0.0 END
                         + least(stop_ratio * 3, 0.3), 6) AS quality_score,
                       CASE WHEN greatest(sc_en, sc_es, sc_fr, sc_de) = 0 THEN 'und'
                            WHEN sc_de = greatest(sc_en, sc_es, sc_fr, sc_de) THEN 'de'
                            WHEN sc_en = greatest(sc_en, sc_es, sc_fr, sc_de) THEN 'en'
                            WHEN sc_es = greatest(sc_en, sc_es, sc_fr, sc_de) THEN 'es'
                            ELSE 'fr' END AS lang_pred
                FROM stats
            ), quality AS (
                SELECT * FROM scored WHERE quality_score >= 0.5
            ), canon AS (
                SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(text)
            ), surv AS (
                SELECT q.* FROM quality q JOIN canon USING (doc_id)
            ), sh AS (
                SELECT DISTINCT doc_id, unnest(list_distinct({_TOK})) AS s
                FROM surv AS documents
            ), sizes AS (
                SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
            ), pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ni
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ), dropped AS (
                SELECT DISTINCT id_b AS doc_id
                FROM pairs JOIN sizes sa ON sa.doc_id = id_a
                           JOIN sizes sb ON sb.doc_id = id_b
                WHERE ni / cast(sa.sz + sb.sz - ni AS DOUBLE) >= 0.8
            )
            SELECT s.doc_id, s.n_tokens, s.lang_pred, s.quality_score,
                   (e.vec_id IS NOT NULL) AS has_embedding
            FROM surv s
            LEFT JOIN (SELECT DISTINCT vec_id FROM embeddings) e
                   ON e.vec_id = s.doc_id
            WHERE s.doc_id NOT IN (SELECT doc_id FROM dropped)
        """,
        "minhash_lsh": _minhash_oracle(),
        "simhash": f"""
            WITH tok AS (
                SELECT doc_id, list_distinct({_TOK}) AS tk FROM documents
            ), th AS (
                SELECT doc_id,
                       ('0x' || substr(md5(unnest(tk)), 1, 15))::BIGINT AS h
                FROM tok
            ), bitsum AS (
                SELECT doc_id, b,
                       sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
                FROM th, (SELECT unnest(generate_series(0, 59)) AS b)
                GROUP BY 1, 2
            ), sh AS (
                SELECT doc_id,
                       cast(sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END)
                            AS BIGINT) AS simhash
                FROM bitsum GROUP BY 1
            ), chunks AS (
                SELECT doc_id, simhash, cb,
                       (simhash >> (cb * 15)) & 32767 AS cv
                FROM sh, (SELECT unnest(generate_series(0, 3)) AS cb)
            ), cand AS (
                SELECT DISTINCT a.doc_id AS id_a, a.simhash AS sa,
                                b.doc_id AS id_b, b.simhash AS sb
                FROM chunks a JOIN chunks b
                  ON a.cb = b.cb AND a.cv = b.cv AND a.doc_id < b.doc_id
            )
            SELECT id_a, id_b,
                   cast(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
            FROM cand WHERE bit_count(xor(sa, sb)) <= 3
        """,
        "sketch_report": """
            SELECT 'exact_rowcount' AS metric,
                   count(*)::DOUBLE AS exact_value,
                   TRUE AS within_bound
            FROM lineitem
            UNION ALL
            SELECT 'hll_distinct_orderkeys',
                   count(DISTINCT l_orderkey)::DOUBLE,
                   TRUE
            FROM lineitem
            UNION ALL
            SELECT 'kll_median_rank', 0.5, TRUE
        """,
        # ann_lsh_topk / ann_ivf_topk / embedding_near_dup /
        # streaming_events_window are approximate (engine-specific hash or
        # sampling choices) or non-SQL-expressible → rows-only checks.
        "hybrid_retrieval": f"""
            WITH tok AS (
                SELECT doc_id, unnest({_TOK}) AS term FROM documents
            ), doclen AS (
                SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1
            ), stats AS (
                SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doclen
            ), tf AS (
                SELECT doc_id, term, count(*) AS tf FROM tok
                WHERE term IN ('join', 'spark', 'dup') GROUP BY 1, 2
            ), dfs AS (
                SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1
            ), bm AS (
                SELECT tf.doc_id,
                       round(sum(
                           ln(1.0 + (s.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
                           * (tf.tf * 2.2)
                           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
                       ), 6) AS bm25
                FROM tf
                JOIN dfs USING (term)
                JOIN doclen dl USING (doc_id)
                CROSS JOIN stats s
                GROUP BY 1
            ), bmr AS (
                SELECT doc_id, row_number() OVER (
                    ORDER BY bm25 DESC, doc_id ASC) AS r
                FROM bm QUALIFY r <= 30
            ), q AS (
                SELECT embedding::DOUBLE[] AS qv FROM embeddings
                WHERE vec_id = 0
            ), den AS (
                SELECT vec_id AS doc_id,
                       round(list_dot_product(v, qv)
                           / (sqrt(list_dot_product(v, v))
                              * sqrt(list_dot_product(qv, qv))), 6) AS cos
                FROM (SELECT vec_id, embedding::DOUBLE[] AS v
                      FROM embeddings WHERE vec_id <> 0)
                CROSS JOIN q
            ), denr AS (
                SELECT doc_id, row_number() OVER (
                    ORDER BY cos DESC, doc_id ASC) AS r
                FROM den QUALIFY r <= 30
            )
            SELECT coalesce(b.doc_id, d.doc_id) AS doc_id,
                   round(coalesce(1.0 / (60 + b.r), 0)
                       + coalesce(1.0 / (60 + d.r), 0), 6) AS rrf_score,
                   b.r AS bm25_rank, d.r AS dense_rank
            FROM bmr b FULL OUTER JOIN denr d ON b.doc_id = d.doc_id
            ORDER BY rrf_score DESC, doc_id ASC LIMIT 20
        """,
        "semantic_dedup": """
            WITH cent AS (
                SELECT c, list_transform(range(0, 64),
                    i -> CAST((c*31 + i*7) % 11 - 5 AS DOUBLE)) AS cv
                FROM (SELECT unnest(range(0, 8)) AS c)
            ), e AS (
                SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ), scored AS (
                SELECT vec_id, v, c,
                       list_dot_product(v, cv)
                           / sqrt(list_dot_product(cv, cv)) AS s
                FROM e CROSS JOIN cent
            ), a AS (
                SELECT vec_id, v, c AS cluster FROM (
                    SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY s DESC, c) AS rn
                    FROM scored) WHERE rn = 1
            ), pairs AS (
                SELECT x.vec_id AS id_a, y.vec_id AS id_b
                FROM a x JOIN a y
                  ON x.cluster = y.cluster AND x.vec_id < y.vec_id
                WHERE list_dot_product(x.v, y.v)
                      / (sqrt(list_dot_product(x.v, x.v))
                         * sqrt(list_dot_product(y.v, y.v))) >= 0.4
            ), cs AS (
                SELECT cluster, count(*) AS cluster_size FROM a GROUP BY 1
            ), nd AS (
                SELECT vec_id, count(*) AS n FROM (
                    SELECT id_a AS vec_id FROM pairs
                    UNION ALL SELECT id_b FROM pairs) GROUP BY 1
            )
            SELECT a.vec_id, a.cluster, cs.cluster_size,
                   coalesce(nd.n, 0) AS n_near_dups,
                   a.vec_id NOT IN (SELECT id_b FROM pairs) AS is_kept
            FROM a JOIN cs USING (cluster) LEFT JOIN nd USING (vec_id)
        """,
        # -- TPC-H shape completion (tube_spark/queries/tpch.py) --
        "forecast_revenue": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        """,
        "volume_shipping": """
            SELECT supp_nation, cust_nation, l_year,
                   round(sum(volume), 2) AS revenue
            FROM (
                SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                       year(l_shipdate) AS l_year,
                       l_extendedprice * (1 - l_discount) AS volume
                FROM lineitem
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders ON o_orderkey = l_orderkey
                JOIN customer ON c_custkey = o_custkey
                JOIN nation n1 ON s_nationkey = n1.n_nationkey
                JOIN nation n2 ON c_nationkey = n2.n_nationkey
                WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
                    OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
                  AND l_shipdate BETWEEN '1996-01-01' AND '1997-12-31 23:59:59'
            ) GROUP BY 1, 2, 3
        """,
        "market_share": """
            SELECT o_year,
                   round(sum(CASE WHEN nation = 'NATION_15' THEN volume
                                  ELSE 0 END) / sum(volume), 6) AS mkt_share
            FROM (
                SELECT year(o_orderdate) AS o_year,
                       l_extendedprice * (1 - l_discount) AS volume,
                       n1.n_name AS nation
                FROM lineitem
                JOIN part ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n2 ON c_nationkey = n2.n_nationkey
                JOIN region ON n2.n_regionkey = r_regionkey
                JOIN nation n1 ON s_nationkey = n1.n_nationkey
                WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
            ) GROUP BY 1
        """,
        "product_profit": """
            SELECT nation, o_year, round(sum(amount), 2)::DOUBLE AS profit
            FROM (
                SELECT n_name AS nation, year(o_orderdate) AS o_year,
                       l_extendedprice::DECIMAL(18,2)
                           * (1 - l_discount::DECIMAL(18,2))
                         - p_retailprice::DECIMAL(18,2)
                           * l_quantity::DECIMAL(18,2) / 2 AS amount
                FROM lineitem
                JOIN part ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders ON o_orderkey = l_orderkey
                JOIN nation ON s_nationkey = n_nationkey
                WHERE p_name LIKE '%widget%'
            ) GROUP BY 1, 2
        """,
        "cheapest_supplier": """
            WITH costs AS (
                SELECT l_partkey, s_suppkey, s_name,
                       min(l_extendedprice / l_quantity) AS unit_cost
                FROM lineitem
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
                WHERE r_name = 'EUROPE'
                GROUP BY 1, 2, 3
            ), r AS (
                SELECT *, row_number() OVER (PARTITION BY l_partkey
                    ORDER BY unit_cost, s_suppkey) AS rn
                FROM costs
            )
            SELECT p_partkey, p_name, s_name AS supplier,
                   round(unit_cost, 6) AS unit_cost
            FROM r JOIN part ON p_partkey = l_partkey WHERE rn = 1
        """,
        "important_nation_volume": """
            WITH v AS (
                SELECT n_name, sum(l_extendedprice * l_quantity) AS val
                FROM lineitem
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                GROUP BY 1
            ), tot AS (SELECT sum(val) AS t FROM v)
            SELECT n_name, round(val, 2) AS value
            FROM v, tot WHERE val > 0.04 * t
        """,
        "top_supplier": """
            WITH rev AS (
                SELECT s_suppkey, s_name,
                       round(sum(l_extendedprice * (1 - l_discount)), 2)
                           AS total_revenue
                FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
                GROUP BY 1, 2
            )
            SELECT s_suppkey, s_name, total_revenue FROM rev
            WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        """,
        "parts_supplier_counts": """
            SELECT p_brand, p_type, p_size,
                   count(DISTINCT l_suppkey) AS supplier_cnt
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_brand <> 'Brand#1'
              AND p_size IN (1, 4, 7, 10, 15, 20, 25, 30)
              AND l_suppkey NOT IN (
                  SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7%')
            GROUP BY 1, 2, 3
        """,
        "small_qty_revenue": """
            WITH avg_qty AS (
                SELECT l_partkey AS pk, 0.5 * avg(l_quantity) AS half_avg
                FROM lineitem GROUP BY 1
            )
            SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
                   count(*) AS n_items
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            JOIN avg_qty ON pk = l_partkey
            WHERE p_brand = 'Brand#13' AND l_quantity < half_avg
        """,
        "discounted_brand_revenue": """
            SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 20)
               OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25
                   AND l_quantity BETWEEN 5 AND 35)
               OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 50
                   AND l_quantity BETWEEN 10 AND 50)
        """,
        "excess_quantity_suppliers": """
            WITH part_qty AS (
                SELECT l_partkey AS pk, l_suppkey AS sk,
                       sum(l_quantity) AS sq
                FROM lineitem JOIN part ON p_partkey = l_partkey
                WHERE p_name LIKE '%widget%'
                  AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
                GROUP BY 1, 2
            ), tot AS (SELECT pk, sum(sq) AS tq FROM part_qty GROUP BY 1)
            SELECT DISTINCT s_suppkey, s_name
            FROM part_qty JOIN tot USING (pk)
            JOIN supplier ON s_suppkey = sk
            WHERE sq > 0.3 * tq
        """,
        "waiting_suppliers": """
            WITH late AS (
                SELECT DISTINCT l_orderkey, l_suppkey
                FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                WHERE o_orderstatus = 'F'
                  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
            ), allsup AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
            SELECT s_name, count(*) AS numwait FROM (
                SELECT l1.l_orderkey, l1.l_suppkey
                FROM late l1
                WHERE EXISTS (SELECT 1 FROM allsup l2
                              WHERE l2.l_orderkey = l1.l_orderkey
                                AND l2.l_suppkey <> l1.l_suppkey)
                  AND NOT EXISTS (SELECT 1 FROM late l3
                                  WHERE l3.l_orderkey = l1.l_orderkey
                                    AND l3.l_suppkey <> l1.l_suppkey)
            ) w JOIN supplier ON s_suppkey = l_suppkey
            GROUP BY 1
        """,
    }


def _minhash_oracle() -> str:
    """DuckDB SQL reproducing the ENTIRE portable MinHash-LSH pipeline:
    md5-derived shingle hashes → 64 (a·x+b) mod M31 minima → arithmetic
    band folds → band-collision candidates → estimated-Jaccard filter."""
    from tube_spark.operators.dedup import _BAND_M, _BAND_P, _MERSENNE, minhash_coefficients

    coeffs = minhash_coefficients(64, 42)
    coef_values = ", ".join(f"({i}, {a}::BIGINT, {b}::BIGINT)" for i, (a, b) in enumerate(coeffs))
    return f"""
        WITH tok AS (
            SELECT doc_id, {_TOK} AS t FROM documents
        ), grams AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       generate_series(1, greatest(len(t) - 1, 0)),
                       i -> concat(t[i], ' ', t[i+1]))) AS gs
            FROM tok
        ), sh AS (
            SELECT doc_id,
                   ('0x' || substr(md5(unnest(gs)), 1, 8))::BIGINT % {_MERSENNE} AS x
            FROM grams
        ), coef AS (
            SELECT * FROM (VALUES {coef_values}) AS c(i, a, b)
        ), sig AS (
            SELECT doc_id, i, min((a * x + b) % {_MERSENNE}) AS h
            FROM sh, coef GROUP BY 1, 2
        ), sigl AS (
            SELECT doc_id, list(h ORDER BY i) AS sig FROM sig GROUP BY 1
        ), bands AS (
            SELECT doc_id, band,
                   list_reduce(sig[band*4+1 : band*4+4],
                       (acc, v) -> (acc * {_BAND_P} + v) % {_BAND_M}) AS bh
            FROM sigl, (SELECT unnest(generate_series(0, 15)) AS band)
        ), cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
        ), est AS (
            SELECT id_a, id_b,
                   list_sum(list_transform(generate_series(1, 64),
                       i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) / 64.0
                       AS e
            FROM cand
            JOIN sigl sa ON sa.doc_id = id_a
            JOIN sigl sb ON sb.doc_id = id_b
        )
        SELECT id_a, id_b, round(e, 6) AS est_jaccard FROM est WHERE e >= 0.5
    """
