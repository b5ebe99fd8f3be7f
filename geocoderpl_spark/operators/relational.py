"""Relational operator surface (SURVEY.md §2 parity demos over the TPC-H-ish
test tables): broadcast dim joins (J1/J2), semi/anti joins (J4/J6), point
lookups (J9/J10), group aggregations (A1-A8), top-k windows (W1-W3).

Money aggregates go through DECIMAL so sums are exact and engine-vs-oracle
comparison is bit-stable (double summation order varies across partitions;
decimal addition is associative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style aggregation (A-family; reference A1/A6 analogs)."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") < F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "sum_disc_price", "count_order")
    )


def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer -> nation -> region broadcast-join rollup (J1/J2 analogs:
    the reference probes broadcast TERYT/shape arrays)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("sum_acctbal"),
        )
        .select("r_name", "n_customers", "sum_acctbal")
    )


def topk_per_group(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Top-k orders by totalprice per priority (W1 analog: argpartition top-5)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("o_orderpriority", F.col("rank").cast("int").alias("rank"), "o_orderkey", "o_totalprice")
    )


def semi_join_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having >= 1 order with totalprice > 100000 (J4 analog:
    sector-set semi-join / partition pruning)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return c.join(o, "c_custkey", "left_semi").select("c_custkey", "c_name")


def anti_join_sentinel_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts joined to their order count; never-ordered parts keep sentinel 0
    (J6 analog: the reference's left-outer-with-sentinel docID assignment,
    ``geo_utilities.py:744-746`` — absent match => 0, never NULL)."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left")
        .select("p_partkey", F.coalesce(F.col("cnt"), F.lit(0)).alias("n_orders"))
    )


def point_lookup_orders(spark: SparkSession, sf_dir: str, keys: tuple[int, ...] = (1, 7, 32, 100, 9999999)) -> DataFrame:
    """Rowid point-lookup fetch (J9 analog: OR-of-ids row fetch)."""
    o = _t(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey").isin(list(keys))).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


def running_sum_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running order-count per customer by date (beyond-reference window
    capability; frames over event time)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("running_orders"),
    )


def dict_decode_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-map dictionary decode (reference P7/S4/S5: coded values
    mapped through broadcast dicts with '' on miss, ``xml_parsers.py:261-270``).
    Here: region-id -> label via a literal map, sentinel 'UNKNOWN' on miss."""
    n = _t(spark, sf_dir, "nation")
    labels = {0: "AFRICA_Z", 1: "AMERICA_Z", 2: "ASIA_Z"}  # deliberately partial
    mapping = F.create_map(*[F.lit(x) for kv in labels.items() for x in kv])
    return n.select(
        "n_nationkey",
        "n_name",
        F.coalesce(mapping[F.col("n_regionkey")], F.lit("UNKNOWN")).alias("region_label"),
    )


def sentinel_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type casts with sentinel defaults (reference P6: 'true'->1/0 and
    numeric-string-else-0, ``xml_parsers.py:257-260``): parse the numeric in
    o_orderpriority ('1-URGENT' -> 1), invalid -> 0; flag high priority."""
    o = _t(spark, sf_dir, "orders")
    num = F.coalesce(
        F.regexp_extract("o_orderpriority", r"^(\d+)", 1).try_cast("int"),
        F.lit(0),
    )
    return o.select(
        "o_orderkey",
        num.alias("priority_num"),
        F.when(num <= 2, 1).otherwise(0).alias("is_high_priority"),
    )


def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (beyond-reference OLAP surface): per
    (returnflag, linestatus) + per returnflag + grand total; grouping NULLs
    replaced with 'ALL' for oracle comparability."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


def events_sessionize(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's
    inter-event gap exceeds ``gap_minutes`` (lag + cumulative-sum pattern;
    beyond-reference streaming-adjacent capability, batch view)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; cast via TIMESTAMP (session tz pinned to UTC) to
    # get epoch seconds identical to the oracle's epoch()
    sec = F.col("ts").cast("timestamp").cast("long")
    gap = sec - F.lag(sec).over(w)
    flagged = e.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > gap_minutes * 60), F.lit(1)).otherwise(F.lit(0)),
    )
    return (
        flagged.groupBy("user_id")
        .agg(
            F.sum("new_sess").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "n_sessions", "n_events")
    )


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction from the ``props`` string column (reference
    analog: GeoJSON parse, ``geo_gui.py:318``) + rollup."""
    e = _t(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1).cast("long")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.sum(F.col("k")).alias("sum_k"),
            F.max(F.col("k")).alias("max_k"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("event_type", "sum_k", "max_k", "n")
    )


def events_type_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-stream rollup by type and hour (batch view of the streaming agg)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select("event_type", "hour", "n", "sum_value")
    )


def shipping_priority(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """TPC-H Q3 shape: 3-way join (one broadcast dim side, one co-keyed fact
    join), filtered both sides, revenue aggregation, global top-k.

    Scale notes: customer is the broadcast side (dim); orders⋈lineitem is
    the one wide shuffle, keyed by orderkey — uniform. The final top-k is
    TakeOrderedAndProject (no global sort)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1995-03-15"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(k)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join (orders with any late lineitem) +
    count per priority class. Semi-join never materializes the probe side's
    payload — the right shape for a 10^12-row fact table."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1995-07-01"))
    )
    # "late" analog over this schema (no commit/receipt dates): any lineitem
    # shipped in H2'1995
    late = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-07-01"))
        & (F.col("l_shipdate") < F.lit("1996-01-01"))
    )
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )
