"""Headline analytical queries over the fixture tables — the engine's
demonstration that scans, filters, aggregations, joins, windows and
set ops compose Spark-first (all lazy DataFrame plans; Catalyst picks
broadcast vs sort-merge joins, pushes filters into the parquet scans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hive_exporter_spark.functions.aggs import davg, dsum


def pricing_summary(lineitem: DataFrame, ship_date_cutoff: str = "2024-09-01") -> DataFrame:
    """Flagship: TPC-H-Q1-style pricing summary.

    GroupBy two low-cardinality columns + 8 aggregates + global sort.
    Scale shape: map-side partial aggregation collapses ~everything
    before the shuffle (6 groups), so this is scan-bound at 100 TB —
    exactly what you want. The cutoff filter and the 10-column
    projection both push into the parquet scan.
    """
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit(ship_date_cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def shipping_priority(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                      segment: str = "BUILDING") -> DataFrame:
    """TPC-H-Q3-style: revenue of unshipped orders for one segment.

    Join shape at scale: customer⋈orders shuffles on custkey, then
    ⋈lineitem shuffles on orderkey; the segment filter prunes customer
    *before* its shuffle (pushed to the scan). Top-10 via sort+limit —
    Spark executes it as a TakeOrdered (no global sort materialized).
    """
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        customer.where(F.col("c_mktsegment") == segment)
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def local_supplier_volume(region: DataFrame, nation: DataFrame, customer: DataFrame,
                          orders: DataFrame, lineitem: DataFrame, supplier: DataFrame,
                          region_name: str = "ASIA") -> DataFrame:
    """TPC-H-Q5-style: revenue by nation where supplier and customer
    share the nation. region/nation are broadcast (tiny dims); the
    supplier-nation equality is part of the join condition so Catalyst
    keeps one shuffle on the fact side."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        F.broadcast(region.where(F.col("r_name") == region_name))
        .join(F.broadcast(nation), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(customer, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("s_nationkey") == F.col("c_nationkey")))
        .groupBy("n_name")
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def top_orders_per_priority(orders: DataFrame, k: int = 3) -> DataFrame:
    """Grouped top-k (ranking window): highest-value orders per
    priority. One shuffle on the partition key; no global sort."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rank_in_priority", F.row_number().over(w))
        .where(F.col("rank_in_priority") <= k)
        .select("o_orderpriority", "rank_in_priority", "o_orderkey", "o_totalprice")
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Anti join: customers that never ordered. Catalyst broadcasts the
    distinct custkey set when small; at scale AQE picks the strategy."""
    return customer.join(
        orders, customer["c_custkey"] == orders["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


def forecast_revenue(lineitem: DataFrame, date_from: str = "1996-01-01",
                     date_to: str = "1997-01-01") -> DataFrame:
    """TPC-H-Q6-style: single filtered scan + one global aggregate —
    the pure scan-throughput query. Every predicate pushes into the
    parquet scan (row-group min/max skipping); the aggregate is a
    partial-agg collapse to one row per task."""
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
             F.count(F.lit(1)).alias("n_lines"))
    )


def customer_order_stats(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left outer join + per-customer aggregate, order-less customers
    kept with zeroed stats."""
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("total_spent"),
        )
    )


def customers_with_urgent_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left-semi join: customers having at least one 1-URGENT order.
    Semi joins ship only the join key of the right side — at scale the
    distinct-key set is far smaller than the orders fact."""
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def order_cube(orders: DataFrame) -> DataFrame:
    """CUBE aggregate over (status, priority): all 4 grouping
    combinations in one pass (grouping-sets expansion happens map-side
    before the single exchange)."""
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total_price"))
    )


def top_customers_by_balance(customer: DataFrame, k: int = 20) -> DataFrame:
    """Global top-k: Spark executes orderBy+limit as TakeOrderedAndProject
    — per-partition top-k then a driver merge of k·p rows, never a full
    global sort."""
    return (
        customer.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .limit(k)
        .select("c_custkey", "c_name", "c_acctbal")
    )


def order_rollup(orders: DataFrame) -> DataFrame:
    """ROLLUP aggregate over (status, priority) — subtotal + grand-total
    rows, single pass with partial aggregation."""
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total_price"))
    )


def distinct_counts(lineitem: DataFrame) -> DataFrame:
    """Exact distinct aggregates (the oracle-checkable baseline for the
    approx_count_distinct fast path, see `approx_distinct_counts`)."""
    return lineitem.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )


def order_date_features(orders: DataFrame) -> DataFrame:
    """Scalar-function showcase: date parts, date arithmetic, string
    ops, CASE, numeric bucketing — all JVM built-ins inside one
    whole-stage-codegen span (F1-F6 parity and beyond)."""
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .alias("days_since_1995"),
        F.upper(F.substring("o_orderpriority", 1, 1)).alias("priority_code"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_priority"),
        F.length("o_orderpriority").alias("priority_len"),
        F.when(F.col("o_orderstatus") == "F", F.lit("final"))
        .otherwise(F.lit("open")).alias("status_flag"),
        F.floor(F.col("o_totalprice") / 50000).cast("long").alias("price_bucket"),
        # raw double product (not rounded): IEEE multiply is bit-identical
        # across engines, round(x, 2) on half-way cases is not
        (F.col("o_totalprice") * 0.1).alias("commission"),
    )


def value_percentiles(events: DataFrame) -> DataFrame:
    """Exact interpolated percentiles per event_type (sort-based; the
    approximate fast path is `approx_value_stats`)."""
    return (
        events.groupBy("event_type")
        .agg(
            F.round(F.percentile("value", 0.5), 6).alias("p50"),
            F.round(F.percentile("value", 0.9), 6).alias("p90"),
            F.round(F.percentile("value", 0.99), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


def approx_value_stats(events: DataFrame) -> DataFrame:
    """Sketch-based aggregates — approx_count_distinct (HLL++) and
    percentile_approx (KLL-style) — the at-scale substitutes for the
    exact forms. No DuckDB twin (different sketches): rows-only
    checked; the tests bound their error vs the exact values."""
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.percentile_approx("value", 0.5).alias("approx_p50"),
    )


def nations_in_both_segments(customer: DataFrame, nation: DataFrame) -> DataFrame:
    """INTERSECT: nations having customers in BUILDING and MACHINERY."""
    a = (customer.where(F.col("c_mktsegment") == "BUILDING")
         .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
         .select("n_name"))
    b = (customer.where(F.col("c_mktsegment") == "MACHINERY")
         .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
         .select("n_name"))
    return a.intersect(b).orderBy("n_name")


def nations_only_in_segment(customer: DataFrame, nation: DataFrame) -> DataFrame:
    """EXCEPT: nations with BUILDING customers but no MACHINERY ones."""
    a = (customer.where(F.col("c_mktsegment") == "BUILDING")
         .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
         .select("n_name"))
    b = (customer.where(F.col("c_mktsegment") == "MACHINERY")
         .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
         .select("n_name"))
    return a.subtract(b).orderBy("n_name")


def part_type_volume(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Broadcast-join demonstration: part (small dim) explicitly
    broadcast against the lineitem fact — zero shuffle on the fact side
    for the join; only the 25-group agg shuffles."""
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            davg("l_extendedprice").alias("avg_price"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("p_type")
    )
