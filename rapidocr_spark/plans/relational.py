"""Relational query plans over the TPC-H-ish test tables.

These are the engine's "relational shell" (SURVEY.md §2.3 tail): all
built-in DataFrame ops — Catalyst owns join selection, pushdown, pruning.
Scale notes per query:

- only the O(1)/tiny dimensions (region, nation, supplier, 1-row
  aggregates) are explicitly ``broadcast()``; customer and part grow
  proportionally with the fact tables in TPC-H, so forcing them into the
  driver/executor heap at 100 TB is an OOM — they are left unhinted and
  AQE picks broadcast vs shuffle from actual runtime sizes;
- money arithmetic runs in DECIMAL(18,4) so sums are exact and
  engine-order-independent (a float sum would differ between Spark's
  partial aggregation tree and any single-node oracle); outputs are cast
  to double only at the boundary, after round().

Each ``q*`` has a DuckDB oracle in plans/shell.py with identical column
names and identical decimal semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _money(df: DataFrame) -> DataFrame:
    return df.withColumns(
        {
            "ep": F.col("l_extendedprice").cast(DEC),
            "disc": F.col("l_discount").cast(DEC),
            "tax": F.col("l_tax").cast(DEC),
            "qty": F.col("l_quantity").cast(DEC),
        }
    )


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: one scan, map-side partial agg, 6-group result."""
    li = _money(_t(spark, sf_dir, "lineitem"))
    g = (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qty").alias("sq"),
            F.sum("ep").alias("sbp"),
            F.sum(F.col("ep") * (F.lit(1).cast(DEC) - F.col("disc"))).alias("sdp"),
            F.sum(
                F.col("ep")
                * (F.lit(1).cast(DEC) - F.col("disc"))
                * (F.lit(1).cast(DEC) + F.col("tax"))
            ).alias("sc"),
            F.count(F.lit(1)).alias("count_order"),
            F.sum("disc").alias("sdisc"),
        )
    )
    c = F.col("count_order")
    return g.select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("sq").cast("double"), 2).alias("sum_qty"),
        F.round(F.col("sbp").cast("double"), 2).alias("sum_base_price"),
        F.round(F.col("sdp").cast("double"), 2).alias("sum_disc_price"),
        F.round(F.col("sc").cast("double"), 2).alias("sum_charge"),
        F.round(F.col("sq").cast("double") / c, 6).alias("avg_qty"),
        F.round(F.col("sbp").cast("double") / c, 6).alias("avg_price"),
        F.round(F.col("sdisc").cast("double") / c, 6).alias("avg_disc"),
        c.alias("count_order"),
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem → top-10 open orders (join strategy
    left to AQE: customer is not forced broadcast — at 100 TB the filtered
    dim may exceed the broadcast threshold, and AQE picks correctly)."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _money(_t(spark, sf_dir, "lineitem"))
    rev = F.sum(F.col("ep") * (F.lit(1).cast(DEC) - F.col("disc")))
    return (
        li.join(
            orders.join(cust, orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .where(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev.alias("rev"))
        .select(
            "o_orderkey",
            F.round(F.col("rev").cast("double"), 2).alias("revenue"),
            # render timestamps as strings (UTC session) so the DuckDB oracle
            # hash-compares exactly — see plans/shell.py
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way join; every dim broadcast; one shuffle for the final groupBy."""
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _money(_t(spark, sf_dir, "lineitem"))
    rev = F.sum(F.col("ep") * (F.lit(1).cast(DEC) - F.col("disc")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(rev.alias("rev"))
        .select("n_name", F.round(F.col("rev").cast("double"), 2).alias("revenue"))
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan+filter+agg — the pushdown showcase (filters reach parquet)."""
    li = _money(_t(spark, sf_dir, "lineitem"))
    out = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(F.col("ep") * F.col("disc")).alias("rev"))
        .select(F.round(F.col("rev").cast("double"), 2).alias("revenue"))
    )
    return out


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item report: top 20 customers by lost revenue."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    li = _money(_t(spark, sf_dir, "lineitem")).where(F.col("l_returnflag") == "R")
    rev = F.sum(F.col("ep") * (F.lit(1).cast(DEC) - F.col("disc")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(rev.alias("rev"))
        .select(
            "c_custkey",
            "c_name",
            F.round(F.col("rev").cast("double"), 2).alias("revenue"),
            F.round(F.col("c_acctbal").cast("double"), 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with at least one line shipped after the order date, counted
    by priority — the EXISTS/semi-join shape (left_semi: no fan-out)."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = li.join(orders, li.l_orderkey == orders.o_orderkey).where(
        F.col("l_shipdate") > F.col("o_orderdate")
    ).select("l_orderkey").distinct()
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of customers by order count (incl. zero) — the outer
    join + double aggregation shape."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with maximum revenue in a window — agg + max-subquery."""
    li = _money(_t(spark, sf_dir, "lineitem")).where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(F.col("ep") * (F.lit(1).cast(DEC) - F.col("disc"))).alias("r"))
    )
    max_r = rev.agg(F.max("r").alias("m"))
    sup = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(max_r), rev.r == max_r.m)
        .join(F.broadcast(sup), rev.l_suppkey == sup.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("r").cast("double"), 2).alias("total_revenue"),
        )
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avg yearly revenue lost to small orders — correlated-avg shape:
    lines with quantity below 50% of their part's average quantity."""
    li = _money(_t(spark, sf_dir, "lineitem"))
    part_avg = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    out = (
        li.join(part_avg, "l_partkey")
        .where(F.col("l_quantity") < F.col("half_avg"))
        .agg(F.sum("ep").alias("s"))
        .select(F.round(F.col("s").cast("double") / 7.0, 2).alias("avg_yearly"))
    )
    return out


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds a threshold — HAVING shape."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("sum_qty"))
        .where(F.col("sum_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("o_orderdate"),
            F.round(F.col("o_totalprice").cast("double"), 2).alias("totalprice"),
            F.round(F.col("sum_qty").cast("double"), 2).alias("sum_qty"),
        )
    )


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with above-average balance and no RECENT orders — anti-join +
    uncorrelated scalar subquery shape."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-07-01").cast("timestamp")
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("a"))
    return (
        cust.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("a"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 5).cast("int").alias("cntry_grp"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double"), 2).alias("totacctbal"),
        )
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation over a broadcast part join."""
    part = _t(spark, sf_dir, "part")
    li = _money(_t(spark, sf_dir, "lineitem"))
    dp = F.col("ep") * (F.lit(1).cast(DEC) - F.col("disc"))
    g = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        .join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", dp).otherwise(F.lit(0).cast(DEC))).alias("promo"),
            F.sum(dp).alias("total"),
        )
    )
    return g.select(
        F.round(
            F.lit(100.0) * F.col("promo").cast("double") / F.col("total").cast("double"), 6
        ).alias("promo_revenue_pct")
    )


# ---------------------------------------------------------------------------
# round-2 additions: the remaining TPC-H join/agg shapes expressible over
# the provided columns (q2/q11 need partsupp, q20/q21 need l_receiptdate —
# documented as schema-impossible in SURVEY §8).


def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bidirectional nation-pair trade volume per ship year —
    the two-aliased-dimension join with a disjunctive pair predicate."""
    li = _money(_t(spark, sf_dir, "lineitem"))
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n1), sup.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nkey"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("ep") * (F.lit(1).cast(DEC) - F.col("disc"))).cast("double"), 2
            ).alias("revenue")
        )
        .withColumn("l_year", F.col("l_year").cast("int"))
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one nation's share of a region's PROMO-part import revenue
    per order year — conditional numerator over a 6-way join."""
    li = _money(_t(spark, sf_dir, "lineitem"))
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    vol = F.col("ep") * (F.lit(1).cast(DEC) - F.col("disc"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n1), sup.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nkey"))
        .join(F.broadcast(region), F.col("c_rkey") == region.r_regionkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(
                        F.lit(0).cast(DEC)
                    )
                ).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: amount by supplier nation × year over a p_name LIKE filter
    (no partsupp table ⇒ amount is discounted revenue, not revenue−cost)."""
    li = _money(_t(spark, sf_dir, "lineitem"))
    part = _t(spark, sf_dir, "part").where(F.col("p_name").contains("bolt"))
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("ep") * (F.lit(1).cast(DEC) - F.col("disc"))).cast("double"), 2
            ).alias("sum_profit")
        )
    )


def q12_shipping_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: line counts by priority class per shipping-delay bucket
    (no l_shipmode column ⇒ the bucket is the ship-after-order delay)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    bucket = F.when(delay > 60, F.lit("SLOW")).otherwise(F.lit("FAST"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-supplier counts per part attribute group with an
    excluded-supplier NOT-IN subquery (negative balance ≙ complaints)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad_sup = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("bad_key")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad_sup), li.l_suppkey == F.col("bad_key"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: revenue under three OR'd brand/size/quantity predicate
    branches — the disjunctive-pushdown exercise."""
    li = _money(_t(spark, sf_dir, "lineitem"))
    part = _t(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    br = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#25")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return joined.where(br).agg(
        F.round(
            F.sum(F.col("ep") * (F.lit(1).cast(DEC) - F.col("disc"))).cast("double"), 2
        ).alias("revenue")
    )
