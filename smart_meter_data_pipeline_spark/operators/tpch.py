"""Classic analytical shapes over the TPC-H-ish testdata tables.

The reference's marts are scan → window → agg → join → re-agg; these
queries prove the same aggregate/join/sort machinery on the warehouse
tables (A1-A5, J1-J4, plus ORDER BY/LIMIT), at plans Catalyst can
optimize fully: filter pushdown to parquet, broadcast of small dims,
partial aggregation before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smart_meter_data_pipeline_spark.operators.common import dsum
from smart_meter_data_pipeline_spark.plans.registry import register
from smart_meter_data_pipeline_spark.sources.readers import load_table


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: filtered scan → hash aggregate with derived
    measures. The shipdate filter pushes down to the parquet scan;
    per-row double products are deterministic, sums are exact-decimal."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order"))
        .withColumn("avg_price", F.col("sum_base_price") / F.col("count_order"))
    )


_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)
           AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(25,6)))
            AS DOUBLE) AS sum_charge,
       COUNT(*) AS count_order,
       CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

register("pricing_summary", _PRICING_SQL)(pricing_summary)


def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join → agg → ORDER BY … LIMIT 10 with a
    deterministic tiebreak. customer is the broadcast side; orders ⋈
    lineitem shuffles on the join key once and the aggregation reuses
    that partitioning."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        orders.join(
            F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
            orders.o_custkey == cust.c_custkey,
            "inner",
        )
        .join(li, orders.o_orderkey == li.l_orderkey, "inner")
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


_TOP_ORDERS_SQL = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)
           AS revenue
FROM orders
INNER JOIN customer ON o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
INNER JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""

register("top_revenue_orders", _TOP_ORDERS_SQL)(top_revenue_orders)


def nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: fact → dims star join rolled up by nation and
    region; every dim side is broadcast so the only shuffle is the
    final aggregation."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey, "inner")
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "inner")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "inner")
        .groupBy("r_name", "n_name")
        .agg(dsum(revenue, "revenue"), F.count(F.lit(1)).alias("n_lineitems"))
    )


_NATION_REVENUE_SQL = """
SELECT r_name, n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)
           AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem
INNER JOIN orders ON l_orderkey = o_orderkey
INNER JOIN customer ON o_custkey = c_custkey
INNER JOIN nation ON c_nationkey = n_nationkey
INNER JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""

register("nation_revenue", _NATION_REVENUE_SQL)(nation_revenue)


def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape, decorrelated Spark-first (§2.9 —
    absent from the reference): orders whose price exceeds their
    customer's average order price.

    The textbook correlated form recomputes the inner aggregate per
    outer row; here it's decorrelated to ONE pass — an average over a
    window keyed by the correlation column — so the fact table is
    scanned once and shuffled once, which is the plan a 100 TB run
    needs. (Catalyst performs this rewrite for scalar subqueries too;
    writing it decorrelated keeps the plan explicit.)"""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    avg_price = (
        F.sum(F.col("o_totalprice").cast("decimal(25,6)")).over(w)
        / F.count(F.lit(1)).over(w)
    ).cast("double")
    return (
        orders.withColumn("cust_avg_price", F.round(avg_price, 6))
        .filter(F.col("o_totalprice") > F.col("cust_avg_price"))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            "cust_avg_price",
        )
    )


register(
    "orders_above_customer_avg",
    """
WITH w AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         round(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
                      OVER (PARTITION BY o_custkey) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY o_custkey), 6) AS cust_avg_price
  FROM orders
)
SELECT o_orderkey, o_custkey, o_totalprice, cust_avg_price
FROM w WHERE o_totalprice > cust_avg_price
""",
)(orders_above_customer_avg)


def tpch_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — the two-aliased-dim join: lineitem ⋈ supplier
    ⋈ orders ⋈ customer, then the SAME nation dim joined TWICE under
    different roles (supplier nation, customer nation), rolled up by
    the cross-border pair and ship year. Exercises alias resolution
    and multi-broadcast planning: every dim side broadcasts, the fact
    never shuffles until the final (pair, year) aggregation."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount",
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(dsum(revenue, "revenue"), F.count(F.lit(1)).alias("n_lineitems"))
    )


register(
    "tpch_volume_shipping",
    """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
""",
)(tpch_volume_shipping)
