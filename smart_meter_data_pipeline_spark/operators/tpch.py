"""Classic analytical shapes over the TPC-H-ish testdata tables.

The reference's marts are scan → window → agg → join → re-agg; these
queries prove the same aggregate/join/sort machinery on the warehouse
tables (A1-A5, J1-J4, plus ORDER BY/LIMIT), at plans Catalyst can
optimize fully: filter pushdown to parquet, broadcast of small dims,
partial aggregation before the shuffle.

Broadcast-hint policy (round-7, ceiling documented round-9): explicit
``F.broadcast`` hints are reserved for frames bounded by a CONSTANT or
near-constant (nation 25, region 5, aggregated rollups, 1-row scalars)
— plus ``supplier``, the one linearly-scaling exception. The supplier
hints assume supplier stays under ~10M rows / ~1.5 GB serialized
(TPC-H supplier is SF x 10k rows at ~140 B/row → valid through
SF ~1000, i.e. a ~1 TB warehouse). At the 100 TB design point
(SF ~100k, supplier ~1e9 rows) that assumption breaks: strip the
supplier hints (AQE then picks broadcast exactly while the table still
fits ``spark.sql.autoBroadcastJoinThreshold``) — they are hints, not
semantics, so removing them is plan-only. orders / customer / part
scale with the fact at EVERY SF and are never hinted
(test_fact_scale_tables_never_force_broadcast pins this).
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
    deterministic tiebreak. The filtered customer side carries no
    forced hint (customer scales with SF; AQE broadcasts it when it
    fits); orders ⋈ lineitem shuffles on the join key once and the
    aggregation reuses that partitioning."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        orders.join(
            cust.filter(F.col("c_mktsegment") == "BUILDING"),
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
    region; nation/region broadcast, while orders and customer —
    fact-scale tables at the 100 TB design point — shuffle-join on
    their keys with AQE free to broadcast them at small SF."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .join(cust, orders.o_custkey == cust.c_custkey, "inner")
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
    and multi-broadcast planning: supplier and both nation roles
    broadcast; orders and customer (fact-scale) join on their keys —
    AQE may broadcast them at small SF — before the final (pair,
    year) aggregation."""
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
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
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


def tpch_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — conditional-aggregate ratio: per ship month,
    the share of revenue coming from promo-class parts. One fact scan;
    part carries no forced hint (it scales with SF — AQE broadcasts
    it when it fits); the CASE folds into the partial
    aggregate so the shuffle carries two decimal sums per month, and
    the ratio is a deterministic double op on the exact sums."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey, "inner")
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(dsum(promo_rev, "promo_revenue"), dsum(revenue, "total_revenue"))
        .withColumn(
            "promo_pct",
            F.when(
                F.col("total_revenue") > 0,
                F.round(
                    (F.lit(100.0) * F.col("promo_revenue"))
                    / F.col("total_revenue"),
                    9,
                ),
            ).otherwise(F.lit(0.0)),
        )
    )


register(
    "tpch_promo_revenue",
    """
WITH m AS (
  SELECT date_trunc('month', l_shipdate) AS ship_month,
         CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                            THEN l_extendedprice * (1 - l_discount)
                            ELSE 0.0 END AS DECIMAL(25,6))) AS DOUBLE)
             AS promo_revenue,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)))
              AS DOUBLE) AS total_revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1
)
SELECT ship_month, promo_revenue, total_revenue,
       CASE WHEN total_revenue > 0
            THEN round((100.0 * promo_revenue) / total_revenue, 9)
            ELSE 0.0 END AS promo_pct
FROM m
""",
)(tpch_promo_revenue)


def tpch_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — HAVING over a grouped fact, joined back to
    its dims: orders whose total quantity exceeds 200. The lineitem
    aggregation shuffles once on l_orderkey; the surviving ~6% of
    orders then join orders/customer (orders by key — AQE picks
    broadcast when the filtered side is small enough, shuffle when
    not, which is the right behavior at 100×)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > 200)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey, "inner")
        .join(cust, orders.o_custkey == cust.c_custkey, "inner")
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
    )


register(
    "tpch_large_orders",
    """
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 200
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
""",
)(tpch_large_orders)


def tpch_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — argmax against a global aggregate: supplier(s)
    achieving the maximum revenue over a ship-date quarter, ties kept.
    The per-supplier rollup shuffles once; the scalar max is a 1-row
    frame broadcast back (never a single-partition window over the
    whole rollup — that serializes at scale)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_supp = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(dsum(revenue, "total_revenue"))
    )
    max_rev = per_supp.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        per_supp.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), per_supp.l_suppkey == supp.s_suppkey, "inner")
        .select("s_suppkey", "s_name", "total_revenue")
    )


register(
    "tpch_top_supplier",
    """
WITH per_supp AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)))
              AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM per_supp)
""",
)(tpch_top_supplier)


def tpch_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — lost-revenue report: top 20 customers by
    revenue on returned lineitems, with their nation. Fact filter
    pushes to the scan (l_returnflag = 'R'); nation broadcasts while
    orders/customer shuffle-join on their keys (fact-scale — AQE may
    broadcast them at small SF); one aggregation shuffle on the
    customer key; top-k is a TakeOrdered,
    not a full sort, with c_custkey as the deterministic tiebreak."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .join(cust, orders.o_custkey == cust.c_custkey, "inner")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "inner")
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


register(
    "tpch_returned_items",
    """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)(tpch_returned_items)


BASKET_TOPK = 100


def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining over order baskets: the
    top-{BASKET_TOPK} part pairs co-purchased in one order, with
    support, directional confidence, and lift — the classic
    co-occurrence analysis (and the relational core of
    recommender candidate generation).

    Scale shape: the self-join is WITHIN l_orderkey, so the fan-out
    per order is bounded by basket size squared (≤13² here; baskets
    are small by nature, never corpus-sized — the same bounded-group
    argument as the session ops), and the pair rollup combines
    map-side. The part-frequency rollup scales with the part catalog
    (fact-linked), so it carries NO broadcast hint — the pair⋈freq
    joins are equi-joins on the part key and AQE may still broadcast
    at small SF (round-7 fact-scale hint policy). All
    scores are int-ratio divisions rounded at 9 — no transcendentals
    (lift = n·pair/(cnt_a·cnt_b), algebraically P(ab)/(P(a)P(b)) with
    one division instead of three, which also keeps it exact).
    Ordering is total (pair count desc, part_a, part_b), so the cut
    is deterministic."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    n_orders = li.select("l_orderkey").distinct().count()
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    freq = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    out = (
        pairs.join(
            freq.select(F.col("l_partkey").alias("part_a"),
                        F.col("cnt").alias("cnt_a")),
            "part_a",
        )
        .join(
            freq.select(F.col("l_partkey").alias("part_b"),
                        F.col("cnt").alias("cnt_b")),
            "part_b",
        )
        .select(
            "part_a",
            "part_b",
            "n_pair",
            "cnt_a",
            "cnt_b",
            F.round(
                F.col("n_pair").cast("double") / F.lit(n_orders), 9
            ).alias("support"),
            F.round(
                F.col("n_pair").cast("double") / F.col("cnt_a").cast("double"),
                9,
            ).alias("confidence_a_b"),
            F.round(
                F.lit(n_orders)
                * F.col("n_pair").cast("double")
                / (F.col("cnt_a").cast("double") * F.col("cnt_b").cast("double")),
                9,
            ).alias("lift"),
        )
        .orderBy(F.col("n_pair").desc(), "part_a", "part_b")
        .limit(BASKET_TOPK)
    )
    return out


register(
    "basket_part_pairs",
    f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
nord AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_pair
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
freq AS (SELECT l_partkey, COUNT(*) AS cnt FROM li GROUP BY 1)
SELECT p.part_a, p.part_b, p.n_pair, fa.cnt AS cnt_a, fb.cnt AS cnt_b,
       round(CAST(p.n_pair AS DOUBLE) / n_orders, 9) AS support,
       round(CAST(p.n_pair AS DOUBLE) / CAST(fa.cnt AS DOUBLE), 9)
         AS confidence_a_b,
       round(n_orders * CAST(p.n_pair AS DOUBLE)
             / (CAST(fa.cnt AS DOUBLE) * CAST(fb.cnt AS DOUBLE)), 9)
         AS lift
FROM pairs p
JOIN freq fa ON p.part_a = fa.l_partkey
JOIN freq fb ON p.part_b = fb.l_partkey
CROSS JOIN nord
ORDER BY p.n_pair DESC, p.part_a, p.part_b
LIMIT {BASKET_TOPK}
""",
)(basket_part_pairs)


def tpch_priority_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking) adapted to the
    testdata's columns (it carries no commit/receipt dates): orders
    placed in one quarter with AT LEAST ONE lineitem shipped 90+ days
    after the order date, counted by priority — the EXISTS/semi-join
    + rollup pattern (reference parity: the dbt-style late-data
    quality checks of SURVEY §5).

    Scale shape: the date filter pushes into the orders scan; the
    existence probe is a LEFT SEMI join (no fan-out however many late
    lineitems an order has — the probe stops at first match), and the
    priority rollup combines map-side into five rows."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    window = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    return (
        window.join(
            li,
            (window.o_orderkey == li.l_orderkey)
            & (
                li.l_shipdate
                >= window.o_orderdate + F.expr("INTERVAL 90 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


register(
    "tpch_priority_checks",
    """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate >= o_orderdate + INTERVAL 90 DAY
  )
GROUP BY 1
""",
)(tpch_priority_checks)


RFM_ASOF = "2001-09-01 00:00:00"  # just past max(o_orderdate); shared literal


def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary), the classic
    customer-scoring mart: days since last order, order count, total
    spend, each scored into quartiles via NTILE with a total order
    (metric, then custkey), concatenated into the 'RFM' segment code.

    Scale shape (rebuilt round 10): one rollup shuffle keyed by
    customer builds the metric table (checkpointed — one fact scan);
    each NTILE then comes from a range-partitioned distributed row
    number (:func:`common.distributed_row_number`) and the exact
    closed-form tile assignment (:func:`common.ntile_sql`) — never a
    global single-partition window over the |customers|-row frame
    (contract-pinned with user_value_rank_bands). Recency in whole
    days via exact integer epoch arithmetic."""
    from smart_meter_data_pipeline_spark.operators.common import (
        distributed_row_number,
        ntile_sql,
    )

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        (
            (
                F.expr(f"CAST(floor(unix_timestamp(TIMESTAMP '{RFM_ASOF}')) AS BIGINT)")
                - F.max(F.expr("CAST(floor(unix_timestamp(o_orderdate)) AS BIGINT)"))
            )
            / F.lit(86400)
        )
        .cast("bigint")
        .alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        dsum("o_totalprice", "monetary"),
    )
    per_cust = per_cust.localCheckpoint(eager=True)
    n = per_cust.count()  # bounded scalar over the customer rollup
    ranked = distributed_row_number(
        per_cust, [F.col("recency_days"), F.col("o_custkey")], "rr"
    )
    ranked = distributed_row_number(
        ranked, [F.col("frequency").desc(), F.col("o_custkey")], "rf"
    )
    ranked = distributed_row_number(
        ranked, [F.col("monetary").desc(), F.col("o_custkey")], "rm"
    )
    return ranked.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.expr(ntile_sql("rr", n, 4)).alias("r_score"),
        F.expr(ntile_sql("rf", n, 4)).alias("f_score"),
        F.expr(ntile_sql("rm", n, 4)).alias("m_score"),
    ).withColumn(
        "segment",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


register(
    "customer_rfm_segments",
    f"""
WITH per_cust AS (
  SELECT o_custkey,
         CAST((CAST(floor(epoch(TIMESTAMP '{RFM_ASOF}')) AS BIGINT)
               - MAX(CAST(floor(epoch(o_orderdate)) AS BIGINT))) / 86400
              AS BIGINT) AS recency_days,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
           AS monetary
  FROM orders GROUP BY 1
)
SELECT o_custkey, recency_days, frequency, monetary,
       NTILE(4) OVER (ORDER BY recency_days, o_custkey) AS r_score,
       NTILE(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
       NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_score,
       CAST(NTILE(4) OVER (ORDER BY recency_days, o_custkey) AS VARCHAR)
         || CAST(NTILE(4) OVER (ORDER BY frequency DESC, o_custkey) AS VARCHAR)
         || CAST(NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS VARCHAR)
         AS segment
FROM per_cust
""",
)(customer_rfm_segments)


def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-fact conformed-dimension rollup: demand-side revenue
    (orders x customer nation) vs supply-side shipped value
    (lineitem x supplier nation) FULL-OUTER joined on the nation dim
    with the net — the classic 'two fact tables, one conformed dim'
    warehouse shape none of the single-fact queries exercise.

    Scale shape: each fact rolls up independently (map-side combine;
    supplier/nation broadcast, customer shuffle-joins — AQE
    broadcasts it when it fits), and only the two nation-sized
    aggregates meet — the facts never join each other."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    demand = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(dsum("o_totalprice", "demand_value"))
    )
    supply = (
        li.withColumn(
            "net_price",
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(dsum("net_price", "supply_value"))
    )
    return (
        F.broadcast(nation)
        .join(demand, nation.n_nationkey == demand.nationkey, "left")
        .join(supply, nation.n_nationkey == supply.nationkey, "left")
        .select(
            "n_nationkey",
            "n_name",
            F.coalesce("demand_value", F.lit(0.0)).alias("demand_value"),
            F.coalesce("supply_value", F.lit(0.0)).alias("supply_value"),
            F.round(
                F.coalesce("demand_value", F.lit(0.0))
                - F.coalesce("supply_value", F.lit(0.0)),
                6,
            ).alias("net_balance"),
        )
    )


register(
    "nation_trade_balance",
    """
WITH demand AS (
  SELECT c.c_nationkey AS nationkey,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
           AS demand_value
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1
),
supply AS (
  SELECT s.s_nationkey AS nationkey,
         CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                       AS DECIMAL(25,6))) AS DOUBLE) AS supply_value
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1
)
SELECT n.n_nationkey, n.n_name,
       COALESCE(d.demand_value, 0.0) AS demand_value,
       COALESCE(s.supply_value, 0.0) AS supply_value,
       round(COALESCE(d.demand_value, 0.0) - COALESCE(s.supply_value, 0.0), 6)
         AS net_balance
FROM nation n
LEFT JOIN demand d ON n.n_nationkey = d.nationkey
LEFT JOIN supply s ON n.n_nationkey = s.nationkey
""",
)(nation_trade_balance)


HHI_TOPK = 50


def part_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-concentration audit: the Herfindahl-Hirschman index of
    supplier quantity shares per part — HHI → 1 means one supplier
    owns the part (single-source risk), → 1/n means even sourcing.
    Top-{HHI_TOPK} most concentrated multi-supplier parts (ties to
    part key, a total order).

    Determinism: shares enter a round-9 decimal grid before squaring,
    so the per-part sum of squares is EXACT decimal arithmetic (a
    raw double Σshare² would be summation-order-dependent).
    Scale shape: two map-side-combinable rollups on (part, supplier)
    then (part); the rank cut is a TopK over part-sized data."""
    li = load_table(spark, sf_dir, "lineitem")
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("qty")
    )
    per_p = per_ps.groupBy("l_partkey").agg(
        F.sum("qty").alias("qty_total"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )
    share = F.round(
        F.col("qty").cast("double") / F.col("qty_total").cast("double"), 9
    ).cast("decimal(12,9)")
    hhi = (
        per_ps.join(per_p, "l_partkey")
        .select("l_partkey", "n_suppliers", share.alias("s9"))
        .groupBy("l_partkey", "n_suppliers")
        .agg(
            F.round(
                F.sum(F.col("s9") * F.col("s9")).cast("double"), 9
            ).alias("hhi")
        )
    )
    return (
        hhi.filter(F.col("n_suppliers") > 1)
        .orderBy(F.col("hhi").desc(), "l_partkey")
        .limit(HHI_TOPK)
    )


register(
    "part_supplier_hhi",
    f"""
WITH per_ps AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(25,6))) AS qty
  FROM lineitem GROUP BY 1, 2
),
per_p AS (
  SELECT l_partkey, SUM(qty) AS qty_total, COUNT(*) AS n_suppliers
  FROM per_ps GROUP BY 1
),
shares AS (
  SELECT ps.l_partkey, p.n_suppliers,
         CAST(round(CAST(ps.qty AS DOUBLE) / CAST(p.qty_total AS DOUBLE), 9)
              AS DECIMAL(12,9)) AS s9
  FROM per_ps ps JOIN per_p p ON ps.l_partkey = p.l_partkey
)
SELECT l_partkey, n_suppliers,
       round(CAST(SUM(s9 * s9) AS DOUBLE), 9) AS hhi
FROM shares
WHERE n_suppliers > 1
GROUP BY 1, 2
ORDER BY hhi DESC, l_partkey
LIMIT {HHI_TOPK}
""",
)(part_supplier_hhi)


def nation_trade_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade reciprocity per UNORDERED nation pair: volume in each
    direction (supplier nation → customer nation) and
    min/max balance — 1.0 means perfectly reciprocal flows, → 0 means
    one-way trade (the Q7 volume matrix folded onto its diagonal; the
    pair-symmetrization shape — canonical pair key via LEAST/GREATEST,
    then conditional sums per direction — that graph queries reuse).

    Scale shape: one fact rollup to the nation×nation matrix
    (supplier broadcasts; orders/customer shuffle-join on their keys
    since both scale with the fact), then all pair math on
    ≤|nations|² rows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    vol = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("from_nation"),
            F.col("c_nationkey").alias("to_nation"),
        )
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "volume",
            )
        )
    )
    a = F.least("from_nation", "to_nation")
    b = F.greatest("from_nation", "to_nation")
    folded = vol.groupBy(a.alias("nation_a"), b.alias("nation_b")).agg(
        F.round(
            F.sum(
                F.when(
                    F.col("from_nation") < F.col("to_nation"),
                    F.col("volume").cast("decimal(25,6)"),
                ).otherwise(F.lit(0).cast("decimal(25,6)"))
            ).cast("double"),
            6,
        ).alias("vol_ab"),
        F.round(
            F.sum(
                F.when(
                    F.col("from_nation") > F.col("to_nation"),
                    F.col("volume").cast("decimal(25,6)"),
                ).otherwise(F.lit(0).cast("decimal(25,6)"))
            ).cast("double"),
            6,
        ).alias("vol_ba"),
    )
    return folded.select(
        "nation_a",
        "nation_b",
        "vol_ab",
        "vol_ba",
        F.when(
            F.greatest("vol_ab", "vol_ba") > 0,
            F.round(
                F.least("vol_ab", "vol_ba")
                / F.greatest("vol_ab", "vol_ba"),
                9,
            ),
        ).alias("reciprocity"),
    )


register(
    "nation_trade_reciprocity",
    """
WITH vol AS (
  SELECT s.s_nationkey AS from_nation, c.c_nationkey AS to_nation,
         CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                       AS DECIMAL(25,6))) AS DOUBLE) AS volume
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE s.s_nationkey <> c.c_nationkey
  GROUP BY 1, 2
),
folded AS (
  SELECT LEAST(from_nation, to_nation) AS nation_a,
         GREATEST(from_nation, to_nation) AS nation_b,
         round(CAST(SUM(CASE WHEN from_nation < to_nation
                             THEN CAST(volume AS DECIMAL(25,6))
                             ELSE CAST(0 AS DECIMAL(25,6)) END)
                    AS DOUBLE), 6) AS vol_ab,
         round(CAST(SUM(CASE WHEN from_nation > to_nation
                             THEN CAST(volume AS DECIMAL(25,6))
                             ELSE CAST(0 AS DECIMAL(25,6)) END)
                    AS DOUBLE), 6) AS vol_ba
  FROM vol GROUP BY 1, 2
)
SELECT nation_a, nation_b, vol_ab, vol_ba,
       CASE WHEN GREATEST(vol_ab, vol_ba) > 0
            THEN round(LEAST(vol_ab, vol_ba) / GREATEST(vol_ab, vol_ba), 9)
            END AS reciprocity
FROM folded
""",
)(nation_trade_reciprocity)


def tpch_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): for each order year,
    the share of AMERICA-region customer revenue supplied by each
    supplier nation. Conditional-aggregate-over-join — the share is a
    windowless two-level rollup: revenue per (year, supplier nation)
    divided by revenue per year.

    Plan: nation/region/supplier broadcast; customer (fact-scale)
    shuffle-joins with AQE free to broadcast it at small SF; lineitem
    ⋈ orders is the biggest join and shuffles once on the order key; the share division happens after
    aggregation, on one row per (year, nation) — double division of
    identically-derived operands is IEEE-deterministic, so the output
    hash-checks. Reference parity: exercises the same star-join +
    conditional rollup machinery as the marts (A1-A4, J3-J4)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cust_in_region = (
        cust.join(
            F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "AMERICA")
        .select("c_custkey")
    )
    supp_nation = supp.join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        supp.s_nationkey == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # Keep the per-nation sum DECIMAL through the second-level rollup:
    # summing the already-cast doubles would be order-dependent float
    # addition (breaks the cross-engine hash); decimal + decimal is
    # exact at both levels, doubles only at the output boundary.
    per_nation = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            cust_in_region,
            orders.o_custkey == cust_in_region.c_custkey,
        )
        .join(F.broadcast(supp_nation), li.l_suppkey == supp_nation.s_suppkey)
        .groupBy("o_year", "supp_nation")
        .agg(
            F.sum(revenue.cast("decimal(25,6)")).alias("nation_revenue_dec")
        )
    )
    wtot = per_nation.groupBy("o_year").agg(
        F.sum("nation_revenue_dec").alias("year_revenue_dec")
    )
    return (
        per_nation.join(F.broadcast(wtot), "o_year")
        .select(
            "o_year",
            "supp_nation",
            F.col("nation_revenue_dec").cast("double").alias("nation_revenue"),
            (
                F.col("nation_revenue_dec").cast("double")
                / F.col("year_revenue_dec").cast("double")
            ).alias("mkt_share"),
        )
    )


_MARKET_SHARE_SQL = """
WITH per_nation AS (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         sn.n_name AS supp_nation,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)))
             AS nation_revenue_dec
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region   ON cn.n_regionkey = r_regionkey AND r_name = 'AMERICA'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  GROUP BY 1, 2
)
SELECT o_year, supp_nation,
       CAST(nation_revenue_dec AS DOUBLE) AS nation_revenue,
       CAST(nation_revenue_dec AS DOUBLE) /
       CAST(SUM(nation_revenue_dec) OVER (PARTITION BY o_year) AS DOUBLE)
           AS mkt_share
FROM per_nation
"""

register("tpch_market_share", _MARKET_SHARE_SQL)(tpch_market_share)


def tpch_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer distribution): how many customers
    placed exactly k orders, INCLUDING the zero-order customers — the
    left outer join is the point of the query (an inner join silently
    drops the k=0 bucket).

    Plan: customer LEFT JOIN orders shuffles on custkey once; both
    aggregations are partial-agg friendly; output is ≤ max-orders rows
    of pure integers (hash-bulletproof)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


_ORDER_COUNT_DIST_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""

register("tpch_order_count_dist", _ORDER_COUNT_DIST_SQL)(tpch_order_count_dist)


def tpch_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): for one brand,
    revenue from lineitems whose quantity is below HALF the part's
    average quantity — the per-group-threshold join, decorrelated
    Spark-first: compute each part's average once, broadcast it back
    against the same scan.

    The threshold factor is 0.5 (binary-exact in both engines — a
    deliberately chosen literal, since 0.2 would differ in the last
    bit between a Python double and a SQL decimal literal); the
    per-part average divides two exact aggregates, so the threshold is
    double-deterministic. Output per qualifying part: lineitem count
    and exact-decimal revenue."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    ).filter(F.col("p_brand") == "Brand#9")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_li = li.join(part, li.l_partkey == part.p_partkey)
    avg_qty = brand_li.groupBy("p_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        brand_li.join(
            F.broadcast(avg_qty.select(
                F.col("p_partkey").alias("t_partkey"), "avg_qty"
            )),
            brand_li.p_partkey == F.col("t_partkey"),
        )
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .groupBy("p_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_small_lineitems"),
            dsum("l_extendedprice", "small_qty_revenue"),
        )
    )


_SMALL_QTY_SQL = """
WITH brand_li AS (
  SELECT p_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#9'
), thresholds AS (
  SELECT p_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)
             AS avg_qty
  FROM brand_li GROUP BY p_partkey
)
SELECT b.p_partkey,
       CAST(COUNT(*) AS BIGINT) AS n_small_lineitems,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE)
           AS small_qty_revenue
FROM brand_li b JOIN thresholds t ON b.p_partkey = t.p_partkey
WHERE l_quantity < 0.5 * avg_qty
GROUP BY b.p_partkey
"""

register("tpch_small_qty_revenue", _SMALL_QTY_SQL)(tpch_small_qty_revenue)


def tpch_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (disjunctive predicates): revenue from three
    OR'd brand/size/quantity clauses — the classic test that a
    planner pushes an OR-of-ANDs down to the scan instead of
    cross-joining the branches. Spark evaluates the disjunction as one
    post-join filter over a single part ⋈ lineitem join — no forced
    hint since part scales with SF; AQE broadcasts the filtered side
    when it fits, and the common ``p_size >= 1`` conjunct prunes the
    build side either way.

    Output: one row per matched brand with count + exact revenue (a
    grouped variant of Q19's single scalar, so the hash check covers
    per-branch routing, not just the total)."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    j = li.join(part, li.l_partkey == part.p_partkey)
    clause = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#7")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.filter(clause)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            dsum(revenue, "disc_revenue"),
        )
    )


_DISJUNCTIVE_SQL = """
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)
           AS disc_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#7'  AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
GROUP BY p_brand
"""

register("tpch_disjunctive_revenue", _DISJUNCTIVE_SQL)(tpch_disjunctive_revenue)


def tpch_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): customers with an
    account balance above the average POSITIVE balance with no order
    since 2000-01-01 (lapsed high-value customers), rolled up by
    market segment — the scalar-subquery + anti-join combination
    (Q22's phone-prefix grouping adapted to the schema's mktsegment,
    and its never-ordered test adapted to a recency cutoff so the
    result is non-degenerate on this data, where every customer has
    SOME order).

    Plan: the scalar average is one tiny aggregate broadcast back as a
    literal-like single row (crossJoin of a 1-row frame — no shuffle);
    the no-orders test is a left-anti join shuffling on custkey once;
    the rollup is partial-agg friendly. The threshold divides two
    exact aggregates, so the double comparison is cross-engine
    deterministic."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_pos_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_pos_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal", "total_acctbal"),
        )
    )


_SALES_OPPORTUNITY_SQL = """
WITH threshold AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)
             AS avg_pos_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS total_acctbal
FROM customer, threshold
WHERE c_acctbal > avg_pos_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_mktsegment
"""

register("tpch_sales_opportunity", _SALES_OPPORTUNITY_SQL)(
    tpch_sales_opportunity
)


def tpch_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): how many
    DISTINCT suppliers have shipped parts of each (brand, size band),
    excluding one brand — the exact-count-distinct-over-join rollup
    (the schema has no partsupp table, so the supplier↔part relation
    comes from shipped lineitems, which is Q16's semantic on the
    available data).

    Plan: part joins on the part key with no forced hint (part
    scales with SF; AQE broadcasts it when it fits); the
    count-distinct is two-level (partial distinct per partition, then
    exact merge) — at 100 TB the alternative approx_count_distinct
    dial exists (approx_sketch_check), but Q16 wants exact."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    ).filter(F.col("p_brand") != "Brand#1")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(
            "p_brand",
            (F.col("p_size") - 1 - (F.col("p_size") - 1) % 10).alias(
                "size_band"
            ),
        )
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.countDistinct("p_partkey").alias("part_cnt"),
        )
    )


_SUPPLIER_VARIETY_SQL = """
SELECT p_brand,
       (p_size - 1) - (p_size - 1) % 10 AS size_band,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt,
       CAST(COUNT(DISTINCT p_partkey) AS BIGINT) AS part_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
GROUP BY 1, 2
"""

register("tpch_supplier_part_variety", _SUPPLIER_VARIETY_SQL)(
    tpch_supplier_part_variety
)


def orders_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gap analysis: per market segment, the distribution
    of days between a customer's consecutive orders — LAG over
    (customer, orderdate) then an integer-exact rollup (min/max/sum
    of day gaps, order pairs counted). The reorder-cadence query every
    retention model starts from; all-integer output hashes exactly.

    Plan: one shuffle on o_custkey for the window, one partial-agg
    rollup; the per-customer gaps join the customer table on the key
    (AQE broadcasts the smaller side — customer scales with SF, so no
    forced hint)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    # Ordering by date alone is deterministic for the GAPS even with
    # tied dates: any permutation within a tie yields the same sorted
    # date sequence, hence the same gap multiset.
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    gaps = (
        orders.withColumn(
            "prev_date", F.lag("o_orderdate").over(w)
        )
        .filter(F.col("prev_date").isNotNull())
        .select(
            "o_custkey",
            F.datediff("o_orderdate", "prev_date").alias("gap_days"),
        )
    )
    return (
        gaps.join(cust, gaps.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.min("gap_days").alias("min_gap_days"),
            F.max("gap_days").alias("max_gap_days"),
            F.sum("gap_days").cast("bigint").alias("total_gap_days"),
        )
    )


_ORDER_GAP_SQL = """
WITH gaps AS (
  SELECT o_custkey,
         datediff('day',
                  LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate),
                  o_orderdate) AS gap_days
  FROM orders
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       MIN(gap_days) AS min_gap_days,
       MAX(gap_days) AS max_gap_days,
       CAST(SUM(gap_days) AS BIGINT) AS total_gap_days
FROM gaps JOIN customer ON o_custkey = c_custkey
WHERE gap_days IS NOT NULL
GROUP BY c_mktsegment
"""

register("orders_gap_stats", _ORDER_GAP_SQL)(orders_gap_stats)


def supplier_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration per supplier nation: how many suppliers
    cover 80% of the nation's lineitem revenue, plus the top
    supplier's share — the 80/20 audit behind supplier-risk and
    source-mix dashboards (and the same shape as a per-domain corpus
    concentration audit).

    Exactness: per-supplier revenue, the ordered cumulative sum, and
    the 80% threshold all stay DECIMAL (cumulative window sums in
    double would hash-break on association); only the final share
    ratio divides through double, identically derived in both
    engines. Plan: one fact shuffle on suppkey, supplier-sized
    windows, nation-sized output."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_supp = (
        li.groupBy("l_suppkey")
        .agg(F.sum(revenue.cast("decimal(25,6)")).alias("rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    )
    w_cum = (
        Window.partitionBy("n_name")
        .orderBy(F.col("rev").desc(), F.col("s_suppkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("n_name").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    scored = per_supp.select(
        "n_name",
        "rev",
        F.sum("rev").over(w_cum).alias("cum"),
        F.sum("rev").over(w_all).alias("total"),
        F.max("rev").over(w_all).alias("top_rev"),
    )
    return (
        scored.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(
                (
                    (F.col("cum") - F.col("rev"))
                    < F.col("total") * F.lit("0.8").cast("decimal(2,1)")
                ).cast("bigint")
            ).alias("n_for_80pct"),
            F.floor(
                F.max("top_rev").cast("double")
                * 1000000.0
                / F.max("total").cast("double")
            )
            .cast("bigint")
            .alias("top_share_micro"),
        )
    )


_PARETO_SQL = """
WITH per_supp AS (
  SELECT n_name, s_suppkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)))
             AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name, s_suppkey
),
scored AS (
  SELECT n_name, rev,
         SUM(rev) OVER (PARTITION BY n_name ORDER BY rev DESC, s_suppkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cum,
         SUM(rev) OVER (PARTITION BY n_name) AS total,
         MAX(rev) OVER (PARTITION BY n_name) AS top_rev
  FROM per_supp
)
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(CAST((cum - rev) < CAST(total AS DECIMAL(25,6))
                     * CAST(0.8 AS DECIMAL(2,1)) AS BIGINT)) AS BIGINT)
           AS n_for_80pct,
       CAST(FLOOR(CAST(MAX(top_rev) AS DOUBLE) * 1000000.0
                  / CAST(MAX(total) AS DOUBLE)) AS BIGINT)
           AS top_share_micro
FROM scored
GROUP BY n_name
"""

register("supplier_revenue_pareto", _PARETO_SQL)(supplier_revenue_pareto)


def nation_self_sufficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domestic-supply share per customer nation: the fraction of each
    nation's purchase revenue supplied by its OWN suppliers — the
    trade-dependence dial next to nation_trade_balance (volumes) and
    nation_trade_reciprocity (pair flows). Conditional aggregation
    over the supplier⋈customer nation join: supplier/nation
    broadcast, orders/customer shuffle-join (fact-scale), 25-row
    output; the share divides two identically
    derived exact decimals through double."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    rev_dec = revenue.cast("decimal(25,6)")
    return (
        j.groupBy("n_name")
        .agg(
            F.sum(rev_dec).alias("total_dec"),
            F.sum(
                F.when(
                    F.col("s_nationkey") == F.col("c_nationkey"), rev_dec
                ).otherwise(F.lit(0).cast("decimal(25,6)"))
            ).alias("domestic_dec"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .select(
            "n_name",
            "n_lineitems",
            F.col("total_dec").cast("double").alias("total_revenue"),
            F.col("domestic_dec").cast("double").alias("domestic_revenue"),
            F.floor(
                F.col("domestic_dec").cast("double")
                * 1000000.0
                / F.col("total_dec").cast("double")
            )
            .cast("bigint")
            .alias("self_sufficiency_micro"),
        )
    )


_SELF_SUFFICIENCY_SQL = """
SELECT cn.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)))
            AS DOUBLE) AS total_revenue,
       CAST(SUM(CASE WHEN s_nationkey = c_nationkey
                     THEN CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(25,6))
                     ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
           AS domestic_revenue,
       CAST(FLOOR(
         CAST(SUM(CASE WHEN s_nationkey = c_nationkey
                       THEN CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(25,6))
                       ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
         * 1000000.0
         / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(25,6))) AS DOUBLE)
       ) AS BIGINT) AS self_sufficiency_micro
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
GROUP BY cn.n_name
"""

register("nation_self_sufficiency", _SELF_SUFFICIENCY_SQL)(
    nation_self_sufficiency
)


def customer_value_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini inequality of customer order value per market segment —
    the concentration summary behind 'do a few whales carry this
    segment'. Gini = 2·Σ(i·vᵢ)/(n·Σv) − (n+1)/n over values sorted
    ascending; Σ(i·vᵢ) and Σv stay exact DECIMAL (rank·value products
    summed exactly — the order-sensitive part), the two final
    divisions go through double identically in both engines. One
    customer-sized window per segment, integer micro output."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(25,6)")).alias("v"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("v"), F.col("o_custkey")
    )
    ranked = per_cust.withColumn("i", F.row_number().over(w))
    return (
        ranked.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("v").alias("sum_v"),
            F.sum(F.col("v") * F.col("i")).alias("sum_iv"),
        )
        .select(
            "c_mktsegment",
            F.col("n_customers").cast("bigint").alias("n_customers"),
            F.floor(
                (
                    F.lit(2.0)
                    * F.col("sum_iv").cast("double")
                    / (
                        F.col("n_customers").cast("double")
                        * F.col("sum_v").cast("double")
                    )
                    - (F.col("n_customers") + 1).cast("double")
                    / F.col("n_customers").cast("double")
                )
                * 1000000.0
            )
            .cast("bigint")
            .alias("gini_micro"),
        )
    )


_GINI_SQL = """
WITH per_cust AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS v
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT c_mktsegment, v,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY v, o_custkey) AS i
  FROM per_cust JOIN customer ON o_custkey = c_custkey
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(FLOOR(
         (2.0 * CAST(SUM(v * i) AS DOUBLE)
            / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(v) AS DOUBLE))
          - CAST(COUNT(*) + 1 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
         * 1000000.0
       ) AS BIGINT) AS gini_micro
FROM ranked
GROUP BY c_mktsegment
"""

register("customer_value_gini", _GINI_SQL)(customer_value_gini)


def part_brand_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand retail-price dispersion: n, min/max, and the exact
    population variance in micro units — the price-book consistency
    audit. Variance comes from the sufficient statistics
    (n·Σv² − (Σv)²)/n², with Σv and Σv² EXACT decimal sums (the
    order-sensitive parts) and one double division at the end; the
    whole thing is a single map-side-combinable aggregation over one
    part-table scan."""
    part = load_table(spark, sf_dir, "part").select(
        "p_brand", "p_retailprice"
    )
    v = F.round(F.col("p_retailprice"), 6).cast("decimal(25,6)")
    return (
        part.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("p_retailprice").alias("min_price"),
            F.max("p_retailprice").alias("max_price"),
            F.sum(v).alias("s1"),
            F.sum(v * v).alias("s2"),
        )
        .select(
            "p_brand",
            F.col("n_parts").cast("bigint").alias("n_parts"),
            "min_price",
            "max_price",
            F.floor(
                (
                    F.col("n_parts") * F.col("s2")
                    - F.col("s1") * F.col("s1")
                ).cast("double")
                / (F.col("n_parts") * F.col("n_parts")).cast("double")
                * 1000000.0
            )
            .cast("bigint")
            .alias("price_var_micro"),
        )
    )


_PRICE_DISPERSION_SQL = """
WITH stats AS (
  SELECT p_brand,
         CAST(COUNT(*) AS BIGINT) AS n_parts,
         MIN(p_retailprice) AS min_price,
         MAX(p_retailprice) AS max_price,
         SUM(CAST(round(p_retailprice, 6) AS DECIMAL(25,6))) AS s1,
         SUM(CAST(round(p_retailprice, 6) AS DECIMAL(25,6))
             * CAST(round(p_retailprice, 6) AS DECIMAL(25,6))) AS s2
  FROM part GROUP BY p_brand
)
SELECT p_brand, n_parts, min_price, max_price,
       CAST(FLOOR(
         CAST(n_parts * s2 - s1 * s1 AS DOUBLE)
         / CAST(n_parts * n_parts AS DOUBLE) * 1000000.0
       ) AS BIGINT) AS price_var_micro
FROM stats
"""

register("part_brand_price_dispersion", _PRICE_DISPERSION_SQL)(
    part_brand_price_dispersion
)


LATE_SHIP_DAYS = 75
LONE_LATE_TOP_K = 20


def tpch_lone_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting), adapted to
    the available columns: in multi-supplier orders, find the supplier
    who was the ONLY one to ship late (l_shipdate more than
    ``LATE_SHIP_DAYS`` days after o_orderdate) — the classic
    EXISTS/NOT-EXISTS pair over the fact against itself.

    Spark-first DECORRELATION instead of Q21's two correlated fact
    self-joins: one (orderkey, suppkey)-level rollup computes each
    supplier's late flag per order, a second orderkey-level rollup
    counts suppliers and late suppliers, and the lone-late blame falls
    out of a filter — two shuffles total, both keyed on the order key
    and both partial-aggregated, with NO self-join of lineitem against
    lineitem. supplier (bounded dim) broadcasts for the name; top-k is
    a TakeOrdered. All-integer output.

    Reference parity: exercises the reference's multi-table
    JOIN+HAVING analytics class (queries/analytics SQL family) on the
    richest remaining TPC-H shape."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {LATE_SHIP_DAYS} DAYS"
    )
    per_supp_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "l_suppkey")
        .agg(F.max(late.cast("int")).alias("supp_late"))
    )
    per_order = per_supp_order.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("supp_late").alias("n_late"),
        F.max(
            F.when(F.col("supp_late") == 1, F.col("l_suppkey"))
        ).alias("late_supp"),
    )
    blamed = (
        per_order.filter(
            (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
        )
        .groupBy("late_supp")
        .agg(F.count(F.lit(1)).alias("n_blamed_orders"))
    )
    return (
        blamed.join(
            F.broadcast(supp), blamed.late_supp == supp.s_suppkey
        )
        .select(
            "s_suppkey",
            "s_name",
            F.col("n_blamed_orders").cast("bigint").alias(
                "n_blamed_orders"
            ),
        )
        .orderBy(F.col("n_blamed_orders").desc(), F.col("s_suppkey"))
        .limit(LONE_LATE_TOP_K)
    )


_LONE_LATE_SQL = f"""
WITH per_supp_order AS (
  SELECT l_orderkey AS o_orderkey, l_suppkey,
         MAX(CASE WHEN l_shipdate > o_orderdate
                       + INTERVAL {LATE_SHIP_DAYS} DAY
                  THEN 1 ELSE 0 END) AS supp_late
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
per_order AS (
  SELECT o_orderkey,
         COUNT(*) AS n_supp,
         SUM(supp_late) AS n_late,
         MAX(CASE WHEN supp_late = 1 THEN l_suppkey END) AS late_supp
  FROM per_supp_order
  GROUP BY 1
)
SELECT s_suppkey, s_name,
       CAST(COUNT(*) AS BIGINT) AS n_blamed_orders
FROM per_order
JOIN supplier ON late_supp = s_suppkey
WHERE n_supp >= 2 AND n_late = 1
GROUP BY s_suppkey, s_name
ORDER BY n_blamed_orders DESC, s_suppkey
LIMIT {LONE_LATE_TOP_K}
"""

register("tpch_lone_late_supplier", _LONE_LATE_SQL)(
    tpch_lone_late_supplier
)


BIG_TICKET_PRICE = 400000


def tpch_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global-sales-opportunity): per nation, the
    customers whose account balance beats the positive-balance
    average but who have never placed a big-ticket order (totalprice
    above ``BIG_TICKET_PRICE``) — the decorrelated scalar subquery +
    anti-join pair. Q22's cntrycode grouping becomes the nation dim
    (this schema has nations, not phone prefixes), and its "no
    orders at all" predicate becomes "no big-ticket order" because
    this generator gives every customer SOME order — the anti-join
    machinery is identical, the filtered-orders build side is what
    Q22's EXISTS subquery decorrelates to anyway.

    Plan: the scalar average is one tiny aggregate broadcast back as
    a 1-row crossJoin; the never-big-ticket test is a LEFT-ANTI join
    of customer against the filtered orders key projection (filter
    pushes to the orders scan; shuffle keyed on custkey — AQE may
    broadcast the filtered side at small SF, and at 100 TB both
    sides shuffle, which is the right plan); nation broadcasts for
    the name. Balance sums are exact decimal through the rollup."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > BIG_TICKET_PRICE)
        .select("o_custkey")
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(25,6)"))
            .cast("double")
            .alias("total_acctbal"),
        )
    )


_IDLE_RICH_SQL = f"""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE)
           / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE)
           AS total_acctbal
FROM customer, avg_bal
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_totalprice > {BIG_TICKET_PRICE})
GROUP BY n_name
"""

register("tpch_idle_rich_customers", _IDLE_RICH_SQL)(
    tpch_idle_rich_customers
)


def tpch_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): revenue that would have
    been gained by eliminating small discounts on low-quantity items
    in one shipping year — the canonical pure filter-and-aggregate
    probe. Completes the engine's TPC-H family on this schema
    (Q2/9/11/12/20 need partsupp / ship-mode / receipt columns the
    testdata does not carry).

    Plan: every predicate pushes to the parquet scan (date range,
    discount band, quantity cap — all scan-level PushedFilters), the
    single revenue sum partial-aggregates map-side, and the result is
    one row. The discount band uses binary-exact literals (0.05/0.07
    are not exact doubles but PARSE identically in both engines from
    the same decimal strings — the shared-literal rule).

    Output: exact-decimal revenue through double + qualifying row
    count."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_quantity", "l_discount", "l_extendedprice"
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(
                F.col("l_extendedprice") * F.col("l_discount"), "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_FORECAST_REVENUE_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(25,6)))
            AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""

register("tpch_forecast_revenue", _FORECAST_REVENUE_SQL)(
    tpch_forecast_revenue
)


def orders_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal index: each (year, month)'s order count as a
    micro-ratio against ITS year's monthly average — index 1e6 = an
    average month, >1e6 = seasonal peak. The demand-planning staple
    next to events_seasonal_anomaly (which models the weekly cycle;
    this is the annual one on the orders fact).

    Pure integer rational: index_micro = (1e6·12·month_cnt) div
    year_cnt. One (year, month) rollup, one year re-rollup joined back
    by broadcast (≤ years rows) — no windows."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderdate")
    monthly = orders.groupBy(
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
    ).agg(F.count(F.lit(1)).alias("month_cnt"))
    yearly = monthly.groupBy("o_year").agg(
        F.sum("month_cnt").alias("year_cnt")
    )
    return monthly.join(F.broadcast(yearly), "o_year").select(
        "o_year",
        "o_month",
        F.col("month_cnt").cast("bigint").alias("month_cnt"),
        F.expr(
            "CAST((1000000 * 12 * month_cnt) div year_cnt AS BIGINT)"
        ).alias("index_micro"),
    )


register(
    "orders_seasonal_index",
    """
WITH monthly AS (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         EXTRACT(month FROM o_orderdate) AS o_month,
         COUNT(*) AS month_cnt
  FROM orders GROUP BY 1, 2
),
yearly AS (
  SELECT o_year, SUM(month_cnt) AS year_cnt FROM monthly GROUP BY 1
)
SELECT o_year, o_month,
       CAST(month_cnt AS BIGINT) AS month_cnt,
       CAST((1000000 * 12 * month_cnt) // year_cnt AS BIGINT)
           AS index_micro
FROM monthly JOIN yearly USING (o_year)
""",
)(orders_seasonal_index)


SURVIVAL_HORIZONS = [7, 14, 30, 60, 90]


def orders_gap_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase survival curve: per market segment, the
    micro-fraction of reorder gaps EXCEEDING each fixed horizon —
    S(t) at t ∈ {7,14,30,60,90} days, the retention-model input next
    to orders_gap_stats' moments (a curve says when customers churn;
    a mean doesn't).

    One per-customer LAG pass (the gaps), one conditional-sum rollup
    per segment with one column per horizon — the horizons are FIXED
    literals, so S(t) is pure integer counting: (1e6·n_gaps>t) div
    n_gaps. No windows beyond the LAG, no percentile machinery."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    gaps = (
        orders.withColumn("prev_date", F.lag("o_orderdate").over(w))
        .filter(F.col("prev_date").isNotNull())
        .select(
            "o_custkey",
            F.datediff("o_orderdate", "prev_date").alias("gap_days"),
        )
        .join(cust, F.col("o_custkey") == cust.c_custkey)
    )
    aggs = [F.count(F.lit(1)).alias("n_gaps")] + [
        F.sum((F.col("gap_days") > h).cast("long")).alias(f"gt_{h}")
        for h in SURVIVAL_HORIZONS
    ]
    out_cols = ["c_mktsegment", F.col("n_gaps").cast("bigint").alias("n_gaps")]
    for h in SURVIVAL_HORIZONS:
        out_cols.append(
            F.expr(f"CAST((1000000 * gt_{h}) div n_gaps AS BIGINT)").alias(
                f"s{h}_micro"
            )
        )
    return gaps.groupBy("c_mktsegment").agg(*aggs).select(*out_cols)


def _gap_survival_sql() -> str:
    sh = ",\n".join(
        f"       CAST((1000000 * SUM(CASE WHEN gap_days > {h} THEN 1"
        f" ELSE 0 END)) // COUNT(*) AS BIGINT) AS s{h}_micro"
        for h in SURVIVAL_HORIZONS
    )
    return f"""
WITH gaps AS (
  SELECT o_custkey,
         CAST(o_orderdate AS DATE)
           - CAST(LAG(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate
             ) AS DATE) AS gap_days
  FROM orders
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
{sh}
FROM gaps JOIN customer ON o_custkey = c_custkey
WHERE gap_days IS NOT NULL
GROUP BY c_mktsegment
"""


register("orders_gap_survival", _gap_survival_sql())(orders_gap_survival)


def tpch_nation_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per customer nation — the finance
    readout over the Q5 star: one fact rollup to (nation, year), then
    a LAG window over that tiny frame and an integer micro-ratio
    growth rate ((1e6·(cur − prev)) div prev computed on MILLI-unit
    revenues — micro-unit operands overflow int64 once 1e6·Δ exceeds
    2^63 at yearly-revenue magnitudes; the milli rescale (derived by
    the same floor-div in both engines) keeps every intermediate
    under ~1e16 while the reported revenue stays micro).

    Scale shape: the only fact-scale work is the star join + rollup
    (orders/customer shuffle on their keys, nation broadcasts); the
    LAG runs on ≤ nations × years rows."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rollup = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "o_year")
        .agg(
            F.floor(
                F.sum(revenue.cast("decimal(25,6)")).cast("double")
                * 1000000
            )
            .cast("bigint")
            .alias("revenue_micro")
        )
    )
    w = Window.partitionBy("n_name").orderBy("o_year")
    return (
        rollup.withColumn(
            "prev_micro", F.lag("revenue_micro").over(w)
        )
        .filter(F.col("prev_micro").isNotNull())
        .select(
            "n_name",
            "o_year",
            "revenue_micro",
            F.expr(
                "CAST((1000000 * ((revenue_micro div 1000)"
                " - (prev_micro div 1000)))"
                " div (prev_micro div 1000) AS BIGINT)"
            ).alias("yoy_growth_micro"),
        )
    )


register(
    "tpch_nation_yoy_growth",
    """
WITH rollup AS (
  SELECT n_name, EXTRACT(year FROM o_orderdate) AS o_year,
         CAST(FLOOR(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                  AS DECIMAL(25,6))) AS DOUBLE)
                    * 1000000) AS BIGINT) AS revenue_micro
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
),
lagged AS (
  SELECT n_name, o_year, revenue_micro,
         LAG(revenue_micro) OVER (PARTITION BY n_name
                                  ORDER BY o_year) AS prev_micro
  FROM rollup
)
SELECT n_name, CAST(o_year AS INT) AS o_year, revenue_micro,
       CAST((1000000 * (CAST(revenue_micro // 1000 AS BIGINT)
                        - CAST(prev_micro // 1000 AS BIGINT)))
            // CAST(prev_micro // 1000 AS BIGINT)
            AS BIGINT) AS yoy_growth_micro
FROM lagged WHERE prev_micro IS NOT NULL
""",
)(tpch_nation_yoy_growth)


IMPORTANT_NATION = "NATION_3"
IMPORTANT_PERMILLE = 1  # keep parts holding > 0.1% of national value


def tpch_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification) adapted to the
    available columns: per part, the traded value supplied from one
    nation, keeping only parts whose value exceeds a fixed fraction
    of the national total — the fraction compare is Q11's signature
    correlated scalar subquery (HAVING SUM(...) > total * f).

    All-integer arithmetic: prices land on the cent grid, so
    value_cents = Σ CAST(DECIMAL(25,6)·100 AS BIGINT) is exact int64;
    the threshold test is 1000·value > total (no division), and
    share_micro = (1e6·value) div total.

    Scale shape: lineitem ⋈ supplier keyed by suppkey — supplier is a
    bounded frame (SURVEY hint policy) and broadcast; the per-part
    rollup partial-aggregates map-side; the national total is a 1-row
    scalar broadcast. One fact scan, one shuffle keyed by partkey."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            load_table(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("n_name") == IMPORTANT_NATION)
        .select("s_suppkey")
    )
    cents = F.expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(25,6)) * 100 AS BIGINT)"
    )
    per_part = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(cents).alias("value_cents"))
    )
    total = per_part.agg(F.sum("value_cents").alias("total_cents"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_cents") * (1000 // IMPORTANT_PERMILLE)
            > F.col("total_cents")
        )
        .select(
            "l_partkey",
            F.col("value_cents").cast("bigint").alias("value_cents"),
            F.expr("(1000000 * value_cents) div total_cents")
            .cast("bigint")
            .alias("share_micro"),
        )
    )


register(
    "tpch_important_parts",
    f"""
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(CAST(l_extendedprice AS DECIMAL(25,6)) * 100 AS BIGINT))
           AS value_cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = '{IMPORTANT_NATION}'
  GROUP BY 1
),
tot AS (SELECT SUM(value_cents) AS total_cents FROM per_part)
SELECT l_partkey,
       CAST(value_cents AS BIGINT) AS value_cents,
       CAST((1000000 * value_cents) // total_cents AS BIGINT)
         AS share_micro
FROM per_part, tot
WHERE value_cents * {1000 // IMPORTANT_PERMILLE} > total_cents
""",
)(tpch_important_parts)


MIN_COST_REGION = "EUROPE"


def tpch_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier) adapted to the available
    columns: for every part traded in one region, the supplier
    offering the lowest observed unit price (extendedprice/quantity),
    ties to the smallest suppkey — Q2's correlated
    MIN(ps_supplycost) rewritten as a distributed argmin.

    Unit price in exact integer micro-units:
    (1e6·price-as-DECIMAL) div quantity — no decimal division, whose
    scale rules differ across engines. The argmin is an AGGREGATE
    max/min(struct(...)) — partial-combinable, no per-part window
    over the fact.

    Scale shape: lineitem ⋈ supplier(region-filtered) keyed by
    suppkey (supplier/nation/region are bounded frames, broadcast);
    one partkey-keyed shuffle for the argmin; the name joins run on
    the part-sized result, never the fact."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            load_table(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            load_table(spark, sf_dir, "region"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .filter(F.col("r_name") == MIN_COST_REGION)
        .select("s_suppkey", "s_name", "n_name")
    )
    unit = F.expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(25,6)) * 1000000 AS BIGINT)"
        " div CAST(l_quantity AS BIGINT)"
    )
    best = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .select("l_partkey", unit.alias("unit_micro"), "l_suppkey")
        .groupBy("l_partkey")
        .agg(
            F.min(F.struct("unit_micro", "l_suppkey")).alias("b")
        )
        .select(
            "l_partkey",
            F.col("b.unit_micro").alias("unit_micro"),
            F.col("b.l_suppkey").alias("s_suppkey"),
        )
    )
    return best.join(F.broadcast(supp), "s_suppkey").select(
        "l_partkey",
        F.col("unit_micro").cast("bigint").alias("unit_micro"),
        F.col("s_suppkey").cast("bigint").alias("s_suppkey"),
        "s_name",
        "n_name",
    )


register(
    "tpch_min_cost_supplier",
    f"""
WITH supp AS (
  SELECT s_suppkey, s_name, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{MIN_COST_REGION}'
),
unit AS (
  SELECT l_partkey,
         CAST(CAST(CAST(l_extendedprice AS DECIMAL(25,6)) * 1000000
                   AS BIGINT)
              // CAST(l_quantity AS BIGINT) AS BIGINT) AS unit_micro,
         l_suppkey
  FROM lineitem
  JOIN supp ON l_suppkey = s_suppkey
),
ranked AS (
  SELECT l_partkey, unit_micro, l_suppkey,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY unit_micro, l_suppkey) AS rn
  FROM unit
)
SELECT r.l_partkey,
       CAST(r.unit_micro AS BIGINT) AS unit_micro,
       CAST(r.l_suppkey AS BIGINT) AS s_suppkey,
       s.s_name, s.n_name
FROM ranked r JOIN supp s ON r.l_suppkey = s.s_suppkey
WHERE r.rn = 1
""",
)(tpch_min_cost_supplier)


def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value curve by acquisition cohort: customers
    are grouped by the month of their FIRST order; for each cohort ×
    months-since-acquisition cell, the active-customer count, the
    period revenue, and the cohort's cumulative revenue — the LTV
    table every growth/retention analysis starts from (the orders-fact
    twin of events_cohort_retention).

    Scale shape: the first-order date is a customer-keyed rollup
    joined back to orders on the same key (both sides shuffle-keyed by
    custkey; customer scales with the fact so NO broadcast hint); the
    cohort × month rollup is calendar-bounded (months², tiny), and the
    cumulative window runs over that rollup only. Month index is pure
    integer calendar arithmetic (y·12+m), revenue is exact int64
    cents."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    first = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_date")
    )
    cents = F.expr(
        "CAST(CAST(o_totalprice AS DECIMAL(25,6)) * 100 AS BIGINT)"
    )
    joined = orders.join(first, "o_custkey").select(
        "o_custkey",
        F.date_trunc("month", "first_date").cast("date").alias("cohort_month"),
        (
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            - (F.year("first_date") * 12 + F.month("first_date"))
        ).cast("int").alias("month_index"),
        cents.alias("cents"),
    )
    cell = joined.groupBy("cohort_month", "month_index").agg(
        F.countDistinct("o_custkey").cast("bigint").alias("n_active"),
        F.sum("cents").alias("revenue_cents"),
    )
    cum = Window.partitionBy("cohort_month").orderBy("month_index").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return cell.select(
        "cohort_month",
        "month_index",
        "n_active",
        F.col("revenue_cents").cast("bigint").alias("revenue_cents"),
        F.sum("revenue_cents").over(cum).cast("bigint").alias(
            "cum_revenue_cents"
        ),
    )


register(
    "orders_cohort_ltv",
    """
WITH first AS (
  SELECT o_custkey, MIN(o_orderdate) AS first_date
  FROM orders GROUP BY 1
),
joined AS (
  SELECT o.o_custkey,
         CAST(date_trunc('month', f.first_date) AS DATE) AS cohort_month,
         (year(o.o_orderdate) * 12 + month(o.o_orderdate))
           - (year(f.first_date) * 12 + month(f.first_date)) AS month_index,
         CAST(CAST(o.o_totalprice AS DECIMAL(25,6)) * 100 AS BIGINT) AS cents
  FROM orders o JOIN first f ON o.o_custkey = f.o_custkey
),
cell AS (
  SELECT cohort_month, CAST(month_index AS INT) AS month_index,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_active,
         CAST(SUM(cents) AS BIGINT) AS revenue_cents
  FROM joined GROUP BY 1, 2
)
SELECT cohort_month, month_index, n_active, revenue_cents,
       CAST(SUM(revenue_cents) OVER (
              PARTITION BY cohort_month ORDER BY month_index
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_revenue_cents
FROM cell
""",
)(orders_cohort_ltv)


LATE_DAYS = 90


def tpch_late_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / order priority) adapted to
    the available columns: classify each lineitem as LATE when it
    shipped more than {LATE_DAYS} days after its order date, then per
    order-priority report the high-priority and low-priority line
    counts among late vs on-time — Q12's signature two-way
    conditional aggregation (SUM(CASE WHEN priority IN high ...)).

    Scale shape: lineitem ⋈ orders is the single big join, an
    equi-join on the order key with NO broadcast hint (both scale with
    the fact — the round-7 hint policy); the conditional rollup
    partial-aggregates map-side into ≤|priorities| rows. Pure integer
    date arithmetic (datediff in days)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    is_late = (
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > LATE_DAYS
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        joined.groupBy(is_late.alias("is_late"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0))
            .cast("bigint")
            .alias("n_high_priority"),
            F.sum(F.when(is_high, 0).otherwise(1))
            .cast("bigint")
            .alias("n_low_priority"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


register(
    "tpch_late_by_priority",
    f"""
SELECT datediff('day', o_orderdate, CAST(l_shipdate AS DATE)) > {LATE_DAYS}
         AS is_late,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_high_priority,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS n_low_priority,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
""",
)(tpch_late_by_priority)


def orders_open_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily open-order backlog: how many orders have been placed but
    not yet (fully) shipped as of each day — the interval-overlap
    count every ops dashboard needs, computed WITHOUT a fact×calendar
    join: each order contributes a +1 delta at its order date and a
    −1 at its completion date (its LAST lineitem ship date), the
    deltas roll up per day, and a cumulative window over the
    calendar-bounded day rollup yields the running backlog.

    Scale shape: one orders scan + one lineitem scan; the
    order-completion rollup and the order⋈completion join key on
    o_orderkey (both fact-scale — no broadcast hint); after the delta
    rollup everything is calendar-sized. The cumulative window is
    unpartitioned but runs over ≤ |days| rows by construction —
    the bounded-domain exception to the single-partition-sort rule."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    done = li.groupBy("l_orderkey").agg(
        F.max(F.to_date("l_shipdate")).alias("done_date")
    )
    spans = orders.join(done, orders.o_orderkey == done.l_orderkey, "inner")
    deltas = spans.select(
        F.to_date("o_orderdate").alias("day"), F.lit(1).alias("d")
    ).unionAll(
        spans.select(F.col("done_date").alias("day"), F.lit(-1).alias("d"))
    )
    per_day = deltas.groupBy("day").agg(F.sum("d").alias("net"))
    from pyspark.sql import Window

    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_day.select(
        "day",
        F.col("net").cast("bigint").alias("net_change"),
        F.sum("net").over(w).cast("bigint").alias("open_backlog"),
    )


register(
    "orders_open_backlog",
    """
WITH done AS (
  SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS done_date
  FROM lineitem GROUP BY 1
),
spans AS (
  SELECT CAST(o.o_orderdate AS DATE) AS start_day, d.done_date
  FROM orders o JOIN done d ON o.o_orderkey = d.l_orderkey
),
deltas AS (
  SELECT start_day AS day, 1 AS d FROM spans
  UNION ALL
  SELECT done_date AS day, -1 AS d FROM spans
),
per_day AS (
  SELECT day, SUM(d) AS net FROM deltas GROUP BY 1
)
SELECT day,
       CAST(net AS BIGINT) AS net_change,
       CAST(SUM(net) OVER (ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS open_backlog
FROM per_day
""",
)(orders_open_backlog)


def region_nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent hierarchical rollup: revenue per (region,
    nation) with each nation's share WITHIN its region — the two-level
    drill-down table (region subtotal → nation share) OLAP front-ends
    render, computed with one window over the nation-sized rollup
    instead of a second aggregation + re-join.

    Scale shape: lineitem ⋈ orders ⋈ customer are fact-scale keyed
    equi-joins (no hints); nation/region broadcast; the share window
    partitions by region over ≤|nations| rows. Revenue in exact int64
    cents; share in micro-units by integer division."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    cents = F.expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(25,6)) * 100 AS BIGINT)"
    )
    rolled = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(cents).alias("revenue_cents"))
    )
    w = Window.partitionBy("r_name")
    return rolled.select(
        "r_name",
        "n_name",
        F.col("revenue_cents").cast("bigint").alias("revenue_cents"),
        F.sum("revenue_cents").over(w).cast("bigint").alias(
            "region_revenue_cents"
        ),
        F.expr(
            "CAST((1000000 * revenue_cents)"
            " div SUM(revenue_cents) OVER (PARTITION BY r_name)"
            " AS BIGINT)"
        ).alias("share_of_region_micro"),
    )


register(
    "region_nation_revenue_share",
    """
WITH rolled AS (
  SELECT r_name, n_name,
         SUM(CAST(CAST(l_extendedprice AS DECIMAL(25,6)) * 100 AS BIGINT))
           AS revenue_cents
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2
)
SELECT r_name, n_name,
       CAST(revenue_cents AS BIGINT) AS revenue_cents,
       CAST(SUM(revenue_cents) OVER (PARTITION BY r_name) AS BIGINT)
         AS region_revenue_cents,
       CAST((1000000 * revenue_cents)
            // SUM(revenue_cents) OVER (PARTITION BY r_name) AS BIGINT)
         AS share_of_region_micro
FROM rolled
""",
)(region_nation_revenue_share)


def nation_repeat_customer_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase rate by nation: per nation, the customers with
    at least one order, those with 2+, and the repeat share — the
    basic loyalty KPI (and the orders-side sibling of the events
    cohort/retention family).

    Scale shape: per-customer order counts key by custkey (fact-scale
    equi-join to customer, no hint); the nation rollup is
    nation-sized; shares are integer micro divisions."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buyers"),
            F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_repeat"),
        )
        .select(
            "n_name",
            "n_buyers",
            "n_repeat",
            F.expr("(1000000 * n_repeat) div n_buyers")
            .cast("bigint")
            .alias("repeat_share_micro"),
        )
    )


register(
    "nation_repeat_customer_rate",
    """
WITH per_cust AS (
  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY 1
)
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_buyers,
       CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repeat,
       CAST((1000000 * SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END))
            // COUNT(*) AS BIGINT) AS repeat_share_micro
FROM per_cust
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)(nation_repeat_customer_rate)


def supplier_delivery_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier reliability profile: per supplier, the count, mean,
    and variance of the ship delay (days between order and line ship
    date) — consistent slow beats erratic fast in fulfillment, so the
    VARIANCE is the ranking signal. Delay is integer days, and both
    moments are integer milli-unit divisions:
    mean_milli = (1000·Σd) div n,
    var_milli = (1000·Σd²) div n − (mean_milli²) div 1000
    — the deterministic int-division form of E[d²]−E[d]² (each div
    floors identically cross-engine; intermediates stay < 2^63 even
    at 10⁹ lines per supplier since d ≤ ~everything ships within a
    year).

    Scale shape: lineitem ⋈ orders keys on the order key (fact-scale,
    no hint); the supplier rollup partial-aggregates the three
    sufficient sums map-side; the name join runs on the
    supplier-sized result with supplier broadcast (bounded dim)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    d = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    sums = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("l_suppkey", d.alias("d"))
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("d").alias("sd"),
            F.sum(F.col("d").cast("long") * F.col("d")).alias("sdd"),
        )
    )
    stats = sums.select(
        "l_suppkey",
        "n",
        F.expr("(1000 * sd) div n").alias("mean_milli"),
        F.expr(
            "(1000 * sdd) div n"
            " - ((1000 * sd) div n) * ((1000 * sd) div n) div 1000"
        ).alias("var_milli"),
    )
    return stats.join(
        F.broadcast(supp), stats.l_suppkey == supp.s_suppkey
    ).select(
        F.col("s_suppkey").cast("bigint").alias("s_suppkey"),
        "s_name",
        F.col("n").cast("bigint").alias("n_lines"),
        F.col("mean_milli").cast("bigint").alias("mean_delay_milli"),
        F.col("var_milli").cast("bigint").alias("var_delay_milli"),
    )


register(
    "supplier_delivery_consistency",
    """
WITH sums AS (
  SELECT l_suppkey,
         COUNT(*) AS n,
         SUM(datediff('day', o_orderdate, CAST(l_shipdate AS DATE))) AS sd,
         SUM(CAST(datediff('day', o_orderdate, CAST(l_shipdate AS DATE))
                  AS BIGINT)
             * datediff('day', o_orderdate, CAST(l_shipdate AS DATE)))
           AS sdd
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1
),
stats AS (
  SELECT l_suppkey, n,
         CAST((1000 * sd) // n AS BIGINT) AS mean_milli,
         CAST((1000 * sdd) // n AS BIGINT)
           - CAST((CAST((1000 * sd) // n AS BIGINT)
                   * CAST((1000 * sd) // n AS BIGINT)) // 1000 AS BIGINT)
           AS var_milli
  FROM sums
)
SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey,
       s.s_name,
       CAST(st.n AS BIGINT) AS n_lines,
       st.mean_milli AS mean_delay_milli,
       CAST(st.var_milli AS BIGINT) AS var_delay_milli
FROM stats st JOIN supplier s ON st.l_suppkey = s.s_suppkey
""",
)(supplier_delivery_consistency)


BASE_YEAR = 1995


def lineitem_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres price index per year: how much the {BASE_YEAR} basket
    would cost at each year's prices — index_milli =
    1000·Σ p_y·q₀ / Σ p₀·q₀ over the MATCHED basket (parts traded in
    both the base year and year y; the standard fixed-basket price
    index, the economics twin of the YoY revenue view).

    Determinism: per-(part, year) unit prices are exact int64 micro
    ((1e4·rev_cents) div qty, intermediates < 2^53 so DuckDB's
    double-promoting // recovers the same integer); the two basket
    sums are exact integer sums; ONLY the final ratio goes through
    double — both engines cast the same exact integers and apply the
    same correctly-rounded divide, multiply, floor sequence.

    Scale shape: one (part, year) rollup off the fact (map-side
    combined); base-year frame and per-year joins key on partkey
    (part scales with the fact — no broadcast hint); the per-year
    index rollup is |years| rows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.year("l_shipdate").alias("yr"),
        "l_quantity",
        "l_extendedprice",
    )
    cents = F.expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(25,6)) * 100 AS BIGINT)"
    )
    py = (
        li.groupBy("l_partkey", "yr")
        .agg(
            F.sum(cents).alias("rev_cents"),
            F.sum(F.expr("CAST(l_quantity AS BIGINT)")).alias("qty"),
        )
        .select(
            "l_partkey",
            "yr",
            "qty",
            F.expr("(10000 * rev_cents) div qty").alias("p_micro"),
        )
    )
    base = py.filter(F.col("yr") == BASE_YEAR).select(
        "l_partkey",
        F.col("qty").alias("q0"),
        F.col("p_micro").alias("p0_micro"),
    )
    matched = py.filter(F.col("yr") != BASE_YEAR).join(base, "l_partkey")
    return (
        matched.groupBy("yr")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts_matched"),
            F.sum(F.col("p_micro") * F.col("q0")).alias("num"),
            F.sum(F.col("p0_micro") * F.col("q0")).alias("den"),
        )
        .select(
            F.col("yr").cast("int").alias("yr"),
            "n_parts_matched",
            F.floor(
                (F.col("num").cast("double") / F.col("den").cast("double"))
                * F.lit(1000.0)
            )
            .cast("bigint")
            .alias("index_milli"),
        )
    )


register(
    "lineitem_price_index",
    f"""
WITH py AS (
  SELECT l_partkey, year(l_shipdate) AS yr,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
         CAST((10000 * SUM(CAST(CAST(l_extendedprice AS DECIMAL(25,6))
                                * 100 AS BIGINT)))
              // SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS p_micro
  FROM lineitem
  GROUP BY 1, 2
),
base AS (
  SELECT l_partkey, qty AS q0, p_micro AS p0_micro
  FROM py WHERE yr = {BASE_YEAR}
),
matched AS (
  SELECT p.yr, p.p_micro, b.q0, b.p0_micro
  FROM py p JOIN base b ON p.l_partkey = b.l_partkey
  WHERE p.yr <> {BASE_YEAR}
)
SELECT CAST(yr AS INT) AS yr,
       CAST(COUNT(*) AS BIGINT) AS n_parts_matched,
       CAST(floor((CAST(SUM(p_micro * q0) AS DOUBLE)
                   / CAST(SUM(p0_micro * q0) AS DOUBLE)) * 1000.0)
            AS BIGINT) AS index_milli
FROM matched
GROUP BY yr
""",
)(lineitem_price_index)


PROFIT_PART_MARKER = "widget"
COST_FRACTION_PCT = 60  # supply cost proxy: 60% of retail price


def tpch_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year) adapted
    to the available columns: for parts whose name contains
    '{PROFIT_PART_MARKER}' (Q9's LIKE '%green%'), profit per
    (supplier nation, ship year) with the supply cost proxied as
    {COST_FRACTION_PCT}% of the part's retail price (the testdata has
    no partsupp) — profit = Σ(extprice·(1−disc) − cost·qty). This
    completes the 22/22 adapted TPC-H query-shape coverage.

    Exactness: revenue stays in the DECIMAL(25,6) lane (the
    extprice·(1−disc) product is exact on the cent×(1−disc on the
    0.01 grid) lattice); the cost proxy is integer cents
    ((cents·{COST_FRACTION_PCT}) div 100 per unit, times integer
    quantity); the final profit is reported in cents (int64).

    Scale shape: lineitem ⋈ orders keys the year; part (name-filtered,
    pushed to the scan) and supplier⋈nation join by their keys — part
    scales with the fact so NO hint on it; supplier/nation broadcast;
    the (nation, year) rollup is tiny and partial-aggregates."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains(PROFIT_PART_MARKER))
        .select("p_partkey", "p_retailprice")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            load_table(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    # price (2 decimals) x (1 - discount) (2 decimals) has EXACTLY 4
    # decimals, so x1e4 lands on integers and the bigint cast is exact
    # in both engines (a trailing cents division would hit Spark's
    # truncating vs DuckDB's flooring div on negative profits).
    rev_dmilli = F.expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(25,6))"
        " * (CAST(1 AS DECIMAL(25,6)) - CAST(l_discount AS DECIMAL(25,6)))"
        " * 10000 AS BIGINT)"
    )
    cost_dmilli = F.expr(
        "((CAST(CAST(p_retailprice AS DECIMAL(25,6)) * 100 AS BIGINT)"
        f" * {COST_FRACTION_PCT}) div 100) * 100"
        " * CAST(l_quantity AS BIGINT)"
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("n_name", "o_year")
        .agg(
            F.sum(rev_dmilli - cost_dmilli).cast("bigint").alias(
                "profit_dmilli"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
        .select(
            "n_name",
            F.col("o_year").cast("int").alias("o_year"),
            "profit_dmilli",
            "n_lines",
        )
    )


register(
    "tpch_product_profit",
    f"""
SELECT n_name,
       CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(SUM(
         CAST(CAST(l_extendedprice AS DECIMAL(25,6))
              * (CAST(1 AS DECIMAL(25,6))
                 - CAST(l_discount AS DECIMAL(25,6)))
              * 10000 AS BIGINT)
         - CAST((CAST(CAST(p_retailprice AS DECIMAL(25,6)) * 100 AS BIGINT)
                 * {COST_FRACTION_PCT}) // 100 AS BIGINT) * 100
           * CAST(l_quantity AS BIGINT)
       ) AS BIGINT) AS profit_dmilli,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%{PROFIT_PART_MARKER}%'
GROUP BY 1, 2
""",
)(tpch_product_profit)


MIGRATION_YEARS = (1995, 1996)
# fixed value bands in cents: the scale-safe banding (rank-based
# quartiles would need a customer-scale ordered window per year)
BAND_EDGES_CENTS = (10_000_000, 30_000_000)


def customer_value_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-band migration matrix: each customer's spend
    band in {MIGRATION_YEARS[0]} vs {MIGRATION_YEARS[1]} ('low' /
    'mid' / 'high' by fixed cent thresholds, 'none' when inactive
    that year), counted per (from, to) cell — the churn/upsell
    dashboard's core table. Fixed bands deliberately: rank-based
    quartiles would require a customer-scale ordered window per year
    (the single-partition trap); fixed thresholds band at scan speed
    and keep the matrix semantics.

    Scale shape: one orders scan → per (customer, year) rollup keyed
    by custkey (map-side combined); the two years FULL-OUTER join on
    custkey (same key, no re-shuffle); the matrix rollup is ≤4×4."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year("o_orderdate").alias("yr"),
        "o_totalprice",
    )
    cents = F.expr(
        "CAST(CAST(o_totalprice AS DECIMAL(25,6)) * 100 AS BIGINT)"
    )
    per_cy = (
        orders.filter(F.col("yr").isin(list(MIGRATION_YEARS)))
        .groupBy("o_custkey", "yr")
        .agg(F.sum(cents).alias("rev_cents"))
    )
    lo, hi = BAND_EDGES_CENTS
    band = (
        F.when(F.col("rev_cents") < lo, "low")
        .when(F.col("rev_cents") < hi, "mid")
        .otherwise("high")
    )
    y0 = per_cy.filter(F.col("yr") == MIGRATION_YEARS[0]).select(
        "o_custkey", band.alias("band_from")
    )
    y1 = per_cy.filter(F.col("yr") == MIGRATION_YEARS[1]).select(
        F.col("o_custkey").alias("cust_b"), band.alias("band_to")
    )
    joined = y0.join(
        y1, y0.o_custkey == y1.cust_b, "full_outer"
    ).select(
        F.coalesce(F.col("band_from"), F.lit("none")).alias("band_from"),
        F.coalesce(F.col("band_to"), F.lit("none")).alias("band_to"),
    )
    return joined.groupBy("band_from", "band_to").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    )


register(
    "customer_value_migration",
    f"""
WITH per_cy AS (
  SELECT o_custkey, year(o_orderdate) AS yr,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(25,6)) * 100 AS BIGINT))
           AS rev_cents
  FROM orders
  WHERE year(o_orderdate) IN {MIGRATION_YEARS}
  GROUP BY 1, 2
),
banded AS (
  SELECT o_custkey, yr,
         CASE WHEN rev_cents < {BAND_EDGES_CENTS[0]} THEN 'low'
              WHEN rev_cents < {BAND_EDGES_CENTS[1]} THEN 'mid'
              ELSE 'high' END AS band
  FROM per_cy
),
y0 AS (SELECT o_custkey, band FROM banded WHERE yr = {MIGRATION_YEARS[0]}),
y1 AS (SELECT o_custkey, band FROM banded WHERE yr = {MIGRATION_YEARS[1]})
SELECT COALESCE(y0.band, 'none') AS band_from,
       COALESCE(y1.band, 'none') AS band_to,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM y0 FULL OUTER JOIN y1 ON y0.o_custkey = y1.o_custkey
GROUP BY 1, 2
""",
)(customer_value_migration)


def orders_dow_uniformity_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week uniformity test: the χ² goodness-of-fit statistic
    for order placement across weekdays, in EXACT integer milli-units
    — χ² = Σ(obs−N/7)²/(N/7) rewritten as Σ(7·obs−N)² div (7·N) so
    no fractional expectation ever materializes (the closed form
    keeps every intermediate an int64 at the gate scales; at extreme
    N swap milli for centi units). Per-dow rows carry the observed
    count, each cell's contribution, and the shared total — the
    seasonality-significance companion to orders_seasonal_index
    (which measures the effect size; this measures the evidence).

    Scale shape: one orders scan → 7-row rollup (map-side combined);
    everything after is constant-sized."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.pmod(
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1995-01-02").cast("date")
            ),
            F.lit(7),
        ).alias("dow")
    )
    obs = orders.groupBy("dow").agg(F.count(F.lit(1)).alias("n_orders"))
    tot = obs.agg(F.sum("n_orders").alias("n_total"))
    scored = obs.crossJoin(F.broadcast(tot)).select(
        "dow",
        "n_orders",
        F.expr(
            "CAST((1000 * (7 * n_orders - n_total)"
            " * (7 * n_orders - n_total)) div (7 * n_total) AS BIGINT)"
        ).alias("chi2_contrib_milli"),
    )
    from pyspark.sql import Window

    return scored.select(
        F.col("dow").cast("int").alias("dow"),
        F.col("n_orders").cast("bigint").alias("n_orders"),
        "chi2_contrib_milli",
        F.sum("chi2_contrib_milli")
        .over(Window.partitionBy())
        .cast("bigint")
        .alias("chi2_total_milli"),
    )


register(
    "orders_dow_uniformity_chi2",
    """
WITH obs AS (
  SELECT (datediff('day', DATE '1995-01-02', CAST(o_orderdate AS DATE)) % 7
          + 7) % 7 AS dow,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1
),
tot AS (SELECT SUM(n_orders) AS n_total FROM obs),
scored AS (
  SELECT dow, n_orders,
         CAST((1000 * (7 * n_orders - n_total)
               * (7 * n_orders - n_total)) // (7 * n_total) AS BIGINT)
           AS chi2_contrib_milli
  FROM obs, tot
)
SELECT CAST(dow AS INT) AS dow,
       CAST(n_orders AS BIGINT) AS n_orders,
       chi2_contrib_milli,
       CAST(SUM(chi2_contrib_milli) OVER () AS BIGINT)
         AS chi2_total_milli
FROM scored
""",
)(orders_dow_uniformity_chi2)


SKYLINE_BAND_CENTS = 5_000  # $50 price bands for the parallel phase


def part_price_size_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) of the part catalog on (minimize
    retail price, maximize size): the parts no other part beats on
    both axes — the multi-criteria shortlist operator (SKYLINE OF in
    research SQL dialects; no Spark native equivalent).

    Two-phase band-parallel plan: distinct (price, size) pairs bucket
    into $50 price bands; WITHIN each band a (price asc, size desc)
    ordered window marks pairs whose preceding-frame max size reaches
    them (preceding rows have strictly lower price, or equal price
    and strictly larger size — in both cases frame-max ≥ mine is
    exact dominance on distinct pairs); ACROSS bands, a pair must
    also exceed the running max size of all strictly-cheaper bands (a
    band-domain cumulative, bounded rows). No global sort: the
    per-band windows are parallel and the cross-band pass runs over
    the band rollup only. Survivors join back to the catalog for ids
    (min partkey per surviving pair reported)."""
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.expr(
            "CAST(CAST(p_retailprice AS DECIMAL(25,6)) * 100 AS BIGINT)"
        ).alias("price_cents"),
        F.col("p_size").cast("bigint").alias("size"),
    )
    pairs = part.groupBy("price_cents", "size").agg(
        F.min("p_partkey").alias("rep_partkey"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    banded = pairs.withColumn(
        "band", F.expr(f"price_cents div {SKYLINE_BAND_CENTS}")
    )
    w_in = (
        Window.partitionBy("band")
        .orderBy(F.asc("price_cents"), F.desc("size"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = banded.withColumn("prev_max", F.max("size").over(w_in)).filter(
        (F.col("prev_max").isNull()) | (F.col("size") > F.col("prev_max"))
    )
    band_max = banded.groupBy("band").agg(F.max("size").alias("bmax"))
    w_band = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cheaper = band_max.withColumn(
        "cheaper_max", F.max("bmax").over(w_band)
    ).select("band", "cheaper_max")
    return (
        local.join(cheaper, "band")
        .filter(
            (F.col("cheaper_max").isNull())
            | (F.col("size") > F.col("cheaper_max"))
        )
        .select(
            F.col("rep_partkey").cast("bigint").alias("rep_partkey"),
            "price_cents",
            F.col("size").cast("int").alias("p_size"),
            F.col("n_parts").cast("bigint").alias("n_parts_at_point"),
        )
    )


register(
    "part_price_size_skyline",
    f"""
WITH part_p AS (
  SELECT p_partkey,
         CAST(CAST(p_retailprice AS DECIMAL(25,6)) * 100 AS BIGINT)
           AS price_cents,
         CAST(p_size AS BIGINT) AS size
  FROM part
),
pairs AS (
  SELECT price_cents, size,
         MIN(p_partkey) AS rep_partkey, COUNT(*) AS n_parts
  FROM part_p GROUP BY 1, 2
),
banded AS (
  SELECT *, CAST(price_cents // {SKYLINE_BAND_CENTS} AS BIGINT) AS band
  FROM pairs
),
local AS (
  SELECT * FROM (
    SELECT *,
           MAX(size) OVER (PARTITION BY band
                           ORDER BY price_cents ASC, size DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS prev_max
    FROM banded
  ) WHERE prev_max IS NULL OR size > prev_max
),
band_max AS (SELECT band, MAX(size) AS bmax FROM banded GROUP BY 1),
cheaper AS (
  SELECT band,
         MAX(bmax) OVER (ORDER BY band
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS cheaper_max
  FROM band_max
)
SELECT CAST(l.rep_partkey AS BIGINT) AS rep_partkey,
       l.price_cents,
       CAST(l.size AS INT) AS p_size,
       CAST(l.n_parts AS BIGINT) AS n_parts_at_point
FROM local l JOIN cheaper c ON l.band = c.band
WHERE c.cheaper_max IS NULL OR l.size > c.cheaper_max
""",
)(part_price_size_skyline)


def orders_cumulative_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct-customer curve by month WITHOUT a rolling
    COUNT(DISTINCT): each customer contributes once at their first
    order month; the monthly first-appearance counts then cumulate
    over the calendar-bounded month rollup — the standard trick that
    turns an unmergeable rolling distinct into a distributive sum
    (the exact-arithmetic sibling of the HLL approach).

    Scale shape: per-customer min-month rollup keyed by custkey, a
    month-sized rollup, and a cumulative window over months only."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.date_trunc("month", "o_orderdate").cast("date").alias("m"),
    )
    first = orders.groupBy("o_custkey").agg(F.min("m").alias("first_m"))
    monthly = first.groupBy("first_m").agg(
        F.count(F.lit(1)).alias("n_new_customers")
    )
    w = Window.orderBy("first_m").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return monthly.select(
        F.col("first_m").alias("m"),
        F.col("n_new_customers").cast("bigint").alias("n_new_customers"),
        F.sum("n_new_customers")
        .over(w)
        .cast("bigint")
        .alias("cum_customers"),
    )


register(
    "orders_cumulative_customers",
    """
WITH first AS (
  SELECT o_custkey,
         MIN(CAST(date_trunc('month', o_orderdate) AS DATE)) AS first_m
  FROM orders GROUP BY 1
),
monthly AS (
  SELECT first_m, COUNT(*) AS n_new_customers FROM first GROUP BY 1
)
SELECT first_m AS m,
       CAST(n_new_customers AS BIGINT) AS n_new_customers,
       CAST(SUM(n_new_customers) OVER (ORDER BY first_m
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS BIGINT)
         AS cum_customers
FROM monthly
""",
)(orders_cumulative_customers)


def orders_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth-accounting bridge (the SaaS/marketplace GMV
    decomposition): month-over-month revenue change split into NEW
    (first-ever month), RESURRECTED (returning after absence),
    EXPANSION (same customer spending more), CONTRACTION (spending
    less), and CHURNED (present last month, absent now) — with the
    accounting identity gmv_m − gmv_{m−1} = new + resurrected +
    expansion − contraction − churned holding EXACTLY in integer
    cents (pinned by an invariant test).

    Scale shape: per-(customer, month) rollup keyed by custkey; the
    month-pair comparison is a self-join on (custkey, month+1) — the
    same key family, no broadcast of anything customer-scaled; the
    monthly bridge is a calendar-sized rollup. Month arithmetic is
    integer (y·12+m)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate")
        ).alias("mi"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(25,6)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    cm = orders.groupBy("o_custkey", "mi").agg(
        F.sum("cents").alias("rev")
    )
    first = cm.groupBy("o_custkey").agg(F.min("mi").alias("first_mi"))
    cur = cm.select("o_custkey", "mi", F.col("rev").alias("rev_cur"))
    prev = cm.select(
        "o_custkey",
        (F.col("mi") + 1).alias("mi"),
        F.col("rev").alias("rev_prev"),
    )
    paired = (
        cur.join(prev, ["o_custkey", "mi"], "full_outer")
        .join(first, "o_custkey")
        .filter(F.col("mi") > F.col("first_mi"))  # first month rows are
        # emitted by the 'new' classification below via their own mi
        .unionByName(
            cm.join(first, "o_custkey")
            .filter(F.col("mi") == F.col("first_mi"))
            .select(
                "o_custkey",
                "mi",
                F.col("rev").alias("rev_cur"),
                F.lit(None).cast("long").alias("rev_prev"),
                "first_mi",
            )
        )
    )
    is_new = (F.col("mi") == F.col("first_mi"))
    cls = paired.select(
        "mi",
        F.coalesce("rev_cur", F.lit(0)).alias("rc"),
        F.coalesce("rev_prev", F.lit(0)).alias("rp"),
        F.when(is_new, "new")
        .when(F.col("rev_cur").isNull(), "churned")
        .when(F.col("rev_prev").isNull(), "resurrected")
        .when(F.col("rc") >= F.col("rp"), "expansion")
        .otherwise("contraction")
        .alias("cls"),
    )
    return (
        cls.groupBy("mi")
        .agg(
            F.sum("rc").cast("bigint").alias("gmv_cents"),
            F.sum(F.when(F.col("cls") == "new", F.col("rc")).otherwise(0))
            .cast("bigint")
            .alias("new_cents"),
            F.sum(
                F.when(F.col("cls") == "resurrected", F.col("rc")).otherwise(0)
            )
            .cast("bigint")
            .alias("resurrected_cents"),
            F.sum(
                F.when(
                    F.col("cls") == "expansion", F.col("rc") - F.col("rp")
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("expansion_cents"),
            F.sum(
                F.when(
                    F.col("cls") == "contraction", F.col("rp") - F.col("rc")
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("contraction_cents"),
            F.sum(
                F.when(F.col("cls") == "churned", F.col("rp")).otherwise(0)
            )
            .cast("bigint")
            .alias("churned_cents"),
        )
        .select(
            F.col("mi").cast("int").alias("month_index"),
            "gmv_cents",
            "new_cents",
            "resurrected_cents",
            "expansion_cents",
            "contraction_cents",
            "churned_cents",
        )
    )


register(
    "orders_growth_accounting",
    """
WITH cm AS (
  SELECT o_custkey,
         year(o_orderdate) * 12 + month(o_orderdate) AS mi,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(25,6)) * 100 AS BIGINT))
           AS rev
  FROM orders GROUP BY 1, 2
),
first AS (SELECT o_custkey, MIN(mi) AS first_mi FROM cm GROUP BY 1),
paired AS (
  SELECT COALESCE(c.o_custkey, p.o_custkey) AS o_custkey,
         COALESCE(c.mi, p.mi + 1) AS mi,
         c.rev AS rev_cur, p.rev AS rev_prev
  FROM cm c
  FULL OUTER JOIN cm p
    ON c.o_custkey = p.o_custkey AND c.mi = p.mi + 1
),
tagged AS (
  SELECT pr.mi,
         COALESCE(pr.rev_cur, 0) AS rc,
         COALESCE(pr.rev_prev, 0) AS rp,
         CASE WHEN pr.mi = f.first_mi THEN 'new'
              WHEN pr.rev_cur IS NULL THEN 'churned'
              WHEN pr.rev_prev IS NULL THEN 'resurrected'
              WHEN COALESCE(pr.rev_cur, 0) >= COALESCE(pr.rev_prev, 0)
                THEN 'expansion'
              ELSE 'contraction' END AS cls
  FROM paired pr JOIN first f ON pr.o_custkey = f.o_custkey
  WHERE pr.mi >= f.first_mi
)
SELECT CAST(mi AS INT) AS month_index,
       CAST(SUM(rc) AS BIGINT) AS gmv_cents,
       CAST(SUM(CASE WHEN cls = 'new' THEN rc ELSE 0 END) AS BIGINT)
         AS new_cents,
       CAST(SUM(CASE WHEN cls = 'resurrected' THEN rc ELSE 0 END) AS BIGINT)
         AS resurrected_cents,
       CAST(SUM(CASE WHEN cls = 'expansion' THEN rc - rp ELSE 0 END)
            AS BIGINT) AS expansion_cents,
       CAST(SUM(CASE WHEN cls = 'contraction' THEN rp - rc ELSE 0 END)
            AS BIGINT) AS contraction_cents,
       CAST(SUM(CASE WHEN cls = 'churned' THEN rp ELSE 0 END) AS BIGINT)
         AS churned_cents
FROM tagged
GROUP BY mi
""",
)(orders_growth_accounting)


# ---------------------------------------------------------------------------
# Demand-curve slope per brand (OLS over exact integer moments)
# ---------------------------------------------------------------------------


def part_demand_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand demand-curve estimation: the OLS slope of each
    part's total quantity sold on its retail price —
    slope = (nΣxy − ΣxΣy)/(nΣxx − (Σx)²) over the brand's parts,
    the first-order price-sensitivity readout a pricing team runs
    (negative slope = demand falls with price). Pure-integer
    sufficient moments (price sits on the cent grid, quantities are
    integers), one fixed-shape double division per brand, rounded at
    9; single-part or constant-price brands emit NULL.

    Scale shape: lineitem → per-part quantity rollup (map-side
    combined) → broadcast-eligible join onto part (scales with the
    part dim, not the fact) → |brands| moment rollup. The fact is
    touched once and only its two needed columns are read."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    qty = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("y")
    )
    joined = qty.join(
        part, qty.l_partkey == part.p_partkey
    ).select(
        "p_brand",
        F.expr(
            "CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
        ).alias("x"),
        "y",
    )
    agg = joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxxd = F.col("sxx").cast("double")
    sxyd = F.col("sxy").cast("double")
    den = nd * sxxd - sxd * sxd
    slope = (nd * sxyd - sxd * syd) / den
    return agg.select(
        "p_brand",
        F.col("n").cast("bigint").alias("n_parts"),
        F.col("sx").cast("bigint").alias("price_cents_sum"),
        F.col("sy").cast("bigint").alias("qty_sum"),
        F.when(den > 0, F.round(slope, 9)).alias("qty_per_cent_slope"),
    )


register(
    "part_demand_curve",
    """
WITH qty AS (
  SELECT l_partkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS y
  FROM lineitem GROUP BY 1
),
joined AS (
  SELECT p.p_brand,
         CAST(CAST(p.p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
         q.y
  FROM qty q JOIN part p ON q.l_partkey = p.p_partkey
),
agg AS (
  SELECT p_brand, COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM joined GROUP BY 1
)
SELECT p_brand,
       CAST(n AS BIGINT) AS n_parts,
       sx AS price_cents_sum,
       sy AS qty_sum,
       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
            THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 9)
            END AS qty_per_cent_slope
FROM agg
""",
)(part_demand_curve)


# ---------------------------------------------------------------------------
# Economic complexity (method of reflections)
# ---------------------------------------------------------------------------

ECI_SCALE = 1_000_000


def nation_product_complexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Economic-complexity readout (Hidalgo-Hausmann method of
    reflections) over the nation × part export matrix: a nation's
    RCA-filtered export basket (comparative advantage as a pure
    integer cross-multiplication — x_np·X_total > X_n·X_p, no
    division), then two reflections — k_c1 = mean ubiquity of the
    nation's advantaged products, k_c2 = mean of those products' mean
    exporter diversity — the k_c2 ordering is the classic ECI proxy:
    LOW mean-ubiquity-of-diverse-exporters = complex economy.
    Divisions are integer micro floors, so every score is an exact
    int64 both engines agree on.

    Scale shape: lineitem ⋈ supplier (broadcast-eligible dim) folds to
    the (nation × part) export rollup in one fact pass; everything
    after runs on that ≤|nations|·|parts| matrix — reflections are
    keyed join+rollup rounds on the advantaged-edge list."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    part_side = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", "l_extendedprice"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    # export value in integer dollars (cents div 100 keeps the RCA
    # cross-products inside int64 at bench scales)
    x = (
        part_side.join(F.broadcast(supplier), part_side.l_suppkey == supplier.s_suppkey)
        .select(
            F.col("s_nationkey").alias("nk"),
            F.col("l_partkey").alias("pk"),
            F.expr(
                "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100"
                " AS BIGINT) div 100"
            ).alias("v"),
        )
        .groupBy("nk", "pk")
        .agg(F.sum("v").alias("x_np"))
        .localCheckpoint(eager=True)
    )
    xn = x.groupBy("nk").agg(F.sum("x_np").alias("x_n"))
    xp = x.groupBy("pk").agg(F.sum("x_np").alias("x_p"))
    xt = x.agg(F.sum("x_np").alias("x_t"))
    m = (
        x.join(xn, "nk")
        .join(xp, "pk")
        .crossJoin(F.broadcast(xt))
        .filter(F.col("x_np") * F.col("x_t") > F.col("x_n") * F.col("x_p"))
        .select("nk", "pk")
        .localCheckpoint(eager=True)
    )
    kc0 = m.groupBy("nk").agg(F.count(F.lit(1)).alias("kc0"))
    kp0 = m.groupBy("pk").agg(F.count(F.lit(1)).alias("kp0"))
    kc1 = (
        m.join(kp0, "pk")
        .groupBy("nk")
        .agg(F.sum("kp0").alias("s"))
        .join(kc0, "nk")
        .select(
            "nk",
            F.expr(
                f"(s * CAST({ECI_SCALE} AS BIGINT)) div kc0"
            ).alias("kc1_micro"),
        )
    )
    kp1 = (
        m.join(kc0, "nk")
        .groupBy("pk")
        .agg(F.sum("kc0").alias("s"))
        .join(kp0, "pk")
        .select(
            "pk",
            F.expr(
                f"(s * CAST({ECI_SCALE} AS BIGINT)) div kp0"
            ).alias("kp1_micro"),
        )
    )
    kc2 = (
        m.join(kp1, "pk")
        .groupBy("nk")
        .agg(F.sum("kp1_micro").alias("s"))
        .join(kc0, "nk")
        .select("nk", F.expr("s div kc0").alias("kc2_micro"))
    )
    return (
        kc0.join(kc1, "nk")
        .join(kc2, "nk")
        .join(nation, kc0.nk == nation.n_nationkey)
        .select(
            "n_name",
            F.col("kc0").cast("bigint").alias("diversity"),
            F.col("kc1_micro").cast("bigint").alias("kc1_micro"),
            F.col("kc2_micro").cast("bigint").alias("kc2_micro"),
        )
    )


register(
    "nation_product_complexity",
    f"""
WITH x AS (
  SELECT s.s_nationkey AS nk, l.l_partkey AS pk,
         CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(14,2)) * 100
                       AS BIGINT) // 100) AS BIGINT) AS x_np
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
),
xn AS (SELECT nk, CAST(SUM(x_np) AS BIGINT) AS x_n FROM x GROUP BY 1),
xp AS (SELECT pk, CAST(SUM(x_np) AS BIGINT) AS x_p FROM x GROUP BY 1),
xt AS (SELECT CAST(SUM(x_np) AS BIGINT) AS x_t FROM x),
m AS (
  SELECT x.nk, x.pk
  FROM x JOIN xn ON x.nk = xn.nk JOIN xp ON x.pk = xp.pk
  CROSS JOIN xt
  WHERE x.x_np * xt.x_t > xn.x_n * xp.x_p
),
kc0 AS (SELECT nk, COUNT(*) AS kc0 FROM m GROUP BY 1),
kp0 AS (SELECT pk, COUNT(*) AS kp0 FROM m GROUP BY 1),
kc1 AS (
  SELECT s.nk,
         CAST((s.s * CAST({ECI_SCALE} AS BIGINT)) // c.kc0 AS BIGINT)
           AS kc1_micro
  FROM (SELECT m.nk, CAST(SUM(k.kp0) AS BIGINT) AS s
        FROM m JOIN kp0 k ON m.pk = k.pk GROUP BY 1) s
  JOIN kc0 c ON s.nk = c.nk
),
kp1 AS (
  SELECT s.pk,
         CAST((s.s * CAST({ECI_SCALE} AS BIGINT)) // p.kp0 AS BIGINT)
           AS kp1_micro
  FROM (SELECT m.pk, CAST(SUM(k.kc0) AS BIGINT) AS s
        FROM m JOIN kc0 k ON m.nk = k.nk GROUP BY 1) s
  JOIN kp0 p ON s.pk = p.pk
),
kc2 AS (
  SELECT s.nk, CAST(s.s // c.kc0 AS BIGINT) AS kc2_micro
  FROM (SELECT m.nk, CAST(SUM(k.kp1_micro) AS BIGINT) AS s
        FROM m JOIN kp1 k ON m.pk = k.pk GROUP BY 1) s
  JOIN kc0 c ON s.nk = c.nk
)
SELECT n.n_name,
       CAST(c0.kc0 AS BIGINT) AS diversity,
       c1.kc1_micro,
       c2.kc2_micro
FROM kc0 c0
JOIN kc1 c1 ON c0.nk = c1.nk
JOIN kc2 c2 ON c0.nk = c2.nk
JOIN nation n ON c0.nk = n.n_nationkey
""",
)(nation_product_complexity)


# ---------------------------------------------------------------------------
# One-way ANOVA: lead time by ship mode
# ---------------------------------------------------------------------------


def lineitem_leadtime_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic for order-to-ship delay
    (l_shipdate − o_orderdate, integer days) across the five order
    priorities — the k-group generalization of ``events_welch_ttest``,
    answering whether priority actually moves shipping latency beyond
    noise (the statistical sequel to the Q4 priority-check counts).
    Per-priority rows carry the group moments and milli mean; the
    pooled F rides every row (the CUPED repeated-scalar shape).

    Exactness: the between/within sums of squares are built from
    integer floor divisions only — A = Σ_g ⌊S_g²/n_g⌋ (each term ≤1
    below the rational value, documented floored variant), SSB =
    A − ⌊S²/n⌋, SSW = Q − A — so both engines agree bit-for-bit on
    the integer decomposition; F is one fixed-shape double ratio over
    those exact integers, rounded at 9.

    Scale shape: lineitem ⋈ orders is the one keyed fact shuffle
    (no broadcast hint — AQE decides); the result folds to |priority|
    rows of (n, Σd, Σd²) with map-side combine; the pooled scalars
    broadcast back."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    d = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority",
        F.expr("datediff(l_shipdate, o_orderdate)").alias("d"),
    )
    g = d.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum(F.col("d").cast("bigint")).alias("s_g"),
        F.sum((F.col("d") * F.col("d")).cast("bigint")).alias("q_g"),
    )
    pooled = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("q_g").alias("q"),
        F.sum(F.expr("(s_g * s_g) div n_g")).alias("a"),
    )
    j = g.crossJoin(F.broadcast(pooled))
    ssb = F.col("a") - F.expr("(s * s) div n")
    ssw = F.col("q") - F.col("a")
    f_stat = (
        ssb.cast("double") / (F.col("k") - F.lit(1)).cast("double")
    ) / (
        ssw.cast("double") / (F.col("n") - F.col("k")).cast("double")
    )
    ok = (F.col("k") > 1) & (F.col("n") > F.col("k")) & (ssw > 0)
    return j.select(
        "o_orderpriority",
        F.col("n_g").cast("bigint").alias("n_lineitems"),
        F.col("s_g").cast("bigint").alias("delay_days_sum"),
        F.expr("CAST((1000 * s_g) div n_g AS BIGINT)").alias(
            "mean_delay_milli"
        ),
        ssb.cast("bigint").alias("ssb_days2"),
        ssw.cast("bigint").alias("ssw_days2"),
        F.when(ok, F.round(f_stat, 9)).alias("f_stat"),
    )


register(
    "lineitem_leadtime_anova",
    """
WITH d AS (
  SELECT o.o_orderpriority,
         datediff('day', o.o_orderdate, l.l_shipdate) AS d
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
g AS (
  SELECT o_orderpriority, COUNT(*) AS n_g,
         CAST(SUM(CAST(d AS BIGINT)) AS BIGINT) AS s_g,
         CAST(SUM(CAST(d * d AS BIGINT)) AS BIGINT) AS q_g
  FROM d GROUP BY 1
),
pooled AS (
  SELECT COUNT(*) AS k,
         CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(SUM(s_g) AS BIGINT) AS s,
         CAST(SUM(q_g) AS BIGINT) AS q,
         CAST(SUM(CAST((s_g * s_g) // n_g AS BIGINT)) AS BIGINT) AS a
  FROM g
)
SELECT o_orderpriority,
       CAST(n_g AS BIGINT) AS n_lineitems,
       s_g AS delay_days_sum,
       CAST((1000 * s_g) // n_g AS BIGINT) AS mean_delay_milli,
       CAST(a - CAST((s * s) // n AS BIGINT) AS BIGINT) AS ssb_days2,
       CAST(q - a AS BIGINT) AS ssw_days2,
       CASE WHEN k > 1 AND n > k AND q - a > 0
            THEN round((CAST(a - CAST((s * s) // n AS BIGINT) AS DOUBLE)
                        / CAST(k - 1 AS DOUBLE))
                       / (CAST(q - a AS DOUBLE)
                          / CAST(n - k AS DOUBLE)), 9)
            END AS f_stat
FROM g CROSS JOIN pooled
""",
)(lineitem_leadtime_anova)


# ---------------------------------------------------------------------------
# RFM segmentation (round 9)
# ---------------------------------------------------------------------------

RFM_BINS = 5


def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quintile segmentation —
    the classic CRM cube: every customer scored 1-{RFM_BINS} on how
    recently they ordered (quintile 1 = most recent), how often, and
    how much (quintile {RFM_BINS} = most/highest), then counted per
    (r,f,m) cell.

    Scale shape: quintiles come from the equi-depth bin formula
    (((cum − c)·B) div n + 1, ``events_value_equidepth_bins``'s
    adjudicated idiom) over each measure's DISTINCT-VALUE rollup.
    Count-of-counts bounds the recency (a few thousand distinct days)
    and frequency (small ints) rollups, but ``monetary_centi`` is
    near-unique per customer, so its rollup is ~|customers| rows — an
    un-partitioned cumulative window over it would funnel 10^9 rows
    through ONE task (VERDICT r9 #1). Each cumulative therefore runs
    through :func:`common.distributed_prefix_sum`: range-repartition
    on the measure, per-partition subtotals → broadcast offsets,
    window PARTITIONED by the pinned range-partition id — no
    Exchange SinglePartition anywhere (contract-pinned in
    test_plan_contracts.test_rfm_abc_prefix_sum_partitioned). The
    three quintile maps join back on value equality; the final cube
    is <= {RFM_BINS}³ rows. All integer: days, counts, exact centi."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_day"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(
            (F.col("o_totalprice").cast("decimal(14,2)") * 100).cast(
                "bigint"
            )
        ).alias("monetary_centi"),
    )
    gmax = orders.agg(F.max(F.to_date("o_orderdate")).alias("gday"))
    # one fact scan, structurally: the rollup is localCheckpointed so
    # the three quintile maps and the score join all consume the
    # materialized frame (ExistingRDD) instead of re-scanning orders
    cust = (
        per_cust.crossJoin(F.broadcast(gmax))
        .withColumn("recency_days", F.datediff("gday", "last_day"))
        .localCheckpoint(eager=True)
    )

    n_cust = cust.count()  # bounded scalar over the checkpointed rollup

    def quintiles(measure: str):
        from smart_meter_data_pipeline_spark.operators.common import (
            distributed_prefix_sum,
        )

        dist = cust.groupBy(measure).agg(F.count(F.lit(1)).alias("c"))
        cum = distributed_prefix_sum(dist, [F.col(measure)], "c", "cum")
        return cum.select(
            measure,
            F.expr(
                f"CAST(((cum - c) * {RFM_BINS})"
                f" div CAST({n_cust} AS BIGINT) + 1 AS INT)"
            ).alias(f"{measure}_q"),
        )

    scored = (
        cust.join(quintiles("recency_days"), "recency_days")
        .join(quintiles("freq"), "freq")
        .join(quintiles("monetary_centi"), "monetary_centi")
    )
    return (
        scored.groupBy("recency_days_q", "freq_q", "monetary_centi_q")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary_centi").alias("cell_monetary_centi"),
        )
        .select(
            F.col("recency_days_q").cast("int").alias("r_q"),
            F.col("freq_q").cast("int").alias("f_q"),
            F.col("monetary_centi_q").cast("int").alias("m_q"),
            F.col("n_customers").cast("bigint").alias("n_customers"),
            F.col("cell_monetary_centi")
            .cast("bigint")
            .alias("cell_monetary_centi"),
        )
    )


register(
    "orders_rfm_segments",
    f"""
WITH per_cust AS (
  SELECT o_custkey,
         MAX(CAST(o_orderdate AS DATE)) AS last_day,
         COUNT(*) AS freq,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                       AS BIGINT)) AS BIGINT) AS monetary_centi
  FROM orders GROUP BY 1
),
cust AS (
  SELECT p.*,
         date_diff('day', p.last_day,
                   (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders))
           AS recency_days
  FROM per_cust p
),
rq AS (
  SELECT recency_days,
         CAST(((SUM(c) OVER (ORDER BY recency_days ROWS BETWEEN
                UNBOUNDED PRECEDING AND CURRENT ROW) - c)
               * {RFM_BINS}) // SUM(c) OVER () + 1 AS INT)
           AS recency_days_q
  FROM (SELECT recency_days, COUNT(*) AS c FROM cust GROUP BY 1)
),
fq AS (
  SELECT freq,
         CAST(((SUM(c) OVER (ORDER BY freq ROWS BETWEEN
                UNBOUNDED PRECEDING AND CURRENT ROW) - c)
               * {RFM_BINS}) // SUM(c) OVER () + 1 AS INT) AS freq_q
  FROM (SELECT freq, COUNT(*) AS c FROM cust GROUP BY 1)
),
mq AS (
  SELECT monetary_centi,
         CAST(((SUM(c) OVER (ORDER BY monetary_centi ROWS BETWEEN
                UNBOUNDED PRECEDING AND CURRENT ROW) - c)
               * {RFM_BINS}) // SUM(c) OVER () + 1 AS INT)
           AS monetary_centi_q
  FROM (SELECT monetary_centi, COUNT(*) AS c FROM cust GROUP BY 1)
)
SELECT CAST(r.recency_days_q AS INT) AS r_q,
       CAST(f.freq_q AS INT) AS f_q,
       CAST(m.monetary_centi_q AS INT) AS m_q,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(c.monetary_centi) AS BIGINT) AS cell_monetary_centi
FROM cust c
JOIN rq r ON r.recency_days = c.recency_days
JOIN fq f ON f.freq = c.freq
JOIN mq m ON m.monetary_centi = c.monetary_centi
GROUP BY 1, 2, 3
""",
)(orders_rfm_segments)


# ---------------------------------------------------------------------------
# Pareto / ABC analysis (round 9)
# ---------------------------------------------------------------------------

ABC_A_MILLI = 800   # A: first 80% of revenue
ABC_B_MILLI = 950   # B: next 15%; C: the tail


def part_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC inventory classification: parts ranked by revenue,
    classified A/B/C by their position in the CUMULATIVE revenue share
    (A = the head that carries 80%, B = to 95%, C = tail) — the 80/20
    screen every supply-chain and catalog team runs.

    Scale shape: fact → per-part exact-centi revenue rollup (map-side
    combined); the cumulative runs over the PART-level rollup ordered
    by revenue — |parts|, not |lineitem|. Distinct revenue values are
    ~|parts| (count-of-counts does NOT bound this axis), so the
    cumulative is the two-pass range-partitioned prefix sum
    (:func:`common.distributed_prefix_sum`) rather than an
    un-partitioned window that would funnel 10^9 part rows through one
    task (VERDICT r9 #1; contract-pinned in
    test_plan_contracts.test_rfm_abc_prefix_sum_partitioned). Class
    boundaries are integer milli cross-multiplications of exact centi
    sums — no percentage floats. Output is the per-class summary
    (bounded: 3 rows).

    Ties: equal-revenue parts order by partkey under the cumulative,
    so class assignment is deterministic."""
    from smart_meter_data_pipeline_spark.operators.common import (
        distributed_prefix_sum,
    )

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.expr(
                "CAST(CAST(l_extendedprice AS DECIMAL(14,2))"
                " * CAST((1 - l_discount) AS DECIMAL(5,2))"
                " * 10000 AS BIGINT)"
            )
        ).alias("rev_ten_thousandths")
    ).localCheckpoint(eager=True)  # one fact scan for cumsum + total
    total = rev.agg(
        F.sum("rev_ten_thousandths").alias("tot")
    )
    classed = distributed_prefix_sum(
        rev,
        [F.col("rev_ten_thousandths").desc(), F.col("l_partkey")],
        "rev_ten_thousandths",
        "cum",
    ).crossJoin(F.broadcast(total)).withColumn(
        "abc",
        F.when(
            F.col("cum") * 1000 <= F.col("tot") * ABC_A_MILLI, "A"
        )
        .when(F.col("cum") * 1000 <= F.col("tot") * ABC_B_MILLI, "B")
        .otherwise("C"),
    )
    return (
        classed.groupBy("abc")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rev_ten_thousandths").alias("class_rev"),
        )
        .select(
            "abc",
            F.col("n_parts").cast("bigint").alias("n_parts"),
            F.col("class_rev").cast("bigint").alias(
                "class_rev_ten_thousandths"
            ),
        )
    )


register(
    "part_abc_analysis",
    f"""
WITH rev AS (
  SELECT l_partkey,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2))
                       * CAST((1 - l_discount) AS DECIMAL(5,2))
                       * 10000 AS BIGINT)) AS BIGINT)
           AS rev_ten_thousandths
  FROM lineitem GROUP BY 1
),
classed AS (
  SELECT l_partkey, rev_ten_thousandths,
         SUM(rev_ten_thousandths) OVER (
           ORDER BY rev_ten_thousandths DESC, l_partkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(rev_ten_thousandths) OVER () AS tot
  FROM rev
)
SELECT CASE WHEN cum * 1000 <= tot * {ABC_A_MILLI} THEN 'A'
            WHEN cum * 1000 <= tot * {ABC_B_MILLI} THEN 'B'
            ELSE 'C' END AS abc,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev_ten_thousandths) AS BIGINT)
         AS class_rev_ten_thousandths
FROM classed
GROUP BY 1
""",
)(part_abc_analysis)


CR_K = 4          # concentration ratio CR4
CR_SALT = 16      # phase-1 fan-out per nation


def nation_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer concentration (CR{CR_K}) per nation: the share of
    national revenue held by the top {CR_K} customers — the
    antitrust/key-account metric every market analysis starts with.

    Scale shape — distributed group-wise top-k: a per-NATION rank
    window hash-partitions on ~25 nation keys, funnelling each
    nation's 10^8 customers through ONE task. Instead, the classic
    salted two-phase: phase 1 ranks within (nation, custkey%{CR_SALT})
    — {CR_SALT}× finer partitions — and keeps each salt's top {CR_K}
    (any national top-{CR_K} customer is necessarily a top-{CR_K} of
    its own salt, so this is EXACT, never a heuristic); phase 2 ranks
    the ≤|nations|·{CR_SALT}·{CR_K} survivors — a bounded frame. The
    national totals come from the same checkpointed rollup. All money
    exact centi."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_cust = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(14,2)") * 100).cast(
                    "bigint"
                )
            ).alias("rev_centi")
        )
        .localCheckpoint(eager=True)  # feeds totals AND the top-k
    )
    totals = per_cust.groupBy("c_nationkey").agg(
        F.sum("rev_centi").alias("total_rev_centi"),
        F.count(F.lit(1)).alias("n_customers"),
    )
    salted = per_cust.withColumn(
        "salt", (F.col("c_custkey") % CR_SALT).cast("int")
    )
    w1 = Window.partitionBy("c_nationkey", "salt").orderBy(
        F.col("rev_centi").desc(), F.col("c_custkey")
    )
    survivors = salted.withColumn(
        "r1", F.row_number().over(w1)
    ).filter(F.col("r1") <= CR_K)
    w2 = Window.partitionBy("c_nationkey").orderBy(
        F.col("rev_centi").desc(), F.col("c_custkey")
    )
    top = survivors.withColumn("r2", F.row_number().over(w2)).filter(
        F.col("r2") <= CR_K
    )
    topk = top.groupBy("c_nationkey").agg(
        F.sum("rev_centi").alias("topk_rev_centi")
    )
    return (
        totals.join(topk, "c_nationkey")
        .join(
            F.broadcast(nation),
            totals.c_nationkey == nation.n_nationkey,
        )
        .select(
            F.col("n_name").alias("nation"),
            F.col("n_customers").cast("bigint").alias("n_customers"),
            F.col("total_rev_centi").cast("bigint").alias(
                "total_rev_centi"
            ),
            F.col("topk_rev_centi").cast("bigint").alias(
                "top4_rev_centi"
            ),
            F.expr(
                "CAST((1000 * topk_rev_centi) div total_rev_centi"
                " AS BIGINT)"
            ).alias("cr4_milli"),
        )
    )


register(
    "nation_revenue_concentration",
    f"""
WITH per_cust AS (
  SELECT c_nationkey, c_custkey,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                       AS BIGINT)) AS BIGINT) AS rev_centi
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
),
totals AS (
  SELECT c_nationkey, SUM(rev_centi) AS total_rev_centi,
         COUNT(*) AS n_customers
  FROM per_cust GROUP BY 1
),
ranked AS (
  SELECT c_nationkey, rev_centi,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY rev_centi DESC, c_custkey) AS r
  FROM per_cust
),
topk AS (
  SELECT c_nationkey, SUM(rev_centi) AS topk_rev_centi
  FROM ranked WHERE r <= {CR_K} GROUP BY 1
)
SELECT n.n_name AS nation,
       CAST(t.n_customers AS BIGINT) AS n_customers,
       CAST(t.total_rev_centi AS BIGINT) AS total_rev_centi,
       CAST(k.topk_rev_centi AS BIGINT) AS top4_rev_centi,
       CAST((1000 * k.topk_rev_centi) // t.total_rev_centi AS BIGINT)
         AS cr4_milli
FROM totals t
JOIN topk k ON k.c_nationkey = t.c_nationkey
JOIN nation n ON n.n_nationkey = t.c_nationkey
""",
)(nation_revenue_concentration)


def part_croston_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method per part — THE intermittent-demand forecast
    (spare-parts / slow-movers), filling the gap the smoothing family
    leaves: Holt/Holt-Winters assume a dense series, but a part that
    ships 20 weeks out of 360 needs demand SIZE and inter-demand
    INTERVAL smoothed separately, with updates only on demand
    occurrences (Croston 1972):

        z' = (q + z) div 2        (smoothed demand size, alpha = 1/2)
        p' = (I + p) div 2        (smoothed interval, I = weeks since
                                   last demand)

    seeded z = q_1, p = 1; the per-week rate forecast is z/p. The
    halving constant makes every update an integer floor (the Holt
    int64 discipline), all operands non-negative — truncating div ==
    flooring // with no sign-split needed.

    Spark-first mechanics: one fact scan → (part, week) rollup →
    per-part week-sorted array → ``aggregate()`` fold carrying
    (z, p, prev_week) — JVM-side, sequential only within a key, every
    part independent (embarrassingly parallel at 10^8 parts). The
    fold input is bounded by the part's DEMAND weeks, which is the
    whole point of the method. DuckDB twin: recursive CTE stepping
    the same integers. Emits the exact fold state plus the
    milli-rate ``(z*1000) div p``."""
    li = load_table(spark, sf_dir, "lineitem")
    weekly = li.groupBy(
        "l_partkey",
        F.expr(
            "CAST(datediff(to_date(l_shipdate), DATE'1995-01-01')"
            " div 7 AS BIGINT)"
        ).alias("w"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).alias("q"))
    series = weekly.groupBy("l_partkey").agg(
        F.sort_array(F.collect_list(F.struct("w", "q"))).alias("s")
    )
    fold = F.expr(
        """
        aggregate(
          slice(s, 2, size(s) - 1),
          named_struct('z', s[0].q, 'p', CAST(1 AS BIGINT),
                       'prev', s[0].w),
          (acc, x) -> named_struct(
            'z', (x.q + acc.z) div 2,
            'p', ((x.w - acc.prev) + acc.p) div 2,
            'prev', x.w
          )
        )
        """
    )
    staged = series.select(
        F.col("l_partkey").cast("bigint").alias("partkey"),
        F.size("s").cast("bigint").alias("n_demand_weeks"),
        fold.alias("st"),
    )
    return staged.select(
        "partkey",
        "n_demand_weeks",
        F.col("st.z").cast("bigint").alias("z_qty"),
        F.col("st.p").cast("bigint").alias("p_weeks"),
        F.expr("CAST((st.z * 1000) div st.p AS BIGINT)").alias(
            "croston_milli_per_week"
        ),
    )


register(
    "part_croston_forecast",
    """
WITH RECURSIVE weekly AS (
  SELECT l_partkey,
         CAST(date_diff('day', DATE '1995-01-01',
                        CAST(l_shipdate AS DATE)) // 7 AS BIGINT) AS w,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY 1, 2
),
idx AS (
  SELECT l_partkey, w, q,
         row_number() OVER (PARTITION BY l_partkey ORDER BY w) AS i,
         count(*) OVER (PARTITION BY l_partkey) AS n
  FROM weekly
),
step AS (
  SELECT l_partkey, i, n, q AS z, CAST(1 AS BIGINT) AS p, w AS prev
  FROM idx WHERE i = 1
  UNION ALL
  SELECT s.l_partkey, x.i, s.n,
         CAST((x.q + s.z) // 2 AS BIGINT),
         CAST(((x.w - s.prev) + s.p) // 2 AS BIGINT),
         x.w
  FROM step s JOIN idx x
    ON x.l_partkey = s.l_partkey AND x.i = s.i + 1
)
SELECT CAST(l_partkey AS BIGINT) AS partkey,
       CAST(n AS BIGINT) AS n_demand_weeks,
       CAST(z AS BIGINT) AS z_qty,
       CAST(p AS BIGINT) AS p_weeks,
       CAST((z * 1000) // p AS BIGINT) AS croston_milli_per_week
FROM step WHERE i = n
""",
)(part_croston_forecast)
