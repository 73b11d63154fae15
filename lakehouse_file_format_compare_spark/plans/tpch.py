"""TPC-H-style headline queries over the testdata schema.

These are the scale-credibility workload: the same operator families
as the reference's gold queries (scan → filter → multi-way join →
hash agg → sort/limit) at the sizes where plan quality matters. Used
as bench.py's headline set alongside the gold analogs.

Plan expectations (verified via .explain in tests):
- q1: single shuffle on (returnflag, linestatus); filter pushed to scan.
- q3: orders⋈lineitem sort-merge/shuffled-hash under AQE, customer
  broadcast at bench scale; top-k via TakeOrderedAndProject.
- q5: dims (region, nation, supplier) broadcast; one wide join chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import grid, grid_sql
from ..sources.testdata import table


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analog: big-fact scan, date filter, 2-key group,
    8 aggregates, ordered output."""
    li = table(spark, sf_dir, "lineitem")
    qty = grid(F.col("l_quantity"), 2)
    price = grid(F.col("l_extendedprice"), 2)
    disc = grid(F.col("l_discount"), 2)
    disc_price = grid(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2)
    charge = grid(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 2)
    n = F.count(F.lit(1))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            grid(F.sum(qty), 2).alias("sum_qty"),
            grid(F.sum(price), 2).alias("sum_base_price"),
            grid(F.sum(disc_price), 2).alias("sum_disc_price"),
            grid(F.sum(charge), 2).alias("sum_charge"),
            grid(grid(F.sum(qty), 2) / n, 4).alias("avg_qty"),
            grid(grid(F.sum(price), 2) / n, 4).alias("avg_price"),
            grid(grid(F.sum(disc), 2) / n, 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       floor((SUM(floor((l_quantity) * 100 + 0.5) / 100)) * 100 + 0.5) / 100 AS sum_qty,
       floor((SUM(floor((l_extendedprice) * 100 + 0.5) / 100)) * 100 + 0.5) / 100 AS sum_base_price,
       floor((SUM(floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100)) * 100 + 0.5) / 100 AS sum_disc_price,
       floor((SUM(floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100 + 0.5) / 100)) * 100 + 0.5) / 100 AS sum_charge,
       floor((floor((SUM(floor((l_quantity) * 100 + 0.5) / 100)) * 100 + 0.5) / 100 / COUNT(*)) * 10000 + 0.5) / 10000 AS avg_qty,
       floor((floor((SUM(floor((l_extendedprice) * 100 + 0.5) / 100)) * 100 + 0.5) / 100 / COUNT(*)) * 10000 + 0.5) / 10000 AS avg_price,
       floor((floor((SUM(floor((l_discount) * 100 + 0.5) / 100)) * 100 + 0.5) / 100 / COUNT(*)) * 10000 + 0.5) / 10000 AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog: 3-way join, segment + date filters, revenue
    agg, ORDER BY + LIMIT top-k (the reference computes rankings but
    never truncates — this adds the top-k surface, SURVEY §2.7)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1997-01-01").cast("timestamp")
    return (
        cust.where(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("o_orderdate") < cutoff)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") > cutoff)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(grid(F.sum(grid(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2)), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("orderkey"))
        .limit(10)
    )


SHIPPING_PRIORITY_SQL = """
SELECT l_orderkey AS orderkey,
       o_orderdate AS orderdate,
       o_orderpriority AS orderpriority,
       floor((SUM(floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100)) * 100 + 0.5) / 100 AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, orderkey
LIMIT 10
"""


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analog: 6-way join through region/nation dims
    (broadcast), customer-supplier nation co-location predicate,
    revenue per nation."""
    region = table(spark, sf_dir, "region")
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(grid(F.sum(grid(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2)), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("nation"))
    )


LOCAL_SUPPLIER_VOLUME_SQL = """
SELECT n_name AS nation,
       floor((SUM(floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100)) * 100 + 0.5) / 100 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, nation
"""


def order_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog (EXISTS semi-join shape): orders in a quarter
    with at least one line item shipped after the order date, counted
    per priority. The correlated EXISTS compiles to a LeftSemi join —
    the scan side never widens (pytest-oracled; SURVEY §2.4's
    semi-join family on the TPC-H tables)."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1996-04-01").cast("timestamp")
    late = (
        orders.where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
    )
    return (
        late.groupBy(F.col("o_orderpriority").alias("orderpriority"))
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("orderpriority")
    )


ORDER_PRIORITY_CHECKING_SQL = """
SELECT o_orderpriority AS orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 analog (count-of-counts histogram): orders per
    customer via LEFT join (zero-order customers kept), then the
    distribution of those counts — two grouping levels chained on
    different keys, the shape that stresses partial aggregation."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


CUSTOMER_DISTRIBUTION_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


_REV = grid_sql(f"SUM({grid_sql('l_extendedprice * (1 - l_discount)', 2)})", 2)


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analog: two nation ROLES from one dim (supplier's vs
    customer's), a symmetric two-nation predicate, revenue per
    (supp_nation, cust_nation, ship year). Exercises dim self-aliasing
    and date-part grouping; both nation joins broadcast."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(grid(F.sum(grid(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2)), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


VOLUME_SHIPPING_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year, {_REV} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def returned_item_reporting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analog: revenue lost to returns ('R' lineitems) per
    customer over a quarter, top 20 — fact⋈fact⋈dim with a broadcast
    nation decorate and TakeOrderedAndProject truncation."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1996-07-01").cast("timestamp")
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "c_custkey", "c_name",
            grid(F.col("c_acctbal"), 2).alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .agg(grid(F.sum(grid(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2)), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


RETURNED_ITEM_REPORTING_SQL = f"""
SELECT c_custkey, c_name, {grid_sql('c_acctbal', 2)} AS acctbal,
       n_name AS nation, {_REV} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def promotion_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analog: promo revenue share over a window —
    conditional aggregation feeding a scalar ratio. Both sums are
    grid-snapped so the division operates on identical doubles in
    both engines (bit-identical quotient), then snapped again."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1997-01-01").cast("timestamp")
    disc = grid(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2)
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        li.where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            grid(
                F.lit(100.0) * grid(F.sum(promo), 2) / grid(F.sum(disc), 2), 6
            ).alias("promo_revenue_pct"),
            grid(F.sum(disc), 2).alias("total_revenue"),
        )
    )


PROMOTION_EFFECT_SQL = f"""
WITH w AS (
    SELECT {grid_sql('l_extendedprice * (1 - l_discount)', 2)} AS d,
           CASE WHEN p_type = 'PROMO'
                THEN {grid_sql('l_extendedprice * (1 - l_discount)', 2)}
                ELSE 0.0 END AS p
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
)
SELECT {grid_sql("100.0 * (" + grid_sql("SUM(p)", 2) + ") / (" + grid_sql("SUM(d)", 2) + ")", 6)} AS promo_revenue_pct,
       {grid_sql("SUM(d)", 2)} AS total_revenue
FROM w
"""


def large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analog: orders whose total quantity exceeds a
    threshold (HAVING over a fact-grain groupBy), decorated with the
    customer — aggregate-then-join so the heavy groupBy runs at fact
    grain before any dimension width is attached."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(grid(F.sum(grid(F.col("l_quantity"), 2)), 2).alias("total_qty"))
        .where(F.col("total_qty") > 250)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey", "c_name",
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            grid(F.col("o_totalprice"), 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), F.col("orderkey"))
    )


LARGE_VOLUME_CUSTOMER_SQL = f"""
SELECT c_custkey, c_name, o_orderkey AS orderkey, o_orderdate AS orderdate,
       {grid_sql('o_totalprice', 2)} AS totalprice, total_qty
FROM (
    SELECT l_orderkey, {grid_sql(f"SUM({grid_sql('l_quantity', 2)})", 2)} AS total_qty
    FROM lineitem GROUP BY l_orderkey HAVING total_qty > 250
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, orderkey
"""


def discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 analog: a disjunction of brand/size/quantity bands —
    the multi-clause OR predicate that tests predicate normalization
    (each disjunct pairs part attributes with lineitem ranges)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    clause = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10) & q.between(1, 15))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 20) & q.between(10, 25))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 30) & q.between(20, 35))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(clause)
        .agg(
            grid(F.sum(grid(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2)), 2).alias("revenue"),
            F.count(F.lit(1)).alias("matched_lines"),
        )
    )


DISCOUNTED_REVENUE_SQL = f"""
SELECT {_REV} AS revenue, COUNT(*) AS matched_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 35)
"""


def forecasting_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analog: pure scan-side revenue forecast — every
    predicate (date range, discount band, quantity cap) must reach the
    parquet scan as a pushed filter; no join, one partial+final agg."""
    li = table(spark, sf_dir, "lineitem")
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1997-01-01").cast("timestamp")
    return (
        li.where(
            (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            grid(F.sum(grid(F.col("l_extendedprice") * F.col("l_discount"), 2)), 2).alias("revenue"),
            F.count(F.lit(1)).alias("matched_lines"),
        )
    )


FORECASTING_REVENUE_CHANGE_SQL = f"""
SELECT {grid_sql(f"SUM({grid_sql('l_extendedprice * l_discount', 2)})", 2)} AS revenue,
       COUNT(*) AS matched_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


def national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analog: a target nation's share of regional revenue per
    year — 7-way join with two nation roles, then a conditional-sum
    ratio per group (grid-snapped operands so the quotient is
    bit-identical across engines)."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    part = table(spark, sf_dir, "part")
    n_cust = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    vol = grid(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2)
    target = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(F.col("p_type") == "STANDARD")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(region), F.col("c_rkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "EUROPE")
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            grid(grid(F.sum(target), 2) / grid(F.sum(vol), 2), 6).alias("mkt_share"),
            grid(F.sum(vol), 2).alias("region_revenue"),
        )
        .orderBy("o_year")
    )


NATIONAL_MARKET_SHARE_SQL = f"""
WITH w AS (
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           {grid_sql('l_extendedprice * (1 - l_discount)', 2)} AS vol,
           CASE WHEN n2.n_name = 'NATION_3'
                THEN {grid_sql('l_extendedprice * (1 - l_discount)', 2)}
                ELSE 0.0 END AS tvol
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE p_type = 'STANDARD' AND r_name = 'EUROPE'
)
SELECT o_year,
       {grid_sql("(" + grid_sql("SUM(tvol)", 2) + ") / (" + grid_sql("SUM(vol)", 2) + ")", 6)} AS mkt_share,
       {grid_sql("SUM(vol)", 2)} AS region_revenue
FROM w GROUP BY o_year ORDER BY o_year
"""


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 analog: revenue from orders below 20%% of a part's
    average quantity — the correlated-average shape, expressed as an
    aggregate-then-rejoin (the per-part average is computed once at
    part grain and broadcast back, never a per-row subquery).

    The avg-side scan is semi-joined against the brand-filtered part
    keys BEFORE the aggregate (classic Q17 pushdown, r6 verdict #5):
    per-part averages only use rows of that part, so restricting to
    surviving parts changes nothing for the parts the outer query
    keeps — but at 100x it turns a full fact-table shuffle at part
    grain into one over ~1/25th of the parts. Plan pin:
    tests/test_plan_quality.py asserts the LeftSemi broadcast feeds
    the aggregate."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    part5 = part.where(F.col("p_brand") == "Brand#5")
    li_b5 = li.join(
        F.broadcast(part5.select("p_partkey")),
        li["l_partkey"] == part5["p_partkey"],
        "left_semi",
    )
    avg_qty = (
        li_b5.groupBy(F.col("l_partkey").alias("ap_key"))
        .agg(grid(F.lit(0.2) * F.avg(grid(F.col("l_quantity"), 2)), 6).alias("qty_cap"))
    )
    return (
        li.join(F.broadcast(part5), F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty, F.col("l_partkey") == F.col("ap_key"))
        .where(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            grid(F.sum(grid(F.col("l_extendedprice"), 2)) / 7.0, 6).alias("avg_yearly"),
            F.count(F.lit(1)).alias("matched_lines"),
        )
    )


SMALL_QUANTITY_REVENUE_SQL = f"""
WITH caps AS (
    SELECT l_partkey AS ap_key,
           {grid_sql(f"0.2 * AVG({grid_sql('l_quantity', 2)})", 6)} AS qty_cap
    FROM lineitem GROUP BY l_partkey
)
SELECT {grid_sql("(" + grid_sql(f"SUM({grid_sql('l_extendedprice', 2)})", 2) + ") / 7.0", 6)} AS avg_yearly,
       COUNT(*) AS matched_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN caps ON l_partkey = ap_key
WHERE p_brand = 'Brand#5' AND l_quantity < qty_cap
"""


def global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analog: high-balance customers with no RECENT orders
    (every testdata customer has some order, so the dormancy window
    keeps the anti-join non-vacuous), grouped by a synthetic country
    code — scalar subquery (the positive-balance average) + left-anti
    join."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    recent = orders.where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    # grid-6 snap of the average threshold (qty_cap convention, Q17):
    # float summation order differs between engines, so an unsnapped
    # AVG could flip membership for a boundary-balance customer.
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        grid(F.avg(grid(F.col("c_acctbal"), 2)), 6).alias("ab")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.pmod(F.col("c_nationkey"), F.lit(10)).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            grid(F.sum(grid(F.col("c_acctbal"), 2)), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


GLOBAL_SALES_OPPORTUNITY_SQL = f"""
SELECT c_nationkey % 10 AS cntrycode, COUNT(*) AS numcust,
       {grid_sql(f"SUM({grid_sql('c_acctbal', 2)})", 2)} AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT {grid_sql(f"AVG({grid_sql('c_acctbal', 2)})", 6)} FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY 1 ORDER BY 1
"""


QUERIES = {
    "tpch_pricing_summary": pricing_summary,
    "tpch_shipping_priority": shipping_priority,
    "tpch_local_supplier_volume": local_supplier_volume,
}

# The extended analogs stay OUT of the 50-cap driver registry; their
# oracles run in tests/test_correctness.py::test_tpch_extended_oracles.
# r6 widened the pack with Q7/Q10/Q14/Q18/Q19 shapes (adapted to the
# testdata schema, which lacks shipmode/commitdate/receiptdate — Q12's
# shape has no faithful analog here and the conditional-aggregation
# family it stresses is covered by Q14 and the gold plans).
EXTENDED_QUERIES = {
    "tpch_order_priority_checking": order_priority_checking,
    "tpch_customer_distribution": customer_distribution,
    "tpch_volume_shipping": volume_shipping,
    "tpch_returned_item_reporting": returned_item_reporting,
    "tpch_promotion_effect": promotion_effect,
    "tpch_large_volume_customer": large_volume_customer,
    "tpch_discounted_revenue": discounted_revenue,
    "tpch_forecasting_revenue_change": forecasting_revenue_change,
    "tpch_national_market_share": national_market_share,
    "tpch_small_quantity_revenue": small_quantity_revenue,
    "tpch_global_sales_opportunity": global_sales_opportunity,
}
EXTENDED_ORACLES = {
    "tpch_order_priority_checking": ORDER_PRIORITY_CHECKING_SQL,
    "tpch_customer_distribution": CUSTOMER_DISTRIBUTION_SQL,
    "tpch_volume_shipping": VOLUME_SHIPPING_SQL,
    "tpch_returned_item_reporting": RETURNED_ITEM_REPORTING_SQL,
    "tpch_promotion_effect": PROMOTION_EFFECT_SQL,
    "tpch_large_volume_customer": LARGE_VOLUME_CUSTOMER_SQL,
    "tpch_discounted_revenue": DISCOUNTED_REVENUE_SQL,
    "tpch_forecasting_revenue_change": FORECASTING_REVENUE_CHANGE_SQL,
    "tpch_national_market_share": NATIONAL_MARKET_SHARE_SQL,
    "tpch_small_quantity_revenue": SMALL_QUANTITY_REVENUE_SQL,
    "tpch_global_sales_opportunity": GLOBAL_SALES_OPPORTUNITY_SQL,
}

ORACLES = {
    "tpch_pricing_summary": PRICING_SUMMARY_SQL,
    "tpch_shipping_priority": SHIPPING_PRIORITY_SQL,
    "tpch_local_supplier_volume": LOCAL_SUPPLIER_VOLUME_SQL,
}
