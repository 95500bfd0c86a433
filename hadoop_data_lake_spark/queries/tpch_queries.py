"""Join / aggregation / set-op queries on the TPC-H-ish star schema
(FIXTURES.md §B: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region, plus
supplier and part).

These exercise the reference's join surface (SURVEY.md §2.3: equi joins,
left joins, multi-way composite joins) plus the engine-surface additions the
survey recommends (semi/anti joins, top-k, cube, set ops, global sort).

Determinism: every double aggregate uses fixed-point bigint summation
(functions/fixedpoint.py) so results are identical across partitionings and
engines; per-row products (price * (1-disc)) are single IEEE expressions,
bit-equal in Spark and DuckDB.

Scale notes are on each query: which side broadcasts, where the shuffles
are, and why the plan survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_data_lake_spark.core.io import local_frame, read_table
from hadoop_data_lake_spark.functions.fixedpoint import (
    avg_fixed,
    avg_fixed_sql,
    dprod,
    sum_fixed,
    sum_fixed_sql,
    to_units,
)
from hadoop_data_lake_spark.operators.joins import broadcast_dim_join
from hadoop_data_lake_spark.operators.windows import top1_per_group, topk_per_group

_DISC_PRICE = "l_extendedprice * (1 - l_discount)"
_CHARGE = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"


# --------------------------------------------------------------------------
# TPC-H Q1 shape: pricing summary. One scan, one hash aggregate; at 100 TB
# this is scan-bound with partial aggregation map-side — the ideal plan.
# --------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_fixed(F.col("l_quantity"), 2).alias("sum_qty"),
            sum_fixed(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            sum_fixed(disc_price, 4).alias("sum_disc_price"),
            sum_fixed(charge, 6).alias("sum_charge"),
            avg_fixed(F.col("l_quantity"), 2).alias("avg_qty"),
            avg_fixed(F.col("l_extendedprice"), 2).alias("avg_price"),
            avg_fixed(F.col("l_discount"), 2).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q1_PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {sum_fixed_sql('l_quantity', 2)} AS sum_qty,
       {sum_fixed_sql('l_extendedprice', 2)} AS sum_base_price,
       {sum_fixed_sql(_DISC_PRICE, 4)} AS sum_disc_price,
       {sum_fixed_sql(_CHARGE, 6)} AS sum_charge,
       {avg_fixed_sql('l_quantity', 2)} AS avg_qty,
       {avg_fixed_sql('l_extendedprice', 2)} AS avg_price,
       {avg_fixed_sql('l_discount', 2)} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# TPC-H Q3 shape: revenue per urgent order. customer filter broadcasts
# against orders; lineitem (the 100 TB side) shuffles once on l_orderkey.
# --------------------------------------------------------------------------

def q3_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01")
    )
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        broadcast_dim_join(
            orders, cust.select("c_custkey"), on=F.col("o_custkey") == F.col("c_custkey")
        )
        .join(li, on=F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum_fixed(disc_price, 4).alias("revenue"), F.count("*").alias("n_items"))
        .select(
            "o_orderkey",
            # o_orderdate is TIMESTAMP_NTZ (parquet isAdjustedToUTC=false);
            # session TZ is UTC so the cast to (ltz) timestamp is identity.
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate_us"),
            "o_orderpriority",
            "revenue",
            "n_items",
        )
    )


Q3_ORDER_REVENUE_SQL = f"""
SELECT o.o_orderkey, epoch_us(o.o_orderdate) AS o_orderdate_us, o.o_orderpriority,
       {sum_fixed_sql(_DISC_PRICE, 4)} AS revenue,
       count(*) AS n_items
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_mktsegment = 'BUILDING'
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
"""


# --------------------------------------------------------------------------
# TPC-H Q5 shape: revenue by nation through a 6-way join. All dims broadcast;
# only the two fact tables shuffle (on orderkey). Join order: facts joined
# first on their key, dims attached broadcast-side.
# --------------------------------------------------------------------------

def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sum_fixed(disc_price, 4).alias("revenue"), F.count("*").alias("n_items"))
    )


Q5_NATION_REVENUE_SQL = f"""
SELECT r.r_name, n.n_name,
       {sum_fixed_sql(_DISC_PRICE, 4)} AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
"""


# --------------------------------------------------------------------------
# Semi / anti joins (engine-surface addition per SURVEY.md §2.3).
# --------------------------------------------------------------------------

def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return cust.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


CUSTOMERS_WITH_ORDERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return cust.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name, c_acctbal FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


# --------------------------------------------------------------------------
# Top-k per group (k=3) and argmin-per-group (W1 analog on the star).
# --------------------------------------------------------------------------

def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    top = topk_per_group(
        orders,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
        rank_col="rnk",
    )
    return top.select("o_custkey", "o_orderkey", "o_totalprice", "rnk")


TOP_ORDERS_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders) t
WHERE rnk <= 3
"""


def cheapest_line_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    best = top1_per_group(
        li,
        ["l_partkey"],
        [
            F.col("l_extendedprice").asc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        ],
    )
    return best.select(
        "l_partkey",
        F.col("l_suppkey").alias("best_suppkey"),
        F.col("l_extendedprice").alias("best_price"),
        F.col("l_orderkey").alias("best_orderkey"),
    )


CHEAPEST_LINE_PER_PART_SQL = """
SELECT l_partkey, l_suppkey AS best_suppkey, l_extendedprice AS best_price,
       l_orderkey AS best_orderkey
FROM (SELECT *, row_number() OVER (PARTITION BY l_partkey
        ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn
      FROM lineitem) t
WHERE rn = 1
"""


# --------------------------------------------------------------------------
# CUBE grouping (engine-surface addition; grouping-set semantics).
# --------------------------------------------------------------------------

def sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), sum_fixed(F.col("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


SALES_CUBE_SQL = f"""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n,
       {sum_fixed_sql('l_quantity', 2)} AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# --------------------------------------------------------------------------
# Set ops: nations having customers but no suppliers (EXCEPT), and monthly
# order rollup (date functions + agg).
# --------------------------------------------------------------------------

def nations_customers_not_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    with_cust = (
        nation.join(cust, F.col("n_nationkey") == F.col("c_nationkey"), "left_semi")
        .select("n_nationkey", "n_name")
    )
    with_supp = (
        nation.join(supp, F.col("n_nationkey") == F.col("s_nationkey"), "left_semi")
        .select("n_nationkey", "n_name")
    )
    return with_cust.exceptAll(with_supp)


NATIONS_CUSTOMERS_NOT_SUPPLIERS_SQL = """
SELECT n_nationkey, n_name FROM nation n
WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey)
EXCEPT
SELECT n_nationkey, n_name FROM nation n
WHERE EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey)
"""


def monthly_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            sum_fixed(F.col("o_totalprice"), 2).alias("total_price"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


MONTHLY_ORDER_STATS_SQL = f"""
SELECT year(o_orderdate) AS order_year, month(o_orderdate) AS order_month,
       count(*) AS n_orders,
       {sum_fixed_sql('o_totalprice', 2)} AS total_price,
       count(DISTINCT o_custkey) AS n_customers
FROM orders
GROUP BY year(o_orderdate), month(o_orderdate)
"""


# --------------------------------------------------------------------------
# Global order + limit with deterministic tie-break (§2.6 engine surface).
# --------------------------------------------------------------------------

def top20_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


TOP20_ORDERS_GLOBAL_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""


# --------------------------------------------------------------------------
# TPC-H Q4 shape: orders with at least one late-shipped line, counted by
# priority. Left-semi join = the EXISTS subquery; at 100 TB the semi join
# shuffles only the two key columns and short-circuits per order.
# --------------------------------------------------------------------------

def q4_late_orders_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


Q4_LATE_ORDERS_BY_PRIORITY_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# TPC-H Q6 shape: selective scan-and-sum. The filter set pushes down to the
# parquet reader (PushedFilters on l_shipdate/l_discount/l_quantity) — the
# whole query is one scan + map-side partial agg, no join, one shuffle of a
# single row per partition.
# --------------------------------------------------------------------------

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(sum_fixed(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"))
    )


Q6_FORECAST_REVENUE_SQL = f"""
SELECT {sum_fixed_sql('l_extendedprice * l_discount', 4)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# TPC-H Q10 shape: revenue lost to returned items per customer, top 20.
# lineitem filter -> join orders (shuffle on orderkey) -> join customer
# (shuffle on custkey) -> broadcast nation. Top-k via global sort + limit —
# Spark's TakeOrderedAndProject keeps only 20 rows per partition.
# --------------------------------------------------------------------------

def q10_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    revenue = (
        li.where(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum_fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
    )
    return revenue.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc()).limit(20)


Q10_RETURNED_ITEM_REVENUE_SQL = f"""
SELECT c_custkey, c_name, n_name,
       {sum_fixed_sql(_DISC_PRICE, 4)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


# --------------------------------------------------------------------------
# TPC-H Q12 shape: conditional CASE aggregation — high- vs low-priority
# line counts per linestatus for a ship-year. Single join + pivot-style
# conditional sums (map-side partial agg).
# --------------------------------------------------------------------------

def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


Q12_PRIORITY_SHIPPING_SQL = """
SELECT l_linestatus,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::bigint AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)::bigint AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
"""


# --------------------------------------------------------------------------
# TPC-H Q14 shape: promo revenue share — ratio of two exact fixed-point
# sums, one final double division (deterministic across engines).
# --------------------------------------------------------------------------

def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc_units = to_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    joined = li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-07-01"))
    ).join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", disc_units).otherwise(0)).cast("double")
            / F.sum(disc_units).cast("double")
        ).alias("promo_revenue_pct")
    )


Q14_PROMO_REVENUE_SHARE_SQL = """
SELECT 100.0 * cast(sum(CASE WHEN p_type = 'PROMO'
                             THEN cast(round(l_extendedprice * (1 - l_discount) * 10000) as bigint)
                             ELSE 0 END) as double)
             / cast(sum(cast(round(l_extendedprice * (1 - l_discount) * 10000) as bigint)) as double)
       AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'
"""


# --------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive multi-attribute predicate. Catalyst extracts
# the common l_partkey = p_partkey conjunct so the join stays equi; the OR
# branches evaluate post-join.
# --------------------------------------------------------------------------

def q19_branded_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15)) & (F.col("l_quantity").between(1, 20)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(10, 30)) & (F.col("l_quantity").between(10, 35)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(20, 50)) & (F.col("l_quantity").between(20, 50)))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(sum_fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
    )


Q19_BRANDED_REVENUE_SQL = f"""
SELECT {sum_fixed_sql(_DISC_PRICE, 4)} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
"""


# --------------------------------------------------------------------------
# Ranking-function family (rank / dense_rank / ntile / lead) — §2.5 notes
# these are unused by the reference; the engine exposes them anyway.
# --------------------------------------------------------------------------

def customer_order_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("price_rank", F.rank().over(w))
        .withColumn("price_dense_rank", F.dense_rank().over(w))
        .withColumn("quartile", F.ntile(4).over(w))
        .withColumn("next_price", F.lead("o_totalprice").over(w))
        .where(F.col("price_rank") <= 3)
        .select(
            "o_custkey", "o_orderkey", "o_totalprice",
            "price_rank", "price_dense_rank", "quartile", "next_price",
        )
    )


CUSTOMER_ORDER_RANKS_SQL = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         rank()       OVER w AS price_rank,
         dense_rank() OVER w AS price_dense_rank,
         ntile(4)     OVER w AS quartile,
         lead(o_totalprice) OVER w AS next_price
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
)
SELECT * FROM ranked WHERE price_rank <= 3
"""


# --------------------------------------------------------------------------
# Exact percentiles (sort-based interpolation — bit-identical to DuckDB's
# quantile_cont). At 100 TB prefer approx_percentile (t-digest sketch,
# mergeable map-side); the exact form is the oracle-checkable reference.
# --------------------------------------------------------------------------

def order_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.percentile("o_totalprice", 0.5).alias("p50"),
            F.percentile("o_totalprice", 0.9).alias("p90"),
            F.min("o_totalprice").alias("p_min"),
            F.max("o_totalprice").alias("p_max"),
        )
    )


ORDER_PRICE_PERCENTILES_SQL = """
SELECT o_orderpriority,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.9) AS p90,
       min(o_totalprice) AS p_min,
       max(o_totalprice) AS p_max
FROM orders GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# TPC-H Q17 shape: correlated aggregate subquery — lines whose quantity is
# below 20% of their part's average. Decorrelated as a window average over
# the part key: one shuffle, no join back.
# --------------------------------------------------------------------------

def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = read_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    avg_units = F.avg(to_units(F.col("l_quantity"), 2)).over(w)
    return (
        li.withColumn("__avg_qty_units", avg_units)
        .where(to_units(F.col("l_quantity"), 2) < 0.2 * F.col("__avg_qty_units"))
        .agg(
            F.count("*").alias("n_lines"),
            sum_fixed(F.col("l_extendedprice"), 2).alias("total_price"),
        )
    )


Q17_SMALL_QUANTITY_REVENUE_SQL = f"""
WITH q AS (
  SELECT l_extendedprice, cast(round(l_quantity * 100) as bigint) AS qty_units,
         avg(cast(round(l_quantity * 100) as bigint))
           OVER (PARTITION BY l_partkey) AS avg_qty_units
  FROM lineitem
)
SELECT count(*) AS n_lines,
       {sum_fixed_sql('l_extendedprice', 2)} AS total_price
FROM q WHERE qty_units < 0.2 * avg_qty_units
"""


# --------------------------------------------------------------------------
# TPC-H Q2 shape: argmin within group via correlated subquery — for each
# part, the supplier with the lowest account balance among its nation's
# suppliers... adapted to this schema: per nation, the cheapest supplier
# (min s_acctbal, tie on s_suppkey) joined back to nation names.
# --------------------------------------------------------------------------

def q2_cheapest_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    best = top1_per_group(
        supp, ["s_nationkey"], [F.col("s_acctbal").asc(), F.col("s_suppkey").asc()]
    )
    return (
        best.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", "s_suppkey", "s_name", "s_acctbal")
    )


Q2_CHEAPEST_SUPPLIER_PER_NATION_SQL = """
SELECT n_name, s_suppkey, s_name, s_acctbal
FROM (SELECT *, row_number() OVER (PARTITION BY s_nationkey
                                   ORDER BY s_acctbal, s_suppkey) AS rn
      FROM supplier) s
JOIN nation ON s_nationkey = n_nationkey
WHERE rn = 1
"""


# --------------------------------------------------------------------------
# TPC-H Q22 shape: anti join + scalar aggregate filter — customers with
# above-average balance and NO orders, counted per nation.
# --------------------------------------------------------------------------

def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    # anti-join against URGENT orders only — the all-orders variant is vacuous
    # on this synthetic data (every customer has some order)
    orders = (
        read_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.avg(to_units(F.col("c_acctbal"), 2)).alias("__avg_units")
    )
    rich = (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(to_units(F.col("c_acctbal"), 2) > F.col("__avg_units"))
    )
    idle_rich = rich.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    return idle_rich.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        sum_fixed(F.col("c_acctbal"), 2).alias("totacctbal"),
    )


Q22_IDLE_RICH_CUSTOMERS_SQL = f"""
WITH avg_bal AS (
  SELECT avg(cast(round(c_acctbal * 100) as bigint)) AS avg_units
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey, count(*) AS numcust,
       {sum_fixed_sql('c_acctbal', 2)} AS totacctbal
FROM customer, avg_bal
WHERE cast(round(c_acctbal * 100) as bigint) > avg_units
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""


def nations_with_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations having customers AND suppliers (completes the set-op
    family next to the EXCEPT variant above)."""
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    with_cust = nation.join(
        cust, F.col("n_nationkey") == F.col("c_nationkey"), "left_semi"
    ).select("n_nationkey", "n_name")
    with_supp = nation.join(
        supp, F.col("n_nationkey") == F.col("s_nationkey"), "left_semi"
    ).select("n_nationkey", "n_name")
    return with_cust.intersect(with_supp)


NATIONS_WITH_BOTH_SQL = """
SELECT n_nationkey, n_name FROM nation n
WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey)
INTERSECT
SELECT n_nationkey, n_name FROM nation n
WHERE EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey)
"""


# --------------------------------------------------------------------------
# Analytic distribution functions: percent_rank / cume_dist (exact rational
# formulas — identical doubles in both engines).
# --------------------------------------------------------------------------

def order_percent_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("pr", F.round(F.percent_rank().over(w), 9))
        .withColumn("cd", F.round(F.cume_dist().over(w), 9))
        .where(F.col("pr") >= 0.99)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "pr", "cd")
    )


ORDER_PERCENT_RANKS_SQL = """
SELECT o_orderpriority, o_orderkey, o_totalprice,
       round(percent_rank() OVER w, 9) AS pr,
       round(cume_dist()   OVER w, 9) AS cd
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
QUALIFY round(percent_rank() OVER w, 9) >= 0.99
"""


# --------------------------------------------------------------------------
# TPC-H Q7 shape: volume shipping between two nations (reference has no
# supplier-side analytics; this completes the star-join surface).
# lineitem ⋈ orders is the one big shuffle; supplier/customer are filtered
# to 2 of 25 nations BEFORE joining (via broadcast nation), so both dims
# broadcast even at 100 TB. Year derivation stays JVM-side.
# --------------------------------------------------------------------------

def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    pair = ("NATION_1", "NATION_2")
    n1 = nation.where(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.where(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    supp_n = supp.join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
    cust_n = cust.join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate").between(F.lit("1996-01-01"), F.lit("1997-12-31")))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust_n), F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(sum_fixed(disc_price, 4).alias("revenue"))
    )


Q7_VOLUME_SHIPPING_SQL = f"""
SELECT supp_nation, cust_nation, l_year, {sum_fixed_sql(_DISC_PRICE, 4)} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year, l_extendedprice, l_discount
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name IN ('NATION_1', 'NATION_2')
    AND n2.n_name IN ('NATION_1', 'NATION_2')
    AND n1.n_name <> n2.n_name
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
) v
GROUP BY supp_nation, cust_nation, l_year
"""


# --------------------------------------------------------------------------
# TPC-H Q8 shape: market share of one supplier-nation within a customer
# region, per order year. Conditional-sum / total-sum ratio in bigint units
# so the division is the only float op (bit-equal across engines).
# --------------------------------------------------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    part = read_table(spark, sf_dir, "part")
    cust_r = (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    supp_n = supp.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    vol_units = to_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        li.join(F.broadcast(part.where(F.col("p_type") == "ECONOMY")), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("o_orderdate").between(F.lit("1996-01-01"), F.lit("1997-12-31")))
        .join(F.broadcast(cust_r), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_5", vol_units).otherwise(F.lit(0).cast("long"))).alias("nation_units"),
            F.sum(vol_units).alias("total_units"),
        )
        .select(
            "o_year",
            (F.col("nation_units") / F.col("total_units")).alias("mkt_share"),
            "nation_units",
            "total_units",
        )
    )


Q8_MARKET_SHARE_SQL = f"""
WITH v AS (
  SELECT year(o_orderdate) AS o_year,
         CAST(round(({_DISC_PRICE}) * 10000) AS BIGINT) AS units,
         n1.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  WHERE p_type = 'ECONOMY'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
    AND o_custkey IN (
      SELECT c_custkey FROM customer
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region   ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA')
)
SELECT o_year,
       (sum(CASE WHEN supp_nation = 'NATION_5' THEN units ELSE 0 END)::BIGINT
        / (sum(units)::BIGINT * 1.0)) AS mkt_share,
       sum(CASE WHEN supp_nation = 'NATION_5' THEN units ELSE 0 END)::BIGINT AS nation_units,
       sum(units)::BIGINT AS total_units
FROM v
GROUP BY o_year
"""


# --------------------------------------------------------------------------
# TPC-H Q9 shape: product-type profit by supplier nation and year. The
# schema has no partsupp.ps_supplycost, so cost is proxied as
# 0.6 * p_retailprice * l_quantity (deterministic, documented adaptation).
# part is filtered by name BEFORE the big join and broadcast.
# --------------------------------------------------------------------------

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    part = read_table(spark, sf_dir, "part")
    amount_units = to_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4) - to_units(
        F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity"), 4
    )
    return (
        li.join(
            F.broadcast(part.where(F.col("p_name").like("%red%")).select("p_partkey", "p_retailprice")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(orders.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_year"))
        .agg((F.sum(amount_units) / F.lit(10000.0)).alias("sum_profit"))
    )


Q9_PRODUCT_PROFIT_SQL = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       (sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
            - CAST(round(0.6 * p_retailprice * l_quantity * 10000) AS BIGINT))::BIGINT
        / 10000.0) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
"""


# --------------------------------------------------------------------------
# TPC-H Q11 shape: important stock. No partsupp, so "value" per part within
# one nation = shipped l_extendedprice*l_quantity; keep parts whose value
# exceeds 0.01% of the nation total (scalar-aggregate threshold). The
# threshold compare is done in bigint cross-multiplication — exact.
# At scale: the nation filter cuts suppliers 25×, the per-part aggregate is
# one shuffle, and the scalar total reuses the same aggregate broadcast back.
# --------------------------------------------------------------------------

def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    supp_n = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name") == "NATION_3")
        .select("s_suppkey")
    )
    units = to_units(F.col("l_extendedprice") * F.col("l_quantity"), 2)
    # eager-checkpoint the per-part aggregate (r11): the grand-total scalar
    # and the threshold filter both consume it (2 lineitem scans -> 1)
    per_part = (
        li.join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(units).alias("value_units"))
        .localCheckpoint(eager=True)
    )
    total = per_part.agg(F.sum("value_units").alias("total_units"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("value_units") * F.lit(10000) > F.col("total_units"))
        .select("l_partkey", (F.col("value_units") / F.lit(100.0)).alias("part_value"))
    )


Q11_IMPORTANT_PARTS_SQL = """
WITH pp AS (
  SELECT l_partkey,
         sum(CAST(round(l_extendedprice * l_quantity * 100) AS BIGINT))::BIGINT AS value_units
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3')
  GROUP BY l_partkey
)
SELECT l_partkey, (value_units / 100.0) AS part_value
FROM pp
WHERE value_units * 10000 > (SELECT sum(value_units)::BIGINT FROM pp)
"""


# --------------------------------------------------------------------------
# TPC-H Q13 shape: customer distribution — how many customers placed k
# orders (k=0 included via left join). Two cascaded aggregations; the
# second one is tiny. Reference surface: left join (J5) + count.
# --------------------------------------------------------------------------

def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders.where(F.col("o_orderpriority") != "1-URGENT").select("o_custkey", "o_orderkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


Q13_CUSTOMER_DISTRIBUTION_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN (SELECT o_custkey, o_orderkey FROM orders WHERE o_orderpriority <> '1-URGENT') o
    ON c_custkey = o_custkey
  GROUP BY c_custkey
) pc
GROUP BY c_count
"""


# --------------------------------------------------------------------------
# TPC-H Q15 shape: top supplier(s) by revenue in a quarter. Revenue is kept
# in bigint units so the "equals max" predicate is exact on both engines.
# The max is a 1-row broadcast back onto the per-supplier aggregate.
# --------------------------------------------------------------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    units = to_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    # eager-checkpoint the per-supplier aggregate (r11): the max scalar and
    # the final filter-join both consume it (2 lineitem scans -> 1)
    revenue = (
        li.where(F.col("l_shipdate").between(F.lit("1996-01-01"), F.lit("1996-03-31")))
        .groupBy("l_suppkey")
        .agg(F.sum(units).alias("rev_units"))
        .localCheckpoint(eager=True)
    )
    best = revenue.agg(F.max("rev_units").alias("max_units"))
    return (
        revenue.crossJoin(F.broadcast(best))
        .where(F.col("rev_units") == F.col("max_units"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", (F.col("rev_units") / F.lit(10000.0)).alias("total_revenue"))
    )


Q15_TOP_SUPPLIER_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey,
         sum(CAST(round(({_DISC_PRICE}) * 10000) AS BIGINT))::BIGINT AS rev_units
  FROM lineitem
  WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-03-31 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, (rev_units / 10000.0) AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_units = (SELECT max(rev_units) FROM revenue)
"""


# --------------------------------------------------------------------------
# TPC-H Q16 shape: supplier count per (brand, type, size) for parts,
# excluding one brand, one type class, and distrusted suppliers
# (s_acctbal < 0 stands in for the comment-based complaints filter; the
# schema has no ps/comment columns). distinct (part, supp) pairs from
# lineitem stand in for partsupp. countDistinct after a semi/anti pattern.
# --------------------------------------------------------------------------

def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    supp = read_table(spark, sf_dir, "supplier")
    partsupp = li.select("l_partkey", "l_suppkey").distinct()
    bad_supp = supp.where(F.col("s_acctbal") < 0).select("s_suppkey")
    keep_part = part.where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 2, 3, 4, 5, 6, 7, 8)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        partsupp.join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(keep_part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_PARTS_SUPPLIER_COUNTS_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 2, 3, 4, 5, 6, 7, 8)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume customers — orders whose total quantity
# exceeds 300 (~top 0.5% here). The HAVING filter runs on the lineitem
# aggregate BEFORE joining orders/customer, so the expensive joins see only
# the tiny qualifying set; quantity threshold compares in bigint units.
# --------------------------------------------------------------------------

def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    qty_units = to_units(F.col("l_quantity"), 2)
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty_units).alias("qty_units"))
        .where(F.col("qty_units") > 300 * 100)
    )
    return (
        big_orders.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            (F.col("qty_units") / F.lit(100.0)).alias("total_qty"),
        )
    )


Q18_LARGE_VOLUME_CUSTOMERS_SQL = """
WITH big AS (
  SELECT l_orderkey, sum(CAST(round(l_quantity * 100) AS BIGINT))::BIGINT AS qty_units
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 30000
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       (qty_units / 100.0) AS total_qty
FROM big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# --------------------------------------------------------------------------
# TPC-H Q20 shape: suppliers with significant shipments of a part class —
# nested semi-join chain (part-name filter → per-(part,supp) 1996 shipped
# quantity threshold → distinct suppliers → nation filter). partsupp's
# availqty has no equivalent, so the predicate is "shipped > 50 units of
# any red part in 1996" (documented adaptation; same join/semi shape).
# --------------------------------------------------------------------------

def q20_significant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    red_parts = part.where(F.col("p_name").like("red%")).select("p_partkey")
    qty_units = to_units(F.col("l_quantity"), 2)
    qualified = (
        li.where(F.col("l_shipdate").between(F.lit("1996-01-01"), F.lit("1996-12-31")))
        .join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(qty_units).alias("qty_units"))
        .where(F.col("qty_units") > 50 * 100)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name") == "NATION_3")
        .join(qualified, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


Q20_SIGNIFICANT_SUPPLIERS_SQL = """
SELECT s_suppkey, s_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
    GROUP BY l_partkey, l_suppkey
    HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 5000)
"""


# --------------------------------------------------------------------------
# TPC-H Q21 shape: suppliers who kept orders waiting. The schema has no
# commit/receipt dates, so "waiting" = in a finished multi-supplier order,
# this supplier alone has the latest ship date (exists other supplier /
# not-exists later shipper — decorrelated into one grouped pass: max
# shipdate + distinct-supplier counts per order, then argmax uniqueness).
# One shuffle on l_orderkey; supplier/nation broadcast at the end.
# --------------------------------------------------------------------------

def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    from pyspark.sql import Window

    f_orders = orders.where(F.col("o_orderstatus") == "F").select("o_orderkey")
    lines = li.join(f_orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    # One window pass instead of aggregate + re-join: a single lineitem scan
    # and one shuffle on l_orderkey (order groups are tiny, so the per-group
    # collect_set stays bounded at any total scale).
    w = Window.partitionBy("l_orderkey")
    late = (
        lines.withColumn("max_ship", F.max("l_shipdate").over(w))
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .where((F.col("l_shipdate") == F.col("max_ship")) & (F.col("n_supp") >= 2))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    sole_late = (
        late.groupBy("l_orderkey")
        .agg(F.min("l_suppkey").alias("late_supp"), F.count("*").alias("n_late"))
        .where(F.col("n_late") == 1)
    )
    return (
        sole_late.join(F.broadcast(supp), F.col("late_supp") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name").isin("NATION_3", "NATION_4"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


Q21_WAITING_SUPPLIERS_SQL = """
WITH f AS (
  SELECT l_orderkey, l_suppkey, l_shipdate
  FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
), m AS (
  SELECT l_orderkey, max(l_shipdate) AS max_ship, count(DISTINCT l_suppkey) AS n_supp
  FROM f GROUP BY l_orderkey
), late AS (
  SELECT DISTINCT f.l_orderkey, f.l_suppkey
  FROM f JOIN m ON f.l_orderkey = m.l_orderkey
  WHERE f.l_shipdate = m.max_ship AND m.n_supp >= 2
), sole AS (
  SELECT l_orderkey, min(l_suppkey) AS late_supp
  FROM late GROUP BY l_orderkey HAVING count(*) = 1
)
SELECT s_name, count(*) AS numwait
FROM sole
JOIN supplier ON late_supp = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_3', 'NATION_4')
GROUP BY s_name
"""


# --------------------------------------------------------------------------
# ROLLUP hierarchy (region → nation → total) over customer order revenue.
# Complements sales_cube (CUBE) and zone_report (GROUPING SETS): one pass,
# partial aggregation map-side, dims broadcast. o_totalprice summed in
# fixed-point units for cross-engine determinism.
# --------------------------------------------------------------------------

def regional_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_orders"), sum_fixed(F.col("o_totalprice"), 2).alias("revenue"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_orders",
            "revenue",
        )
    )


REGIONAL_REVENUE_ROLLUP_SQL = f"""
SELECT coalesce(r_name, 'ALL') AS region,
       coalesce(n_name, 'ALL') AS nation,
       count(*) AS n_orders,
       {sum_fixed_sql('o_totalprice', 2)} AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the general form rollup/cube specialize: disjoint
    marginal totals by nation, by order status, and the grand total in ONE
    pass (one shuffle with a grouping-id expand, vs three scans + union for
    the naive equivalent). GROUPING() flags distinguish 'aggregated-away'
    from a genuinely NULL key."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupingSets(
            [["n_name"], ["o_orderstatus"], []], "n_name", "o_orderstatus"
        )
        .agg(
            F.grouping("n_name").cast("long").alias("g_nation"),
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.count("*").alias("n_orders"),
            sum_fixed(F.col("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "g_nation",
            "g_status",
            "n_orders",
            "revenue",
        )
    )


GROUPING_SETS_REVENUE_SQL = f"""
SELECT coalesce(n_name, 'ALL') AS nation,
       coalesce(o_orderstatus, 'ALL') AS status,
       grouping(n_name)::bigint AS g_nation,
       grouping(o_orderstatus)::bigint AS g_status,
       count(*) AS n_orders,
       {sum_fixed_sql('o_totalprice', 2)} AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS ((n_name), (o_orderstatus), ())
"""


# --------------------------------------------------------------------------
# UNION ALL across heterogeneous sources (unionByName), then one aggregate:
# account-balance distribution for customers and suppliers side by side.
# --------------------------------------------------------------------------

def acctbal_union_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"), F.col("c_acctbal").alias("acctbal")
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"), F.col("s_acctbal").alias("acctbal")
    )
    return (
        cust.unionByName(supp)
        .groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            sum_fixed(F.col("acctbal"), 2).alias("total_bal"),
            F.count(F.when(F.col("acctbal") < 0, 1)).alias("n_negative"),
        )
    )


ACCTBAL_UNION_STATS_SQL = f"""
SELECT kind, count(*) AS n, {sum_fixed_sql('acctbal', 2)} AS total_bal,
       count(CASE WHEN acctbal < 0 THEN 1 END) AS n_negative
FROM (
  SELECT 'customer' AS kind, c_acctbal AS acctbal FROM customer
  UNION ALL
  SELECT 'supplier' AS kind, s_acctbal AS acctbal FROM supplier
) u
GROUP BY kind
"""


# --------------------------------------------------------------------------
# Merge / upsert (operators/merge.merge_upsert) as an oracle-checked query:
# a change set (orders on/after 2000-07-01: payload revised, 5-LOW rows
# deleted) applied to the full snapshot. The oracle is the relational
# definition of merge: surviving target rows UNION ALL applied source rows.
# Payload revision is a single IEEE add (bit-equal in both engines).
# --------------------------------------------------------------------------

def orders_snapshot_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_data_lake_spark.operators.merge import merge_upsert

    orders = read_table(spark, sf_dir, "orders")
    cutoff = F.lit("2000-07-01")
    target = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    source = orders.where(F.col("o_orderdate") >= cutoff).select(
        "o_orderkey",
        "o_orderstatus",
        (F.col("o_totalprice") + F.lit(1.0)).alias("o_totalprice"),
        (F.col("o_orderpriority") == "5-LOW").alias("is_deleted"),
    )
    return merge_upsert(target, source, keys=["o_orderkey"], delete_col="is_deleted")


ORDERS_SNAPSHOT_MERGE_SQL = """
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders WHERE o_orderdate < TIMESTAMP '2000-07-01 00:00:00'
UNION ALL
SELECT o_orderkey, o_orderstatus, o_totalprice + 1.0 AS o_totalprice
FROM orders
WHERE o_orderdate >= TIMESTAMP '2000-07-01 00:00:00'
  AND o_orderpriority <> '5-LOW'
"""


# --------------------------------------------------------------------------
# Year-over-year monthly revenue growth: window (lag) OVER an aggregate —
# the post-rollup analytic pass. The windowed frame is tiny (one row per
# month), so the window stage is free regardless of input scale.
# --------------------------------------------------------------------------

def monthly_revenue_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
    ).agg(F.sum(to_units(F.col("o_totalprice"), 2)).alias("rev_units"))
    w = Window.partitionBy("mo").orderBy("yr")
    prev = F.lag("rev_units").over(w)
    return monthly.select(
        "yr",
        "mo",
        (F.col("rev_units") / F.lit(100.0)).alias("revenue"),
        ((F.col("rev_units") - prev) / prev).alias("yoy_growth"),
    )


MONTHLY_REVENUE_YOY_SQL = """
WITH monthly AS (
  SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS rev_units
  FROM orders GROUP BY year(o_orderdate), month(o_orderdate)
)
SELECT yr, mo, (rev_units / 100.0) AS revenue,
       ((rev_units - lag(rev_units) OVER w) / (lag(rev_units) OVER w) * 1.0) AS yoy_growth
FROM monthly
WINDOW w AS (PARTITION BY mo ORDER BY yr)
"""


# --------------------------------------------------------------------------
# Unpivot (melt): the weekly event-type pivot turned back into long form —
# wide->long is a narrow per-row transform (Expand), no shuffle at all.
# The SQL twin is the portable UNION ALL formulation.
# --------------------------------------------------------------------------

def weekly_counts_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_data_lake_spark.queries.events_queries import weekly_type_pivot, EVENT_TYPES

    wide = weekly_type_pivot(spark, sf_dir)
    return wide.unpivot(
        ids=["week"], values=EVENT_TYPES, variableColumnName="event_type", valueColumnName="n"
    )


def _weekly_unpivot_sql() -> str:
    from hadoop_data_lake_spark.queries.events_queries import EVENT_TYPES

    arms = " UNION ALL ".join(
        f"SELECT week, '{t}' AS event_type, {t} AS n FROM wide" for t in EVENT_TYPES
    )
    return f"""
WITH wide AS (
  SELECT weekofyear(ts) AS week,
         {', '.join(f"sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)::bigint AS {t}" for t in EVENT_TYPES)}
  FROM events GROUP BY weekofyear(ts)
)
{arms}
"""


WEEKLY_COUNTS_UNPIVOT_SQL = _weekly_unpivot_sql()


# --------------------------------------------------------------------------
# Ratio-to-report: each nation's share of global revenue via an
# unbounded-partition window over the aggregate (the windowed frame is one
# row per nation — free at any input scale). Shares divide exact bigint
# units so both engines produce identical doubles.
# --------------------------------------------------------------------------

def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    per_nation = (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(to_units(F.col("o_totalprice"), 2)).alias("rev_units"))
    )
    total = F.sum("rev_units").over(Window.partitionBy())
    return per_nation.select(
        "n_name",
        (F.col("rev_units") / F.lit(100.0)).alias("revenue"),
        (F.col("rev_units") / total).alias("share"),
    )


NATION_REVENUE_SHARE_SQL = """
WITH per_nation AS (
  SELECT n_name, sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS rev_units
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name, (rev_units / 100.0) AS revenue,
       (rev_units / (sum(rev_units) OVER ()) * 1.0) AS share
FROM per_nation
"""


# --------------------------------------------------------------------------
# Fuzzy entity resolution: near-identical part names by edit distance <= 2,
# blocked on (p_type, p_size) so the quadratic comparison runs only inside
# small blocks — the blocked-comparison shape every record-linkage pipeline
# uses (levenshtein is JVM codegen in Spark, native in DuckDB).
# --------------------------------------------------------------------------

def part_name_near_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    a = part.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        "p_type",
        "p_size",
    )
    b = part.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        F.col("p_type").alias("p_type_b"),
        F.col("p_size").alias("p_size_b"),
    )
    return (
        a.join(
            b,
            (F.col("p_type") == F.col("p_type_b"))
            & (F.col("p_size") == F.col("p_size_b"))
            & (F.col("key_a") < F.col("key_b")),
        )
        .where(F.levenshtein("name_a", "name_b") <= 2)
        .select(
            "key_a",
            "key_b",
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").alias("edit_dist"),
        )
    )


PART_NAME_NEAR_MATCHES_SQL = """
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name) AS edit_dist
FROM part a
JOIN part b ON a.p_type = b.p_type AND a.p_size = b.p_size
           AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 2
"""


# --------------------------------------------------------------------------
# Market-basket co-occurrence: which part brands are bought together in the
# same order. Distinct (order, brand) first, then a self-join that is
# quadratic ONLY within one order's brand set (bounded by order size, not
# data volume) — the association-mining candidate-pair shape. Brands attach
# via broadcast before the distinct, so the self-join carries two small
# string columns.
# --------------------------------------------------------------------------

def brand_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    # checkpoint the (order, brand) basket before the self-join: the two
    # alias-differing branches otherwise re-execute the lineitem x part
    # join + distinct each (2 fact scans -> 1; the FACT-RESCAN cure —
    # serialized, the frame is corpus-scaled but narrow)
    from hadoop_data_lake_spark.core.io import checkpoint_serialized

    ob = checkpoint_serialized(
        li.join(F.broadcast(part.select("p_partkey", "p_brand")), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a = ob.select(F.col("l_orderkey").alias("ok_a"), F.col("p_brand").alias("brand_a"))
    b = ob.select(F.col("l_orderkey").alias("ok_b"), F.col("p_brand").alias("brand_b"))
    return (
        a.join(b, (F.col("ok_a") == F.col("ok_b")) & (F.col("brand_a") < F.col("brand_b")))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("n_orders"))
    )


BRAND_BASKET_PAIRS_SQL = """
WITH ob AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS n_orders
FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
GROUP BY a.p_brand, b.p_brand
"""


def zorder_code_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) codes over orders: customer key x price bucket, both
    quantized to 16 bits (operators/layout.py — pure codegen bit arithmetic,
    the clustering key `zorder_write` lays files out by for 2-D data
    skipping)."""
    from hadoop_data_lake_spark.operators.layout import morton_code

    orders = read_table(spark, sf_dir, "orders")
    a = F.pmod(F.col("o_custkey"), F.lit(65536)).cast("long")
    b = F.least(F.floor(F.col("o_totalprice") / 10), F.lit(65535)).cast("long")
    return orders.select(
        "o_orderkey",
        a.alias("cust_q"),
        b.alias("price_q"),
        morton_code(a, b).alias("zcode"),
    )

ZORDER_CODE_ORDERS_SQL = """
WITH q AS (
  SELECT o_orderkey,
         (o_custkey % 65536)::bigint AS cust_q,
         least(floor(o_totalprice / 10), 65535)::bigint AS price_q
  FROM orders
)
SELECT o_orderkey, cust_q, price_q,
       ((((((((((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) | ((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) | ((((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) | ((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) << 4)) & 1085102592571150095) | ((((((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) | ((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) | ((((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) | ((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) << 4)) & 1085102592571150095) << 2)) & 3689348814741910323) | ((((((((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) | ((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) | ((((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) | ((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) << 4)) & 1085102592571150095) | ((((((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) | ((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) | ((((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) | ((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) << 4)) & 1085102592571150095) << 2)) & 3689348814741910323) << 1)) & 6148914691236517205) | ((((((((((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) | ((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) | ((((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) | ((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) << 4)) & 1085102592571150095) | ((((((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) | ((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) | ((((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) | ((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) << 4)) & 1085102592571150095) << 2)) & 3689348814741910323) | ((((((((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) | ((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) | ((((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) | ((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) << 4)) & 1085102592571150095) | ((((((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) | ((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) | ((((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) | ((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) << 4)) & 1085102592571150095) << 2)) & 3689348814741910323) << 1)) & 6148914691236517205) << 1))::bigint AS zcode
FROM q
"""


# --------------------------------------------------------------------------
# Snapshot diff (CDC): table_changes() between two versions of orders —
# updates (revised totals after a cutoff), deletes (retired 5-LOW rows),
# inserts (synthetic negative keys). One full-outer join on the key.
# --------------------------------------------------------------------------

def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_data_lake_spark.operators.merge import snapshot_diff

    # checkpoint ONE projected base (r11; the snapshot-sim cure from r10):
    # the old snapshot plus the new snapshot's two branches otherwise each
    # re-scan orders (3 visible fact scans -> 1)
    from hadoop_data_lake_spark.core.io import checkpoint_serialized

    orders = checkpoint_serialized(
        read_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
    )
    cutoff = F.col("o_orderdate") >= F.lit("2000-07-01")
    old = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    new = orders.where(~(cutoff & (F.col("o_orderpriority") == "5-LOW"))).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(cutoff, F.col("o_totalprice") + F.lit(1.0))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    ).unionByName(
        orders.where(F.col("o_orderkey") % 97 == 0).select(
            (-F.col("o_orderkey")).alias("o_orderkey"),
            "o_orderstatus",
            "o_totalprice",
        )
    )
    return snapshot_diff(old, new, keys=["o_orderkey"])


def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency (days since last order, so a
    HIGH r_score means stale), frequency, monetary, each scored into
    quartiles against exact-percentile cutoffs. The cutoffs are ONE
    3x3-value aggregate broadcast back over the customers — never a global
    NTILE sort (the percentile-threshold formulation is the scale-safe
    quartiling for wide tables). Cutoffs are ROUNDED to 6dp before the
    score comparisons in both engines so the quartiling is replay-stable
    against 1-ulp percentile-interpolation differences (ADVICE r3)."""
    orders = read_table(spark, sf_dir, "orders")
    # checkpoint the per-customer aggregate (r9 scan-multiplicity audit):
    # the cutoff percentiles and the scoring pass each re-executed the
    # orders scan otherwise (4 scans; now 1 — the global max re-derives
    # from the per-customer maxima)
    per_cust = orders.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_day"),
        F.count(F.lit(1)).alias("freq"),
        sum_fixed(F.col("o_totalprice"), 2).alias("money"),
    ).localCheckpoint(eager=True)
    global_max = per_cust.agg(F.max("last_day").alias("gmax"))
    rfm = per_cust.crossJoin(F.broadcast(global_max)).select(
        "o_custkey",
        F.datediff("gmax", "last_day").cast("double").alias("rec_days"),
        F.col("freq").cast("double").alias("freq"),
        "money",
    )
    cuts = rfm.agg(
        *[
            F.round(F.percentile(c, F.lit(q)), 6).alias(f"{c}_q{i}")
            for c in ("rec_days", "freq", "money")
            for i, q in ((1, 0.25), (2, 0.5), (3, 0.75))
        ]
    )

    def score(c: str):
        s = F.lit(1)
        for i in (1, 2, 3):
            s = s + (F.col(c) > F.col(f"{c}_q{i}")).cast("int")
        return s

    out = rfm.crossJoin(F.broadcast(cuts)).select(
        "o_custkey",
        score("rec_days").alias("r_score"),
        score("freq").alias("f_score"),
        score("money").alias("m_score"),
    )
    return out.withColumn(
        "segment",
        F.concat_ws("-", F.col("r_score"), F.col("f_score"), F.col("m_score")),
    )


CUSTOMER_RFM_SEGMENTS_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_day,
         count(*) AS freq, {sum_fixed_sql('o_totalprice', 2)} AS money
  FROM orders GROUP BY o_custkey
),
gm AS (SELECT max(CAST(o_orderdate AS DATE)) AS gmax FROM orders),
rfm AS (
  SELECT o_custkey,
         date_diff('day', last_day, gmax)::double AS rec_days,
         freq::double AS freq, money
  FROM per_cust, gm
),
cuts AS (
  SELECT round(quantile_cont(rec_days, 0.25), 6) AS r1, round(quantile_cont(rec_days, 0.5), 6) AS r2, round(quantile_cont(rec_days, 0.75), 6) AS r3,
         round(quantile_cont(freq, 0.25), 6) AS f1, round(quantile_cont(freq, 0.5), 6) AS f2, round(quantile_cont(freq, 0.75), 6) AS f3,
         round(quantile_cont(money, 0.25), 6) AS m1, round(quantile_cont(money, 0.5), 6) AS m2, round(quantile_cont(money, 0.75), 6) AS m3
  FROM rfm
)
SELECT o_custkey,
       1 + (rec_days > r1)::int + (rec_days > r2)::int + (rec_days > r3)::int AS r_score,
       1 + (freq > f1)::int + (freq > f2)::int + (freq > f3)::int AS f_score,
       1 + (money > m1)::int + (money > m2)::int + (money > m3)::int AS m_score,
       concat_ws('-',
         1 + (rec_days > r1)::int + (rec_days > r2)::int + (rec_days > r3)::int,
         1 + (freq > f1)::int + (freq > f2)::int + (freq > f3)::int,
         1 + (money > m1)::int + (money > m2)::int + (money > m3)::int) AS segment
FROM rfm, cuts
"""


def expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations in ONE scan: every rule is a conditional
    count folded into a single aggregation, then unpivoted to one row per
    rule — the 'expectations suite' shape (dbt tests / Great Expectations)
    without a second pass per rule. At 100 TB, N rules still cost exactly
    one scan and one 1-row shuffle. NULL handling is pinned by writing each
    rule as when(valid, 0).otherwise(1), so NULLs count as violations in
    both engines."""
    o = read_table(spark, sf_dir, "orders")
    viol = {
        "positive_price": F.when(F.col("o_totalprice") > 0, 0).otherwise(1),
        "status_in_domain": F.when(
            F.col("o_orderstatus").isin("F", "O", "P"), 0
        ).otherwise(1),
        "custkey_not_null": F.when(F.col("o_custkey").isNotNull(), 0).otherwise(1),
        "orderdate_in_range": F.when(
            (F.col("o_orderdate") >= F.lit("1992-01-01"))
            & (F.col("o_orderdate") < F.lit("1998-01-01")),
            0,
        ).otherwise(1),
    }
    agg = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(c.cast("long")).alias(f"v_{name}") for name, c in viol.items()],
    )
    stack_args = ", ".join(f"'{name}', v_{name}" for name in viol)
    return agg.selectExpr(
        f"stack({len(viol)}, {stack_args}) as (rule, n_violations)", "n_rows"
    )


EXPECTATIONS_REPORT_SQL = """
WITH a AS (
  SELECT count(*) AS n_rows,
    sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END)::bigint AS v_positive_price,
    sum(CASE WHEN o_orderstatus IN ('F', 'O', 'P') THEN 0 ELSE 1 END)::bigint AS v_status_in_domain,
    sum(CASE WHEN o_custkey IS NOT NULL THEN 0 ELSE 1 END)::bigint AS v_custkey_not_null,
    sum(CASE WHEN o_orderdate >= TIMESTAMP '1992-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
             THEN 0 ELSE 1 END)::bigint AS v_orderdate_in_range
  FROM orders
)
SELECT 'positive_price' AS rule, v_positive_price AS n_violations, n_rows FROM a
UNION ALL SELECT 'status_in_domain', v_status_in_domain, n_rows FROM a
UNION ALL SELECT 'custkey_not_null', v_custkey_not_null, n_rows FROM a
UNION ALL SELECT 'orderdate_in_range', v_orderdate_in_range, n_rows FROM a
"""


def incremental_orders_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: per-status order counts + revenue kept
    current by folding the SIGNED delta (operators/merge.snapshot_delta)
    into the previous snapshot's aggregate — never re-aggregating the new
    snapshot. The DuckDB oracle IS the full recompute over the new
    snapshot, so a green row proves incremental == recompute exactly
    (revenue delta merges in integer cents — no float drift across folds).
    At 100 TB with ~1% churn the delta path aggregates 100× fewer rows."""
    from hadoop_data_lake_spark.functions.fixedpoint import to_units
    from hadoop_data_lake_spark.operators.merge import snapshot_delta

    # The old/new snapshots are SIMULATED from the single driver table; a
    # real deployment reads two physical snapshot tables once each. The
    # checkpointed projection mirrors that honestly — one orders scan
    # lifetime instead of four (old_agg + the delta join's re-executed
    # old/new subtrees) — closing the FACT_RESCAN_ALLOW exemption (r10).
    from hadoop_data_lake_spark.core.io import checkpoint_serialized

    orders = checkpoint_serialized(read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    ))
    cutoff = F.col("o_orderdate") >= F.lit("2000-07-01")
    old = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    new = orders.where(~(cutoff & (F.col("o_orderpriority") == "5-LOW"))).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(cutoff, F.col("o_totalprice") + F.lit(1.0))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    ).unionByName(
        # -key - 1, NOT -key: o_orderkey 0 exists in the driver data, and
        # -0 would collide with the surviving original — a duplicate key
        # breaks the snapshot key contract (and delta multiplicity with it).
        orders.where(F.col("o_orderkey") % 97 == 0).select(
            (-F.col("o_orderkey") - 1).alias("o_orderkey"),
            "o_orderstatus",
            "o_totalprice",
        )
    )

    old_agg = old.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(to_units(F.col("o_totalprice"), 2)).alias("cents0"),
    )
    delta = snapshot_delta(old, new, keys=["o_orderkey"])
    d_agg = delta.groupBy("o_orderstatus").agg(
        F.sum("sign").alias("dn"),
        F.sum(F.col("sign") * to_units(F.col("o_totalprice"), 2)).alias("dcents"),
    )
    merged = old_agg.join(d_agg, "o_orderstatus", "full_outer").select(
        F.col("o_orderstatus").alias("status"),
        (F.coalesce("n0", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n_orders"),
        (
            (F.coalesce("cents0", F.lit(0)) + F.coalesce("dcents", F.lit(0)))
            / F.lit(100.0)
        ).cast("double").alias("revenue"),
    )
    return merged.where(F.col("n_orders") > 0)


INCREMENTAL_ORDERS_AGG_SQL = f"""
WITH new_s AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderdate >= TIMESTAMP '2000-07-01 00:00:00'
              THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice
  FROM orders
  WHERE NOT (o_orderdate >= TIMESTAMP '2000-07-01 00:00:00'
             AND o_orderpriority = '5-LOW')
  UNION ALL
  SELECT -o_orderkey - 1, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 97 = 0
)
SELECT o_orderstatus AS status, count(*) AS n_orders,
       {sum_fixed_sql('o_totalprice', 2)} AS revenue
FROM new_s GROUP BY o_orderstatus
"""


ORDERS_SNAPSHOT_DIFF_SQL = """
WITH old_s AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
),
new_s AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderdate >= TIMESTAMP '2000-07-01 00:00:00'
              THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice
  FROM orders
  WHERE NOT (o_orderdate >= TIMESTAMP '2000-07-01 00:00:00'
             AND o_orderpriority = '5-LOW')
  UNION ALL
  SELECT -o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 97 = 0
),
d AS (
  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         CASE WHEN o.o_orderkey IS NULL THEN 'I'
              WHEN n.o_orderkey IS NULL THEN 'D'
              WHEN (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
                   OR (o.o_totalprice IS DISTINCT FROM n.o_totalprice) THEN 'U'
         END AS op,
         CASE WHEN n.o_orderkey IS NULL THEN o.o_orderstatus
              ELSE n.o_orderstatus END AS o_orderstatus,
         CASE WHEN n.o_orderkey IS NULL THEN o.o_totalprice
              ELSE n.o_totalprice END AS o_totalprice
  FROM old_s o FULL OUTER JOIN new_s n ON o.o_orderkey = n.o_orderkey
)
SELECT * FROM d WHERE op IS NOT NULL
"""


def purchase_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the bipartite customer->supplier purchase graph
    (orders x lineitem; node ids disambiguated as customers >= 0,
    suppliers mapped to -(suppkey+1) — plain negation collides supplier 0
    with customer 0, both of which exist). Rows-only: iterative float
    accumulation is not
    value-hash-stable across engines; numpy power-iteration parity is
    asserted in tests/test_graph.py."""
    from hadoop_data_lake_spark.operators.graph import pagerank

    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (-F.col("l_suppkey") - 1).alias("dst"),
        )
        .distinct()
    )
    return pagerank(edges, max_iter=10)


def ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view when BOTH sides churn: keep
    revenue-per-market-segment over orders ⋈ customer current by folding
    signed join deltas instead of re-joining the snapshots. Uses the exact
    multiset identity

        A_new⋈B_new − A_old⋈B_old  =  ΔA⋈B_new  ∪  A_old⋈ΔB

    (ΔX = signed snapshot_delta), so the incremental input is |changed
    orders|⋈customer + orders⋈|changed customers| — at 100 TB with ~1%
    churn, two joins each ~100× smaller than the recompute, reusing the
    same join keys (no new shuffle shape). Customer churn includes a
    GROUP-KEY MOVE (segment change), the case naive "just add the new
    rows" maintenance gets wrong: the retraction and addition land in
    different segments and both must fold. Revenue merges in integer
    cents — no float drift across folds. The DuckDB oracle IS the full
    recompute over the new snapshots, so a green row proves incremental ==
    recompute exactly (same proof shape as incremental_orders_agg)."""
    from hadoop_data_lake_spark.operators.merge import snapshot_delta

    # Same single-scan move as incremental_orders_agg: both simulated
    # snapshot pairs derive from ONE checkpointed projection per physical
    # table (orders was re-scanned 5x, customer 6x through the
    # alias-differing old/new/delta subtrees; a real deployment reads each
    # snapshot table once) — closing the FACT_RESCAN_ALLOW exemption (r10).
    from hadoop_data_lake_spark.core.io import checkpoint_serialized

    orders = checkpoint_serialized(read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    ))
    cust = checkpoint_serialized(read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    ))
    cutoff = F.col("o_orderdate") >= F.lit("2000-07-01")
    o_old = orders.select("o_orderkey", "o_custkey", "o_totalprice")
    o_new = (
        orders.where(~(cutoff & (F.col("o_orderpriority") == "5-LOW")))
        .select(
            "o_orderkey",
            "o_custkey",
            F.when(cutoff, F.col("o_totalprice") + F.lit(1.0))
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
        .unionByName(
            orders.where(F.col("o_orderkey") % 97 == 0).select(
                (-F.col("o_orderkey") - 1).alias("o_orderkey"),
                "o_custkey",
                "o_totalprice",
            )
        )
    )
    c_old = cust.select("c_custkey", "c_mktsegment")
    c_new = (
        cust.where(F.col("c_custkey") % 31 != 0)
        .select(
            "c_custkey",
            F.when(F.col("c_custkey") % 11 == 0, F.lit("MOVED"))
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
        )
        .unionByName(
            cust.where(F.col("c_custkey") % 53 == 0).select(
                (-F.col("c_custkey") - 1).alias("c_custkey"), "c_mktsegment"
            )
        )
    )

    cents = to_units(F.col("o_totalprice"), 2)
    # Size hints for the checkpointed-side joins (r16, VERDICT r15 item
    # 2): every frame here derives from a localCheckpoint, which scans as
    # ExistingRDD with NO stats — Catalyst plans all six joins as
    # stats-blind SortMergeJoins and only AQE's runtime conversion can
    # rescue them. The customer-derived sides have DRIVER-KNOWN row
    # bounds from the parquet footers (|c_old| <= |customer|; |c_new| <=
    # |customer| + |customer|/53 + 1; |d_cust| <= 2 rows per key over
    # both snapshots' keys <= 4|customer| + 4), so broadcast_bounded_state
    # broadcasts them when they provably fit its row/byte caps and leaves
    # the SMJ untouched when they don't — at 100 TB the customer
    # dimension blows the cap and the shuffle formulation stands, which
    # is exactly what a real cluster wants (the r15 analysis that
    # rejected an unconditional broadcast as a local-only win). The two
    # snapshot_delta full-outer joins keep their SMJs: FULL OUTER cannot
    # build a one-sided hash relation, and they are the genuine data
    # work. Bit-identical: a broadcast hint changes the join strategy,
    # never the join semantics.
    from hadoop_data_lake_spark.core.io import parquet_row_count
    from hadoop_data_lake_spark.operators.graph import (
        BROADCAST_STATE_MAX_ROWS,
        broadcast_bounded_state,
    )

    n_cust = parquet_row_count(
        sf_dir, "customer", cap=BROADCAST_STATE_MAX_ROWS
    )
    old_agg = (
        o_old.join(
            broadcast_bounded_state(c_old, n_cust),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n0"), F.sum(cents).alias("cents0"))
    )
    d_orders = snapshot_delta(o_old, o_new, keys=["o_orderkey"])
    d_cust = snapshot_delta(c_old, c_new, keys=["c_custkey"])
    part_a = d_orders.join(
        broadcast_bounded_state(
            c_new, None if n_cust is None else 2 * n_cust + 2
        ),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select("c_mktsegment", "sign", cents.alias("cents"))
    part_b = o_old.join(
        broadcast_bounded_state(
            d_cust, None if n_cust is None else 4 * n_cust + 4
        ),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select("c_mktsegment", "sign", cents.alias("cents"))
    d_agg = (
        part_a.unionByName(part_b)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("sign").alias("dn"),
            F.sum(F.col("sign") * F.col("cents")).alias("dcents"),
        )
    )
    merged = old_agg.join(d_agg, "c_mktsegment", "full_outer").select(
        F.col("c_mktsegment").alias("segment"),
        (F.coalesce("n0", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n_orders"),
        (
            (F.coalesce("cents0", F.lit(0)) + F.coalesce("dcents", F.lit(0)))
            / F.lit(100.0)
        ).cast("double").alias("revenue"),
    )
    return merged.where(F.col("n_orders") > 0)


IVM_JOIN_DELTA_SQL = f"""
WITH o_new AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderdate >= TIMESTAMP '2000-07-01 00:00:00'
              THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice
  FROM orders
  WHERE NOT (o_orderdate >= TIMESTAMP '2000-07-01 00:00:00'
             AND o_orderpriority = '5-LOW')
  UNION ALL
  SELECT -o_orderkey - 1, o_custkey, o_totalprice
  FROM orders WHERE o_orderkey % 97 = 0
),
c_new AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 11 = 0 THEN 'MOVED' ELSE c_mktsegment END AS c_mktsegment
  FROM customer WHERE c_custkey % 31 <> 0
  UNION ALL
  SELECT -c_custkey - 1, c_mktsegment FROM customer WHERE c_custkey % 53 = 0
)
SELECT c.c_mktsegment AS segment, count(*) AS n_orders,
       {sum_fixed_sql('o.o_totalprice', 2)} AS revenue
FROM o_new o JOIN c_new c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


def hilbert_code_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve codes over orders: customer key x price bucket, both
    quantized to 16 bits (operators/layout.with_hilbert_code — stacked
    named projections, pure JVM bit arithmetic). The locality-superior
    sibling of zorder_code_orders: a Hilbert walk has no quadrant-boundary
    jumps, so range-partitioning on `hcode` yields tighter per-file
    bounding rectangles and better min/max skipping than Morton order.
    The oracle replays the xy2d recurrence as 16 chained CTEs."""
    from hadoop_data_lake_spark.operators.layout import with_hilbert_code

    orders = read_table(spark, sf_dir, "orders")
    a = F.pmod(F.col("o_custkey"), F.lit(65536)).cast("long")
    b = F.least(F.floor(F.col("o_totalprice") / 10), F.lit(65535)).cast("long")
    return with_hilbert_code(
        orders.select(
            "o_orderkey", a.alias("cust_q"), b.alias("price_q")
        ),
        F.col("cust_q"),
        F.col("price_q"),
        out="hcode",
        bits=16,
    )


def _hilbert_orders_sql() -> str:
    from hadoop_data_lake_spark.operators.layout import hilbert_sql_ctes

    ctes = hilbert_sql_ctes(
        "q", "o_orderkey, cust_q, price_q", "cust_q", "price_q", bits=16
    )
    return f"""
WITH q AS (
  SELECT o_orderkey,
         (o_custkey % 65536)::bigint AS cust_q,
         least(floor(o_totalprice / 10), 65535)::bigint AS price_q
  FROM orders
),
{ctes}
SELECT o_orderkey, cust_q, price_q, d AS hcode FROM h0
"""


HILBERT_CODE_ORDERS_SQL = _hilbert_orders_sql()


def pagerank_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point integer PageRank (operators/graph.pagerank_intexact) over
    the same bipartite customer->supplier purchase graph as
    `purchase_graph_pagerank` — but value-hash replayable: every iteration
    is integer arithmetic, and the DuckDB oracle unrolls the 10 iterations
    as chained CTEs computing the identical recurrence. This promotes the
    iterative-graph family from rows-only to the full correctness gate."""
    from pyspark.sql import Window

    from hadoop_data_lake_spark.operators.graph import pagerank_intexact

    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e_raw = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        F.col("o_custkey").alias("src"),
        (-F.col("l_suppkey") - 1).alias("dst"),
    )

    from hadoop_data_lake_spark.operators import graph as G

    # Round 15: the common case runs the FUSED driver tier
    # (operators/graph.pagerank_layered_driver — the hits_topk_sides_driver
    # pattern): ONE Arrow collect of the raw join projection; pair-dedup,
    # degrees, the layered test, the sink histogram and all 10 rounds in
    # numpy/driver integers (bit-identical recurrence, pinned by test).
    # The cap bound is the lineitem row count alone (read off the parquet
    # footers — no Spark job; exact, so still a sound bound — with the
    # column-pruned count as the fallback when footers are unreadable):
    # the inner join on orders' primary key cannot multiply lineitem
    # rows, so |raw edges| <= |lineitem|. Above the cap — or if the tier
    # declines — the r13 distributed build below stands unchanged.
    if G.GENERAL_DRIVER_TIER_ENABLED:
        from hadoop_data_lake_spark.core.io import parquet_row_count

        # cap= (r16): the footer loop stops as soon as the sum exceeds the
        # tier's edge cap — bounded driver metadata work on many-file
        # tables (the returned over-cap partial sum still declines the
        # tier; only an under-cap return is the exact count).
        bound = parquet_row_count(
            sf_dir, "lineitem", cap=G.NUMPY_DRIVER_MAX_EDGES
        )
        top = G.pagerank_layered_driver(
            e_raw,
            "src",
            "dst",
            iters=10,
            n_edges_bound=bound if bound is not None else li.count(),
        )
        if top is not None:
            return top

    # Round 13: ONE exchange builds dedup + out-degree together —
    # repartition(src) hash-clusters by the prefix, so dropDuplicates
    # (ClusteredDistribution(src, dst)) AND the deg window
    # (ClusteredDistribution(src)) both reuse it (the scd2_collapse
    # prefix rule); the operator's deg_col path then skips its own
    # groupBy(src) aggregate and every out-degree join. Previously:
    # distinct shuffled by (src, dst), and the operator re-aggregated +
    # re-joined degrees (r12 profile: 1.6 s of 2.45 s in this build).
    edges = (
        e_raw.repartition("src")
        .dropDuplicates(["src", "dst"])
        .withColumn("deg", F.count("*").over(Window.partitionBy("src")))
    )
    return pagerank_intexact(edges, iters=10, deg_col="deg")


def _pagerank_det_sql(iters: int = 10, scale: int = 10**12) -> str:
    parts = [
        f"""
WITH e AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS src, -l.l_suppkey - 1 AS dst
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
verts AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
nn AS MATERIALIZED (SELECT count(*) AS n FROM verts),
outdeg AS MATERIALIZED (SELECT src, count(*) AS deg FROM e GROUP BY src),
r0 AS MATERIALIZED (SELECT node, ({scale} // (SELECT n FROM nn)) AS rank FROM verts)"""
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f""",
s{i} AS MATERIALIZED (
  SELECT e.dst AS node, sum(r.rank // d.deg)::bigint AS s
  FROM e JOIN r{p} r ON e.src = r.node JOIN outdeg d ON e.src = d.src
  GROUP BY e.dst
),
dg{i} AS MATERIALIZED (
  SELECT coalesce(sum(r.rank), 0)::bigint AS dsum FROM r{p} r
  WHERE NOT EXISTS (SELECT 1 FROM outdeg o WHERE o.src = r.node)
),
r{i} AS MATERIALIZED (
  SELECT v.node,
         ((15 * ({scale} // (SELECT n FROM nn))) // 100)
         + ((85 * (coalesce(s.s, 0)
                   + ((SELECT dsum FROM dg{i}) // (SELECT n FROM nn)))) // 100)
         AS rank
  FROM verts v LEFT JOIN s{i} s ON v.node = s.node
)"""
        )
    parts.append(f"\nSELECT node, rank AS rank_units FROM r{iters}")
    return "".join(parts)


PAGERANK_DET_SQL = _pagerank_det_sql()


def bfs_hops_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first minimum hop counts from a deterministic seed set of
    suppliers (s_suppkey % 7 == 1 — non-empty at every sf) over the
    undirected purchase graph, bounded at 4 levels
    (operators/graph.bfs_hops). Each level is a frontier equi-join + an
    anti-join against the visited set — all integer set operations, so the
    DuckDB oracle replays the levels as unrolled CTEs (no recursive CTE:
    cyclic graphs make naive recursion enumerate paths, not nodes)."""
    from hadoop_data_lake_spark.operators.graph import bfs_hops

    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supp = read_table(spark, sf_dir, "supplier")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (-F.col("l_suppkey") - 1).alias("dst"),
        )
        .distinct()
    )
    seeds = supp.where(F.col("s_suppkey") % 7 == 1).select(
        (-F.col("s_suppkey") - 1).alias("node")
    )
    return bfs_hops(edges, seeds, max_hops=4)


def _bfs_hops_det_sql(max_hops: int = 4) -> str:
    parts = [
        """
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS src, -l.l_suppkey - 1 AS dst
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
e AS MATERIALIZED (SELECT src AS s, dst AS d FROM e0 UNION SELECT dst, src FROM e0),
f0 AS MATERIALIZED (SELECT DISTINCT -s_suppkey - 1 AS node FROM supplier WHERE s_suppkey % 7 = 1),
v0 AS MATERIALIZED (SELECT node FROM f0)"""
    ]
    for k in range(1, max_hops + 1):
        p = k - 1
        parts.append(
            f""",
f{k} AS MATERIALIZED (
  SELECT DISTINCT e.d AS node FROM e JOIN f{p} ON e.s = f{p}.node
  WHERE NOT EXISTS (SELECT 1 FROM v{p} WHERE v{p}.node = e.d)
),
v{k} AS MATERIALIZED (SELECT node FROM v{p} UNION SELECT node FROM f{k})"""
        )
    selects = " UNION ALL ".join(
        f"SELECT node, {k} AS hop FROM f{k}" for k in range(max_hops + 1)
    )
    parts.append(f"\n{selects}")
    return "".join(parts)


BFS_HOPS_DET_SQL = _bfs_hops_det_sql()


def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law quality audit of o_totalprice: observed first-digit
    share vs the expected log10(1 + 1/d). Fraud/synthetic-data screens run
    exactly this on financial facts. The digit comes from the INTEGER cents
    rendering (cast bigint -> string), never from float formatting, which
    engines disagree on; shares divide identical bigints and round once.
    One aggregation pass; the 9-row total re-sum is window arithmetic on
    the agg output, not a second scan."""
    from hadoop_data_lake_spark.functions.fixedpoint import to_units
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders")
    digit = F.substring(
        to_units(F.col("o_totalprice")).cast("string"), 1, 1
    ).cast("int")
    per = orders.groupBy(digit.alias("digit")).agg(F.count("*").alias("n_obs"))
    w = Window.partitionBy()
    return per.select(
        "digit",
        "n_obs",
        F.round(
            F.col("n_obs").cast("double") / F.sum("n_obs").over(w).cast("double"), 6
        ).alias("obs_share_r"),
        F.round(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")), 6).alias(
            "benford_p_r"
        ),
    )


BENFORD_FIRST_DIGIT_SQL = """
WITH per AS (
  SELECT substr((round(o_totalprice * 100)::bigint)::varchar, 1, 1)::int AS digit,
         count(*) AS n_obs
  FROM orders GROUP BY 1
)
SELECT digit, n_obs,
       round(n_obs::double / (sum(n_obs) OVER ())::double, 6) AS obs_share_r,
       round(log10(1.0 + 1.0 / digit::double), 6) AS benford_p_r
FROM per
"""


def bloom_semijoin_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join orders to BUILDING-segment customers through a bloom-filter
    PREFILTER: the qualifying keys' k=3 salted-md5 bit positions (m=65536)
    form a distinct bucket set; an order survives the prefilter iff all
    three of its positions are present, then an exact semi-join removes the
    bloom's false positives. No false negatives by construction, so the
    result equals the plain semi-join — which IS the oracle.

    The 100 TB story: the bit set is a few thousand integers (broadcast,
    ~KBs) while the exact join's build side is the full key set — the bloom
    stage prunes the probe-side scan output to ~|matches| rows before any
    shuffle, the same role runtime row-group bloom pushdown plays in
    lakehouse engines. False-positive rate at these fills: (fill)^3 ~ 1e-5.
    """
    from hadoop_data_lake_spark.functions.hashing import salted_md5_60bit

    m = 65536
    cust = read_table(spark, sf_dir, "customer")
    qual = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    bits = (
        qual.select(
            F.explode(
                F.array(
                    *[
                        (salted_md5_60bit(F.col("c_custkey").cast("string"), i) % m)
                        for i in range(3)
                    ]
                )
            ).alias("b")
        )
        .distinct()
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    pos = F.array(
        *[
            (salted_md5_60bit(F.col("o_custkey").cast("string"), i) % m)
            for i in range(3)
        ]
    )
    candidates = (
        orders.withColumn("b", F.explode(pos))
        .join(F.broadcast(bits), "b")
        .groupBy("o_orderkey", "o_custkey", "o_totalprice")
        .agg(F.count("*").alias("hits"))
        .where(F.col("hits") == 3)
        .drop("hits")
    )
    return candidates.join(
        F.broadcast(qual),
        candidates["o_custkey"] == qual["c_custkey"],
        "left_semi",
    )


BLOOM_SEMIJOIN_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""


def zonemap_tile_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map effectiveness report for the Z-order layout: bucket orders
    into 64 Morton tiles (zcode high bits — the file/row-group boundaries a
    zorder_write layout would produce), record each tile's min/max on both
    clustered dimensions, and flag which tiles a 2-D box predicate
    (cust_q in [8000,16000] x price_q in [10000,20000]) can skip WITHOUT
    reading. This is the quantified version of what
    operators/layout.collect_file_stats + prune_files do against real
    files — expressed on tiles so the oracle can replay it: data skipping
    is min/max interval disjointness, all integer arithmetic."""
    from hadoop_data_lake_spark.operators.layout import morton_code

    orders = read_table(spark, sf_dir, "orders")
    a = F.pmod(F.col("o_custkey"), F.lit(65536)).cast("long")
    b = F.least(F.floor(F.col("o_totalprice") / 10), F.lit(65535)).cast("long")
    tiles = orders.select(a.alias("cust_q"), b.alias("price_q")).withColumn(
        "tile", F.shiftright(morton_code(F.col("cust_q"), F.col("price_q")), 26)
    )
    rep = tiles.groupBy("tile").agg(
        F.count("*").alias("n_rows"),
        F.min("cust_q").alias("min_cust"),
        F.max("cust_q").alias("max_cust"),
        F.min("price_q").alias("min_price"),
        F.max("price_q").alias("max_price"),
    )
    skip = (
        (F.col("max_cust") < 8000)
        | (F.col("min_cust") > 16000)
        | (F.col("max_price") < 10000)
        | (F.col("min_price") > 20000)
    )
    return rep.select(
        "tile", "n_rows", "min_cust", "max_cust", "min_price", "max_price",
        skip.cast("int").alias("skippable"),
    )


ZONEMAP_TILE_PRUNING_SQL = """
WITH q AS (
  SELECT (o_custkey % 65536)::bigint AS cust_q,
         least(floor(o_totalprice / 10), 65535)::bigint AS price_q
  FROM orders
),
t AS (
  SELECT cust_q, price_q, (((((((((((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) | ((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) | ((((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) | ((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) << 4)) & 1085102592571150095) | ((((((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) | ((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) | ((((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) | ((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) << 4)) & 1085102592571150095) << 2)) & 3689348814741910323) | ((((((((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) | ((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) | ((((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) | ((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) << 4)) & 1085102592571150095) | ((((((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) | ((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) | ((((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) | ((((cust_q & 4294967295) | ((cust_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) << 4)) & 1085102592571150095) << 2)) & 3689348814741910323) << 1)) & 6148914691236517205) | ((((((((((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) | ((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) | ((((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) | ((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) << 4)) & 1085102592571150095) | ((((((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) | ((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) | ((((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) | ((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) << 4)) & 1085102592571150095) << 2)) & 3689348814741910323) | ((((((((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) | ((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) | ((((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) | ((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) << 4)) & 1085102592571150095) | ((((((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) | ((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) | ((((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) | ((((price_q & 4294967295) | ((price_q & 4294967295) << 16)) & 281470681808895) << 8)) & 71777214294589695) << 4)) & 1085102592571150095) << 2)) & 3689348814741910323) << 1)) & 6148914691236517205) << 1)) // 67108864)::bigint AS tile FROM q
),
rep AS (
  SELECT tile, count(*) AS n_rows,
         min(cust_q) AS min_cust, max(cust_q) AS max_cust,
         min(price_q) AS min_price, max(price_q) AS max_price
  FROM t GROUP BY tile
)
SELECT tile, n_rows, min_cust, max_cust, min_price, max_price,
       (max_cust < 8000 OR min_cust > 16000
        OR max_price < 10000 OR min_price > 20000)::int AS skippable
FROM rep
"""


def linkage_jaro_winkler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked record linkage over part names with Jaro-Winkler scoring —
    the classic entity-resolution shape: BLOCK first (candidates = pairs
    sharing a name-token prefix; one shuffle on the block key, pair count
    bounded by block sizes), THEN score only candidates with the
    pandas-UDF metric (functions/strsim.py), keep sim >= 0.93. Blocking is
    what makes this 100 TB-shaped: the quadratic all-pairs never exists;
    the UDF — the unavoidable Python step, since Catalyst has no
    Jaro-Winkler — sees only the blocked candidates via Arrow batches.
    Full oracle: the Python metric is bit-for-bit DuckDB's
    jaro_winkler_similarity (verified on 2000+ corpus pairs).

    Delegates to `operators/linkage.blocked_jaro_winkler_pairs` with the
    block width PINNED at 1 token (the graded sf0.01 candidate set; the
    sf0.1 sweep variant pins 2). Deployments pass block_tokens=None to
    engage the operator's blocking scale law instead — width-1 token
    blocking over a fixed vocabulary is block-quadratic and the wrong
    plan at scale (measured: 242 s vs 18 s at sf0.1, BENCH_NOTES r15)."""
    from hadoop_data_lake_spark.operators.linkage import (
        blocked_jaro_winkler_pairs,
    )

    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    return blocked_jaro_winkler_pairs(
        part, "p_partkey", "p_name", threshold=0.93, block_tokens=1
    )


LINKAGE_JARO_WINKLER_SQL = """
WITH blocked AS (
  SELECT p_partkey, p_name, split_part(p_name, ' ', 1) AS blk FROM part
)
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS sim_r
FROM blocked a JOIN blocked b
  ON a.blk = b.blk AND a.p_partkey < b.p_partkey
WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 6) >= 0.93
"""


def pareto_frontier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (skyline) of orders: maximize total price AND
    recency. An order is dominated iff some other order is strictly later
    AND strictly more expensive; the frontier is everything not dominated.
    The distributed-friendly 2-D formulation is aggregate-then-window,
    not a quadratic self-join and not a global window over the fact
    table: "max price over strictly later dates" depends only on per-DATE
    maxima, so phase 1 is one hash aggregate to the per-date max (full
    map-side combine; |dates| is ~10^3-10^4 even at 100 TB), phase 2 a
    window over that DIMENSION-BOUNDED frame (date-desc, range frame
    excluding the current date so date-ties never dominate each other),
    phase 3 a broadcast join of the per-date threshold back to orders.
    The self-join skyline is O(n^2) and never built; no fact-table global
    sort ever happens (VERDICT r4 item 2)."""
    from hadoop_data_lake_spark.functions.fixedpoint import to_units
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        to_units(F.col("o_totalprice")).alias("cents"),
        F.unix_date(F.to_date("o_orderdate")).alias("d"),
    )
    per_date = orders.groupBy("d").agg(F.max("cents").alias("day_max"))
    w = (
        Window.orderBy(F.col("d").desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    # rangeBetween on a desc sort: "-1" = one unit TOWARD the sort start,
    # i.e. dates strictly greater than the current row's.
    thresholds = per_date.withColumn("max_later", F.max("day_max").over(w)).select(
        "d", "max_later"
    )
    flagged = orders.join(F.broadcast(thresholds), "d")
    return (
        flagged.where(
            F.col("max_later").isNull() | (F.col("cents") > F.col("max_later"))
        )
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "cents",
        )
    )


PARETO_FRONTIER_ORDERS_SQL = """
WITH o AS (
  SELECT o_orderkey, o_orderdate::varchar AS o_orderdate,
         round(o_totalprice * 100)::bigint AS cents,
         datediff('day', DATE '1970-01-01', o_orderdate::date) AS d
  FROM orders
),
f AS (
  SELECT *, max(cents) OVER (
           ORDER BY d DESC RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS max_later
  FROM o
)
SELECT o_orderkey, o_orderdate, cents
FROM f WHERE max_later IS NULL OR cents > max_later
"""


def kcore_purchase_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nodes surviving 4 rounds of 3-core peeling on the undirected
    customer-supplier purchase graph (operators/graph.kcore_peel) with
    their residual degrees — the dense-subgraph extraction used to find
    committed buyer/supplier communities. Fixed-round peeling unrolls into
    chained materialized CTEs for the oracle, like pagerank_det/bfs_hops."""
    from hadoop_data_lake_spark.operators.graph import kcore_peel

    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (-F.col("l_suppkey") - 1).alias("dst"),
        )
        .distinct()
    )
    return kcore_peel(edges, k=3, peels=4)


def _kcore_sql(k: int = 3, peels: int = 4) -> str:
    parts = [
        """
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT least(o.o_custkey, -l.l_suppkey - 1) AS s,
         greatest(o.o_custkey, -l.l_suppkey - 1) AS d
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)"""
    ]
    for i in range(1, peels + 1):
        p = i - 1
        parts.append(
            f""",
deg{i} AS MATERIALIZED (
  SELECT node, count(*) AS deg FROM (
    SELECT s AS node FROM e{p} UNION ALL SELECT d FROM e{p}
  ) GROUP BY node
),
keep{i} AS MATERIALIZED (SELECT node FROM deg{i} WHERE deg >= {k}),
e{i} AS MATERIALIZED (
  SELECT e.s, e.d FROM e{p} e
  WHERE EXISTS (SELECT 1 FROM keep{i} x WHERE x.node = e.s)
    AND EXISTS (SELECT 1 FROM keep{i} y WHERE y.node = e.d)
)"""
        )
    parts.append(
        f"""
SELECT node, count(*) AS deg FROM (
  SELECT s AS node FROM e{peels} UNION ALL SELECT d FROM e{peels}
) GROUP BY node HAVING count(*) >= {k}"""
    )
    return "".join(parts)


KCORE_PURCHASE_GRAPH_SQL = _kcore_sql()


def association_rules_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over brand baskets (the step after
    brand_basket_pairs): for each directed rule A -> B with pair support
    >= 50 orders, confidence = n_ab / n_a and lift = confidence /
    (n_b / N). Every input is an integer count from two aggregations over
    the same basket frame (pairs + per-brand supports, grand total as a
    broadcast scalar); the two ratios are single rounded expressions —
    the market-basket classic in its distributed shape (co-occurrence
    self-join on the order key, never a cross of the catalog)."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    ob = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_orderkey", "p_brand")
        .distinct()
        .localCheckpoint(eager=True)  # feeds three aggregations below
    )
    a = ob.select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand_a"))
    b = ob.select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand_b"))
    pairs = (
        a.join(b, "ok")
        .where(F.col("brand_a") != F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= 50)
    )
    support = ob.groupBy("p_brand").agg(F.count("*").alias("n_brand"))
    n_orders = ob.select("l_orderkey").distinct().agg(F.count("*").alias("n_o"))
    out = (
        pairs.join(
            support.select(F.col("p_brand").alias("brand_a"), F.col("n_brand").alias("n_a")),
            "brand_a",
        )
        .join(
            support.select(F.col("p_brand").alias("brand_b"), F.col("n_brand").alias("n_b")),
            "brand_b",
        )
        .crossJoin(F.broadcast(n_orders))
    )
    conf = F.col("n_ab").cast("double") / F.col("n_a").cast("double")
    lift = conf / (F.col("n_b").cast("double") / F.col("n_o").cast("double"))
    return out.select(
        "brand_a",
        "brand_b",
        "n_ab",
        "n_a",
        "n_b",
        F.round(conf, 6).alias("confidence_r"),
        F.round(lift, 6).alias("lift_r"),
    )


ASSOCIATION_RULES_BRANDS_SQL = """
WITH ob AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS n_ab
  FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.p_brand <> b.p_brand
  GROUP BY a.p_brand, b.p_brand HAVING count(*) >= 50
),
support AS (SELECT p_brand, count(*) AS n_brand FROM ob GROUP BY p_brand),
n_orders AS (SELECT count(DISTINCT l_orderkey) AS n_o FROM ob)
SELECT p.brand_a, p.brand_b, p.n_ab, sa.n_brand AS n_a, sb.n_brand AS n_b,
       round(p.n_ab::double / sa.n_brand::double, 6) AS confidence_r,
       round((p.n_ab::double / sa.n_brand::double)
             / (sb.n_brand::double / (SELECT n_o FROM n_orders)::double), 6) AS lift_r
FROM pairs p
JOIN support sa ON sa.p_brand = p.brand_a
JOIN support sb ON sb.p_brand = p.brand_b
"""


def clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient over the brand co-occurrence graph
    (brands adjacent when they share >= 2% of orders — a RELATIVE support
    threshold, so the graph keeps its shape across scale factors where an
    absolute cutoff empties or saturates): triangles via the
    ordered two-wedge join (operators/graph.triangle_count) divided by
    deg*(deg-1)/2 possible wedges — how clique-like each brand's
    neighborhood is. Integer triangles/degrees; one rounded ratio."""
    from hadoop_data_lake_spark.operators.graph import triangle_count

    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    ob = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a = ob.select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("ba"))
    b = ob.select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("bb"))
    n_orders = ob.select("l_orderkey").distinct().agg(F.count("*").alias("n_o"))
    edges = (
        a.join(b, "ok")
        .where(F.col("ba") < F.col("bb"))
        .groupBy("ba", "bb")
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(n_orders))
        .where(F.col("n") * 50 >= F.col("n_o"))
        .select(F.col("ba").alias("src"), F.col("bb").alias("dst"))
        .localCheckpoint(eager=True)
    )
    tri = triangle_count(edges)
    deg = (
        edges.select(F.col("src").alias("vertex"))
        .unionByName(edges.select(F.col("dst").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count("*").alias("deg"))
    )
    return (
        deg.join(tri, "vertex", "left")
        .select(
            F.col("vertex").alias("brand"),
            "deg",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.when(
                F.col("deg") >= 2,
                F.round(
                    F.coalesce("n_triangles", F.lit(0)).cast("double") * 2.0
                    / (F.col("deg").cast("double") * (F.col("deg").cast("double") - 1.0)),
                    6,
                ),
            ).alias("clustering_r"),
        )
    )


CLUSTERING_COEFFICIENT_SQL = """
WITH ob AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
edges AS MATERIALIZED (
  SELECT a.p_brand AS s, b.p_brand AS d
  FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY a.p_brand, b.p_brand
  HAVING count(*) * 50 >= (SELECT count(DISTINCT l_orderkey) FROM ob)
),
tris AS (
  SELECT e1.s AS ta, e1.d AS tb, e2.d AS tc
  FROM edges e1
  JOIN edges e2 ON e1.d = e2.s
  JOIN edges e3 ON e3.s = e1.s AND e3.d = e2.d
),
corners AS (
  SELECT ta AS vertex FROM tris
  UNION ALL SELECT tb FROM tris
  UNION ALL SELECT tc FROM tris
),
tri_counts AS (SELECT vertex, count(*) AS n_triangles FROM corners GROUP BY vertex),
deg AS (
  SELECT vertex, count(*) AS deg FROM (
    SELECT s AS vertex FROM edges UNION ALL SELECT d FROM edges
  ) GROUP BY vertex
)
SELECT deg.vertex AS brand, deg.deg,
       coalesce(t.n_triangles, 0)::bigint AS n_triangles,
       CASE WHEN deg.deg >= 2
            THEN round(coalesce(t.n_triangles, 0)::double * 2.0
                       / (deg.deg::double * (deg.deg::double - 1.0)), 6)
       END AS clustering_r
FROM deg LEFT JOIN tri_counts t ON deg.vertex = t.vertex
"""


def bitemporal_asof_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal AS-OF point query: orders carry BOTH a valid-time
    interval (when the stated price was economically true) and a
    transaction-time interval (when the row version was in the store) —
    synthesized deterministically from the order date and key (versions:
    a correction recorded 10 days after entry for every 7th order, each
    superseding interval closed by its successor). The query answers
    'what did we BELIEVE on day T_tx the price valid on day T_v was?' —
    the audit/backtest primitive ordinary SCD2 (one time axis) cannot
    express. Both filters are half-open interval predicates; count+sum
    verify the selected version set."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    from hadoop_data_lake_spark.functions.fixedpoint import to_units

    base = orders.select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("valid_from"),
        F.date_add(F.to_date("o_orderdate"), 3650).alias("valid_to"),
        F.to_date("o_orderdate").alias("tx_from"),
        F.when(
            F.col("o_orderkey") % 7 == 0,
            F.date_add(F.to_date("o_orderdate"), 10),
        )
        .otherwise(F.date_add(F.to_date("o_orderdate"), 36500))
        .alias("tx_to"),
        to_units(F.col("o_totalprice")).alias("cents"),
        F.lit(1).alias("version"),
    )
    corrections = orders.where(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("valid_from"),
        F.date_add(F.to_date("o_orderdate"), 3650).alias("valid_to"),
        F.date_add(F.to_date("o_orderdate"), 10).alias("tx_from"),
        F.date_add(F.to_date("o_orderdate"), 36500).alias("tx_to"),
        (to_units(F.col("o_totalprice")) + 500).alias("cents"),
        F.lit(2).alias("version"),
    )
    bitemporal = base.unionByName(corrections)
    t_v = F.lit("1998-06-01").cast("date")
    t_tx = F.lit("1998-06-05").cast("date")
    snap = bitemporal.where(
        (F.col("valid_from") <= t_v)
        & (t_v < F.col("valid_to"))
        & (F.col("tx_from") <= t_tx)
        & (t_tx < F.col("tx_to"))
    )
    return snap.groupBy("version").agg(
        F.count("*").alias("n_rows"), F.sum("cents").alias("sum_cents")
    )


BITEMPORAL_ASOF_ORDERS_SQL = """
WITH base AS (
  SELECT o_orderkey, o_orderdate::date AS valid_from,
         o_orderdate::date + 3650 AS valid_to,
         o_orderdate::date AS tx_from,
         CASE WHEN o_orderkey % 7 = 0 THEN o_orderdate::date + 10
              ELSE o_orderdate::date + 36500 END AS tx_to,
         round(o_totalprice * 100)::bigint AS cents, 1 AS version
  FROM orders
),
corrections AS (
  SELECT o_orderkey, o_orderdate::date, o_orderdate::date + 3650,
         o_orderdate::date + 10, o_orderdate::date + 36500,
         round(o_totalprice * 100)::bigint + 500, 2
  FROM orders WHERE o_orderkey % 7 = 0
),
bt AS (SELECT * FROM base UNION ALL SELECT * FROM corrections)
SELECT version, count(*) AS n_rows, sum(cents)::bigint AS sum_cents
FROM bt
WHERE valid_from <= DATE '1998-06-01' AND DATE '1998-06-01' < valid_to
  AND tx_from <= DATE '1998-06-05' AND DATE '1998-06-05' < tx_to
GROUP BY version
"""


def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the purchase graph: the Pearson correlation
    of endpoint degrees over all (symmetrized) edges — do well-connected
    customers buy from well-connected suppliers, or the reverse
    (bipartite graphs trend disassortative)? Integer-exact through the
    moments (degree products over edges are bigint sums), one closed-form
    rounded correlation — the autocorr/Welch determinism pattern applied
    to graph structure."""
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (-F.col("l_suppkey") - 1).alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    sym = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count("*").alias("deg"))
    pairs = (
        sym.join(deg.withColumnRenamed("src", "s2").withColumnRenamed("deg", "da"),
                 F.col("src") == F.col("s2"))
        .join(deg.withColumnRenamed("src", "s3").withColumnRenamed("deg", "db"),
              F.col("dst") == F.col("s3"))
        .select("da", "db")
    )
    mom = pairs.agg(
        F.count("*").alias("m"),
        F.sum("da").alias("sa"),
        F.sum("db").alias("sb"),
        F.sum(dprod(F.col("da"), F.col("db"))).alias("sab"),
        F.sum(dprod(F.col("da"), F.col("da"))).alias("saa"),
        F.sum(dprod(F.col("db"), F.col("db"))).alias("sbb"),
    )
    num = (
        F.col("m").cast("double") * F.col("sab").cast("double")
        - F.col("sa").cast("double") * F.col("sb").cast("double")
    )
    den2 = (
        F.col("m").cast("double") * F.col("saa").cast("double")
        - F.col("sa").cast("double") * F.col("sa").cast("double")
    ) * (
        F.col("m").cast("double") * F.col("sbb").cast("double")
        - F.col("sb").cast("double") * F.col("sb").cast("double")
    )
    return mom.select(
        F.col("m").alias("n_directed_edges"),
        F.when(den2 > 0, F.round(num / F.sqrt(den2), 6)).alias("assortativity_r"),
    )


DEGREE_ASSORTATIVITY_SQL = """
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS src, -l.l_suppkey - 1 AS dst
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
sym AS MATERIALIZED (
  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
),
deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
pairs AS (
  SELECT a.deg AS da, b.deg AS db
  FROM sym JOIN deg a ON sym.src = a.src JOIN deg b ON sym.dst = b.src
),
mom AS (
  SELECT count(*) AS m, sum(da)::bigint AS sa, sum(db)::bigint AS sb,
         sum(da::hugeint * db::hugeint) AS sab,
         sum(da::hugeint * da::hugeint) AS saa,
         sum(db::hugeint * db::hugeint) AS sbb
  FROM pairs
)
SELECT m AS n_directed_edges,
       CASE WHEN (m::double * saa::double - sa::double * sa::double)
                 * (m::double * sbb::double - sb::double * sb::double) > 0
            THEN round((m::double * sab::double - sa::double * sb::double)
                       / sqrt((m::double * saa::double - sa::double * sa::double)
                              * (m::double * sbb::double - sb::double * sb::double)),
                       6)
       END AS assortativity_r
FROM mom
"""


def gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration, from the exact
    rank formula G = (2 * sum(i * x_i)) / (n * sum(x)) - (n + 1) / n over
    cents sorted ascending (ties broken by customer key, so ranks are
    identical in both engines). Every sum is integer-exact (the rank-
    weighted moment Σi·x via dprod decimal / oracle hugeint — a bigint
    product wraps at 10^8 customers x 10^10-cent revenues); the
    coefficient is one closed-form rounded division. Ranks over the CUSTOMER aggregate
    come from the two-phase distributed prefix sum — the customer
    dimension is 10^8+ at 100 TB, so even the post-aggregate frame never
    gets a global single-task Window.orderBy (VERDICT r4 item 7)."""
    from hadoop_data_lake_spark.functions.fixedpoint import to_units
    from hadoop_data_lake_spark.operators.packing import token_prefix_sum

    orders = read_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(to_units(F.col("o_totalprice"))).alias("cents")
    )
    from hadoop_data_lake_spark.core.io import parquet_row_count
    from hadoop_data_lake_spark.operators.packing import PREFIX_DRIVER_MAX_ROWS

    # o_custkey is a customer FK, so |per_cust| <= |customer| — the footer
    # count is a free sound bound for the prefix driver tier (VERDICT r15
    # item 6: an over-cap customer dimension declines without probing).
    ranked = token_prefix_sum(
        per_cust.withColumn("__one", F.lit(1)),
        ["cents", "o_custkey"],
        "__one",
        n_rows_bound=parquet_row_count(
            sf_dir, "customer", cap=PREFIX_DRIVER_MAX_ROWS
        ),
    ).withColumnRenamed("cum", "i")
    mom = ranked.agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("sx"),
        F.sum(dprod(F.col("i"), F.col("cents"))).alias("six"),
    )
    g = (
        2.0 * F.col("six").cast("double")
        / (F.col("n").cast("double") * F.col("sx").cast("double"))
        - (F.col("n").cast("double") + 1.0) / F.col("n").cast("double")
    )
    return mom.select(
        F.col("n").alias("n_customers"), F.round(g, 6).alias("gini_r")
    )


GINI_CUSTOMER_REVENUE_SQL = """
WITH per_cust AS (
  SELECT o_custkey, sum(round(o_totalprice * 100)::bigint)::bigint AS cents
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT cents, row_number() OVER (ORDER BY cents ASC, o_custkey ASC) AS i
  FROM per_cust
),
mom AS (
  SELECT count(*) AS n, sum(cents)::bigint AS sx,
         sum(i::hugeint * cents::hugeint) AS six
  FROM ranked
)
SELECT n AS n_customers,
       round(2.0 * six::double / (n::double * sx::double)
             - (n::double + 1.0) / n::double, 6) AS gini_r
FROM mom
"""


def hhi_brand_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of brand revenue per region —
    the antitrust-style market-structure metric. Share squaring runs on
    INTEGERS: HHI = sum(cents_i^2) / (sum(cents))^2, so no per-share
    float accumulates; one rounded division per region (x 10^4 for the
    conventional 0-10000 scale)."""
    from hadoop_data_lake_spark.functions.fixedpoint import to_units

    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("n_regionkey", "p_brand")
        .agg(F.sum(to_units(F.col("l_extendedprice"))).alias("cents"))
    )
    # decimal(38,0) headroom: cents^2 can pass 2^63 once regional brand
    # revenue exceeds ~$3B
    sq = (F.col("cents").cast("decimal(38,0)") * F.col("cents").cast("decimal(38,0)"))
    hhi = rev.groupBy("n_regionkey").agg(
        F.count("*").alias("n_brands"),
        F.sum(sq).alias("ssq"),
        F.sum("cents").alias("s"),
    )
    return hhi.select(
        F.col("n_regionkey").alias("region"),
        "n_brands",
        F.round(
            F.col("ssq").cast("double")
            / (F.col("s").cast("double") * F.col("s").cast("double"))
            * 10000.0,
            6,
        ).alias("hhi_r"),
    )


HHI_BRAND_CONCENTRATION_SQL = """
WITH rev AS (
  SELECT n.n_regionkey, p.p_brand,
         sum(round(l.l_extendedprice * 100)::bigint)::bigint AS cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY n.n_regionkey, p.p_brand
)
SELECT n_regionkey AS region, count(*) AS n_brands,
       round(sum(cents::hugeint * cents::hugeint)::double
             / (sum(cents)::double * sum(cents)::double) * 10000.0, 6) AS hhi_r
FROM rev GROUP BY n_regionkey
"""


def pareto_8020_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 80/20 readout: revenue share captured by the top-k% customers
    (k = 1, 5, 10, 20), from one descending-rank pass over the customer
    aggregate. Cut points are integer rank thresholds (ceil(k*n/100));
    cumulative cents are bigint sums; shares round once. Rank and
    cumulative cents share ONE two-phase distributed prefix pass
    (descending = ascending on negated cents) — the customer dimension is
    10^8+ at 100 TB, so the post-aggregate frame never gets a global
    single-task Window.orderBy (VERDICT r4 item 7)."""
    from hadoop_data_lake_spark.functions.fixedpoint import to_units
    from hadoop_data_lake_spark.operators.packing import prefix_agg

    orders = read_table(spark, sf_dir, "orders")
    # checkpoint the per-customer aggregate and take all four cut points
    # in ONE pass (explode k, keep rows whose rank hits a cutoff) — the
    # old per-k filter branches re-executed the orders scan (4 scans;
    # now 1; r9 scan-multiplicity audit)
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(F.sum(to_units(F.col("o_totalprice"))).alias("cents"))
        .localCheckpoint(eager=True)
    )
    from hadoop_data_lake_spark.core.io import parquet_row_count
    from hadoop_data_lake_spark.operators.packing import PREFIX_DRIVER_MAX_ROWS

    ranked = prefix_agg(
        per_cust.withColumn("__one", F.lit(1)).withColumn(
            "__neg", -F.col("cents")
        ),
        ["__neg", "o_custkey"],
        sum_cols={"i": "__one", "cum": "cents"},
        # |per_cust| <= |customer| (FK) — footer bound, see gini (r16)
        n_rows_bound=parquet_row_count(
            sf_dir, "customer", cap=PREFIX_DRIVER_MAX_ROWS
        ),
    ).crossJoin(
        F.broadcast(
            per_cust.agg(
                F.count("*").alias("n"), F.sum("cents").alias("total")
            )
        )
    )
    return (
        ranked.select(
            "i",
            "n",
            "cum",
            "total",
            F.explode(F.array(*[F.lit(k) for k in (1, 5, 10, 20)])).alias("k"),
        )
        .where(F.col("i") == F.ceil(F.col("k") / 100.0 * F.col("n")))
        .select(
            F.col("k").alias("top_pct"),
            F.col("i").alias("n_top_customers"),
            F.round(F.col("cum").cast("double") / F.col("total").cast("double"), 6).alias(
                "revenue_share_r"
            ),
        )
    )


PARETO_8020_CUSTOMERS_SQL = """
WITH per_cust AS (
  SELECT o_custkey, sum(round(o_totalprice * 100)::bigint)::bigint AS cents
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents DESC, o_custkey ASC) AS i,
         sum(cents) OVER (ORDER BY cents DESC, o_custkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::bigint AS cum
  FROM per_cust
),
tot AS (SELECT count(*) AS n, sum(cents)::bigint AS total FROM per_cust)
SELECT k.top_pct, r.i AS n_top_customers,
       round(r.cum::double / tot.total::double, 6) AS revenue_share_r
FROM (VALUES (1), (5), (10), (20)) k(top_pct)
JOIN tot ON TRUE
JOIN ranked r ON r.i = ceil(k.top_pct / 100.0 * tot.n)
"""


def brand_cf_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering over brand baskets: cosine on
    BINARY basket vectors is n_ab / sqrt(n_a * n_b) — computable exactly
    from three integer co-occurrence counts, no embedding needed (the
    classic Amazon-style item-item recommender). Top-3 most similar
    brands per brand, ties by partner brand name. One basket self-join
    keyed on the order (never a brand-catalog cross) + a per-brand
    top-k window."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    from pyspark.sql import Window

    ob = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", "p_brand")
        .distinct()
        .localCheckpoint(eager=True)
    )
    support = ob.groupBy("p_brand").agg(F.count("*").alias("n"))
    a = ob.select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
    b = ob.select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("other"))
    pairs = (
        a.join(b, "ok")
        .where(F.col("brand") != F.col("other"))
        .groupBy("brand", "other")
        .agg(F.count("*").alias("n_ab"))
    )
    scored = (
        pairs.join(
            support.select(F.col("p_brand").alias("brand"), F.col("n").alias("n_a")),
            "brand",
        )
        .join(
            support.select(F.col("p_brand").alias("other"), F.col("n").alias("n_b")),
            "other",
        )
        .withColumn(
            "sim_r",
            F.round(
                F.col("n_ab").cast("double")
                / F.sqrt(F.col("n_a").cast("double") * F.col("n_b").cast("double")),
                6,
            ),
        )
    )
    w = Window.partitionBy("brand").orderBy(
        F.col("sim_r").desc(), F.col("other").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("brand", "rnk", F.col("other").alias("similar_brand"), "n_ab", "sim_r")
    )


BRAND_CF_SIMILARITY_SQL = """
WITH ob AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
support AS (SELECT p_brand, count(*) AS n FROM ob GROUP BY p_brand),
pairs AS (
  SELECT a.p_brand AS brand, b.p_brand AS other, count(*) AS n_ab
  FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.p_brand <> b.p_brand
  GROUP BY a.p_brand, b.p_brand
),
scored AS (
  SELECT p.brand, p.other, p.n_ab,
         round(p.n_ab::double / sqrt(sa.n::double * sb.n::double), 6) AS sim_r
  FROM pairs p
  JOIN support sa ON sa.p_brand = p.brand
  JOIN support sb ON sb.p_brand = p.other
)
SELECT brand, rnk, other AS similar_brand, n_ab, sim_r FROM (
  SELECT *, row_number() OVER (
    PARTITION BY brand ORDER BY sim_r DESC, other ASC) AS rnk
  FROM scored
) WHERE rnk <= 3
"""


def abc_part_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue; class A
    covers the first 80% of cumulative revenue, B to 95%, C the tail —
    the ops-planning workhorse. The cumulative share threshold compares
    INTEGER cumulative cents against integer thresholds (cum * 100 <=
    total * 80), so classification never touches a float boundary.
    Output: per class, part count and revenue share. Cumulative cents
    come from the two-phase distributed prefix sum (descending =
    ascending on negated cents) — the part dimension is 10^8+ at 100 TB,
    so the post-aggregate frame never gets a global single-task
    Window.orderBy (VERDICT r4 item 7)."""
    from hadoop_data_lake_spark.functions.fixedpoint import to_units
    from hadoop_data_lake_spark.operators.packing import prefix_agg

    li = read_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(to_units(F.col("l_extendedprice"))).alias("cents")
    )
    from hadoop_data_lake_spark.core.io import parquet_row_count
    from hadoop_data_lake_spark.operators.packing import PREFIX_DRIVER_MAX_ROWS

    ranked = prefix_agg(
        per_part.withColumn("__neg", -F.col("cents")),
        ["__neg", "l_partkey"],
        sum_cols={"cum": "cents"},
        # |per_part| <= |part| (FK) — footer bound, see gini (r16)
        n_rows_bound=parquet_row_count(
            sf_dir, "part", cap=PREFIX_DRIVER_MAX_ROWS
        ),
    ).crossJoin(F.broadcast(per_part.agg(F.sum("cents").alias("total"))))
    classed = ranked.withColumn(
        "abc",
        F.when(F.col("cum") * 100 <= F.col("total") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
        .otherwise("C"),
    )
    return classed.groupBy("abc").agg(
        F.count("*").alias("n_parts"),
        F.round(
            F.sum("cents").cast("double") / F.max("total").cast("double"), 6
        ).alias("revenue_share_r"),
    )


ABC_PART_CLASSIFICATION_SQL = """
WITH per_part AS (
  SELECT l_partkey, sum(round(l_extendedprice * 100)::bigint)::bigint AS cents
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT sum(cents)::bigint AS total FROM per_part),
ranked AS (
  SELECT cents,
         sum(cents) OVER (ORDER BY cents DESC, l_partkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::bigint AS cum
  FROM per_part
),
classed AS (
  SELECT cents,
         CASE WHEN cum * 100 <= tot.total * 80 THEN 'A'
              WHEN cum * 100 <= tot.total * 95 THEN 'B'
              ELSE 'C' END AS abc,
         tot.total
  FROM ranked, tot
)
SELECT abc, count(*) AS n_parts,
       round(sum(cents)::double / max(total)::double, 6) AS revenue_share_r
FROM classed GROUP BY abc
"""


def duplicate_invoice_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraud/ops screen: order pairs from the SAME customer within 3 days
    whose totals agree within 5% — the duplicate-billing candidate set
    (retried submissions, split-entry errors; exact-amount collisions are
    vanishingly rare on real spreads, so the tolerance is RELATIVE and
    the comparison integer: |ca - cb| * 20 <= min(ca, cb)). The self-join
    keys on the customer — per-customer order counts bound the quadratic
    term — with date and tolerance predicates pruning inside the group.
    Canonical (key_a < key_b) pairs, integer throughout."""
    from hadoop_data_lake_spark.functions.fixedpoint import to_units

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        to_units(F.col("o_totalprice")).alias("cents"),
    )
    a = orders.select(
        F.col("o_custkey").alias("cust"),
        F.col("cents").alias("ca"),
        F.col("o_orderkey").alias("key_a"),
        F.col("d").alias("da"),
    )
    b = orders.select(
        F.col("o_custkey").alias("cust"),
        F.col("cents").alias("cb"),
        F.col("o_orderkey").alias("key_b"),
        F.col("d").alias("db"),
    )
    return (
        a.join(b, "cust")
        .where(
            (F.col("key_a") < F.col("key_b"))
            & (F.abs(F.datediff("da", "db")) <= 3)
            & (
                F.abs(F.col("ca") - F.col("cb")) * 20
                <= F.least(F.col("ca"), F.col("cb"))
            )
        )
        .select(
            "cust",
            "key_a",
            "key_b",
            "ca",
            "cb",
            F.abs(F.datediff("da", "db")).alias("gap_days"),
        )
    )


DUPLICATE_INVOICE_SCREEN_SQL = """
SELECT a.o_custkey AS cust, a.o_orderkey AS key_a, b.o_orderkey AS key_b,
       round(a.o_totalprice * 100)::bigint AS ca,
       round(b.o_totalprice * 100)::bigint AS cb,
       abs(datediff('day', b.o_orderdate::date, a.o_orderdate::date)) AS gap_days
FROM orders a JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND a.o_orderkey < b.o_orderkey
 AND abs(datediff('day', b.o_orderdate::date, a.o_orderdate::date)) <= 3
 AND abs(round(a.o_totalprice * 100)::bigint - round(b.o_totalprice * 100)::bigint) * 20
     <= least(round(a.o_totalprice * 100)::bigint, round(b.o_totalprice * 100)::bigint)
"""


def user_cf_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item CF recommendations end to end: for every 50th customer,
    score each brand NOT in their basket by the sum of its binary-cosine
    similarities to the brands they did buy (the standard item-item
    scorer), and emit the top-3. Similarity comes from the same integer
    co-occurrence identity as brand_cf_similarity; the per-(customer,
    candidate) score is an ordered fold over basket brands so the float
    sum replays; candidate generation joins the sampled customers'
    baskets to the 25-brand similarity table (broadcast) — the corpus
    never self-joins at the user level."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    from pyspark.sql import Window

    cb = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("o_custkey", "p_brand")
        .distinct()
        .localCheckpoint(eager=True)
    )
    ob = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", "p_brand")
        .distinct()
        .localCheckpoint(eager=True)
    )
    support = ob.groupBy("p_brand").agg(F.count("*").alias("n"))
    a = ob.select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
    b = ob.select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("other"))
    sims = (
        a.join(b, "ok")
        .where(F.col("brand") != F.col("other"))
        .groupBy("brand", "other")
        .agg(F.count("*").alias("n_ab"))
        .join(
            support.select(F.col("p_brand").alias("brand"), F.col("n").alias("n_a")),
            "brand",
        )
        .join(
            support.select(F.col("p_brand").alias("other"), F.col("n").alias("n_b")),
            "other",
        )
        .select(
            "brand",
            "other",
            (
                F.col("n_ab").cast("double")
                / F.sqrt(F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("sim"),
        )
        .localCheckpoint(eager=True)
    )
    sampled = cb.where(F.col("o_custkey") % 50 == 0)
    cand = (
        sampled.join(F.broadcast(sims), sampled["p_brand"] == sims["brand"])
        .join(
            cb.select(
                F.col("o_custkey").alias("c2"), F.col("p_brand").alias("owned")
            ),
            (F.col("o_custkey") == F.col("c2")) & (F.col("other") == F.col("owned")),
            "left_anti",
        )
    )
    scored = cand.groupBy("o_custkey", "other").agg(
        F.round(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("brand"), F.col("sim")))),
                    lambda s: s["sim"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("score_r"),
        F.count("*").alias("n_evidence"),
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("score_r").desc(), F.col("other").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            F.col("o_custkey").alias("custkey"),
            "rnk",
            F.col("other").alias("recommended_brand"),
            "n_evidence",
            "score_r",
        )
    )


USER_CF_RECOMMENDATIONS_SQL = """
WITH cb AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey, p.p_brand
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
),
ob AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
support AS (SELECT p_brand, count(*) AS n FROM ob GROUP BY p_brand),
sims AS MATERIALIZED (
  SELECT x.brand, x.other,
         x.n_ab::double / sqrt(sa.n::double * sb.n::double) AS sim
  FROM (
    SELECT a.p_brand AS brand, b.p_brand AS other, count(*) AS n_ab
    FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.p_brand <> b.p_brand
    GROUP BY a.p_brand, b.p_brand
  ) x
  JOIN support sa ON sa.p_brand = x.brand
  JOIN support sb ON sb.p_brand = x.other
),
cand AS (
  SELECT s.o_custkey, si.brand, si.other, si.sim
  FROM (SELECT * FROM cb WHERE o_custkey % 50 = 0) s
  JOIN sims si ON s.p_brand = si.brand
  WHERE NOT EXISTS (
    SELECT 1 FROM cb o WHERE o.o_custkey = s.o_custkey AND o.p_brand = si.other
  )
),
scored AS (
  SELECT o_custkey, other,
         round(list_reduce(list_prepend(0.0::double, list(sim ORDER BY brand)),
                           (acc, x) -> acc + x), 6) AS score_r,
         count(*) AS n_evidence
  FROM cand GROUP BY o_custkey, other
)
SELECT custkey, rnk, recommended_brand, n_evidence, score_r FROM (
  SELECT o_custkey AS custkey, other AS recommended_brand, n_evidence, score_r,
         row_number() OVER (
           PARTITION BY o_custkey ORDER BY score_r DESC, other ASC) AS rnk
  FROM scored
) WHERE rnk <= 3
"""


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the customer table under the quasi-identifier
    (nation, market segment, account-balance band of 1000): group sizes
    below k = 5 are re-identification risks a release must generalize or
    suppress. Pure integer bucketing + one aggregation; the report rolls
    the violating groups up to per-nation counts (publishing the
    violating quasi-identifiers verbatim would itself leak — the audit
    output is privacy-safe by construction)."""
    cust = read_table(spark, sf_dir, "customer")
    qi = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.expr("cast(floor(c_acctbal / 1000) as bigint)").alias("bal_band"),
    )
    groups = qi.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count("*").alias("k")
    )
    return (
        groups.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_groups"),
            F.sum((F.col("k") < 5).cast("long")).alias("n_violating"),
            F.sum(F.when(F.col("k") < 5, F.col("k")).otherwise(0)).alias(
                "n_risky_rows"
            ),
            F.min("k").alias("min_k"),
        )
    )


K_ANONYMITY_AUDIT_SQL = """
WITH qi AS (
  SELECT c_nationkey, c_mktsegment,
         floor(c_acctbal / 1000)::bigint AS bal_band
  FROM customer
),
groups AS (
  SELECT c_nationkey, c_mktsegment, bal_band, count(*) AS k
  FROM qi GROUP BY c_nationkey, c_mktsegment, bal_band
)
SELECT c_nationkey, count(*) AS n_groups,
       sum(CASE WHEN k < 5 THEN 1 ELSE 0 END)::bigint AS n_violating,
       sum(CASE WHEN k < 5 THEN k ELSE 0 END)::bigint AS n_risky_rows,
       min(k) AS min_k
FROM groups GROUP BY c_nationkey
"""


def shipping_latency_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfilment SLA report: order-to-ship latency (days) percentiles per
    order month — p50/p90/p99 as ORDER STATISTICS (value at rank
    ceil(p*n), integer days, no interpolation) plus the share of lines
    breaching a 60-day SLA. One join to attach order dates, one rank
    window per month partition; every output an integer or one rounded
    ratio."""
    from pyspark.sql import Window

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.to_date("l_shipdate").alias("ship")
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("odate")
    )
    lat = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        F.date_format("odate", "yyyy-MM").alias("month"),
        F.datediff("ship", "odate").alias("days"),
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.partitionBy("month").orderBy(
        F.col("days").asc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()
    )
    ranked = lat.withColumn("rk", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy("month"))
    )
    return ranked.groupBy("month").agg(
        F.max("n").alias("n_lines"),
        *[
            F.min(
                F.when(F.col("rk") == F.ceil(F.lit(p) * F.col("n")), F.col("days"))
            ).alias(f"p{int(p*100)}_days")
            for p in (0.5, 0.9, 0.99)
        ],
        F.round(
            F.sum((F.col("days") > 60).cast("long")).cast("double")
            / F.max("n").cast("double"),
            6,
        ).alias("sla_breach_share_r"),
    )


SHIPPING_LATENCY_SLA_SQL = """
WITH lat AS (
  SELECT strftime(o.o_orderdate::date, '%Y-%m') AS month,
         datediff('day', o.o_orderdate::date, l.l_shipdate::date) AS days,
         l.l_orderkey, l.l_linenumber
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
ranked AS (
  SELECT month, days,
         row_number() OVER (
           PARTITION BY month ORDER BY days ASC, l_orderkey ASC, l_linenumber ASC) AS rk,
         count(*) OVER (PARTITION BY month) AS n
  FROM lat
)
SELECT month, max(n) AS n_lines,
       min(CASE WHEN rk = ceil(0.5 * n) THEN days END) AS p50_days,
       min(CASE WHEN rk = ceil(0.9 * n) THEN days END) AS p90_days,
       min(CASE WHEN rk = ceil(0.99 * n) THEN days END) AS p99_days,
       round(sum(CASE WHEN days > 60 THEN 1 ELSE 0 END)::double / max(n)::double, 6)
         AS sla_breach_share_r
FROM ranked GROUP BY month
"""


def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table foreign-key audit: orphan counts and coverage rates for
    every FK edge in the schema (lineitem->orders, lineitem->part,
    lineitem->supplier, orders->customer, customer->nation,
    nation->region) — the data-contract check that runs before anything
    downstream trusts a load. Each edge is one anti-join count plus a
    denominator; output one row per edge with the orphan count and the
    rounded coverage share."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    part = read_table(spark, sf_dir, "part")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")

    from decimal import ROUND_HALF_UP, Decimal

    def edge(name, child, fk, parent, pk):
        total = child.select(fk).count()
        orphans = (
            child.select(F.col(fk).alias("k"))
            .join(parent.select(F.col(pk).alias("k")), "k", "left_anti")
            .count()
        )
        if not total:
            return (name, total, orphans, None)
        # HALF_UP, not Python's banker's round — must match SQL round()
        cov = float(
            Decimal(repr(1.0 - orphans / total)).quantize(
                Decimal("0.000001"), ROUND_HALF_UP
            )
        )
        return (name, total, orphans, cov)

    rows = [
        edge("lineitem->orders", li, "l_orderkey", orders, "o_orderkey"),
        edge("lineitem->part", li, "l_partkey", part, "p_partkey"),
        edge("lineitem->supplier", li, "l_suppkey", supp, "s_suppkey"),
        edge("orders->customer", orders, "o_custkey", cust, "c_custkey"),
        edge("customer->nation", cust, "c_nationkey", nation, "n_nationkey"),
        edge("nation->region", nation, "n_regionkey", region, "r_regionkey"),
    ]
    return local_frame(
        spark, rows, "fk_edge string, n_child long, n_orphans long, coverage_r double"
    )


REFERENTIAL_INTEGRITY_AUDIT_SQL = """
SELECT 'lineitem->orders' AS fk_edge, (SELECT count(*) FROM lineitem) AS n_child,
       (SELECT count(*) FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey) AS n_orphans,
       round(1.0 - (SELECT count(*) FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey)::double
                   / (SELECT count(*) FROM lineitem)::double, 6) AS coverage_r
UNION ALL
SELECT 'lineitem->part', (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem l ANTI JOIN part p ON l.l_partkey = p.p_partkey),
       round(1.0 - (SELECT count(*) FROM lineitem l ANTI JOIN part p ON l.l_partkey = p.p_partkey)::double
                   / (SELECT count(*) FROM lineitem)::double, 6)
UNION ALL
SELECT 'lineitem->supplier', (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem l ANTI JOIN supplier s ON l.l_suppkey = s.s_suppkey),
       round(1.0 - (SELECT count(*) FROM lineitem l ANTI JOIN supplier s ON l.l_suppkey = s.s_suppkey)::double
                   / (SELECT count(*) FROM lineitem)::double, 6)
UNION ALL
SELECT 'orders->customer', (SELECT count(*) FROM orders),
       (SELECT count(*) FROM orders o ANTI JOIN customer c ON o.o_custkey = c.c_custkey),
       round(1.0 - (SELECT count(*) FROM orders o ANTI JOIN customer c ON o.o_custkey = c.c_custkey)::double
                   / (SELECT count(*) FROM orders)::double, 6)
UNION ALL
SELECT 'customer->nation', (SELECT count(*) FROM customer),
       (SELECT count(*) FROM customer c ANTI JOIN nation n ON c.c_nationkey = n.n_nationkey),
       round(1.0 - (SELECT count(*) FROM customer c ANTI JOIN nation n ON c.c_nationkey = n.n_nationkey)::double
                   / (SELECT count(*) FROM customer)::double, 6)
UNION ALL
SELECT 'nation->region', (SELECT count(*) FROM nation),
       (SELECT count(*) FROM nation n ANTI JOIN region r ON n.n_regionkey = r.r_regionkey),
       round(1.0 - (SELECT count(*) FROM nation n ANTI JOIN region r ON n.n_regionkey = r.r_regionkey)::double
                   / (SELECT count(*) FROM nation)::double, 6)
"""


def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite supplier scorecard: weighted blend of return rate
    (quality, weight 0.6, lower better) and revenue share normalized to
    the top supplier (volume, weight 0.4) — the standard vendor-review
    artifact. Rates are ratios of integer line counts / cents; the
    composite is one rounded expression; ranking ties on the supplier
    key. Top 10 — selected by orderBy().limit(10), which Spark plans as
    TakeOrderedAndProject (per-partition top-10 + a 10-row driver merge,
    never a global sort of the supplier dimension); the rank column is a
    window over the already-bounded 10-row frame (VERDICT r4 item 7)."""
    from hadoop_data_lake_spark.functions.fixedpoint import to_units
    from pyspark.sql import Window

    li = read_table(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_suppkey").agg(
        F.count("*").alias("n_lines"),
        F.sum((F.col("l_returnflag") == "R").cast("long")).alias("n_returned"),
        F.sum(to_units(F.col("l_extendedprice"))).alias("cents"),
    )
    top_rev = per_supp.agg(F.max("cents").alias("max_cents"))
    scored = per_supp.crossJoin(F.broadcast(top_rev)).withColumn(
        "return_rate_r",
        F.round(
            F.col("n_returned").cast("double") / F.col("n_lines").cast("double"), 6
        ),
    ).withColumn(
        "score_r",
        F.round(
            0.6
            * (
                1.0
                - F.col("n_returned").cast("double") / F.col("n_lines").cast("double")
            )
            + 0.4 * F.col("cents").cast("double") / F.col("max_cents").cast("double"),
            6,
        ),
    )
    top10 = scored.orderBy(
        F.col("score_r").desc(), F.col("l_suppkey").asc()
    ).limit(10)
    w = Window.orderBy(F.col("score_r").desc(), F.col("l_suppkey").asc())
    return top10.withColumn("rnk", F.row_number().over(w)).select(
        "rnk",
        F.col("l_suppkey").alias("suppkey"),
        "n_lines",
        "return_rate_r",
        "score_r",
    )


SUPPLIER_SCORECARD_SQL = """
WITH per_supp AS (
  SELECT l_suppkey, count(*) AS n_lines,
         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::bigint AS n_returned,
         sum(round(l_extendedprice * 100)::bigint)::bigint AS cents
  FROM lineitem GROUP BY l_suppkey
),
tot AS (SELECT max(cents)::bigint AS max_cents FROM per_supp),
scored AS (
  SELECT l_suppkey, n_lines,
         round(n_returned::double / n_lines::double, 6) AS return_rate_r,
         round(0.6 * (1.0 - n_returned::double / n_lines::double)
               + 0.4 * cents::double / tot.max_cents::double, 6) AS score_r
  FROM per_supp, tot
)
SELECT rnk, suppkey, n_lines, return_rate_r, score_r FROM (
  SELECT l_suppkey AS suppkey, n_lines, return_rate_r, score_r,
         row_number() OVER (ORDER BY score_r DESC, l_suppkey ASC) AS rnk
  FROM scored
) WHERE rnk <= 10
"""


def discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demand elasticity from the discount ladder: mean quantity per
    discrete discount level, then OLS of log(mean_qty) on
    log(1 - discount) over the ~11 ladder points — the retail
    econometrics readout (elasticity = the slope; negative means deeper
    discounts move volume). Level means are exact integer ratios
    (quantity scaled x100); the tiny log-log regression folds its float
    moments in discount order, so the fitted elasticity replays."""
    li = read_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_pct"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("qty_c"),
    )
    levels = li.groupBy("disc_pct").agg(
        F.count("*").alias("n"), F.sum("qty_c").alias("sq")
    ).where(F.col("disc_pct") < 100)
    pairs = levels.select(
        "disc_pct",
        "n",
        F.log(F.lit(1.0) - F.col("disc_pct").cast("double") / 100.0).alias("lx"),
        F.log(
            F.col("sq").cast("double") / (F.col("n").cast("double") * 100.0)
        ).alias("ly"),
    )

    def fold(col: str) -> "F.Column":
        return F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("disc_pct", F.col(col).alias("v")))
                ),
                lambda s: s["v"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    mom = pairs.select(
        "disc_pct", "lx", "ly",
        (F.col("lx") * F.col("ly")).alias("lxy"),
        (F.col("lx") * F.col("lx")).alias("lxx"),
    ).agg(
        F.count("*").alias("k"),
        fold("lx").alias("sx"),
        fold("ly").alias("sy"),
        fold("lxy").alias("sxy"),
        fold("lxx").alias("sxx"),
    )
    k = F.col("k").cast("double")
    # nullif: a single-point discount ladder (every line at one discount)
    # has no price variation to regress on — elasticity is NULL, not an
    # ANSI divide-by-zero (r8 degenerate sweep)
    slope = (k * F.col("sxy") - F.col("sx") * F.col("sy")) / F.nullif(
        k * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)
    )
    return mom.select(
        F.col("k").alias("n_levels"),
        F.round(slope, 6).alias("elasticity_r"),
    )


DISCOUNT_ELASTICITY_SQL = """
WITH li AS (
  SELECT round(l_discount * 100)::bigint AS disc_pct,
         round(l_quantity * 100)::bigint AS qty_c
  FROM lineitem
),
levels AS (
  SELECT disc_pct, count(*) AS n, sum(qty_c)::bigint AS sq
  FROM li WHERE disc_pct < 100 GROUP BY disc_pct
),
pairs AS (
  SELECT disc_pct,
         ln(1.0 - disc_pct::double / 100.0) AS lx,
         ln(sq::double / (n::double * 100.0)) AS ly
  FROM levels
),
mom AS (
  SELECT count(*) AS k,
         list_reduce(list_prepend(0.0::double, list(lx ORDER BY disc_pct)), (a, x) -> a + x) AS sx,
         list_reduce(list_prepend(0.0::double, list(ly ORDER BY disc_pct)), (a, x) -> a + x) AS sy,
         list_reduce(list_prepend(0.0::double, list(lx * ly ORDER BY disc_pct)), (a, x) -> a + x) AS sxy,
         list_reduce(list_prepend(0.0::double, list(lx * lx ORDER BY disc_pct)), (a, x) -> a + x) AS sxx
  FROM pairs
)
SELECT k AS n_levels,
       round((k::double * sxy - sx * sy) / nullif(k::double * sxx - sx * sx, 0.0), 6)
         AS elasticity_r
FROM mom
"""


def order_cycle_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cycle time per market segment: days between a
    customer's consecutive orders (one lag window), percentiles as
    integer-day order statistics — the reorder-cadence input to
    replenishment and CRM timing. Ties in the rank sort break on
    (customer, order key) so both engines rank identically."""
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("d")
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    gaps = (
        orders.withColumn("prev_d", F.lag("d").over(w))
        .where(F.col("prev_d").isNotNull())
        .select(
            "o_custkey",
            "o_orderkey",
            F.datediff("d", "prev_d").alias("gap_days"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    )
    wr = Window.partitionBy("c_mktsegment").orderBy(
        F.col("gap_days").asc(), F.col("o_custkey").asc(), F.col("o_orderkey").asc()
    )
    ranked = gaps.withColumn("rk", F.row_number().over(wr)).withColumn(
        "n", F.count("*").over(Window.partitionBy("c_mktsegment"))
    )
    return ranked.groupBy("c_mktsegment").agg(
        F.max("n").alias("n_gaps"),
        *[
            F.min(
                F.when(F.col("rk") == F.ceil(F.lit(p) * F.col("n")), F.col("gap_days"))
            ).alias(f"p{int(p*100)}_days")
            for p in (0.25, 0.5, 0.75)
        ],
    )


ORDER_CYCLE_PERCENTILES_SQL = """
WITH gaps AS (
  SELECT o.o_custkey, o.o_orderkey,
         datediff('day',
                  lag(o.o_orderdate::date) OVER (
                    PARTITION BY o.o_custkey
                    ORDER BY o.o_orderdate::date, o.o_orderkey),
                  o.o_orderdate::date) AS gap_days
  FROM orders o
),
seg AS (
  SELECT g.gap_days, g.o_custkey, g.o_orderkey, c.c_mktsegment
  FROM gaps g JOIN customer c ON g.o_custkey = c.c_custkey
  WHERE g.gap_days IS NOT NULL
),
ranked AS (
  SELECT c_mktsegment, gap_days,
         row_number() OVER (
           PARTITION BY c_mktsegment
           ORDER BY gap_days ASC, o_custkey ASC, o_orderkey ASC) AS rk,
         count(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM seg
)
SELECT c_mktsegment, max(n) AS n_gaps,
       min(CASE WHEN rk = ceil(0.25 * n) THEN gap_days END) AS p25_days,
       min(CASE WHEN rk = ceil(0.5 * n) THEN gap_days END) AS p50_days,
       min(CASE WHEN rk = ceil(0.75 * n) THEN gap_days END) AS p75_days
FROM ranked GROUP BY c_mktsegment
"""


def price_dispersion_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price dispersion per brand: the coefficient of variation of line
    extended prices from exact integer moments — high CV flags
    inconsistent pricing (or a heterogeneous catalog) per brand. One
    aggregation; mean/variance/CV as single rounded expressions."""
    from hadoop_data_lake_spark.functions.fixedpoint import to_units

    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    mom = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_brand", to_units(F.col("l_extendedprice")).alias("c"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            F.sum("c").alias("s"),
            F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("ss"),
        )
    )
    n = F.col("n").cast("double")
    mean = F.col("s").cast("double") / n
    # nullif: a single-line brand has no sample variance — CV is NULL,
    # not an ANSI divide-by-zero (r8 degenerate sweep)
    var = (F.col("ss").cast("double") - F.col("s").cast("double") * mean) / F.nullif(
        n - F.lit(1.0), F.lit(0.0)
    )
    return mom.select(
        "p_brand",
        "n",
        F.round(mean / 100.0, 4).alias("mean_price_r"),
        F.round(F.sqrt(var) / mean, 6).alias("cv_r"),
    )


PRICE_DISPERSION_BY_BRAND_SQL = """
WITH mom AS (
  SELECT p.p_brand, count(*) AS n,
         sum(round(l.l_extendedprice * 100)::bigint)::bigint AS s,
         sum(round(l.l_extendedprice * 100)::bigint::hugeint
             * round(l.l_extendedprice * 100)::bigint)::double AS ss
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand
)
SELECT p_brand, n,
       round((s::double / n::double) / 100.0, 4) AS mean_price_r,
       round(sqrt((ss - s::double * (s::double / n::double))
                  / nullif(n::double - 1.0, 0.0))
             / (s::double / n::double), 6) AS cv_r
FROM mom
"""


def lorenz_curve_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer revenue at population deciles: cumulative
    revenue share held by the bottom d*10% of customers — the curve the
    Gini coefficient integrates, published as 10 exact points
    (integer-rank cut offs, integer cumulative cents, one rounded share
    each). Rank and cumulative cents share ONE two-phase distributed
    prefix pass (operators/packing.prefix_agg) — the customer dimension
    is 10^8+ at 100 TB, so the post-aggregate frame never gets a global
    single-task Window.orderBy (VERDICT r4 item 7)."""
    from hadoop_data_lake_spark.functions.fixedpoint import to_units
    from hadoop_data_lake_spark.operators.packing import prefix_agg

    orders = read_table(spark, sf_dir, "orders")
    # checkpoint the per-customer aggregate (r9 scan-multiplicity audit):
    # the prefix pass, the totals and the old 10 per-decile branches each
    # re-executed the orders scan — 10 scans per run; the decile pick is
    # now ONE pass (explode d=1..10, keep rows whose rank hits a cutoff)
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(F.sum(to_units(F.col("o_totalprice"))).alias("cents"))
        .localCheckpoint(eager=True)
    )
    from hadoop_data_lake_spark.core.io import parquet_row_count
    from hadoop_data_lake_spark.operators.packing import PREFIX_DRIVER_MAX_ROWS

    ranked = prefix_agg(
        per_cust.withColumn("__one", F.lit(1)),
        ["cents", "o_custkey"],
        sum_cols={"i": "__one", "cum": "cents"},
        # |per_cust| <= |customer| (FK) — footer bound, see gini (r16)
        n_rows_bound=parquet_row_count(
            sf_dir, "customer", cap=PREFIX_DRIVER_MAX_ROWS
        ),
    ).crossJoin(
        F.broadcast(
            per_cust.agg(F.count("*").alias("n"), F.sum("cents").alias("total"))
        )
    )
    return (
        ranked.select(
            "i",
            "n",
            "cum",
            "total",
            F.explode(F.sequence(F.lit(1), F.lit(10))).alias("d"),
        )
        .where(F.col("i") == F.ceil(F.col("d") / 10.0 * F.col("n")))
        .select(
            (F.col("d") * 10).cast("int").alias("pop_pct"),
            F.round(
                F.col("cum").cast("double") / F.col("total").cast("double"), 6
            ).alias("rev_share_r"),
        )
    )


LORENZ_CURVE_POINTS_SQL = """
WITH per_cust AS (
  SELECT o_custkey, sum(round(o_totalprice * 100)::bigint)::bigint AS cents
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents ASC, o_custkey ASC) AS i,
         sum(cents) OVER (ORDER BY cents ASC, o_custkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::bigint AS cum
  FROM per_cust
),
tot AS (SELECT count(*) AS n, sum(cents)::bigint AS total FROM per_cust)
SELECT d.pop_pct, round(r.cum::double / tot.total::double, 6) AS rev_share_r
FROM (VALUES (10),(20),(30),(40),(50),(60),(70),(80),(90),(100)) d(pop_pct)
JOIN tot ON TRUE
JOIN ranked r ON r.i = ceil(d.pop_pct / 100.0 * tot.n)
"""


def order_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog aging: orders still open ('O') bucketed by age
    at the data horizon (30/90/365-day bands), with counts and integer-
    cent value per band — the operations report behind working-capital
    and fulfilment-escalation reviews. Ages are integer day diffs
    against the max order date; bands are CASE cuts."""
    from hadoop_data_lake_spark.functions.fixedpoint import to_units

    orders = read_table(spark, sf_dir, "orders")
    horizon = orders.agg(F.max(F.to_date("o_orderdate")).alias("h"))
    aged = (
        orders.where(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(horizon))
        .withColumn("age", F.datediff("h", F.to_date("o_orderdate")))
        .withColumn(
            "band",
            F.when(F.col("age") <= 30, "0-30d")
            .when(F.col("age") <= 90, "31-90d")
            .when(F.col("age") <= 365, "91-365d")
            .otherwise(">365d"),
        )
    )
    return aged.groupBy("band").agg(
        F.count("*").alias("n_orders"),
        F.sum(to_units(F.col("o_totalprice"))).alias("value_cents"),
        F.min("age").alias("min_age"),
        F.max("age").alias("max_age"),
    )


ORDER_BACKLOG_AGING_SQL = """
WITH horizon AS (SELECT max(o_orderdate::date) AS h FROM orders),
aged AS (
  SELECT datediff('day', o_orderdate::date, (SELECT h FROM horizon)) AS age,
         round(o_totalprice * 100)::bigint AS cents
  FROM orders WHERE o_orderstatus = 'O'
)
SELECT CASE WHEN age <= 30 THEN '0-30d'
            WHEN age <= 90 THEN '31-90d'
            WHEN age <= 365 THEN '91-365d'
            ELSE '>365d' END AS band,
       count(*) AS n_orders,
       sum(cents)::bigint AS value_cents,
       min(age) AS min_age, max(age) AS max_age
FROM aged GROUP BY 1
"""


def revenue_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue waterfall: gross extended price, the discount
    given, and the tax collected — the P&L bridge decomposition. Each
    component quantizes the IDENTICAL float product (price * rate) to
    cents with the same round-then-sum expression in both engines, so
    the bridge reconciles exactly: net = gross - discount; billed =
    net + tax."""
    li = read_table(spark, sf_dir, "lineitem")
    gross = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_extendedprice") * F.col("l_discount") * 100).cast("long")
    tax = F.round(
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * F.col("l_tax")
        * 100
    ).cast("long")
    return (
        li.select(
            F.date_format(F.to_date("l_shipdate"), "yyyy-MM").alias("month"),
            gross.alias("g"),
            disc.alias("d"),
            tax.alias("t"),
        )
        .groupBy("month")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum("g").alias("gross_cents"),
            F.sum("d").alias("discount_cents"),
            (F.sum("g") - F.sum("d")).alias("net_cents"),
            F.sum("t").alias("tax_cents"),
        )
    )


REVENUE_WATERFALL_SQL = """
SELECT strftime(l_shipdate::date, '%Y-%m') AS month,
       count(*) AS n_lines,
       sum(round(l_extendedprice * 100)::bigint)::bigint AS gross_cents,
       sum(round(l_extendedprice * l_discount * 100)::bigint)::bigint AS discount_cents,
       (sum(round(l_extendedprice * 100)::bigint)
        - sum(round(l_extendedprice * l_discount * 100)::bigint))::bigint AS net_cents,
       sum(round(l_extendedprice * (1 - l_discount) * l_tax * 100)::bigint)::bigint AS tax_cents
FROM lineitem GROUP BY 1
"""


def supplier_customer_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration-risk screen per supplier: the single largest
    customer's share of the supplier's revenue (top-1 dependency) — high
    values flag suppliers whose business collapses if one buyer leaves.
    One (supplier, customer) aggregation, a per-supplier argmax window,
    one rounded share. Top 15 most dependent."""
    from hadoop_data_lake_spark.functions.fixedpoint import to_units
    from pyspark.sql import Window

    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    sc = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_suppkey", "o_custkey")
        .agg(F.sum(to_units(F.col("l_extendedprice"))).alias("cents"))
    )
    tot = sc.groupBy("l_suppkey").agg(F.sum("cents").alias("total"))
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("cents").desc(), F.col("o_custkey").asc()
    )
    top1 = sc.withColumn("rk", F.row_number().over(w)).where(F.col("rk") == 1)
    scored = top1.join(tot, "l_suppkey").select(
        F.col("l_suppkey").alias("suppkey"),
        F.col("o_custkey").alias("top_custkey"),
        F.round(
            F.col("cents").cast("double") / F.col("total").cast("double"), 6
        ).alias("top1_share_r"),
    )
    w2 = Window.orderBy(F.col("top1_share_r").desc(), F.col("suppkey").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w2))
        .where(F.col("rnk") <= 15)
        .select("rnk", "suppkey", "top_custkey", "top1_share_r")
    )


SUPPLIER_CUSTOMER_DEPENDENCY_SQL = """
WITH sc AS (
  SELECT l.l_suppkey, o.o_custkey,
         sum(round(l.l_extendedprice * 100)::bigint)::bigint AS cents
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY l.l_suppkey, o.o_custkey
),
tot AS (SELECT l_suppkey, sum(cents)::bigint AS total FROM sc GROUP BY l_suppkey),
top1 AS (
  SELECT l_suppkey, o_custkey, cents FROM (
    SELECT *, row_number() OVER (
      PARTITION BY l_suppkey ORDER BY cents DESC, o_custkey ASC) AS rk
    FROM sc
  ) WHERE rk = 1
),
scored AS (
  SELECT t1.l_suppkey AS suppkey, t1.o_custkey AS top_custkey,
         round(t1.cents::double / t.total::double, 6) AS top1_share_r
  FROM top1 t1 JOIN tot t ON t1.l_suppkey = t.l_suppkey
)
SELECT rnk, suppkey, top_custkey, top1_share_r FROM (
  SELECT *, row_number() OVER (ORDER BY top1_share_r DESC, suppkey ASC) AS rnk
  FROM scored
) WHERE rnk <= 15
"""


def er_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end to end — the MDM "golden record" shape, in the
    order that survives scale: (1) COLLAPSE exact duplicates first (64
    distinct names cover 20k parts at sf0.1 — never materialize pairs of
    identical records: that is quadratic in group size, measured 186 s at
    sf0.1 for the naive per-record pair join this replaced), (2) blocked
    Jaro-Winkler linkage over DISTINCT names only (pairs bounded by the
    name vocabulary, not the record count; the pandas-UDF metric sees a
    vocabulary-sized Arrow batch), (3) connected components over the name
    match graph (O(log n) large-star/small-star), (4) survivorship back
    over the full record set: entity key = min member key, canonical name
    = the key-holder's, cents-exact price spread across members. Output:
    one row per multi-member entity.

    100 TB shape: the record table is touched by exactly one hash join
    (name -> entity, broadcast vocabulary side) and one aggregation; all
    pairwise work happens in vocabulary space."""
    from hadoop_data_lake_spark.functions.strsim import jaro_winkler
    from hadoop_data_lake_spark.operators.graph import dedup_clusters

    part = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_retailprice"
    )
    names = part.select("p_name").distinct()
    blocked = names.withColumn(
        "blk", F.split_part(F.col("p_name"), F.lit(" "), F.lit(1))
    )
    a = blocked.select("blk", F.col("p_name").alias("name_a"))
    b = blocked.select("blk", F.col("p_name").alias("name_b"))
    npairs = (
        a.join(b, "blk")
        .where(F.col("name_a") < F.col("name_b"))
        .withColumn(
            "sim_r", F.round(jaro_winkler(F.col("name_a"), F.col("name_b")), 6)
        )
        .where(F.col("sim_r") >= 0.93)
        .select(F.col("name_a").alias("doc_a"), F.col("name_b").alias("doc_b"))
    )
    comp = dedup_clusters(npairs).select(
        F.col("doc").alias("p_name"), F.col("cluster_rep").alias("rep")
    )
    nm = (
        names.join(comp, "p_name", "left")
        .select("p_name", F.coalesce("rep", "p_name").alias("name_rep"))
    )
    members = part.join(F.broadcast(nm), "p_name")
    golden = (
        members.groupBy("name_rep")
        .agg(
            F.min("p_partkey").alias("entity_key"),
            F.count("*").alias("n_members"),
            (
                F.max(F.round(F.col("p_retailprice") * 100).cast("long"))
                - F.min(F.round(F.col("p_retailprice") * 100).cast("long"))
            ).alias("price_spread_cents"),
        )
        .where(F.col("n_members") >= 2)
    )
    canon = part.select(
        F.col("p_partkey").alias("entity_key"),
        F.col("p_name").alias("canonical_name"),
    )
    return golden.join(canon, "entity_key").select(
        "entity_key", "canonical_name", "n_members", "price_spread_cents"
    )


ER_GOLDEN_RECORD_SQL = """
WITH RECURSIVE names AS MATERIALIZED (SELECT DISTINCT p_name FROM part),
blocked AS (
  SELECT p_name, split_part(p_name, ' ', 1) AS blk FROM names
),
npairs AS MATERIALIZED (
  SELECT a.p_name AS doc_a, b.p_name AS doc_b
  FROM blocked a JOIN blocked b
    ON a.blk = b.blk AND a.p_name < b.p_name
  WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 6) >= 0.93
),
edges2 AS (
  SELECT doc_a AS s, doc_b AS d FROM npairs
  UNION ALL
  SELECT doc_b, doc_a FROM npairs
),
walk(v, r) AS (
  SELECT s, s FROM edges2
  UNION
  SELECT e.s, w.r FROM edges2 e JOIN walk w ON e.d = w.v
),
comp AS (SELECT v, min(r) AS rep FROM walk GROUP BY v),
nm AS MATERIALIZED (
  SELECT n.p_name, coalesce(c.rep, n.p_name) AS name_rep
  FROM names n LEFT JOIN comp c ON n.p_name = c.v
),
golden AS (
  SELECT nm.name_rep,
         min(p.p_partkey) AS entity_key,
         count(*)::bigint AS n_members,
         (max(round(p.p_retailprice * 100)::bigint)
          - min(round(p.p_retailprice * 100)::bigint)) AS price_spread_cents
  FROM part p JOIN nm ON p.p_name = nm.p_name
  GROUP BY nm.name_rep
  HAVING count(*) >= 2
)
SELECT g.entity_key, p.p_name AS canonical_name, g.n_members,
       g.price_spread_cents
FROM golden g JOIN part p ON g.entity_key = p.p_partkey
"""


def brand_communities_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous label-propagation communities
    (operators/graph.lpa_communities) over the weighted brand
    co-occurrence graph (edges = brand_basket_pairs, weight = co-order
    count). Fixed 4 rounds, integer weights, label-asc tie-break — the
    DuckDB oracle unrolls the identical recurrence round by round
    (pagerank_det precedent), promoting community detection into the full
    value-hash correctness gate."""
    from hadoop_data_lake_spark.operators.graph import lpa_communities

    edges = brand_basket_pairs(spark, sf_dir)
    return lpa_communities(
        edges, src="brand_a", dst="brand_b", weight="n_orders", iters=4
    )


def _lpa_sql(iters: int = 4) -> str:
    parts = [
        """
WITH ob AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
pe AS MATERIALIZED (
  SELECT a.p_brand AS s, b.p_brand AS d, count(*)::bigint AS w
  FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
),
e AS MATERIALIZED (
  SELECT s, d, w FROM pe UNION ALL SELECT d, s, w FROM pe
),
l0 AS MATERIALIZED (SELECT DISTINCT s AS vertex, s AS label FROM e)"""
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""",
t{k} AS (
  SELECT e.s AS vertex, l.label, sum(e.w)::bigint AS score
  FROM e JOIN l{k - 1} l ON e.d = l.vertex
  GROUP BY 1, 2
),
n{k} AS (
  SELECT vertex, label FROM (
    SELECT vertex, label,
           row_number() OVER (PARTITION BY vertex
                              ORDER BY score DESC, label) AS rn
    FROM t{k}) WHERE rn = 1
),
l{k} AS MATERIALIZED (
  SELECT l.vertex, coalesce(n.label, l.label) AS label
  FROM l{k - 1} l LEFT JOIN n{k} n ON l.vertex = n.vertex
)"""
        )
    parts.append(
        f"""
SELECT l.vertex, l.label AS community, sz.community_size
FROM l{iters} l
JOIN (SELECT label, count(*)::bigint AS community_size
      FROM l{iters} GROUP BY label) sz
  ON l.label = sz.label"""
    )
    return "".join(parts)


BRAND_COMMUNITIES_LPA_SQL = _lpa_sql()


def cf_ndcg_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recommender backtest with NDCG@5 — the ML-eval closing bracket for
    the CF family: temporal split (train = orders before 2000-01-01, test
    = after), recommend each customer the 5 most popular train brands they
    have NOT bought (popularity desc, brand asc — the deterministic
    popularity baseline every CF model must beat), score against the
    brands they actually bought in test. Per-customer DCG is a fixed-order
    5-term sum rel_i / log2(i+1); IDCG is the same sum over
    min(5, |relevant|); output one row per evaluated customer (customers
    with no new test brands are excluded — NDCG is undefined) — per-row
    closed-form floats only, never a cross-row float sum, so the oracle
    replays it exactly.

    100 TB shape: brand popularity is a catalog-bounded broadcast; the
    per-customer candidate frame is |customers| x |brands| with the
    already-bought anti-join applied before ranking; one window for the
    top-5, one join to test purchases."""
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cb = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .select(
            "o_custkey",
            "p_brand",
            (F.to_date("o_orderdate") < F.lit("2000-01-01").cast("date")).alias(
                "is_train"
            ),
        )
    )
    # ONE pass over the fact join (r9 scan-multiplicity audit): aggregate
    # to the bounded (customer x brand x split) frame and checkpoint it —
    # train/test/popularity previously each re-executed the
    # lineitem-orders join (6 lineitem scans per run). Row counts ride
    # along so popularity still counts purchases, not distinct pairs.
    cbd = (
        cb.groupBy("o_custkey", "p_brand", "is_train")
        .agg(F.count("*").alias("n_rows"))
        .localCheckpoint(eager=True)
    )
    train = cbd.where("is_train").select("o_custkey", "p_brand").distinct()
    test = cbd.where(~F.col("is_train")).select("o_custkey", "p_brand").distinct()
    pop = (
        cbd.where("is_train")
        .groupBy("p_brand")
        .agg(F.sum("n_rows").alias("pop"))
    )
    test_users = test.select("o_custkey").distinct()
    cand = (
        test_users.crossJoin(F.broadcast(pop))
        .join(train, ["o_custkey", "p_brand"], "left_anti")
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("pop").desc(), F.col("p_brand").asc()
    )
    recs = (
        cand.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .join(
            test.withColumn("rel", F.lit(1)),
            ["o_custkey", "p_brand"],
            "left",
        )
        .withColumn("rel", F.coalesce("rel", F.lit(0)))
    )
    # relevant set size per customer = test brands NOT already in train
    relevant = (
        test.join(train, ["o_custkey", "p_brand"], "left_anti")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_relevant"))
    )
    dcg_terms = [
        F.max(F.when(F.col("rnk") == i, F.col("rel"))).cast("double")
        / F.log2(F.lit(float(i + 1)))
        for i in range(1, 6)
    ]
    dcg = dcg_terms[0]
    for t in dcg_terms[1:]:
        dcg = dcg + t
    per_user = recs.groupBy("o_custkey").agg(dcg.alias("dcg"))
    idcg_terms = [
        F.when(F.col("n_relevant") >= i, 1.0).otherwise(0.0)
        / F.log2(F.lit(float(i + 1)))
        for i in range(1, 6)
    ]
    idcg = idcg_terms[0]
    for t in idcg_terms[1:]:
        idcg = idcg + t
    return (
        per_user.join(relevant, "o_custkey")
        .withColumn("idcg", idcg)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("n_relevant").cast("long").alias("n_relevant"),
            F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg_r"),
        )
    )


CF_NDCG_BACKTEST_SQL = """
WITH cb AS (
  SELECT o_custkey, p_brand, (o_orderdate::date < DATE '2000-01-01') AS is_train
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
),
train AS (SELECT DISTINCT o_custkey, p_brand FROM cb WHERE is_train),
test AS (SELECT DISTINCT o_custkey, p_brand FROM cb WHERE NOT is_train),
pop AS (
  SELECT p_brand, count(*)::bigint AS pop FROM cb WHERE is_train GROUP BY 1
),
cand AS (
  SELECT u.o_custkey, p.p_brand, p.pop
  FROM (SELECT DISTINCT o_custkey FROM test) u
  CROSS JOIN pop p
  WHERE NOT EXISTS (SELECT 1 FROM train t
                    WHERE t.o_custkey = u.o_custkey AND t.p_brand = p.p_brand)
),
recs AS (
  SELECT o_custkey, p_brand, rnk,
         CASE WHEN EXISTS (SELECT 1 FROM test t
                           WHERE t.o_custkey = c.o_custkey
                             AND t.p_brand = c.p_brand)
              THEN 1 ELSE 0 END AS rel
  FROM (SELECT o_custkey, p_brand,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY pop DESC, p_brand ASC) AS rnk
        FROM cand) c
  WHERE rnk <= 5
),
relevant AS (
  SELECT t.o_custkey, count(*)::bigint AS n_relevant
  FROM test t
  WHERE NOT EXISTS (SELECT 1 FROM train tr
                    WHERE tr.o_custkey = t.o_custkey AND tr.p_brand = t.p_brand)
  GROUP BY t.o_custkey
),
per_user AS (
  SELECT o_custkey,
         (max(CASE WHEN rnk = 1 THEN rel END)::double / log2(2.0))
       + (max(CASE WHEN rnk = 2 THEN rel END)::double / log2(3.0))
       + (max(CASE WHEN rnk = 3 THEN rel END)::double / log2(4.0))
       + (max(CASE WHEN rnk = 4 THEN rel END)::double / log2(5.0))
       + (max(CASE WHEN rnk = 5 THEN rel END)::double / log2(6.0)) AS dcg
  FROM recs GROUP BY o_custkey
)
SELECT p.o_custkey AS custkey, r.n_relevant,
       round(p.dcg / (
         (CASE WHEN r.n_relevant >= 1 THEN 1.0 ELSE 0.0 END / log2(2.0))
       + (CASE WHEN r.n_relevant >= 2 THEN 1.0 ELSE 0.0 END / log2(3.0))
       + (CASE WHEN r.n_relevant >= 3 THEN 1.0 ELSE 0.0 END / log2(4.0))
       + (CASE WHEN r.n_relevant >= 4 THEN 1.0 ELSE 0.0 END / log2(5.0))
       + (CASE WHEN r.n_relevant >= 5 THEN 1.0 ELSE 0.0 END / log2(6.0))
       ), 6) AS ndcg_r
FROM per_user p JOIN relevant r ON p.o_custkey = r.o_custkey
"""


def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the companion k-anonymity misses: a group can
    be large (k-anonymous) yet expose everyone's SENSITIVE attribute if
    the group is homogeneous in it. Quasi-identifier = (nation, balance
    band of 1000) over customers; sensitive attribute = market segment;
    l(group) = distinct segments observed. Rolled up per nation
    (publishing violating quasi-identifiers verbatim would itself leak):
    group counts, groups below l = 2 (homogeneous), exposed row count,
    and the worst l. Pure integer bucketing + two aggregations."""
    cust = read_table(spark, sf_dir, "customer")
    groups = (
        cust.select(
            "c_nationkey",
            F.expr("cast(floor(c_acctbal / 1000) as bigint)").alias("bal_band"),
            "c_mktsegment",
        )
        .groupBy("c_nationkey", "bal_band")
        .agg(
            F.countDistinct("c_mktsegment").alias("l"),
            F.count("*").alias("k"),
        )
    )
    return (
        groups.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_groups"),
            F.sum((F.col("l") < 2).cast("long")).alias("n_homogeneous"),
            F.sum(F.when(F.col("l") < 2, F.col("k")).otherwise(0))
            .cast("long")
            .alias("n_exposed_rows"),
            F.min("l").cast("long").alias("min_l"),
        )
    )


L_DIVERSITY_AUDIT_SQL = """
WITH groups AS (
  SELECT c_nationkey, floor(c_acctbal / 1000)::bigint AS bal_band,
         count(DISTINCT c_mktsegment)::bigint AS l, count(*)::bigint AS k
  FROM customer
  GROUP BY 1, 2
)
SELECT c_nationkey,
       count(*)::bigint AS n_groups,
       sum(CASE WHEN l < 2 THEN 1 ELSE 0 END)::bigint AS n_homogeneous,
       sum(CASE WHEN l < 2 THEN k ELSE 0 END)::bigint AS n_exposed_rows,
       min(l)::bigint AS min_l
FROM groups
GROUP BY c_nationkey
"""


def activity_tail_hill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the user-activity tail index — the standard
    heavy-tail diagnostic (alpha ~ 1/hill): over the k = 20 most active
    users' event counts x_1 >= ... >= x_k, hill = (1/(k-1)) * sum_{i<k}
    ln(x_i / x_k). Counts are integers; the log-ratio sum is an ORDERED
    fold over the rank-sorted top-k list (the source_vocab_kl determinism
    pattern) — one closed-form double per fold step, identical in both
    engines, rounded once. Output also carries the integer top-k bounds
    so a drifting tail is visible at a glance."""
    ev = read_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count("*").alias("c"))
    topk = counts.orderBy(F.col("c").desc(), F.col("user_id").asc()).limit(20)
    # empty-corpus alignment (r9 sweep axis): Spark collect_list over zero
    # rows yields [] (slice/element_at on it error under ANSI) while the
    # oracle's list() yields NULL — null the empty array so BOTH engines
    # NULL-propagate through every downstream expression identically.
    arr = topk.agg(
        F.reverse(F.array_sort(F.collect_list("c"))).alias("xs0")
    ).select(F.when(F.size("xs0") > 0, F.col("xs0")).alias("xs"))
    return arr.select(
        F.size("xs").cast("long").alias("k_used"),
        F.element_at("xs", 1).cast("long").alias("x_max"),
        F.element_at("xs", -1).cast("long").alias("x_k"),
        # nullif guards: k = 1 (a single active user) leaves no log-ratio
        # terms (hill undefined), and an all-equal top-k zeroes the fold
        # (alpha undefined) — NULL, not an ANSI divide-by-zero (r8 sweep)
        F.round(
            F.aggregate(
                F.slice("xs", 1, F.size("xs") - 1),
                F.lit(0.0),
                lambda acc, x: acc
                + F.log(
                    x.cast("double") / F.element_at("xs", -1).cast("double")
                ),
            )
            / F.nullif(F.size("xs") - 1, F.lit(0)),
            6,
        ).alias("hill_r"),
        F.round(
            (F.size("xs") - 1)
            / F.nullif(
                F.aggregate(
                    F.slice("xs", 1, F.size("xs") - 1),
                    F.lit(0.0),
                    lambda acc, x: acc
                    + F.log(
                        x.cast("double") / F.element_at("xs", -1).cast("double")
                    ),
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("alpha_r"),
    )


ACTIVITY_TAIL_HILL_SQL = """
WITH counts AS (
  SELECT user_id, count(*)::bigint AS c FROM events GROUP BY user_id
),
topk AS (
  SELECT c FROM counts ORDER BY c DESC, user_id ASC LIMIT 20
),
arr AS (
  SELECT list_reverse(list_sort(list(c))) AS xs FROM topk
)
SELECT len(xs)::bigint AS k_used,
       xs[1]::bigint AS x_max,
       xs[-1]::bigint AS x_k,
       round(list_reduce(list_prepend(0.0,
               list_transform(list_slice(xs, 1, len(xs) - 1),
                 x -> ln(x::double / (xs[-1])::double))),
             (acc, v) -> acc + v) / nullif(len(xs) - 1, 0), 6) AS hill_r,
       round((len(xs) - 1) / nullif(list_reduce(list_prepend(0.0,
               list_transform(list_slice(xs, 1, len(xs) - 1),
                 x -> ln(x::double / (xs[-1])::double))),
             (acc, v) -> acc + v), 0.0), 6) AS alpha_r
FROM arr
"""


def monthly_from_daily_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view rewrite legality: the monthly revenue report
    answered ONLY from a daily pre-aggregate (sum/count/min/max carried
    up; avg re-derived as sum-of-sums over sum-of-counts — never the
    avg-of-avgs pitfall), verified against the oracle computing monthly
    straight from the facts. This is the contract every rollup-serving
    layer (and incremental_orders_agg's refresh) rests on: coarser grains
    must be answerable from finer pre-aggregates without touching facts.

    100 TB shape: facts are read once at the daily grain; the monthly
    pass aggregates ~365 rows per year."""
    orders = read_table(spark, sf_dir, "orders")
    daily = (
        orders.select(
            F.to_date("o_orderdate").alias("d"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(
            F.sum("cents").alias("day_cents"),
            F.count("*").alias("day_orders"),
            F.min("cents").alias("day_min"),
            F.max("cents").alias("day_max"),
        )
    )
    return (
        daily.groupBy(F.date_format("d", "yyyy-MM").alias("month"))
        .agg(
            F.sum("day_cents").cast("long").alias("rev_cents"),
            F.sum("day_orders").cast("long").alias("n_orders"),
            F.min("day_min").cast("long").alias("min_cents"),
            F.max("day_max").cast("long").alias("max_cents"),
        )
        .withColumn(
            "avg_cents_r",
            F.round(F.col("rev_cents") / F.col("n_orders").cast("double"), 6),
        )
    )


MONTHLY_FROM_DAILY_MV_SQL = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       sum(round(o_totalprice * 100)::bigint)::bigint AS rev_cents,
       count(*)::bigint AS n_orders,
       min(round(o_totalprice * 100)::bigint)::bigint AS min_cents,
       max(round(o_totalprice * 100)::bigint)::bigint AS max_cents,
       round(sum(round(o_totalprice * 100)::bigint)::double / count(*), 6)
         AS avg_cents_r
FROM orders
GROUP BY 1
"""


def hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg hubs & authorities) on the bipartite
    customer -> supplier purchase graph: customers are hubs, suppliers
    authorities; two full mutual-reinforcement iterations (a = sum of
    neighbor hub scores, h = sum of neighbor authority scores), each
    followed by INTEGER rescaling score * 10^6 div max(score) — the
    normalization both engines floor-divide identically, so the fixed
    point replays bit-for-bit (the pagerank_det pattern). Top-10 hubs and
    top-10 authorities via orderBy().limit() (TakeOrderedAndProject —
    never a global sort of the customer dimension). Scale shape: the edge
    list is checkpointed once and every round is one hash join + one
    hash aggregate + a broadcast scalar max; 10^6-scaled sums stay under
    bigint for degrees < ~10^6 per node (cast to decimal beyond).

    Round 12: when the graph fits the driver caps, the whole fixed point
    runs as the numpy driver tier (operators/graph.hits_scaled_driver —
    one Arrow collect, exact int64 bincounts, bit-identical by the
    <2^53 exactness argument in its docstring); above the caps the
    distributed loop below stands unchanged, and both paths share the
    same top-k shaping.

    Round 14 (VERDICT r13 item 3 — the edge build + per-node shaping
    were ~75% of the r13 profile): the common case now runs the FUSED
    driver tier (operators/graph.hits_topk_sides_driver) — ONE Arrow
    collect of the raw join projection, pair-dedup + rounds + top-k all
    in numpy, 20 rows back. The cap bound is the lineitem row count
    alone (a column-pruned count, no join execution): the inner join on
    orders' primary key cannot multiply lineitem rows, so |raw edges|
    <= |lineitem|. Above the byte cap — or if the fused tier declines —
    the r12 shape below (distinct + checkpoint + exact counts +
    two-frame tier / distributed loop) stands unchanged."""
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e_raw = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
    )

    from hadoop_data_lake_spark.operators import graph as G

    # Skip the bound's count job entirely when the fused tier cannot run
    # (tiers pinned off in plan audits / scale probes — ADVICE r14): the
    # count exists only to serve as n_edges_bound. Round 15: the bound
    # comes off the parquet footers when readable (exact, no Spark job —
    # core/io.parquet_row_count), with the column-pruned count as the
    # fallback.
    if G.GENERAL_DRIVER_TIER_ENABLED:
        from hadoop_data_lake_spark.core.io import parquet_row_count

        # cap= (r16): early-exit footer loop, see pagerank_det.
        bound = parquet_row_count(
            sf_dir, "lineitem", cap=G.NUMPY_DRIVER_MAX_EDGES
        )
        top = G.hits_topk_sides_driver(
            e_raw,
            "c",
            "s",
            rounds=2,
            k=10,
            n_edges_bound=bound if bound is not None else li.count(),
        )
        if top is not None:
            return top

    e = e_raw.distinct().localCheckpoint(eager=True)

    from hadoop_data_lake_spark.operators.graph import broadcast_bounded_state

    # vertex-count bounds for the state broadcast, computed ONCE: the hub
    # and authority score frames carry exactly the distinct customers /
    # suppliers of the edge list on every round, so one aggregate over the
    # checkpointed edges replaces the per-rescale recount the previous
    # shape ran (4 driver jobs per query; driver-ADVICE r10).
    n_c, n_s, n_e = e.agg(
        F.countDistinct("c").alias("n_c"),
        F.countDistinct("s").alias("n_s"),
        F.count("*").alias("n_e"),
    ).first()

    from hadoop_data_lake_spark.operators.graph import hits_scaled_driver

    driver_scores = hits_scaled_driver(
        e, "c", "s", n_c, n_s, rounds=2, n_edges=n_e
    )
    if driver_scores is not None:
        h, a = driver_scores
        return _hits_top_sides(h, a)

    def rescale(df: DataFrame, n_rows: int) -> DataFrame:
        # checkpoint before branching: the max-agg and the join both read
        # the frame, and an uncheckpointed branch re-executes the whole
        # round chain per reference (2^rounds blowup). The returned score
        # frame is per-vertex state consumed by the next round's edge
        # join — broadcast-hint it when bounded (operators/graph note:
        # checkpointed state scans carry no stats, so Catalyst otherwise
        # SMJ-shuffles the edge list every round).
        df = df.localCheckpoint(eager=True)
        m = df.agg(F.max("v").alias("m"))
        scaled = df.crossJoin(F.broadcast(m)).select(
            df.columns[0], F.expr("v * 1000000 div m").alias("v")
        )
        return broadcast_bounded_state(scaled, n_rows)

    a = rescale(e.groupBy("s").agg(F.count("*").cast("long").alias("v")), n_s)
    h = rescale(e.join(a, "s").groupBy("c").agg(F.sum("v").alias("v")), n_c)
    a = rescale(e.join(h, "c").groupBy("s").agg(F.sum("v").alias("v")), n_s)
    h = rescale(e.join(a, "s").groupBy("c").agg(F.sum("v").alias("v")), n_c)
    return _hits_top_sides(h, a)


def _hits_top_sides(h: DataFrame, a: DataFrame) -> DataFrame:
    """Shared top-10 shaping for both HITS tiers: hub scores (c, v) and
    authority scores (s, v) -> (side, node, score) via TakeOrdered."""
    top_h = (
        h.orderBy(F.col("v").desc(), F.col("c").asc())
        .limit(10)
        .select(
            F.lit("hub").alias("side"),
            F.col("c").alias("node"),
            F.col("v").alias("score"),
        )
    )
    top_a = (
        a.orderBy(F.col("v").desc(), F.col("s").asc())
        .limit(10)
        .select(
            F.lit("auth").alias("side"),
            F.col("s").alias("node"),
            F.col("v").alias("score"),
        )
    )
    return top_h.unionByName(top_a)


HITS_HUBS_AUTHORITIES_SQL = """
WITH e AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
a1 AS MATERIALIZED (SELECT s, count(*)::bigint AS v FROM e GROUP BY s),
a1s AS MATERIALIZED (
  SELECT s, (v * 1000000) // (SELECT max(v) FROM a1) AS v FROM a1
),
h1 AS MATERIALIZED (
  SELECT e.c, sum(a1s.v)::bigint AS v FROM e JOIN a1s ON e.s = a1s.s GROUP BY e.c
),
h1s AS MATERIALIZED (
  SELECT c, (v * 1000000) // (SELECT max(v) FROM h1) AS v FROM h1
),
a2 AS MATERIALIZED (
  SELECT e.s, sum(h1s.v)::bigint AS v FROM e JOIN h1s ON e.c = h1s.c GROUP BY e.s
),
a2s AS MATERIALIZED (
  SELECT s, (v * 1000000) // (SELECT max(v) FROM a2) AS v FROM a2
),
h2 AS MATERIALIZED (
  SELECT e.c, sum(a2s.v)::bigint AS v FROM e JOIN a2s ON e.s = a2s.s GROUP BY e.c
),
h2s AS MATERIALIZED (
  SELECT c, (v * 1000000) // (SELECT max(v) FROM h2) AS v FROM h2
)
SELECT * FROM (
  SELECT 'hub' AS side, c AS node, v AS score FROM h2s
  ORDER BY v DESC, c ASC LIMIT 10
)
UNION ALL
SELECT * FROM (
  SELECT 'auth' AS side, s AS node, v AS score FROM a2s
  ORDER BY v DESC, s ASC LIMIT 10
)
"""


def soundex_word_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic blocking audit over the part-name vocabulary: every
    American-Soundex code that covers two or more DISTINCT words, with the
    member list — the blocking-key quality readout a linkage pipeline
    reads before choosing soundex as its candidate generator (big groups
    = cheap recall, tiny precision). Spark computes the code JVM-side
    (F.soundex); the DuckDB oracle replays the identical algorithm in
    pure SQL (functions/phonetic.soundex_sql — validated on the classic
    vectors, and through this query on EVERY vocabulary word: all code
    groups are emitted, singletons included, so one divergent encoding
    anywhere fails the value hash). One
    explode + two hash aggregations on the DISTINCT word list; candidate
    pairs at linkage time come from the code equi-join, never a pairwise
    scan. The vocabulary unions part-name words and document tokens —
    the cross-table surface a linkage pipeline actually blocks over."""
    part = read_table(spark, sf_dir, "part").select("p_name")
    docs = read_table(spark, sf_dir, "documents").select("text")
    words = (
        part.select(F.explode(F.split(F.col("p_name"), " ")).alias("word"))
        .unionByName(
            docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        )
        .where(F.col("word") != "")
        .distinct()
    )
    return (
        words.withColumn("sx", F.soundex(F.col("word")))
        .groupBy("sx")
        .agg(
            F.count("*").alias("n_words"),
            F.array_join(F.sort_array(F.collect_set("word")), ",").alias("words"),
        )
    )


def _soundex_word_groups_sql() -> str:
    from hadoop_data_lake_spark.functions.phonetic import soundex_sql

    return f"""
WITH words AS (
  SELECT DISTINCT u.word FROM (
    SELECT unnest(string_split(p_name, ' ')) AS word FROM part
    UNION ALL
    SELECT unnest(string_split(text, ' ')) AS word FROM documents
  ) u
  WHERE u.word <> ''
),
coded AS (SELECT word, {soundex_sql('word')} AS sx FROM words)
SELECT sx, count(*)::bigint AS n_words,
       string_agg(word, ',' ORDER BY word) AS words
FROM coded GROUP BY sx
"""


SOUNDEX_WORD_GROUPS_SQL = _soundex_word_groups_sql()


def newsvendor_brand_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor stocking levels per brand: with critical ratio 0.8
    (underage cost 4x overage), the optimal order-up-to level is the 80th
    percentile of daily demand — computed EXACTLY as the rank-ceil order
    statistic of each brand's daily quantity series (integer centi-units,
    brand-partitioned rank windows over the bounded per-brand day
    dimension; never a global sort). Output per brand: observation days,
    mean daily demand, and the q50/q80/q95 stocking ladder."""
    from pyspark.sql import Window

    li = read_table(spark, sf_dir, "lineitem").select(
        F.to_date(F.col("l_shipdate").cast("timestamp")).alias("day"),
        "l_partkey",
        F.round(F.col("l_quantity") * 100).cast("long").alias("qty_c"),
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # checkpoint the bounded (brand x day) aggregate and take all three
    # order statistics in ONE conditional aggregation (the oracle's CASE
    # shape) — the old per-quantile filter branches re-executed the
    # lineitem join 7x per run (r9 scan-multiplicity audit)
    daily = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "day")
        .agg(F.sum("qty_c").alias("d"))
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("p_brand").orderBy("d", "day")
    ranked = daily.withColumn("rk", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy("p_brand"))
    )
    q = ranked.groupBy("p_brand").agg(
        *[
            F.min(
                F.when(
                    F.col("rk") == F.ceil(F.lit(pct / 100.0) * F.col("n")),
                    F.col("d"),
                )
            ).alias(name)
            for name, pct in (("q50", 50), ("q80", 80), ("q95", 95))
        ]
    )
    return (
        daily.groupBy("p_brand")
        .agg(F.count("*").alias("n_days"), F.sum("d").alias("s"))
        .join(q, "p_brand")
        .select(
            "p_brand",
            "n_days",
            F.round(F.col("s").cast("double") / F.col("n_days") / 100.0, 6).alias(
                "mean_daily_r"
            ),
            "q50",
            "q80",
            "q95",
        )
    )


NEWSVENDOR_BRAND_QUANTILES_SQL = """
WITH daily AS (
  SELECT p.p_brand, l.l_shipdate::date AS day,
         sum(round(l.l_quantity * 100)::bigint)::bigint AS d
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand, l.l_shipdate::date
),
ranked AS (
  SELECT p_brand, day, d,
         row_number() OVER (PARTITION BY p_brand ORDER BY d, day) AS rk,
         count(*) OVER (PARTITION BY p_brand) AS n
  FROM daily
),
q AS (
  SELECT p_brand,
         min(CASE WHEN rk = ceil(0.50 * n) THEN d END)::bigint AS q50,
         min(CASE WHEN rk = ceil(0.80 * n) THEN d END)::bigint AS q80,
         min(CASE WHEN rk = ceil(0.95 * n) THEN d END)::bigint AS q95
  FROM ranked GROUP BY p_brand
)
SELECT a.p_brand, count(*)::bigint AS n_days,
       round(sum(a.d)::double / count(*)::double / 100.0, 6) AS mean_daily_r,
       min(q.q50)::bigint AS q50, min(q.q80)::bigint AS q80,
       min(q.q95)::bigint AS q95
FROM daily a JOIN q ON a.p_brand = q.p_brand
GROUP BY a.p_brand
"""


def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit completing the privacy trio (k_anonymity_audit /
    l_diversity_audit): for each quasi-identifier group (nation, market
    segment) the distance between the group's sensitive-attribute
    distribution (account balance, bucketed to 10 global equal-width
    bands) and the GLOBAL distribution, measured as the ordered-bin
    earth-mover distance sum |cum_share_group - cum_share_global| / 9 —
    a group whose balances skew far from the population leaks the
    attribute even at high k. Integer band counts, one cumulative window
    over each group's 10-band frame, a single rounded t per group, and a
    per-nation rollup flagging groups above t = 0.2 (publishing the
    violating QI values verbatim would itself leak)."""
    from pyspark.sql import Window

    cust = read_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
    )
    bounds = cust.agg(
        F.min("bal_c").alias("lo"), F.max("bal_c").alias("hi")
    )
    banded = cust.crossJoin(F.broadcast(bounds)).select(
        "c_nationkey",
        "c_mktsegment",
        F.least(
            F.lit(9),
            F.expr("((bal_c - lo) * 10) div (hi - lo + 1)").cast("int"),
        ).alias("band"),
    )
    # ONE banding pass (r9 scan-multiplicity audit): checkpoint the
    # bounded (nation x segment x band) counts and derive the global
    # distribution by re-aggregating them — the old shape re-scanned
    # customer for the group counts, the global counts and every join
    # branch (8 scans per run; now 2: the bounds reduction + this one)
    g = (
        banded.groupBy("c_nationkey", "c_mktsegment", "band")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    g_tot = g.groupBy("c_nationkey", "c_mktsegment").agg(F.sum("n").alias("gn"))
    glob = g.groupBy("band").agg(F.sum("n").alias("m"))
    glob_tot = glob.agg(F.sum("m").alias("mn"))
    # dense 10-band frame per group so missing bands contribute share 0
    bands = spark.range(10).select(F.col("id").cast("int").alias("band"))
    dense = (
        g_tot.crossJoin(F.broadcast(bands))
        .join(g, ["c_nationkey", "c_mktsegment", "band"], "left")
        .join(F.broadcast(glob), "band")
        .crossJoin(F.broadcast(glob_tot))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "band",
            "gn",
            F.coalesce("n", F.lit(0)).alias("n"),
            "m",
            "mn",
        )
    )
    w = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = dense.withColumn(
        "gap",
        F.abs(
            F.sum("n").over(w).cast("double") / F.col("gn").cast("double")
            - F.sum("m").over(w).cast("double") / F.col("mn").cast("double")
        ),
    )
    per_group = cum.groupBy("c_nationkey", "c_mktsegment", "gn").agg(
        F.round(F.sum("gap") / 9.0, 6).alias("t_r")
    )
    return per_group.groupBy("c_nationkey").agg(
        F.count("*").alias("n_groups"),
        F.sum((F.col("t_r") > 0.2).cast("long")).alias("n_violating"),
        F.round(F.max("t_r"), 6).alias("max_t_r"),
    )


T_CLOSENESS_AUDIT_SQL = """
WITH cust AS (
  SELECT c_nationkey, c_mktsegment, round(c_acctbal * 100)::bigint AS bal_c
  FROM customer
),
bounds AS (SELECT min(bal_c) AS lo, max(bal_c) AS hi FROM cust),
banded AS (
  SELECT c_nationkey, c_mktsegment,
         least(9, ((bal_c - bounds.lo) * 10) // (bounds.hi - bounds.lo + 1))::int AS band
  FROM cust, bounds
),
g AS (
  SELECT c_nationkey, c_mktsegment, band, count(*)::bigint AS n
  FROM banded GROUP BY c_nationkey, c_mktsegment, band
),
g_tot AS (
  SELECT c_nationkey, c_mktsegment, sum(n)::bigint AS gn
  FROM g GROUP BY c_nationkey, c_mktsegment
),
gdist AS (SELECT band, count(*)::bigint AS m FROM banded GROUP BY band),
gdist_tot AS (SELECT sum(m)::bigint AS mn FROM gdist),
dense AS (
  SELECT t.c_nationkey, t.c_mktsegment, b.band, t.gn,
         coalesce(g.n, 0)::bigint AS n, gl.m, gt.mn
  FROM g_tot t
  CROSS JOIN (SELECT unnest(range(0, 10))::int AS band) b
  LEFT JOIN g ON g.c_nationkey = t.c_nationkey
             AND g.c_mktsegment = t.c_mktsegment AND g.band = b.band
  JOIN gdist gl ON gl.band = b.band
  CROSS JOIN gdist_tot gt
),
cum AS (
  SELECT c_nationkey, c_mktsegment, gn,
         abs((sum(n) OVER w)::double / gn::double
             - (sum(m) OVER w)::double / mn::double) AS gap
  FROM dense
  WINDOW w AS (PARTITION BY c_nationkey, c_mktsegment ORDER BY band
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
per_group AS (
  SELECT c_nationkey, c_mktsegment, round(sum(gap) / 9.0, 6) AS t_r
  FROM cum GROUP BY c_nationkey, c_mktsegment, gn
)
SELECT c_nationkey, count(*)::bigint AS n_groups,
       sum((t_r > 0.2)::int)::bigint AS n_violating,
       round(max(t_r), 6) AS max_t_r
FROM per_group GROUP BY c_nationkey
"""


def graph_feature_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphSAGE-style feature propagation (2 layers, mean aggregator) on
    the customer-supplier purchase graph — the GNN preprocessing
    primitive: h0 = node degree, and each layer averages the node's own
    state with the integer MEAN of its neighbors' states
    (h' = (h + sum(h_nbr) div deg) div 2, all bigint floor divisions, so
    the embedding replays bit-for-bit; the float analog would be
    rows-only). Two rounds of one equi-join + one aggregate each over a
    checkpointed edge list; output the top-20 nodes by propagated state
    via TakeOrderedAndProject. The smoothed state is the homophily
    signal ('am I connected to high-degree hubs?') a downstream model
    consumes as a feature."""
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    base = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("o_custkey").alias("a"),
            (-F.col("l_suppkey") - 1).alias("b"),
        )
        .distinct()
    )
    edges = base.unionByName(
        base.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    deg = edges.groupBy("a").agg(F.count("*").alias("deg"))
    h = deg.select(F.col("a").alias("node"), F.col("deg").alias("h"))
    h0 = h
    for _ in range(2):
        nbr = (
            edges.join(h, F.col("b") == F.col("node"))
            .groupBy("a")
            .agg(F.sum("h").alias("s"))
        )
        h = (
            deg.join(nbr, "a")
            .join(h.select(F.col("node"), F.col("h").alias("own")), F.col("a") == F.col("node"))
            .select(
                F.col("a").alias("node"),
                F.expr("(own + (s div deg)) div 2").alias("h"),
            )
            .localCheckpoint(eager=True)
        )
    out = (
        h.join(h0.select(F.col("node"), F.col("h").alias("h0")), "node")
        .orderBy(F.col("h").desc(), F.col("node").asc())
        .limit(20)
    )
    return out.select("node", "h0", F.col("h").alias("h2"))


GRAPH_FEATURE_PROPAGATION_SQL = """
WITH base AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS a, (-l.l_suppkey - 1) AS b
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
edges AS MATERIALIZED (
  SELECT a, b FROM base UNION ALL SELECT b, a FROM base
),
deg AS MATERIALIZED (SELECT a, count(*)::bigint AS deg FROM edges GROUP BY a),
h0 AS MATERIALIZED (SELECT a AS node, deg AS h FROM deg),
n1 AS MATERIALIZED (
  SELECT e.a, sum(h0.h)::bigint AS s FROM edges e JOIN h0 ON e.b = h0.node GROUP BY e.a
),
h1 AS MATERIALIZED (
  SELECT d.a AS node, ((o.h + (n1.s // d.deg)) // 2)::bigint AS h
  FROM deg d JOIN n1 ON d.a = n1.a JOIN h0 o ON d.a = o.node
),
n2 AS MATERIALIZED (
  SELECT e.a, sum(h1.h)::bigint AS s FROM edges e JOIN h1 ON e.b = h1.node GROUP BY e.a
),
h2 AS MATERIALIZED (
  SELECT d.a AS node, ((o.h + (n2.s // d.deg)) // 2)::bigint AS h
  FROM deg d JOIN n2 ON d.a = n2.a JOIN h1 o ON d.a = o.node
)
SELECT h2.node, h0.h AS h0, h2.h AS h2
FROM h2 JOIN h0 ON h2.node = h0.node
ORDER BY h2.h DESC, h2.node ASC LIMIT 20
"""


def laspeyres_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly Laspeyres price index over the brand basket: base-month
    (first month) quantities weight each brand's unit price, so the
    index isolates PRICE movement from mix shift — the standard
    inflation-style readout. Per-brand unit prices quantize to integer
    centi-cents (round(sum_price * 10000 / sum_qty)) BEFORE the basket
    products, so every numerator/denominator is an exact bigint
    dot-product of the base basket with the month's price vector; one
    rounded ratio per month. Two hash aggregates + a broadcast of the
    bounded brand basket."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.date_trunc("month", F.col("l_shipdate").cast("timestamp")).cast("date").alias("month"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("qty_c"),
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    bm = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "month")
        .agg(F.sum("price_c").alias("sp"), F.sum("qty_c").alias("sq"))
        # dprod: sp * 10000 in long wraps once a brand-month's price sum
        # passes ~9.2e14 cents; the exact decimal product converts to
        # double before the division — the same exact-int-to-double path
        # DuckDB's hugeint product takes, so rounding stays identical.
        .withColumn(
            "up",
            F.round(
                dprod(F.col("sp"), F.lit(10000)).cast("double")
                / F.col("sq").cast("double"),
                0,
            ).cast("long"),
        )
        # eager checkpoint (r11): three consumers (base-month scalar, base
        # basket, index join) otherwise each re-run the lineitem x part
        # aggregate (3 visible fact scans -> 1); brand x month bounded
        .localCheckpoint(eager=True)
    )
    base_month = bm.agg(F.min("month").alias("b0"))
    base = (
        bm.crossJoin(F.broadcast(base_month))
        .where(F.col("month") == F.col("b0"))
        .select(
            "p_brand", F.col("sq").alias("q0"), F.col("up").alias("up0")
        )
    )
    j = bm.join(F.broadcast(base), "p_brand")
    return (
        j.groupBy("month")
        .agg(
            F.count("*").alias("n_brands"),
            F.sum(dprod(F.col("up"), F.col("q0"))).alias("num"),
            F.sum(dprod(F.col("up0"), F.col("q0"))).alias("den"),
        )
        .select(
            F.col("month").cast("string").alias("month"),
            "n_brands",
            F.round(
                F.col("num").cast("double") / F.col("den").cast("double") * 100.0, 6
            ).alias("laspeyres_r"),
        )
    )


LASPEYRES_PRICE_INDEX_SQL = """
WITH li AS (
  SELECT p.p_brand, date_trunc('month', l.l_shipdate::date)::date AS month,
         round(l.l_extendedprice * 100)::bigint AS price_c,
         round(l.l_quantity * 100)::bigint AS qty_c
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
bm AS (
  SELECT p_brand, month, sum(price_c)::bigint AS sp, sum(qty_c)::bigint AS sq,
         round(sum(price_c) * 10000 / sum(qty_c), 0)::bigint AS up
  FROM li GROUP BY p_brand, month
),
base AS (
  SELECT p_brand, sq AS q0, up AS up0 FROM bm
  WHERE month = (SELECT min(month) FROM bm)
)
SELECT bm.month::varchar AS month, count(*)::bigint AS n_brands,
       round(sum(bm.up::hugeint * base.q0::hugeint)::double
             / sum(base.up0::hugeint * base.q0::hugeint)::double * 100.0, 6)
         AS laspeyres_r
FROM bm JOIN base ON bm.p_brand = base.p_brand
GROUP BY bm.month
"""


def croston_intermittent_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method for intermittent demand, per part: demand SIZES
    and inter-demand INTERVALS each get their own sequential EWMA
    (alpha = 0.2, the inherently ordered recurrence plain window frames
    cannot express — the user_value_ewma JVM fold pattern), and the
    forecast per period is ewma(size) / ewma(interval) — the standard
    spare-parts answer where a plain EWMA of the daily series collapses
    toward zero on the long runs of zero-demand days. One daily
    aggregate, one shuffle collecting each part's ordered demand
    occurrences (state bounded by demand days per part), two identical
    IEEE folds in both engines, one rounded ratio."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.unix_date(F.to_date(F.col("l_shipdate").cast("timestamp"))).alias("d"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("qty_c"),
    )
    daily = (
        li.groupBy("l_partkey", "d")
        .agg(F.sum("qty_c").alias("z"))
        .where(F.col("z") > 0)
    )
    per_part = daily.groupBy("l_partkey").agg(
        F.array_sort(F.collect_list(F.struct("d", "z"))).alias("occ")
    ).select(
        "l_partkey",
        F.transform(F.col("occ"), lambda s: s["z"].cast("double")).alias("sizes"),
        F.col("occ"),
    ).select(
        "l_partkey",
        "sizes",
        F.expr(
            "transform(sequence(1, size(occ)), j -> CASE WHEN j = 1 THEN 1.0D "
            "ELSE cast(occ[j - 1].d - occ[j - 2].d as double) END)"
        ).alias("ivals"),
    )
    fold = (
        "aggregate(slice({c}, 2, size({c}) - 1), element_at({c}, 1), "
        "(acc, x) -> 0.2D * x + 0.8D * acc)"
    )
    out = per_part.select(
        "l_partkey",
        F.size("sizes").cast("long").alias("n_demand_days"),
        F.expr(fold.format(c="sizes")).alias("ez"),
        F.expr(fold.format(c="ivals")).alias("ei"),
    )
    return out.select(
        "l_partkey",
        "n_demand_days",
        F.round(F.col("ez") / 100.0, 6).alias("ewma_size_r"),
        F.round(F.col("ei"), 6).alias("ewma_interval_r"),
        F.round(F.col("ez") / F.col("ei") / 100.0, 6).alias("croston_rate_r"),
    )


CROSTON_INTERMITTENT_FORECAST_SQL = """
WITH daily AS (
  SELECT l_partkey, (l_shipdate::date - DATE '1970-01-01')::bigint AS d,
         sum(round(l_quantity * 100)::bigint)::bigint AS z
  FROM lineitem GROUP BY l_partkey, l_shipdate::date
  HAVING sum(round(l_quantity * 100)::bigint) > 0
),
per_part AS (
  SELECT l_partkey,
         list(z::double ORDER BY d) AS sizes,
         list(d ORDER BY d) AS ds
  FROM daily GROUP BY l_partkey
),
prepped AS (
  SELECT l_partkey, sizes,
         list_transform(range(1, len(ds) + 1),
           j -> CASE WHEN j = 1 THEN 1.0
                     ELSE (ds[j] - ds[j - 1])::double END) AS ivals
  FROM per_part
)
SELECT l_partkey, len(sizes)::bigint AS n_demand_days,
       round(list_reduce(sizes, (acc, x) -> 0.2 * x + 0.8 * acc) / 100.0, 6)
         AS ewma_size_r,
       round(list_reduce(ivals, (acc, x) -> 0.2 * x + 0.8 * acc), 6)
         AS ewma_interval_r,
       round(list_reduce(sizes, (acc, x) -> 0.2 * x + 0.8 * acc)
             / list_reduce(ivals, (acc, x) -> 0.2 * x + 0.8 * acc) / 100.0, 6)
         AS croston_rate_r
FROM prepped
"""


def lpa_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Newman modularity of the LPA brand communities — the
    quality number community detection is judged by (Q near 0 = no
    better than random; the clustering-quality companion to
    semdedup_silhouette, on the graph side): per community,
    Q_c = w_in/W - (deg_c / 2W)^2 from INTEGER in-community edge
    weights and weighted degrees; contributions quantize to micro-units
    before the total so Q replays exactly. Everything reuses the graded
    brand_basket_pairs edges and brand_communities_lpa labels."""
    from hadoop_data_lake_spark.operators.graph import lpa_communities

    # build the basket-pair edges ONCE and feed both consumers — the
    # previous shape called brand_communities_lpa(spark, sf_dir), which
    # re-ran the whole lineitem x part basket build a second time
    pairs = brand_basket_pairs(spark, sf_dir).localCheckpoint(eager=True)
    edges = pairs.select("brand_a", "brand_b", F.col("n_orders").alias("w"))
    labels = lpa_communities(
        pairs, src="brand_a", dst="brand_b", weight="n_orders", iters=4
    ).select(F.col("vertex"), F.col("community"))
    la = labels.select(
        F.col("vertex").alias("brand_a"), F.col("community").alias("ca")
    )
    lb = labels.select(
        F.col("vertex").alias("brand_b"), F.col("community").alias("cb")
    )
    e = edges.join(la, "brand_a").join(lb, "brand_b")
    big_w = edges.agg(F.sum("w").alias("bw"))
    w_in = (
        e.where(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.sum("w").alias("w_in"))
    )
    deg = (
        edges.select(F.col("brand_a").alias("v"), "w")
        .unionByName(edges.select(F.col("brand_b").alias("v"), "w"))
        .groupBy("v")
        .agg(F.sum("w").alias("d"))
        .join(labels, F.col("v") == F.col("vertex"))
        .groupBy("community")
        .agg(F.sum("d").alias("deg_c"), F.count("*").alias("n_brands"))
    )
    j = deg.join(w_in, "community", "left").crossJoin(F.broadcast(big_w))
    q_c = F.coalesce(F.col("w_in"), F.lit(0)).cast("double") / F.col("bw").cast(
        "double"
    ) - (
        F.col("deg_c").cast("double") / (2.0 * F.col("bw").cast("double"))
    ) * (
        F.col("deg_c").cast("double") / (2.0 * F.col("bw").cast("double"))
    )
    per = j.select(
        "community",
        "n_brands",
        F.coalesce(F.col("w_in"), F.lit(0)).alias("w_in"),
        "deg_c",
        F.round(q_c * 1e6, 0).cast("long").alias("q_um"),
    )
    tot = per.agg(
        F.round(F.sum("q_um").cast("double") / 1e6, 6).alias("modularity_r")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "community",
        "n_brands",
        "w_in",
        "deg_c",
        F.round(F.col("q_um").cast("double") / 1e6, 6).alias("q_contrib_r"),
        "modularity_r",
    )


def _lpa_modularity_sql() -> str:
    return f"""
WITH labels AS MATERIALIZED ({BRAND_COMMUNITIES_LPA_SQL}),
edges AS MATERIALIZED (
  SELECT brand_a, brand_b, n_orders AS w FROM ({BRAND_BASKET_PAIRS_SQL})
),
bw AS (SELECT sum(w)::bigint AS bw FROM edges),
e AS (
  SELECT ed.w, la.community AS ca, lb.community AS cb
  FROM edges ed
  JOIN labels la ON ed.brand_a = la.vertex
  JOIN labels lb ON ed.brand_b = lb.vertex
),
w_in AS (
  SELECT ca AS community, sum(w)::bigint AS w_in FROM e WHERE ca = cb GROUP BY ca
),
deg AS (
  SELECT l.community, sum(d.d)::bigint AS deg_c, count(*)::bigint AS n_brands
  FROM (
    SELECT v, sum(w)::bigint AS d FROM (
      SELECT brand_a AS v, w FROM edges UNION ALL SELECT brand_b, w FROM edges
    ) GROUP BY v
  ) d JOIN labels l ON d.v = l.vertex
  GROUP BY l.community
),
per AS (
  SELECT deg.community, deg.n_brands, coalesce(w_in.w_in, 0)::bigint AS w_in,
         deg.deg_c,
         round((coalesce(w_in.w_in, 0)::double / bw.bw::double
                - (deg.deg_c::double / (2.0 * bw.bw::double))
                  * (deg.deg_c::double / (2.0 * bw.bw::double))) * 1e6, 0)::bigint
           AS q_um
  FROM deg LEFT JOIN w_in ON deg.community = w_in.community, bw
),
tot AS (SELECT round(sum(q_um)::double / 1e6, 6) AS modularity_r FROM per)
SELECT per.community, per.n_brands, per.w_in, per.deg_c,
       round(per.q_um::double / 1e6, 6) AS q_contrib_r, tot.modularity_r
FROM per, tot
"""


LPA_MODULARITY_SQL = _lpa_modularity_sql()
