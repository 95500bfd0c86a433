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

from hadoop_data_lake_spark.core.io import read_table
from hadoop_data_lake_spark.functions.fixedpoint import (
    avg_fixed,
    avg_fixed_sql,
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
