"""Relational operator surface (SURVEY §2B MODEL/REF rows + §7 M0/M2).

Each query exercises one operator family end-to-end on the driver's tables
and is paired with a DuckDB oracle. Scale posture: filters are expressed
declaratively (parquet pushdown), small dimensions are broadcast explicitly,
fact-fact joins rely on shuffle hash/sort-merge + AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import davg, dec, dsum, t

# --------------------------------------------------------------------------
# M0 flagship: TPC-H Q1-shaped pricing summary (scan+filter+hash agg+sort).
# Reference pipeline shape: scan #1 -> Map/filter #3 -> shuffle #5 ->
# Reduce folds #7 -> global sort #10 (SURVEY §2A).
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    charge = disc_price * (F.lit(1) + dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Multi-way joins (M2): fact-fact shuffle joins + broadcast dimension joins.
# --------------------------------------------------------------------------


@register(
    "q3_top_revenue_orders",
    oracle="""
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle="""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-way join: broadcast the dimension chain, shuffle the facts."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    dims = F.broadcast(
        supp.join(
            F.broadcast(nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)),
            supp.s_nationkey == nation.n_nationkey,
        )
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(dims, (li.l_suppkey == dims.s_suppkey) & (cust.c_nationkey == dims.s_nationkey))
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "join_broadcast_nation_region",
    oracle="""
SELECT n_nationkey, n_name, r_name
FROM nation JOIN region ON n_regionkey = r_regionkey
ORDER BY n_nationkey
""",
)
def join_broadcast_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey", "n_name", "r_name")
        .orderBy("n_nationkey")
    )


@register(
    "join_left_outer_order_counts",
    oracle="""
SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
       CAST(SUM(CAST(COALESCE(o_totalprice, 0) AS DECIMAL(12,2))) AS DOUBLE) AS total_spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
ORDER BY c_custkey
""",
)
def join_left_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.sum(dec(F.coalesce(F.col("o_totalprice"), F.lit(0)))).cast("double").alias("total_spend"),
        )
        .orderBy("c_custkey")
    )


@register(
    "join_full_outer_nation_presence",
    oracle="""
WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey),
     s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey)
SELECT COALESCE(c.nk, s.nk) AS nationkey,
       COALESCE(n_cust, 0) AS n_cust,
       COALESCE(n_supp, 0) AS n_supp
FROM c FULL OUTER JOIN s ON c.nk = s.nk
ORDER BY nationkey
""",
)
def join_full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    supp = t(spark, sf_dir, "supplier").groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    return (
        cust.join(supp, "nk", "full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


@register(
    "join_semi_big_spenders",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 40000)
ORDER BY c_custkey
""",
)
def join_semi_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 40000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_anti_orderless_customers",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
""",
)
def join_anti_orderless_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "join_range_theta",
    oracle="""
SELECT p_partkey, p_name, p_retailprice
FROM part JOIN region ON p_size BETWEEN r_regionkey * 10 AND r_regionkey * 10 + 4
WHERE r_name = 'ASIA'
ORDER BY p_partkey
""",
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join; small side broadcast so it's a BNLJ, not a cross shuffle."""
    part = t(spark, sf_dir, "part")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cond = (F.col("p_size") >= F.col("r_regionkey") * 10) & (
        F.col("p_size") <= F.col("r_regionkey") * 10 + 4
    )
    return (
        part.join(F.broadcast(region), cond)
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# Filters / projection (REF #13, #14 generalized).
# --------------------------------------------------------------------------


@register(
    "filter_predicates",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 20
  AND l_returnflag IN ('A', 'R')
  AND NOT (l_discount < 0.02)
  AND l_shipdate IS NOT NULL
ORDER BY l_orderkey, l_linenumber
""",
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_quantity").between(10, 20)
            & F.col("l_returnflag").isin("A", "R")
            & ~(F.col("l_discount") < 0.02)
            & F.col("l_shipdate").isNotNull()
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "projection_rekey",
    oracle="""
SELECT p_name AS key, CAST(NULL AS VARCHAR) AS value
FROM part
WHERE p_name LIKE '%widget%'
ORDER BY key
""",
)
def projection_rekey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-client shape: substring filter then re-key value->key, NULL payload
    (reference ``SearchMRC.cpp:87,91``)."""
    part = t(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_name").contains("widget"))
        .select(F.col("p_name").alias("key"), F.lit(None).cast("string").alias("value"))
        .orderBy("key")
    )


# --------------------------------------------------------------------------
# Aggregation breadth (M2): stats, distinct, count-distinct.
# --------------------------------------------------------------------------


@register(
    "agg_supplier_stats",
    oracle="""
SELECT s_nationkey,
       COUNT(*) AS n_supp,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(s_acctbal) AS avg_bal,
       MIN(s_acctbal) AS min_bal,
       MAX(s_acctbal) AS max_bal,
       CASE WHEN COUNT(*) > 1 THEN
         SQRT(GREATEST(
           (CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2)) * CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE)
            - CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) * CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
           / (COUNT(*) - 1), 0))
       END AS std_bal
FROM supplier
GROUP BY s_nationkey
ORDER BY s_nationkey
""",
)
def agg_supplier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count/sum/avg/min/max/stddev. Stddev is computed from exact decimal
    sums with the same textbook formula on both engines — the engines' native
    streaming stddev implementations differ in low-order bits."""
    supp = t(spark, sf_dir, "supplier")
    s1 = F.sum(dec("s_acctbal")).cast("double")
    s2 = F.sum(dec("s_acctbal") * dec("s_acctbal")).cast("double")
    n = F.count(F.lit(1))
    var = (s2 - s1 * s1 / n) / (n - F.lit(1))
    return (
        supp.groupBy("s_nationkey")
        .agg(
            n.alias("n_supp"),
            s1.alias("sum_bal"),
            (s1 / F.count("s_acctbal")).alias("avg_bal"),
            F.min("s_acctbal").alias("min_bal"),
            F.max("s_acctbal").alias("max_bal"),
            F.when(n > 1, F.sqrt(F.greatest(var, F.lit(0.0)))).alias("std_bal"),
        )
        .orderBy("s_nationkey")
    )


@register(
    "distinct_segments",
    oracle="SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
)
def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "customer").select("c_mktsegment").distinct().orderBy("c_mktsegment")


@register(
    "count_distinct_parts",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def count_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
        .orderBy("l_returnflag")
    )


@register("approx_count_distinct_parts")  # HLL sketch: engine-specific, rows-only check
def approx_count_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"))
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Grouping sets / rollup / cube (M3).
# --------------------------------------------------------------------------


@register(
    "rollup_order_priority",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
)
def rollup_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "total"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "cube_lineitem_flags",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
)
def cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity", "qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


# --------------------------------------------------------------------------
# Set operations (REF #9 + MODEL rows).
# --------------------------------------------------------------------------


@register(
    "union_all_segments",
    oracle="""
SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
UNION ALL
SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 4000
ORDER BY c_custkey, c_mktsegment
""",
)
def union_all_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_mktsegment")
    b = cust.filter(F.col("c_acctbal") > 4000).select("c_custkey", "c_mktsegment")
    return a.unionAll(b).orderBy("c_custkey", "c_mktsegment")


@register(
    "intersect_nations",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
ORDER BY nationkey
""",
)
def intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp).orderBy("nationkey")


@register(
    "except_all_nations",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT ALL
SELECT s_nationkey FROM supplier
ORDER BY nationkey
""",
)
def except_all_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.exceptAll(supp).orderBy("nationkey")


# --------------------------------------------------------------------------
# Sort / limit / top-k (REF #10 generalized).
# --------------------------------------------------------------------------


@register(
    "topk_orders_global",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
)
def topk_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return orders.select("o_orderkey", "o_totalprice").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    ).limit(20)


@register(
    "sort_multikey_nulls",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders
WHERE o_orderkey < 1000
ORDER BY o_orderstatus DESC, o_totalprice ASC NULLS LAST, o_orderkey
""",
)
def sort_multikey_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") < 1000)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(
            F.col("o_orderstatus").desc(),
            F.col("o_totalprice").asc_nulls_last(),
            F.col("o_orderkey"),
        )
    )


# --------------------------------------------------------------------------
# Scalar function families (M2): string / date / math-conditional / JSON.
# --------------------------------------------------------------------------


@register(
    "string_functions",
    oracle="""
SELECT p_partkey,
       LOWER(p_name) AS lname,
       UPPER(p_brand) AS ubrand,
       LENGTH(p_name) AS name_len,
       SUBSTRING(p_name, 1, 3) AS pfx,
       CONCAT_WS(':', p_brand, p_type) AS brand_type,
       REPLACE(p_name, ' ', '_') AS snake,
       TRY_CAST(regexp_extract(p_brand, '(\\d+)', 1) AS INT) AS brand_num,
       LEN(string_split(p_name, ' ')) AS n_words
FROM part
WHERE p_partkey < 500
ORDER BY p_partkey
""",
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_partkey") < 500)
        .select(
            "p_partkey",
            F.lower("p_name").alias("lname"),
            F.upper("p_brand").alias("ubrand"),
            F.length("p_name").alias("name_len"),
            F.substring("p_name", 1, 3).alias("pfx"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
            F.regexp_replace("p_name", " ", "_").alias("snake"),
            F.regexp_extract("p_brand", r"(\d+)", 1).cast("int").alias("brand_num"),
            F.size(F.split("p_name", " ")).alias("n_words"),
        )
        .orderBy("p_partkey")
    )


@register(
    "date_functions",
    oracle="""
SELECT o_orderkey,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
       CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
       CAST(EXTRACT(day FROM o_orderdate) AS INT) AS dom,
       STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_start,
       DATEDIFF('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch_start,
       STRFTIME(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date
FROM orders
WHERE o_orderkey < 500
ORDER BY o_orderkey
""",
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") < 500)
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            F.dayofmonth("o_orderdate").alias("dom"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias(
                "days_since_epoch_start"
            ),
            F.date_format(
                F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), "yyyy-MM-dd"
            ).alias("due_date"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "math_conditional",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice / 100 AS price_hundreds,
       ABS(l_discount - 0.05) AS disc_dev,
       CAST(CEIL(l_quantity / 10) AS BIGINT) AS qty_decile,
       CAST(FLOOR(l_tax * 100) AS BIGINT) AS tax_pct,
       CASE WHEN l_quantity >= 40 THEN 'bulk'
            WHEN l_quantity >= 15 THEN 'mid'
            ELSE 'small' END AS qty_band
FROM lineitem
WHERE l_orderkey < 300
ORDER BY l_orderkey, l_linenumber
""",
)
def math_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") < 300)
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") / 100).alias("price_hundreds"),
            F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
            F.ceil(F.col("l_quantity") / 10).alias("qty_decile"),
            F.floor(F.col("l_tax") * 100).alias("tax_pct"),
            F.when(F.col("l_quantity") >= 40, "bulk")
            .when(F.col("l_quantity") >= 15, "mid")
            .otherwise("small")
            .alias("qty_band"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "json_extract_events",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(TRY_CAST(regexp_extract(props, '"k": ?"? *(-?\\d+) *"?\\s*[,}]', 1) AS INT)) AS BIGINT) AS sum_k,
       CAST(SUM(TRY_CAST(regexp_extract(props, '"k": ?"? *(-?\\d+) *"?\\s*[,}]', 1) AS INT)) AS DOUBLE) / COUNT(*) AS avg_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction (events.props); aggregation over the
    parsed value. try_cast + the oracle's anchored regexp: a non-integral
    k ('{"k": 1.5}') is NULL on both sides — a bare cast crashes under
    ANSI and a bare \\d+ regexp would match the integer prefix. A QUOTED
    integral ('{"k": "7"}', '{"k": " 7"}') is 7 on both sides: Spark's
    get_json_object unquotes and try_cast trims, so the oracle regexp
    accepts optional quotes/inner padding (ADVICE r6; fixture-pinned in
    tests/test_oracle_nulls_events.py)."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            (F.sum("k").cast("double") / F.count(F.lit(1))).alias("avg_k"),
        )
        .orderBy("event_type")
    )
