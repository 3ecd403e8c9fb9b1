"""TPC-H batch 2: Q4/Q7/Q8/Q9/Q13/Q17/Q22 shapes adapted to the fixture
schema (no partsupp table, no commit/receipt dates, no shipmode/phone
columns — each query notes its adaptation). Exercises EXISTS semi-joins,
multi-way nation-pair joins, conditional market-share ratios, left-join
histograms, correlated scalar subqueries against aggregates, and
anti-join + uncorrelated-subquery filters — all with exact-decimal money
math so value hashes match the DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import dec, t


@register(
    "q4_priority_exists",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape; the fixture has no commit/receipt dates, so the EXISTS
    predicate is 'any line shipped after the order date' (late shipment).
    Spark plans the EXISTS as a LEFT SEMI join — the scale-correct form
    (no duplicate explosion, no distinct)."""
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem")
    late = orders.join(
        li, (li.l_orderkey == orders.o_orderkey) & (li.l_shipdate > orders.o_orderdate), "left_semi"
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q7_nation_volume",
    oracle="""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: shipping volume between two nations by year. The two nation
    lookups broadcast; the disjunctive nation-pair predicate is applied
    AFTER both joins (it references both sides)."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    volume = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.sum(volume).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    oracle="""
WITH all_sales AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS volume,
         sn.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region   ON cn.n_regionkey = r_regionkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
)
SELECT o_year,
       CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
            / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
FROM all_sales
GROUP BY o_year
ORDER BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: one nation's share of PROMO-part revenue into ASIA customers by
    order year. Share = exact-decimal conditional sum / exact-decimal total,
    divided in double identically on both engines. Dimension tables
    (part-filtered, nation, region) broadcast; only lineitem-orders shuffles."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    volume = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    zero = F.lit(0).cast("decimal(12,2)")
    sales = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    share = (
        F.sum(F.when(F.col("supp_nation") == "NATION_2", F.col("volume")).otherwise(zero)).cast("double")
        / F.sum("volume").cast("double")
    ).cast("double")
    return sales.groupBy("o_year").agg(share.alias("mkt_share")).orderBy("o_year")


@register(
    "q9_profit_by_nation_year",
    oracle="""
SELECT sn.n_name AS nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
                - CAST(ROUND(p_retailprice * 0.6, 2) AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS profit
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY nation, o_year
ORDER BY nation, o_year
""",
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape; the fixture has no partsupp, so supply cost is synthesized
    as 60% of p_retailprice (rounded to cents BEFORE the decimal cast, so
    both engines aggregate identical exact values)."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    sn = nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation"))
    cost = F.round(F.col("p_retailprice") * 0.6, 2).cast("decimal(12,2)")
    profit = dec("l_extendedprice") * (F.lit(1) - dec("l_discount")) - cost * dec("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("profit"))
        .orderBy("nation", "o_year")
    )


@register(
    "q13_order_count_distribution",
    oracle="""
WITH co AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM co
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: two-level aggregation — orders per customer (LEFT join keeps
    order-less customers at count 0), then the histogram of those counts.
    COUNT(o_orderkey) (not COUNT(*)) so the no-match rows count as 0."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l2.l_quantity))
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue lost to small orders. The correlated scalar subquery
    (per-part average quantity) becomes an explicit pre-aggregation joined
    back — the form Spark's subquery decorrelation would produce, stated
    directly so the per-part agg is computed ONCE, not per row. The average
    uses the exact-decimal-numerator idiom on both sides."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_q = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.sum(dec("l_quantity")).cast("double") / F.count("l_quantity")).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_q, li.l_partkey == avg_q.ap_key)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((F.sum(dec("l_extendedprice")).cast("double") / 7.0).cast("double").alias("avg_yearly"))
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(c_acctbal) AS a
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey AS cntry, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1997-06-01 00:00:00')
GROUP BY cntry
ORDER BY cntry
""",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape; the fixture has no phone column, so the 'country code' is
    c_nationkey, and since every fixture customer has SOME order, 'never
    ordered' becomes 'dormant: no order in the final year of data' — same
    plan shape (filtered LEFT ANTI join), non-vacuous result. The
    positive-balance average is an uncorrelated scalar subquery, broadcast
    as a 1-row crossJoin."""
    cust = t(spark, sf_dir, "customer")
    recent = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-06-01 00:00:00").cast("timestamp")
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg((F.sum(dec("c_acctbal")).cast("double") / F.count("c_acctbal")).alias("a"))
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("cntry")
    )


@register(
    "lateral_topn_orders",
    oracle="""
SELECT c_custkey, o.o_orderkey, o.o_totalprice
FROM customer, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3
) o
WHERE c_custkey < 200
ORDER BY c_custkey, o_totalprice DESC, o_orderkey
""",
)
def lateral_topn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery through Spark SQL: top-3 orders per
    customer as a lateral per-row subquery. Catalyst decorrelates this into
    the same per-group window top-k a DataFrame user would write — the
    point is the SQL surface parity, checked against DuckDB's LATERAL."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 3
        ) o
        WHERE c_custkey < 200
        ORDER BY c_custkey, o_totalprice DESC, o_orderkey
        """
    )


@register(
    "nullsafe_join_counts",
    oracle="""
WITH c AS (SELECT NULLIF(c_nationkey % 5, 4) AS grp, c_custkey FROM customer),
     s AS (SELECT NULLIF(s_nationkey % 5, 4) AS grp, s_suppkey FROM supplier)
SELECT c.grp, COUNT(*) AS n_pairs
FROM c JOIN s ON c.grp IS NOT DISTINCT FROM s.grp
GROUP BY c.grp
ORDER BY c.grp NULLS FIRST
""",
)
def nullsafe_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys MATCH
    each other instead of vanishing — the semantics needed when a grouping
    key legitimately contains 'unknown'. Spark hash-partitions null-safe
    keys like any other value (nulls all land in one partition — a skew
    hazard at scale if 'unknown' dominates, same cure as any hot key)."""
    cust = t(spark, sf_dir, "customer").select(
        F.nullif(F.col("c_nationkey") % 5, F.lit(4)).alias("cgrp"), "c_custkey"
    )
    supp = t(spark, sf_dir, "supplier").select(
        F.nullif(F.col("s_nationkey") % 5, F.lit(4)).alias("sgrp"), "s_suppkey"
    )
    return (
        cust.join(supp, cust.cgrp.eqNullSafe(supp.sgrp))
        .groupBy(F.col("cgrp").alias("grp"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy(F.col("grp").asc_nulls_first())
    )
