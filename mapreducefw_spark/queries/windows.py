"""Window-function surface (SURVEY §2B windows, §7 M3).

Every window spec uses a total ordering (explicit tiebreak column) so results
are deterministic and oracle-comparable. Frame sums use the exact-decimal
idiom from ``_util`` — engines disagree on float association inside sliding
frames (Spark incremental vs DuckDB segment tree) otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import dec, t


@register(
    "window_rank_customers",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal,
       ROW_NUMBER() OVER w AS rn,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       NTILE(4) OVER w AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
ORDER BY c_mktsegment, rn
""",
)
def window_rank_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        cust.select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("c_mktsegment", "rn")
    )


@register(
    "window_lag_lead_orders",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       LAG(o_totalprice) OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price,
       FIRST_VALUE(o_totalprice) OVER w AS first_price,
       o_totalprice - COALESCE(LAG(o_totalprice) OVER w, o_totalprice) AS delta
FROM orders
WHERE o_custkey < 200
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
""",
)
def window_lag_lead_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            prev.alias("prev_price"),
            F.lead("o_totalprice").over(w).alias("next_price"),
            F.first("o_totalprice").over(w).alias("first_price"),
            (F.col("o_totalprice") - F.coalesce(prev, F.col("o_totalprice"))).alias("delta"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_frames_running",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg3
FROM orders
WHERE o_custkey < 200
ORDER BY o_custkey, o_orderkey
""",
)
def window_frames_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    moving = w.rowsBetween(-2, W.currentRow)
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.sum(dec("o_totalprice")).over(running).cast("double").alias("running_spend"),
            (
                F.sum(dec("o_totalprice")).over(moving).cast("double")
                / F.count(F.lit(1)).over(moving)
            ).alias("moving_avg3"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_range_frame",
    oracle="""
SELECT s_nationkey, s_suppkey, s_acctbal,
       COUNT(*) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal
                      RANGE BETWEEN 500 PRECEDING AND CURRENT ROW) AS peers_within_500
FROM supplier
ORDER BY s_nationkey, s_suppkey
""",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = t(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy("s_acctbal").rangeBetween(-500, W.currentRow)
    return (
        supp.select(
            "s_nationkey",
            "s_suppkey",
            "s_acctbal",
            F.count(F.lit(1)).over(w).alias("peers_within_500"),
        )
        .orderBy("s_nationkey", "s_suppkey")
    )


@register(
    "topk_parts_per_brand",
    oracle="""
SELECT p_brand, p_partkey, p_retailprice, rn
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part
)
WHERE rn <= 3
ORDER BY p_brand, rn
""",
)
def topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k — the scalable form (no global sort, one shuffle on the
    group key; at 100 TB this beats orderBy+limit per group by construction)."""
    part = t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    return (
        part.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("p_brand", "rn")
    )
