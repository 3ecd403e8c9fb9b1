"""Second relational batch: TPC-H-shaped multi-join aggregates, subqueries,
pivot/unpivot, grouping sets, array/higher-order functions, and exact
cross-engine statistics (SURVEY §2B MODEL/EXT rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import dec, dsum, t
from mapreducefw_spark.sources.tables import TABLES


def _views(spark: SparkSession, sf_dir: str, names: list[str]) -> None:
    for n in names:
        t(spark, sf_dir, n).createOrReplaceTempView(n)


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(dec("l_extendedprice") * dec("l_discount")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q10_returned_revenue",
    oracle="""
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = t(spark, sf_dir, "nation")
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_share",
    oracle="""
SELECT CAST(SUM(CASE WHEN p_name LIKE '%widget%' OR p_name LIKE '%gizmo%'
                     THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
                     ELSE 0 END) AS DOUBLE) AS promo_revenue,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
""",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part")
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    promo = F.col("p_name").contains("widget") | F.col("p_name").contains("gizmo")
    zero = F.lit(0).cast("decimal(12,2)") * F.lit(0).cast("decimal(12,2)")
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        F.sum(F.when(promo, rev).otherwise(zero)).cast("double").alias("promo_revenue"),
        F.sum(rev).cast("double").alias("total_revenue"),
    )


@register(
    "q18_large_orders",
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderkey, o_custkey
HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 180
ORDER BY total_qty DESC, o_orderkey
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.sum(dec("l_quantity")).alias("_q"))
        .filter(F.col("_q") > 180)
        .select("o_orderkey", "o_custkey", F.col("_q").cast("double").alias("total_qty"))
        .orderBy(F.desc("total_qty"), "o_orderkey")
    )


@register(
    "q19_disjunctive_pushdown",
    oracle="""
SELECT COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_type = 'ECONOMY' AND l_quantity >= 40)
""",
)
def q19_disjunctive_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_type") == "ECONOMY") & (F.col("l_quantity") >= 40))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_extendedprice", "total"))
    )


# --------------------------------------------------------------------------
# Subqueries (correlated + uncorrelated) via the SQL surface.
# --------------------------------------------------------------------------


@register(
    "subquery_correlated_max",
    oracle="""
SELECT c_custkey,
       (SELECT MAX(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_order
FROM customer
WHERE c_custkey < 300
ORDER BY c_custkey
""",
)
def subquery_correlated_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c_custkey,
               (SELECT MAX(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_order
        FROM customer
        WHERE c_custkey < 300
        ORDER BY c_custkey
        """
    )


@register(
    "subquery_above_avg_orders",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) * 1.5 FROM orders)
  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
ORDER BY o_orderkey
""",
)
def subquery_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) * 1.5 FROM orders)
          AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
        ORDER BY o_orderkey
        """
    )


@register(
    "grouping_sets_explicit",
    oracle="""
SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
       GROUPING(c_mktsegment) + 2 * GROUPING(c_nationkey) AS gid
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
ORDER BY gid, c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST
""",
)
def grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, ["customer"])
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
               GROUPING(c_mktsegment) + 2 * GROUPING(c_nationkey) AS gid
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        ORDER BY gid, c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST
        """
    )


# --------------------------------------------------------------------------
# Pivot / unpivot.
# --------------------------------------------------------------------------


@register(
    "pivot_flag_status",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_O,
       CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_F
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def pivot_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec("l_quantity")).cast("double"))
        .withColumnsRenamed({"O": "qty_O", "F": "qty_F"})
        .orderBy("l_returnflag")
    )


@register(
    "unpivot_supplier_metrics",
    oracle="""
SELECT s_suppkey, 'acctbal' AS metric, s_acctbal AS value FROM supplier
UNION ALL
SELECT s_suppkey, 'nationkey' AS metric, CAST(s_nationkey AS DOUBLE) AS value FROM supplier
ORDER BY s_suppkey, metric
""",
)
def unpivot_supplier_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = t(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_acctbal").alias("acctbal"), F.col("s_nationkey").cast("double").alias("nationkey")
    )
    return supp.unpivot("s_suppkey", ["acctbal", "nationkey"], "metric", "value").orderBy(
        "s_suppkey", "metric"
    )


# --------------------------------------------------------------------------
# Array / higher-order functions; deterministic string-joined output.
# --------------------------------------------------------------------------


@register(
    "array_agg_order_parts",
    oracle="""
SELECT l_orderkey,
       array_to_string(list_sort(list(l_partkey)), ',') AS parts_csv,
       LEN(list(l_partkey)) AS n_parts
FROM lineitem
WHERE l_orderkey < 200
GROUP BY l_orderkey
ORDER BY l_orderkey
""",
)
def array_agg_order_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("l_partkey")), ",").alias("parts_csv"),
            F.count(F.lit(1)).alias("n_parts"),
        )
        .orderBy("l_orderkey")
    )


@register(
    "higher_order_token_fns",
    oracle="""
SELECT doc_id,
       LEN(list_filter(string_split(text, ' '), x -> LENGTH(x) > 4)) AS n_long,
       array_to_string(list_transform(string_split(text, ' ')[1:5], x -> UPPER(x)), ' ') AS head_upper,
       LEN(list_distinct(list_transform(string_split(text, ' '), x -> LENGTH(x)))) AS n_len_classes
FROM documents
WHERE doc_id < 100
ORDER BY doc_id
""",
)
def higher_order_token_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform / filter / slice over token arrays — all JVM higher-order fns."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).alias("n_long"),
        F.array_join(F.transform(F.slice(toks, 1, 5), lambda x: F.upper(x)), " ").alias("head_upper"),
        F.size(F.array_distinct(F.transform(toks, lambda x: F.length(x)))).alias("n_len_classes"),
    ).orderBy("doc_id")


@register(
    "string_agg_nation_names",
    oracle="""
SELECT n_regionkey, string_agg(n_name, '|' ORDER BY n_name) AS names
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
""",
)
def string_agg_nation_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = t(spark, sf_dir, "nation")
    return (
        nation.groupBy("n_regionkey")
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias("names"))
        .orderBy("n_regionkey")
    )


# --------------------------------------------------------------------------
# Exact cross-engine statistics from decimal sums.
# --------------------------------------------------------------------------


@register(
    "stats_corr_qty_price",
    oracle="""
WITH s AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
  FROM lineitem
)
SELECT n,
       ROUND((n * sxy - sx * sy) / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 10) AS corr_qty_price,
       ROUND((n * sxy - sx * sy) / (CAST(n AS DOUBLE) * n), 10) AS covar_pop
FROM s
""",
)
def stats_corr_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation / covariance from exact decimal sums — identical
    formula both engines (native corr() differs in float low bits)."""
    li = t(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("l_quantity")).cast("double").alias("sx"),
        F.sum(dec("l_extendedprice")).cast("double").alias("sy"),
        F.sum(dec("l_quantity") * dec("l_quantity")).cast("double").alias("sxx"),
        F.sum(dec("l_extendedprice") * dec("l_extendedprice")).cast("double").alias("syy"),
        F.sum(dec("l_quantity") * dec("l_extendedprice")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    # round(10): n*sxy - sx*sy cancels ~1e18-magnitude products, so a 1-ulp
    # FMA difference between engines surfaces in the last digit at larger sf
    corr = F.round(
        (n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)), 10
    )
    covar = F.round((n * sxy - sx * sy) / (n.cast("double") * n), 10)
    return agg.select("n", corr.alias("corr_qty_price"), covar.alias("covar_pop"))


@register("percentile_approx_prices")  # sketch-based: engine-specific, rows-only
def percentile_approx_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quartiles (KLL-style sketch — the 100 TB percentile path).

    Scalar q25/q50/q75 columns, not one array column: the driver's
    canonicalizer sorts rows with pandas and dies on list cells
    (CORRECTNESS_r01.json err), and scalar outputs are what downstream
    consumers want anyway."""
    li = t(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.75], 10000).alias("qs")
    )
    return q.select(
        "l_returnflag",
        F.element_at("qs", 1).alias("q25"),
        F.element_at("qs", 2).alias("q50"),
        F.element_at("qs", 3).alias("q75"),
    ).orderBy("l_returnflag")


@register(
    "range_generator_source",
    oracle="""
SELECT CAST(SUM(i) AS BIGINT) AS total,
       CAST(SUM(CASE WHEN i % 7 = 0 THEN i END) AS BIGINT) AS total_sevens,
       COUNT(*) AS n
FROM (SELECT UNNEST(range(0, 100000)) AS i)
""",
)
def range_generator_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic range source (spark.range) — partition-parallel generation."""
    from mapreducefw_spark.session import tune_session

    tune_session(spark)
    r = spark.range(0, 100000).withColumnRenamed("id", "i")
    return r.agg(
        F.sum("i").cast("bigint").alias("total"),
        F.sum(F.when(F.col("i") % 7 == 0, F.col("i"))).cast("bigint").alias("total_sevens"),
        F.count(F.lit(1)).alias("n"),
    )
