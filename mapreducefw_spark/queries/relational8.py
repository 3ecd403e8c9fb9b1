"""TPC-H batch 3: Q2/Q11/Q12/Q15/Q16/Q20/Q21 shapes — completes all 22
TPC-H query shapes in the registry (batch 1: relational.py q1/q3/q5/q6/q10/
q14/q18/q19; batch 2: relational7.py q4/q7/q8/q9/q13/q17/q22).

The fixture has no partsupp table and no commit/receipt dates, ship modes,
phones, or comments, so each query states its adaptation. The common stand-in:
the DISTINCT (l_partkey, l_suppkey) pairs of lineitem act as the part-supplier
catalog, with per-pair supply cost/quantity synthesized from lineitem
aggregates (order-independent MIN/exact-decimal SUM, so both engines compute
bit-identical values). Shapes exercised: min-over-group correlated selection
(Q2), HAVING against a global scalar aggregate (Q11), conditional counts by
category (Q12), aggregate-of-aggregate max selection (Q15), distinct-count
with NOT-IN exclusion (Q16), nested semi-join with a fractional-sum threshold
(Q20), and the multi-EXISTS "sole late supplier" pattern (Q21).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import dec, t


@register(
    "q2_min_cost_supplier",
    oracle="""
WITH costs AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey, MIN(l_extendedprice) AS cost
  FROM lineitem GROUP BY 1, 2
),
eur AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost
FROM part
JOIN costs ON p_partkey = partkey
JOIN eur ON suppkey = s_suppkey
WHERE p_size = 15 AND p_type = 'SMALL'
  AND cost = (SELECT MIN(c2.cost) FROM costs c2 JOIN eur e2 ON c2.suppkey = e2.s_suppkey
              WHERE c2.partkey = p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: cheapest EUROPE supplier for each size-15 SMALL part. No
    partsupp in the fixture, so supply cost per (part, supplier) is
    MIN(l_extendedprice) over their lineitems — MIN of doubles is
    order-independent, so both engines agree exactly. The correlated
    min-cost subquery becomes a per-part min pre-aggregation joined back
    (what Catalyst's decorrelation produces); the order key
    (s_acctbal DESC, n_name, s_name, p_partkey) is a total order, so the
    LIMIT is deterministic."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL")
    )
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    costs = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min("l_extendedprice").alias("cost"))
    eur = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eur_costs = costs.join(eur, costs.suppkey == eur.s_suppkey)
    min_cost = eur_costs.groupBy(F.col("partkey").alias("mc_key")).agg(
        F.min("cost").alias("min_cost")
    )
    return (
        eur_costs.join(F.broadcast(part), F.col("partkey") == part.p_partkey)
        .join(min_cost, F.col("partkey") == F.col("mc_key"))
        .filter(F.col("cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q11_important_stock",
    oracle="""
WITH value_by_part AS (
  SELECT l_partkey AS partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS val
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY 1
)
SELECT partkey, CAST(val AS DOUBLE) AS part_value
FROM value_by_part,
     (SELECT CAST(SUM(val) AS DOUBLE) / COUNT(val) AS avg_val FROM value_by_part) g
WHERE CAST(val AS DOUBLE) > 2.0 * avg_val
ORDER BY part_value DESC, partkey
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose NATION_3-supplied value far exceeds the
    nation's average part value — GROUP BY + HAVING against a global scalar
    aggregate. The threshold is data-relative (2x the average) rather than
    the original's fixed fraction of the total, because the fixed fraction
    is scale-dependent (TPC-H itself divides it by SF; a static oracle
    string can't) — the plan shape is identical. The global average is a
    1-row broadcast crossJoin (never a shuffle of the grouped side); value
    sums are exact decimal, the compare runs in double on identical inputs
    in both engines."""
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    value_by_part = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(dec("l_extendedprice")).alias("val"))
    )
    avg_val = value_by_part.agg(
        (F.sum("val").cast("double") / F.count("val")).alias("avg_val")
    )
    return (
        value_by_part.crossJoin(F.broadcast(avg_val))
        .filter(F.col("val").cast("double") > 2.0 * F.col("avg_val"))
        .select("partkey", F.col("val").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "partkey")
    )


@register(
    "q12_priority_by_returnflag",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: lines shipped in 1996 bucketed by category with
    high/low-priority conditional counts. The fixture has no l_shipmode, so
    the category is l_returnflag — same plan: date-bounded scan (pushed to
    parquet), one join, CASE-conditional aggregation."""
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY 1
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
ORDER BY s_suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with the maximum quarterly revenue — an aggregate of
    an aggregate (the view + MAX scalar subquery of the original). Revenue
    stays DECIMAL through the max-equality compare, so cross-engine equality
    is exact (a double compare could drop a legitimate tie); the cast to
    double happens only at output. The 1-row max broadcasts."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    supp = t(spark, sf_dir, "supplier")
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(rev).alias("total_rev")
    )
    max_rev = revenue.agg(F.max("total_rev").alias("max_rev"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_count_by_part",
    oracle="""
WITH ps AS (SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey FROM lineitem)
SELECT p_brand, p_type, p_size, COUNT(DISTINCT suppkey) AS supplier_cnt
FROM ps JOIN part ON partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: how many suppliers can serve each (brand, type, size)
    bucket, excluding a supplier denylist. DISTINCT lineitem pairs stand in
    for partsupp; 'customer complaints' becomes negative account balance.
    The NOT IN is a LEFT ANTI join (the denylist has no NULL keys, so
    NOT IN == anti-join on both engines); part filters broadcast."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0.0).select("s_suppkey")
    ps = li.select(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).distinct()
    return (
        ps.join(F.broadcast(part), F.col("partkey") == part.p_partkey)
        .join(F.broadcast(bad), F.col("suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_dominant_blue_suppliers",
    oracle="""
WITH blue_1996 AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%blue%'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY 1, 2
),
part_total AS (
  SELECT partkey, SUM(qty) AS total_qty FROM blue_1996 GROUP BY 1
)
SELECT DISTINCT s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (
    SELECT g.suppkey FROM blue_1996 g JOIN part_total pt ON g.partkey = pt.partkey
    WHERE CAST(g.qty AS DOUBLE) > 0.25 * CAST(pt.total_qty AS DOUBLE))
ORDER BY s_name
""",
)
def q20_dominant_blue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: EUROPE suppliers who dominate the 1996 supply of some
    'blue' part (the fixture's part names have no 'green'; 'blue' plays the
    original's 'forest' LIKE pattern) — the nested subquery chain with a
    fractional-sum threshold (the original's ps_availqty > 0.5 * sum(qty)): per-(part, supplier)
    quantity vs 0.25x the part's total, then a semi-join into supplier.
    Quantities are exact decimal; the fraction compare runs in double on
    identical inputs. Both aggregations reuse the (partkey, suppkey) shuffle
    partitioning — the part-total rollup shuffles only the small grouped
    frame."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%blue%"))
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    blue = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey"))
        .agg(F.sum(dec("l_quantity")).alias("qty"))
    )
    part_total = blue.groupBy(F.col("partkey").alias("pt_key")).agg(
        F.sum("qty").alias("total_qty")
    )
    dominant = (
        blue.join(part_total, F.col("partkey") == F.col("pt_key"))
        .filter(F.col("qty").cast("double") > 0.25 * F.col("total_qty").cast("double"))
        .select("suppkey")
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(dominant, supp.s_suppkey == F.col("suppkey"), "left_semi")
        .select("s_name")
        .distinct()
        .orderBy("s_name")
    )


@register(
    "q21_sole_late_supplier",
    oracle="""
WITH per_order AS (
  SELECT l_orderkey AS okey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         MAX(l_shipdate) AS max_ship
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1
),
late AS (
  SELECT DISTINCT l.l_orderkey AS okey, l.l_suppkey AS skey
  FROM lineitem l JOIN per_order p
    ON l.l_orderkey = p.okey AND l.l_shipdate = p.max_ship
),
sole AS (
  SELECT late.okey, MIN(skey) AS skey
  FROM late JOIN per_order USING (okey)
  WHERE n_supp > 1
  GROUP BY 1
  HAVING COUNT(*) = 1
)
SELECT s_name, COUNT(*) AS numwait
FROM sole JOIN supplier ON skey = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape ("suppliers who kept orders waiting"): in finished
    multi-supplier orders, the supplier who alone shipped last. No
    commit/receipt dates in the fixture, so "late" = shipped on the order's
    max ship date; EXISTS (another supplier on the order) and NOT EXISTS
    (another equally-late supplier) become the n_supp > 1 and
    sole-max-shipper conditions of the decorrelated aggregate form —
    computed as per-order aggregates + one join back, not per-row
    subqueries. (s_name, numwait) is a total order, so the LIMIT is
    deterministic."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = t(spark, sf_dir, "lineitem")
    fin = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    per_order = fin.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.max("l_shipdate").alias("max_ship"),
    )
    late = (
        fin.join(
            per_order,
            (fin.l_orderkey == per_order.okey) & (fin.l_shipdate == per_order.max_ship),
        )
        .filter(F.col("n_supp") > 1)
        .select("okey", F.col("l_suppkey").alias("skey"))
        .distinct()
    )
    sole = (
        late.groupBy("okey")
        .agg(F.min("skey").alias("skey"), F.count(F.lit(1)).alias("n_late"))
        .filter(F.col("n_late") == 1)
    )
    supp = t(spark, sf_dir, "supplier")
    return (
        sole.join(supp, sole.skey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
