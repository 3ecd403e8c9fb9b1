"""Thirteenth batch (round 5, continued session): graph structure metrics.

``copurchase_triangles`` — per-node triangle counts and local clustering
coefficients over the (bounded) part co-purchase graph: the standard
cohesion metric for recommendation graphs, and the canonical example of a
multi-way self-join the engine must plan as two bounded equi-joins rather
than anything quadratic.

The distributed shape (node-iterator / MapReduce triangle counting,
Suri & Vassilvitskii's shape): orient every edge low->high, join ordered
edges on the middle vertex to enumerate wedges (a<b<c paths), then
semi-verify the closing (a, c) edge with a third equi-join — wedge count
is sum(deg^2) bounded, never n^2, and at 100 TB the classic refinement
(orient by degree instead of id) bounds wedges by arboricity. Counts and
degrees are integers; the coefficient is one division of identical
operands — deterministic with no rounding.

Semantic contract: chained shuffle-group-reduce
(``/root/reference/MRFCore.cpp:252-446``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t

TRI_MAX_KEY = 1000  # bounded slice keeps the 3-way-join oracle affordable


@register(
    "copurchase_triangles",
    oracle=f"""
WITH e AS (
  SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS x,
                  GREATEST(a.l_partkey, b.l_partkey) AS y
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  WHERE a.l_partkey < {TRI_MAX_KEY} AND b.l_partkey < {TRI_MAX_KEY}
    AND a.l_partkey IS NOT NULL AND b.l_partkey IS NOT NULL
),
deg AS (
  SELECT node, COUNT(*) AS degree FROM (
    SELECT x AS node FROM e UNION ALL SELECT y FROM e
  ) GROUP BY node
),
tri AS (
  SELECT e1.x AS a, e1.y AS b, e2.y AS c
  FROM e e1 JOIN e e2 ON e1.y = e2.x JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y
),
tn AS (
  SELECT node, COUNT(*) AS n_triangles FROM (
    SELECT a AS node FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
  ) GROUP BY node
)
SELECT d.node, CAST(d.degree AS BIGINT) AS degree,
       CAST(COALESCE(tn.n_triangles, 0) AS BIGINT) AS n_triangles,
       CASE WHEN d.degree >= 2
            THEN COALESCE(tn.n_triangles, 0)
                 / (d.degree * (d.degree - 1) / 2.0) END AS clustering_coeff
FROM deg d LEFT JOIN tn USING (node)
ORDER BY node
""",
)
def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangles + local clustering coefficient on the bounded
    co-purchase graph. Wedges come from one ordered-edge self-join on the
    middle vertex; the closing edge is a second equi-join — both shuffles
    keyed and bounded, no cartesian anywhere. Degree-1 nodes report NULL
    coefficient on both engines (no wedge to close)."""
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_partkey") < TRI_MAX_KEY) & F.col("l_partkey").isNotNull()
        )
        .select("l_orderkey", "l_partkey")
    )
    p1 = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u"))
    p2 = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("v"))
    e = (
        p1.join(p2, "k")
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("x"), F.greatest("u", "v").alias("y")
        )
        .distinct()
        .localCheckpoint(eager=False)  # three consumers: deg + both wedge legs
    )
    deg = (
        e.select(F.col("x").alias("node"))
        .unionAll(e.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    wedges = (
        e.select(F.col("x").alias("a"), F.col("y").alias("b"))
        .join(e.select(F.col("x").alias("b"), F.col("y").alias("c")), "b")
    )
    tri = wedges.join(
        e.select(F.col("x").alias("a"), F.col("y").alias("c")), ["a", "c"]
    )
    tn = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    joined = deg.join(tn, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
    )
    coeff = F.when(
        F.col("degree") >= 2,
        F.col("n_triangles") / (F.col("degree") * (F.col("degree") - 1) / 2.0),
    )
    return joined.select(
        "node", "degree", "n_triangles", coeff.alias("clustering_coeff")
    ).orderBy("node")


SKY_MAX_CUST = 300


@register(
    "pareto_orders_skyline",
    oracle=f"""
WITH s AS (
  SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
  WHERE o_custkey < {SKY_MAX_CUST}
    AND o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
)
SELECT a.o_orderkey, a.o_totalprice, a.o_orderdate
FROM s a
WHERE NOT EXISTS (
  SELECT 1 FROM s b
  WHERE b.o_totalprice <= a.o_totalprice AND b.o_orderdate >= a.o_orderdate
    AND (b.o_totalprice < a.o_totalprice OR b.o_orderdate > a.o_orderdate)
)
ORDER BY o_totalprice, o_orderkey
""",
)
def pareto_orders_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline of orders on (minimize price, maximize recency) — the Pareto
    set no other order beats on both axes (operators/skyline.py). The
    engine form is prefix arithmetic over the distinct-price frame in the
    two-phase range-partition shape (no unpartitioned window, nothing
    quadratic); the oracle is the textbook NOT-EXISTS dominance predicate
    on a bounded customer slice — the small-data twin the operator
    replaces."""
    from mapreducefw_spark.operators.skyline import skyline_2d

    orders = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < SKY_MAX_CUST)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )
    return skyline_2d(orders, "o_totalprice", "o_orderdate").orderBy(
        "o_totalprice", "o_orderkey"
    )


@register(
    "rolling_weekly_active_users",
    oracle="""
WITH daily AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS d
  FROM events WHERE user_id IS NOT NULL
),
bounds AS (SELECT MAX(d) AS mx FROM daily),
contrib AS (
  SELECT user_id,
         unnest(generate_series(d, d + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS day
  FROM daily
),
wau AS (SELECT day, COUNT(DISTINCT user_id) AS wau FROM contrib GROUP BY day),
dau AS (SELECT d AS day, COUNT(*) AS dau FROM daily GROUP BY d)
SELECT w.day, CAST(COALESCE(dau.dau, 0) AS BIGINT) AS dau,
       CAST(w.wau AS BIGINT) AS wau
FROM wau w LEFT JOIN dau USING (day) CROSS JOIN bounds
WHERE w.day <= bounds.mx
ORDER BY day
""",
)
def rolling_weekly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DAU + trailing-7-day WAU per day — the engagement report whose
    naive form is a distinct-count over a sliding window (not something a
    window function can do exactly). The scalable shape: dedupe to daily
    actives FIRST (the only events-sized pass, map-side combinable), then
    each (user, day) contributes to the 7 window-end days via a bounded
    explode — 7x the daily-actives frame, independent of raw event volume —
    and one (day, user) distinct-count shuffle. Trailing windows ending
    past the last observed day are clipped (broadcast 1-row bound). The
    approximate path at extreme cardinality is the mergeable-HLL rollup
    (hll_mergeable_distinct); this is the exact twin."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    daily = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct()
    bounds = daily.agg(F.max("d").alias("mx"))
    contrib = daily.select(
        "user_id",
        F.explode(
            F.sequence("d", F.col("d") + F.expr("interval 6 days"), F.expr("interval 1 day"))
        ).alias("day"),
    )
    wau = contrib.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    dau = daily.groupBy(F.col("d").alias("day")).agg(
        F.count(F.lit(1)).alias("dau")
    )
    return (
        wau.join(dau, "day", "left")
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("day") <= F.col("mx"))
        .select(
            "day",
            F.coalesce(F.col("dau"), F.lit(0)).cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
        )
        .orderBy("day")
    )
