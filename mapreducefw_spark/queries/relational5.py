"""Fifth batch: exact percentiles, conditional aggregates, and z-score
anomaly detection over the events stream (exact-decimal moments)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import dec, t


@register(
    "median_exact_prices",
    oracle="""
SELECT l_returnflag,
       MEDIAN(l_extendedprice) AS med_price,
       quantile_cont(l_extendedprice, 0.25) AS q1_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def median_exact_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation) — both engines interpolate
    (a + (b-a)*frac) over the sorted values, bit-identical on doubles."""
    from mapreducefw_spark.operators.textprep import ensure_parallelism

    # exact percentile buffers every value in its partial aggregate; on
    # the unsplittable single-row-group fixture that partial build ran on
    # 3 tasks (r13 stage probe: 1.9s scan stage) — spread the scan so the
    # per-partition buffers build on all cores. Percentile merges count
    # maps, so partitioning cannot change the result.
    li = ensure_parallelism(t(spark, sf_dir, "lineitem"))
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", F.lit(0.5)).alias("med_price"),
            F.percentile("l_extendedprice", F.lit(0.25)).alias("q1_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "conditional_aggregates",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) FILTER (WHERE o_totalprice > 30000) AS n_big,
       BOOL_OR(o_orderpriority = '1-URGENT') AS any_urgent,
       BOOL_AND(o_totalprice > 0) AS all_positive,
       MIN(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END) AS min_low_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def conditional_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count_if(F.col("o_totalprice") > 30000).alias("n_big"),
            F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
            F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
            F.min(F.when(F.col("o_orderpriority") == "5-LOW", F.col("o_totalprice"))).alias(
                "min_low_price"
            ),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "events_zscore_anomalies",
    oracle="""
WITH stats AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s2
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
       ROUND((e.value - s.s1 / s.n)
             / SQRT(NULLIF(GREATEST(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n), 0), 0)), 4) AS zscore
FROM events e JOIN stats s ON e.event_type = s.event_type
WHERE ABS((e.value - s.s1 / s.n)
          / SQRT(NULLIF(GREATEST(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n), 0), 0))) > 3
ORDER BY e.event_id
""",
)
def events_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier detection: per-type z-score from exact decimal moments, then a
    broadcast join of the tiny stats table back onto the stream."""
    ev = t(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("value")).cast("double").alias("s1"),
        F.sum(dec("value") * dec("value")).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    # zero/negative variance (single-event or constant-valued type) must
    # yield NULL, not a divide-by-zero: ANSI Spark errors on x/0 and DuckDB
    # errors on SQRT(<0), so BOTH sides NULL the std via the same guard —
    # zero-variance groups have no outliers by definition
    var = F.col("s2") / F.col("n") - mean * mean
    std = F.sqrt(F.when(var > 0, var))
    z = (F.col("value") - mean) / std
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 3)
        .select("event_id", "event_type", "value", F.round(z, 4).alias("zscore"))
        .orderBy("event_id")
    )
