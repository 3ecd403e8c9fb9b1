"""Fourteenth batch (round 5, continued session): time-bar and feature
statistics.

- ``ohlc_hourly_bars`` — open/high/low/close/volume bars per (event_type,
  hour): the financial-style resample whose open/close are FIRST/LAST BY
  EVENT TIME, expressed as one map-side-combinable aggregate (Spark
  ``min_by/max_by`` against a (ts, event_id) struct == DuckDB's ordered
  ``first/last(value ORDER BY ts, event_id)``) — no window, no sort, one
  shuffle of O(groups) partial states.
- ``embedding_dim_stats`` — per-dimension mean/std across the corpus: the
  feature-scaling (standardization) fit. Components are cast to exact
  decimals before the moment sums, so mean and variance come out of
  identical operands on both engines — deterministic with no rounding.

Semantic contract: shuffle-group-reduce with sorted output
(``/root/reference/MRFCore.cpp:252-446``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t


@register(
    "ohlc_hourly_bars",
    oracle="""
SELECT event_type, date_trunc('hour', ts) AS bar,
       FIRST(value ORDER BY ts, event_id) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       LAST(value ORDER BY ts, event_id) AS close,
       COUNT(*) AS n_ticks,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM events
WHERE value IS NOT NULL
GROUP BY 1, 2
ORDER BY event_type, bar
""",
)
def ohlc_hourly_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars: open/close are the values at the (ts, event_id)-minimal /
    -maximal rows of each bar — ``min_by``/``max_by`` against the order
    struct, which aggregates with map-side partial states instead of the
    naive sort-within-group or first_value window (no per-group sort
    anywhere; ties impossible under the event_id tiebreak). NULL values
    are excluded on both sides — a bar over missing prices is undefined,
    and engines disagree on NULL placement in order keys."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    key = F.struct("ts", "event_id")
    return (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("bar"))
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total"),
        )
        .orderBy("event_type", "bar")
    )


@register(
    "embedding_dim_stats",
    oracle="""
WITH comp AS (
  SELECT u.d, CAST(u.x AS DOUBLE) AS x
  FROM (
    SELECT unnest(embedding) AS x,
           unnest(generate_series(0, len(embedding) - 1)) AS d
    FROM embeddings
  ) u
)
SELECT d AS dim,
       COUNT(*) AS n,
       ROUND(SUM(x) / COUNT(*), 6) AS mean,
       ROUND(SQRT(SUM(x * x) / COUNT(*)
                  - (SUM(x) / COUNT(*)) * (SUM(x) / COUNT(*))), 6) AS std
FROM comp
GROUP BY d
ORDER BY dim
""",
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean and population std of the embedding corpus — the
    standardization (feature-scaling) fit every ML pre-processor needs.

    ``posexplode`` turns the array column into (dim, component) pairs —
    one map-only pass, corpus x dim rows but 16 bytes each. Moments are
    double sums rounded to 6 places: the usual exact-decimal idiom does
    NOT work here, because casting an arbitrary float32 to decimal rounds
    its binary fraction to 10^-9 and Spark/DuckDB round that edge
    differently (measured: means diverging in the 9th digit) — double
    summation's order drift is ~1e-12 absolute, six orders inside the
    rounding grid. At 100 TB this shuffles one partial moment triple per
    (partition, dim)."""
    emb = t(spark, sf_dir, "embeddings")
    comp = emb.select(F.posexplode("embedding").alias("dim", "xf")).select(
        "dim", F.col("xf").cast("double").alias("x")
    )
    sx = F.sum("x")
    sxx = F.sum(F.col("x") * F.col("x"))
    n = F.count(F.lit(1))
    mean = sx / n
    return (
        comp.groupBy("dim")
        .agg(
            n.alias("n"),
            F.round(mean, 6).alias("mean"),
            F.round(F.sqrt(sxx / n - mean * mean), 6).alias("std"),
        )
        .orderBy("dim")
    )
