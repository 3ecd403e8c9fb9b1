"""Tenth batch (round 5, continued session): deterministic statistics.

- ``ols_price_size_by_brand`` — closed-form per-group linear regression
  (price ~ size) computed from EXACT integer/decimal moments, so the
  slope/intercept doubles are bit-identical across engines without any
  rounding: the moment sums are order-independent exact arithmetic and
  the final formula is a fixed sequence of IEEE ops on identical
  operands. (``regr_slope``/``regr_avgx`` exist in both engines but sum
  doubles in engine-specific order — the moments idiom is the portable,
  and at scale the map-side-combinable, form.)
- ``robust_outliers_mad`` — median-absolute-deviation outlier flags per
  event type: exact discrete medians (value at rank ceil(n/2), no
  interpolation) via per-group windows, the robust cousin of the
  mean/stddev z-score (``events_zscore_anomalies``); a single extreme
  value moves a mean arbitrarily but not a median.

Semantic contract: shuffle-group-reduce with sorted output
(``/root/reference/MRFCore.cpp:252-446``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t

MAD_K = 3.5 * 1.4826  # modified-z cutoff x consistency constant


@register(
    "ols_price_size_by_brand",
    oracle="""
WITH m AS (
  SELECT p_brand,
         COUNT(*) AS n,
         CAST(SUM(p_size) AS BIGINT) AS sx,
         CAST(SUM(CAST(p_size AS BIGINT) * p_size) AS BIGINT) AS sxx,
         CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2)) * p_size) AS DOUBLE)
           AS sxy
  FROM part GROUP BY p_brand
)
SELECT p_brand, n,
       (n * sxy - sx * sy)
         / NULLIF(n * sxx - CAST(sx AS DOUBLE) * sx, 0) AS slope,
       (sy - (n * sxy - sx * sy)
               / NULLIF(n * sxx - CAST(sx AS DOUBLE) * sx, 0) * sx)
         / n AS intercept
FROM m
ORDER BY p_brand
""",
)
def ols_price_size_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS fit of retail price against size from exact moments:
    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), intercept = (Sy - b*Sx)/n.

    Sx/Sxx are exact BIGINT sums, Sy/Sxy exact DECIMAL sums cast to double
    AFTER aggregation — all four are order-independent, so both engines
    feed the identical operands into the identical closed form and the
    result needs no rounding. One map-side-combinable aggregation; at
    100 TB this is a single shuffle of 4 numbers per group."""
    part = t(spark, sf_dir, "part")
    m = part.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p_size").alias("sx"),
        F.sum(F.col("p_size").cast("long") * F.col("p_size")).alias("sxx"),
        F.sum(F.col("p_retailprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("sy"),
        F.sum(F.col("p_retailprice").cast("decimal(12,2)") * F.col("p_size"))
        .cast("double")
        .alias("sxy"),
    )
    # NULLIF guards the degenerate all-one-size group (denominator 0):
    # slope NULL on both engines rather than an engine-specific inf/error
    denom = F.nullif(
        F.col("n") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"),
        F.lit(0.0),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / denom
    return m.select(
        "p_brand",
        "n",
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("intercept"),
    ).orderBy("p_brand")


@register(
    "robust_outliers_mad",
    oracle=f"""
WITH r AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL
),
med AS (
  SELECT event_type,
         MAX(CASE WHEN rk = CAST(CEIL(0.5 * n) AS BIGINT) THEN value END)
           AS median
  FROM r GROUP BY event_type
),
dev AS (
  SELECT r.event_type, r.value, med.median,
         ABS(r.value - med.median) AS adev,
         ROW_NUMBER() OVER (PARTITION BY r.event_type
                            ORDER BY ABS(r.value - med.median), r.value, r.rk)
           AS drk,
         COUNT(*) OVER (PARTITION BY r.event_type) AS dn
  FROM r JOIN med USING (event_type)
),
mad AS (
  SELECT event_type,
         MAX(CASE WHEN drk = CAST(CEIL(0.5 * dn) AS BIGINT) THEN adev END)
           AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       COUNT(*) AS n,
       MAX(d.median) AS median,
       MAX(m.mad) AS mad,
       CAST(SUM(CASE WHEN d.adev > {MAD_K} * m.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
ORDER BY d.event_type
""",
)
def robust_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAD-based robust outliers per event type: |x - median| > 3.5·1.4826·MAD
    (the modified z-score rule), with exact DISCRETE medians — the value at
    rank ceil(n/2) under a total order — so every number is a parquet
    double read back out or an exact difference of two, and both engines
    agree bit-for-bit with no rounding.

    Both median extractions are per-group windows partitioned by
    event_type (never global); exact-by-sorting is the driver-checkable
    twin, approx_percentile the documented sketch path at scale (same
    status as median_exact/percentile_disc)."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    wv = W.partitionBy("event_type").orderBy("value", "event_id")
    wn = W.partitionBy("event_type")
    r = ev.select(
        "event_type",
        "value",
        F.row_number().over(wv).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med = r.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("rk") == F.ceil(F.lit(0.5) * F.col("n")).cast("long"),
                F.col("value"),
            )
        ).alias("median")
    )
    adev = F.abs(F.col("value") - F.col("median"))
    wd = W.partitionBy("event_type").orderBy(adev, "value", "rk")
    dev = r.join(F.broadcast(med), "event_type").select(
        "event_type",
        "value",
        "median",
        adev.alias("adev"),
        F.row_number().over(wd).alias("drk"),
        F.count(F.lit(1)).over(wn).alias("dn"),
    )
    mad = dev.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("drk") == F.ceil(F.lit(0.5) * F.col("dn")).cast("long"),
                F.col("adev"),
            )
        ).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("median").alias("median"),
            F.max("mad").alias("mad"),
            F.sum(
                F.when(F.col("adev") > F.lit(MAD_K) * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )
