"""Round-12 registrations, batch 7: the distributed bootstrap.

``poisson_bootstrap_ci`` — a 95% confidence interval for the mean order
value via the POISSON BOOTSTRAP (Chamandy et al. 2012, "Estimating
uncertainty for massive data streams"; Kleiner et al.'s BLB is the
other classic): instead of B multinomial resamples (which need global
coordination), every row independently draws a Poisson(1) weight per
replicate — the standard resampling scheme that distributes, because
weights are row-local. Replicate means are weighted means; the CI is
order statistics over the B replicate means.

Cross-engine determinism (what makes a BOOTSTRAP oracle-pairable): the
per-(row, replicate) Poisson(1) draw is a seeded 48-bit md5 uniform
mapped through a PRECOMPUTED integer inverse-CDF threshold table (the
``dp_noisy_counts`` trick — both engines compare the same BIGINT
literals, so every weight is bit-identical); replicate means divide an
exact-decimal weighted sum by an integer weight total (single IEEE
division — identical doubles); the CI bounds are exact order statistics
(ranks 2 and B-1 of B=64, the floor((B+1)*alpha) convention), not
interpolated percentiles.

Scale posture (100 TB): the B-fold replicate expansion happens INSIDE
the map stage (explode feeding a hash aggregate) — the B x N rows
partial-aggregate in-partition and the shuffle carries only B partial
rows per task; B x the scan compute is the known, documented cost of
the Poisson bootstrap. The replicate-mean frame is B rows; order
statistics over it are window work on a constant-size frame.

Semantic contract with the reference engine: map (emit B weighted
copies) -> shuffle by replicate -> reduce (fold sums), the canonical
Emit2/Reduce shape (`/root/reference/MapReduceClient.h:47-51`).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.operators.textprep import ensure_parallelism
from mapreducefw_spark.queries._util import dec, t

B_REPLICATES = 64
U_BITS = 48
POIS_CAP = 8  # P(Poisson(1) > 8) ~ 1.1e-6 of the 2^-48 grid's resolution
# 95% CI order-statistic ranks over B sorted replicate means: the
# ceil(B*alpha) percentile convention — ceil(64*0.025) = 2 for the lower
# bound, ceil(64*0.975) = 63 (= B-1) for the upper. (Note this is NOT the
# floor((B+1)*alpha) conservative-inclusive rule: moving the lower bound
# up from rank 1 to rank 2 NARROWS the interval. The convention is valid
# and, critically, cross-engine consistent — ADVICE r12.)
CI_LO_RANK = 2
CI_HI_RANK = B_REPLICATES - 1


def _poisson_thresholds() -> list[tuple[int, int]]:
    """(w, t_w) with t_w = round(CDF_Poisson(1)(w) * 2^48): the weight of a
    uniform u is the smallest w with u < t_w, else POIS_CAP. Shared
    integer literals — float details here are immaterial to the pairing."""
    rows = []
    cdf = 0.0
    for w in range(POIS_CAP):
        cdf += math.exp(-1.0) / math.factorial(w)
        rows.append((w, round(cdf * (1 << U_BITS))))
    return rows


_POIS_T = _poisson_thresholds()


def poisson_weight_col(u: Column) -> Column:
    expr = None
    for w, tw in _POIS_T:
        cond = u < F.lit(tw)
        expr = F.when(cond, F.lit(w)) if expr is None else expr.when(cond, F.lit(w))
    return expr.otherwise(F.lit(POIS_CAP)).cast("bigint")


def _poisson_weight_sql(u_expr: str) -> str:
    branches = "\n".join(f"    WHEN {u_expr} < {tw} THEN {w}" for w, tw in _POIS_T)
    return f"CAST(CASE\n{branches}\n    ELSE {POIS_CAP} END AS BIGINT)"


_U_SQL = (
    "CAST(('0x' || substr(md5('boot' || r.b || ':' || o.o_orderkey), 1, 12)) "
    "AS BIGINT)"
)


@register(
    "poisson_bootstrap_ci",
    oracle=f"""
WITH o AS (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL
),
r AS (SELECT UNNEST(range({B_REPLICATES})) AS b),
weighted AS (
  SELECT r.b,
         {_poisson_weight_sql(_U_SQL)} AS w,
         CAST(o.o_totalprice AS DECIMAL(12,2)) AS p
  FROM o CROSS JOIN r
),
reps AS (
  SELECT b,
         CAST(SUM(w * p) AS DOUBLE) / SUM(w) AS rep_mean
  FROM weighted GROUP BY b HAVING SUM(w) > 0
),
ranked AS (
  SELECT rep_mean,
         ROW_NUMBER() OVER (ORDER BY rep_mean ASC) AS rk,
         COUNT(*) OVER () AS nb
  FROM reps
),
base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
           AS mean_value
  FROM o
)
SELECT base.n_rows, base.mean_value,
       (SELECT rep_mean FROM ranked WHERE rk = {CI_LO_RANK}) AS ci_lo,
       (SELECT rep_mean FROM ranked WHERE rk = {CI_HI_RANK}) AS ci_hi,
       CAST((SELECT MAX(nb) FROM ranked) AS BIGINT) AS n_replicates
FROM base
""",
)
def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: (n_rows, mean_value, ci_lo, ci_hi, n_replicates) — the
    Poisson-bootstrap 95% CI of the mean order value. The B-fold explode
    feeds a map-side-combined hash aggregate (B partial rows per task)."""
    # spread BEFORE the B-fold explode: the single-row-group fixture scan
    # is one task, and the 64x md5 weight draw is ~98% of this query's CPU
    # (stage probe r13: 10.8s wall / 10.6s CPU on ONE task of 32) —
    # round-robin repartition is safe here because every downstream
    # aggregate is exact (decimal sum, bigint sum, count)
    o = ensure_parallelism(
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey").isNotNull() & F.col("o_totalprice").isNotNull())
        .select("o_orderkey", "o_totalprice")
    )
    reps = spark.range(B_REPLICATES).select(F.col("id").cast("bigint").alias("b"))
    u = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("boot"), F.col("b"), F.lit(":"), F.col("o_orderkey")
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")
    weighted = o.crossJoin(F.broadcast(reps)).select(
        "b",
        poisson_weight_col(u).alias("w"),
        dec("o_totalprice").alias("p"),
    )
    rep_means = (
        weighted.groupBy("b")
        .agg(
            F.sum(F.col("w") * F.col("p")).alias("_sw"),
            F.sum("w").alias("_w"),
        )
        .filter(F.col("_w") > 0)
        .select((F.col("_sw").cast("double") / F.col("_w")).alias("rep_mean"))
    )
    # order statistics on the B-row replicate frame (constant-size: a
    # bare window here is B rows, not data)
    from pyspark.sql.window import Window as W

    ranked = rep_means.select(
        "rep_mean",
        F.row_number().over(W.orderBy(F.asc("rep_mean"))).alias("rk"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("nb"),
    )
    bounds = ranked.agg(
        F.max(F.when(F.col("rk") == CI_LO_RANK, F.col("rep_mean"))).alias("ci_lo"),
        F.max(F.when(F.col("rk") == CI_HI_RANK, F.col("rep_mean"))).alias("ci_hi"),
        F.max("nb").cast("bigint").alias("n_replicates"),
    )
    base = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (F.sum(dec("o_totalprice")).cast("double") / F.count(F.lit(1))).alias(
            "mean_value"
        ),
    )
    return base.crossJoin(F.broadcast(bounds)).select(
        "n_rows", "mean_value", "ci_lo", "ci_hi", "n_replicates"
    )
