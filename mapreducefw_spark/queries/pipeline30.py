"""Round-8 batch 11: sessionized association rules + cohort conversion
matrix — two COMPOSITION queries (sessionize -> rule mining; cohort ->
funnel), the integration tier where operator-boundary bugs hide (the
corpus_prep_pipeline / entity_resolution precedent).

Semantic contract with the reference engine: every query is the
map -> shuffle-by-key -> reduce -> sort job shape
(`/root/reference/MapReduceClient.h:47-51`, `MRFCore.cpp:252-446`).

Scale posture:
- sessionization is the (user)-keyed lag window (user-sized partitions);
  the per-session type grid is |type-vocab|-bounded so the rule fan-out
  is sessions x 25 max, never events²; rule totals ride broadcast 1-row
  frames.
- the cohort matrix is two user-keyed min exchanges + an O(weeks) grid.
- determinism: all counts BIGINT; only the final support/confidence/
  lift/rate ratios are doubles of identical integers, ROUND(6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t


@register(
    "session_rule_lift",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN ts - COALESCE(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                                 ts - INTERVAL 10 YEAR)
                   > INTERVAL 30 MINUTES THEN 1 ELSE 0 END AS new_session
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type IS NOT NULL
),
sess AS (
  SELECT user_id, event_type, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
),
per_type AS (
  SELECT user_id, sid, event_type,
         MIN(ts) AS first_ts, MAX(ts) AS last_ts
  FROM sess GROUP BY user_id, sid, event_type
),
n_sess AS (SELECT CAST(COUNT(DISTINCT (user_id, sid)) AS BIGINT) AS n FROM sess),
type_sess AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t
  FROM per_type GROUP BY event_type
),
rules AS (
  SELECT a.event_type AS antecedent, b.event_type AS consequent,
         CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM per_type a
  JOIN per_type b ON b.user_id = a.user_id AND b.sid = a.sid
                 AND b.event_type <> a.event_type
                 AND a.first_ts < b.last_ts
  GROUP BY a.event_type, b.event_type
)
SELECT r.antecedent, r.consequent, r.n_ab,
       ROUND(CAST(r.n_ab AS DOUBLE) / n_sess.n, 6) AS support,
       ROUND(CAST(r.n_ab AS DOUBLE) / ta.n_t, 6) AS confidence,
       ROUND(CAST(r.n_ab AS DOUBLE) * n_sess.n / (CAST(ta.n_t AS DOUBLE) * tb.n_t), 6) AS lift
FROM rules r
JOIN type_sess ta ON ta.event_type = r.antecedent
JOIN type_sess tb ON tb.event_type = r.consequent
CROSS JOIN n_sess
ORDER BY r.antecedent, r.consequent
""",
)
def session_rule_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionized association rules: for each ordered event-type pair
    (a -> b), the share of 30-minute sessions where some `a` precedes
    some `b` (support), conditioned on sessions containing `a`
    (confidence), against b's base rate (lift) — the "users who viewed X
    then bought Y" miner, composed from the sessionization_30m gap
    definition (same lag/flag/cumsum construction, (ts, event_id)
    tiebreak). The per-session state is the (type, first_ts, last_ts)
    grid — |type-vocab|-bounded, so the within-session pair join fans
    out sessions x 25 max, never events²; totals are broadcast 1-row /
    vocab-sized frames. All counts exact BIGINT; ROUND(6) on the three
    ratios only."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    w_lag = W.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w_lag)
    new_s = F.when(
        lag_ts.isNull()
        | (F.unix_micros("ts") - F.unix_micros(lag_ts) > 30 * 60 * 1_000_000),
        1,
    ).otherwise(0)
    # the oracle's COALESCE(lag, ts - 10y) makes the first row a new
    # session too; lag NULL -> 1 here is the same contract
    sess = ev.select(
        "user_id",
        "event_type",
        "ts",
        F.sum(new_s).over(
            W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
                W.unboundedPreceding, 0
            )
        ).alias("sid"),
    )
    per_type = sess.groupBy("user_id", "sid", "event_type").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    n_sess = (
        sess.select("user_id", "sid")
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    type_sess = per_type.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_t")
    )
    a, b = per_type.alias("a"), per_type.alias("b")
    rules = (
        a.join(
            b,
            (F.col("b.user_id") == F.col("a.user_id"))
            & (F.col("b.sid") == F.col("a.sid"))
            & (F.col("b.event_type") != F.col("a.event_type"))
            & (F.col("a.first_ts") < F.col("b.last_ts")),
        )
        .groupBy(
            F.col("a.event_type").alias("antecedent"),
            F.col("b.event_type").alias("consequent"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
    )
    ta = type_sess.select(
        F.col("event_type").alias("antecedent"), F.col("n_t").alias("na")
    )
    tb = type_sess.select(
        F.col("event_type").alias("consequent"), F.col("n_t").alias("nb")
    )
    return (
        rules.join(F.broadcast(ta), "antecedent")
        .join(F.broadcast(tb), "consequent")
        .join(F.broadcast(n_sess))
        .select(
            "antecedent",
            "consequent",
            "n_ab",
            F.round(F.col("n_ab").cast("double") / F.col("n"), 6).alias("support"),
            F.round(F.col("n_ab").cast("double") / F.col("na"), 6).alias("confidence"),
            F.round(
                F.col("n_ab").cast("double") * F.col("n")
                / (F.col("na").cast("double") * F.col("nb")),
                6,
            ).alias("lift"),
        )
        .orderBy("antecedent", "consequent")
    )


@register(
    "cohort_conversion_matrix",
    oracle="""
WITH ranked AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS rn
  FROM orders WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
),
users AS (
  SELECT o_custkey,
         CAST(date_trunc('month', MAX(CASE WHEN rn = 1 THEN d END)) AS DATE) AS cohort_month,
         datediff('day', MAX(CASE WHEN rn = 1 THEN d END),
                          MAX(CASE WHEN rn = 2 THEN d END)) AS days_to_repeat
  FROM ranked WHERE rn <= 2 GROUP BY o_custkey
)
SELECT cohort_month,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN days_to_repeat IS NOT NULL AND days_to_repeat <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS conv_30d,
       CAST(SUM(CASE WHEN days_to_repeat IS NOT NULL AND days_to_repeat <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS conv_90d,
       ROUND(CAST(SUM(CASE WHEN days_to_repeat IS NOT NULL AND days_to_repeat <= 30 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS rate_30d,
       ROUND(CAST(SUM(CASE WHEN days_to_repeat IS NOT NULL AND days_to_repeat <= 90 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS rate_90d
FROM users
GROUP BY cohort_month
ORDER BY cohort_month
""",
)
def cohort_conversion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acquisition-cohort repeat-purchase matrix: customers grouped by
    the MONTH of their first order, with the share placing a SECOND
    order within 30 and 90 days — the composition of cohort_retention's
    cohort axis with a funnel-style conversion definition, the table a
    growth report leads with (the events table's 30-day span collapses
    to one cohort; the 6-year orders history gives the real matrix).
    The second order is rank 2 under the deterministic (date, orderkey)
    order, so same-day repeat orders count. One customer-keyed rank
    exchange, then an O(months) grid. date_trunc('month') is
    engine-identical. All-BIGINT counts; ROUND(6) rates."""
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull()
    )
    w_r = W.partitionBy("o_custkey").orderBy(F.to_date("o_orderdate"), "o_orderkey")
    ranked = o.select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        F.row_number().over(w_r).alias("rn"),
    ).filter(F.col("rn") <= 2)
    users = ranked.groupBy("o_custkey").agg(
        F.date_trunc(
            "month", F.max(F.when(F.col("rn") == 1, F.col("d")))
        )
        .cast("date")
        .alias("cohort_month"),
        F.datediff(
            F.max(F.when(F.col("rn") == 2, F.col("d"))),
            F.max(F.when(F.col("rn") == 1, F.col("d"))),
        ).alias("days_to_repeat"),
    )
    c30 = F.sum(
        F.when(
            F.col("days_to_repeat").isNotNull() & (F.col("days_to_repeat") <= 30), 1
        ).otherwise(0)
    )
    c90 = F.sum(
        F.when(
            F.col("days_to_repeat").isNotNull() & (F.col("days_to_repeat") <= 90), 1
        ).otherwise(0)
    )
    return (
        users.groupBy("cohort_month")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            c30.cast("bigint").alias("conv_30d"),
            c90.cast("bigint").alias("conv_90d"),
        )
        .select(
            "cohort_month",
            "n_customers",
            "conv_30d",
            "conv_90d",
            F.round(F.col("conv_30d").cast("double") / F.col("n_customers"), 6).alias(
                "rate_30d"
            ),
            F.round(F.col("conv_90d").cast("double") / F.col("n_customers"), 6).alias(
                "rate_90d"
            ),
        )
        .orderBy("cohort_month")
    )
