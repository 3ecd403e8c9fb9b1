"""Round-8 batch 6: survival analysis, interpolation, weighted location,
readability, inequality deciles, and the try_* ANSI-safe scalar surface.

Semantic contract with the reference engine: every query is the
map -> shuffle-by-key -> reduce -> sort job shape
(`/root/reference/MapReduceClient.h:47-51`, `MRFCore.cpp:252-446`).

Scale posture:
- Kaplan-Meier and linear interpolation run their unpartitioned windows
  on CALENDAR-BOUNDED grids (distinct lifetimes in days / hour spine) —
  the grid is O(observation span) whatever the fact volume is; all
  fact-sized work is map-combined count/sum partials.
- the weighted median windows are PARTITIONED by group and ordered over
  the per-group DISTINCT price grid (price-vocabulary sized); Lorenz
  deciles use one global row_number over per-customer partials with the
  two-phase-rank escape hatch noted (operators/rank.py) if the customer
  dimension ever stops fitting a single range exchange.
- cross-engine determinism: counts/cumsums stay BIGINT or DECIMAL
  end-to-end; ln/exp outputs take ROUND(6); interpolation fractions are
  ratios of identical BIGINT epoch deltas so the doubles match
  bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import dec, t


@register(
    "kaplan_meier_retention",
    oracle="""
WITH users AS (
  SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS f,
         MAX(CAST(o_orderdate AS DATE)) AS l
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
  GROUP BY o_custkey
),
horizon AS (SELECT MAX(l) AS m FROM users),
obs AS (
  SELECT CAST(datediff('day', f, l) AS BIGINT) AS t,
         CASE WHEN l <= m - INTERVAL 90 DAY THEN 1 ELSE 0 END AS death
  FROM users CROSS JOIN horizon
),
grid AS (
  SELECT t, CAST(SUM(death) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS total_t
  FROM obs GROUP BY t
),
risk AS (
  SELECT t, d,
         CAST(SUM(total_t) OVER () -
              COALESCE(SUM(total_t) OVER (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n
  FROM grid
),
deaths AS (SELECT t, d, n FROM risk WHERE d > 0)
SELECT t AS lifetime_days, n AS n_at_risk, d AS n_deaths,
       ROUND(CASE WHEN MIN(n - d) OVER (ORDER BY t) = 0 AND d = n THEN 0
                  ELSE EXP(SUM(CASE WHEN d < n THEN LN(1 - CAST(d AS DOUBLE) / n)
                                    ELSE 0 END) OVER (ORDER BY t)) END, 6) AS survival
FROM deaths
ORDER BY t
""",
)
def kaplan_meier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit survival over customer ORDER-activity
    lifetimes (days between first and last order). Customers whose last
    order falls in the final 90 days of the observation window are
    right-CENSORED — they leave the risk set without counting as churn,
    the estimator's whole point. The risk set n(t) is
    total-minus-exclusive-prefix on the lifetime grid (exact BIGINT);
    S(t) = exp(Σ ln(1 - d/n)) so both engines run the identical formula
    (DuckDB's product() has no Spark twin); d/n is one IEEE division of
    identical integers and the cumsum spans O(observation days) terms —
    ROUND(6) absorbs the 1-ulp libm drift. A d == n final row (everyone
    remaining churns) would hit ln(0): that factor is pinned to exact 0
    on both sides. Shuffle: one customer-keyed min/max exchange, then
    day-grid frames. All-NULL-date customers are excluded up front: a
    NULL lifetime would sort NULLS FIRST in Spark's risk-set prefix but
    NULLS LAST in DuckDB's (caught by the edge suite)."""
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull()
    )
    users = o.groupBy("o_custkey").agg(
        F.min(F.to_date("o_orderdate")).alias("f"),
        F.max(F.to_date("o_orderdate")).alias("l"),
    )
    horizon = users.agg(F.max("l").alias("m"))
    obs = users.join(F.broadcast(horizon)).select(
        F.datediff("l", "f").cast("bigint").alias("t"),
        F.when(F.col("l") <= F.date_sub("m", 90), 1).otherwise(0).alias("death"),
    )
    grid = obs.groupBy("t").agg(
        F.sum("death").cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("total_t"),
    )
    w_all = W.partitionBy()
    w_pre = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    risk = grid.select(
        "t",
        "d",
        (
            F.sum("total_t").over(w_all)
            - F.coalesce(F.sum("total_t").over(w_pre), F.lit(0))
        )
        .cast("bigint")
        .alias("n"),
    ).filter(F.col("d") > 0)
    w_cum = W.orderBy("t")
    term = F.when(
        F.col("d") < F.col("n"), F.log(1 - F.col("d").cast("double") / F.col("n"))
    ).otherwise(F.lit(0.0))
    surv = F.when(
        (F.min(F.col("n") - F.col("d")).over(w_cum) == 0) & (F.col("d") == F.col("n")),
        F.lit(0.0),
    ).otherwise(F.exp(F.sum(term).over(w_cum)))
    return risk.select(
        F.col("t").alias("lifetime_days"),
        F.col("n").alias("n_at_risk"),
        F.col("d").alias("n_deaths"),
        F.round(surv, 6).alias("survival"),
    ).orderBy("lifetime_days")


@register(
    "weighted_median_price",
    oracle="""
WITH wp AS (
  SELECT l_returnflag AS flag, l_extendedprice AS price,
         CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT) AS w
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
  GROUP BY 1, 2
),
cum AS (
  SELECT flag, price, w,
         CAST(SUM(w) OVER (PARTITION BY flag ORDER BY price) AS BIGINT) AS cw,
         CAST(SUM(w) OVER (PARTITION BY flag) AS BIGINT) AS tw
  FROM wp
)
SELECT flag AS l_returnflag, MAX(tw) AS total_weight,
       MIN(CASE WHEN cw * 2 >= tw THEN price END) AS weighted_median
FROM cum
GROUP BY flag
ORDER BY flag
""",
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per return flag — the
    lower weighted median (smallest price whose cumulative weight
    reaches half the total). Weights and cumulative sums are exact
    BIGINT so the crossing test cw*2 >= tw has no float boundary at
    all; the window is PARTITIONED by flag and ordered over the
    per-flag DISTINCT price grid (price-vocabulary sized after the
    map-combined (flag, price) weight exchange), never over raw rows."""
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull() & F.col("l_quantity").isNotNull()
    )
    wp = li.groupBy(
        F.col("l_returnflag").alias("flag"), F.col("l_extendedprice").alias("price")
    ).agg(F.sum(F.round("l_quantity", 0).cast("bigint")).cast("bigint").alias("w"))
    w_cum = W.partitionBy("flag").orderBy("price")
    w_all = W.partitionBy("flag")
    cum = wp.select(
        "flag",
        "price",
        F.sum("w").over(w_cum).cast("bigint").alias("cw"),
        F.sum("w").over(w_all).cast("bigint").alias("tw"),
    )
    return (
        cum.groupBy(F.col("flag").alias("l_returnflag"))
        .agg(
            F.max("tw").alias("total_weight"),
            F.min(F.when(F.col("cw") * 2 >= F.col("tw"), F.col("price"))).alias(
                "weighted_median"
            ),
        )
        .orderBy("l_returnflag")
    )


@register(
    "linear_interpolation_gaps",
    oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS rev
  FROM events
  WHERE event_type = 'purchase'
  GROUP BY 1
),
bounds AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM hourly),
spine AS (
  SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
),
joined AS (
  SELECT spine.h, hourly.rev,
         CAST(epoch(spine.h) AS BIGINT) AS e
  FROM spine LEFT JOIN hourly USING (h)
),
ctx AS (
  SELECT h, rev, e,
         last_value(rev IGNORE NULLS) OVER (ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         last_value(CASE WHEN rev IS NOT NULL THEN e END IGNORE NULLS)
           OVER (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pe,
         first_value(rev IGNORE NULLS) OVER (ORDER BY h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN rev IS NOT NULL THEN e END IGNORE NULLS)
           OVER (ORDER BY h ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ne
  FROM joined
)
SELECT h AS hour,
       CASE WHEN rev IS NULL THEN 1 ELSE 0 END AS interpolated,
       ROUND(CASE WHEN rev IS NOT NULL THEN rev
                  WHEN pv IS NULL THEN nv
                  WHEN nv IS NULL THEN pv
                  ELSE pv + (nv - pv) * (CAST(e - pe AS DOUBLE) / (ne - pe))
             END, 6) AS revenue_filled
FROM ctx
ORDER BY h
""",
)
def linear_interpolation_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of missing hours in the purchase-revenue
    series — the standard time-series repair between gap-fill-with-zero
    (events_gap_fill_hourly) and model-based imputation. The hour spine
    is sequence(min, max); previous/next anchors come from
    last/first IGNORE NULLS frames; the interpolation fraction is a
    ratio of identical BIGINT epoch deltas so both engines produce the
    same double bit-for-bit (hourly revenue itself rides the exact
    DECIMAL sum). The unpartitioned windows run on the CALENDAR-BOUNDED
    hour grid — O(span), not O(events); at 100 TB the fact-sized work
    is one map-combined (hour) partial-agg exchange. Boundary gaps
    (before the first / after the last observation) take the nearest
    anchor."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.sum(dec("value")).cast("double").alias("rev")
    )
    bounds = hourly.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("h")
    )
    joined = spine.join(hourly, "h", "left").select(
        "h", "rev", F.unix_timestamp("h").cast("bigint").alias("e")
    )
    w_pre = W.orderBy("h").rowsBetween(W.unboundedPreceding, 0)
    w_post = W.orderBy("h").rowsBetween(0, W.unboundedFollowing)
    e_obs = F.when(F.col("rev").isNotNull(), F.col("e"))
    ctx = joined.select(
        "h",
        "rev",
        "e",
        F.last("rev", ignorenulls=True).over(w_pre).alias("pv"),
        F.last(e_obs, ignorenulls=True).over(w_pre).alias("pe"),
        F.first("rev", ignorenulls=True).over(w_post).alias("nv"),
        F.first(e_obs, ignorenulls=True).over(w_post).alias("ne"),
    )
    filled = (
        F.when(F.col("rev").isNotNull(), F.col("rev"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * ((F.col("e") - F.col("pe")).cast("double") / (F.col("ne") - F.col("pe")))
        )
    )
    return ctx.select(
        F.col("h").alias("hour"),
        F.when(F.col("rev").isNull(), 1).otherwise(0).alias("interpolated"),
        F.round(filled, 6).alias("revenue_filled"),
    ).orderBy("hour")


@register(
    "readability_flesch_proxy",
    oracle="""
SELECT source,
       CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+'))) AS BIGINT) AS n_words,
       CAST(SUM(len(regexp_extract_all(text, '[.!?]'))) AS BIGINT) AS n_sentences,
       CAST(SUM(len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))) AS BIGINT) AS n_syllables,
       ROUND(206.835
             - 1.015 * CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+'))) AS DOUBLE)
                       / NULLIF(SUM(len(regexp_extract_all(text, '[.!?]'))), 0)
             - 84.6 * CAST(SUM(len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))) AS DOUBLE)
                      / NULLIF(SUM(len(regexp_extract_all(text, '[A-Za-z]+'))), 0), 4) AS flesch_proxy
FROM documents
WHERE text IS NOT NULL
GROUP BY source
ORDER BY source NULLS LAST
""",
)
def readability_flesch_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease proxy per source: 206.835 - 1.015·(words per
    sentence) - 84.6·(syllables per word), with syllables approximated
    by vowel-group runs — the classic cheap readability gate a text-
    quality pipeline runs next to the Gopher rules. All three signals
    are regexp occurrence COUNTS (pure map-side, no text shuffle — only
    3 BIGINT partials per source move), and the formula is plain
    division of identical integers, bit-identical cross-engine; ROUND(4)
    for presentation only. Sources with no ASCII words (zh) yield NULL
    via NULLIF rather than a division error."""
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    words = F.regexp_count("text", F.lit(r"[A-Za-z]+"))
    sents = F.regexp_count("text", F.lit(r"[.!?]"))
    syll = F.regexp_count("text", F.lit(r"[aeiouyAEIOUY]+"))
    agg = d.groupBy("source").agg(
        F.sum(words).cast("bigint").alias("n_words"),
        F.sum(sents).cast("bigint").alias("n_sentences"),
        F.sum(syll).cast("bigint").alias("n_syllables"),
    )
    return agg.select(
        "source",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(
            F.lit(206.835)
            - 1.015
            * F.col("n_words").cast("double")
            / F.nullif(F.col("n_sentences"), F.lit(0))
            - 84.6
            * F.col("n_syllables").cast("double")
            / F.nullif(F.col("n_words"), F.lit(0)),
            4,
        ).alias("flesch_proxy"),
    ).orderBy(F.asc_nulls_last("source"))


@register(
    "lorenz_curve_deciles",
    oracle="""
WITH spend AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS s
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT s, ROW_NUMBER() OVER (ORDER BY s NULLS FIRST, o_custkey NULLS LAST) AS rn,
         COUNT(*) OVER () AS n
  FROM spend
),
dealt AS (
  SELECT CAST(FLOOR(CAST((rn - 1) * 10 AS DOUBLE) / n) AS INT) AS decile, s
  FROM ranked
),
agg AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
         SUM(s) AS spend
  FROM dealt GROUP BY decile
)
SELECT decile, n_customers,
       CAST(spend AS DOUBLE) AS spend,
       ROUND(CAST(SUM(spend) OVER (ORDER BY decile) AS DOUBLE)
             / CAST(SUM(spend) OVER () AS DOUBLE), 6) AS cum_share
FROM agg
ORDER BY decile
""",
)
def lorenz_curve_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve by customer spend decile — the curve behind
    gini_customer_spend: customers ranked ascending by total spend
    (custkey tiebreak, fully deterministic), dealt into 10 equal-count
    deciles by exact integer arithmetic, with cumulative spend share
    per decile. Spend rides DECIMAL end-to-end (order-independent
    sums); the only doubles are final presentation ratios of identical
    decimals. The global row_number runs over per-customer PARTIALS
    (customer-dimension sized); swap in the two-phase range rank
    (operators/rank.py) if that dimension ever outgrows one exchange."""
    o = t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(F.sum(dec("o_totalprice")).alias("s"))
    # both rank keys can be NULL on edge data (all-NULL-price spend, the
    # NULL-custkey bucket): pin NULL spend FIRST (bought nothing priced ==
    # lowest) and NULL custkey LAST on BOTH engines — their defaults
    # disagree in opposite directions
    w_rank = W.orderBy(F.asc_nulls_first("s"), F.asc_nulls_last("o_custkey"))
    ranked = spend.select(
        "s",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    deciles = ranked.select(
        F.floor(((F.col("rn") - 1) * 10).cast("double") / F.col("n"))
        .cast("int")
        .alias("decile"),
        "s",
    )
    agg = deciles.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("s").alias("spend_dec"),
    )
    w_cum = W.orderBy("decile")
    w_all = W.partitionBy()
    return agg.select(
        "decile",
        "n_customers",
        F.col("spend_dec").cast("double").alias("spend"),
        F.round(
            F.sum("spend_dec").over(w_cum).cast("double")
            / F.sum("spend_dec").over(w_all).cast("double"),
            6,
        ).alias("cum_share"),
    ).orderBy("decile")


@register(
    "try_arithmetic_functions",
    oracle="""
WITH base AS (
  SELECT o_orderkey AS k, o_totalprice AS p,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL
              ELSE o_totalprice / (o_orderkey % 3) END AS td,
         CASE WHEN o_orderkey % 2 = 1 THEN NULL
              ELSE 9223372036854775807 END AS ta,
         CASE WHEN o_orderkey % 4 >= 2 THEN NULL
              ELSE 4611686018427387904 * (o_orderkey % 4) END AS tm,
         CASE WHEN o_orderkey % 5 = 0 THEN NULL
              ELSE CAST(12 AS DECIMAL(2,0)) END AS tn,
         CASE WHEN o_orderkey % 3 = 0 THEN 'a'
              WHEN o_orderkey % 3 = 1 THEN 'b'
              ELSE NULL END AS te
  FROM orders
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN td IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS div_nulls,
       CAST(SUM(CAST(td AS DECIMAL(14,4))) AS DOUBLE) AS div_sum,
       CAST(SUM(CASE WHEN ta IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS add_overflows,
       CAST(SUM(CASE WHEN tm IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS mul_overflows,
       CAST(SUM(CASE WHEN tn IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS to_number_nulls,
       CAST(SUM(CAST(tn AS BIGINT)) AS BIGINT) AS to_number_sum,
       CAST(SUM(CASE WHEN te IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS element_at_nulls
FROM base
""",
)
def try_arithmetic_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI-safe try_* scalar surface in one audit row: try_divide
    (zero divisor -> NULL), try_add / try_multiply (BIGINT overflow ->
    NULL instead of a wrong wrapped value or a job-killing exception —
    what an ANSI-mode 100 TB job wants for dirty columns), try_to_number
    (malformed string -> NULL) and try_element_at (out-of-bounds ->
    NULL). The oracle encodes the documented semantics as CASE guards,
    so a Spark behavior change would fail the diff. Aggregated to one
    row of NULL tallies + exact DECIMAL sums; pure map-side expression
    work."""
    o = t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    base = o.select(
        F.try_divide(F.col("o_totalprice"), k % 3).alias("td"),
        F.try_add(F.lit(9223372036854775807).cast("bigint"), (k % 2).cast("bigint")).alias(
            "ta"
        ),
        F.try_multiply(
            F.lit(4611686018427387904).cast("bigint"), (k % 4).cast("bigint")
        ).alias("tm"),
        F.try_to_number(
            F.when(k % 5 == 0, F.lit("1x")).otherwise(F.lit("12")), F.lit("99")
        ).alias("tn"),
        F.try_element_at(
            F.array(F.lit("a"), F.lit("b")), (1 + k % 3).cast("int")
        ).alias("te"),
    )
    return base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("td").isNull(), 1).otherwise(0)).cast("bigint").alias(
            "div_nulls"
        ),
        F.sum(F.col("td").cast("decimal(14,4)")).cast("double").alias("div_sum"),
        F.sum(F.when(F.col("ta").isNull(), 1).otherwise(0)).cast("bigint").alias(
            "add_overflows"
        ),
        F.sum(F.when(F.col("tm").isNull(), 1).otherwise(0)).cast("bigint").alias(
            "mul_overflows"
        ),
        F.sum(F.when(F.col("tn").isNull(), 1).otherwise(0)).cast("bigint").alias(
            "to_number_nulls"
        ),
        F.sum(F.col("tn").cast("bigint")).cast("bigint").alias("to_number_sum"),
        F.sum(F.when(F.col("te").isNull(), 1).otherwise(0)).cast("bigint").alias(
            "element_at_nulls"
        ),
    )
