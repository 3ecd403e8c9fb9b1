"""Round-7 batch 4: statistical-test tier — the drift/independence checks
a data pipeline runs on its own distributions (complementing the KL
divergence monitor in pipeline8 and the z-score/MAD outlier detectors).

Semantic contract with the reference engine: one map -> shuffle-by-key ->
reduce -> sort job shape each (`/root/reference/MapReduceClient.h:47-51`,
`MRFCore.cpp:252-446`).

Scale posture:
- ``chi_square_independence``: one (type, dow) count shuffle (map-side
  combined), then O(cells) arithmetic off two broadcast marginal frames —
  the contingency table is vocabulary-sized, never data-sized.
- ``ks_two_sample``: per-distinct-value counts shuffle once; the ECDF
  cumsum runs on an unpartitioned window over the DISTINCT VALUE GRID
  (n_chars cardinality — bounded, data-independent), the same
  O(grid)-frame class as sequence_pack_spans' cumsum; at 100 TB bucket
  the value axis first (equi-depth) if the grid itself grows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t


@register(
    "chi_square_independence",
    oracle="""
WITH obs AS (
  SELECT event_type, isodow(ts) AS dow, COUNT(*) AS o
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
margins AS (
  SELECT event_type, CAST(SUM(o) AS BIGINT) AS row_tot FROM obs GROUP BY 1
),
cols AS (
  SELECT dow, CAST(SUM(o) AS BIGINT) AS col_tot FROM obs GROUP BY 1
),
n AS (SELECT CAST(SUM(o) AS BIGINT) AS total FROM obs)
SELECT CAST((SELECT COUNT(*) FROM margins) AS INT) AS n_types,
       CAST((SELECT COUNT(*) FROM cols) AS INT) AS n_dows,
       CAST(((SELECT COUNT(*) FROM margins) - 1) * ((SELECT COUNT(*) FROM cols) - 1) AS INT) AS dof,
       (SELECT total FROM n) AS n_events,
       ROUND(SUM(POW(o - CAST(row_tot AS DOUBLE) * col_tot / total, 2)
                 / (CAST(row_tot AS DOUBLE) * col_tot / total)), 6) AS chi2
FROM obs JOIN margins USING (event_type) JOIN cols USING (dow), n
""",
)
def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between event type and
    ISO day-of-week: expected cell = row_tot*col_tot/N from the observed
    contingency table, chi2 = sum (o-e)^2/e. All counts are exact
    integers, expected values are identical double expressions on both
    engines (weekday()+1 == DuckDB isodow — verified), and ROUND(6)
    absorbs the summation-order ulps of the final fold. One map-combined
    (type, dow) shuffle; marginals broadcast; O(cells) arithmetic."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    obs = ev.groupBy(
        "event_type", (F.weekday("ts") + 1).alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    margins = obs.groupBy("event_type").agg(F.sum("o").cast("bigint").alias("row_tot"))
    cols = obs.groupBy("dow").agg(F.sum("o").cast("bigint").alias("col_tot"))
    n = obs.agg(F.sum("o").cast("bigint").alias("total"))
    e = F.col("row_tot").cast("double") * F.col("col_tot") / F.col("total")
    joined = (
        obs.join(F.broadcast(margins), "event_type")
        .join(F.broadcast(cols), "dow")
        .join(F.broadcast(n))
    )
    n_types = F.broadcast(margins.agg(F.count(F.lit(1)).cast("int").alias("n_types")))
    n_dows = F.broadcast(cols.agg(F.count(F.lit(1)).cast("int").alias("n_dows")))
    return (
        joined.agg(
            F.round(F.sum(F.pow(F.col("o") - e, 2) / e), 6).alias("chi2"),
            F.max("total").alias("n_events"),
        )
        .join(n_types)
        .join(n_dows)
        .select(
            "n_types",
            "n_dows",
            ((F.col("n_types") - 1) * (F.col("n_dows") - 1)).cast("int").alias("dof"),
            "n_events",
            "chi2",
        )
    )


def _src_value_counts(spark: SparkSession, sf_dir: str, width: int | None = None) -> DataFrame:
    """Per-distinct-value (src0, src1) counts over document length — the
    shared axis for the KS and Mann-Whitney tests. ``width`` coarsens the
    value axis to fixed-width buckets (floor(v / width)) BEFORE the grid
    aggregation: with width=1 the bucketed tests are bit-identical to the
    exact forms (pytest-pinned), and any width bounds the cumsum frame at
    O(value_range / width) regardless of corpus size — the 100 TB escape
    hatch for an unbounded distinct-value grid."""
    d = t(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1") & F.col("n_chars").isNotNull()
    )
    v = (
        F.floor(F.col("n_chars") / float(width)).cast("bigint")
        if width is not None
        else F.col("n_chars")
    )
    return d.groupBy(v.alias("v")).agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0))
        .cast("bigint")
        .alias("c0"),
        F.sum(F.when(F.col("source") == "src1", 1).otherwise(0))
        .cast("bigint")
        .alias("c1"),
    )


def _ks_frame(vals: DataFrame) -> DataFrame:
    """D-statistic + 95% critical value from a (v, c0, c1) grid frame."""
    tot = vals.agg(
        F.sum("c0").cast("bigint").alias("n0"), F.sum("c1").cast("bigint").alias("n1")
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    ecdf = vals.select(
        F.sum("c0").over(w).alias("cum0"), F.sum("c1").over(w).alias("cum1")
    )
    gap = F.abs(
        F.col("cum0").cast("double") / F.col("n0")
        - F.col("cum1").cast("double") / F.col("n1")
    )
    crit = F.round(
        1.358
        * F.sqrt((F.col("n0") + F.col("n1")) / (F.col("n0").cast("double") * F.col("n1"))),
        6,
    )
    return (
        ecdf.join(F.broadcast(tot))
        .groupBy("n0", "n1")
        .agg(F.max(gap).alias("d_stat"))
        .select("n0", "n1", "d_stat", crit.alias("d_crit_95"))
    )


def _mwu_frame(vals: DataFrame) -> DataFrame:
    """Tie-corrected Mann-Whitney U/z from a (v, c0, c1) grid frame."""
    cnt = F.col("c0") + F.col("c1")
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    grid = vals.select(
        "c0",
        "c1",
        cnt.alias("cnt"),
        (F.sum(cnt).over(w) - cnt).alias("cum_before"),
    )
    avg_rank = F.col("cum_before") + (F.col("cnt") + 1) / 2.0
    s = grid.agg(
        F.sum("c0").cast("bigint").alias("n0"),
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum(F.col("c0") * avg_rank).alias("r0"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast("bigint")
        .alias("ties"),
    )
    n0, n1 = F.col("n0"), F.col("n1")
    u0 = F.col("r0") - n0 * (n0 + 1) / 2.0
    nn = n0 + n1
    sigma = F.sqrt(
        (n0.cast("double") * n1 / 12.0)
        * ((nn + 1) - F.col("ties").cast("double") / (nn * (nn - 1.0)))
    )
    z = F.round((u0 - n0 * n1 / 2.0) / sigma, 6)
    return s.select("n0", "n1", u0.alias("u0"), z.alias("z_tie_corrected"))


@register(
    "ks_two_sample",
    oracle="""
WITH vals AS (
  SELECT n_chars AS v,
         CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS c0,
         CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS c1
  FROM documents
  WHERE source IN ('src0', 'src1') AND n_chars IS NOT NULL
  GROUP BY n_chars
),
tot AS (
  SELECT CAST(SUM(c0) AS BIGINT) AS n0, CAST(SUM(c1) AS BIGINT) AS n1 FROM vals
),
ecdf AS (
  SELECT SUM(c0) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum0,
         SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1
  FROM vals
)
SELECT n0, n1,
       MAX(ABS(CAST(cum0 AS DOUBLE) / n0 - CAST(cum1 AS DOUBLE) / n1)) AS d_stat,
       ROUND(1.358 * SQRT((n0 + n1) / (CAST(n0 AS DOUBLE) * n1)), 6) AS d_crit_95
FROM ecdf, tot
GROUP BY n0, n1
""",
)
def ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test between src0 and src1 over
    the document-length distribution: D = max |ECDF0 - ECDF1| evaluated on
    the merged distinct-value grid (ECDF at v counts ALL ties <= v, which
    the per-distinct-value cumsum gets exactly right), plus the 95%
    critical value 1.358*sqrt((n0+n1)/(n0*n1)). Every ECDF step is an
    integer/total double division of identical operands — D needs no
    rounding, only the sqrt'd critical value gets ROUND(6). The cumsum
    window is unpartitioned but runs on the DISTINCT VALUE GRID
    (data-independent cardinality, the sequence_pack_spans frame class);
    at 100 TB use ``ks_two_sample_bucketed`` (pipeline20) — the same test
    on a fixed-width-bucketed axis, width-1-pinned equal to this form."""
    return _ks_frame(_src_value_counts(spark, sf_dir))


@register(
    "mann_whitney_u",
    oracle="""
WITH vals AS (
  SELECT n_chars AS v,
         CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS c0,
         CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS c1
  FROM documents
  WHERE source IN ('src0', 'src1') AND n_chars IS NOT NULL
  GROUP BY n_chars
),
grid AS (
  SELECT c0, c1, c0 + c1 AS cnt,
         SUM(c0 + c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - (c0 + c1) AS cum_before
  FROM vals
),
s AS (
  SELECT CAST(SUM(c0) AS BIGINT) AS n0, CAST(SUM(c1) AS BIGINT) AS n1,
         SUM(c0 * (cum_before + (cnt + 1) / 2.0)) AS r0,
         CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS ties
  FROM grid
)
SELECT n0, n1,
       r0 - n0 * (n0 + 1) / 2.0 AS u0,
       ROUND((r0 - n0 * (n0 + 1) / 2.0 - n0 * n1 / 2.0)
             / SQRT((CAST(n0 AS DOUBLE) * n1 / 12.0)
                    * ((n0 + n1 + 1) - CAST(ties AS DOUBLE) / ((n0 + n1) * (n0 + n1 - 1.0)))), 6) AS z_tie_corrected
FROM s
""",
)
def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (src0 vs src1 document lengths) with
    tie-corrected normal approximation — the nonparametric
    location-shift complement to ks_two_sample's distribution test. Runs
    on the same distinct-value grid: average ranks for a tied block are
    cum_before + (cnt+1)/2, so every rank term is an exact multiple of
    0.5 and the R0/U0 sums are EXACT in double regardless of summation
    order (no rounding needed); only the sqrt'd z gets ROUND(6). Same
    O(grid) cumsum frame class as ks_two_sample; at 100 TB use
    ``mann_whitney_u_bucketed`` (pipeline20, width-1-pinned equal)."""
    return _mwu_frame(_src_value_counts(spark, sf_dir))


@register(
    "gini_customer_spend",
    oracle="""
WITH spend AS (
  SELECT c_custkey,
         CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 0) AS DECIMAL(18,2)) AS x
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
),
ranked AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY x, c_custkey) AS i FROM spend
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(i * x) AS DOUBLE) AS sixi
  FROM ranked
)
SELECT n,
       sx AS total_spend,
       ROUND(2.0 * sixi / (n * sx) - (n + 1.0) / n, 9) AS gini
FROM s
""",
)
def gini_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend (orderless customers count as
    zero-spend — the inequality number is about the whole population):
    G = 2*Σ(i*x_i)/(n*Σx) - (n+1)/n over spend sorted ascending. The rank
    comes from operators/rank.py's TWO-PHASE range-partitioned
    global_rank_running — no unpartitioned window over customers — and
    tie-blocks don't affect the statistic (equal x makes Σ i*x over the
    block order-invariant). Spend is exact DECIMAL both sides, i*x_i sums
    stay decimal-exact, and the final doubles divide identical operands;
    ROUND(9) is belt and braces. Reference contract: the global
    sort-by-k3 phase (`MRFCore.cpp:252-446`) expressed shuffle-parallel."""
    from mapreducefw_spark.operators.rank import global_rank_running
    from mapreducefw_spark.queries._util import dec

    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    spend = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0).cast("decimal(12,2)"))
            .cast("decimal(18,2)")
            .alias("x")
        )
    )
    ranked = global_rank_running(spend, [F.col("x"), F.col("c_custkey")]).select(
        "x", F.col("global_rank").alias("i")
    )
    s = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("i") * F.col("x")).cast("double").alias("sixi"),
    )
    gini = F.round(
        2.0 * F.col("sixi") / (F.col("n") * F.col("sx")) - (F.col("n") + 1.0) / F.col("n"),
        9,
    )
    return s.select("n", F.col("sx").alias("total_spend"), gini.alias("gini"))


@register(
    "acf_daily_revenue",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS x
  FROM orders WHERE o_orderdate IS NOT NULL
  GROUP BY 1
),
stats AS (
  SELECT COUNT(*) AS n, SUM(x) / COUNT(*) AS mu,
         SUM(POW(x - (SELECT SUM(x) / COUNT(*) FROM daily), 2)) AS denom
  FROM daily
),
lagged AS (
  SELECT k.k AS lag_k, a.x, b.x AS xl
  FROM daily a
  CROSS JOIN (SELECT unnest(range(1, 8)) AS k) k
  LEFT JOIN daily b ON b.d + TO_DAYS(CAST(k.k AS INT)) = a.d
)
SELECT lag_k,
       CAST(COUNT(xl) AS BIGINT) AS n_pairs,
       ROUND(SUM(CASE WHEN xl IS NOT NULL THEN (x - mu) * (xl - mu) ELSE 0 END) / denom, 6) AS acf
FROM lagged, stats
GROUP BY lag_k, denom
ORDER BY lag_k
""",
)
def acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of daily revenue at lags 1..7 — the
    seasonality detector (a weekly cycle shows as an ACF(7) spike):
    acf(k) = sum (x_d - mu)(x_{d-k} - mu) / sum (x_d - mu)^2 with the
    full-series mean and denominator (the standard estimator). The lag is
    CALENDAR days (a self-join of the day series on d2 + k = d), not
    observation-order — on a sparse day grid row-lag would pair
    non-adjacent dates and a weekly cycle would smear. Daily sums are
    exact DECIMAL; the 7 lags fan out of one tiny day-grid frame
    (calendar-bounded, data-independent), so the raw data is scanned
    once; ROUND(6) absorbs fold-order ulps."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    from mapreducefw_spark.queries._util import dec

    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(dec("o_totalprice")).cast("double").alias("x")
    )
    stats = daily.agg(
        (F.sum("x") / F.count(F.lit(1))).alias("mu"),
        F.count(F.lit(1)).alias("n"),
    )
    mu_only = stats.select("mu")
    denom = (
        daily.join(F.broadcast(mu_only))
        .agg(F.sum(F.pow(F.col("x") - F.col("mu"), 2)).alias("denom"))
    )
    ks = daily.sparkSession.range(1, 8).select(F.col("id").cast("int").alias("lag_k"))
    fan = daily.join(F.broadcast(ks))
    # lag(x, k) with a per-row k isn't expressible; pre-shift the day
    # series by every k on the build side so the pairing is a single
    # EQUI-join on (d, lag_k) — a per-row date_add(d2, lag_k) predicate
    # across sides would force a nested-loop plan instead
    b = (
        daily.select(F.col("d").alias("d2"), F.col("x").alias("xl"))
        .join(F.broadcast(ks))
        .select(F.date_add("d2", F.col("lag_k")).alias("d"), "lag_k", "xl")
    )
    pairs = fan.join(b, ["d", "lag_k"], "left")
    return (
        pairs.join(F.broadcast(mu_only))
        .join(F.broadcast(denom))
        .groupBy("lag_k", "denom")
        .agg(
            F.count("xl").cast("bigint").alias("n_pairs"),
            F.round(
                F.sum(
                    F.when(
                        F.col("xl").isNotNull(),
                        (F.col("x") - F.col("mu")) * (F.col("xl") - F.col("mu")),
                    ).otherwise(0.0)
                )
                / F.col("denom"),
                6,
            ).alias("acf"),
        )
        .select("lag_k", "n_pairs", "acf")
        .orderBy("lag_k")
    )


@register(
    "benford_first_digit",
    oracle="""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
  FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice >= 1
),
obs AS (
  SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM obs)
SELECT digit, CAST(n AS BIGINT) AS n,
       CAST(n AS DOUBLE) / total AS share,
       ROUND(log10(1.0 + 1.0 / digit), 6) AS benford_expected,
       ROUND(POW(CAST(n AS DOUBLE) / total - log10(1.0 + 1.0 / digit), 2)
             / log10(1.0 + 1.0 / digit) * total, 6) AS chi2_term
FROM obs, tot
ORDER BY digit
""",
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    anomaly/fabrication screen for financial columns: observed first-digit
    shares vs log10(1 + 1/d), with each digit's chi-square contribution.
    The first digit comes from the INTEGER-STRING route (substr of the
    floored value) — log10-based digit extraction hits float edges at
    exact powers of ten; strings don't. Shares are exact-integer
    divisions; only the log10 constants and the chi2 terms ROUND(6)
    (cross-engine libm 1-ulp). One map-combined digit shuffle, 9-row
    output."""
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull() & (F.col("o_totalprice") >= 1)
    )
    digit = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("int")
    obs = orders.groupBy(digit.alias("digit")).agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").cast("bigint").alias("total"))
    share = F.col("n").cast("double") / F.col("total")
    expected = F.log10(1.0 + 1.0 / F.col("digit"))
    return (
        obs.join(F.broadcast(tot))
        .select(
            "digit",
            F.col("n").cast("bigint").alias("n"),
            share.alias("share"),
            F.round(expected, 6).alias("benford_expected"),
            F.round(F.pow(share - expected, 2) / expected * F.col("total"), 6).alias(
                "chi2_term"
            ),
        )
        .orderBy("digit")
    )
