"""Round-8 batch 12: k-group statistical tests — one-way ANOVA F,
Kruskal-Wallis H, the Wald-Wolfowitz runs test, and Cohen's d.

Completes the statistical family's k-group axis: Welch/MWU (pipeline21/19)
compare TWO groups; ANOVA and Kruskal-Wallis are their k-group
parametric/nonparametric counterparts (is document length the same across
ALL sources?); the runs test is the distribution-free randomness check on
the daily-revenue series next to ACF/Durbin-Watson; Cohen's d is the
effect size Welch's t lacks.

Semantic contract with the reference engine: every query is the
map -> shuffle-by-key -> reduce -> sort job shape
(`/root/reference/MapReduceClient.h:47-51`, `MRFCore.cpp:252-446`).

Scale posture:
- ANOVA/Cohen's d are closed-form Σ statistics: one map-combined shuffle
  of (n, Σx, Σx²) partials per group, O(groups) arithmetic after.
- Kruskal-Wallis ranks on the DISTINCT-VALUE GRID (the MWU machinery
  generalized to k groups): average ranks are exact half-integers, so
  every rank sum is exact in double regardless of fold order.
- the runs test runs on the calendar-bounded day grid.
- determinism: integer/half-integer sums exact; ROUND(6) only on final
  sqrt/ratio outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import dec, t


@register(
    "anova_f_length_by_source",
    oracle="""
WITH g AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(n_chars) AS BIGINT) AS s,
         CAST(SUM(n_chars * n_chars) AS BIGINT) AS ss
  FROM documents WHERE n_chars IS NOT NULL
  GROUP BY source
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(s) AS BIGINT) AS st,
         CAST(SUM(ss) AS BIGINT) AS sst, CAST(COUNT(*) AS BIGINT) AS k
  FROM g
),
parts AS (
  SELECT SUM(CAST(s AS DOUBLE) * s / n) AS sb_raw FROM g
)
SELECT tot.k AS n_groups, tot.nn AS n_rows,
       CAST(tot.k - 1 AS BIGINT) AS df_between,
       CAST(tot.nn - tot.k AS BIGINT) AS df_within,
       -- F undefined with one group (df1 = 0), no residual df, or zero
       -- within-variance: NULL, not DIVIDE_BY_ZERO
       CASE WHEN tot.k > 1 AND tot.nn > tot.k
                 AND CAST(tot.sst AS DOUBLE) - parts.sb_raw > 0 THEN
         ROUND(((parts.sb_raw - CAST(tot.st AS DOUBLE) * tot.st / tot.nn) / (tot.k - 1))
               / ((CAST(tot.sst AS DOUBLE) - parts.sb_raw) / (tot.nn - tot.k)), 6)
       END AS f_stat
FROM tot, parts
""",
)
def anova_f_length_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F across ALL sources (is mean document length equal
    everywhere?) — the k-group parametric counterpart of welch_t_test,
    in closed form: SSB = Σ s_g²/n_g − S²/N and SSW = ΣΣx² − Σ s_g²/n_g
    derive entirely from exact BIGINT (n, Σx, Σx²) partials, so the only
    float work is the O(groups) fold of s_g²/n_g terms (each an exact
    <2^53 integer divided once — identical both engines) and the final
    ratio, ROUND(6). One map-combined shuffle."""
    g = (
        t(spark, sf_dir, "documents")
        .filter(F.col("n_chars").isNotNull())
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("n_chars").cast("bigint").alias("s"),
            F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("ss"),
        )
    )
    tot = g.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("s").cast("bigint").alias("st"),
        F.sum("ss").cast("bigint").alias("sst"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    parts = g.agg(
        F.sum(F.col("s").cast("double") * F.col("s") / F.col("n")).alias("sb_raw")
    )
    ssb = F.col("sb_raw") - F.col("st").cast("double") * F.col("st") / F.col("nn")
    ssw = F.col("sst").cast("double") - F.col("sb_raw")
    return (
        tot.join(F.broadcast(parts))
        .select(
            F.col("k").alias("n_groups"),
            F.col("nn").alias("n_rows"),
            (F.col("k") - 1).cast("bigint").alias("df_between"),
            (F.col("nn") - F.col("k")).cast("bigint").alias("df_within"),
            # F undefined with one group (df1 = 0), no residual df, or
            # zero within-variance: NULL, not an ANSI DIVIDE_BY_ZERO
            F.when(
                (F.col("k") > 1) & (F.col("nn") > F.col("k")) & (ssw > 0),
                F.round(
                    (ssb / (F.col("k") - 1)) / (ssw / (F.col("nn") - F.col("k"))), 6
                ),
            ).alias("f_stat"),
        )
    )


@register(
    "kruskal_wallis_length",
    oracle="""
WITH vals AS (
  SELECT source, n_chars AS v FROM documents WHERE n_chars IS NOT NULL
),
grid AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM vals GROUP BY v),
ranked AS (
  SELECT v, c,
         COALESCE(SUM(c) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + (c + 1) / 2.0 AS avg_rank
  FROM grid
),
per_src AS (
  SELECT vals.source, CAST(COUNT(*) AS BIGINT) AS n_g,
         SUM(ranked.avg_rank) AS r_g
  FROM vals JOIN ranked ON ranked.v = vals.v
  GROUP BY vals.source
),
tot AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k FROM per_src
),
ties AS (
  SELECT SUM(CAST(c AS DOUBLE) * c * c - c) AS t3t FROM grid
),
h AS (
  SELECT (12.0 / (CAST(tot.n AS DOUBLE) * (tot.n + 1)))
           * SUM(r_g * r_g / n_g) - 3.0 * (tot.n + 1) AS h_raw,
         MAX(tot.n) AS n, MAX(tot.k) AS k
  FROM per_src CROSS JOIN tot GROUP BY tot.n
)
SELECT CAST(h.k AS BIGINT) AS n_groups, CAST(h.n AS BIGINT) AS n_rows,
       ROUND(h.h_raw, 6) AS h_stat,
       -- undefined when n <= 1 (n^3 - n = 0) or every value is tied
       -- (correction factor 0): NULL, not DIVIDE_BY_ZERO
       CASE WHEN h.n > 1 AND ties.t3t < CAST(h.n AS DOUBLE) * h.n * h.n - h.n THEN
         ROUND(h.h_raw / (1 - ties.t3t / (CAST(h.n AS DOUBLE) * h.n * h.n - h.n)), 6)
       END AS h_tie_corrected
FROM h, ties
""",
)
def kruskal_wallis_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across ALL sources — the k-group generalization
    of mann_whitney_u (rank-based, distribution-free; the test to reach
    for when ANOVA's normality is laughable, which corpus lengths are).
    Ranks come from the DISTINCT-VALUE GRID exactly like the MWU:
    average ranks are exact half-integers (cum-before + (c+1)/2), so
    per-group rank sums are exact in double REGARDLESS of fold order;
    the only drift-bearing float is the O(groups) Σ R_g²/n_g fold,
    absorbed by ROUND(6). Tie correction from Σ(c³−c) over the grid.
    One value-grid shuffle + one group shuffle."""
    vals = (
        t(spark, sf_dir, "documents")
        .filter(F.col("n_chars").isNotNull())
        .select("source", F.col("n_chars").alias("v"))
    )
    grid = vals.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    w_pre = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    ranked = grid.select(
        "v",
        "c",
        (
            F.coalesce(F.sum("c").over(w_pre), F.lit(0)) + (F.col("c") + 1) / 2.0
        ).alias("avg_rank"),
    )
    per_src = (
        vals.join(ranked, "v")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_g"),
            F.sum("avg_rank").alias("r_g"),
        )
    )
    tot = per_src.agg(
        F.sum("n_g").cast("bigint").alias("n"), F.count(F.lit(1)).cast("bigint").alias("k")
    )
    ties = grid.agg(
        F.sum(F.col("c").cast("double") * F.col("c") * F.col("c") - F.col("c")).alias(
            "t3t"
        )
    )
    h = (
        per_src.join(F.broadcast(tot))
        .groupBy("n")
        .agg(
            (
                (12.0 / (F.col("n").cast("double") * (F.col("n") + 1)))
                * F.sum(F.col("r_g") * F.col("r_g") / F.col("n_g"))
                - 3.0 * (F.col("n") + 1)
            ).alias("h_raw"),
            F.max("k").alias("k"),
        )
    )
    return (
        h.join(F.broadcast(ties))
        .select(
            F.col("k").cast("bigint").alias("n_groups"),
            F.col("n").cast("bigint").alias("n_rows"),
            F.round("h_raw", 6).alias("h_stat"),
            # undefined when n <= 1 (n^3 - n = 0) or every value is tied
            # (correction factor 0): NULL, not an ANSI DIVIDE_BY_ZERO
            F.when(
                (F.col("n") > 1)
                & (
                    F.col("t3t")
                    < F.col("n").cast("double") * F.col("n") * F.col("n") - F.col("n")
                ),
                F.round(
                    F.col("h_raw")
                    / (
                        1
                        - F.col("t3t")
                        / (
                            F.col("n").cast("double") * F.col("n") * F.col("n")
                            - F.col("n")
                        )
                    ),
                    6,
                ),
            ).alias("h_tie_corrected"),
        )
    )


@register(
    "runs_test_daily",
    oracle="""
WITH daily AS (
  -- drop all-NULL-price days up front: a NULL daily sum has no place on
  -- the revenue axis, and it would rank NULLS FIRST in Spark's median
  -- window but NULLS LAST in DuckDB's (caught by the edge suite)
  SELECT d, x FROM (
    SELECT CAST(o_orderdate AS DATE) AS d,
           SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS x
    FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
  ) WHERE x IS NOT NULL
),
med AS (
  SELECT MAX(CASE WHEN rk = CAST(CEIL(0.5 * n) AS BIGINT) THEN x END) AS m
  FROM (SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS rk, COUNT(*) OVER () AS n
        FROM daily)
),
signs AS (
  SELECT d, CASE WHEN x > (SELECT m FROM med) THEN 1 ELSE 0 END AS above
  FROM daily WHERE x <> (SELECT m FROM med)
),
runs AS (
  SELECT above,
         CASE WHEN LAG(above) OVER (ORDER BY d) IS DISTINCT FROM above
              THEN 1 ELSE 0 END AS new_run
  FROM signs
),
agg AS (
  SELECT CAST(SUM(new_run) AS BIGINT) AS r,
         CAST(SUM(above) AS BIGINT) AS n1,
         CAST(SUM(1 - above) AS BIGINT) AS n2
  FROM runs
)
SELECT r AS n_runs, n1 AS n_above, n2 AS n_below,
       ROUND(2.0 * n1 * n2 / (n1 + n2) + 1, 6) AS expected_runs,
       ROUND((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
             / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                    / (POW(CAST(n1 + n2 AS DOUBLE), 2) * (n1 + n2 - 1))), 6) AS z
FROM agg
""",
)
def runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on daily revenue vs its DISCRETE median:
    too few runs of above/below-median days means trending/clustering,
    too many means oscillation — the distribution-free randomness check
    next to ACF and Durbin-Watson. The median is the exact rank-ceil(n/2)
    value (decimal daily sums, no interpolation); exactly-median days
    drop (standard treatment) so the signs are deterministic; run count
    is a lag-based integer fold over the calendar-ordered day grid.
    Everything is integer until the closed-form E[R]/Var[R] ratio,
    ROUND(6)."""
    daily = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum(dec("o_totalprice")).alias("x"))
        # all-NULL-price days: NULL x ranks NULLS FIRST here but NULLS
        # LAST in DuckDB — drop before the median window (see oracle)
        .filter(F.col("x").isNotNull())
    )
    w_rk = W.orderBy("x")
    w_all = W.partitionBy()
    med = (
        daily.select(
            "x",
            F.row_number().over(w_rk).alias("rk"),
            F.count(F.lit(1)).over(w_all).alias("n"),
        )
        .filter(F.col("rk") == F.ceil(0.5 * F.col("n")).cast("long"))
        .select(F.col("x").alias("m"))
    )
    signs = (
        daily.join(F.broadcast(med))
        .filter(F.col("x") != F.col("m"))
        .select("d", F.when(F.col("x") > F.col("m"), 1).otherwise(0).alias("above"))
    )
    lag_above = F.lag("above").over(W.orderBy("d"))
    runs = signs.select(
        "above",
        F.when(~lag_above.eqNullSafe(F.col("above")), 1).otherwise(0).alias("new_run"),
    )
    agg = runs.agg(
        F.sum("new_run").cast("bigint").alias("r"),
        F.sum("above").cast("bigint").alias("n1"),
        F.sum(1 - F.col("above")).cast("bigint").alias("n2"),
    )
    er = 2.0 * F.col("n1") * F.col("n2") / (F.col("n1") + F.col("n2")) + 1
    var = (
        2.0
        * F.col("n1")
        * F.col("n2")
        * (2.0 * F.col("n1") * F.col("n2") - F.col("n1") - F.col("n2"))
        / (
            F.pow((F.col("n1") + F.col("n2")).cast("double"), 2)
            * (F.col("n1") + F.col("n2") - 1)
        )
    )
    return agg.select(
        F.col("r").alias("n_runs"),
        F.col("n1").alias("n_above"),
        F.col("n2").alias("n_below"),
        F.round(er, 6).alias("expected_runs"),
        F.round((F.col("r") - er) / F.sqrt(var), 6).alias("z"),
    )


@register(
    "cohens_d_src_pair",
    oracle="""
WITH s AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(n_chars) AS BIGINT) AS sx,
         CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
  FROM documents
  WHERE source IN ('src0', 'src1') AND n_chars IS NOT NULL
  GROUP BY source
),
p AS (
  SELECT MAX(CASE WHEN source = 'src0' THEN n END) AS n0,
         MAX(CASE WHEN source = 'src1' THEN n END) AS n1,
         MAX(CASE WHEN source = 'src0' THEN sx END) AS sx0,
         MAX(CASE WHEN source = 'src1' THEN sx END) AS sx1,
         MAX(CASE WHEN source = 'src0' THEN sxx END) AS sxx0,
         MAX(CASE WHEN source = 'src1' THEN sxx END) AS sxx1
  FROM s
),
m AS (
  SELECT n0, n1,
         CAST(sx0 AS DOUBLE) / n0 AS m0, CAST(sx1 AS DOUBLE) / n1 AS m1,
         (CAST(sxx0 AS DOUBLE) - CAST(sx0 AS DOUBLE) * sx0 / n0) AS dss0,
         (CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * sx1 / n1) AS dss1
  FROM p
)
SELECT n0, n1,
       ROUND(m0 - m1, 6) AS mean_diff,
       CASE WHEN dss0 + dss1 > 0 THEN
         ROUND((m0 - m1) / SQRT((dss0 + dss1) / (n0 + n1 - 2)), 6) END AS cohens_d,
       CASE WHEN dss0 + dss1 > 0 THEN
         ROUND((m0 - m1) / SQRT((dss0 + dss1) / (n0 + n1 - 2))
               * (1 - 3.0 / (4 * (n0 + n1) - 9)), 6) END AS hedges_g
FROM m
""",
)
def cohens_d_src_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d (pooled-SD standardized mean difference, src0 vs src1
    document lengths) with the Hedges' g small-sample correction — the
    EFFECT SIZE welch_t_test's significance lacks (a tiny d can be
    'significant' at corpus n; reviewers ask for d). Same exact BIGINT
    (n, Σx, Σx²) partials as Welch; pooled variance uses the classical
    equal-variance denominator (n0+n1−2) by definition. One map-combined
    shuffle; ROUND(6) on sqrt outputs."""
    s = (
        t(spark, sf_dir, "documents")
        .filter(F.col("source").isin("src0", "src1") & F.col("n_chars").isNotNull())
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("n_chars").cast("bigint").alias("sx"),
            F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("sxx"),
        )
    )
    p = s.agg(
        F.max(F.when(F.col("source") == "src0", F.col("n"))).alias("n0"),
        F.max(F.when(F.col("source") == "src1", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("source") == "src0", F.col("sx"))).alias("sx0"),
        F.max(F.when(F.col("source") == "src1", F.col("sx"))).alias("sx1"),
        F.max(F.when(F.col("source") == "src0", F.col("sxx"))).alias("sxx0"),
        F.max(F.when(F.col("source") == "src1", F.col("sxx"))).alias("sxx1"),
    )
    m0 = F.col("sx0").cast("double") / F.col("n0")
    m1 = F.col("sx1").cast("double") / F.col("n1")
    dss0 = F.col("sxx0").cast("double") - F.col("sx0").cast("double") * F.col("sx0") / F.col("n0")
    dss1 = F.col("sxx1").cast("double") - F.col("sx1").cast("double") * F.col("sx1") / F.col("n1")
    d = (m0 - m1) / F.sqrt((dss0 + dss1) / (F.col("n0") + F.col("n1") - 2))
    # zero pooled variance (all lengths identical in both groups) -> d is
    # undefined: NULL, not an ANSI DIVIDE_BY_ZERO
    has_var = (dss0 + dss1) > 0
    return p.select(
        "n0",
        "n1",
        F.round(m0 - m1, 6).alias("mean_diff"),
        F.when(has_var, F.round(d, 6)).alias("cohens_d"),
        F.when(
            has_var,
            F.round(d * (1 - 3.0 / (4 * (F.col("n0") + F.col("n1")) - 9)), 6),
        ).alias("hedges_g"),
    )
