"""Round-12 registrations, batch 8: the classifier-evaluation tier.

A curation classifier isn't done when it scores — a pipeline team needs
its operating characteristics before picking a keep threshold. Three
standard measurements over the pipeline38 published quality classifier
(sha256 dyadic k/64 weights), with the Gopher rule bit as the reference
label, all oracle-EXACT:

1. ``classifier_pr_curve`` — confusion counts + precision/recall at a
   17-point threshold grid over the logit (the PR curve a threshold
   choice reads). Counts are integers; P/R are single bigint/bigint
   divisions.
2. ``score_calibration_bins`` — the reliability-diagram table: logits
   bucketed on a dyadic grid (floor(logit * 2), clamped to [-8, 8]),
   per-bin count, positive count, empirical rate and mean logit.
3. ``cohens_kappa_rules`` — chance-corrected agreement (Cohen 1960)
   between the classifier verdict (logit > 0) and the Gopher rule: the
   2x2 contingency plus po/pe/kappa.

Why this can be exact across engines: every logit is bias + a sum of
k/64 dyadic weights — each partial sum is an exact binary fraction, so
double addition is ORDER-INDEPENDENT (the pipeline38 contract) and
threshold/floor comparisons against dyadic grid literals are exact on
both engines; all remaining floats are divisions/products of identical
inputs written with the same expression tree on both sides (kappa's pe
divides BEFORE multiplying — n * n would overflow BIGINT at corpus
scale, (r/n)*(c/n) cannot).

Scale posture (100 TB): each query is ONE document scan (the same
zero-explode HOF-fold logit as quality_classifier_scores) followed by a
grid-bounded aggregation — 17 thresholds x 4 counts, 17 bins, or one
2x2 contingency; the PR grid joins as a broadcast literal array. No
per-row Python, no second scan, no data-sized shuffle (the group-by
keys are grid cells, map-side combined).

Semantic contract with the reference engine: map (per-record score) ->
shuffle by grid key -> reduce (count folds), the Emit2/Reduce shape of
`/root/reference/MapReduceClient.h:47-51`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t
from mapreducefw_spark.queries.pipeline38 import (
    _bucket,
    _gopher_passes,
    _QC_BIAS,
    _QC_W,
    _scored_cte_sql,
)

# dyadic threshold grid: -2.00, -1.75, ..., +2.00 (k/4 is an exact double,
# and logits are multiples of 1/64, so logit > thr never sits on a rounding
# boundary disagreement)
PR_THRESHOLDS = [k / 4.0 for k in range(-8, 9)]
CAL_BIN_LO, CAL_BIN_HI = -8, 8  # floor(logit * 2) clamp bounds


def _scored_sql() -> str:
    """The shared (doc_id, logit, passes) CTE — pipeline38's
    ``_scored_cte_sql`` composed verbatim (ONE definition for the scoring
    and evaluation tiers, so the two SQL texts cannot drift — ADVICE r12):
    HOF logit fold over the 64 dyadic literals, the Gopher rule bit as
    the reference label."""
    return "\n" + _scored_cte_sql("doc_id")


def scored_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, logit, passes): one scan, zero explode — the pipeline38
    deployment-shape scoring pass."""
    from mapreducefw_spark.operators.textprep import ensure_parallelism

    warr = F.array(*[F.lit(v) for v in _QC_W])
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    # spread the unsplittable single-row-group scan BEFORE the per-token
    # md5 bucket fold + Gopher rules (guide §2.5 — the same fix as the
    # gram scans, r14): the logit is a per-row fold over exact dyadic
    # weights and every consumer aggregate is integer counts or sums of
    # 1/64-multiples, so placement cannot change any result.
    d = (
        ensure_parallelism(
            t(spark, sf_dir, "documents")
            .filter(F.col("text").isNotNull())
            .select("doc_id", "text")
        )
        .select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") > 0)
    )
    logit = F.aggregate(
        "toks",
        F.lit(_QC_BIAS),
        lambda acc, tk: acc + F.element_at(warr, (_bucket(tk) + 1).cast("int")),
    )
    return d.select(
        "doc_id",
        logit.alias("logit"),
        _gopher_passes("toks").cast("int").alias("passes"),
    )


def _div(num: Column, den: Column) -> Column:
    return F.when(den > 0, num.cast("double") / den)


@register(
    "classifier_pr_curve",
    oracle=f"""
WITH {_scored_sql()},
grid AS (SELECT UNNEST({PR_THRESHOLDS!r}::DOUBLE[]) AS threshold),
conf AS (
  SELECT g.threshold,
         CAST(SUM(CASE WHEN s.logit > g.threshold AND s.passes = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN s.logit > g.threshold AND s.passes = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN s.logit <= g.threshold AND s.passes = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         CAST(SUM(CASE WHEN s.logit <= g.threshold AND s.passes = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM scored s CROSS JOIN grid g
  GROUP BY g.threshold
)
SELECT threshold, tp, fp, fn, tn,
       CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) END AS precision_,
       CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) END AS recall_
FROM conf
""",
)
def classifier_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion counts + precision/recall at each grid threshold: one
    scan crossed with the broadcast 17-row grid, grid-keyed counts."""
    s = scored_frame(spark, sf_dir)
    grid = spark.createDataFrame(
        [(v,) for v in PR_THRESHOLDS], "threshold double"
    )
    pred = F.col("logit") > F.col("threshold")
    pos = F.col("passes") == 1
    conf = (
        s.crossJoin(F.broadcast(grid))
        .groupBy("threshold")
        .agg(
            F.sum((pred & pos).cast("int")).cast("bigint").alias("tp"),
            F.sum((pred & ~pos).cast("int")).cast("bigint").alias("fp"),
            F.sum((~pred & pos).cast("int")).cast("bigint").alias("fn"),
            F.sum((~pred & ~pos).cast("int")).cast("bigint").alias("tn"),
        )
    )
    return conf.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        _div(F.col("tp"), F.col("tp") + F.col("fp")).alias("precision_"),
        _div(F.col("tp"), F.col("tp") + F.col("fn")).alias("recall_"),
    )


@register(
    "score_calibration_bins",
    oracle=f"""
WITH {_scored_sql()}
SELECT GREATEST({CAL_BIN_LO}, LEAST({CAL_BIN_HI},
           CAST(FLOOR(logit * 2) AS BIGINT))) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(passes) AS BIGINT) AS n_pass,
       CAST(SUM(passes) AS DOUBLE) / COUNT(*) AS pass_rate,
       SUM(logit) / COUNT(*) AS mean_logit
FROM scored
GROUP BY 1
""",
)
def score_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram table: half-unit logit bins (dyadic floor is
    exact), per-bin empirical Gopher-pass rate and mean logit (logits are
    multiples of 1/64 — their double sum is exact and order-free)."""
    s = scored_frame(spark, sf_dir)
    bin_ = F.greatest(
        F.lit(CAL_BIN_LO).cast("bigint"),
        F.least(F.lit(CAL_BIN_HI).cast("bigint"), F.floor(F.col("logit") * 2)),
    ).cast("bigint")
    return (
        s.groupBy(bin_.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("passes").cast("bigint").alias("n_pass"),
            (F.sum("passes").cast("double") / F.count(F.lit(1))).alias("pass_rate"),
            (F.sum("logit") / F.count(F.lit(1))).alias("mean_logit"),
        )
    )


@register(
    "cohens_kappa_rules",
    oracle=f"""
WITH {_scored_sql()},
conf AS (
  SELECT CAST(SUM(CASE WHEN logit > 0 AND passes = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
         CAST(SUM(CASE WHEN logit > 0 AND passes = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
         CAST(SUM(CASE WHEN logit <= 0 AND passes = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
         CAST(SUM(CASE WHEN logit <= 0 AND passes = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM scored
)
SELECT n, n11, n10, n01, n00,
       CAST(n11 + n00 AS DOUBLE) / n AS po,
       (CAST(n11 + n10 AS DOUBLE) / n) * (CAST(n11 + n01 AS DOUBLE) / n)
         + (CAST(n01 + n00 AS DOUBLE) / n) * (CAST(n10 + n00 AS DOUBLE) / n) AS pe,
       CASE WHEN 1.0 - ((CAST(n11 + n10 AS DOUBLE) / n) * (CAST(n11 + n01 AS DOUBLE) / n)
                 + (CAST(n01 + n00 AS DOUBLE) / n) * (CAST(n10 + n00 AS DOUBLE) / n)) <> 0.0
            THEN (CAST(n11 + n00 AS DOUBLE) / n
                  - ((CAST(n11 + n10 AS DOUBLE) / n) * (CAST(n11 + n01 AS DOUBLE) / n)
                     + (CAST(n01 + n00 AS DOUBLE) / n) * (CAST(n10 + n00 AS DOUBLE) / n)))
                 / (1.0 - ((CAST(n11 + n10 AS DOUBLE) / n) * (CAST(n11 + n01 AS DOUBLE) / n)
                     + (CAST(n01 + n00 AS DOUBLE) / n) * (CAST(n10 + n00 AS DOUBLE) / n)))
       END AS kappa
FROM conf
WHERE n > 0
""",
)
def cohens_kappa_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the classifier verdict (logit > 0) and the
    Gopher rule: the 2x2 contingency as exact BIGINTs; po/pe/kappa as the
    SAME divide-before-multiply expression tree as the oracle (n * n
    would overflow BIGINT at corpus scale — marginal fractions cannot)."""
    s = scored_frame(spark, sf_dir)
    pred = F.col("logit") > 0
    pos = F.col("passes") == 1
    conf = s.agg(
        F.sum((pred & pos).cast("int")).cast("bigint").alias("n11"),
        F.sum((pred & ~pos).cast("int")).cast("bigint").alias("n10"),
        F.sum((~pred & pos).cast("int")).cast("bigint").alias("n01"),
        F.sum((~pred & ~pos).cast("int")).cast("bigint").alias("n00"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    ).filter(F.col("n") > 0)
    nd = F.col("n")
    po = (F.col("n11") + F.col("n00")).cast("double") / nd
    pe = ((F.col("n11") + F.col("n10")).cast("double") / nd) * (
        (F.col("n11") + F.col("n01")).cast("double") / nd
    ) + ((F.col("n01") + F.col("n00")).cast("double") / nd) * (
        (F.col("n10") + F.col("n00")).cast("double") / nd
    )
    return conf.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        po.alias("po"),
        pe.alias("pe"),
        F.when((F.lit(1.0) - pe) != 0.0, (po - pe) / (F.lit(1.0) - pe)).alias(
            "kappa"
        ),
    )
