"""Round-12 registrations, batch 3: the privacy tier — differential
privacy for released aggregates.

Training-data pipelines publish corpus statistics (per-source counts,
attribute rates) whose release leaks membership; the two standard
remedies are output perturbation and input perturbation:

1. ``dp_noisy_counts`` — epsilon-differentially-private per-source
   document counts under the GEOMETRIC MECHANISM (Ghosh, Roughgarden &
   Sundararajan 2009, "Universally utility-maximizing privacy
   mechanisms" — the discrete counterpart of Laplace, utility-optimal
   for counting queries): noisy = max(0, count + Z) with Z two-sided
   geometric, P(Z=z) proportional to alpha^|z|, alpha = exp(-epsilon).
2. ``randomized_response_estimate`` — the Warner 1965 local-DP protocol
   over a per-document boolean (lang = 'en'): each report is truthful
   with probability p = e^eps/(1+e^eps), flipped otherwise; the released
   per-source rate is the standard debiased estimator
   (observed - n(1-p)) / (2p - 1).

Cross-engine determinism — the part that makes a NOISE mechanism
oracle-pairable: the random draws are SEEDED HASHES, not RNG state. A
48-bit uniform integer comes from md5 of the row key (the repo's
portable-hash idiom), and the inverse CDF is a PRECOMPUTED INTEGER
THRESHOLD TABLE (u < t_k comparisons over BIGINT literals baked into
both the Spark when-chain and the SQL CASE from the same Python list),
so both engines draw bit-identical noise. The only floats are the
epsilon literal and the debiasing expression — single IEEE mul/div of
identical inputs, exact on both engines. Seeded-hash noise is standard
practice for reproducible DP releases (and required for re-runnable
pipelines); the epsilon accounting is identical to true-random draws
PROVIDED the salt stays secret — documented as the deployment contract.

Scale posture (100 TB): both queries are ONE map-side-combined
aggregation (per-source counts / per-source flag sums) followed by an
O(groups) map-only noise projection. No extra shuffle for the noise, no
Python, no collect. The threshold when-chain is constant-size (61
branches) inside whole-stage codegen.

Semantic contract with the reference engine: map -> shuffle by key ->
reduce, the job shape of `/root/reference/MapReduceClient.h:47-51`.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t

EPSILON = 1.0
ALPHA = math.exp(-EPSILON)  # geometric-mechanism decay
NOISE_CAP = 30  # |Z| <= 30: P(|Z| > 30) = alpha^31/(1+alpha) ~ 2.5e-14,
# at the 2^-48 grid ~7 lattice points — the inverse CDF clamps the
# sub-resolution tails to +-NOISE_CAP deterministically on both engines
U_BITS = 48  # md5-prefix uniform resolution (the repo's portable-hash width)

# RR truth probability p = e^eps / (1 + e^eps); keep-threshold on the u grid
RR_P = math.exp(EPSILON) / (1.0 + math.exp(EPSILON))
RR_KEEP_T = round(RR_P * (1 << U_BITS))
# debias constants precomputed in Python and embedded as DOUBLE-cast
# literals: DuckDB parses a bare decimal literal as DECIMAL, so in-SQL
# arithmetic like 1.0 - p would run in decimal and drift a ulp from the
# double pipeline — both engines must consume the SAME two doubles
RR_Q = 1.0 - RR_P  # flip mass
RR_D = 2.0 * RR_P - 1.0  # debias denominator


def _geometric_thresholds() -> list[tuple[int, int]]:
    """(k, t_k) rows with t_k = round(CDF(k) * 2^48): noise(u) = smallest k
    with u < t_k, else +NOISE_CAP. Two-sided geometric CDF:
    CDF(k) = alpha^(-k)/(1+alpha) for k < 0, 1 - alpha^(k+1)/(1+alpha) else.
    Python floats here become shared INTEGER literals in both engines, so
    any float detail of this computation is immaterial to the pairing."""
    rows = []
    for k in range(-NOISE_CAP, NOISE_CAP):
        if k < 0:
            cdf = ALPHA ** (-k) / (1.0 + ALPHA)
        else:
            cdf = 1.0 - ALPHA ** (k + 1) / (1.0 + ALPHA)
        rows.append((k, round(cdf * (1 << U_BITS))))
    return rows


_THRESHOLDS = _geometric_thresholds()


def geometric_noise_col(u: Column) -> Column:
    """Inverse-CDF map of a 48-bit uniform column to two-sided geometric
    noise — a constant 61-branch when-chain in whole-stage codegen."""
    expr = None
    for k, tk in _THRESHOLDS:
        cond = u < F.lit(tk)
        expr = F.when(cond, F.lit(k)) if expr is None else expr.when(cond, F.lit(k))
    return expr.otherwise(F.lit(NOISE_CAP)).cast("bigint")


def _geometric_noise_sql(u_expr: str) -> str:
    branches = "\n".join(
        f"    WHEN {u_expr} < {tk} THEN {k}" for k, tk in _THRESHOLDS
    )
    return f"CAST(CASE\n{branches}\n    ELSE {NOISE_CAP} END AS BIGINT)"


def _u48(col: Column, salt: str) -> Column:
    """48-bit uniform from md5(salt || key) — the portable-hash idiom."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col)), 1, 12), 16, 10
    ).cast("bigint")


def _u48_sql(expr: str, salt: str) -> str:
    return f"CAST(('0x' || substr(md5('{salt}' || {expr}), 1, 12)) AS BIGINT)"


@register(
    "dp_noisy_counts",
    oracle=f"""
WITH counts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents WHERE source IS NOT NULL GROUP BY source
)
SELECT source,
       GREATEST(CAST(0 AS BIGINT),
                c + {_geometric_noise_sql(_u48_sql("source", "dpgeo:"))})
         AS noisy_count,
       CAST({EPSILON} AS DOUBLE) AS epsilon
FROM counts
""",
)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source doc counts under the eps=1 geometric mechanism, clamped
    nonnegative (post-processing preserves DP). ONE map-side-combined
    count shuffle + an O(sources) noise projection."""
    counts = (
        t(spark, sf_dir, "documents")
        .filter(F.col("source").isNotNull())
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    noise = geometric_noise_col(_u48(F.col("source"), "dpgeo:"))
    return counts.select(
        "source",
        F.greatest(F.lit(0).cast("bigint"), F.col("c") + noise).alias("noisy_count"),
        F.lit(EPSILON).cast("double").alias("epsilon"),
    )


@register(
    "randomized_response_estimate",
    oracle=f"""
WITH reports AS (
  SELECT source,
         CASE WHEN {_u48_sql("CAST(doc_id AS VARCHAR)", "rrflip:")} < {RR_KEEP_T}
              THEN (CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
              ELSE (CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
         END AS report
  FROM documents
  WHERE source IS NOT NULL AND doc_id IS NOT NULL AND lang IS NOT NULL
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(report) AS BIGINT) AS observed_yes,
       (CAST(SUM(report) AS DOUBLE) - COUNT(*) * CAST({RR_Q!r} AS DOUBLE))
         / CAST({RR_D!r} AS DOUBLE) AS debiased_yes
FROM reports GROUP BY source
""",
)
def randomized_response_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warner 1965 randomized response over (lang = 'en'): per-doc seeded
    coin keeps the truth with p = e/(1+e), flips otherwise; per-source
    debiased rate released. Map-only perturbation + one count shuffle;
    the debias is single IEEE ops of identical inputs on both engines."""
    d = t(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull()
        & F.col("doc_id").isNotNull()
        & F.col("lang").isNotNull()
    )
    truth = F.when(F.col("lang") == "en", 1).otherwise(0)
    keep = _u48(F.col("doc_id").cast("string"), "rrflip:") < F.lit(RR_KEEP_T)
    report = F.when(keep, truth).otherwise(1 - truth)
    return (
        d.select("source", report.alias("report"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("report").cast("bigint").alias("observed_yes"),
        )
        .select(
            "source",
            "n",
            "observed_yes",
            (
                (F.col("observed_yes").cast("double") - F.col("n") * F.lit(RR_Q))
                / F.lit(RR_D)
            ).alias("debiased_yes"),
        )
    )
