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
    bucket the axis first at 100 TB if the grid grows."""
    d = t(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1") & F.col("n_chars").isNotNull()
    )
    vals = d.groupBy(F.col("n_chars").alias("v")).agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0))
        .cast("bigint")
        .alias("c0"),
        F.sum(F.when(F.col("source") == "src1", 1).otherwise(0))
        .cast("bigint")
        .alias("c1"),
    )
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
