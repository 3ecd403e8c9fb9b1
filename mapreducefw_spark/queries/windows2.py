"""Window surface, second batch: distribution functions, nth/last value with
explicit frames, and TF-IDF term ranking (SURVEY §2B windows + M4d)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t


@register(
    "window_distribution_fns",
    oracle="""
SELECT s_suppkey, s_nationkey, s_acctbal,
       PERCENT_RANK() OVER w AS pr,
       CUME_DIST() OVER w AS cd
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
ORDER BY s_nationkey, s_suppkey
""",
)
def window_distribution_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank/cume_dist are exact rationals — cross-engine identical."""
    supp = t(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return (
        supp.select(
            "s_suppkey",
            "s_nationkey",
            "s_acctbal",
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        )
        .orderBy("s_nationkey", "s_suppkey")
    )


@register(
    "window_nth_last_value",
    oracle="""
SELECT o_custkey, o_orderkey,
       NTH_VALUE(o_totalprice, 2) OVER w AS second_price,
       LAST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS final_price
FROM orders
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey
""",
)
def window_nth_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    base = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w = base.rowsBetween(W.unboundedPreceding, W.currentRow)
    wfull = base.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
            F.last("o_totalprice").over(wfull).alias("final_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "tfidf_top_terms",
    oracle="""
WITH tf AS (
  SELECT lang, token, COUNT(*) AS tf
  FROM (SELECT lang, UNNEST(string_split(text, ' ')) AS token
        FROM documents WHERE lang IS NOT NULL)
  WHERE token <> ''
  GROUP BY lang, token
),
df AS (
  SELECT token, COUNT(DISTINCT lang) AS df FROM tf GROUP BY token
),
nlang AS (SELECT COUNT(DISTINCT lang) AS n FROM documents
          WHERE lang IS NOT NULL),
scored AS (
  SELECT tf.lang, tf.token,
         ROUND(tf.tf * LN((SELECT n FROM nlang) / CAST(df.df AS DOUBLE)), 6) AS tfidf
  FROM tf JOIN df ON tf.token = df.token
),
ranked AS (
  SELECT lang, token, tfidf,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY tfidf DESC, token) AS rk
  FROM scored
)
SELECT lang, token, tfidf, rk FROM ranked WHERE rk <= 5
ORDER BY lang, rk
""",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF over (lang, token) with lang as the 'document' unit.

    Document frequency comes from a window count over the tf table — its
    rows are already unique per (lang, token), so count(*) over (partition
    by token) IS countDistinct(lang) without the extra groupBy + self-join
    (two exchanges of the vocabulary table saved vs the naive plan)."""
    from mapreducefw_spark.operators.textprep import ensure_parallelism

    # NULL-lang docs are excluded BOTH sides: the df identity below
    # (count(*) over tf rows == countDistinct(lang)) breaks when a NULL
    # lang group exists — COUNT(DISTINCT) skips NULL while the row count
    # doesn't, silently inflating df for tokens seen in unlabeled docs
    docs = ensure_parallelism(
        t(spark, sf_dir, "documents").filter(F.col("lang").isNotNull())
    )
    tok = docs.select("lang", F.explode(F.split("text", " ")).alias("token")).filter(
        F.col("token") != ""
    )
    tf = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfw = tf.withColumn("df", F.count(F.lit(1)).over(W.partitionBy("token")))
    n_langs = docs.select(F.countDistinct("lang").alias("n"))
    scored = dfw.crossJoin(F.broadcast(n_langs)).select(
        "lang",
        "token",
        F.round(F.col("tf") * F.log(F.col("n") / F.col("df").cast("double")), 6).alias("tfidf"),
    )
    from mapreducefw_spark.operators.rank import topk_per_key

    # two-phase per-key top-k (operators/rank.py): no one-task-per-lang sort
    return (
        topk_per_key(scored, ["lang"], [F.desc("tfidf"), F.col("token")], 5)
        .select("lang", "token", "tfidf", "rk")
        .orderBy("lang", "rk")
    )
