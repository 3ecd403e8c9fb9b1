"""Round-8 batch 4: privacy auditing, BM25 retrieval scoring, classic
gaps-and-islands, conversion latency, and modern SQL surface.

Semantic contract with the reference engine: each query is the
map -> shuffle-by-key -> reduce -> sort job shape
(`/root/reference/MapReduceClient.h:47-51`, `MRFCore.cpp:252-446`).

Scale posture:
- ``k_anonymity_report``: one quasi-identifier groupBy (map-combined),
  then O(classes) histogramming — the class-size frame is
  cardinality-bounded, rows never re-shuffle.
- ``bm25_scores``: df/idf from the postings aggregate (vocabulary-sized
  broadcast), per-doc tf map-side — one scan, one tiny join.
- ``activity_islands_per_user``: the island key (day − dense day rank)
  comes from one user-partitioned window; islands aggregate on the same
  user-hash exchange.
- ``conversion_time_percentiles``: one user-keyed exchange shared by the
  as-of pairing window and the final percentile aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t

K_ANON_THRESHOLD = 5  # classes smaller than this are re-identification risks


@register(
    "k_anonymity_report",
    oracle=f"""
WITH classes AS (
  SELECT c_mktsegment AS seg, c_nationkey AS nat,
         CAST(COUNT(*) AS BIGINT) AS k,
         CAST(COUNT(DISTINCT c_acctbal) AS BIGINT) AS l_div
  FROM customer
  GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(k) AS BIGINT) AS n_rows,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(SUM(CASE WHEN k < {K_ANON_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT)
           AS classes_below_k,
       CAST(SUM(CASE WHEN k < {K_ANON_THRESHOLD} THEN k ELSE 0 END) AS BIGINT)
           AS rows_below_k,
       ROUND(CAST(SUM(CASE WHEN k < {K_ANON_THRESHOLD} THEN k ELSE 0 END) AS DOUBLE)
             / SUM(k), 6) AS frac_rows_at_risk,
       CAST(MIN(l_div) AS BIGINT) AS min_l_diversity
FROM classes
""",
)
def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit over the (market segment,
    nation) quasi-identifier: equivalence-class sizes, the share of rows
    in classes smaller than k=5 (re-identifiable under linkage), and the
    minimum l-diversity of the account-balance "sensitive" column — the
    standard pre-release privacy screen next to mask_pii_columns'
    redaction. All counts exact integers; one int/int division ROUND(6).
    One map-combined QI groupBy; the class frame is QI-cardinality
    sized. NULL QI values form their own class on both engines."""
    classes = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("c_nationkey").alias("nat"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k"),
            F.countDistinct("c_acctbal").cast("bigint").alias("l_div"),
        )
    )
    below = F.when(F.col("k") < K_ANON_THRESHOLD, F.col("k")).otherwise(0)
    return classes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum("k").cast("bigint").alias("n_rows"),
        F.min("k").cast("bigint").alias("min_k"),
        F.sum((F.col("k") < K_ANON_THRESHOLD).cast("int"))
        .cast("bigint")
        .alias("classes_below_k"),
        F.sum(below).cast("bigint").alias("rows_below_k"),
        F.round(F.sum(below).cast("double") / F.sum("k"), 6).alias(
            "frac_rows_at_risk"
        ),
        F.min("l_div").cast("bigint").alias("min_l_diversity"),
    )


BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("the", "data", "pipeline")  # fixed query term set


@register(
    "bm25_scores",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents WHERE text IS NOT NULL
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         SUM(len(w)) / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM toks
),
tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS f, ANY_VALUE(dl) AS dl
  FROM (SELECT doc_id, unnest(w) AS tok, len(w) AS dl FROM toks)
  WHERE tok IN {BM25_QUERY}
  GROUP BY doc_id, tok
),
idf AS (
  SELECT tok, ln(1 + (n_docs - df + 0.5) / (df + 0.5)) AS idf
  FROM (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok), stats
),
scored AS (
  SELECT tf.doc_id,
         SUM(idf.idf * (tf.f * ({BM25_K1} + 1))
             / (tf.f + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * tf.dl / stats.avgdl)))
           AS score
  FROM tf JOIN idf USING (tok), stats
  GROUP BY tf.doc_id
),
ranked AS (
  SELECT doc_id, ROUND(score, 6) AS bm25,
         ROW_NUMBER() OVER (ORDER BY ROUND(score, 6) DESC, doc_id) AS rk
  FROM scored
)
SELECT doc_id, bm25, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= 20
ORDER BY rk
""",
)
def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 for a fixed query term set — the retrieval
    scorer the inverted_index_postings / tfidf_top_terms pair exists to
    feed: idf = ln(1 + (N − df + ½)/(df + ½)), tf saturation k1=1.2,
    length normalization b=0.75. Per-term contributions divide identical
    doubles (exact-integer tf/df/dl; avgdl the same division both
    engines); the ≤|query|-term fold takes ROUND(6), and ranking happens
    on the ROUNDED score with a doc_id tiebreak — ranking on the raw
    double would let the engine-specific (and per-run nondeterministic)
    summation order of the ≤3-term fold swap near-tied docs at the
    top-20 boundary. The query-term filter
    prunes the explode before any shuffle; df/avgdl ride 1-row/vocab
    broadcasts; the top-20 is a TakeOrdered, not a global sort."""
    toks = (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.filter(F.split("text", " "), lambda x: x != "").alias("w"),
        )
    )
    stats = toks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (F.sum(F.size("w")) / F.count(F.lit(1)).cast("double")).alias("avgdl"),
    )
    tf = (
        toks.select("doc_id", F.size("w").alias("dl"), F.explode("w").alias("tok"))
        .filter(F.col("tok").isin(*BM25_QUERY))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"), F.any_value("dl").alias("dl"))
    )
    idf = (
        tf.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .select(
            "tok",
            F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)).alias(
                "idf"
            ),
        )
    )
    term = F.col("idf") * (F.col("f") * (BM25_K1 + 1)) / (
        F.col("f")
        + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(idf), "tok")
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .groupBy("doc_id")
        .agg(F.sum(term).alias("score"))
    )
    rounded = scored.select("doc_id", F.round("score", 6).alias("bm25"))
    rk = F.row_number().over(W.orderBy(F.desc("bm25"), "doc_id"))
    return (
        rounded.withColumn("rk", rk)
        .filter(F.col("rk") <= 20)
        .select("doc_id", "bm25", F.col("rk").cast("int"))
        .orderBy("rk")
    )


@register(
    "activity_islands_per_user",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
keyed AS (
  SELECT user_id, d,
         d - TO_DAYS(CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS INT))
           AS island_key
  FROM days
),
islands AS (
  SELECT user_id, island_key,
         CAST(COUNT(*) AS BIGINT) AS len_days,
         MIN(d) AS island_start
  FROM keyed GROUP BY 1, 2
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(MAX(len_days) AS BIGINT) AS longest_island,
       MIN(island_start) AS first_active,
       CAST(SUM(len_days) AS BIGINT) AS active_days
FROM islands
GROUP BY user_id
ORDER BY user_id
""",
)
def activity_islands_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over per-user activity days — the classic
    consecutive-streak idiom (date minus dense day rank is constant
    within a run of consecutive CALENDAR days): islands per user,
    longest streak, first activity, total active days. This is the
    calendar-streak complement to sessionization_30m's wall-clock gaps.
    One distinct (user, day) shuffle; the rank window and both
    aggregations reuse the same user-hash partitioning; per-user day
    frames are calendar-bounded."""
    days = (
        t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("d"))
    keyed = days.select(
        "user_id", "d", F.date_sub("d", rn).alias("island_key")
    )
    islands = keyed.groupBy("user_id", "island_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("len_days"),
        F.min("d").alias("island_start"),
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_islands"),
            F.max("len_days").cast("bigint").alias("longest_island"),
            F.min("island_start").alias("first_active"),
            F.sum("len_days").cast("bigint").alias("active_days"),
        )
        .orderBy("user_id")
    )


@register(
    "conversion_time_percentiles",
    oracle="""
WITH purch AS (
  SELECT user_id, ts, event_id
  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL AND user_id IS NOT NULL
),
views AS (
  SELECT user_id, ts
  FROM events WHERE event_type = 'view' AND ts IS NOT NULL AND user_id IS NOT NULL
),
latency AS (
  SELECT p.user_id, p.event_id,
         epoch_us(p.ts) - MAX(epoch_us(v.ts)) AS us
  FROM purch p JOIN views v
    ON v.user_id = p.user_id AND v.ts <= p.ts
  GROUP BY p.user_id, p.event_id, epoch_us(p.ts)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_conversions,
       ROUND(quantile_cont(us / 1000000.0, 0.5), 6) AS p50_sec,
       ROUND(quantile_cont(us / 1000000.0, 0.9), 6) AS p90_sec,
       ROUND(quantile_cont(us / 1000000.0, 0.99), 6) AS p99_sec
FROM latency
""",
)
def conversion_time_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View-to-purchase conversion latency percentiles: each purchase
    pairs with the LATEST preceding view by the same user (the as-of
    contract of asof_join_latest_order, applied within one event table),
    then p50/p90/p99 of the latency — the funnel-speed KPI next to
    view_click_attribution's which-touch question. Latencies are exact
    integer microsecond differences; the interpolated percentiles match
    type-7 on identical multisets; ROUND(6). The as-of pairing is the
    single-shuffle tagged-union + per-user running-max window (no
    fact×fact range join); percentiles aggregate one number per
    conversion."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    tagged = ev.filter(F.col("event_type").isin("view", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        (F.col("event_type") == "view").alias("is_view"),
        F.when(F.col("event_type") == "view", F.unix_micros("ts")).alias("view_us"),
    )
    # running max of view timestamps over (ts, view-first on ties) gives
    # each purchase its latest view at or before it in ONE pass
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", F.desc("is_view"), "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    lat = (
        tagged.select(
            "user_id",
            "ts",
            "event_id",
            "is_view",
            F.max("view_us").over(w).alias("last_view_us"),
        )
        .filter(~F.col("is_view") & F.col("last_view_us").isNotNull())
        .select(
            ((F.unix_micros("ts") - F.col("last_view_us")) / 1000000.0).alias("sec")
        )
    )
    return lat.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
        F.round(F.percentile("sec", F.lit(0.5)), 6).alias("p50_sec"),
        F.round(F.percentile("sec", F.lit(0.9)), 6).alias("p90_sec"),
        F.round(F.percentile("sec", F.lit(0.99)), 6).alias("p99_sec"),
    )


@register(
    "sql_group_by_all",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ALL
ORDER BY ALL
""",
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern SQL surface: GROUP BY ALL / ORDER BY ALL (Spark 4 and
    DuckDB both infer the grouping set from the non-aggregate select
    items and the sort from the full select list) — the
    boilerplate-free aggregation form, run as literal SQL text through
    spark.sql over a registered temp view. Decimal-exact sums; same
    q1-class scan+agg plan as the hand-built API forms."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gba")
    return t(spark, sf_dir, "lineitem").sparkSession.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem_gba
        GROUP BY ALL
        ORDER BY ALL
        """
    )
