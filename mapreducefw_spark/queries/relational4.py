"""Fourth batch: skew-salted aggregation, SCD2 merge emulation,
explode/posexplode, input_file_name catalog scan, sampling, Python UDTF."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import dec, t


@register(
    "salted_skew_aggregate",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total,
       COUNT(l_quantity) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def salted_skew_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a 3-value (maximally hot) key —
    the oracle is the PLAIN group-by, proving salting is result-invariant."""
    from mapreducefw_spark.operators.skew import salted_sum_count

    li = t(spark, sf_dir, "lineitem")
    out = salted_sum_count(
        li, ["l_returnflag"], dec("l_quantity"), salt=16, sum_alias="_t", count_alias="n"
    )
    return out.select(
        "l_returnflag", F.col("_t").cast("double").alias("total"), "n"
    ).orderBy("l_returnflag")


@register(
    "skew_join_events_orders",
    oracle="""
WITH ev AS (
  SELECT CASE WHEN user_id % 10 < 9 THEN 7 ELSE user_id END AS k, value
  FROM events
)
SELECT o_orderpriority,
       COUNT(*) AS n_pairs,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS event_value
FROM ev JOIN orders ON o_custkey = ev.k
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def skew_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact x fact join with a deliberate heavy-hitter key: 90% of events
    collapse onto one user, so one shuffle partition carries ~90% of the
    left side. The join is pinned to the shuffle path with a MERGE hint (a
    100 TB fact side cannot broadcast) and relies on AQE's skew-join split
    for the oversized partition (session sets skewJoin.enabled; the split is
    asserted under lowered thresholds in tests/test_plan_shapes.py). The
    downstream aggregate keys on o_orderpriority, NOT the join key — an agg
    on the join key would force AQE to preserve the join's hash partitioning
    and forbid the skew split. The fact side is spread first: AQE splits a
    skewed partition at mapper-output granularity, so a single-mapper input
    (one-file fixture parquet) is unsplittable no matter how skewed. The
    oracle is the plain join — skew handling is result-invariant."""
    from mapreducefw_spark.operators.textprep import ensure_parallelism

    ev = ensure_parallelism(t(spark, sf_dir, "events")).select(
        F.when(F.col("user_id") % 10 < 9, F.lit(7)).otherwise(F.col("user_id")).alias("k"),
        "value",
    )
    orders = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"), "o_totalprice", "o_orderpriority"
    )
    return (
        ev.join(orders.hint("merge"), "k")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("event_value"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "scd2_merge_emulation",
    oracle="""
WITH updates AS (
  SELECT c_custkey, c_acctbal * 1.1 AS new_bal
  FROM customer WHERE c_mktsegment = 'BUILDING'
)
SELECT c.c_custkey,
       CASE WHEN u.c_custkey IS NOT NULL THEN u.new_bal ELSE c.c_acctbal END AS acctbal,
       CASE WHEN u.c_custkey IS NOT NULL THEN 1 ELSE 0 END AS was_updated
FROM customer c LEFT JOIN updates u ON c.c_custkey = u.c_custkey
ORDER BY c.c_custkey
""",
)
def scd2_merge_emulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation without Delta (SNIPPETS pattern: anti-join the
    untouched rows + union the updated ones); expressed here as one left
    join so the oracle is a single statement."""
    cust = t(spark, sf_dir, "customer")
    updates = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("u_key"), (F.col("c_acctbal") * 1.1).alias("new_bal")
    )
    merged = cust.join(updates, cust.c_custkey == updates.u_key, "left")
    return merged.select(
        "c_custkey",
        F.when(F.col("u_key").isNotNull(), F.col("new_bal")).otherwise(F.col("c_acctbal")).alias("acctbal"),
        F.when(F.col("u_key").isNotNull(), 1).otherwise(0).alias("was_updated"),
    ).orderBy("c_custkey")


@register(
    "explode_posexplode_tokens",
    oracle="""
SELECT doc_id, t.pos, t.token
FROM (
  SELECT doc_id,
         UNNEST(list_transform(string_split(text, ' '),
                               (x, i) -> struct_pack(pos := i - 1, token := x))) AS t
  FROM documents
  WHERE doc_id < 20
)
ORDER BY doc_id, t.pos
""",
)
def explode_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode — the 1->N generator surface (REF #3's flat map as SQL)."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return (
        docs.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))
        .orderBy("doc_id", "pos")
    )


@register(
    "catalog_input_file_name",
    oracle="""
SELECT 'lineitem.parquet' AS file_name, COUNT(*) AS n FROM lineitem
""",
)
def catalog_input_file_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """input_file_name(): every row tagged with its source file — the
    catalog/lineage surface (reference #12's directory-scan analog)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.select(F.element_at(F.split(F.input_file_name(), "/"), -1).alias("file_name"))
        .groupBy("file_name")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register("tablesample_seeded")  # sampling is engine-specific -> rows-only
def tablesample_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return orders.sample(fraction=0.1, seed=42).select("o_orderkey", "o_totalprice")


@register(
    "python_udtf_bigrams",
    oracle="""
SELECT doc_id, bigram, n
FROM (
  SELECT doc_id, bigram, COUNT(*) AS n,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY COUNT(*) DESC, bigram) AS rk
  FROM (
    SELECT doc_id,
           UNNEST(list_transform(range(1, len(string_split(text,' '))),
                                 i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS bigram
    FROM documents WHERE doc_id < 50
  )
  GROUP BY doc_id, bigram
)
WHERE rk = 1
ORDER BY doc_id
""",
)
def python_udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 3.5+ table function): one input row -> N bigram
    rows, then top bigram per doc. The UDTF is the lateral-join surface;
    falls back to posexplode composition if UDTFs are unavailable."""
    from pyspark.sql import Window as W

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    try:
        from pyspark.sql.functions import udtf

        @udtf(returnType="doc_id bigint, bigram string")
        class Bigrams:
            def eval(self, doc_id: int, text: str):
                if text is None:  # NULL text: no rows (matches the oracle)
                    return
                toks = text.split(" ")
                for a, b in zip(toks, toks[1:]):
                    yield doc_id, f"{a} {b}"

        spark.udtf.register("bigrams_udtf", Bigrams)
        docs.createOrReplaceTempView("_udtf_docs")
        grams = spark.sql(
            "SELECT b.doc_id, b.bigram FROM _udtf_docs d, "
            "LATERAL bigrams_udtf(d.doc_id, d.text) b"
        )
    except ImportError:
        toks = F.split("text", " ")
        # greatest(...) guard: a 1-token doc would make sequence(1, 0) count
        # DOWN to [1, 0] and element_at(toks, 0) throws under ANSI mode
        grams = docs.filter(F.size(toks) >= 2).select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(1))),
                    lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
                )
            ).alias("bigram"),
        )
    counts = grams.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("doc_id").orderBy(F.desc("n"), "bigram")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "bigram", "n")
        .orderBy("doc_id")
    )
