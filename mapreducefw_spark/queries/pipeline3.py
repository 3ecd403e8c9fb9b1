"""Pipeline batch 3: corpus-mixing weights and snapshot-merge dedup.

``source_mix_weights`` is the data-mixing step of a pre-training pipeline:
per-source token shares and the resampling weight that flattens the mix to a
target distribution. ``cross_snapshot_jaccard`` / ``cross_snapshot_minhash``
are the snapshot-merge dedup: which docs of a new crawl near-duplicate the
corpus already ingested (A x B, never intra-corpus pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.operators import dedup
from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t


@register(
    "source_mix_weights",
    oracle="""
WITH per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents
  GROUP BY source
),
tot AS (SELECT SUM(n_tokens) AS tot_tokens, COUNT(*) AS n_sources FROM per)
SELECT source, n_docs, n_tokens,
       CAST(n_tokens AS DOUBLE) / tot_tokens AS token_share,
       (1.0 / n_sources) / (CAST(n_tokens AS DOUBLE) / tot_tokens) AS resample_weight
FROM per, tot
ORDER BY source
""",
)
def source_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token share + the weight that resamples the corpus to a
    uniform source mix (weight = target_share / actual_share). One shuffle:
    the per-source aggregate; the corpus totals fold in via a broadcast of
    the (tiny) aggregated frame, no driver action. Raw IEEE division keeps
    both engines bitwise-equal."""
    docs = t(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_tokens").alias("tot_tokens"), F.count(F.lit(1)).alias("n_sources")
    )
    share = F.col("n_tokens").cast("double") / F.col("tot_tokens")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            share.alias("token_share"),
            ((F.lit(1.0) / F.col("n_sources")) / share).alias("resample_weight"),
        )
        .orderBy("source")
    )


@register(
    "cross_snapshot_jaccard",
    oracle="""
WITH s AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS w
  FROM documents WHERE doc_id < 300
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       ROUND(CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
             / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))), 6) AS jaccard
FROM s a JOIN s b ON a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
WHERE CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
      / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) >= 0.5
ORDER BY doc_a, doc_b
""",
)
def cross_snapshot_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cross-corpus token-Jaccard (new snapshot = even ids, existing
    corpus = odd ids). Spark side is an inverted-index join restricted to
    A x B postings — the shuffle carries (token, doc) pairs, never text —
    while the oracle is the quadratic definition."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    toks = docs.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("w")
    )
    a = toks.filter(F.col("doc_id") % 2 == 0)
    b = toks.filter(F.col("doc_id") % 2 == 1)
    pa = a.select(F.col("doc_id").alias("doc_a"), F.size("w").alias("na"), F.explode("w").alias("tok"))
    pb = b.select(F.col("doc_id").alias("doc_b"), F.size("w").alias("nb"), F.explode("w").alias("tok"))
    inter = (
        pa.join(pb, "tok")
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.filter(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


@register("cross_snapshot_minhash")  # LSH banding: not SQL-expressible -> rows-only
def cross_snapshot_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale form of the snapshot merge: MinHash/LSH banding on each corpus,
    A-buckets joined to B-buckets (inter-corpus candidates only), exact
    Jaccard verification on shingle hashes. The existing corpus's buckets
    are a write-once artifact a real pipeline joins every new crawl against."""
    docs = t(spark, sf_dir, "documents")
    return dedup.cross_corpus_minhash_pairs(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        threshold=0.5,
        max_bucket_size=10_000,
    )
