"""End-to-end training-data preparation queries (SURVEY §2B LLM-pipeline).

These compose the individually-verified operators — quality scoring, exact
dedup, language ID, splits, n-gram stats — into the shapes a real pre-training
corpus build runs, each with an exact DuckDB twin where SQL can express it.
All stages stay JVM-side; the only shuffles are the dedup window and the
final aggregations, and each runs map-side partial aggregation first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t

# Quality gate shared by the Spark query and the SQL oracle below: token
# count bounds plus a type-token-ratio floor (boilerplate/spam collapses TTR).
MIN_TOKENS, MAX_TOKENS, MIN_TTR = 5, 5000, 0.3


@register(
    "training_prep_pipeline",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang, source, text,
         LEN(string_split(text, ' ')) AS n_tokens,
         CAST(LEN(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / LEN(string_split(text, ' ')) AS ttr
  FROM documents
),
kept AS (
  SELECT * FROM scored
  WHERE n_tokens BETWEEN {MIN_TOKENS} AND {MAX_TOKENS} AND ttr >= {MIN_TTR}
),
deduped AS (
  SELECT doc_id, lang, source, n_tokens,
         ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM kept
)
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(doc_id) AS first_doc
FROM deduped WHERE rn = 1
GROUP BY lang, source
ORDER BY lang, source
""",
)
def training_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-prep chain: quality-filter -> exact-dedup (keep first)
    -> per (lang, source) manifest. One window shuffle (on the 32-byte
    content hash) + one aggregation; the quality gate is a map-only predicate
    pushed at the scan, so at 100 TB rejected docs never shuffle at all."""
    from mapreducefw_spark.operators.dedup import dedup_exact_hash

    docs = t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    ttr = F.size(F.array_distinct(toks)).cast("double") / n
    kept = docs.select("doc_id", "lang", "source", "text", n.alias("n_tokens")).filter(
        n.between(MIN_TOKENS, MAX_TOKENS) & (ttr >= MIN_TTR)
    )
    deduped = dedup_exact_hash(kept)
    return (
        deduped.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("lang", "source")
    )


@register(
    "stratified_split_counts",
    oracle="""
SELECT CASE WHEN doc_id % 10 < 8 THEN 'train'
            WHEN doc_id % 10 = 8 THEN 'val'
            ELSE 'test' END AS split,
       lang,
       COUNT(*) AS n_docs,
       CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT) AS total_tokens
FROM documents
GROUP BY split, lang
ORDER BY split, lang
""",
)
def stratified_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split manifest, stratification audited per
    language. Modulo on the id keeps the oracle engine-portable; the
    production form below hashes the id so the split survives id reassignment."""
    docs = t(spark, sf_dir, "documents")
    bucket = F.pmod("doc_id", F.lit(10))
    split = (
        F.when(bucket < 8, "train").when(bucket == 8, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang", F.size(F.split("text", " ")).alias("n_tok"))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
        )
        .orderBy("split", "lang")
    )


@register("stratified_split_hashed")  # xxhash64 is Spark-specific -> rows-only
def stratified_split_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production split: bucket by a seeded 64-bit hash of the id, so
    assignment is stable under re-ingestion and uncorrelated with id order
    (sequential ids often encode crawl time; modulo would leak it)."""
    docs = t(spark, sf_dir, "documents")
    bucket = F.pmod(F.xxhash64(F.lit(42), "doc_id"), F.lit(10))
    split = F.when(bucket < 8, "train").when(bucket == 8, "val").otherwise("test")
    return (
        docs.select(split.alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "lang")
    )


@register(
    "bigram_top_terms",
    oracle="""
WITH grams AS (
  SELECT lang, UNNEST(list_transform(range(1, LEN(string_split(text, ' '))),
                                     i -> string_split(text, ' ')[i] || ' ' ||
                                          string_split(text, ' ')[i+1])) AS bigram
  FROM documents
),
counts AS (
  SELECT lang, bigram, COUNT(*) AS n FROM grams GROUP BY lang, bigram
),
ranked AS (
  SELECT lang, bigram, n,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rk
  FROM counts
)
SELECT lang, bigram, n, rk FROM ranked WHERE rk <= 5 ORDER BY lang, rk
""",
)
def bigram_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter n-grams per language (exact two-stage aggregate + per-group
    top-k). The (lang, bigram) pre-aggregation combines map-side, so the
    ranking window only sees distinct bigram counts — at 100 TB the shuffle
    carries the vocabulary, not the corpus."""
    # sub-2-token (and NULL) texts are guarded: sequence(1, size-1) would
    # count DOWN to [1, 0] for a 1-token doc and element_at(toks, 2)
    # throws under ANSI — the same descending-sequence trap fixed in the
    # SymSpell d2 index; the oracle's range(1, len) is empty there
    docs = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = F.split("text", " ")
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        docs.select("lang", F.explode(grams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from mapreducefw_spark.operators.rank import topk_per_key

    # two-phase per-key top-k: a plain per-lang window sorts each lang's
    # whole bigram vocabulary in one task (operators/rank.py)
    return topk_per_key(
        counts, ["lang"], [F.desc("n"), F.col("bigram")], 5
    ).orderBy("lang", "rk")
