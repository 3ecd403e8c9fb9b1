"""Scale-path LLM-pipeline queries over the operators package (SURVEY §7 M4).

``jaccard_token_pairs`` is oracle-checked (DuckDB computes the naive O(n²)
form; Spark runs the inverted-index similarity join — same result, different
plan). The LSH/IVF/SimHash entries are not SQL-expressible, so the driver
records rows-only checks; their semantics are pinned by pytest property tests
(exact duplicates are always found, IVF recall vs brute force, etc.).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.operators import dedup, multimodal, similarity, text
from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t


@register(
    "jaccard_token_pairs",
    oracle="""
WITH s AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS w
  FROM documents WHERE doc_id < 200
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       ROUND(CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
             / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))), 6) AS jaccard
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
      / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) >= 0.5
ORDER BY doc_a, doc_b
""",
)
def jaccard_token_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set Jaccard near-dup pairs; Spark side is the scalable
    inverted-index join, the oracle is the quadratic definition."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return dedup.jaccard_token_pairs(docs, threshold=0.5).orderBy("doc_a", "doc_b")


@register("minhash_dedup_pairs")  # LSH banding: not SQL-expressible -> rows-only
def minhash_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return dedup.minhash_dedup_pairs(docs, threshold=0.5)


@register("simhash_near_pairs")  # rows-only
def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return dedup.simhash_near_pairs(docs, max_hamming=3)


@register("embedding_ivf_topk")  # ANN: rows-only (recall pinned in pytest)
def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = similarity.as_double_vecs(t(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vid") < 10)
    return similarity.ivf_topk(emb, q, k=5, n_cells=16, nprobe=4).orderBy("qid", "rk")


@register("embedding_lsh_topk")  # rows-only
def embedding_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = similarity.as_double_vecs(t(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vid") < 10)
    return similarity.random_hyperplane_topk(emb, q, k=5, n_planes=6).orderBy("qid", "rk")


@register("lang_id_heuristic")  # heuristic: rows-only (semantics pinned in pytest)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", text.detect_language("text").alias("detected_lang"))
        .groupBy("detected_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("detected_lang")
    )


@register(
    "rolling_fingerprint",
    oracle=None,  # xxhash64 is Spark-specific -> rows-only
)
def rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", text.rolling_fingerprint("text", window=8).alias("fp")
    ).orderBy("doc_id")


@register("multimodal_pipeline")  # decode stub is engine-specific -> rows-only
def multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = multimodal.synthesize_media(docs)
    decoded = multimodal.decode_media(media, deterministic_fake=True)
    return decoded.select(
        "media_id",
        "media_type",
        "width",
        "height",
        F.size("features").alias("feat_dim"),
        F.round(F.element_at("features", 1), 6).alias("f0"),
    ).orderBy("media_id")
