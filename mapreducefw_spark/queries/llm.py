"""LLM-data-pipeline operators, oracle-checkable slice (SURVEY §7 M4).

The heavier non-SQL-expressible ops (MinHash/SimHash near-dup, ANN) live in
``mapreducefw_spark.operators`` and are registered separately (rows-only
checks). Everything here is a deterministic DataFrame composition with an
exact DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t

STOPWORDS = ("the", "a", "of", "and", "to")


@register(
    "dedup_exact",
    oracle="""
SELECT doc_id, lang, source, n_chars
FROM (
  SELECT doc_id, lang, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM documents
)
WHERE rn = 1
ORDER BY doc_id
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup, keep-first (lowest doc_id) per identical text.

    Scale note: groups on a 256-bit content hash, not the raw text, so the
    shuffle key is 32 bytes instead of document bytes — the standard 100 TB
    exact-dedup layout. Window over the hash == window over text because
    sha2 collisions are negligible."""
    from mapreducefw_spark.operators.dedup import dedup_exact_hash

    docs = t(spark, sf_dir, "documents")
    return (
        dedup_exact_hash(docs)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "dedup_exact_keyed",
    oracle="""
SELECT lang, source, MIN(doc_id) AS keep_doc_id, COUNT(*) AS group_size
FROM documents
GROUP BY lang, source
ORDER BY lang, source
""",
)
def dedup_exact_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-subset dedup as a deterministic aggregate (min-id representative)."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang", "source")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("group_size"))
        .orderBy("lang", "source")
    )


@register(
    "doc_fingerprint",
    oracle="""
SELECT doc_id,
       SUBSTRING(sha256(text), 1, 16) AS fp16,
       LENGTH(text) AS text_len
FROM documents
ORDER BY doc_id
""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: 64-bit prefix of sha256 — join-friendly dedup key."""
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.substring(F.sha2("text", 256), 1, 16).alias("fp16"),
        F.length("text").cast("bigint").alias("text_len"),
    ).orderBy("doc_id")


@register(
    "text_token_stats",
    oracle=f"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(SUM(LEN(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avg_tokens,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
       CAST(SUM(LEN(regexp_extract_all(text, '[a-z0-9]+'))) AS BIGINT) AS total_words_re
FROM documents
GROUP BY lang
ORDER BY lang
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting per language: whitespace tokens + regex word tokens."""
    docs = t(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    n_re = F.size(F.regexp_extract_all("text", F.lit("[a-z0-9]+"), 0))
    return (
        docs.select("lang", n_tok.alias("n_tok"), F.length("text").alias("n_char"), n_re.alias("n_re"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            (F.sum("n_tok").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
            F.sum("n_char").cast("bigint").alias("total_chars"),
            F.sum("n_re").cast("bigint").alias("total_words_re"),
        )
        .orderBy("lang")
    )


@register(
    "text_quality_scores",
    oracle=f"""
SELECT doc_id,
       LEN(string_split(text, ' ')) AS n_tokens,
       LEN(list_distinct(string_split(text, ' '))) AS n_distinct,
       CAST(LEN(list_distinct(string_split(text, ' '))) AS DOUBLE)
         / LEN(string_split(text, ' ')) AS ttr,
       CAST(LEN(list_filter(string_split(text, ' '),
                            x -> x IN {STOPWORDS!r})) AS DOUBLE)
         / LEN(string_split(text, ' ')) AS stopword_ratio,
       CAST(LENGTH(text) - LEN(string_split(text, ' ')) + 1 AS DOUBLE)
         / LEN(string_split(text, ' ')) AS avg_word_len
FROM documents
WHERE doc_id < 300
ORDER BY doc_id
""",
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality heuristics: type-token ratio, stopword ratio,
    average word length — the standard cheap filters before LLM training."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    toks = F.split("text", " ")
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        (n_distinct.cast("double") / n).alias("ttr"),
        (n_stop.cast("double") / n).alias("stopword_ratio"),
        ((F.length("text") - n + 1).cast("double") / n).alias("avg_word_len"),
    ).orderBy("doc_id")


@register(
    "embedding_cosine_topk",
    oracle="""
WITH ok AS (
       -- searchable vectors only: non-NULL, no NULL elements, norm > 0
       -- (mirrors the Spark-side norm > 0 guard; list_sum, not
       -- list_dot_product, because WHERE conjuncts don't short-circuit
       -- and list_dot_product ERRORS on NULL elements; DuckDB's
       -- list_cosine_similarity returns -1.0 for a zero vector where
       -- Spark's ANSI divide would error)
       SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
       WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
         AND len(list_filter(embedding, x -> x IS NULL)) = 0
         AND COALESCE(list_sum(list_transform(embedding::DOUBLE[], x -> x*x)), 0) > 0
     ),
     q AS (SELECT vec_id AS qid, e AS qe FROM ok WHERE vec_id < 10),
     c AS (SELECT vec_id AS nid, e AS ne FROM ok),
     sims AS (
       SELECT qid, nid, ROUND(list_cosine_similarity(qe, ne), 6) AS sim
       FROM q CROSS JOIN c
       WHERE qid <> nid
     ),
     ranked AS (
       SELECT qid, nid, sim,
              ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk
       FROM sims
     )
SELECT qid, nid, sim, rk FROM ranked WHERE rk <= 5
ORDER BY qid, rk
""",
)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the (small) query set against the
    corpus, JVM-side fold for the dot product, per-query top-k window.
    This is the exact baseline; the LSH/IVF scale path is in operators/."""
    from mapreducefw_spark.operators.similarity import as_double_vecs, brute_force_topk

    emb = as_double_vecs(t(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vid") < 10)
    return brute_force_topk(emb, q, k=5).orderBy("qid", "rk")


@register(
    "embedding_label_norms",
    oracle="""
SELECT label,
       COUNT(*) AS n,
       ROUND(AVG(CASE WHEN embedding IS NOT NULL
                       AND len(list_filter(embedding, x -> x IS NULL)) = 0
                 THEN SQRT(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                 END), 4) AS avg_norm
FROM embeddings
GROUP BY label
ORDER BY label
""",
)
def embedding_label_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("e")
    )
    dot = F.aggregate(
        F.zip_with(F.col("e"), F.col("e"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        emb.select("label", F.sqrt(dot).alias("norm"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("norm"), 4).alias("avg_norm"))
        .orderBy("label")
    )


@register(
    "multimodal_bytes_meta",
    oracle="""
SELECT doc_id,
       OCTET_LENGTH(ENCODE(text)) AS n_bytes,
       UPPER(HEX(ENCODE(SUBSTRING(text, 1, 4)))) AS magic_hex
FROM documents
WHERE doc_id < 100
ORDER BY doc_id
""",
)
def multimodal_bytes_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column plumbing: payload as BinaryType + typed metadata.
    Real decode (image/audio) is stubbed in operators.multimodal; this query
    proves the binary schema path end-to-end."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.upper(F.hex(F.encode(F.substring("text", 1, 4), "UTF-8"))).alias("magic_hex"),
    ).orderBy("doc_id")
