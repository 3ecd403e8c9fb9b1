"""Training-data layout queries: sequence packing + epoch shard assignment.

The step after filtering/dedup/mixing (pipeline.py, pipeline3.py): lay the
surviving documents out as fixed-length training windows and deterministic
shards. Reference scope: the reference engine stops at sorted reduce output
(MRFCore.cpp:446-466); packing/sharding are part of the LLM-pipeline target
surface this repo adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.operators import packing
from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t

SEQ_LEN = 512


@register(
    "sequence_pack_spans",
    oracle=f"""
WITH tk AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
  FROM tk
)
SELECT doc_id, n_tokens, start_off,
       start_off + n_tokens AS end_off,
       CAST(FLOOR(start_off / {SEQ_LEN}) AS BIGINT) AS first_chunk,
       CAST(FLOOR((start_off + n_tokens - 1) / {SEQ_LEN}) AS BIGINT) AS last_chunk,
       CAST(FLOOR((start_off + n_tokens - 1) / {SEQ_LEN})
            - FLOOR(start_off / {SEQ_LEN}) + 1 AS BIGINT) AS chunks_spanned
FROM c
ORDER BY doc_id
""",
)
def sequence_pack_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-in-id-order + chunk-to-SEQ_LEN layout: each doc's global token
    offsets and the training windows it feeds. The Spark side computes the
    prefix sum in two phases (per-bucket totals + broadcast offsets — no
    global single-task window; operators/packing.py); the oracle is the
    naive one-pass cumsum, so a hash match proves the two-phase offsets are
    exactly the naive ones."""
    docs = t(spark, sf_dir, "documents")
    # bucket_size 100 spans multiple buckets even at sf0.001 (500 docs), so
    # the correctness check genuinely crosses bucket boundaries
    return packing.pack_spans(docs, seq_len=SEQ_LEN, bucket_size=100).orderBy("doc_id")


@register(
    "training_shard_stats",
    oracle="""
WITH s AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8)) AS BIGINT)
           % 16 AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT shard, COUNT(*) AS n_docs, SUM(n_tokens) AS total_tokens
FROM s
GROUP BY shard
ORDER BY shard
""",
)
def training_shard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch sharding: md5-based shard per doc (reproducible
    outside Spark — any engine recomputes identical shards from the ids),
    aggregated to per-shard doc/token totals — the balance check a trainer
    runs before launching data loaders."""
    docs = t(spark, sf_dir, "documents")
    shards = packing.shard_assignment(docs, n_shards=16, seed=42)
    toks = docs.select("doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
    return (
        shards.join(toks, "doc_id")
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("total_tokens"))
        .orderBy("shard")
    )
