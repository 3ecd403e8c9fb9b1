"""Fifth training-data pipeline batch (round 4): context-window chunking,
int8-quantized similarity search, and deterministic weighted corpus
resampling. All three are cross-engine deterministic (md5 uniforms,
floor-form rounding, integer dot products), so each gets a full DuckDB
value-hash oracle — no rows-only entries in this batch."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.operators import dedup, packing, similarity
from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t


@register(
    "doc_chunking",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM documents WHERE doc_id < 300 AND text IS NOT NULL
),
st AS (
  SELECT doc_id, w,
         unnest(generate_series(1, greatest(len(w), 1), 48)) AS chunk_start
  FROM toks
)
SELECT doc_id, chunk_start,
       len(list_slice(w, chunk_start, chunk_start + 63)) AS n_tokens,
       array_to_string(list_slice(w, chunk_start, chunk_start + 63), ' ') AS chunk_text
FROM st
ORDER BY doc_id, chunk_start
""",
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunks (64 tokens, stride 48): the
    pre-tokenization split a trainer runs before packing. Map-only — no
    shuffle; the oracle is the same windowing via DuckDB list slicing."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return packing.chunk_documents(docs, chunk_tokens=64, stride=48).orderBy(
        "doc_id", "chunk_start"
    )


@register(
    "embedding_quantized_topk",
    oracle="""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
  WHERE vec_id IS NOT NULL
),
s AS (
  -- list_max SKIPS NULL elements, so the > 0 test alone would keep a
  -- vector with NULL components (and list_dot_product errors on those);
  -- the explicit no-NULL-element guard mirrors quantize_int8's filter
  SELECT vec_id, e, 127.0 / list_max(list_transform(e, x -> abs(x))) AS sc
  FROM v WHERE list_max(list_transform(e, x -> abs(x))) > 0
    AND e IS NOT NULL AND len(list_filter(e, x -> x IS NULL)) = 0
),
q AS (
  SELECT vec_id, list_transform(e, x -> CAST(floor(x * sc + 0.5) AS INT)) AS qe
  FROM s
),
pairs AS (
  SELECT a.vec_id AS qid, b.vec_id AS nid,
         ROUND(list_dot_product(a.qe, b.qe)
               / (sqrt(list_dot_product(a.qe, a.qe)) * sqrt(list_dot_product(b.qe, b.qe))), 6) AS sim
  FROM q a JOIN q b ON a.vec_id < 10 AND a.vec_id <> b.vec_id
),
ranked AS (
  SELECT qid, nid, sim,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk
  FROM pairs
)
SELECT qid, nid, sim, rk FROM ranked WHERE rk <= 5 ORDER BY qid, rk
""",
)
def embedding_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 scalar-quantized cosine top-k — the memory-bound exact baseline
    (8x smaller vectors; integer dots are exact in double, so Spark and
    DuckDB agree bit-for-bit). Recall vs the float baseline is pinned in
    tests/test_accuracy_pins.py."""
    emb = similarity.as_double_vecs(t(spark, sf_dir, "embeddings"))
    qn = similarity.quantize_int8(emb)
    return similarity.quantized_topk(qn, qn.filter(F.col("vid") < 10), k=5).orderBy(
        "qid", "rk"
    )


@register(
    "containment_dedup_pairs",
    oracle="""
WITH s AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS w
  FROM documents WHERE doc_id < 200
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       ROUND(CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
             / least(len(a.w), len(b.w)), 6) AS overlap
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
      / least(len(a.w), len(b.w)) >= 0.9
ORDER BY doc_a, doc_b
""",
)
def containment_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment (overlap-coefficient) dedup: catches a short doc subsumed
    by a long one, which symmetric Jaccard misses. Spark side is the
    inverted-index join; the oracle is the quadratic definition."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return dedup.overlap_coefficient_pairs(docs, threshold=0.9).orderBy(
        "doc_a", "doc_b"
    )


@register(
    "source_resample_weighted",
    oracle="""
WITH per AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tok
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(n_tok) AS BIGINT) AS tot_tok, COUNT(*) AS n_sources FROM per
),
rates AS (
  SELECT source, n_docs,
         least(1.0, (1.0 / n_sources) / (CAST(n_tok AS DOUBLE) / tot_tok)) AS rate
  FROM per, tot
),
kept AS (
  SELECT d.source, COUNT(*) AS n_kept
  FROM documents d JOIN rates r ON d.source = r.source
  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':rs'), 1, 8)) AS BIGINT)
        / 4294967296.0 < r.rate
  GROUP BY d.source
)
SELECT r.source, r.n_docs, COALESCE(k.n_kept, 0) AS n_kept, ROUND(r.rate, 6) AS rate
FROM rates r LEFT JOIN kept k ON r.source = k.source
ORDER BY r.source
""",
)
def source_resample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted resampling toward a uniform source mix: each
    doc keeps iff md5-uniform(doc_id) < its source's resample rate
    (rate = target_share / actual_token_share, capped at 1). md5 uniforms
    are engine-reproducible, so the SAME docs are kept in any engine — the
    property a 100 TB pipeline needs for auditable resampling. One shuffle
    (per-source agg); rates broadcast back; the doc-level pass is map-only."""
    docs = t(spark, sf_dir, "documents")
    # NULL-guard the token count: with spark.sql.legacy.sizeOfNull=true,
    # size(split(NULL)) is -1 and would be summed, while the oracle's
    # SUM(len(...)) skips NULLs — a regenerated fixture with NULL text
    # would silently skew every source's rate.
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("text").isNotNull(), F.size(F.split("text", " ")))
        ).cast("bigint").alias("n_tok"),
    )
    tot = per.agg(
        F.sum("n_tok").cast("bigint").alias("tot_tok"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    rate = F.least(
        F.lit(1.0),
        (F.lit(1.0) / F.col("n_sources"))
        / (F.col("n_tok").cast("double") / F.col("tot_tok")),
    )
    rates = per.crossJoin(F.broadcast(tot)).select(
        "source", "n_docs", rate.alias("rate")
    )
    kept = (
        docs.join(F.broadcast(rates.select("source", "rate")), "source")
        .filter(packing.uniform_unit("doc_id", "rs") < F.col("rate"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.round("rate", 6).alias("rate"),
        )
        .orderBy("source")
    )


def _mh_oracle(num_hashes: int = 8, rows_per_band: int = 2) -> str:
    hs = ",\n    ".join(
        "list_aggregate(list_transform(w, t -> CAST(('0x' || substr(md5(t || ':"
        f"{i}'), 1, 8)) AS BIGINT)), 'min') AS h{i}"
        for i in range(num_hashes)
    )
    bands = ",\n       ".join(
        "substr(md5("
        + " || ':' || ".join(
            f"CAST(h{b * rows_per_band + r} AS VARCHAR)" for r in range(rows_per_band)
        )
        + f"), 1, 16) AS band{b}"
        for b in range(num_hashes // rows_per_band)
    )
    h_names = ", ".join(f"h{i}" for i in range(num_hashes))
    return f"""
WITH tk AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS w FROM documents
),
sig AS (
  SELECT doc_id,
    {hs}
  FROM tk
)
SELECT doc_id, {h_names},
       {bands}
FROM sig
ORDER BY doc_id
"""


@register("minhash_signatures_portable", oracle=_mh_oracle())
def minhash_signatures_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine minhash signatures + LSH band keys (md5 hash family, k=8,
    4 bands x 2 rows), value-hash checkable against DuckDB recomputing the
    identical mins — the driver-checkable twin of the xxhash64 production
    minhash (operators/dedup.py::minhash_signatures, rows-only by nature).
    Map-only signature build: no shuffle anywhere in the plan."""
    docs = t(spark, sf_dir, "documents")
    return dedup.portable_minhash_signatures(docs).orderBy("doc_id")
