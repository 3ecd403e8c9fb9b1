"""Training-data pipeline batch 2: BPE-style tokenization, benchmark
decontamination, PII scrubbing, intra-document repetition, stopword mining.

Like pipeline.py these are the corpus-prep shapes a pre-training run needs,
each JVM-side with a DuckDB twin. The regexes are restricted to syntax Java
regex and RE2 interpret identically (no lookahead, no backrefs) so both
engines match byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.operators.text import (
    BPE_PRETOKEN_RE,
    PII_PATTERNS,
    bpe_pretokens,
    pii_counts,
    redact_pii,
)
from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t

# SQL-escaped copy of the shared pattern (leading ' doubles inside a literal)
_BPE_SQL = BPE_PRETOKEN_RE.replace("'", "''")


@register(
    "bpe_token_counts",
    oracle=f"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(LEN(regexp_extract_all(text, '{_BPE_SQL}'))) AS BIGINT) AS total_bpe_tokens,
       CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens
FROM documents
GROUP BY lang
ORDER BY lang
""",
)
def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token budget under a GPT-2-style pre-tokenizer vs whitespace.

    The size estimate every data-mixing plan starts from. One regex scan per
    document inside codegen, then a map-side-combined aggregation — the
    shuffle carries one row per (partition, lang)."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(
            "lang",
            F.size(bpe_pretokens("text")).alias("n_bpe"),
            F.size(F.split("text", " ")).alias("n_ws"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bpe").cast("bigint").alias("total_bpe_tokens"),
            F.sum("n_ws").cast("bigint").alias("total_ws_tokens"),
        )
        .orderBy("lang")
    )


@register(
    "benchmark_contamination",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT doc_id, UNNEST(list_distinct(list_transform(
    range(1, GREATEST(len(w) - 4, 1) + 1),
    i -> array_to_string(w[i:i+4], ' ')))) AS g
  FROM toks
)
SELECT c.doc_id AS corpus_doc, b.doc_id AS bench_doc, COUNT(*) AS n_shared
FROM (SELECT * FROM grams WHERE doc_id % 20 != 0) c
JOIN (SELECT * FROM grams WHERE doc_id % 20 = 0) b USING (g)
GROUP BY corpus_doc, bench_doc
HAVING COUNT(*) >= 3
ORDER BY corpus_doc, bench_doc
""",
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination: corpus documents sharing >= 3 distinct 5-grams with a
    held-out benchmark set (here: every 20th doc stands in for the eval set).

    Inverted-index join on 64-bit gram hashes — the shuffle never carries
    text. A REAL eval set is tiny and its posting list broadcasts
    (the operator's default); this demo's "benchmark" is a 5% corpus slice,
    which scales WITH the corpus, so the query opts out of the broadcast —
    at 100 TB a corpus-fraction broadcast would blow the broadcast limits."""
    from mapreducefw_spark.operators.dedup import ngram_contamination

    docs = t(spark, sf_dir, "documents")
    is_bench = F.pmod("doc_id", F.lit(20)) == 0
    return (
        ngram_contamination(
            docs.filter(~is_bench),
            docs.filter(is_bench),
            n=5,
            broadcast_benchmark=False,
        )
        .filter(F.col("n_shared") >= 3)
        .orderBy("corpus_doc", "bench_doc")
    )


_PII_SQL = {k: v.replace("'", "''") for k, v in PII_PATTERNS.items()}


@register(
    "pii_scrub_stats",
    oracle=f"""
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(LEN(regexp_extract_all(text, '{_PII_SQL["email"]}'))) AS BIGINT) AS total_email,
       CAST(SUM(LEN(regexp_extract_all(text, '{_PII_SQL["ip"]}'))) AS BIGINT) AS total_ip,
       CAST(SUM(LEN(regexp_extract_all(text, '{_PII_SQL["phone"]}'))) AS BIGINT) AS total_phone,
       CAST(SUM(LEN(
         regexp_replace(regexp_replace(regexp_replace(text,
           '{_PII_SQL["email"]}', '[EMAIL]', 'g'),
           '{_PII_SQL["ip"]}', '[IP]', 'g'),
           '{_PII_SQL["phone"]}', '[PHONE]', 'g'))) AS BIGINT) AS total_scrubbed_chars
FROM documents
GROUP BY source
ORDER BY source
""",
)
def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub audit per source: match counts per class + corpus size after
    redaction. Flag + replace run in the same codegen stage (regexp_count /
    chained regexp_replace) — a map-only pass at 100 TB. The synthetic corpus
    contains no PII (counts are zero); operators/text.py's unit tests pin the
    match/replace behavior on adversarial synthetic rows."""
    docs = t(spark, sf_dir, "documents")
    counts = pii_counts("text")
    return (
        docs.select(
            "source",
            *[c.alias(n) for n, c in counts.items()],
            F.length(redact_pii("text")).alias("scrubbed_len"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_email").cast("bigint").alias("total_email"),
            F.sum("n_ip").cast("bigint").alias("total_ip"),
            F.sum("n_phone").cast("bigint").alias("total_phone"),
            F.sum("scrubbed_len").cast("bigint").alias("total_scrubbed_chars"),
        )
        .orderBy("source")
    )


@register(
    "repetition_scores",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT doc_id, UNNEST(list_transform(
    range(1, GREATEST(len(w) - 2, 1) + 1),
    i -> array_to_string(w[i:i+2], ' '))) AS g
  FROM toks
),
per_gram AS (
  SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_grams,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(MAX(c) AS BIGINT) AS max_gram_count,
       1.0 - CAST(COUNT(*) AS DOUBLE) / SUM(c) AS rep_ratio
FROM per_gram
GROUP BY doc_id
ORDER BY doc_id
""",
)
def repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition (the boilerplate/spam signal): per doc, total
    vs distinct 3-grams and the hottest gram's count. Grams shuffle as 64-bit
    hashes keyed by (doc, gram) with map-side combine — at 100 TB the
    exchange carries the per-doc distinct-gram table, not the text. Docs
    with high rep_ratio get dropped or down-weighted in the mix."""
    docs = t(spark, sf_dir, "documents")
    # raw (non-distinct) 3-grams — textprep.shingles() dedups, which would
    # erase exactly the repetition this query measures
    toks = F.split("text", " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - 2, F.lit(1)))
    raw_grams = F.transform(idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, 3))))
    grams = docs.select("doc_id", F.explode(raw_grams).alias("g"))
    per_gram = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_gram.groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_grams"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            F.max("c").cast("bigint").alias("max_gram_count"),
            (F.lit(1.0) - F.count(F.lit(1)).cast("double") / F.sum("c")).alias("rep_ratio"),
        )
        .orderBy("doc_id")
    )


@register(
    "stopword_candidates",
    oracle="""
WITH toks AS (
  SELECT doc_id, UNNEST(list_distinct(string_split(text, ' '))) AS token
  FROM documents
),
total AS (SELECT COUNT(*) AS nd FROM documents)
SELECT token,
       CAST(COUNT(*) AS BIGINT) AS doc_freq,
       CAST(COUNT(*) AS DOUBLE) / (SELECT nd FROM total) AS df_frac
FROM toks
GROUP BY token
HAVING CAST(COUNT(*) AS DOUBLE) / (SELECT nd FROM total) > 0.5
ORDER BY token
""",
)
def stopword_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-driven stopword mining: tokens present in > half of all
    documents. This is the document-frequency statistic the similarity
    join's hot-token cap consumes — mined as one posting-list aggregation
    with the corpus total folded in via a broadcast scalar (no driver
    action). Raw IEEE division, no rounding, so both engines agree bitwise."""
    docs = t(spark, sf_dir, "documents")
    posting = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("token")
    )
    nd = F.broadcast(docs.agg(F.count(F.lit(1)).alias("nd")))
    return (
        posting.groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("doc_freq"))
        .crossJoin(nd)
        .withColumn("df_frac", F.col("doc_freq").cast("double") / F.col("nd"))
        .filter(F.col("df_frac") > 0.5)
        .select("token", "doc_freq", "df_frac")
        .orderBy("token")
    )
