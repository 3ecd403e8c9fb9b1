"""Round-8 batch 10: the portable-hash conversion tier — a fully
oracle-paired MinHash/LSH pair pipeline, a portable winnowing
fingerprint, and an n-gram novelty KPI.

`portable_minhash_pairs` closes the last big rows-only family: the
production `minhash_dedup_pairs` is Spark-only-checkable because
xxhash64 has no DuckDB twin, so its banding/verification logic was
covered only by pytest recall pins. With the portable md5 hash family
(`operators/dedup.py::portable_minhash_signatures`, already paired for
the SIGNATURE step) the ENTIRE pipeline — signature mins, band keys,
bucket-join candidates, exact-Jaccard verification, threshold — becomes
deterministic on both engines, so the driver value-hashes the whole
LSH near-dup path end-to-end. Given fixed signatures the usual
"probabilistic recall" of LSH is a deterministic function of the data,
so candidate-set equality is exact, not statistical.

Semantic contract with the reference engine: every query is the
map -> shuffle-by-key -> reduce -> sort job shape
(`/root/reference/MapReduceClient.h:47-51`, `MRFCore.cpp:252-446`).

Scale posture:
- the Spark side runs the production LSH shape (band-bucket equi-join,
  candidates only); the O(n²) signature scan lives ONLY in the oracle,
  and the query input is id-bounded (doc_id < 400, the
  explode_posexplode idiom) so oracle cost is fixed at any sf.
- fingerprints/novelty are map-side gram hashing + hash-keyed distinct
  exchanges — 8-byte hashes move, never gram text (the decontam
  contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t

_H48 = "CAST(('0x' || substr(md5({x}), 1, 12)) AS BIGINT)"
_H32 = "CAST(('0x' || substr(md5({x}), 1, 8)) AS BIGINT)"


@register(
    "portable_minhash_pairs",
    oracle=f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE text IS NOT NULL AND doc_id < 400
),
tok AS (
  -- DISTINCT word 3-gram shingles (clamped at the tail), mirroring
  -- operators/textprep.shingles: the production minhash unit
  SELECT DISTINCT doc_id, g AS token
  FROM (SELECT doc_id,
               UNNEST(list_transform(
                 range(1, GREATEST(len(string_split(text, ' ')) - 2, 1) + 1),
                 i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))) AS g
        FROM corpus)
),
hs AS (
  SELECT doc_id, i,
         MIN({_H32.format(x="token || ':' || i")}) AS h
  FROM tok CROSS JOIN (SELECT UNNEST(range(8)) AS i)
  GROUP BY doc_id, i
),
sigs AS (
  SELECT doc_id,
         MAX(CASE WHEN i = 0 THEN h END) AS h0, MAX(CASE WHEN i = 1 THEN h END) AS h1,
         MAX(CASE WHEN i = 2 THEN h END) AS h2, MAX(CASE WHEN i = 3 THEN h END) AS h3,
         MAX(CASE WHEN i = 4 THEN h END) AS h4, MAX(CASE WHEN i = 5 THEN h END) AS h5,
         MAX(CASE WHEN i = 6 THEN h END) AS h6, MAX(CASE WHEN i = 7 THEN h END) AS h7
  FROM hs GROUP BY doc_id
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
  WHERE (a.h0 = b.h0 AND a.h1 = b.h1) OR (a.h2 = b.h2 AND a.h3 = b.h3)
     OR (a.h4 = b.h4 AND a.h5 = b.h5) OR (a.h6 = b.h6 AND a.h7 = b.h7)
),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM tok GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM cand c
  JOIN tok ta ON ta.doc_id = c.doc_a
  JOIN tok tb ON tb.doc_id = c.doc_b AND tb.token = ta.token
  GROUP BY c.doc_a, c.doc_b
)
SELECT c.doc_a, c.doc_b,
       ROUND(CAST(COALESCE(i.n_shared, 0) AS DOUBLE)
             / (sa.sz + sb.sz - COALESCE(i.n_shared, 0)), 6) AS jaccard
FROM cand c
LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE ROUND(CAST(COALESCE(i.n_shared, 0) AS DOUBLE)
            / (sa.sz + sb.sz - COALESCE(i.n_shared, 0)), 6) >= 0.3
ORDER BY c.doc_a, c.doc_b
""",
)
def portable_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash/LSH near-duplicate pairs, ORACLE-PAIRED end-to-end: the
    portable md5 hash family (8 hashes, 4 bands x 2 rows) over DISTINCT
    3-gram shingles makes the signatures identical on both engines, so
    banding recall stops being "probabilistic" and becomes an exact
    deterministic function of the corpus — the driver value-hashes
    candidate generation AND the exact shingle-Jaccard verification
    (threshold 0.3). Shingles, not raw token sets: the synthetic corpus
    shares most of its word VOCABULARY across docs (77% of pairs pass
    0.3 on word-set Jaccard — no signal) while shingle Jaccard isolates
    the true near-dups. The production twin `minhash_dedup_pairs`
    (xxhash64 + bucket caps) stays the scale path; this id-bounded form
    (doc_id < 400) is its differential witness, like
    simhash_portable_pairs for SimHash. Spark runs the production
    SHAPE — band-key bucket equi-join, candidates only, exact verify on
    candidates; the O(n²) signature scan lives only in the oracle.
    Cites `operators/dedup.py:310,559`."""
    from mapreducefw_spark.operators.dedup import portable_minhash_signatures
    from mapreducefw_spark.operators.textprep import shingles

    d = t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.col("doc_id") < 400)
    )
    sigs = portable_minhash_signatures(d, num_hashes=8, rows_per_band=2, shingle_n=3)
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("b"), F.col(f"band{b}").alias("key"))
                for b in range(4)
            ])
        ).alias("bk"),
    ).select("doc_id", F.col("bk.b").alias("b"), F.col("bk.key").alias("key"))
    a, b2 = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b2, (F.col("a.b") == F.col("b.b")) & (F.col("a.key") == F.col("b.key")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    toksets = d.select("doc_id", shingles("text", 3).alias("ts"))
    ta = toksets.select(F.col("doc_id").alias("doc_a"), F.col("ts").alias("ta"))
    tb = toksets.select(F.col("doc_id").alias("doc_b"), F.col("ts").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.size("ta") + F.size("tb") - inter
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select("doc_a", "doc_b", F.round(inter / union, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= 0.3)
        .orderBy("doc_a", "doc_b")
    )


@register(
    "rolling_fingerprint_portable",
    oracle=f"""
SELECT doc_id,
       list_min(list_transform(
         range(1, GREATEST(len(string_split(text, ' ')) - 7, 1) + 1),
         i -> {_H48.format(x="array_to_string((string_split(text, ' '))[i:i+7], ' ')")}
       )) AS fp
FROM documents
ORDER BY doc_id
""",
)
def rolling_fingerprint_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style document fingerprint (min over rolling 8-token
    window hashes — robust to small edits, unlike a content hash), on
    the PORTABLE 48-bit md5 hash so it is oracle-paired: the xxhash64
    production form (`rolling_fingerprint`, operators/text.py:107) stays
    rows-only. Window slices clamp identically at the tail on both
    engines (Spark slice == DuckDB l[i:i+7]); sub-8-token docs hash
    their single clamped window; NULL texts take an EXPLICIT NULL
    fingerprint (Spark's concat_ws skips a NULL slice and would hash ''
    — the edge suite caught the phantom; DuckDB's NULL propagates
    naturally). Map-only — no shuffle at all before the output sort."""
    toks = F.split("text", " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - 7, F.lit(1)))
    win = F.transform(
        idx,
        lambda i: F.conv(
            F.substring(F.md5(F.concat_ws(" ", F.slice(toks, i, 8))), 1, 12), 16, 10
        ).cast("long"),
    )
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.when(F.col("text").isNotNull(), F.array_min(win)).alias("fp"),
    ).orderBy("doc_id")


@register(
    "ngram_novelty_rate",
    oracle=f"""
WITH base AS (
  SELECT doc_id, source, doc_id % 2 AS snap,
         list_transform(
           range(1, GREATEST(len(string_split(text, ' ')) - 4, 0) + 1),
           i -> {_H48.format(x="array_to_string((string_split(text, ' '))[i:i+4], ' ')")}
         ) AS gh
  FROM documents WHERE text IS NOT NULL
),
a_grams AS (
  SELECT DISTINCT UNNEST(gh) AS h FROM base WHERE snap = 0
),
b_grams AS (
  SELECT DISTINCT source, UNNEST(gh) AS h FROM base WHERE snap = 1
),
flags AS (
  SELECT b.source, b.h, CASE WHEN a.h IS NULL THEN 1 ELSE 0 END AS novel
  FROM b_grams b LEFT JOIN a_grams a ON a.h = b.h
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(novel) AS BIGINT) AS n_novel,
       ROUND(CAST(SUM(novel) AS DOUBLE) / COUNT(*), 6) AS novelty_rate
FROM flags
GROUP BY source
ORDER BY source NULLS LAST
""",
)
def ngram_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-freshness KPI: what fraction of the new snapshot's distinct
    5-gram hashes were never seen in the previous snapshot (deterministic
    doc-parity split)? The dedup/decontam planning number — low novelty
    means the new crawl mostly re-delivers known content and exact/fuzzy
    dedup will shrink it hard. Grams ride 48-bit portable hashes: the
    anti-join exchanges 8-byte keys, never gram text (the decontam
    contract); sub-5-token docs contribute zero grams (range upper bound
    clamps to 0) identically on both engines."""
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = F.split("text", " ")
    idx = F.sequence(
        F.lit(1), F.greatest(F.size(toks) - 4, F.lit(0))
    )
    gh = F.when(
        F.size(toks) >= 5,
        F.transform(
            idx,
            lambda i: F.conv(
                F.substring(F.md5(F.concat_ws(" ", F.slice(toks, i, 5))), 1, 12), 16, 10
            ).cast("long"),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    base = d.select("doc_id", "source", (F.col("doc_id") % 2).alias("snap"), gh.alias("gh"))
    a_grams = (
        base.filter(F.col("snap") == 0).select(F.explode("gh").alias("h")).distinct()
    )
    b_grams = (
        base.filter(F.col("snap") == 1)
        .select("source", F.explode("gh").alias("h"))
        .distinct()
    )
    flags = b_grams.join(a_grams.withColumnRenamed("h", "ah"),
                         b_grams.h == F.col("ah"), "left").select(
        "source", F.when(F.col("ah").isNull(), 1).otherwise(0).alias("novel")
    )
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum("novel").cast("bigint").alias("n_novel"),
        )
        .select(
            "source",
            "n_grams",
            "n_novel",
            F.round(F.col("n_novel").cast("double") / F.col("n_grams"), 6).alias(
                "novelty_rate"
            ),
        )
        .orderBy(F.asc_nulls_last("source"))
    )
