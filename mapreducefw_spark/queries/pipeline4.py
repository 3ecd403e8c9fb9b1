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

from mapreducefw_spark.operators import dedup, packing
from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t
from pyspark.sql import Window as W

SEQ_LEN = 512


@register(
    "sequence_pack_spans",
    oracle=f"""
WITH tk AS (
  SELECT doc_id, CAST(COALESCE(len(string_split(text, ' ')), 0) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
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
    "snapshot_diff",
    oracle="""
WITH old AS (
  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id < 400
),
new AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 50 = 0 THEN text || ' v2' ELSE text END) AS h
  FROM documents WHERE doc_id >= 100
)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.h <> n.h THEN 'changed'
            ELSE 'unchanged' END AS status
FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
ORDER BY doc_id
""",
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff: classify every doc as added / removed / changed /
    unchanged between two crawl versions (old = id<400, new = id>=100 with
    every 50th doc's text edited). The comparison shuffles 32-char content
    hashes, never text — a FULL OUTER join on doc_id with hash inequality,
    which is how an ingestion pipeline decides what to re-process each
    snapshot. At 100 TB both sides would be hash manifests written at ingest
    time, making the diff independent of corpus size."""
    docs = t(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") < 400).select("doc_id", F.md5("text").alias("h"))
    new = (
        docs.filter(F.col("doc_id") >= 100)
        .select(
            "doc_id",
            F.md5(
                F.when(F.col("doc_id") % 50 == 0, F.concat(F.col("text"), F.lit(" v2")))
                .otherwise(F.col("text"))
            ).alias("h"),
        )
    )
    o, n = old.alias("o"), new.alias("n")
    status = (
        F.when(F.col("o.doc_id").isNull(), "added")
        .when(F.col("n.doc_id").isNull(), "removed")
        .when(F.col("o.h") != F.col("n.h"), "changed")
        .otherwise("unchanged")
    )
    return (
        o.join(n, F.col("o.doc_id") == F.col("n.doc_id"), "full_outer")
        .select(
            F.coalesce(F.col("o.doc_id"), F.col("n.doc_id")).alias("doc_id"),
            status.alias("status"),
        )
        .orderBy("doc_id")
    )


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
SELECT shard, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
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


@register(
    "dedup_canonical_selection",
    oracle="""
WITH RECURSIVE s AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS w,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents WHERE doc_id < 100
),
p AS (
  SELECT a.doc_id AS da, b.doc_id AS db
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
        / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) >= 0.5
),
e AS (SELECT da AS src, db AS dst FROM p UNION SELECT db, da FROM p),
walk(doc, r) AS (
  SELECT src, src FROM e
  UNION
  SELECT e.src, walk.r FROM e JOIN walk ON walk.doc = e.dst
),
g AS (SELECT doc, MIN(r) AS group_id FROM walk GROUP BY doc),
j AS (SELECT g.doc, g.group_id, s.n_tokens FROM g JOIN s ON s.doc_id = g.doc),
sel AS (
  SELECT group_id, doc, n_tokens,
         ROW_NUMBER() OVER (PARTITION BY group_id ORDER BY n_tokens DESC, doc) AS rn
  FROM j
)
SELECT sel.group_id, sel.doc AS canonical_doc,
       m.n_members
FROM sel JOIN (SELECT group_id, COUNT(*) AS n_members FROM j GROUP BY group_id) m
  USING (group_id)
WHERE rn = 1
ORDER BY group_id
""",
)
def dedup_canonical_selection(spark, sf_dir):
    """After near-dup clustering, KEEP one document per group — the longest
    (most tokens; ties to the lowest id), which is the usual 'best version'
    heuristic for crawl duplicates. Exact Jaccard pairs on a doc_id<100
    slice feed connected components; the winner is a per-group window top-1.
    DuckDB recomputes the identical pipeline with a recursive reachability
    CTE, pinning the full select-the-canonical flow, not just the grouping."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    pairs = dedup.jaccard_token_pairs(docs, threshold=0.5)
    groups = dedup.dedup_groups(pairs)
    toks = docs.select(
        F.col("doc_id").alias("doc"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    j = groups.join(toks, "doc")
    w = W.partitionBy("group_id").orderBy(F.desc("n_tokens"), "doc")
    members = j.groupBy("group_id").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(members, "group_id")
        .select("group_id", F.col("doc").alias("canonical_doc"), "n_members")
        .orderBy("group_id")
    )


@register(
    "text_normalize_stats",
    oracle="""
WITH dirty AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN upper(text) || ' !!' ELSE text END AS text
  FROM documents
),
n AS (
  SELECT doc_id, text,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                             ' +', ' ', 'g')) AS norm
  FROM dirty
)
SELECT doc_id,
       CAST(LENGTH(text) AS BIGINT) AS raw_len,
       CAST(LENGTH(norm) AS BIGINT) AS norm_len,
       CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens_norm,
       CASE WHEN norm <> text THEN 1 ELSE 0 END AS changed
FROM n
ORDER BY doc_id
""",
)
def text_normalize_stats(spark, sf_dir):
    """Unicode-free text normalization (lowercase, strip non-alphanumerics,
    collapse whitespace) — the first cleaning pass of a corpus pipeline.
    The fixture text is already clean, so every 3rd doc is deterministically
    dirtied (uppercased + punctuation) on BOTH engines before normalizing;
    `changed` marks docs the pass altered. All JVM-side regexp_replace —
    one map pass, no shuffle except the output sort."""
    docs = t(spark, sf_dir, "documents")
    dirty = F.when(
        F.col("doc_id") % 3 == 0, F.concat(F.upper("text"), F.lit(" !!"))
    ).otherwise(F.col("text"))
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(dirty), "[^a-z0-9 ]", ""), " +", " ")
    )
    return (
        docs.select(
            "doc_id",
            F.length(dirty).cast("long").alias("raw_len"),
            F.length(norm).cast("long").alias("norm_len"),
            F.size(F.split(norm, " ")).cast("long").alias("n_tokens_norm"),
            F.when(norm != dirty, 1).otherwise(0).alias("changed"),
        )
        .orderBy("doc_id")
    )


@register(
    "cdc_apply_changelog",
    oracle="""
WITH base AS (SELECT doc_id, lang, source, n_chars FROM documents),
changes AS (
  SELECT doc_id, lang, 'cdc_update' AS source, n_chars + 1 AS n_chars,
         'U' AS op, 1 AS seq
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id, lang, source, n_chars, 'D', 2 FROM documents WHERE doc_id % 17 = 0
  UNION ALL
  SELECT doc_id + 1000000, 'xx', 'cdc_insert', n_chars, 'I', 1
  FROM documents WHERE doc_id % 25 = 0
  UNION ALL
  SELECT doc_id, lang, 'cdc_late_upsert', n_chars + 2, 'U', 3
  FROM documents WHERE doc_id % 34 = 0
  UNION ALL
  SELECT doc_id, lang, source, n_chars, 'D', 4 FROM documents WHERE doc_id % 55 = 0
),
latest AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY seq DESC) AS rn
    FROM changes) WHERE rn = 1
)
SELECT doc_id, lang, source, n_chars
FROM base WHERE doc_id NOT IN (SELECT doc_id FROM latest)
UNION ALL
SELECT doc_id, lang, source, n_chars FROM latest WHERE op <> 'D'
ORDER BY doc_id
""",
)
def cdc_apply_changelog(spark, sf_dir):
    """MERGE-style CDC apply (operators/cdc.py): fold an I/U/D changelog
    into a snapshot with last-writer-wins on the sequence number. The
    synthetic changelog exercises every path deterministically on both
    engines: plain updates (doc_id%10), deletes (doc_id%17), inserts under
    new keys (doc_id%25), delete-then-reinsert (doc_id%34 — the seq-3 upsert
    outlives the seq-2 delete), and genuine delete-wins (doc_id%55 — a seq-4
    delete that beats every earlier op, including the seq-3 upsert when both
    hit, e.g. doc_id 0). The %17 deletes alone can't prove delete-wins: every
    doc_id%170 key is also %34, so the late upsert always resurrected it.
    The base table takes one scan and one broadcast anti-join, no shuffle
    and no window — only the changelog is windowed."""
    from mapreducefw_spark.operators import cdc

    base = t(spark, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars")
    docs = t(spark, sf_dir, "documents")
    updates = docs.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id", "lang",
        F.lit("cdc_update").alias("source"),
        (F.col("n_chars") + 1).alias("n_chars"),
        F.lit("U").alias("op"), F.lit(1).alias("seq"),
    )
    deletes = docs.filter(F.col("doc_id") % 17 == 0).select(
        "doc_id", "lang", "source", "n_chars",
        F.lit("D").alias("op"), F.lit(2).alias("seq"),
    )
    inserts = docs.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.lit("xx").alias("lang"),
        F.lit("cdc_insert").alias("source"),
        F.col("n_chars"),
        F.lit("I").alias("op"), F.lit(1).alias("seq"),
    )
    late = docs.filter(F.col("doc_id") % 34 == 0).select(
        "doc_id", "lang",
        F.lit("cdc_late_upsert").alias("source"),
        (F.col("n_chars") + 2).alias("n_chars"),
        F.lit("U").alias("op"), F.lit(3).alias("seq"),
    )
    late_deletes = docs.filter(F.col("doc_id") % 55 == 0).select(
        "doc_id", "lang", "source", "n_chars",
        F.lit("D").alias("op"), F.lit(4).alias("seq"),
    )
    changes = (
        updates.unionByName(deletes)
        .unionByName(inserts)
        .unionByName(late)
        .unionByName(late_deletes)
    )
    return cdc.apply_changelog(base, changes, key_cols=["doc_id"]).orderBy("doc_id")
