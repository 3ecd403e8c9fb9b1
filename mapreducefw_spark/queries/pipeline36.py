"""Round-11 registrations, batch 2: corpus-curation additions — semantic
benchmark decontamination and the FineWeb-style per-source frequency cap.

1. ``semantic_decontamination`` — the embedding-space complement of the
   n-gram ``benchmark_contamination`` (pipeline2): for every held-out
   benchmark vector (label 9), find training-corpus vectors (label != 9)
   whose cosine exceeds the near-dup threshold, via the production
   multi-table hyperplane LSH candidate tier. The screen modern LLM data
   work runs because paraphrased eval leakage defeats exact n-gram
   matching (semantic dedup/decontam per Abbas et al. 2023 SemDeDup and
   the decontamination sections of recent model reports).
2. ``source_frequency_cap`` — the per-domain cap of RefinedWeb/FineWeb
   curation: keep at most CAP docs per source, selected by deterministic
   hash order (md5 of the doc id — a seedless uniform sample), emit the
   full per-doc keep/remove decision frame.

Cross-engine determinism: LSH planes are the shared sha256 ±1 literal
family (pipeline32's ``_lsh_plane_sql``); cosines ROUND(6) with id
tiebreaks; the cap's hash order is md5-of-decimal-string on both
engines, doc-id tiebroken.

Semantic contract with the reference engine: map -> shuffle by key ->
reduce -> sort, the job shape of `/root/reference/MapReduceClient.h:47-51`,
`MRFCore.cpp:252-446`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t
from mapreducefw_spark.queries.pipeline32 import _lsh_plane_sql

EVAL_LABEL = 9  # the held-out benchmark split
DECON_TAU = 0.4  # the repo-wide embedding near-dup threshold
DECON_CONF = {"k": 20, "dim": 64, "n_planes": 4, "n_tables": 3}
SOURCE_CAP = 20  # max docs kept per source


@register(
    "semantic_decontamination",
    oracle=f"""
WITH vv AS MATERIALIZED (
  SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
    AND COALESCE(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)), 0) > 0
),
ev AS (SELECT vec_id, e FROM vv WHERE label = {EVAL_LABEL}),
tr AS (SELECT vec_id, e FROM vv WHERE label IS DISTINCT FROM {EVAL_LABEL}),
planes(tbl, p, comp) AS (VALUES
{_lsh_plane_sql(n_tables=DECON_CONF["n_tables"], n_planes=DECON_CONF["n_planes"], dim=DECON_CONF["dim"])}
),
sigq AS (
  SELECT ev.vec_id AS qid, planes.tbl,
         CAST(SUM(CASE WHEN list_dot_product(ev.e, planes.comp) > 0
                       THEN (1 << planes.p) ELSE 0 END) AS BIGINT) AS sig
  FROM ev CROSS JOIN planes GROUP BY ev.vec_id, planes.tbl
),
sigc AS (
  SELECT tr.vec_id AS nid, planes.tbl,
         CAST(SUM(CASE WHEN list_dot_product(tr.e, planes.comp) > 0
                       THEN (1 << planes.p) ELSE 0 END) AS BIGINT) AS sig
  FROM tr CROSS JOIN planes GROUP BY tr.vec_id, planes.tbl
),
cand AS (
  SELECT DISTINCT sigq.qid, sigc.nid
  FROM sigq JOIN sigc ON sigc.tbl = sigq.tbl AND sigc.sig = sigq.sig
  WHERE sigq.qid <> sigc.nid
),
rr AS (
  SELECT cand.qid, cand.nid,
         ROUND(list_dot_product(qe.e, ne.e)
               / (SQRT(list_dot_product(qe.e, qe.e))
                  * SQRT(list_dot_product(ne.e, ne.e))), 6) AS sim
  FROM cand
  JOIN tr ne ON ne.vec_id = cand.nid
  JOIN ev qe ON qe.vec_id = cand.qid
),
topk AS (
  SELECT qid, nid, sim,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rk
  FROM rr
  QUALIFY rk <= {DECON_CONF["k"]}
),
hits AS (
  SELECT qid,
         CAST(SUM(CASE WHEN sim >= {DECON_TAU} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_train_hits,
         MAX(sim) AS max_sim
  FROM topk GROUP BY qid
),
closest AS (SELECT qid, nid AS closest_train_id FROM topk WHERE rk = 1)
SELECT ev.vec_id AS eval_vid,
       COALESCE(hits.n_train_hits, 0) AS n_train_hits,
       hits.max_sim,
       closest.closest_train_id,
       COALESCE(hits.n_train_hits, 0) > 0 AS contaminated
FROM ev
LEFT JOIN hits ON hits.qid = ev.vec_id
LEFT JOIN closest ON closest.qid = ev.vec_id
ORDER BY eval_vid
""",
)
def semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination: per held-out benchmark
    vector (label 9, EVAL_LABEL), the training vectors (label != 9,
    NULL = train) inside the production LSH candidate tier
    (DECON_CONF: 3 tables x 4 planes, top-20 per anchor), how many clear the near-dup threshold
    cosine >= 0.4 (DECON_TAU), the strongest match and its id, and the
    contaminated verdict. Every searchable benchmark vector reports
    (LEFT join — a 0-hit row is the audit evidence the screen ran). The
    complement of the n-gram ``benchmark_contamination``: paraphrased
    leakage defeats exact gram matching, so production decontamination
    runs both. Scale: the benchmark side is corpus-fraction here so the
    rerank join is NOT broadcast (broadcast_queries=False); signatures
    are map-only folds; candidates dedup as bare id pairs; per-anchor
    ranks route through two-phase ``topk_per_key``; the hit aggregation
    touches candidate-sized rows."""
    from mapreducefw_spark.operators import similarity
    from mapreducefw_spark.operators.rank import topk_per_key

    raw = t(spark, sf_dir, "embeddings")
    ev = similarity.filter_searchable(
        similarity.as_double_vecs(raw.filter(F.col("label") == EVAL_LABEL))
    )
    tr = similarity.as_double_vecs(
        raw.filter(~F.col("label").eqNullSafe(F.lit(EVAL_LABEL)))
    )
    cands = similarity.random_hyperplane_topk(
        tr, ev, broadcast_queries=False, **DECON_CONF
    )
    hits = cands.groupBy("qid").agg(
        F.sum((F.col("sim") >= DECON_TAU).cast("int"))
        .cast("bigint")
        .alias("n_train_hits"),
        F.max("sim").alias("max_sim"),
    )
    closest = topk_per_key(
        cands.select("qid", "nid", "sim"),
        ["qid"],
        [F.desc("sim"), F.asc("nid")],
        1,
        rank_col="_r",
    ).select("qid", F.col("nid").alias("closest_train_id"))
    return (
        ev.select(F.col("vid").alias("eval_vid"))
        .join(hits, F.col("eval_vid") == F.col("qid"), "left")
        .drop("qid")
        .join(closest, F.col("eval_vid") == F.col("qid"), "left")
        .drop("qid")
        .select(
            "eval_vid",
            F.coalesce("n_train_hits", F.lit(0).cast("bigint")).alias("n_train_hits"),
            "max_sim",
            "closest_train_id",
            (F.coalesce("n_train_hits", F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy("eval_vid")
    )


@register(
    "source_frequency_cap",
    oracle=f"""
WITH d AS (
  SELECT doc_id, source FROM documents WHERE doc_id IS NOT NULL
),
rk AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC,
                                     doc_id ASC) AS r
  FROM d
)
SELECT doc_id, source,
       CASE WHEN r <= {SOURCE_CAP} THEN CAST(r AS INT) END AS kept_rank,
       CASE WHEN r <= {SOURCE_CAP} THEN 'keep' ELSE 'remove' END AS action
FROM rk
ORDER BY doc_id
""",
)
def source_frequency_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-domain frequency cap of RefinedWeb/FineWeb-style curation:
    keep at most SOURCE_CAP=20 docs per source, chosen by deterministic
    hash order (md5 of the decimal doc id — a seedless uniform sample
    that every engine replays bit-identically), and emit the per-doc
    decision frame (kept docs carry their within-source rank). NULL
    doc_id rows drop on both engines (an unaddressable doc can't be
    kept); a NULL source is its own domain. Scale: the keep set routes
    through two-phase ``topk_per_key`` — a mega-domain never funnels
    into one task (the exact failure the plain per-source row_number
    would hit on a 100 TB crawl where one domain is 10% of the data);
    the decision join is a broadcast-sized keep list per executor only
    when CAP x n_sources is small, otherwise an ordinary hash join."""
    from mapreducefw_spark.operators.rank import topk_per_key

    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id", "source")
    )
    kept = topk_per_key(
        docs,
        ["source"],
        [F.asc(F.md5(F.col("doc_id").cast("string"))), F.asc("doc_id")],
        SOURCE_CAP,
        rank_col="kept_rank",
    ).select("doc_id", F.col("kept_rank").cast("int").alias("kept_rank"))
    return (
        docs.join(kept, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "kept_rank",
            F.when(F.col("kept_rank").isNotNull(), F.lit("keep"))
            .otherwise(F.lit("remove"))
            .alias("action"),
        )
        .orderBy("doc_id")
    )
