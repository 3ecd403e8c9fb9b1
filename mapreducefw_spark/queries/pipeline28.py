"""Round-8 batch 9: embeddings ML-prep tier — class centroids, centroid
confusion, 1-NN leave-one-out eval, intra/inter-class cosine, per-doc
TF-IDF keywords, quantization clip bounds.

Rounds out the embeddings table's oracle-paired coverage with the
label-supervised operations an embedding-quality pipeline runs: per-class
centroids and their confusion matrix (is the space linearly separable by
class?), 1-NN leave-one-out accuracy (the classic embedding eval), the
intra-vs-inter-class cosine margin, and the int8-calibration clip bounds
(the missing prep step in front of embedding_quantized_topk).

Semantic contract with the reference engine: every query is the
map -> shuffle-by-key -> reduce -> sort job shape
(`/root/reference/MapReduceClient.h:47-51`, `MRFCore.cpp:252-446`).

Scale posture:
- centroids are (label, dim) partial-mean exchanges — model-sized output;
  the confusion assignment is the per-dim equi-join form here (honest but
  interpreted); the 100 TB path is the Arrow-batched numpy matmul
  (`operators/similarity.py::assign_cells_vectorized`, the measured
  202.9s -> 3.8s SCALING.md fix) — this query is its oracle-checkable
  twin on the same semantics.
- all O(n²) pair scans (1-NN LOO, intra/inter cosine) run on id-bounded
  subsets (the explode_posexplode idiom) so oracle cost is fixed at any
  sf; the production ANN paths live in operators/similarity.py.
- determinism: pair cosines ROUND(6) before any rank/mean (the
  brute_force_topk contract); centroid components ROUND(6) BEFORE
  distance math so both engines score against the identical model;
  clip bounds are DISCRETE rank percentiles (no interpolation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t

# searchable-vector guard, oracle side (the embedding_cosine_topk idiom)
_OK = """
  SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
"""


@register(
    "centroid_per_label",
    oracle=f"""
WITH ok AS ({_OK}),
ex AS (
  SELECT label, u.pos, u.v
  FROM (SELECT label,
               UNNEST(list_transform(e, (x, i) -> struct_pack(pos := i - 1, v := x))) AS u
        FROM ok)
)
SELECT label, pos,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(v) / COUNT(*), 6) AS mean_v
FROM ex
GROUP BY label, pos
ORDER BY label NULLS LAST, pos
""",
)
def centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class embedding centroid, long form (label, dim, mean) — the
    model artifact behind nearest-class-mean classification, SemDeDup
    seeding and class-prototype drift monitors. One (label, dim)
    partial-mean exchange after the posexplode — output is
    model-sized (|labels|·dims rows) whatever the corpus size. The
    component mean is a double sum over per-class rows (order drift
    ~1e-12 at any realistic class size, absorbed by ROUND(6)); NULL
    label is its own centroid, pinned NULLS LAST."""
    emb = t(spark, sf_dir, "embeddings").filter(
        F.col("vec_id").isNotNull()
        & F.col("embedding").isNotNull()
        & (F.size(F.filter(F.col("embedding"), lambda x: x.isNull())) == 0)
    )
    ex = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v"),
    )
    return (
        ex.groupBy("label", "pos")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("v") / F.count(F.lit(1)), 6).alias("mean_v"),
        )
        .orderBy(F.asc_nulls_last("label"), "pos")
    )


@register(
    "centroid_confusion_matrix",
    oracle=f"""
WITH ok AS ({_OK}),
lab AS (SELECT * FROM ok WHERE label IS NOT NULL),
ex AS (
  SELECT vec_id, label, u.pos, u.v
  FROM (SELECT vec_id, label,
               UNNEST(list_transform(e, (x, i) -> struct_pack(pos := i - 1, v := x))) AS u
        FROM lab)
),
cent AS (
  SELECT label AS clabel, pos, ROUND(SUM(v) / COUNT(*), 6) AS c
  FROM ex GROUP BY label, pos
),
dist AS (
  SELECT ex.vec_id, ex.label, cent.clabel,
         ROUND(SUM((ex.v - cent.c) * (ex.v - cent.c)), 6) AS d2
  FROM ex JOIN cent USING (pos)
  GROUP BY ex.vec_id, ex.label, cent.clabel
),
pred AS (
  SELECT vec_id, label,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rk,
         clabel
  FROM dist
)
SELECT label AS true_label, clabel AS pred_label,
       CAST(COUNT(*) AS BIGINT) AS n
FROM pred WHERE rk = 1
GROUP BY label, clabel
ORDER BY true_label, pred_label
""",
)
def centroid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-class-mean confusion matrix: every labeled vector assigned
    to its closest class centroid (squared L2, ROUNDED centroids so both
    engines score against the IDENTICAL model; distances ROUND(6) before
    the argmin, clabel tiebreak) — the 5-minute answer to "is this
    embedding space linearly separable by class?". The per-dim equi-join
    scoring here is the ORACLE-CHECKABLE twin; the production assignment
    is the Arrow-batched numpy matmul
    (`operators/similarity.py::assign_cells_vectorized`) whose
    expression-tree predecessor measured 202.9s -> 3.8s in SCALING.md.
    Output is |labels|² max."""
    emb = t(spark, sf_dir, "embeddings").filter(
        F.col("vec_id").isNotNull()
        & F.col("label").isNotNull()
        & F.col("embedding").isNotNull()
        & (F.size(F.filter(F.col("embedding"), lambda x: x.isNull())) == 0)
    )
    ex = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v"),
    )
    cent = ex.groupBy(F.col("label").alias("clabel"), "pos").agg(
        F.round(F.sum("v") / F.count(F.lit(1)), 6).alias("c")
    )
    dist = (
        ex.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "label", "clabel")
        .agg(F.round(F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))), 6).alias("d2"))
    )
    pred = dist.select(
        "vec_id",
        "label",
        "clabel",
        F.row_number().over(W.partitionBy("vec_id").orderBy("d2", "clabel")).alias("rk"),
    ).filter(F.col("rk") == 1)
    return (
        pred.groupBy(F.col("label").alias("true_label"), F.col("clabel").alias("pred_label"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("true_label", "pred_label")
    )


@register(
    "knn_loo_accuracy",
    oracle=f"""
WITH ok AS ({_OK}),
sub AS (
  SELECT vec_id, label, e FROM ok
  WHERE label IS NOT NULL AND vec_id < 200
    AND COALESCE(list_sum(list_transform(e, x -> x * x)), 0) > 0
),
sims AS (
  SELECT a.vec_id AS qid, a.label AS qlabel, b.vec_id AS nid, b.label AS nlabel,
         ROUND(list_cosine_similarity(a.e, b.e), 6) AS sim
  FROM sub a JOIN sub b ON a.vec_id <> b.vec_id
),
nn AS (
  SELECT qid, qlabel, nlabel,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk
  FROM sims
)
SELECT qlabel AS label,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END) AS BIGINT) AS correct,
       ROUND(CAST(SUM(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS accuracy
FROM nn WHERE rk = 1
GROUP BY qlabel
ORDER BY qlabel
""",
)
def knn_loo_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-NN leave-one-out accuracy per label — the classic no-training
    embedding-quality eval (can the space retrieve same-class neighbors?).
    Runs brute_force_topk (k=1, self excluded, ROUND(6) sims, nid
    tiebreak) on the id-bounded vec_id < 200 subset so the O(n²) pair
    scan — and the oracle's — is fixed-cost at any sf; the production
    path for full-corpus eval is the IVF/LSH ANN tier. Zero-norm vectors
    are excluded by the searchable guard on both sides."""
    from mapreducefw_spark.operators.similarity import as_double_vecs, brute_force_topk

    emb = t(spark, sf_dir, "embeddings")
    labels = emb.filter(
        F.col("vec_id").isNotNull() & F.col("label").isNotNull()
    ).select(F.col("vec_id").alias("vid"), "label")
    sub = as_double_vecs(emb).join(labels, "vid").filter(F.col("vid") < 200)
    vecs = sub.select("vid", "vec")
    nn = brute_force_topk(vecs, vecs, k=1).filter(F.col("rk") == 1)
    q_lab = labels.select(F.col("vid").alias("qid"), F.col("label").alias("qlabel"))
    n_lab = labels.select(F.col("vid").alias("nid"), F.col("label").alias("nlabel"))
    j = nn.join(q_lab, "qid").join(n_lab, "nid")
    correct = F.sum(F.when(F.col("nlabel") == F.col("qlabel"), 1).otherwise(0))
    return (
        j.groupBy(F.col("qlabel").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            correct.cast("bigint").alias("correct"),
            F.round(correct.cast("double") / F.count(F.lit(1)), 6).alias("accuracy"),
        )
        .orderBy("label")
    )


@register(
    "intra_inter_label_cosine",
    oracle=f"""
WITH ok AS ({_OK}),
sub AS (
  SELECT vec_id, label, e FROM ok
  WHERE label IS NOT NULL AND vec_id < 100
    AND COALESCE(list_sum(list_transform(e, x -> x * x)), 0) > 0
),
pairs AS (
  SELECT CASE WHEN a.label = b.label THEN 'intra' ELSE 'inter' END AS bucket,
         ROUND(list_cosine_similarity(a.e, b.e), 6) AS sim
  FROM sub a JOIN sub b ON a.vec_id < b.vec_id
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(SUM(sim) / COUNT(*), 6) AS mean_cosine
FROM pairs
GROUP BY bucket
ORDER BY bucket
""",
)
def intra_inter_label_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra- vs inter-class mean cosine — the separation margin that
    says whether class structure exists at all (intra >> inter) before
    anyone trains a probe. All pairs of the id-bounded vec_id < 100
    subset (fixed O(n²) cost at any sf, production = ANN tier); each
    pair cosine is ROUND(6)-ed first (identical on both engines, the
    brute_force contract), so the bucket mean is a short drift-bounded
    sum over identical doubles."""
    from mapreducefw_spark.operators.similarity import _dot, _norm, as_double_vecs

    emb = t(spark, sf_dir, "embeddings")
    labels = emb.filter(
        F.col("vec_id").isNotNull() & F.col("label").isNotNull()
    ).select(F.col("vec_id").alias("vid"), "label")
    sub = (
        as_double_vecs(emb)
        .join(labels, "vid")
        .filter(F.col("vid") < 100)
        .select("vid", "label", "vec", _norm(F.col("vec")).alias("nrm"))
        .filter(F.col("nrm") > 0)
    )
    a = sub.select(
        F.col("vid").alias("aid"), F.col("label").alias("alab"),
        F.col("vec").alias("avec"), F.col("nrm").alias("an"),
    )
    b = sub.select(
        F.col("vid").alias("bid"), F.col("label").alias("blab"),
        F.col("vec").alias("bvec"), F.col("nrm").alias("bn"),
    )
    pairs = a.join(F.broadcast(b), F.col("aid") < F.col("bid")).select(
        F.when(F.col("alab") == F.col("blab"), F.lit("intra"))
        .otherwise(F.lit("inter"))
        .alias("bucket"),
        F.round(
            _dot(F.col("avec"), F.col("bvec")) / (F.col("an") * F.col("bn")), 6
        ).alias("sim"),
    )
    return (
        pairs.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(F.sum("sim") / F.count(F.lit(1)), 6).alias("mean_cosine"),
        )
        .orderBy("bucket")
    )


@register(
    "doc_keywords_tfidf",
    oracle="""
WITH tk AS (
  SELECT doc_id, token
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents)
  WHERE token <> ''
),
n_docs AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents WHERE text IS NOT NULL),
df AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS dfreq FROM tk GROUP BY token),
tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tfreq
  FROM tk WHERE doc_id < 50 GROUP BY doc_id, token
),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tfreq,
         ROUND(tf.tfreq * LN(CAST(nd AS DOUBLE) / dfreq), 6) AS score
  FROM tf JOIN df USING (token) CROSS JOIN n_docs
),
ranked AS (
  SELECT doc_id, token, tfreq, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rk
  FROM scored
)
SELECT doc_id, rk AS rank, token, tfreq, score
FROM ranked WHERE rk <= 3
ORDER BY doc_id, rk
""",
)
def doc_keywords_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF keywords — the doc-level complement to
    the corpus-level tfidf_top_terms: term frequency inside the doc
    times ln(N/df) against the FULL corpus document frequency. The
    keyword output is id-bounded (doc_id < 50, the explode_posexplode
    idiom) but the df statistics always scan the whole corpus — the
    realistic shape where the model (df table) is corpus-derived and
    the application side is incremental. Integer tf/df + one ln each;
    (score desc, token) rank pinned."""
    d = t(spark, sf_dir, "documents")
    tk = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    nd = d.filter(F.col("text").isNotNull()).agg(
        F.count(F.lit(1)).cast("bigint").alias("nd")
    )
    df_t = tk.groupBy("token").agg(F.countDistinct("doc_id").cast("bigint").alias("dfreq"))
    tf = (
        tk.filter(F.col("doc_id") < 50)
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tfreq"))
    )
    scored = (
        tf.join(df_t, "token")
        .join(F.broadcast(nd))
        .select(
            "doc_id",
            "token",
            "tfreq",
            F.round(
                F.col("tfreq") * F.log(F.col("nd").cast("double") / F.col("dfreq")), 6
            ).alias("score"),
        )
    )
    ranked = scored.select(
        "doc_id",
        "token",
        "tfreq",
        "score",
        F.row_number()
        .over(W.partitionBy("doc_id").orderBy(F.desc("score"), "token"))
        .alias("rk"),
    )
    return (
        ranked.filter(F.col("rk") <= 3)
        .select("doc_id", F.col("rk").alias("rank"), "token", "tfreq", "score")
        .orderBy("doc_id", "rank")
    )


@register(
    "quantization_clip_bounds",
    oracle=f"""
WITH ok AS ({_OK}),
ex AS (
  SELECT u.pos, u.v
  FROM (SELECT UNNEST(list_transform(e, (x, i) -> struct_pack(pos := i - 1, v := x))) AS u
        FROM ok)
),
r AS (
  SELECT pos, v,
         ROW_NUMBER() OVER (PARTITION BY pos ORDER BY v) AS rk,
         COUNT(*) OVER (PARTITION BY pos) AS n
  FROM ex
)
SELECT pos,
       CAST(MAX(n) AS BIGINT) AS n,
       MAX(CASE WHEN rk = CAST(CEIL(0.01 * n) AS BIGINT) THEN v END) AS p01,
       MAX(CASE WHEN rk = CAST(CEIL(0.99 * n) AS BIGINT) THEN v END) AS p99
FROM r
GROUP BY pos
ORDER BY pos
""",
)
def quantization_clip_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension p1/p99 clip bounds — the int8-quantization
    calibration step in front of embedding_quantized_topk (clipping to
    robust percentiles before scaling kills the outlier-stretched-range
    problem that wrecks symmetric quantization). DISCRETE rank
    percentiles (value at ceil(p·n), no interpolation — the
    percentile_disc idiom, exact on the raw parquet doubles); the rank
    window partitions BY DIMENSION, so each partition is corpus-rows
    sized per dim — the exact-by-sorting oracle-twin cost; the sketch
    scale path is approx_percentile per dim."""
    emb = t(spark, sf_dir, "embeddings").filter(
        F.col("vec_id").isNotNull()
        & F.col("embedding").isNotNull()
        & (F.size(F.filter(F.col("embedding"), lambda x: x.isNull())) == 0)
    )
    ex = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v")
    )
    r = ex.select(
        "pos",
        "v",
        F.row_number().over(W.partitionBy("pos").orderBy("v")).alias("rk"),
        F.count(F.lit(1)).over(W.partitionBy("pos")).alias("n"),
    )

    def at(p: float, name: str):
        return F.max(
            F.when(F.col("rk") == F.ceil(F.lit(p) * F.col("n")).cast("long"), F.col("v"))
        ).alias(name)

    return (
        r.groupBy("pos")
        .agg(F.max("n").cast("bigint").alias("n"), at(0.01, "p01"), at(0.99, "p99"))
        .orderBy("pos")
    )
