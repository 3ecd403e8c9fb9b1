"""Round-11 registrations, batch 4: the evaluation / corpus-hygiene /
model-distillation tier a production training-data pipeline runs around
its dedup and retrieval operators.

1. ``ann_recall_report`` — recall@k of the PRODUCTION hyperplane-LSH ANN
   (the exact ``embedding_lsh_topk_portable`` config: 8 tables x 4
   planes) against the brute-force exact top-k, per query vector. The
   standard ANN quality metric (recall@k), elevated from a pytest-only
   accuracy pin to a driver-verified query: BOTH retrievers replay in
   the DuckDB oracle from the shared sha256 plane literals, so the
   recall fractions are exact functions of the corpus. At 100 TB the
   brute side is the expensive half — this is an AUDIT operator you run
   on a sampled query set (here: vec_id < 10) to calibrate
   n_tables/n_planes, not a per-query serving path; the audited LSH
   path itself stays the production candidate tier.
2. ``duplicate_block_filter`` — C4-style (Raffel et al. 2020, the
   "three-sentence span" rule; FineWeb/RefinedWeb line dedup) exact
   duplicate-BLOCK removal accounting. The corpus is newline-free
   synthetic token text, so the dedup unit is the deterministic
   analogue: non-overlapping 10-token blocks. A block occurring >= 2
   times corpus-wide is removed everywhere it occurs; per doc we emit
   block/token counts, tokens removed, and the kept fraction. Unlike
   ``exact_substring_spans`` (overlapping 8-gram chaining into maximal
   spans, the ExactSubstr suffix-array family) this is the
   frequency-threshold fixed-unit family: no chaining, no windows —
   one gram-shuffle and one digest join.
3. ``quality_classifier_weights`` — fastText-style (Joulin et al. 2016)
   quality-classifier TRAINING distilled from the Gopher rule bit
   (``gopher_quality_rules``), the CCNet/LLaMA curation pattern
   (train a cheap linear model on hashed bag-of-words to mimic an
   expensive quality judgment, then score the whole crawl with it).
   Logistic regression over 64 hashed-unigram tf features, 3 epochs of
   full-batch gradient descent. Rows-only by design: each epoch's
   gradient is a float shuffle-sum (partition-order dependent in the
   last ulp) and sigma = 1/(1+exp(-z)) is libm-dependent, so no exact
   cross-engine value hash exists; the pure-Python replay pin lives in
   tests/test_pipeline38.py (rtol 1e-9) plus a learning pin (final
   log-loss beats the w=0 baseline).
4. ``quality_classifier_scores`` — the SCORING half at deployment
   shape, oracle-paired: a published classifier is a constant (like a
   PQ codebook), so its weights are sha256-derived dyadic rationals
   (k/64) emitted into the oracle as literals. Per-doc logit =
   bias + sum_j w[bucket(tok_j)] over raw token counts — every term is
   an exact multiple of 1/64 with bounded magnitude, so double
   summation is EXACT and order-independent on both engines (no
   decimal cast needed), and the per-source means divide identical
   exact sums. Reports per-source doc counts, flagged counts
   (logit > 0), agreement with the Gopher rule bit (the distillation
   quality readout), and mean logit.

Cross-engine determinism: the feature hash is the repo's portable
48-bit md5-prefix bucket (``feature_hashing_counts`` idiom); cosines
ROUND(6); recall/kept fractions are exact-int-over-int divisions
(identical doubles both engines, the gopher_quality_rules contract).

Scale posture (100 TB): recall — signatures are map-only folds,
candidates dedup as bare id pairs, the brute side crossJoin broadcasts
only the sampled query set; blocks — block text never shuffles (32-byte
md5 digests key both the frequency shuffle and the join back), both
aggregations map-side combine; training — per-epoch shuffles carry
(bucket, partial-gradient) pairs capped at 65 x partitions, the model
collect is 65 doubles; scoring — ONE scan, zero explode (per-row HOF
fold over tokens against a 64-literal weight array), then an
O(sources) shuffle.

Semantic contract with the reference engine: map -> shuffle by key ->
reduce -> sort, the job shape of `/root/reference/MapReduceClient.h:47-51`,
`MRFCore.cpp:252-446`.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t
from mapreducefw_spark.queries.pipeline16 import STOPWORDS
from mapreducefw_spark.queries.pipeline32 import _lsh_plane_sql

RECALL_K = 5
RECALL_CONF = {"dim": 64, "n_planes": 4, "n_tables": 8}  # = embedding_lsh_topk_portable

BLOCK = 10  # tokens per dedup block (the C4 "three-sentence span" analogue)
DUP_MIN = 2  # corpus frequency at which a block is removed

QC_BUCKETS = 64  # hashed-feature dimensionality (md5-prefix buckets)
QC_EPOCHS = 3
QC_LR = 1.0


# ---------------------------------------------------------------- ann recall


@register(
    "ann_recall_report",
    oracle=f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
    AND COALESCE(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)), 0) > 0
),
q AS (SELECT * FROM v WHERE vec_id < 10),
bt AS (
  SELECT q.vec_id AS qid, v.vec_id AS nid,
         ROUND(list_dot_product(q.e, v.e)
               / (SQRT(list_dot_product(q.e, q.e))
                  * SQRT(list_dot_product(v.e, v.e))), 6) AS sim
  FROM q CROSS JOIN v WHERE v.vec_id <> q.vec_id
),
brk AS (
  SELECT qid, nid,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rk
  FROM bt
),
truth AS (SELECT qid, nid FROM brk WHERE rk <= {RECALL_K}),
planes(tbl, p, comp) AS (VALUES
{_lsh_plane_sql(n_tables=RECALL_CONF["n_tables"], n_planes=RECALL_CONF["n_planes"], dim=RECALL_CONF["dim"])}
),
sigq AS (
  SELECT q.vec_id AS qid, planes.tbl,
         CAST(SUM(CASE WHEN list_dot_product(q.e, planes.comp) > 0
                       THEN (1 << planes.p) ELSE 0 END) AS BIGINT) AS sig
  FROM q CROSS JOIN planes GROUP BY q.vec_id, planes.tbl
),
sigc AS (
  SELECT v.vec_id AS nid, planes.tbl,
         CAST(SUM(CASE WHEN list_dot_product(v.e, planes.comp) > 0
                       THEN (1 << planes.p) ELSE 0 END) AS BIGINT) AS sig
  FROM v CROSS JOIN planes GROUP BY v.vec_id, planes.tbl
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
  JOIN v ne ON ne.vec_id = cand.nid
  JOIN q qe ON qe.vec_id = cand.qid
),
ark AS (
  SELECT qid, nid,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rk
  FROM rr
),
approx AS (SELECT qid, nid FROM ark WHERE rk <= {RECALL_K})
SELECT truth.qid,
       CAST(COUNT(*) AS BIGINT) AS n_truth,
       CAST(SUM(CASE WHEN approx.nid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hits,
       CAST(SUM(CASE WHEN approx.nid IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS recall_at_k
FROM truth
LEFT JOIN approx ON approx.qid = truth.qid AND approx.nid = truth.nid
GROUP BY truth.qid
ORDER BY truth.qid
""",
)
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the production 8x4 hyperplane-LSH ANN vs exact
    brute-force top-5, per sampled query vector (vec_id < 10). Runs the
    PRODUCTION operators (`operators/similarity.py::brute_force_topk` /
    `random_hyperplane_topk` — the embedding_lsh_topk_portable config),
    then counts truth rows recovered by the approximate set. The recall
    column is an exact small-int ratio, so both engines produce the
    identical double. Every sampled query reports (0-hit queries keep a
    0.0 row via the left join — silent drop would overstate recall)."""
    from mapreducefw_spark.operators import similarity

    emb = similarity.as_double_vecs(t(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vid") < 10)
    truth = similarity.brute_force_topk(emb, q, k=RECALL_K)
    approx = similarity.random_hyperplane_topk(emb, q, k=RECALL_K, **RECALL_CONF)
    hit = approx.select("qid", "nid", F.lit(1).alias("hit"))
    return (
        truth.join(hit, ["qid", "nid"], "left")
        .groupBy("qid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_truth"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("bigint").alias("n_hits"),
        )
        .select(
            "qid",
            "n_truth",
            "n_hits",
            (F.col("n_hits").cast("double") / F.col("n_truth")).alias("recall_at_k"),
        )
        .orderBy("qid")
    )


# ------------------------------------------------------ duplicate-block dedup


@register(
    "duplicate_block_filter",
    oracle=f"""
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents WHERE text IS NOT NULL
),
d2 AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
blk AS (
  SELECT doc_id,
         unnest(list_transform(range((n + {BLOCK} - 1) // {BLOCK}),
                i -> md5(array_to_string(list_slice(toks, i * {BLOCK} + 1,
                                                    i * {BLOCK} + {BLOCK}), ' '))))
           AS block,
         unnest(list_transform(range((n + {BLOCK} - 1) // {BLOCK}),
                i -> len(list_slice(toks, i * {BLOCK} + 1,
                                    i * {BLOCK} + {BLOCK}))))
           AS blen
  FROM d2
),
freq AS (SELECT block, COUNT(*) AS bfreq FROM blk GROUP BY block)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(SUM(CASE WHEN bfreq >= {DUP_MIN} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_blocks,
       CAST(SUM(blen) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN bfreq >= {DUP_MIN} THEN blen ELSE 0 END) AS BIGINT)
         AS tokens_removed,
       CAST(SUM(blen) - SUM(CASE WHEN bfreq >= {DUP_MIN} THEN blen ELSE 0 END)
            AS DOUBLE) / SUM(blen) AS kept_frac
FROM blk JOIN freq USING (block)
GROUP BY doc_id
ORDER BY doc_id
""",
)
def duplicate_block_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/FineWeb-style duplicate-line removal accounting over
    non-overlapping 10-token blocks: any block occurring >= DUP_MIN
    times corpus-wide is removed from EVERY doc that contains it; per
    doc we report block/token counts, tokens removed, and the kept
    fraction (exact int-over-int division). Docs with no tokens drop on
    both engines (no blocks exist to keep or remove). Scale: block TEXT
    never shuffles — blocks key the frequency group-by and the join
    back as 32-byte md5 digests; both per-digest and per-doc
    aggregations are map-side combined. The block frame is derived from
    the document scan TWICE (frequency build + join probe, both pruned
    to (doc_id, text)) — deliberately: a count() window over the digest
    would save the second scan but funnels a mega-duplicated block
    (boilerplate repeated 10^9 times, the realistic worst case) into
    one task, while the group-by side map-combines to distinct digests
    and the probe side streams through an AQE-skew-splittable hash
    join."""
    return block_filter_frame(t(spark, sf_dir, "documents"))


def block_filter_frame(docs: DataFrame) -> DataFrame:
    """The duplicate_block_filter plan over any (doc_id, text) frame —
    factored out so the hypothesis property suite can drive it on random
    corpora (tests/test_pipeline38.py) with the registered query staying
    a thin parquet binding.

    Digest assumption (ADVICE r11): blocks are keyed by md5(block text) on
    BOTH engines — the oracle hashes the same md5 (previously it grouped
    raw block text, so a constructed md5 collision could diverge the two
    engines; now they can never disagree on grouping). md5 collisions ARE
    constructible, so an adversarial corpus could still make two DISTINCT
    blocks count as duplicates of each other — the same accepted collision
    class as every other md5-digest-keyed operator in the repo
    (dup_passage_coverage, exact_substring, minhash shingles — the
    canonical note lives in operators/dedup.py's module docstring);
    content-resistant keying would swap in sha256 at ~2x digest cost with
    no plan change."""
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    d = (
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") > 0)
    )
    nblk = (F.floor((F.size("toks") - 1) / BLOCK) + 1).cast("int")
    blocks = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), nblk - 1),
                lambda i: F.slice("toks", i * BLOCK + 1, BLOCK),
            )
        ).alias("arr"),
    ).select(
        "doc_id",
        F.size("arr").alias("blen"),
        F.md5(F.array_join("arr", " ")).alias("bkey"),
    )
    freq = blocks.groupBy("bkey").agg(F.count(F.lit(1)).alias("bfreq"))
    dup = F.col("bfreq") >= DUP_MIN
    per_doc = (
        blocks.join(freq, "bkey")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
            F.sum(F.when(dup, 1).otherwise(0)).cast("bigint").alias("n_dup_blocks"),
            F.sum("blen").cast("bigint").alias("n_tokens"),
            F.sum(F.when(dup, F.col("blen")).otherwise(0))
            .cast("bigint")
            .alias("tokens_removed"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_blocks",
        "n_dup_blocks",
        "n_tokens",
        "tokens_removed",
        (
            (F.col("n_tokens") - F.col("tokens_removed")).cast("double")
            / F.col("n_tokens")
        ).alias("kept_frac"),
    ).orderBy("doc_id")


# ------------------------------------------------- quality classifier (train)


def _bucket(tok: Column) -> Column:
    """Portable 48-bit md5-prefix feature bucket (feature_hashing_counts
    idiom): identical in Spark, DuckDB, and hashlib."""
    return F.conv(F.substring(F.md5(tok), 1, 12), 16, 10).cast("bigint") % QC_BUCKETS


def _gopher_passes(tokscol: str) -> Column:
    """The gopher_quality_rules pass bit (pipeline16), recomputed inline as
    the distillation target. Kept expression-identical to the registered
    query so the label can never drift from the rule."""
    n_words = F.size(tokscol)
    sum_len = F.aggregate(
        tokscol, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
    )
    nz = n_words > 0
    mean_len = F.when(nz, sum_len.cast("double") / n_words)
    frac_alpha = F.when(
        nz,
        F.size(F.filter(tokscol, lambda x: x.rlike("[a-zA-Z]"))).cast("double")
        / n_words,
    )
    n_stop = F.size(
        F.filter(
            tokscol,
            lambda x: F.array_contains(F.array(*[F.lit(s) for s in STOPWORDS]), x),
        )
    )
    return (
        n_words.between(20, 1000)
        & F.coalesce(mean_len.between(2, 12), F.lit(False))
        & F.coalesce(frac_alpha >= 0.8, F.lit(False))
        & (n_stop >= 2)
    )


def train_quality_classifier(
    spark: SparkSession, sf_dir: str, *, epochs: int = QC_EPOCHS, lr: float = QC_LR
) -> tuple[list[float], float]:
    """Full-batch logistic-regression distillation of the Gopher rule:
    features are L1-normalized hashed-unigram counts (tf), label is the
    rule's pass bit, bias rides as the constant feature j = -1 (x = 1), so
    each epoch is ONE model-sized collect. Per epoch: broadcast the
    65-double model into the plan as literals, one shuffle for the per-doc
    margin, one map-combined shuffle for the per-feature gradient, collect
    65 doubles (the pq_train/kmeans pattern). Returns
    (weights[QC_BUCKETS], bias)."""
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") > 0)
        .select(
            "doc_id",
            F.size("toks").cast("double").alias("n"),
            _gopher_passes("toks").cast("double").alias("y"),
            F.explode("toks").alias("tok"),
        )
    )
    # (doc, feature) tf rows + the per-doc bias row (j=-1, x=1); one
    # shuffle, map-side combined; reused every epoch via localCheckpoint
    # (training runs actions anyway)
    tf = d.groupBy("doc_id", "n", "y", _bucket(F.col("tok")).alias("j")).agg(
        (F.count(F.lit(1)) / F.first("n")).alias("x")
    )
    bias_rows = tf.groupBy("doc_id", "n", "y").agg(
        F.lit(-1).cast("bigint").alias("j"), F.lit(1.0).alias("x")
    )
    feat = tf.unionByName(bias_rows).localCheckpoint()
    n_docs = feat.filter(F.col("j") == -1).count()
    # model vector: index 1 = bias (j=-1), index j+2 = bucket j
    w = [0.0] * (QC_BUCKETS + 1)
    if n_docs == 0:  # empty corpus: no gradient exists, return the zero model
        return w[1:], w[0]
    for _ in range(epochs):
        warr = F.array(*[F.lit(float(v)) for v in w])
        per_doc = feat.groupBy("doc_id", "y").agg(
            F.sum(F.col("x") * F.element_at(warr, (F.col("j") + 2).cast("int"))).alias(
                "wx"
            )
        )
        # margin g = sigma(wx) - y   (bias lives inside wx via j=-1)
        g = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("wx"))) - F.col("y")
        err = per_doc.select("doc_id", g.alias("g"))
        grad_rows = (
            feat.join(err, "doc_id")
            .groupBy("j")
            .agg(F.sum(F.col("g") * F.col("x")).alias("gj"))
            .collect()
        )
        for r in grad_rows:
            w[int(r["j"]) + 1] -= lr * float(r["gj"]) / n_docs
    return w[1:], w[0]


@register("quality_classifier_weights")
def quality_classifier_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained distillation model as a frame: one row per feature
    ('bias' + 64 hash buckets) with its learned weight. Rows-only by
    design — per-epoch gradients are float shuffle-sums and sigma is
    libm-dependent, so no exact cross-engine hash exists; the
    pure-Python replay + learning pins live in tests/test_pipeline38.py."""
    w, b = train_quality_classifier(spark, sf_dir)
    rows = [("bias", float(b))] + [
        (f"h{j:02d}", float(w[j])) for j in range(QC_BUCKETS)
    ]
    return (
        spark.createDataFrame(rows, "feature string, weight double")
        .select("feature", F.round("weight", 6).alias("weight"))
        .orderBy("feature")
    )


# ------------------------------------------------- quality classifier (score)


def _qc_published_weights() -> tuple[list[float], float]:
    """The 'published model' constant: dyadic-rational weights k/64 with
    k = sha256('qc:{j}')[0] % 33 - 16 in [-16, 16] (the PQ-codebook /
    LSH-plane pattern — a shipped classifier is model data, so the oracle
    replays it as literals). Every weight has an exact 6-decimal form."""
    w = [
        (hashlib.sha256(f"qc:{j}".encode()).digest()[0] % 33 - 16) / 64.0
        for j in range(QC_BUCKETS)
    ]
    return w, -0.25


def _qc_weight_sql() -> str:
    w, _ = _qc_published_weights()
    return "[" + ", ".join(f"{v:.6f}" for v in w) + "]::DOUBLE[]"


_QC_W, _QC_BIAS = _qc_published_weights()


def _scored_cte_sql(cols: str = "doc_id") -> str:
    """The scored-CTE chain (tk -> d2 -> scored) shared by every oracle
    that replays the published classifier: the HOF logit fold over the 64
    dyadic weight literals plus the Gopher rule bit. ONE definition — the
    scoring tier (here) and the evaluation tier (pipeline47) compose this
    same text so the two SQL sides cannot silently drift (ADVICE r12).
    ``cols`` is the carried projection (e.g. "doc_id, source")."""
    return f"""tk AS (
  SELECT {cols},
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents WHERE text IS NOT NULL
),
d2 AS (SELECT * FROM tk WHERE len(toks) > 0),
scored AS (
  SELECT {cols},
         {_QC_BIAS:.6f} + list_sum(list_transform(toks,
             tk -> list_extract({_qc_weight_sql()},
                     CAST((CAST(('0x' || substr(md5(tk), 1, 12)) AS BIGINT)
                           % {QC_BUCKETS}) + 1 AS BIGINT)))) AS logit,
         CASE WHEN len(toks) BETWEEN 20 AND 1000
               AND COALESCE(CAST(list_sum(list_transform(toks, x -> strlen(x))) AS DOUBLE)
                            / len(toks) BETWEEN 2 AND 12, FALSE)
               AND COALESCE(CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
                            / len(toks) >= 0.8, FALSE)
               AND len(list_filter(toks, x -> list_contains({list(STOPWORDS)}, x))) >= 2
              THEN 1 ELSE 0 END AS passes
  FROM d2
)"""


@register(
    "quality_classifier_scores",
    oracle=f"""
WITH {_scored_cte_sql("doc_id, source")}
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN logit > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       CAST(SUM(CASE WHEN (CASE WHEN logit > 0 THEN 1 ELSE 0 END) = passes
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
       SUM(logit) / COUNT(*) AS mean_logit
FROM scored
GROUP BY source
ORDER BY source
""",
)
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score the corpus with a published fastText-style classifier and
    report per-source flag rates plus agreement with the Gopher rule bit
    (the distillation-quality readout a curation team watches). The
    deployment-shape half of the classifier pair: ONE scan, ZERO explode
    — the logit is a per-row HOF fold over tokens against the 64-literal
    dyadic weight array (every partial sum exact, so double addition is
    order-independent and both engines agree bitwise), then an
    O(sources) map-combined shuffle."""
    from mapreducefw_spark.operators.textprep import ensure_parallelism

    warr = F.array(*[F.lit(v) for v in _QC_W])
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    # spread the single-row-group scan before the per-token md5 bucket
    # fold (guide §2.5, r14 — see pipeline47.scored_frame): integer
    # counts and sums of exact 1/64-multiples are placement-free.
    d = (
        ensure_parallelism(
            t(spark, sf_dir, "documents")
            .filter(F.col("text").isNotNull())
            .select("doc_id", "source", "text")
        )
        .select("doc_id", "source", toks.alias("toks"))
        .filter(F.size("toks") > 0)
    )
    logit = F.aggregate(
        "toks",
        F.lit(_QC_BIAS),
        lambda acc, tk: acc + F.element_at(warr, (_bucket(tk) + 1).cast("int")),
    )
    scored = d.select(
        "source",
        logit.alias("logit"),
        _gopher_passes("toks").cast("int").alias("passes"),
    )
    verdict = F.when(F.col("logit") > 0, 1).otherwise(0)
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(verdict).cast("bigint").alias("n_flagged"),
            F.sum(F.when(verdict == F.col("passes"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_agree"),
            (F.sum("logit") / F.count(F.lit(1))).alias("mean_logit"),
        )
        .orderBy("source")
    )
