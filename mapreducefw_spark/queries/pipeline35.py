"""Round-11 registrations, batch 1: the hybrid-retrieval / rank-fusion
tier — what a RAG-shaped training/eval pipeline runs between the
inverted index (pipeline23's BM25) and the ANN tier (pipeline32/33).

1. ``rrf_hybrid_retrieval`` — reciprocal rank fusion (Cormack, Clarke &
   Buettcher, SIGIR 2009) of a lexical BM25 ranking over ``documents``
   and a dense cosine ranking over ``embeddings`` against a fixed,
   deterministic query vector. The canonical hybrid-search shape: two
   retrievers, one fused list, docs may appear in either or both.
2. ``mmr_diversified_rerank`` — maximal marginal relevance (Carbonell &
   Goldstein, SIGIR 1998) greedy diversification over the dense
   candidate pool: step by step pick argmax of
   ``0.7 * relevance - 0.3 * max-sim-to-already-selected``.
3. ``rag_retrieval_pipeline`` — the end-to-end retrieval composition in
   ONE declarative plan: BM25 + dense -> RRF fusion -> MMR
   diversification over the fused pool (relevance = max-normalized RRF
   score; docs without an embedding are treated as orthogonal to
   everything, the honest semantics for partial dense coverage).

Cross-engine determinism: the dense query vector is 64 dyadic rationals
((sha256-byte - 128) / 256 — exact in binary AND decimal, so the SQL
literal replays the identical doubles); all cosines fold in index order
on both engines and take ROUND(6); RRF scores are sums of two exact
divisions in a FIXED expression order, ranked after ROUND(9) with id
tiebreaks; MMR scores are ROUND(7) with id tiebreaks — 7, not 6, on
purpose: 0.7*rel - 0.3*div of two 6-decimal inputs has an EXACT
7-decimal value, so rounding at 7 snaps every engine to the same grid
point, while rounding at 6 lands exactly on a decimal midpoint for
roughly every tenth score and the engines' rounding paths (numpy
scaled half-even, Spark exact-BigDecimal HALF_UP, DuckDB scaled
half-away) resolve those differently — caught by the tri-scale sweep,
three real 1e-6 flips at sf0.001/sf0.1. The greedy argmax is replayed
in the oracle as unrolled per-step CTEs (5 stages,
QUALIFY row_number = 1). The numpy kernel accumulates pairwise dots
per-dimension in index order (never BLAS), keeping the fold bitwise
equal to Spark's ``aggregate(zip_with(...))`` and DuckDB's
``list_dot_product``. Remaining risk is the accepted measure-zero
rounding-midpoint class documented in pipeline33.

Scale posture: both retriever rankings route through the two-phase
``global_topk`` (no unpartitioned window anywhere, no range-sampling or
checkpoint jobs — r14: the full-ranking ``global_rank_running`` was
overkill for rank <= N consumers); the fusion
join is top-N x top-N; the MMR pool is k-bounded per query and the
greedy kernel runs per-query-group inside ``applyInPandas`` — millions
of concurrent queries scale horizontally, each group is O(pool^2) on
64-float vectors.

Semantic contract with the reference engine: map -> shuffle by key ->
reduce -> sort, the job shape of `/root/reference/MapReduceClient.h:47-51`,
`MRFCore.cpp:252-446`.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t
from mapreducefw_spark.queries.pipeline23 import BM25_B, BM25_K1, BM25_QUERY

RRF_K = 60  # the SIGIR-2009 constant: score = sum 1/(60 + rank)
N_LEX = 50  # lexical list depth
N_DENSE = 50  # dense list depth
RRF_TOP = 15  # fused list depth
MMR_POOL = 12  # candidate pool the MMR rerank diversifies over
MMR_K = 5  # diversified picks
# 0.7 / 0.3 are written as LITERALS on both engines (never 1 - 0.7, which
# is 0.30000000000000004 in binary and would shear the two scores apart)
MMR_LAMBDA = 0.7
MMR_ONE_MINUS_LAMBDA = 0.3


def _query_vec() -> list[float]:
    """The fixed dense query vector: 64 deterministic dyadic rationals in
    [-0.5, 0.496]. (byte - 128) / 256 has an exact 8-digit decimal form,
    so ``repr`` round-trips the identical double into the SQL literal —
    the same model-constant pattern as the PQ codebooks (pipeline33) and
    LSH planes (pipeline32)."""
    return [
        (hashlib.sha256(f"rrfq:{i}".encode()).digest()[0] - 128) / 256.0
        for i in range(64)
    ]


def _qvec_sql() -> str:
    return "[" + ", ".join(repr(c) for c in _query_vec()) + "]::DOUBLE[]"


# ---------------------------------------------------------------- lexical

def _bm25_ranked_frame(spark: SparkSession, sf_dir: str, n: int) -> DataFrame:
    """Top-n lexical ranking (id, lex_rk): Okapi BM25 over the fixed
    query-term set, scored exactly like pipeline23's ``bm25_scores`` but
    ranked through the two-phase ``global_topk`` instead of a bare
    global window."""
    from mapreducefw_spark.operators.rank import global_topk

    toks = (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.filter(F.split("text", " "), lambda x: x != "").alias("w"),
        )
    )
    stats = toks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (F.sum(F.size("w")) / F.count(F.lit(1)).cast("double")).alias("avgdl"),
    )
    tf = (
        toks.select("doc_id", F.size("w").alias("dl"), F.explode("w").alias("tok"))
        .filter(F.col("tok").isin(*BM25_QUERY))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"), F.any_value("dl").alias("dl"))
    )
    idf = (
        tf.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .select(
            "tok",
            F.log(
                1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ).alias("idf"),
        )
    )
    term = F.col("idf") * (F.col("f") * (BM25_K1 + 1)) / (
        F.col("f") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(idf), "tok")
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .groupBy("doc_id")
        .agg(F.round(F.sum(term), 6).alias("bm25"))
    )
    ranked = global_topk(scored, [F.desc("bm25"), F.asc("doc_id")], n)
    return ranked.select(
        F.col("doc_id").alias("id"), F.col("global_rank").cast("int").alias("lex_rk")
    )


def _bm25_sql(n: int) -> str:
    """The lexical ranking as oracle CTEs ending in ``lex(id, lex_rk)`` —
    scoring identical to pipeline23's bm25_scores oracle."""
    return f"""
btoks AS MATERIALIZED (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents WHERE text IS NOT NULL
),
bstats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         SUM(len(w)) / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM btoks
),
btf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS f, ANY_VALUE(dl) AS dl
  FROM (SELECT doc_id, unnest(w) AS tok, len(w) AS dl FROM btoks)
  WHERE tok IN {BM25_QUERY}
  GROUP BY doc_id, tok
),
bidf AS (
  SELECT tok, ln(1 + (n_docs - df + 0.5) / (df + 0.5)) AS idf
  FROM (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM btf GROUP BY tok), bstats
),
bscored AS (
  SELECT btf.doc_id,
         ROUND(SUM(bidf.idf * (btf.f * ({BM25_K1} + 1))
               / (btf.f + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * btf.dl / bstats.avgdl))), 6)
           AS bm25
  FROM btf JOIN bidf USING (tok), bstats
  GROUP BY btf.doc_id
),
lex AS MATERIALIZED (
  SELECT doc_id AS id,
         CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS INT) AS lex_rk
  FROM bscored
  QUALIFY lex_rk <= {n}
)"""


# ------------------------------------------------------------------ dense

def _dense_scored_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, vec, sim): ROUND(6) cosine of every searchable embedding to
    the fixed query vector — one map-only scan, no shuffle."""
    from mapreducefw_spark.operators import similarity

    qv = _query_vec()
    qlit = F.array(*[F.lit(c) for c in qv])
    emb = similarity.filter_searchable(
        similarity.as_double_vecs(t(spark, sf_dir, "embeddings"))
    )
    sim = F.round(
        similarity._dot(F.col("vec"), qlit)
        / (similarity._norm(F.col("vec")) * similarity._norm(qlit)),
        6,
    )
    return emb.select(F.col("vid").alias("id"), "vec", sim.alias("sim"))


def _dense_ranked_frame(spark: SparkSession, sf_dir: str, n: int) -> DataFrame:
    """Top-n dense ranking (id, vec, sim, dense_rk) via the two-phase
    global top-k."""
    from mapreducefw_spark.operators.rank import global_topk

    scored = _dense_scored_frame(spark, sf_dir)
    ranked = global_topk(scored, [F.desc("sim"), F.asc("id")], n)
    return ranked.select(
        "id", "vec", "sim", F.col("global_rank").cast("int").alias("dense_rk")
    )


def _dense_sql(n: int) -> str:
    """The dense ranking as oracle CTEs ending in
    ``den(id, e, sim, dense_rk)``."""
    return f"""
dv AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
    AND COALESCE(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)), 0) > 0
),
den AS MATERIALIZED (
  SELECT vec_id AS id, e,
         ROUND(list_dot_product(e, {_qvec_sql()})
               / (SQRT(list_dot_product(e, e))
                  * SQRT(list_dot_product({_qvec_sql()}, {_qvec_sql()}))), 6) AS sim,
         CAST(ROW_NUMBER() OVER (
              ORDER BY ROUND(list_dot_product(e, {_qvec_sql()})
                       / (SQRT(list_dot_product(e, e))
                          * SQRT(list_dot_product({_qvec_sql()}, {_qvec_sql()}))), 6)
                       DESC, vec_id ASC) AS INT) AS dense_rk
  FROM dv
  QUALIFY dense_rk <= {n}
)"""


# ----------------------------------------------------------------- fusion

def _rrf_fused_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, lex_rk, dense_rk, rrf): outer-merge of the two rank lists; a
    doc missing from one list contributes 0 from that side — the standard
    RRF treatment of partial lists.

    The merge is a union + one map-combinable aggregate rather than a
    FULL OUTER join (r14): each id appears at most once per list, so
    max-of-one-non-null per column reproduces the join's row set and
    values exactly, and a full-outer join cannot broadcast — it would pin
    a SortMergeJoin (2 exchanges + sorts) into every fused plan where one
    hash aggregate suffices (guide §2.4). The oracle keeps the FULL OUTER
    spelling; the results are identical by construction."""
    lex = _bm25_ranked_frame(spark, sf_dir, N_LEX)
    den = _dense_ranked_frame(spark, sf_dir, N_DENSE).select("id", "dense_rk")
    nulli = F.lit(None).cast("int")
    merged = (
        lex.select("id", "lex_rk", nulli.alias("dense_rk"))
        .unionByName(den.select("id", nulli.alias("lex_rk"), "dense_rk"))
        .groupBy("id")
        .agg(F.max("lex_rk").alias("lex_rk"), F.max("dense_rk").alias("dense_rk"))
    )
    rrf = F.round(
        F.coalesce(1.0 / (RRF_K + F.col("lex_rk")), F.lit(0.0))
        + F.coalesce(1.0 / (RRF_K + F.col("dense_rk")), F.lit(0.0)),
        9,
    )
    return merged.select("id", "lex_rk", "dense_rk", rrf.alias("rrf"))


def _rrf_sql() -> str:
    """Fusion CTEs ending in ``fused(id, lex_rk, dense_rk, rrf)``."""
    return f"""{_bm25_sql(N_LEX)},
{_dense_sql(N_DENSE).lstrip()},
fused AS MATERIALIZED (
  SELECT COALESCE(lex.id, den.id) AS id, lex.lex_rk, den.dense_rk,
         ROUND(COALESCE(1.0 / ({RRF_K} + lex.lex_rk), 0.0)
               + COALESCE(1.0 / ({RRF_K} + den.dense_rk), 0.0), 9) AS rrf
  FROM lex FULL OUTER JOIN den ON den.id = lex.id
)"""


@register(
    "rrf_hybrid_retrieval",
    oracle=f"""
WITH {_rrf_sql().lstrip()}
SELECT id, lex_rk, dense_rk, rrf,
       CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, id ASC) AS INT) AS fused_rk
FROM fused
QUALIFY fused_rk <= {RRF_TOP}
ORDER BY fused_rk
""",
)
def rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search via reciprocal rank fusion (Cormack et al. 2009):
    BM25 top-50 (N_LEX) over documents + dense cosine top-50 (N_DENSE) over
    embeddings against the fixed query vector, fused as
    sum(1 / (60 + rank)) with absent-side contributions of 0, final
    top-15 (RRF_TOP) with (rrf DESC, id ASC) order. Fuses across TABLES as
    hybrid stacks do across indexes: doc_id and vec_id share the id
    space (the synthetic corpus aligns them; partial dense coverage at
    sf0.1 — 2k vectors vs 5k docs — is exactly the partial-list case RRF
    exists for). Scale: each retriever ranks through the two-phase
    top-k (one hash exchange each); the fusion join and final
    rank touch <= N_LEX + N_DENSE rows."""
    from mapreducefw_spark.operators.rank import global_topk

    fused = _rrf_fused_frame(spark, sf_dir)
    ranked = global_topk(fused, [F.desc("rrf"), F.asc("id")], RRF_TOP)
    return (
        ranked
        .select(
            "id",
            "lex_rk",
            "dense_rk",
            "rrf",
            F.col("global_rank").cast("int").alias("fused_rk"),
        )
        .orderBy("fused_rk")
    )


# -------------------------------------------------------------------- MMR

def _mmr_pick_sql(pool_cte: str, k: int, rel_col: str = "rel") -> str:
    """The greedy MMR selection as k unrolled CTE stages over
    ``{pool_cte}(id, {rel_col})`` + ``psim(a, b, s)``: at each step pick
    argmax of ROUND(0.7*rel - 0.3*max_sim_to_selected, 6) with the id
    tiebreak, exactly the kernel's loop."""
    parts = [
        f"""
best1 AS MATERIALIZED (
  SELECT 1 AS step, id, {rel_col} AS rel, 0.0 AS div,
         ROUND({MMR_LAMBDA} * {rel_col}, 7) AS score
  FROM {pool_cte}
  QUALIFY ROW_NUMBER() OVER (ORDER BY score DESC, id ASC) = 1
),
sel1 AS MATERIALIZED (SELECT id FROM best1)"""
    ]
    for s in range(2, k + 1):
        parts.append(
            f"""
pick{s} AS MATERIALIZED (
  SELECT c.id, c.{rel_col} AS rel,
         COALESCE((SELECT MAX(p.s) FROM psim p
                   WHERE p.a = c.id AND p.b IN (SELECT id FROM sel{s - 1})), 0.0)
           AS div
  FROM {pool_cte} c WHERE c.id NOT IN (SELECT id FROM sel{s - 1})
),
best{s} AS MATERIALIZED (
  SELECT {s} AS step, id, rel, div,
         ROUND({MMR_LAMBDA} * rel - {MMR_ONE_MINUS_LAMBDA} * div, 7) AS score
  FROM pick{s}
  QUALIFY ROW_NUMBER() OVER (ORDER BY score DESC, id ASC) = 1
),
sel{s} AS MATERIALIZED (SELECT id FROM sel{s - 1} UNION ALL SELECT id FROM best{s})"""
        )
    union = " UNION ALL ".join(f"SELECT * FROM best{s}" for s in range(1, k + 1))
    return ",\n".join(parts) + f",\nmmr AS ({union})"


def _mmr_kernel_frame(cand: DataFrame, k: int) -> DataFrame:
    """Greedy MMR over a candidate frame (id, rel, vec nullable) —
    per-query-group ``applyInPandas``; this single-query demo keys the
    one group on a literal, the deployment shape keys on query id. The
    numpy kernel accumulates pairwise dots PER DIMENSION in index order
    (outer-product accumulation, never np.dot/BLAS) so the fold is
    bitwise equal to the engines' sequential folds; candidates without a
    vector are orthogonal to everything (diversity contribution 0)."""
    import numpy as np
    import pandas as pd

    lam, one_minus = MMR_LAMBDA, MMR_ONE_MINUS_LAMBDA

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        n = len(pdf)
        if n == 0:
            return pd.DataFrame(
                {"step": pd.Series([], dtype="int32"),
                 "doc_id": pd.Series([], dtype="int64"),
                 "relevance": pd.Series([], dtype="float64"),
                 "diversity": pd.Series([], dtype="float64"),
                 "mmr_score": pd.Series([], dtype="float64")}
            )
        ids = pdf["id"].to_numpy()
        rel = pdf["rel"].to_numpy(dtype=np.float64)
        has = np.array([v is not None and len(v) > 0 for v in pdf["vec"]])
        sims = np.zeros((n, n))
        if has.any():
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["vec"][has]])
            acc = np.zeros((V.shape[0], V.shape[0]))
            for d in range(V.shape[1]):  # index-order fold == engines' fold
                acc += np.outer(V[:, d], V[:, d])
            norms = np.sqrt(np.diag(acc))
            block = np.round(acc / np.outer(norms, norms), 6)
            idx = np.where(has)[0]
            sims[np.ix_(idx, idx)] = block
        selected: list[int] = []
        rows = []
        for step in range(1, min(k, n) + 1):
            best = None  # (score, id, pos, div)
            for pos in range(n):
                if pos in selected:
                    continue
                div = max((sims[pos, j] for j in selected), default=0.0)
                score = np.round(lam * rel[pos] - one_minus * div, 7)
                key = (-score, ids[pos])
                if best is None or key < best[0]:
                    best = (key, pos, div, score)
            _, pos, div, score = best
            selected.append(pos)
            rows.append((step, int(ids[pos]), rel[pos], float(div), float(score)))
        return pd.DataFrame(
            rows, columns=["step", "doc_id", "relevance", "diversity", "mmr_score"]
        )

    return (
        cand.withColumn("_q", F.lit(0))
        .groupBy("_q")
        .applyInPandas(
            kernel,
            "step int, doc_id bigint, relevance double, diversity double, "
            "mmr_score double",
        )
    )


# psim is TOTAL over pool pairs: a pair with a missing embedding scores
# 0 (orthogonal) as a REAL ROW, so the per-step diversity MAX naturally
# includes the 0 — a selected no-vector item must beat an all-negative
# present-pair max, exactly the kernel's semantics (caught by the r11
# self-review before the driver saw it; a correlated LEFT JOIN variant is
# not implemented in DuckDB).
_PSIM_SQL = """
psim AS MATERIALIZED (
  SELECT a.id AS a, b.id AS b,
         CASE WHEN a.e IS NULL OR b.e IS NULL THEN 0.0
              ELSE ROUND(list_dot_product(a.e, b.e)
                   / (SQRT(list_dot_product(a.e, a.e))
                      * SQRT(list_dot_product(b.e, b.e))), 6) END AS s
  FROM pool a JOIN pool b ON a.id <> b.id
)"""


@register(
    "mmr_diversified_rerank",
    oracle=f"""
WITH {_dense_sql(MMR_POOL).lstrip()},
pool AS MATERIALIZED (SELECT id, e, sim AS rel FROM den),
{_PSIM_SQL.lstrip()},
{_mmr_pick_sql("pool", MMR_K).lstrip()}
SELECT CAST(step AS INT) AS step, id AS doc_id, rel AS relevance,
       div AS diversity, score AS mmr_score
FROM mmr ORDER BY step
""",
)
def mmr_diversified_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal marginal relevance (Carbonell & Goldstein 1998) over the
    dense top-12 (MMR_POOL) pool: greedily pick 5 (MMR_K) results maximizing
    ROUND(0.7 * cosine-to-query - 0.3 * max-cosine-to-selected, 6), id
    tiebreak — the diversification pass every production retrieval stack
    runs between ANN and the context window. The greedy loop runs inside
    one ``applyInPandas`` group (deployment: one group per query id —
    horizontal scale across queries, O(pool^2) inside); the oracle
    replays it as MMR_K unrolled argmax CTE stages. The pool rank
    rides the dense two-phase global rank."""
    cand = _dense_ranked_frame(spark, sf_dir, MMR_POOL).select(
        "id", F.col("sim").alias("rel"), "vec"
    )
    return _mmr_kernel_frame(cand, MMR_K).orderBy("step")


@register(
    "rag_retrieval_pipeline",
    oracle=f"""
WITH {_rrf_sql().lstrip()},
ftop AS MATERIALIZED (
  SELECT id, rrf,
         CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, id ASC) AS INT) AS fused_rk
  FROM fused
  QUALIFY fused_rk <= {MMR_POOL}
),
fmax AS (SELECT MAX(rrf) AS m FROM ftop),
pool AS MATERIALIZED (
  SELECT ftop.id, dv.e, ROUND(ftop.rrf / fmax.m, 6) AS rel, ftop.rrf, ftop.fused_rk
  FROM ftop LEFT JOIN dv ON dv.vec_id = ftop.id, fmax
),
{_PSIM_SQL.lstrip()},
{_mmr_pick_sql("pool", MMR_K).lstrip()}
SELECT CAST(mmr.step AS INT) AS step, mmr.id AS doc_id,
       pool.rrf AS rrf, pool.fused_rk, mmr.rel AS relevance,
       mmr.div AS diversity, mmr.score AS mmr_score,
       pool.e IS NOT NULL AS has_embedding
FROM mmr JOIN pool ON pool.id = mmr.id
ORDER BY step
""",
)
def rag_retrieval_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end retrieval composition in ONE declarative plan —
    what ``corpus_prep_pipeline`` is to the curation tier: BM25 + dense
    cosine -> RRF fusion (top-12, MMR_POOL) -> MMR diversification
    (k=MMR_K=5) with relevance = max-normalized RRF score. Docs that
    only the lexical side found carry no embedding and are treated as
    orthogonal to everything (diversity 0 — the honest semantics for
    partial dense coverage, marked by ``has_embedding``). Each stage
    keeps the scale shape of its standalone form: two-phase ranks, top-N
    fusion join, per-query-group MMR kernel; the normalizing max rides a
    1-row broadcast."""
    from mapreducefw_spark.operators.rank import global_topk

    fused = _rrf_fused_frame(spark, sf_dir)
    ranked = global_topk(fused, [F.desc("rrf"), F.asc("id")], MMR_POOL)
    ftop = ranked.select(
        "id", "rrf", F.col("global_rank").cast("int").alias("fused_rk")
    )
    fmax = ftop.agg(F.max("rrf").alias("m"))
    vecs = _dense_scored_frame(spark, sf_dir).select("id", "vec")
    pool = (
        ftop.join(vecs, "id", "left")
        .crossJoin(F.broadcast(fmax))
        .select(
            "id",
            F.round(F.col("rrf") / F.col("m"), 6).alias("rel"),
            "vec",
            "rrf",
            "fused_rk",
        )
        .localCheckpoint(eager=False)  # feeds the MMR kernel AND the final join
    )
    picked = _mmr_kernel_frame(pool.select("id", "rel", "vec"), MMR_K)
    return (
        picked.join(
            pool.select(F.col("id").alias("doc_id"), "rrf", "fused_rk",
                        F.col("vec").isNotNull().alias("has_embedding")),
            "doc_id",
        )
        .select(
            "step", "doc_id", "rrf", "fused_rk",
            F.col("relevance"), F.col("diversity"), F.col("mmr_score"),
            "has_embedding",
        )
        .orderBy("step")
    )
