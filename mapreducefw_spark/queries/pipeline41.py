"""Round-12 registrations, batch 2: the post-training preference-data tier.

Modern LLM training doesn't end at pretraining curation: the post-training
stage (RLHF / RLAIF / DPO) runs its own data pipeline over (prompt,
candidate-response, reward) triples at corpus scale. This module adds the
four standard operators of that pipeline, each expressed as a declarative
Spark plan over a deterministic candidate pool derived from the documents
fixture:

1. ``best_of_n_selection`` — rejection sampling (best-of-n): per prompt,
   keep the argmax-reward candidate (Touvron et al. 2023, Llama 2 §3.2.2;
   Nakano et al. 2021 WebGPT best-of-n). Emits the per-prompt winner plus
   the selection margin over the runner-up — the signal used to decide
   whether a prompt's pool is worth another sampling round.
2. ``dpo_pair_construction`` — DPO/RLHF preference-pair assembly
   (Rafailov et al. 2023): per prompt, (chosen, rejected) = (argmax,
   argmin) reward with a minimum reward gap, the standard "max-margin
   pair per prompt" recipe.
3. ``preference_win_matrix`` — pairwise win/loss/tie counts between the
   candidate-generating models (the arena-style aggregation of Chiang et
   al. 2024, Chatbot Arena): within-prompt cross-model candidate pairs,
   oriented (model_a < model_b), with a per-pairing win rate.
4. ``bradley_terry_ratings`` — Bradley-Terry strengths fitted on the win
   matrix by the MM algorithm (Hunter 2004, "MM algorithms for
   generalized Bradley-Terry models") — the rating model behind arena
   leaderboards and reward-model calibration. Rows-only by design
   (iterative float fixpoint); pinned in pytest against a pure-Python MM
   replay and on analytic cases (symmetric matrix -> equal strengths,
   dominant model -> top rank).

The candidate pool: every document is a candidate response; prompt_id =
doc_id // N_CAND groups consecutive ids into an n-candidate pool (the
best-of-n shape), model_id = doc_id % N_MODELS assigns the generating
policy, and the reward is a deterministic integer stand-in for a reward
model score, 3 * n_whitespace_tokens + length(text) % 97 — content-based,
exactly reproducible in both engines (pure BIGINT arithmetic), and
order-free. Swapping a real reward-model column in changes nothing
structurally.

Cross-engine determinism: rewards/counts are exact BIGINT everywhere; the
only doubles are single divisions of BIGINTs (win_rate_a), bit-identical
across engines; every rank is total-ordered (reward, doc_id tiebreak).

Scale posture (100 TB): the candidate scan is map-only; per-prompt ranks
go through the two-phase ``topk_per_key`` (no single-task key funnel);
the within-prompt self-join is bounded by the pool size n (<= N_CAND
candidates -> <= n^2 pairs per prompt, the physical contract of
best-of-n data); the win matrix is |models|^2 rows — model-sized; the
Bradley-Terry collect moves <= |models|^2 rows (documented model-sized
artifact, the tokenizer-merge-table idiom). No full windows, no
driver-side loops over data-sized frames.

Semantic contract with the reference engine: map -> shuffle by key ->
reduce -> sort, the job shape of `/root/reference/MapReduceClient.h:47-51`,
`MRFCore.cpp:252-446`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.operators.rank import topk_per_key
from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t

N_CAND = 8  # candidates per prompt (the "n" of best-of-n)
N_MODELS = 4  # candidate-generating policies
DPO_MARGIN = 8  # minimum chosen-rejected reward gap for a DPO pair
BT_ITERS = 50  # MM fixpoint iterations (fixed-count, deterministic)

# the candidate-pool CTE shared by every oracle in this module
_CAND_SQL = """
cand AS (
  SELECT doc_id,
         doc_id // {n_cand} AS prompt_id,
         doc_id % {n_models} AS model_id,
         CAST(3 * len(list_filter(string_split(text, ' '), x -> x <> ''))
              + length(text) % 97 AS BIGINT) AS reward,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_tok
  FROM documents
  WHERE doc_id IS NOT NULL AND doc_id >= 0 AND text IS NOT NULL
)
""".format(n_cand=N_CAND, n_models=N_MODELS)
# doc_id >= 0 makes the nonnegativity assumption explicit on BOTH engines
# (ADVICE r12): DuckDB's // truncates toward zero while Spark's
# F.floor(/) floors, and % sign conventions differ too — for negative ids
# prompt_id/model_id would silently diverge. Restricting the pool to
# nonnegative ids pins the shared domain where the two arithmetics agree.


def candidate_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, prompt_id, model_id, reward, n_tok): the deterministic
    (prompt, candidate, reward) pool — one map-only projection."""
    d = t(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
        & (F.col("doc_id") >= 0)
        & F.col("text").isNotNull()
    )
    n_tok = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    return d.select(
        F.col("doc_id"),
        F.floor(F.col("doc_id") / N_CAND).cast("bigint").alias("prompt_id"),
        (F.col("doc_id") % N_MODELS).cast("bigint").alias("model_id"),
        (F.lit(3) * n_tok + F.length("text") % 97).cast("bigint").alias("reward"),
        n_tok.cast("bigint").alias("n_tok"),
    )


@register(
    "best_of_n_selection",
    oracle=f"""
WITH {_CAND_SQL},
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY prompt_id
                               ORDER BY reward DESC, doc_id ASC) AS prk
  FROM cand
),
counts AS (
  SELECT prompt_id, CAST(COUNT(*) AS BIGINT) AS n_candidates
  FROM cand GROUP BY prompt_id
)
SELECT r1.prompt_id,
       r1.doc_id   AS chosen_id,
       r1.model_id AS chosen_model,
       r1.reward   AS chosen_reward,
       CAST(r1.reward - r2.reward AS BIGINT) AS margin,
       counts.n_candidates
FROM ranked r1
LEFT JOIN ranked r2 ON r2.prompt_id = r1.prompt_id AND r2.prk = 2
JOIN counts ON counts.prompt_id = r1.prompt_id
WHERE r1.prk = 1
""",
)
def best_of_n_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rejection sampling: per prompt, the argmax-reward candidate plus the
    margin over the runner-up (NULL for single-candidate pools). Ranks via
    two-phase topk_per_key(k=2) — no per-key task funnel."""
    c = candidate_pool(spark, sf_dir)
    top2 = topk_per_key(
        c, ["prompt_id"], [F.desc("reward"), F.asc("doc_id")], 2, rank_col="prk"
    )
    counts = c.groupBy("prompt_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates")
    )
    best = top2.groupBy("prompt_id").agg(
        F.max(F.when(F.col("prk") == 1, F.col("doc_id"))).alias("chosen_id"),
        F.max(F.when(F.col("prk") == 1, F.col("model_id"))).alias("chosen_model"),
        F.max(F.when(F.col("prk") == 1, F.col("reward"))).alias("chosen_reward"),
        F.max(F.when(F.col("prk") == 2, F.col("reward"))).alias("_runner_up"),
    )
    return best.join(counts, "prompt_id").select(
        "prompt_id",
        "chosen_id",
        "chosen_model",
        "chosen_reward",
        (F.col("chosen_reward") - F.col("_runner_up")).cast("bigint").alias("margin"),
        "n_candidates",
    )


@register(
    "dpo_pair_construction",
    oracle=f"""
WITH {_CAND_SQL},
best AS (
  SELECT prompt_id, doc_id AS chosen_id, reward AS chosen_reward,
         n_tok AS chosen_tokens,
         ROW_NUMBER() OVER (PARTITION BY prompt_id
                            ORDER BY reward DESC, doc_id ASC) AS prk
  FROM cand
),
worst AS (
  SELECT prompt_id, doc_id AS rejected_id, reward AS rejected_reward,
         n_tok AS rejected_tokens,
         ROW_NUMBER() OVER (PARTITION BY prompt_id
                            ORDER BY reward ASC, doc_id DESC) AS prk
  FROM cand
)
SELECT b.prompt_id, b.chosen_id, b.chosen_reward, b.chosen_tokens,
       w.rejected_id, w.rejected_reward, w.rejected_tokens,
       CAST(b.chosen_reward - w.rejected_reward AS BIGINT) AS reward_gap
FROM best b JOIN worst w ON w.prompt_id = b.prompt_id AND w.prk = 1
WHERE b.prk = 1
  AND b.chosen_id <> w.rejected_id
  AND b.chosen_reward - w.rejected_reward >= {DPO_MARGIN}
""",
)
def dpo_pair_construction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO preference pairs: per prompt (argmax, argmin) reward candidates
    with a minimum gap of DPO_MARGIN; degenerate single-candidate and
    all-tied pools drop. Both extremes via two-phase topk_per_key."""
    c = candidate_pool(spark, sf_dir)
    best = topk_per_key(
        c, ["prompt_id"], [F.desc("reward"), F.asc("doc_id")], 1, rank_col="prk"
    ).select(
        "prompt_id",
        F.col("doc_id").alias("chosen_id"),
        F.col("reward").alias("chosen_reward"),
        F.col("n_tok").alias("chosen_tokens"),
    )
    # opposite tiebreak direction so a fully-tied pool picks a DIFFERENT
    # doc than the chosen side and is then dropped by the id inequality
    worst = topk_per_key(
        c, ["prompt_id"], [F.asc("reward"), F.desc("doc_id")], 1, rank_col="prk"
    ).select(
        "prompt_id",
        F.col("doc_id").alias("rejected_id"),
        F.col("reward").alias("rejected_reward"),
        F.col("n_tok").alias("rejected_tokens"),
    )
    gap = F.col("chosen_reward") - F.col("rejected_reward")
    return (
        best.join(worst, "prompt_id")
        .filter(
            (F.col("chosen_id") != F.col("rejected_id")) & (gap >= DPO_MARGIN)
        )
        .select(
            "prompt_id",
            "chosen_id",
            "chosen_reward",
            "chosen_tokens",
            "rejected_id",
            "rejected_reward",
            "rejected_tokens",
            gap.cast("bigint").alias("reward_gap"),
        )
    )


_WIN_MATRIX_SQL = f"""
WITH {_CAND_SQL},
pairs AS (
  SELECT LEAST(a.model_id, b.model_id)    AS model_a,
         GREATEST(a.model_id, b.model_id) AS model_b,
         CASE WHEN a.model_id < b.model_id THEN a.reward ELSE b.reward END AS r_a,
         CASE WHEN a.model_id < b.model_id THEN b.reward ELSE a.reward END AS r_b
  FROM cand a JOIN cand b
    ON a.prompt_id = b.prompt_id AND a.doc_id < b.doc_id
   AND a.model_id <> b.model_id
)
SELECT model_a, model_b,
       CAST(COUNT(*) AS BIGINT)                                AS n_comparisons,
       CAST(SUM(CASE WHEN r_a > r_b THEN 1 ELSE 0 END) AS BIGINT) AS wins_a,
       CAST(SUM(CASE WHEN r_b > r_a THEN 1 ELSE 0 END) AS BIGINT) AS wins_b,
       CAST(SUM(CASE WHEN r_a = r_b THEN 1 ELSE 0 END) AS BIGINT) AS ties,
       CASE WHEN SUM(CASE WHEN r_a <> r_b THEN 1 ELSE 0 END) > 0
            THEN CAST(SUM(CASE WHEN r_a > r_b THEN 1 ELSE 0 END) AS DOUBLE)
                 / SUM(CASE WHEN r_a <> r_b THEN 1 ELSE 0 END)
       END AS win_rate_a
FROM pairs GROUP BY model_a, model_b
"""


def _win_pairs(c: DataFrame) -> DataFrame:
    """(model_a < model_b, r_a, r_b) oriented within-prompt cross-model
    candidate pairs. The self-join is bounded by the pool size (<= N_CAND
    candidates per prompt by construction -> <= n^2 rows per prompt)."""
    a = c.select(
        "prompt_id",
        F.col("doc_id").alias("id_a"),
        F.col("model_id").alias("m_a"),
        F.col("reward").alias("ra"),
    )
    b = c.select(
        "prompt_id",
        F.col("doc_id").alias("id_b"),
        F.col("model_id").alias("m_b"),
        F.col("reward").alias("rb"),
    )
    return (
        a.join(b, "prompt_id")
        .filter((F.col("id_a") < F.col("id_b")) & (F.col("m_a") != F.col("m_b")))
        .select(
            F.least("m_a", "m_b").alias("model_a"),
            F.greatest("m_a", "m_b").alias("model_b"),
            F.when(F.col("m_a") < F.col("m_b"), F.col("ra"))
            .otherwise(F.col("rb"))
            .alias("r_a"),
            F.when(F.col("m_a") < F.col("m_b"), F.col("rb"))
            .otherwise(F.col("ra"))
            .alias("r_b"),
        )
    )


def win_matrix(c: DataFrame) -> DataFrame:
    """Arena-style pairwise aggregation: per oriented model pairing, the
    decisive win counts and ties. |models|^2-bounded output."""
    decisive = F.sum(F.when(F.col("r_a") != F.col("r_b"), 1).otherwise(0))
    wins_a = F.sum(F.when(F.col("r_a") > F.col("r_b"), 1).otherwise(0))
    return _win_pairs(c).groupBy("model_a", "model_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_comparisons"),
        wins_a.cast("bigint").alias("wins_a"),
        F.sum(F.when(F.col("r_b") > F.col("r_a"), 1).otherwise(0))
        .cast("bigint")
        .alias("wins_b"),
        F.sum(F.when(F.col("r_a") == F.col("r_b"), 1).otherwise(0))
        .cast("bigint")
        .alias("ties"),
        F.when(decisive > 0, wins_a.cast("double") / decisive).alias("win_rate_a"),
    )


@register("preference_win_matrix", oracle=_WIN_MATRIX_SQL)
def preference_win_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise model win/loss/tie matrix from within-prompt cross-model
    candidate pairs; win_rate_a is ONE bigint/bigint division (decisive
    games only, NULL when all tied) — bit-identical across engines."""
    return win_matrix(candidate_pool(spark, sf_dir))


def bradley_terry_mm(
    matches: list[tuple[int, int, int, int]], n_iters: int = BT_ITERS
) -> dict[int, float]:
    """Hunter 2004 MM fixpoint for Bradley-Terry strengths.

    ``matches``: (model_a, model_b, wins_a, wins_b) rows, ties excluded.
    Returns strengths normalized to sum 1. Deterministic: fixed iteration
    count, fixed (sorted-key) accumulation order. Models with zero wins
    converge to strength 0 — the MLE boundary case, kept as-is.
    """
    models: set[int] = set()
    for a, b, _, _ in matches:
        models.update((a, b))
    order = sorted(models)
    p = {m: 1.0 / len(order) for m in order} if order else {}
    for _ in range(n_iters):
        wins = {m: 0.0 for m in order}
        denom = {m: 0.0 for m in order}
        for a, b, wa, wb in sorted(matches):
            n_ab = wa + wb
            if n_ab == 0:
                continue
            wins[a] += wa
            wins[b] += wb
            denom[a] += n_ab / (p[a] + p[b])
            denom[b] += n_ab / (p[a] + p[b])
        nxt = {m: (wins[m] / denom[m] if denom[m] > 0 else 0.0) for m in order}
        tot = sum(nxt[m] for m in order)
        p = {m: (nxt[m] / tot if tot > 0 else 0.0) for m in order}
    return p


@register("bradley_terry_ratings")
def bradley_terry_ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strengths of the candidate-generating models, fitted
    on the decisive-game win matrix by BT_ITERS MM iterations.

    Rows-only by design (iterative float fixpoint — not SQL-expressible);
    pinned in tests/test_pipeline41.py against a pure-Python MM replay on
    the same matrix plus analytic cases. The collect moves the
    |models|^2-bounded matrix (the model-sized-artifact idiom of the
    tokenizer merge tables); the matrix aggregation itself is fully
    distributed, and the fixpoint runs over |models| floats.
    """
    m = win_matrix(candidate_pool(spark, sf_dir))
    rows = m.select("model_a", "model_b", "wins_a", "wins_b").collect()
    matches = [
        (r["model_a"], r["model_b"], int(r["wins_a"]), int(r["wins_b"]))
        for r in rows
    ]
    strengths = bradley_terry_mm(matches)
    games = {m_: 0 for m_ in strengths}
    wins = {m_: 0 for m_ in strengths}
    for a, b, wa, wb in matches:
        games[a] += wa + wb
        games[b] += wa + wb
        wins[a] += wa
        wins[b] += wb
    ranked = sorted(strengths, key=lambda m_: (-strengths[m_], m_))
    out = [
        (int(m_), i + 1, float(strengths[m_]), int(games[m_]), int(wins[m_]))
        for i, m_ in enumerate(ranked)
    ]
    return spark.createDataFrame(
        out, "model_id bigint, bt_rank int, strength double, games bigint, wins bigint"
    )
