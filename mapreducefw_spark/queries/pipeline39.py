"""Round-11 registrations, batch 5: tokenizer-triple completion and the
PQ recall audit.

1. ``wordpiece_learned_merges`` / ``wordpiece_fertility_by_source`` —
   WordPiece induction (Schuster & Nakajima 2012; Wu et al. 2016 §4.1),
   completing the production tokenizer triple next to BPE (Sennrich
   2016, round 2) and unigram-LM (Kudo 2018, round 11): same iterative
   merge loop as BPE but the winner maximizes the likelihood score
   count(ab)/(count(a)·count(b)) — every major LLM tokenizer family is
   now trainable in-engine on the distributed word-frequency table.
   Rows-only by the same contract as the BPE pair (iterative argmax
   loop, not SQL-expressible); the merge sequence, scores, and
   fertility arithmetic are pinned against a pure-Python reference in
   tests/test_bpe.py.
2. ``pq_recall_report`` — the PQ sibling of ``ann_recall_report``:
   recall@5 of the production PQ/ADC pipeline (pq_encode → ADC top-50 →
   exact rerank, the exact ``embedding_pq_topk_portable`` config under
   the sha256 model-constant codebook) against brute-force exact top-5,
   per sampled query vector. Both retrievers replay in the DuckDB
   oracle (codebook literals + the raw-cosine brute CTE), so the recall
   fractions are exact functions of the corpus — with this, every
   driver-verified ANN family (LSH via ann_recall_report, PQ here) has
   a driver-verified quality audit, not just a pytest pin.

Determinism: WordPiece's argmax score is a ratio of exact BIGINT counts
(identical double everywhere) with (left, right) tie-breaks; recall
columns are exact small-int ratios (the gopher_quality_rules division
contract); the truth side ranks raw-vector ROUND(6) cosines and the
approx side reranks normalized-vector ROUND(6) cosines — each side is
internally consistent across engines, and the recall compares ID sets.

Scale posture (100 TB): WordPiece training touches the corpus once
(word-frequency scan); every iteration is O(vocab) + O(symbols) with
broadcast symbol counts and a 1-row broadcast winner — no collect in
the loop. The PQ audit's brute half is Q x N with Q fixed (the audit
contract, see ann_recall_report); the PQ half streams the corpus as
16-byte codes.

Semantic contract with the reference engine: map -> shuffle by key ->
reduce -> sort, the job shape of `/root/reference/MapReduceClient.h:47-51`,
`MRFCore.cpp:252-446`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.operators.persist import pin
from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t
from mapreducefw_spark.queries.pipeline33 import _D0, _PQ_COMMON_SQL, _pq_books

PQ_RECALL_K = 5


@register("wordpiece_learned_merges")  # iterative argmax loop: rows-only (pytest-pinned)
def wordpiece_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 10 WordPiece merge rules learned from the documents corpus
    (operators/bpe.py::learn_wordpiece_merges): the likelihood-scored
    sibling of bpe_learned_merges — count(ab)/(count(a)·count(b)) argmax
    per iteration, O(vocab)+O(symbols) frames, broadcast 1-row winner,
    collect-free. Not SQL-oracle-expressible (10 chained argmax+rewrite
    rounds); sequence/score/tie-break parity vs a pure-Python reference
    is pinned in tests/test_bpe.py."""
    from mapreducefw_spark.operators.bpe import learn_wordpiece_merges

    docs = t(spark, sf_dir, "documents")
    return learn_wordpiece_merges(docs, 10)


@register("wordpiece_fertility_by_source")  # learned model: rows-only (pytest-pinned)
def wordpiece_fertility_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source WordPiece fertility (symbols per whitespace word) under
    the 10 learned rules — the same deployment readout as
    bpe_fertility_by_source / unigram_fertility_by_source, so the three
    tokenizer families are directly comparable per source. Merge
    APPLICATION is rank-ordered greedy left-to-right, identical to how
    the rules were induced (and to BPE application semantics — real
    WordPiece inference uses longest-match-first over the final vocab;
    applying the learned merges is the training-consistent encode and is
    documented as such). The merge list is model-sized (10 rules, the
    allowed-collect class); corpus text is scanned once."""
    from mapreducefw_spark.operators.bpe import (
        bpe_fertility_by_source,
        learn_wordpiece_merges,
    )

    docs = t(spark, sf_dir, "documents")
    merges = [
        (r.left, r.right)
        for r in sorted(
            learn_wordpiece_merges(docs, 10).collect(), key=lambda r: r.rank
        )
    ]
    return (
        bpe_fertility_by_source(docs, merges)
        .withColumnRenamed("bpe_tokens", "wp_tokens")
    )


@register(
    "pq_recall_report",
    oracle=f"""
WITH {_PQ_COMMON_SQL},
adc AS (
  SELECT q.vec_id AS qid, c.vec_id AS nid,
         ROUND(SUM(list_dot_product(
             list_slice(q.e, b.s * {_D0} + 1, (b.s + 1) * {_D0}), b.comp)), 6)
           AS sim
  FROM q
  CROSS JOIN codes c
  JOIN books b ON b.s = c.s AND b.j = c.code
  WHERE c.vec_id <> q.vec_id
  GROUP BY q.vec_id, c.vec_id
),
short AS (
  SELECT qid, nid FROM (
    SELECT qid, nid,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rk
    FROM adc
  ) WHERE rk <= 50
),
rr AS (
  SELECT short.qid, short.nid,
         ROUND(list_dot_product(qe.e, ne.e)
               / (SQRT(list_dot_product(qe.e, qe.e))
                  * SQRT(list_dot_product(ne.e, ne.e))), 6) AS sim
  FROM short
  JOIN n ne ON ne.vec_id = short.nid
  JOIN q qe ON qe.vec_id = short.qid
),
approx AS (
  SELECT qid, nid FROM (
    SELECT qid, nid,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rk
    FROM rr
  ) WHERE rk <= {PQ_RECALL_K}
),
bt AS (
  SELECT q0.vec_id AS qid, v.vec_id AS nid,
         ROUND(list_dot_product(q0.e0, v.e0)
               / (SQRT(list_dot_product(q0.e0, q0.e0))
                  * SQRT(list_dot_product(v.e0, v.e0))), 6) AS sim
  FROM (SELECT * FROM v WHERE vec_id < 10) q0
  CROSS JOIN v WHERE v.vec_id <> q0.vec_id
),
truth AS (
  SELECT qid, nid FROM (
    SELECT qid, nid,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rk
    FROM bt
  ) WHERE rk <= {PQ_RECALL_K}
)
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
def pq_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the production PQ/ADC ANN vs exact brute-force top-5
    per sampled query vector (vec_id < 10) — the ann_recall_report move
    for the PQ family. Runs the PRODUCTION pipeline
    (`similarity.py::pq_encode` → `pq_topk` → `exact_rerank` under the
    pipeline33 sha256 codebook, the embedding_pq_topk_portable config)
    against `brute_force_topk` on the raw vectors, then counts recovered
    truth rows. Every sampled query reports (0-hit rows via the left
    join). Scale: the brute half is the fixed-Q audit cross-join; the PQ
    half touches the corpus as 16-byte codes."""
    from mapreducefw_spark.operators import similarity

    emb = similarity.as_double_vecs(t(spark, sf_dir, "embeddings"))
    truth = similarity.brute_force_topk(
        emb, emb.filter(F.col("vid") < 10), k=PQ_RECALL_K
    )
    # ONE materialization of the normalized corpus (r13): the staged-norm
    # projection inside l2_normalize is collapsed by Catalyst back into
    # the transform lambda (plan-verified), so every downstream consumer
    # that re-derives anything from `nrm` lazily (searchable guards,
    # rerank norms, Arrow input projections, Lloyd passes) re-evaluates
    # an O(dim^2)-per-row fold — measured as 2.4-4.9s SINGLE-TASK scan
    # stages. The checkpoint pins plain double vectors for its >= 2
    # downstream passes; same values, same rows.
    nrm = pin(similarity.l2_normalize(emb))
    books = _pq_books()
    coded = similarity.pq_encode(nrm, books, assume_searchable=True)
    q = nrm.filter(F.col("vid") < 10)
    cand = similarity.pq_topk(coded, q, books, k=50)
    approx = similarity.exact_rerank(cand, nrm, q, k=PQ_RECALL_K)
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
