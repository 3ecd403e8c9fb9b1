"""Round-11 registrations, batch 3: the unigram-LM tokenizer family
(Kudo 2018, arXiv:1804.10959 — the SentencePiece unigram model),
completing the tokenizer tier next to BPE (pipeline4/15):

- ``unigram_lm_vocab`` — seed + 2 fixed EM rounds over the distributed
  word-frequency table, top-30 pieces by probability.
- ``unigram_fertility_by_source`` — Viterbi segmentation under the
  induced model, tokens/word and chars/token per source (the fertility
  KPI that decides whether a tokenizer fits a corpus, mirroring
  ``bpe_fertility_by_source``).

Both register ROWS-ONLY by design: the EM expected counts are
floating-point shuffle sums whose addition order Spark does not pin, so
induced probabilities reproduce only to ~1e-12 across runs — the same
contract as the Lloyd-refined SemDeDup form. The binding correctness
evidence is the pure-Python third implementation pinned in
``tests/test_unigram_lm.py`` (same algorithm, same tie-breaks, probs to
1e-9) plus stable row counts for the driver.

Scale posture: induction touches the corpus once (word-count shuffle);
every EM pass runs over the vocabulary-sized distinct-word frame with
per-batch pre-aggregated expected counts (M-step shuffle bounded by
|vocab| x batches); the model is a few-hundred-row driver artifact (PQ
codebook precedent). See `operators/unigram.py`.

Semantic contract with the reference engine: map -> shuffle by key ->
reduce -> sort, the job shape of `/root/reference/MapReduceClient.h:47-51`,
`MRFCore.cpp:252-446`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t

VOCAB_TOP = 30


@register("unigram_lm_vocab")
def unigram_lm_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 pieces of the induced unigram LM (seed: every corpus char
    + top-150 substrings <= 4 chars; 2 EM rounds, fixed vocab), as
    (rank, piece, prob ROUND(8)) by (prob DESC, piece ASC). The ranked
    list is built driver-side from the model dict — the model IS a
    driver artifact (like the learned BPE merge table), so no
    data-plane rank runs at all."""
    from mapreducefw_spark.operators.unigram import learn_unigram_lm

    probs = learn_unigram_lm(t(spark, sf_dir, "documents"))
    top = sorted(probs.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_TOP]
    rows = [
        (rank, piece, round(prob, 8))
        for rank, (piece, prob) in enumerate(top, start=1)
    ]
    return spark.createDataFrame(rows, "rank int, piece string, prob double")


@register("unigram_fertility_by_source")
def unigram_fertility_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility under the induced unigram LM: per source,
    weighted tokens/word and chars/token from Viterbi segmentation of
    the DISTINCT-word frame (ties resolve toward the longer piece, the
    SentencePiece behavior; unsegmentable words fall back to the
    char-level floor). The per-source word counts join the per-word
    token counts on the word key — vocabulary-sized frames end to end
    after the one corpus tokenize shuffle."""
    from mapreducefw_spark.operators.unigram import (
        learn_unigram_lm,
        viterbi_token_counts,
        word_counts,
    )

    docs = t(spark, sf_dir, "documents")
    probs = learn_unigram_lm(docs)
    wc_global = word_counts(docs).localCheckpoint(eager=False)
    toks = viterbi_token_counts(wc_global, probs)
    per_src = (
        docs.filter(F.col("text").isNotNull())
        .select("source", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    return (
        per_src.join(toks, "word")
        .groupBy("source")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_tokens")).cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(F.col("cnt") * F.col("n_tokens"))
                / F.sum("cnt").cast("double"),
                6,
            ).alias("tokens_per_word"),
            F.round(
                F.sum(F.col("cnt") * F.char_length("word"))
                / F.sum(F.col("cnt") * F.col("n_tokens")).cast("double"),
                6,
            ).alias("chars_per_token"),
        )
        .orderBy(F.asc_nulls_last("source"))
    )
