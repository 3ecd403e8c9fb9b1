"""Unigram-LM tokenizer induction (Kudo 2018, arXiv:1804.10959) — the
SentencePiece unigram model, completing the tokenizer tier next to BPE
(`operators/bpe.py`): seed a substring vocabulary, EM-reestimate piece
probabilities over the word-frequency table, Viterbi-segment with the
final model.

Distributed shape (the part that must survive 100 TB):
- the corpus collapses to the DISTINCT-WORD frequency table first (one
  map-side tokenize + one hash shuffle) — every later pass touches
  vocabulary-sized data, exactly like `bpe.word_freq_table`;
- the E-step is ``mapInPandas`` over word-count partitions with the
  current piece table (a MODEL-sized artifact, a few hundred rows — the
  PQ-codebook precedent, `similarity.py:514`) carried in the closure;
  each batch emits PRE-AGGREGATED per-piece expected counts, so the
  M-step shuffle is bounded by |vocab| x n_batches, never corpus-sized;
- the M-step is one groupBy-sum (map-side combined);
- Viterbi segmentation is again per-distinct-word ``mapInPandas``.

Forward-backward runs in plain float64 probability space: words are
whitespace tokens (short), pieces are <= 4 chars, and every corpus
character is a seed piece with nonzero probability, so the lattice
total never underflows for realistic word lengths (a zero-total word is
skipped defensively).

Determinism: seed selection and all reported ranks tie-break on
(freq DESC, piece ASC); the EM expected-count sums are floating-point
shuffle sums whose addition order Spark does not fix, so induced probs
are reproducible only to ~1e-12 — the induction queries register
ROWS-ONLY (stable row counts) with a pure-Python third implementation
pinned in pytest, the same contract as the Lloyd-refined SemDeDup form.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_PIECE = 4  # longest piece the lattice considers
TOP_MULTI = 150  # multi-char seed pieces kept (plus every single char)
EM_ITERS = 2


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): whitespace tokens of the corpus, counted. One scan,
    one hash shuffle; empty fragments drop."""
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def seed_piece_freqs(wc: DataFrame, max_piece: int = MAX_PIECE) -> DataFrame:
    """(piece, freq): every substring of length 1..max_piece of every
    word, occurrence-counted weighted by word count — the standard
    unigram seed statistic. The enumeration is a JVM-side HOF (no
    Python in the hot path); the shuffle carries (piece, partial sum)."""
    pieces = F.expr(
        f"""flatten(transform(sequence(1, char_length(word)), i ->
              filter(transform(sequence(1, {max_piece}), l ->
                       CASE WHEN i + l - 1 <= char_length(word)
                            THEN substring(word, i, l) END),
                     x -> x IS NOT NULL)))"""
    )
    return (
        wc.select(F.explode(pieces).alias("piece"), "cnt")
        .groupBy("piece")
        .agg(F.sum("cnt").cast("bigint").alias("freq"))
    )


def seed_vocab(wc: DataFrame, max_piece: int = MAX_PIECE, top_multi: int = TOP_MULTI):
    """The seed piece table as a driver-side model artifact:
    every single character (the segmentation floor — any corpus word
    stays segmentable) plus the top ``top_multi`` multi-char pieces by
    (freq DESC, piece ASC). Returns {piece: prob} normalized over the
    selection. The two collects are model-sized (|chars| + top_multi)."""
    freqs = seed_piece_freqs(wc, max_piece).localCheckpoint(eager=False)
    chars = freqs.filter(F.char_length("piece") == 1).collect()
    multi = (
        freqs.filter(F.char_length("piece") >= 2)
        .orderBy(F.desc("freq"), F.asc("piece"))
        .limit(top_multi)
        .collect()
    )
    raw = {r["piece"]: r["freq"] for r in chars}
    raw.update({r["piece"]: r["freq"] for r in multi})
    total = float(sum(raw.values()))
    if total == 0:
        return {}
    return {p: f / total for p, f in sorted(raw.items())}


def _expected_counts_batch(words, cnts, probs: dict, max_piece: int):
    """Forward-backward expected piece counts for one batch of words,
    pre-aggregated into one dict — pure python/float64 DP, short words."""
    out: dict[str, float] = {}
    for word, cnt in zip(words, cnts):
        n = len(word)
        # forward
        a = [0.0] * (n + 1)
        a[0] = 1.0
        for i in range(1, n + 1):
            s = 0.0
            for j in range(max(0, i - max_piece), i):
                p = probs.get(word[j:i])
                if p:
                    s += a[j] * p
            a[i] = s
        if a[n] == 0.0:
            continue  # unsegmentable (defensive; single chars seed the floor)
        # backward
        b = [0.0] * (n + 1)
        b[n] = 1.0
        for i in range(n - 1, -1, -1):
            s = 0.0
            for j in range(i + 1, min(n, i + max_piece) + 1):
                p = probs.get(word[i:j])
                if p:
                    s += p * b[j]
            b[i] = s
        z = a[n]
        for i in range(n):
            for j in range(i + 1, min(n, i + max_piece) + 1):
                piece = word[i:j]
                p = probs.get(piece)
                if p:
                    gamma = a[i] * p * b[j] / z
                    if gamma:
                        out[piece] = out.get(piece, 0.0) + gamma * cnt
    return out


def em_reestimate(
    wc: DataFrame, probs: dict, max_piece: int = MAX_PIECE
) -> DataFrame:
    """One E-step over the distributed word-count frame: per-batch
    pre-aggregated expected counts, (piece, exp_cnt) rows — at most
    |vocab| rows per Arrow batch reach the M-step shuffle."""
    import pandas as pd

    def estep(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            agg = _expected_counts_batch(
                pdf["word"].tolist(), pdf["cnt"].tolist(), probs, max_piece
            )
            if agg:
                yield pd.DataFrame(
                    {"piece": list(agg.keys()), "exp_cnt": list(agg.values())}
                )

    return (
        wc.mapInPandas(estep, "piece string, exp_cnt double")
        .groupBy("piece")
        .agg(F.sum("exp_cnt").alias("exp_cnt"))
    )


def learn_unigram_lm(
    docs: DataFrame,
    *,
    iters: int = EM_ITERS,
    max_piece: int = MAX_PIECE,
    top_multi: int = TOP_MULTI,
    text_col: str = "text",
) -> dict:
    """Full induction: seed -> ``iters`` EM rounds over the FIXED vocab
    (no pruning — the fixed-size configuration keeps the round count the
    only hyperparameter). Returns {piece: prob}. Per round, one
    vocabulary-sized collect (the model artifact for the next closure)."""
    wc = word_counts(docs, text_col).localCheckpoint(eager=False)
    probs = seed_vocab(wc, max_piece, top_multi)
    for _ in range(iters):
        if not probs:
            break
        rows = em_reestimate(wc, probs, max_piece).collect()  # model-sized
        counts = {r["piece"]: r["exp_cnt"] for r in rows}
        total = float(sum(counts.values()))
        if total == 0:
            break
        # pieces the E-step never used keep probability 0 mass but stay in
        # the vocab (fixed-vocab EM); normalize over observed mass
        probs = {p: counts.get(p, 0.0) / total for p in probs}
    return probs


def viterbi_token_counts(
    wc: DataFrame, probs: dict, max_piece: int = MAX_PIECE
) -> DataFrame:
    """(word, n_tokens): Viterbi segmentation of each distinct word under
    the final model — best path by probability, ties toward the LONGER
    piece ending at each position (fewer, larger tokens — the
    SentencePiece behavior). Unsegmentable/zero-prob words fall back to
    n_tokens = char count (the char-level floor)."""
    import pandas as pd

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            words = pdf["word"].tolist()
            toks = []
            for word in words:
                n = len(word)
                best = [(-1.0, 0)] * (n + 1)  # (prob, tokens-so-far)
                best[0] = (1.0, 0)
                for i in range(1, n + 1):
                    bp, bt = -1.0, 0
                    # longer pieces first so equal-probability paths
                    # resolve toward the longer final piece
                    for j in range(max(0, i - max_piece), i):
                        p = probs.get(word[j:i])
                        if p and best[j][0] > 0:
                            cand = best[j][0] * p
                            if cand > bp:
                                bp, bt = cand, best[j][1] + 1
                    best[i] = (bp, bt)
                toks.append(best[n][1] if best[n][0] > 0 else n)
            yield pd.DataFrame({"word": words, "n_tokens": toks})

    return wc.select("word").mapInPandas(seg, "word string, n_tokens int")
