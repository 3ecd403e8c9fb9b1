"""Third-implementation pins for the unigram-LM tokenizer family
(operators/unigram.py, pipeline37) — the rows-only contract's binding
correctness evidence.

The reference implementation is INDEPENDENT of the operator's
forward-backward: expected piece counts come from brute-force
enumeration of ALL segmentations of each word (words here are <= 10
chars, so <= 2^9 segmentations), weighted by the product of piece
probabilities. If the distributed E-step's DP is wrong in any way —
lattice bounds, posterior formula, batch pre-aggregation, the M-step
shuffle — the two disagree.
"""

from __future__ import annotations

from collections import Counter
from itertools import product

import pytest
from pyspark.sql import functions as F

from mapreducefw_spark.operators.unigram import (
    MAX_PIECE,
    learn_unigram_lm,
    seed_vocab,
    viterbi_token_counts,
    word_counts,
)

CORPUS = [
    ("the cat sat on the mat", "a"),
    ("the cats sat", "a"),
    ("concat the mat", "b"),
    ("on and on and on", "b"),
    ("catamaran mats", "c"),
]


def _segmentations(word: str, pieces: set[str], max_piece: int):
    """All ways to cut word into vocab pieces (DFS)."""
    if word == "":
        return [[]]
    out = []
    for l in range(1, min(max_piece, len(word)) + 1):
        head = word[:l]
        if head in pieces:
            for rest in _segmentations(word[l:], pieces, max_piece):
                out.append([head] + rest)
    return out


def _ref_expected_counts(wc: dict[str, int], probs: dict[str, float]):
    """Brute-force E-step: posterior-weighted piece counts."""
    exp: dict[str, float] = {}
    for word, cnt in wc.items():
        segs = _segmentations(word, set(probs), MAX_PIECE)
        weights = [
            (seg, __import__("math").prod(probs[p] for p in seg)) for seg in segs
        ]
        z = sum(w for _, w in weights)
        if z == 0:
            continue
        for seg, w in weights:
            for p in seg:
                exp[p] = exp.get(p, 0.0) + (w / z) * cnt
    return exp


def _ref_em(wc: dict[str, int], probs: dict[str, float], iters: int):
    for _ in range(iters):
        exp = _ref_expected_counts(wc, probs)
        total = sum(exp.values())
        probs = {p: exp.get(p, 0.0) / total for p in probs}
    return probs


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "text string, source string")


@pytest.fixture(scope="module")
def ref_wc():
    c = Counter()
    for text, _ in CORPUS:
        for w in text.split(" "):
            if w:
                c[w] += 1
    return dict(c)


def test_word_counts_match(spark, docs, ref_wc):
    got = {r["word"]: r["cnt"] for r in word_counts(docs).collect()}
    assert got == ref_wc


def test_em_probs_match_brute_force(spark, docs, ref_wc):
    """2 EM rounds, distributed forward-backward vs brute-force
    enumeration, probs to 1e-9."""
    seed = seed_vocab(word_counts(docs))
    assert seed and abs(sum(seed.values()) - 1.0) < 1e-9
    got = learn_unigram_lm(docs, iters=2)
    want = _ref_em(ref_wc, dict(seed), 2)
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], abs=1e-9), p
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_viterbi_matches_brute_force_argmax(spark, docs, ref_wc):
    """Viterbi token counts == brute-force argmax token counts wherever
    the argmax is unique (the fixture's probs are generically distinct;
    near-ties are skipped rather than guessed)."""
    import math

    probs = learn_unigram_lm(docs, iters=2)
    toks = {
        r["word"]: r["n_tokens"]
        for r in viterbi_token_counts(word_counts(docs), probs).collect()
    }
    checked = 0
    for word in ref_wc:
        segs = _segmentations(word, set(probs), MAX_PIECE)
        scored = sorted(
            ((math.prod(probs[p] for p in seg), seg) for seg in segs), reverse=True
        )
        if len(scored) > 1 and scored[0][0] - scored[1][0] < 1e-12 * scored[0][0]:
            continue  # ambiguous argmax: tie-break semantics differ by design
        assert toks[word] == len(scored[0][1]), word
        checked += 1
    assert checked >= len(ref_wc) - 2  # the fixture must actually test things


def test_registered_queries_shapes(spark):
    from mapreducefw_spark.queries import QUERIES, load_all

    load_all()
    vocab = QUERIES["unigram_lm_vocab"](spark, "/root/testdata/sf0.001").collect()
    assert len(vocab) == 30
    probs = [r["prob"] for r in vocab]
    assert probs == sorted(probs, reverse=True)
    assert all(0 < p <= 1 for p in probs)
    fert = QUERIES["unigram_fertility_by_source"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(fert) == 20  # one row per source
    for r in fert:
        assert r["tokens_per_word"] >= 1.0
        assert r["chars_per_token"] >= 1.0


def test_empty_corpus_degrades_cleanly(spark):
    empty = spark.createDataFrame([], "text string, source string")
    assert learn_unigram_lm(empty) == {}
    wc = word_counts(empty)
    assert viterbi_token_counts(wc, {}).count() == 0
