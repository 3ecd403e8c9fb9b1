"""BPE merge learning (operators/bpe.py) vs a pure-Python reference
implementation of Sennrich et al.'s algorithm — exact merge-sequence
equality, including tie-breaks and overlap handling."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from mapreducefw_spark.operators import bpe


def _ref_bpe(word_counts: dict[str, int], n_merges: int):
    """Reference: word-freq BPE with (count desc, pair lexicographic) order
    and left-to-right greedy merge application."""
    vocab = {tuple(list(w) + ["</w>"]): n for w, n in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        merges.append((l, r, cnt))
        new_vocab = {}
        for syms, n in vocab.items():
            out, carry = [], None
            for s in syms:
                if carry == l and s == r:
                    out.append(l + r)
                    carry = None
                else:
                    if carry is not None:
                        out.append(carry)
                    carry = s
            if carry is not None:
                out.append(carry)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def _spark_merges(spark, texts, n_merges):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    rows = bpe.learn_bpe_merges(docs, n_merges).collect()
    return [(r.left, r.right, r.pair_count) for r in sorted(rows, key=lambda r: r.rank)]


def test_bpe_merges_match_reference(spark):
    texts = [
        "low low low low low",
        "lower lower newest newest newest",
        "newest newest newest widest widest",
    ]
    wc = Counter(w for t in texts for w in t.split(" "))
    assert _spark_merges(spark, texts, 8) == _ref_bpe(wc, 8)


def test_bpe_overlap_and_ties(spark):
    """'aaaa' under a+a merges greedily left-to-right -> aa,aa (not aa,a,a
    interleavings); tie frequencies resolve lexicographically."""
    texts = ["aaaa aaaa", "bc bc"]
    wc = Counter(w for t in texts for w in t.split(" "))
    got = _spark_merges(spark, texts, 4)
    assert got == _ref_bpe(wc, 4)
    # first merge must be the lexicographically-first among max-count pairs
    ref_first = _ref_bpe(wc, 1)[0]
    assert got[0] == ref_first


def _ref_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference encode: each rule one greedy left-to-right pass, in rank
    order — identical to training application."""
    syms = list(word) + ["</w>"]
    for l, r in merges:
        out, carry = [], None
        for s in syms:
            if carry == l and s == r:
                out.append(l + r)
                carry = None
            else:
                if carry is not None:
                    out.append(carry)
                carry = s
        if carry is not None:
            out.append(carry)
        syms = out
    return syms


def test_bpe_encode_matches_reference(spark):
    """bpe_encode_words == per-word pure-Python encode under the SAME
    learned merges, including words unseen at training time (new text in
    the encode set) and overlap/tie cases."""
    train = [
        "low low low low low",
        "lower lower newest newest newest",
        "newest newest newest widest widest",
    ]
    wc = Counter(w for t in train for w in t.split(" "))
    merges = [(l, r) for l, r, _ in _ref_bpe(wc, 8)]
    docs = spark.createDataFrame(
        [(0, "low lowest newest unseen aaaa")], "doc_id long, text string"
    )
    got = {
        r.w: r.n_syms
        for r in bpe.bpe_encode_words(docs, merges).collect()
    }
    expect = {
        w: len(_ref_encode(w, merges))
        for w in "low lowest newest unseen aaaa".split()
    }
    assert got == expect


def test_bpe_fertility_report(spark):
    """End-to-end fertility arithmetic: tokens_per_word = sum(count *
    symbols) / sum(count) per source, against a hand-computed value."""
    texts = [
        (0, "ab ab", "s1"),
        (1, "ab cd", "s2"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string, source string")
    # one merge: (a, b) -> 'ab', so 'ab' = ['ab', '</w>'] (2 syms),
    # 'cd' = ['c', 'd', '</w>'] (3 syms)
    rep = {
        r.source: (r.n_words, r.bpe_tokens, r.tokens_per_word)
        for r in bpe.bpe_fertility_by_source(docs, [("a", "b")]).collect()
    }
    assert rep == {"s1": (2, 4, 2.0), "s2": (2, 5, 2.5)}
