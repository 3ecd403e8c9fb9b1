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


def _ref_wordpiece(word_counts: dict[str, int], n_merges: int):
    """Reference WordPiece: same loop as _ref_bpe but the winner maximizes
    count(ab) / (count(a) * count(b)) (Schuster & Nakajima 2012), ties
    lexicographic. Returns (left, right, pair_count, score)."""
    vocab = {tuple(list(w) + ["</w>"]): n for w, n in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs, syms_c = Counter(), Counter()
        for syms, n in vocab.items():
            for s in syms:
                syms_c[s] += n
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        # float(a) * float(b), NOT the exact integer product: the engine
        # computes double(c) / (double(a) * double(b)), so the reference
        # mirrors that two-rounding recipe bit-for-bit — the exact-int
        # product can differ by 1 ulp past 2^53 and flip an argmax tie
        # (ADVICE r11)
        scored = {
            p: c / (float(syms_c[p[0]]) * float(syms_c[p[1]]))
            for p, c in pairs.items()
        }
        best = min(scored.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), score = best
        merges.append((l, r, pairs[(l, r)], round(score, 9)))
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


def test_wordpiece_merges_match_reference(spark):
    """The likelihood score must actually change the learned sequence vs
    raw-count BPE on a corpus built for it: 'zq' is rare (pair_count 2)
    but its symbols appear nowhere else, so score(z,q) = 2/(2*2) = 0.5
    dominates every high-count-symbol pair — WordPiece must pick it
    first, while BPE picks the most frequent pair."""
    texts = [
        "low low low low low",
        "lower lower newest newest newest",
        "zq zq",
    ]
    wc = Counter(w for t in texts for w in t.split(" "))
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = bpe.learn_wordpiece_merges(docs, 6).collect()
    got = [
        (r.left, r.right, r.pair_count, r.score)
        for r in sorted(rows, key=lambda r: r.rank)
    ]
    ref = _ref_wordpiece(wc, 6)
    assert [(l, r, c) for l, r, c, _ in got] == [(l, r, c) for l, r, c, _ in ref]
    for (_, _, _, gs), (_, _, _, rs) in zip(got, ref):
        assert abs(gs - rs) <= 1e-9
    # the discriminating case: WordPiece's first merge differs from BPE's
    bpe_first = _ref_bpe(wc, 1)[0][:2]
    assert got[0][:2] != bpe_first
    assert got[0][:2] in {("z", "q"), ("q", "</w>"), ("zq", "</w>")}


def test_wordpiece_fertility_on_fixture(spark):
    """End-to-end fertility arithmetic under the learned WordPiece model on
    the sf0.001 fixture: exact integer recompute from the merge rules via
    the reference encoder."""
    import duckdb

    rows = duckdb.sql(
        "SELECT source, text FROM '/root/testdata/sf0.001/documents.parquet' "
        "WHERE text IS NOT NULL"
    ).fetchall()
    docs_real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    learned = [
        (r.left, r.right)
        for r in sorted(
            bpe.learn_wordpiece_merges(docs_real, 10).collect(), key=lambda r: r.rank
        )
    ]
    agg = {}
    for src, text in rows:
        for w in text.split(" "):
            if w == "":
                continue
            n_words, toks = agg.get(src, (0, 0))
            agg[src] = (n_words + 1, toks + len(_ref_encode(w, learned)))
    got = {
        r.source: (r.n_words, r.wp_tokens)
        for r in bpe.bpe_fertility_by_source(docs_real, learned)
        .withColumnRenamed("bpe_tokens", "wp_tokens")
        .collect()
    }
    assert got == agg
