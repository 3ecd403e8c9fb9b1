"""Pin the exact-substring dedup operators against a pure-Python truth.

The truth is computed with EXACT token-tuple comparison (no hashing, no
SQL): a gram position is duplicated iff its 8-token window occurs
verbatim in another document (substring search over token tuples — the
check a suffix array would answer), spans are maximal runs of duplicated
positions chained in plain Python, and removal counts come from a literal
set-union of covered token indices. Any md5-collision, chaining, or
interval-union bug in the Spark operators diverges from this truth.
"""

from __future__ import annotations

import itertools
from collections import defaultdict

import pytest

from mapreducefw_spark.operators.exact_substring import (
    GRAM_LEN,
    exact_substring_removal_stats,
    exact_substring_spans,
)

DOCS = [
    # (doc_id, text) — engineered cases:
    # 0/1 share an 10-token run (one maximal span, 3 dup positions each)
    (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa unique0 tail0"),
    (1, "head1 alpha beta gamma delta epsilon zeta eta theta iota kappa tail1"),
    # 2 is an exact duplicate of 3 (whole doc one span, kept_frac 0)
    (2, "one two three four five six seven eight nine ten"),
    (3, "one two three four five six seven eight nine ten"),
    # 4 shares two DISJOINT 8-token runs with 5 -> two maximal spans,
    # separated by a >= GRAM_LEN gap so their token intervals don't merge
    (
        4,
        "r1a r1b r1c r1d r1e r1f r1g r1h m4a m4b m4c m4d m4e m4f m4g m4h m4i "
        "r2a r2b r2c r2d r2e r2f r2g r2h",
    ),
    (
        5,
        "r1a r1b r1c r1d r1e r1f r1g r1h x5a x5b x5c x5d x5e x5f x5g x5h x5i "
        "r2a r2b r2c r2d r2e r2f r2g r2h",
    ),
    # 6: shares with 7 two OVERLAPPING-in-coverage runs (dup positions
    # with a gap of 2 < GRAM_LEN): chaining must still merge coverage
    (6, "p a b c d e f g h i q r s t u v w x y z"),
    (7, "a b c d e f g h zz c d e f g h i qq"),
    # 8: shorter than one gram; 9: NULL text; 10: repeated WITHIN itself
    # only (within-doc repeats are NOT cross-doc duplicated)
    (8, "too short to gram"),
    (9, None),
    (10, "w1 w2 w3 w4 w5 w6 w7 w8 w1 w2 w3 w4 w5 w6 w7 w8"),
]


def _truth(docs=DOCS, gram_len=GRAM_LEN):
    toks = {d: t.split(" ") for d, t in docs if t is not None}
    grams: dict[int, list[tuple[str, ...]]] = {
        d: [tuple(w[i : i + gram_len]) for i in range(len(w) - gram_len + 1)]
        for d, w in toks.items()
    }
    where: dict[tuple[str, ...], set[int]] = defaultdict(set)
    for d, gs in grams.items():
        for g in gs:
            where[g].add(d)
    dup_pos = {  # 1-based positions whose gram occurs in ANOTHER doc
        d: [i + 1 for i, g in enumerate(gs) if len(where[g]) > 1]
        for d, gs in grams.items()
    }
    spans = []
    removed: dict[int, int] = {}
    for d, ps in dup_pos.items():
        covered: set[int] = set()
        run: list[int] = []
        for p in ps:
            covered.update(range(p, p + gram_len))
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                if run:
                    spans.append((d, run[0], run[-1] + gram_len - 1, len(run)))
                run = [p]
        if run:
            spans.append((d, run[0], run[-1] + gram_len - 1, len(run)))
        removed[d] = len(covered)
    stats = [
        (d, len(w), len(dup_pos.get(d, [])), removed.get(d, 0))
        for d, w in toks.items()
    ]
    return sorted(spans), sorted(stats)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(d, t) for d, t in DOCS], "doc_id bigint, text string"
    )


def test_spans_match_pure_python_truth(spark, docs_df):
    truth_spans, _ = _truth()
    got = sorted(
        (r.doc, r.span_start, r.span_end, r.n_grams)
        for r in exact_substring_spans(docs_df).collect()
    )
    assert got == truth_spans
    # structural sanity the truth construction itself promises
    assert any(d == 2 for d, *_ in got) and any(d == 3 for d, *_ in got)
    assert len([s for s in got if s[0] == 4]) == 2  # two disjoint spans
    assert not any(d == 10 for d, *_ in got)  # within-doc only: not flagged


def test_removal_matches_pure_python_truth(spark, docs_df):
    _, truth_stats = _truth()
    rows = exact_substring_removal_stats(docs_df).collect()
    got = sorted((r.doc, r.n_tokens, r.n_dup_positions, r.n_removed_tokens) for r in rows)
    assert got == truth_stats
    by_doc = {r.doc: r for r in rows}
    assert by_doc[2].kept_frac == 0.0 and by_doc[3].kept_frac == 0.0
    assert by_doc[8].n_removed_tokens == 0 and by_doc[8].kept_frac == 1.0
    # doc 6/7's overlapping runs: union, not sum — removal never exceeds
    # the doc and the overlapping windows are counted once
    assert by_doc[6].n_removed_tokens <= by_doc[6].n_tokens
    assert 9 not in by_doc  # NULL text dropped


# --- the paper's production knob: min_match_len=50 (arXiv:2107.06499) ---
# deterministic 50-token-scale corpus: docs 0/1 share a 60-token run
# (doc 0 tokens 11..70, doc 1 tokens 1..60), docs 2/3 share EXACTLY a
# 50-token run (one gram position each), doc 4 shares a 49-token run with
# doc 0 (below the knob -> must NOT be flagged), doc 5 is all-unique.
_RUN60 = [f"s{i}" for i in range(60)]
_RUN49 = _RUN60[:49]
DOCS50 = [
    (0, " ".join([f"h0x{i}" for i in range(10)] + _RUN60 + ["t0a", "t0b"])),
    (1, " ".join(_RUN60 + [f"t1x{i}" for i in range(8)])),
    (2, " ".join([f"u{i}" for i in range(50)] + ["c2tail"])),
    (3, " ".join(["c3head"] + [f"u{i}" for i in range(50)])),
    (4, " ".join(_RUN49 + [f"q4x{i}" for i in range(12)])),
    (5, " ".join([f"solo{i}" for i in range(70)])),
]


@pytest.fixture(scope="module")
def docs50_df(spark):
    return spark.createDataFrame(DOCS50, "doc_id bigint, text string")


def test_spans_min_match_len_50_matches_truth(spark, docs50_df):
    truth_spans, _ = _truth(DOCS50, gram_len=50)
    got = sorted(
        (r.doc, r.span_start, r.span_end, r.n_grams)
        for r in exact_substring_spans(docs50_df, min_match_len=50).collect()
    )
    assert got == truth_spans
    by_doc = {d: (s, e) for d, s, e, _ in got}
    # the 60-token shared run: doc 0 span [11, 70], doc 1 span [1, 60]
    assert by_doc[0] == (11, 70) and by_doc[1] == (1, 60)
    # the exactly-50-token run is one gram position on each side
    assert (2, 1, 50, 1) in got and (3, 2, 51, 1) in got
    # the 49-token run sits BELOW the knob: docs 4 and 5 unflagged
    assert 4 not in by_doc and 5 not in by_doc


def test_removal_min_match_len_50_matches_truth(spark, docs50_df):
    _, truth_stats = _truth(DOCS50, gram_len=50)
    rows = exact_substring_removal_stats(docs50_df, min_match_len=50).collect()
    got = sorted(
        (r.doc, r.n_tokens, r.n_dup_positions, r.n_removed_tokens) for r in rows
    )
    assert got == truth_stats
    by_doc = {r.doc: r for r in rows}
    assert by_doc[0].n_removed_tokens == 60 and by_doc[1].n_removed_tokens == 60
    assert by_doc[4].n_removed_tokens == 0 and by_doc[4].kept_frac == 1.0


def test_same_corpus_both_gram_lengths_nest(spark, docs50_df):
    """Monotonicity across the knob on ONE corpus: every span found at
    min_match_len=50 is contained in a span found at 8 (a 50-token
    verbatim run certainly contains duplicated 8-grams), and removal
    at 50 never exceeds removal at 8."""
    s50 = exact_substring_spans(docs50_df, min_match_len=50).collect()
    s8 = {
        d: [(r.span_start, r.span_end) for r in rows]
        for d, rows in itertools.groupby(
            sorted(
                exact_substring_spans(docs50_df, min_match_len=8).collect(),
                key=lambda r: (r.doc, r.span_start),
            ),
            key=lambda r: r.doc,
        )
    }
    for r in s50:
        assert any(
            a <= r.span_start and r.span_end <= b for a, b in s8.get(r.doc, [])
        ), (r.doc, r.span_start, r.span_end, s8.get(r.doc))
    rem = {
        L: {
            r.doc: r.n_removed_tokens
            for r in exact_substring_removal_stats(
                docs50_df, min_match_len=L
            ).collect()
        }
        for L in (8, 50)
    }
    assert all(rem[50][d] <= rem[8][d] for d in rem[50])


def test_min_match_len_validation(spark, docs50_df):
    with pytest.raises(ValueError, match="min_match_len"):
        exact_substring_spans(docs50_df, min_match_len=1)
    with pytest.raises(ValueError, match="min_match_len"):
        exact_substring_removal_stats(docs50_df, min_match_len=0)
