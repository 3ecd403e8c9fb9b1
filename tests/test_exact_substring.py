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


def _truth():
    toks = {d: t.split(" ") for d, t in DOCS if t is not None}
    grams: dict[int, list[tuple[str, ...]]] = {
        d: [tuple(w[i : i + GRAM_LEN]) for i in range(len(w) - GRAM_LEN + 1)]
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
            covered.update(range(p, p + GRAM_LEN))
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                if run:
                    spans.append((d, run[0], run[-1] + GRAM_LEN - 1, len(run)))
                run = [p]
        if run:
            spans.append((d, run[0], run[-1] + GRAM_LEN - 1, len(run)))
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
