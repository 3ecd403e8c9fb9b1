"""Semantic pins for the round-7 batch (pipeline16) beyond the oracle
diffs: hand-computable fixtures where the expected output is derived
independently of either engine.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mapreducefw_spark.queries import QUERIES, load_all

load_all()


@pytest.fixture()
def docs_dir(spark, tmp_path):
    """Writer for hand-built documents tables."""

    def write(rows):
        d = tmp_path / "docs"
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
        return str(d)

    return write


def test_bitmap_exact_distinct_across_bucket_boundaries(spark, tmp_path):
    """User ids spanning many 32k bitmap buckets (1..~100k) must count
    exactly — the multi-bucket merge is the part a single-bucket fixture
    never exercises. Expected value derived from the generating set, not
    from COUNT(DISTINCT)."""
    ids = list(range(1, 100_000, 997))  # 101 ids across 4 buckets
    rows = [(i, None, uid, "click" if uid % 2 else "view", None, None) for i, uid in enumerate(ids)]
    rows += [(10_000 + i, None, uid, "click" if uid % 2 else "view", None, None) for i, uid in enumerate(ids)]  # dups
    rows.append((99_999, None, None, "click", None, None))  # NULL user
    d = tmp_path / "ev"
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    out = {r.event_type: (r.n_users, r.n_events) for r in QUERIES["bitmap_exact_distinct"](spark, str(d)).collect()}
    n_click = sum(1 for u in ids if u % 2)
    n_view = len(ids) - n_click
    assert out["click"] == (n_click, 2 * n_click + 1)
    assert out["view"] == (n_view, 2 * n_view)


def test_nucleus_selects_smallest_prefix_reaching_p(spark, docs_dir):
    """Shares 0.5/0.3/0.15/0.05 at p=0.8: A enters (prev cum 0), B enters
    (prev cum 0.5 < 0.8), C does NOT (prev cum 0.8), D does not."""
    rows = []
    i = 0
    for src, n in (("A", 50), ("B", 30), ("C", 15), ("D", 5)):
        for _ in range(n):
            rows.append((i, "w", "en", src, 1))
            i += 1
    out = QUERIES["nucleus_topp_sources"](spark, docs_dir(rows)).collect()
    sel = {r.source: r.selected for r in out}
    assert sel == {"A": 1, "B": 1, "C": 0, "D": 0}
    cums = {r.source: r.cum_share for r in out}
    assert cums["B"] == pytest.approx(0.8) and cums["D"] == pytest.approx(1.0)


def test_zipf_alpha_exact_power_law(spark, docs_dir):
    """Token counts 720/r for r=1..6 form an exact ln-ln line of slope -1,
    so the fitted alpha must be 1.0 to 6dp regardless of engine."""
    text = " ".join(
        " ".join(f"tok{r}" for _ in range(720 // r)) for r in range(1, 7)
    )
    out = QUERIES["zipf_alpha_by_source"](spark, docs_dir([(0, text, "en", "s", len(text))])).collect()
    assert len(out) == 1 and out[0].n_pts == 6
    assert out[0].zipf_alpha == pytest.approx(1.0, abs=1e-6)


def test_inverted_index_postings_layout(spark, docs_dir):
    """Exact postings for a two-doc corpus: 1-based positions, zero-padded
    doc keys, space-joined doc entries."""
    out = {
        r.tok: r
        for r in QUERIES["inverted_index_postings"](
            spark, docs_dir([(1, "a b a", "en", "s", 5), (12, "b a", "en", "s", 3)])
        ).collect()
    }
    assert out["a"].n_docs == 2 and out["a"].n_occurrences == 3
    assert out["a"].postings == "000001:1,3 000012:2"
    assert out["b"].postings == "000001:2 000012:1"


def test_event_pair_pmi_hand_value(spark, tmp_path):
    """3 users: u1 {view, click}, u2 {view}, u3 {view, click} ->
    PMI(click,view) = ln((2*3)/(2*3)) = 0 exactly."""
    rows = [
        (1, None, 1, "view", None, None),
        (2, None, 1, "click", None, None),
        (3, None, 2, "view", None, None),
        (4, None, 3, "view", None, None),
        (5, None, 3, "click", None, None),
        (6, None, 3, "click", None, None),  # dup presence collapses
    ]
    d = tmp_path / "ev"
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    out = QUERIES["event_pair_pmi"](spark, str(d)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.type_a, r.type_b, r.n_both) == ("click", "view", 2)
    assert r.pmi == pytest.approx(0.0, abs=1e-9)


def test_gopher_rules_each_gate(spark, docs_dir):
    """One doc passing all four rules; one failing each single rule; the
    empty/NULL docs fail with NULL ratios (not crash)."""
    good = "the quick brown fox jumps over a lazy dog and then runs far away to find more of the tasty food in town"  # 22 words, stopwords, alpha
    short = "the a of to and in words"  # 7 words < 20
    numeric = " ".join(["123"] * 18 + ["the", "a", "of", "to"])  # frac_alpha 4/22 < 0.8
    no_stop = " ".join(f"word{i}" for i in range(25))  # 0 stopwords
    rows = [
        (0, good, "en", "s", len(good)),
        (1, short, "en", "s", len(short)),
        (2, numeric, "en", "s", len(numeric)),
        (3, no_stop, "en", "s", len(no_stop)),
        (4, None, "en", "s", 0),
        (5, "", "en", "s", 0),
    ]
    out = {r.doc_id: r for r in QUERIES["gopher_quality_rules"](spark, docs_dir(rows)).collect()}
    assert out[0].passes == 1
    assert [out[i].passes for i in (1, 2, 3, 4, 5)] == [0, 0, 0, 0, 0]
    assert out[4].mean_word_len is None and out[5].n_words == 0
    assert out[2].frac_alpha == pytest.approx(4 / 22)


def test_union_by_name_null_fills(spark, tmp_path):
    """Even keys carry NULL o_orderpriority, odd keys NULL o_orderstatus —
    by NAME, independent of projection order."""
    rows = [(k, 1, "O", 10.0 * k, None, "1-URGENT") for k in range(1, 7)]
    d = tmp_path / "ord"
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "orders.parquet"))
    out = QUERIES["union_by_name_evolution"](spark, str(d)).collect()
    assert len(out) == 6
    for r in out:
        if r.o_orderkey % 2 == 0:
            assert r.o_orderstatus == "O" and r.o_orderpriority is None
        else:
            assert r.o_orderstatus is None and r.o_orderpriority == "1-URGENT"
        assert r.o_totalprice == pytest.approx(10.0 * r.o_orderkey)
