"""Pins for the round-11 hybrid-retrieval tier (pipeline35).

The MMR kernel is the one piece whose greedy loop lives in Python
(applyInPandas), so it gets a third implementation: a pure-Python
reference written directly from the Carbonell & Goldstein definition
(argmax of lambda*rel - (1-lambda)*max-sim-to-selected, ROUND(7), id
tiebreak, missing vectors orthogonal to everything). The Spark kernel
must reproduce it exactly — including the case the r11 self-review
caught before the driver did: a selected item WITHOUT an embedding
contributes sim 0 to the diversity max, and that 0 must beat an
all-negative present-pair max.

RRF fusion is plain DataFrame algebra; its pin here is the score
identity (1/(60+lex) + 1/(60+dense), absent side 0) recomputed in
Python from the two rank lists at sf0.001.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mapreducefw_spark.queries.pipeline35 import (
    MMR_K,
    MMR_LAMBDA,
    MMR_ONE_MINUS_LAMBDA,
    RRF_K,
    _mmr_kernel_frame,
    rrf_hybrid_retrieval,
)

SF_DIR = "/root/testdata/sf0.001"


def _py_round7(x: float) -> float:
    # numpy-style scaled rounding is what the kernel uses; at 7 decimals
    # the MMR score sits ON the grid (exact 7-decimal value), so every
    # rounding mode agrees — plain round() is a fair reference here.
    return round(x, 7)


def _py_mmr(cands: list[tuple[int, float, list[float] | None]], k: int):
    """Reference MMR: cands = [(id, rel, vec-or-None)]; returns
    [(step, id, rel, div, score)]."""

    def sim(a, b):
        va, vb = dict_vec[a], dict_vec[b]
        if va is None or vb is None:
            return 0.0
        dot = sum(x * y for x, y in zip(va, vb))
        na = math.sqrt(sum(x * x for x in va))
        nb = math.sqrt(sum(x * x for x in vb))
        return round(dot / (na * nb), 6)

    dict_vec = {c[0]: c[2] for c in cands}
    rels = {c[0]: c[1] for c in cands}
    remaining = sorted(rels)
    selected: list[int] = []
    out = []
    for step in range(1, min(k, len(cands)) + 1):
        best = None
        for i in remaining:
            div = max((sim(i, j) for j in selected), default=0.0)
            score = _py_round7(MMR_LAMBDA * rels[i] - MMR_ONE_MINUS_LAMBDA * div)
            key = (-score, i)
            if best is None or key < best[0]:
                best = (key, i, div, score)
        _, i, div, score = best
        selected.append(i)
        remaining.remove(i)
        out.append((step, i, rels[i], div, score))
    return out


CANDS = [
    # (id, rel ROUND(6)-grid, vec) — vectors chosen so some pairwise
    # cosines are NEGATIVE and one candidate has no vector at all
    (1, 0.95, [1.0, 0.0, 0.0, 0.25]),
    (2, 0.91, [-1.0, 0.125, 0.0, -0.25]),  # ~ -1 cosine to id 1
    (3, 0.90, None),  # no embedding: orthogonal to everything
    (4, 0.89, [0.0, 1.0, 0.0, 0.0]),
    (5, 0.40, [1.0, 0.0625, 0.0, 0.25]),  # near-dup of id 1
    (6, 0.88, [0.0, -1.0, 0.5, 0.0]),
]


def test_mmr_kernel_matches_pure_python_reference(spark):
    cand = spark.createDataFrame(
        [(i, r, v) for i, r, v in CANDS], "id long, rel double, vec array<double>"
    )
    got = [
        (r.step, r.doc_id, r.relevance, r.diversity, r.mmr_score)
        for r in _mmr_kernel_frame(cand, MMR_K).orderBy("step").collect()
    ]
    want = _py_mmr(CANDS, MMR_K)
    assert [g[:2] for g in got] == [w[:2] for w in want]
    for g, w in zip(got, want):
        assert g[2] == pytest.approx(w[2], abs=1e-12)
        assert g[3] == pytest.approx(w[3], abs=1e-6)  # div: ROUND(6) grids
        assert g[4] == pytest.approx(w[4], abs=5e-7)


def test_mmr_missing_vector_zero_beats_negative_max(spark):
    """The r11 self-review case: after picking id 1, candidate 2's only
    present-pair sim is ~-1; if id 3 (no vector) is selected its
    orthogonal 0 must enter candidate 2's diversity max."""
    cands = [
        (1, 0.95, [1.0, 0.0]),
        (2, 0.50, [-1.0, 0.0]),  # cosine(1,2) = -1
        (3, 0.94, None),
    ]
    cand = spark.createDataFrame(cands, "id long, rel double, vec array<double>")
    rows = {r.step: r for r in _mmr_kernel_frame(cand, 3).collect()}
    # step1 -> id 1 (max rel); step2 -> id 3 (no diversity penalty);
    # step3 -> id 2 with div = max(-1.0 [vs 1], 0.0 [vs 3]) = 0.0
    assert [rows[s].doc_id for s in (1, 2, 3)] == [1, 3, 2]
    assert rows[3].diversity == 0.0
    want = _py_mmr(cands, 3)
    got = [(rows[s].step, rows[s].doc_id, rows[s].diversity) for s in (1, 2, 3)]
    assert got == [(w[0], w[1], w[3]) for w in want]


def test_rrf_score_identity(spark):
    """Every fused row's rrf equals 1/(60+lex_rk) + 1/(60+dense_rk) with
    absent sides contributing 0, recomputed in Python."""
    rows = rrf_hybrid_retrieval(spark, SF_DIR).collect()
    assert rows, "fused list must not be empty at sf0.001"
    for r in rows:
        want = 0.0
        if r.lex_rk is not None:
            want += 1.0 / (RRF_K + r.lex_rk)
        if r.dense_rk is not None:
            want += 1.0 / (RRF_K + r.dense_rk)
        assert r.rrf == pytest.approx(round(want, 9), abs=1e-12)
    # ranks are 1..n in fused order and rrf is non-increasing
    rrfs = [r.rrf for r in rows]
    assert [r.fused_rk for r in rows] == list(range(1, len(rows) + 1))
    assert rrfs == sorted(rrfs, reverse=True)


def test_rag_pipeline_marks_lexical_only_docs(spark):
    """Docs the dense index doesn't hold must ride through fusion with
    has_embedding = false and still be MMR-selectable (orthogonal)."""
    from mapreducefw_spark.queries.pipeline35 import rag_retrieval_pipeline

    rows = rag_retrieval_pipeline(spark, SF_DIR).collect()
    assert 1 <= len(rows) <= MMR_K
    assert {type(r.has_embedding) for r in rows} == {bool}
    # relevance is the max-normalized rrf, so the argmax-rel step-1 pick
    # carries rel exactly 1.0
    assert any(abs(r.relevance - 1.0) < 1e-9 for r in rows)
