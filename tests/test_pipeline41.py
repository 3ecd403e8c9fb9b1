"""Pins for the round-12 post-training preference-data tier (pipeline41).

Beyond the DuckDB oracles (best_of_n / dpo pairs / win matrix), a pure-
Python third implementation recomputes the whole tier from the parquet —
candidate pool, argmax/argmin selection, pairwise orientation — and the
integer columns are compared EXACTLY. ``bradley_terry_ratings`` is the
one operator that cannot be oracle-paired (iterative float fixpoint), so
it is pinned three ways: the Spark result must equal the pure-Python MM
replay on the independently-recomputed win matrix; analytic cases
(symmetric matches -> equal strengths, dominant model -> top rank,
zero-win model -> strength 0); and the MM fixpoint must satisfy the
Bradley-Terry stationarity condition on the fixture matrix.
"""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import pytest

from mapreducefw_spark.queries import QUERIES, load_all
from mapreducefw_spark.queries.pipeline41 import (
    BT_ITERS,
    DPO_MARGIN,
    N_CAND,
    N_MODELS,
    bradley_terry_mm,
)

load_all()

SF_DIR = "/root/testdata/sf0.001"


def _pool():
    """(doc_id, prompt_id, model_id, reward) recomputed in pure Python."""
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' "
        "WHERE doc_id IS NOT NULL AND text IS NOT NULL ORDER BY doc_id"
    ).fetchall()
    out = []
    for did, text in rows:
        n_tok = len([w for w in text.split(" ") if w != ""])
        reward = 3 * n_tok + len(text) % 97
        out.append((did, did // N_CAND, did % N_MODELS, reward, n_tok))
    return out


def _by_prompt(pool):
    g = defaultdict(list)
    for row in pool:
        g[row[1]].append(row)
    return g


def test_best_of_n_matches_pure_python(spark):
    got = {
        r["prompt_id"]: r
        for r in QUERIES["best_of_n_selection"](spark, SF_DIR).collect()
    }
    groups = _by_prompt(_pool())
    assert set(got) == set(groups)
    for pid, cands in groups.items():
        ranked = sorted(cands, key=lambda c: (-c[3], c[0]))
        r = got[pid]
        assert r["chosen_id"] == ranked[0][0]
        assert r["chosen_model"] == ranked[0][2]
        assert r["chosen_reward"] == ranked[0][3]
        assert r["n_candidates"] == len(cands)
        if len(cands) == 1:
            assert r["margin"] is None
        else:
            assert r["margin"] == ranked[0][3] - ranked[1][3]


def test_dpo_pairs_match_pure_python(spark):
    got = {
        r["prompt_id"]: r
        for r in QUERIES["dpo_pair_construction"](spark, SF_DIR).collect()
    }
    expected = {}
    for pid, cands in _by_prompt(_pool()).items():
        best = sorted(cands, key=lambda c: (-c[3], c[0]))[0]
        worst = sorted(cands, key=lambda c: (c[3], -c[0]))[0]
        if best[0] != worst[0] and best[3] - worst[3] >= DPO_MARGIN:
            expected[pid] = (best[0], worst[0], best[3] - worst[3])
    assert set(got) == set(expected)
    for pid, (cid, rid, gap) in expected.items():
        r = got[pid]
        assert (r["chosen_id"], r["rejected_id"], r["reward_gap"]) == (cid, rid, gap)
        assert r["chosen_reward"] - r["rejected_reward"] == gap


def _py_win_matrix():
    """Oriented (model_a < model_b) decisive/tie counts, pure Python."""
    wins = defaultdict(lambda: [0, 0, 0])  # wins_a, wins_b, ties
    for pid, cands in _by_prompt(_pool()).items():
        cands = sorted(cands)
        for i in range(len(cands)):
            for j in range(i + 1, len(cands)):
                a, b = cands[i], cands[j]
                if a[2] == b[2]:
                    continue
                lo, hi = (a, b) if a[2] < b[2] else (b, a)
                key = (lo[2], hi[2])
                if lo[3] > hi[3]:
                    wins[key][0] += 1
                elif hi[3] > lo[3]:
                    wins[key][1] += 1
                else:
                    wins[key][2] += 1
    return dict(wins)


def test_win_matrix_matches_pure_python(spark):
    got = {
        (r["model_a"], r["model_b"]): r
        for r in QUERIES["preference_win_matrix"](spark, SF_DIR).collect()
    }
    expected = _py_win_matrix()
    assert set(got) == set(expected)
    for key, (wa, wb, ties) in expected.items():
        r = got[key]
        assert (r["wins_a"], r["wins_b"], r["ties"]) == (wa, wb, ties)
        assert r["n_comparisons"] == wa + wb + ties
        if wa + wb > 0:
            assert r["win_rate_a"] == wa / (wa + wb)
        else:
            assert r["win_rate_a"] is None


def test_bradley_terry_matches_pure_python_replay(spark):
    got = {
        r["model_id"]: r
        for r in QUERIES["bradley_terry_ratings"](spark, SF_DIR).collect()
    }
    matches = [
        (a, b, w[0], w[1]) for (a, b), w in sorted(_py_win_matrix().items())
    ]
    strengths = bradley_terry_mm(matches)
    assert set(got) == set(strengths)
    games = defaultdict(int)
    wins = defaultdict(int)
    for a, b, wa, wb in matches:
        games[a] += wa + wb
        games[b] += wa + wb
        wins[a] += wa
        wins[b] += wb
    ranked = sorted(strengths, key=lambda m: (-strengths[m], m))
    for i, m in enumerate(ranked):
        r = got[m]
        # same collect -> same python fixpoint: exact equality expected
        assert r["strength"] == strengths[m]
        assert r["bt_rank"] == i + 1
        assert (r["games"], r["wins"]) == (games[m], wins[m])


def test_bradley_terry_symmetric_matches_equal_strengths():
    # a round-robin where every pairing splits 5-5 must be a uniform model
    matches = [(a, b, 5, 5) for a in range(4) for b in range(a + 1, 4)]
    p = bradley_terry_mm(matches)
    for m in range(4):
        assert p[m] == pytest.approx(0.25, rel=1e-9)


def test_bradley_terry_dominant_and_zero_win_models():
    # model 0 beats everyone; model 3 never wins a game
    matches = [(0, 1, 9, 1), (0, 2, 8, 2), (0, 3, 10, 0), (1, 2, 6, 4), (1, 3, 7, 0), (2, 3, 5, 0)]
    p = bradley_terry_mm(matches)
    assert max(p, key=p.get) == 0
    assert p[3] == 0.0  # MLE boundary: zero wins -> zero strength
    assert p[0] > p[1] > p[2] > p[3]
    assert sum(p.values()) == pytest.approx(1.0, rel=1e-12)


def test_bradley_terry_stationarity_on_fixture():
    """At the MM fixpoint, p_i * sum_j n_ij/(p_i+p_j) == W_i for every
    model with nonzero strength (the Bradley-Terry likelihood stationarity
    condition) — convergence, not just iteration-count, on real data."""
    matches = [
        (a, b, w[0], w[1]) for (a, b), w in sorted(_py_win_matrix().items())
    ]
    p = bradley_terry_mm(matches, n_iters=BT_ITERS)
    wins = defaultdict(float)
    denom = defaultdict(float)
    for a, b, wa, wb in matches:
        n_ab = wa + wb
        if n_ab == 0:
            continue
        wins[a] += wa
        wins[b] += wb
        denom[a] += n_ab / (p[a] + p[b])
        denom[b] += n_ab / (p[a] + p[b])
    scale = sum(p[m] * denom[m] for m in p)  # normalization factor
    for m in p:
        if p[m] > 0:
            assert p[m] * denom[m] / scale == pytest.approx(
                wins[m] / sum(wins.values()), rel=1e-6
            )


def test_bradley_terry_empty_and_tie_only_matrices():
    assert bradley_terry_mm([]) == {}
    # ties-only (all decisive counts zero): denominators stay 0 -> all 0.0
    p = bradley_terry_mm([(0, 1, 0, 0)])
    assert p == {0: 0.0, 1: 0.0}


def test_pool_constants_are_consistent():
    # every model must appear in every full pool so the matrix is total
    assert N_CAND % N_MODELS == 0 and math.gcd(N_CAND, N_MODELS) == N_MODELS
