"""Pins for the round-12 privacy tier (pipeline42).

The DuckDB oracles prove cross-engine agreement; these pins prove the
MECHANISMS are right, independently of either engine:

- a pure-Python third implementation replays both releases from the
  parquet (hashlib md5 draws + an independently recomputed inverse CDF)
  and the integer columns compare EXACTLY;
- the geometric threshold table is checked against the distribution it
  claims to encode: monotone CDF grid, per-point masses within one
  lattice unit of (1-a)/(1+a) * a^|z|, and the epsilon-DP likelihood
  ratio bound mass(z)/mass(z+1) <= e^eps on the well-resolved range;
- the randomized-response debiased estimator is checked to invert the
  expectation algebraically and to equal the Python replay exactly.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import duckdb
import pytest

from mapreducefw_spark.queries import QUERIES, load_all
from mapreducefw_spark.queries.pipeline42 import (
    ALPHA,
    EPSILON,
    NOISE_CAP,
    RR_D,
    RR_KEEP_T,
    RR_P,
    RR_Q,
    U_BITS,
    _THRESHOLDS,
)

load_all()

SF_DIR = "/root/testdata/sf0.001"


def _u48(salt: str, key: str) -> int:
    return int(hashlib.md5((salt + key).encode()).hexdigest()[:12], 16)


def _noise(u: int) -> int:
    for k, tk in _THRESHOLDS:
        if u < tk:
            return k
    return NOISE_CAP


def test_dp_noisy_counts_matches_pure_python(spark):
    got = {
        r["source"]: (r["noisy_count"], r["epsilon"])
        for r in QUERIES["dp_noisy_counts"](spark, SF_DIR).collect()
    }
    true = dict(
        duckdb.sql(
            f"SELECT source, COUNT(*) FROM '{SF_DIR}/documents.parquet' "
            "WHERE source IS NOT NULL GROUP BY source"
        ).fetchall()
    )
    assert set(got) == set(true)
    for src, c in true.items():
        expected = max(0, c + _noise(_u48("dpgeo:", src)))
        assert got[src] == (expected, EPSILON)


def test_threshold_table_encodes_the_two_sided_geometric():
    ks = [k for k, _ in _THRESHOLDS]
    ts = [t for _, t in _THRESHOLDS]
    assert ks == list(range(-NOISE_CAP, NOISE_CAP))
    assert ts == sorted(ts)  # monotone CDF grid
    assert ts[-1] <= (1 << U_BITS)
    norm = (1.0 - ALPHA) / (1.0 + ALPHA)
    prev = 0
    for k, tk in _THRESHOLDS:
        mass = tk - prev
        prev = tk
        if k == -NOISE_CAP:
            continue  # the clamped tail absorbs everything below
        want = norm * ALPHA ** abs(k) * (1 << U_BITS)
        assert abs(mass - want) <= 1.0 + want * 1e-9  # one lattice unit


def test_threshold_masses_satisfy_the_dp_likelihood_bound():
    """Adjacent-count indistinguishability: shifting a count by 1 shifts
    the noise needed by 1, so eps-DP for counting == mass(z)/mass(z+1)
    within e^+-eps. Checked where the lattice resolves the mass (the
    sub-resolution tails are clamped and carry ~1e-14 probability)."""
    masses = {}
    prev = 0
    for k, tk in _THRESHOLDS:
        masses[k] = tk - prev
        prev = tk
    bound = math.exp(EPSILON) * (1 + 1e-6)
    for k in range(-15, 14):
        a, b = masses[k], masses[k + 1]
        assert a > 0 and b > 0
        ratio = a / b
        assert ratio <= bound and 1.0 / ratio <= bound * (1 + 1e-3)


def test_noise_is_integrable_and_centered():
    # expected noise on the lattice is ~0 (symmetric distribution)
    prev = 0
    mean = 0.0
    for k, tk in _THRESHOLDS:
        mean += k * (tk - prev)
        prev = tk
    mean += NOISE_CAP * ((1 << U_BITS) - prev)
    assert abs(mean / (1 << U_BITS)) < 1e-9


def test_randomized_response_matches_pure_python(spark):
    got = {
        r["source"]: r
        for r in QUERIES["randomized_response_estimate"](spark, SF_DIR).collect()
    }
    rows = duckdb.sql(
        f"SELECT source, doc_id, lang FROM '{SF_DIR}/documents.parquet' "
        "WHERE source IS NOT NULL AND doc_id IS NOT NULL AND lang IS NOT NULL"
    ).fetchall()
    n = defaultdict(int)
    yes = defaultdict(int)
    for src, did, lang in rows:
        truth = 1 if lang == "en" else 0
        keep = _u48("rrflip:", str(did)) < RR_KEEP_T
        n[src] += 1
        yes[src] += truth if keep else 1 - truth
    assert set(got) == set(n)
    for src in n:
        r = got[src]
        assert (r["n"], r["observed_yes"]) == (n[src], yes[src])
        assert r["debiased_yes"] == (float(yes[src]) - n[src] * RR_Q) / RR_D


def test_rr_debias_inverts_the_expectation():
    # E[observed] = n * (p*f + (1-p)*(1-f)); plugging it into the
    # estimator must return n*f for any truth count
    for n, f_cnt in [(100, 30), (7, 0), (7, 7), (1, 1)]:
        e_obs = f_cnt * RR_P + (n - f_cnt) * (1.0 - RR_P)
        est = (e_obs - n * RR_Q) / RR_D
        assert est == pytest.approx(f_cnt, abs=1e-9)


def test_rr_keep_probability_matches_epsilon():
    assert RR_KEEP_T / (1 << U_BITS) == pytest.approx(RR_P, abs=2 ** -U_BITS)
    assert RR_P / (1.0 - RR_P) == pytest.approx(math.exp(EPSILON), rel=1e-12)
