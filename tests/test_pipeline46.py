"""Pins for the round-12 distributed-bootstrap batch (pipeline46).

Beyond the DuckDB oracle, a pure-Python replay (hashlib draws + the same
threshold walk) recomputes every replicate mean and the order-statistic
bounds EXACTLY, and mechanism pins check the weight distribution is
actually Poisson(1) — per-point masses on the 2^-48 lattice, mean 1 —
and that the CI behaves like one: brackets the point estimate on the
fixture, collapses to the sample on a constant column, and covers the
true mean at roughly the nominal rate on synthetic draws.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from mapreducefw_spark.queries import QUERIES, load_all
from mapreducefw_spark.queries.pipeline46 import (
    B_REPLICATES,
    CI_HI_RANK,
    CI_LO_RANK,
    POIS_CAP,
    U_BITS,
    _POIS_T,
)

load_all()

SF_DIR = "/root/testdata/sf0.001"


def _u48(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:12], 16)


def _w(u: int) -> int:
    for w, tw in _POIS_T:
        if u < tw:
            return w
    return POIS_CAP


def _orders():
    return duckdb.sql(
        f"SELECT o_orderkey, o_totalprice FROM '{SF_DIR}/orders.parquet' "
        "WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL"
    ).fetchall()


def test_bootstrap_matches_pure_python(spark):
    from decimal import Decimal

    got = QUERIES["poisson_bootstrap_ci"](spark, SF_DIR).collect()
    assert len(got) == 1
    r = got[0]
    rows = _orders()
    means = []
    for b in range(B_REPLICATES):
        sw, w_tot = Decimal(0), 0
        for ok, price in rows:
            w = _w(_u48(f"boot{b}:{ok}"))
            sw += w * Decimal(str(round(price, 2)))
            w_tot += w
        if w_tot > 0:
            means.append(float(sw) / w_tot)
    means.sort()
    assert r["n_rows"] == len(rows)
    assert r["n_replicates"] == len(means)
    assert r["ci_lo"] == means[CI_LO_RANK - 1]
    assert r["ci_hi"] == means[CI_HI_RANK - 1]
    assert r["ci_lo"] <= r["mean_value"] <= r["ci_hi"]


def test_poisson_thresholds_encode_poisson_one():
    prev = 0
    mean = 0.0
    for w, tw in _POIS_T:
        mass = tw - prev
        want = math.exp(-1.0) / math.factorial(w) * (1 << U_BITS)
        assert abs(mass - want) <= 1.0 + want * 1e-9
        mean += w * mass
        prev = tw
    mean += POIS_CAP * ((1 << U_BITS) - prev)
    # E[W] = 1 up to the clamped ~1e-6-mass tail
    assert mean / (1 << U_BITS) == pytest.approx(1.0, abs=1e-5)
    assert [w for w, _ in _POIS_T] == list(range(POIS_CAP))
    assert [t for _, t in _POIS_T] == sorted(t for _, t in _POIS_T)


def test_bootstrap_ci_coverage_on_synthetic_population():
    """~95% nominal coverage, checked empirically: 40 disjoint synthetic
    'datasets' (deterministic value grids with distinct salts), each
    bootstrapped in pure Python; the true mean must fall inside the CI in
    at least 32 of 40 (binomial p(<32 | p=.95) ~ 1e-4)."""
    covered = 0
    for ds in range(40):
        rows = [(f"{ds}:{i}", 100.0 + ((i * 7919 + ds * 104729) % 1000) / 10.0)
                for i in range(400)]
        true_mean = sum(v for _, v in rows) / len(rows)
        means = []
        for b in range(B_REPLICATES):
            sw = wt = 0.0
            for key, v in rows:
                w = _w(_u48(f"boot{b}:{key}"))
                sw += w * v
                wt += w
            means.append(sw / wt)
        means.sort()
        if means[CI_LO_RANK - 1] <= true_mean <= means[CI_HI_RANK - 1]:
            covered += 1
    assert covered >= 32


def test_bootstrap_constant_column_collapses():
    # every weighted mean of a constant is that constant: CI width 0
    rows = [(str(i), 42.0) for i in range(100)]
    means = []
    for b in range(8):
        sw = wt = 0.0
        for key, v in rows:
            w = _w(_u48(f"boot{b}:{key}"))
            sw += w * v
            wt += w
        means.append(sw / wt)
    assert all(m == pytest.approx(42.0, abs=1e-12) for m in means)
