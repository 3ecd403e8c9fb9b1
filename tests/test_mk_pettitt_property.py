"""Third-implementation pins for the round-9 rank statistics.

`mann_kendall_trend` and `pettitt_changepoint` both avoid the textbook
O(n²) double sums — MK folds sign pairs on a join, Pettitt replaces the
double sum entirely with the midrank identity Σ_j sign(x_i − x_j) =
2·rank_i − n − 1. The DuckDB oracles share that algebra, so a shared
algebra bug could self-confirm. This suite recomputes both statistics
from the LITERAL definitions in pure Python (hashlib-free double loops,
no Spark/DuckDB expressions) over constructed daily series — monotone,
constant (all ties), alternating, a clean step (the changepoint case),
tie-heavy, single-day, and seeded pseudo-random — and asserts the
REGISTERED queries reproduce them exactly.
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mapreducefw_spark.queries import QUERIES, load_all

load_all()

D0 = datetime(1995, 1, 1)


def _series(name: str) -> list[float]:
    if name == "monotone":
        return [100.0 + 10 * i for i in range(12)]
    if name == "constant":
        return [500.0] * 9
    if name == "alternating":
        return [100.0, 900.0] * 6
    if name == "step":
        return [100.0 + (i % 3) for i in range(10)] + [
            900.0 + (i % 3) for i in range(10)
        ]
    if name == "tie_heavy":
        return [100.0, 200.0, 100.0, 200.0, 100.0, 300.0, 200.0, 100.0]
    if name == "single_day":
        return [123.45]
    # seeded LCG pseudo-random (no random module: determinism by arithmetic)
    seed = {"rand_a": 7, "rand_b": 13, "rand_c": 29}[name]
    xs, x = [], seed
    for _ in range(25):
        x = (1103515245 * x + 12345) % (2**31)
        xs.append(round(100 + (x % 100000) / 100.0, 2))
    return xs


SERIES = [
    "monotone",
    "constant",
    "alternating",
    "step",
    "tie_heavy",
    "single_day",
    "rand_a",
    "rand_b",
    "rand_c",
]


def _mk_brute(xs: list[float]):
    n = len(xs)
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties: dict[float, int] = {}
    for x in xs:
        ties[x] = ties.get(x, 0) + 1
    tie_term = sum(c * (c - 1) * (2 * c + 5) for c in ties.values() if c > 1)
    var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    if s > 0:
        z = (s - 1) / math.sqrt(var_s)
    elif s < 0:
        z = (s + 1) / math.sqrt(var_s)
    else:
        z = 0.0
    return n, s, round(var_s, 6), round(z, 6)


def _pettitt_brute(xs: list[float]):
    n = len(xs)
    us = []
    for t in range(n):  # U_t for t = day index 1..n (inclusive prefix)
        u = sum(
            (xs[j] > xs[i]) - (xs[j] < xs[i])
            for i in range(t + 1)
            for j in range(t + 1, n)
        )
        us.append(u)
    k = max(abs(u) for u in us)
    t_star = min(i for i, u in enumerate(us) if abs(u) == k)
    p = round(2 * math.exp(-6.0 * k * k / (n**3 + n**2)), 6)
    return n, k, (D0 + timedelta(days=t_star)).date(), p


@pytest.fixture(scope="module")
def series_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("mk_pettitt")
    dirs = {}
    for name in SERIES:
        xs = _series(name)
        d = base / name
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array(range(len(xs)), pa.int64()),
                    "o_custkey": pa.array([1] * len(xs), pa.int64()),
                    "o_totalprice": pa.array(xs, pa.float64()),
                    "o_orderdate": pa.array(
                        [D0 + timedelta(days=i) for i in range(len(xs))],
                        pa.timestamp("us"),
                    ),
                }
            ),
            str(d / "orders.parquet"),
        )
        dirs[name] = str(d)
    return dirs


@pytest.mark.parametrize("name", SERIES)
def test_mann_kendall_equals_pure_python_definition(spark, series_dirs, name):
    xs = _series(name)
    n, s, var_s, z = _mk_brute(xs)
    row = QUERIES["mann_kendall_trend"](spark, series_dirs[name]).collect()[0]
    assert row["n_days"] == n
    if n < 2:
        # no pairs: SUM over an empty join is NULL on both engines —
        # pinned engine behavior, the brute definition's 0
        assert row["s_stat"] is None
    else:
        assert row["s_stat"] == s
        assert row["var_s"] == var_s
        assert row["z"] == z


@pytest.mark.parametrize("name", SERIES)
def test_pettitt_equals_pure_python_definition(spark, series_dirs, name):
    n, k, day, p = _pettitt_brute(_series(name))
    row = QUERIES["pettitt_changepoint"](spark, series_dirs[name]).collect()[0]
    assert row["n_days"] == n
    assert row["k_stat"] == k
    assert row["changepoint_day"] == day
    assert row["p_approx"] == p
