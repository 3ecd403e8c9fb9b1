"""Pins for the round-12 spatial tier (pipeline48).

The DuckDB oracle is already the quadratic definition; these pins add a
pure-Python brute force (hashlib coordinates) compared EXACTLY — which
also proves the grid join emits each qualifying pair exactly once (a
duplicate would break the multiset equality) — plus the structural
properties: every emitted dist2 is within the radius and exactly the
dyadic arithmetic value, and the density grid partitions the point set.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import duckdb

from mapreducefw_spark.queries import QUERIES, load_all
from mapreducefw_spark.queries.pipeline48 import EPS, GRID

load_all()

SF_DIR = "/root/testdata/sf0.001"


def _coord(salt: str, did: int) -> float:
    h = int(hashlib.md5(f"{salt}{did}".encode()).hexdigest()[:12], 16)
    return (h % GRID) / 64


def _points():
    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{SF_DIR}/documents.parquet' "
            "WHERE doc_id IS NOT NULL"
        ).fetchall()
    ]
    return [(i, _coord("sx:", i), _coord("sy:", i)) for i in ids]


def test_radius_join_matches_brute_force(spark):
    got = {
        (r["id_a"], r["id_b"]): r["dist2"]
        for r in QUERIES["spatial_radius_join"](spark, SF_DIR).collect()
    }
    pts = _points()
    expected = {}
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            a, b = pts[i], pts[j]
            d2 = (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2
            if d2 <= EPS * EPS:
                key = (min(a[0], b[0]), max(a[0], b[0]))
                expected[key] = d2
    # exact multiset equality: pairs found once each, dyadic dist2 exact
    assert got == expected
    assert len(got) > 0  # the fixture must actually exercise the join
    assert all(v <= EPS * EPS for v in got.values())


def test_density_grid_partitions_the_points(spark):
    rows = QUERIES["spatial_density_grid"](spark, SF_DIR).collect()
    pts = _points()
    cells = Counter()
    sums = {}
    for _, x, y in pts:
        c = (math.floor(x / EPS), math.floor(y / EPS))
        cells[c] += 1
        sx, sy = sums.get(c, (0.0, 0.0))
        sums[c] = (sx + x, sy + y)
    got = {(r["cell_x"], r["cell_y"]): r for r in rows}
    assert set(got) == set(cells)
    assert sum(r["n_points"] for r in rows) == len(pts)
    for c, n in cells.items():
        assert got[c]["n_points"] == n
        # dyadic sums are exact and order-free on both sides
        assert (got[c]["sum_x"], got[c]["sum_y"]) == sums[c]


def test_neighbor_replication_is_sufficient():
    # the 3x3 replication argument: any pair within EPS differs by at
    # most one EPS-sized cell in each axis — check the worst corners
    for xa, xb in [(0.0, EPS), (EPS - 1 / 64, 2 * EPS - 1 / 64)]:
        assert abs(math.floor(xa / EPS) - math.floor(xb / EPS)) <= 1
