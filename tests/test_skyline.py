"""Property pins for the skyline operator: equality with quadratic
dominance truth on random points (hypothesis), duplicate-frontier-point
survival, and NULL exclusion."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreducefw_spark.operators.skyline import skyline_2d

_points = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=1, max_size=25
)


def _truth(pts):
    out = []
    for i, (x, y) in enumerate(pts):
        dominated = any(
            (bx <= x and by >= y) and (bx < x or by > y) for bx, by in pts
        )
        if not dominated:
            out.append((i, x, y))
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(pts=_points)
def test_skyline_equals_quadratic_truth(spark_global, pts):
    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark_global.createDataFrame(rows, schema="id long, x long, y long")
    got = sorted((r.id, r.x, r.y) for r in skyline_2d(df, "x", "y").collect())
    assert got == sorted(_truth(pts))


def test_skyline_duplicates_survive_and_nulls_drop(spark):
    rows = [(1, 5, 5), (2, 5, 5), (3, 4, 4), (4, None, 9), (5, 1, None)]
    df = spark.createDataFrame(rows, schema="id long, x long, y long")
    got = sorted(r.id for r in skyline_2d(df, "x", "y").collect())
    # (5,5) twins tie (neither strictly dominates); (4,4) is beaten on both
    # axes only by... nothing cheaper-and-later exists, so it survives too;
    # NULL rows are excluded from the order entirely
    assert got == [1, 2, 3]
