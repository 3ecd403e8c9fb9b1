"""Property pins for the ninth batch (graph + sequence analytics).

The exact differential checks live in tools/check_oracle.py (all four
queries oracle-green at sf0.001/0.01); these pin the mathematical
invariants the oracle compare can't express: PageRank mass conservation
and hand-computed ranks on a known graph, transition-probability rows
summing to 1, session path splitting at the gap boundary, and winsorize
actually clipping to the quantile bounds.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mapreducefw_spark.queries import QUERIES, load_all

load_all()


def test_pagerank_mass_and_known_graph(spark, sf_dir, tmp_path):
    # triangle 1-2-3 plus pendant 3-4 (undirected): by symmetry pr(1)==pr(2),
    # and the pendant node 4 must rank below the triangle nodes.
    rows = []
    order = 0
    for a, b in [(1, 2), (2, 3), (1, 3), (3, 4)]:
        order += 1
        rows += [(order, a), (order, b)]
    df = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])
    df.write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    out = QUERIES["pagerank_copurchase"](spark, str(tmp_path)).collect()
    pr = {r.part: r.pagerank for r in out}
    assert set(pr) == {1, 2, 3, 4}
    assert abs(sum(pr.values()) - 1.0) < 1e-4  # mass conserved (no dangling)
    assert pr[1] == pr[2]  # symmetry
    assert pr[3] > pr[1] > pr[4]  # hub above triangle peers above pendant

    # cross-check against a plain-python power iteration (same 5 rounds)
    edges = {(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1), (3, 4), (4, 3)}
    deg = {n: sum(1 for s, _ in edges if s == n) for n in (1, 2, 3, 4)}
    r = {n: 0.25 for n in deg}
    for _ in range(5):
        r = {
            v: 0.15 / 4
            + 0.85 * sum(r[s] / deg[s] for s, d in edges if d == v)
            for v in deg
        }
    for n in deg:
        assert abs(pr[n] - round(r[n], 6)) <= 1e-6


def test_transition_probs_sum_to_one(spark, sf_dir):
    rows = QUERIES["event_transition_matrix"](spark, sf_dir).collect()
    by_prev = {}
    for r in rows:
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.prob
    assert by_prev and all(abs(s - 1.0) < 1e-12 for s in by_prev.values())


def test_session_paths_split_at_gap(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 7, "view"),
        (2, t0 + dt.timedelta(minutes=10), 7, "click"),
        # 31-min gap -> new session
        (3, t0 + dt.timedelta(minutes=41), 7, "purchase"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    df.select(
        "event_id", F.col("ts").cast("timestamp_ntz").alias("ts"),
        "user_id", "event_type",
        F.lit(1.0).alias("value"), F.lit("{}").alias("props"),
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r.path: r.n_sessions for r in
           QUERIES["session_paths_top"](spark, str(tmp_path)).collect()}
    assert out == {"view>click": 1, "purchase": 1}


def test_winsorize_clips_to_quantiles(spark, sf_dir):
    rows = QUERIES["winsorized_price_stats"](spark, sf_dir).collect()
    # global clip bounds: every group's min/max must lie within [lo, hi],
    # and at least one group must touch each bound (the bound values exist)
    lo = min(r.min_clipped for r in rows)
    hi = max(r.max_clipped for r in rows)
    assert lo < hi
    assert all(lo <= r.min_clipped <= r.max_clipped <= hi for r in rows)


def test_triangles_known_graph(spark, tmp_path):
    # orders: {1,2,3} (triangle), {3,4} (pendant edge), {5,6},{6,7},{5,7}
    # (second triangle sharing no nodes)
    rows = []
    for k, parts in enumerate([[1, 2, 3], [3, 4], [5, 6], [6, 7], [5, 7]], 1):
        rows += [(k, p) for p in parts]
    spark.createDataFrame(rows, ["l_orderkey", "l_partkey"]).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/lineitem.parquet")
    out = {r.node: r for r in
           QUERIES["copurchase_triangles"](spark, str(tmp_path)).collect()}
    assert {n: out[n].n_triangles for n in sorted(out)} == {
        1: 1, 2: 1, 3: 1, 4: 0, 5: 1, 6: 1, 7: 1
    }
    assert out[1].clustering_coeff == 1.0          # deg 2, closed wedge
    assert out[3].degree == 3 and abs(out[3].clustering_coeff - 1 / 3) < 1e-12
    assert out[4].clustering_coeff is None         # degree 1: no wedge
