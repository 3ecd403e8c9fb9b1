"""top1_per_key (single-exchange argmin aggregate) must select the exact
row the two-phase topk_per_key window form selects at k=1 — the r13
optimization swapped the k=1 call sites (LPA argmax, hard-negative
pos/hardest, embedding-dedup canonical) onto it, so the equivalence is
the correctness contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducefw_spark.operators.rank import top1_per_key, topk_per_key


def _fixture(spark):
    # ties in the score (the first order column) so the id tiebreak is
    # exercised; negative scores so the negation trick is exercised;
    # key 3 has a single row (degenerate group)
    rows = [
        (1, 10, 0.5),
        (1, 11, 0.5),    # tie with 10 -> id decides
        (1, 12, -0.25),
        (2, 20, -1.5),
        (2, 21, -0.75),  # max for key 2 is negative
        (2, 22, -1.5),
        (3, 30, 0.0),
    ]
    return spark.createDataFrame(rows, "k int, nid int, sim double")


def test_top1_matches_topk_k1_desc_score_asc_id(spark):
    df = _fixture(spark)
    via_window = (
        topk_per_key(df, ["k"], [F.desc("sim"), F.asc("nid")], 1)
        .select("k", "nid", "sim")
    )
    via_agg = top1_per_key(
        df, ["k"], [(-F.col("sim")).alias("ns"), F.col("nid")], ["nid", "sim"]
    )
    assert sorted(map(tuple, via_agg.collect())) == sorted(
        map(tuple, via_window.collect())
    )
    # and the winners are the expected deterministic picks
    got = {r.k: (r.nid, r.sim) for r in via_agg.collect()}
    assert got == {1: (10, 0.5), 2: (21, -0.75), 3: (30, 0.0)}


def test_top1_integer_count_order(spark):
    # the LPA shape: (c DESC, lbl ASC) over bigint counts
    rows = [(1, 5, 3), (1, 4, 3), (1, 9, 1), (2, 7, 2)]
    df = spark.createDataFrame(rows, "dst int, lbl int, c long")
    via_window = topk_per_key(df, ["dst"], [F.desc("c"), F.asc("lbl")], 1).select(
        "dst", "lbl"
    )
    via_agg = top1_per_key(
        df, ["dst"], [(-F.col("c")).alias("nc"), F.col("lbl")], ["lbl"]
    )
    assert sorted(map(tuple, via_agg.collect())) == sorted(
        map(tuple, via_window.collect())
    )
    assert {r.dst: r.lbl for r in via_agg.collect()} == {1: 4, 2: 7}
