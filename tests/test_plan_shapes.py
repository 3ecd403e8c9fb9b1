"""Plan-shape pins for the round-3 queries: the join strategies PLANS.md
documents are asserted here so a regression (a broadcast degrading to
sort-merge, a semi-join degenerating to inner+distinct) fails CI instead of
only showing up in the next plan audit."""

from __future__ import annotations

from mapreducefw_spark.queries import QUERIES, load_all

load_all()


def _plan(spark, sf_dir, name: str) -> str:
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_q4_exists_plans_left_semi(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q4_priority_exists")
    assert "LeftSemi" in plan, plan


def test_q22_dormancy_plans_left_anti(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q22_global_sales_opportunity")
    assert "LeftAnti" in plan, plan


def test_q7_dimensions_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q7_nation_volume")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q8_no_nested_loop(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q8_market_share")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_snapshot_diff_full_outer_sort_merge(spark, sf_dir):
    plan = _plan(spark, sf_dir, "snapshot_diff")
    assert "SortMergeJoin" in plan and "FullOuter" in plan, plan


def test_global_rank_scalable_has_no_unpartitioned_window(spark, sf_dir):
    """The two-phase rank must never funnel data through one task: every
    WindowExec is partitioned (no Exchange SinglePartition feeding a Window)
    and the one data shuffle is the range exchange."""
    plan = _plan(spark, sf_dir, "window_global_rank_scalable")
    assert "Window" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "rangepartitioning" in plan, plan


def test_skew_join_events_orders_aqe_splits_heavy_partition(spark):
    """The registered heavy-hitter fact x fact join must take the sort-merge
    path (MERGE hint: fact sides can't broadcast at scale) and get its
    oversized partition split by AQE — same machinery as
    test_aqe_skew_join_splits_heavy_partition, asserted on the real query.
    Uses sf0.01 (the sf0.001 heavy key compresses below any threshold) with
    thresholds lowered to fixture scale."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        df = QUERIES["skew_join_events_orders"](spark, "/root/testdata/sf0.01")
        df.collect()  # executes THIS queryExecution -> final AQE plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "isFinalPlan=true" in plan, plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_pack_spans_single_partition_only_for_bucket_offsets(spark, sf_dir):
    """The two-phase prefix sum may use a single-partition window ONLY over
    the tiny per-bucket table; the per-doc window must stay partitioned."""
    plan = _plan(spark, sf_dir, "sequence_pack_spans")
    assert plan.count("Window") == 2, plan
    # one single-partition exchange (bucket offsets); the doc-level window
    # exchanges on the bucket key instead
    assert plan.count("Exchange SinglePartition") <= 1, plan
    assert "hashpartitioning(_bkt" in plan, plan
