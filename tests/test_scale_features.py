"""Scale-posture features: bucketed co-located joins, salted aggregation
invariance, partition-count independence (SURVEY §7 M6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducefw_spark.operators.skew import salted_sum_count
from mapreducefw_spark.queries._util import t


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """bucketBy + saveAsTable: a join on the bucket key must not add an
    Exchange on either side."""
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name in ["b_orders", "b_lineitem"]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{wh}/{name}", ignore_errors=True)
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    orders.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(
        "b_orders"
    )
    li.withColumnRenamed("l_orderkey", "o_orderkey").write.mode("overwrite").bucketBy(
        8, "o_orderkey"
    ).saveAsTable("b_lineitem")
    # force the sort-merge path: tiny fixtures otherwise go broadcast, and the
    # planner then disables bucketing entirely
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan  # co-located: no shuffle
        assert "Bucketed: true" in plan, plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_salted_aggregate_matches_plain(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    salted = {
        (r.l_returnflag): (round(r.total, 4), r.n)
        for r in salted_sum_count(li, ["l_returnflag"], "l_quantity", salt=8).collect()
    }
    plain = {
        (r.l_returnflag): (round(r.total, 4), r.n)
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("total"), F.count("l_quantity").alias("n"))
        .collect()
    }
    assert salted == plain


def test_salted_aggregate_partition_invariant(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    a = sorted(
        (r.l_returnflag, round(r.total, 4), r.n)
        for r in salted_sum_count(li.repartition(3), ["l_returnflag"], "l_quantity").collect()
    )
    b = sorted(
        (r.l_returnflag, round(r.total, 4), r.n)
        for r in salted_sum_count(li.repartition(17), ["l_returnflag"], "l_quantity").collect()
    )
    assert a == b
