"""Shuffle-elision pins for bucketed table layout (sources/bucketing.py).

The point of bucketing is a PLAN property, so the assertions are plan
assertions: equal-bucket joins and bucket-key aggregations must contain
ZERO Exchange nodes, and a bucketed-vs-plain join must shuffle ONLY the
plain side. Value correctness is pinned against the same join computed
from the raw frames.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducefw_spark.queries._util import t
from mapreducefw_spark.sources.bucketing import (
    drop_bucketed,
    n_exchanges,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    """orders + customer written bucketed by custkey with equal counts."""
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    write_bucketed(
        orders, "bkt_orders", n_buckets=8, bucket_cols=["o_custkey"], sort_cols=["o_custkey"]
    )
    write_bucketed(
        cust, "bkt_customer", n_buckets=8, bucket_cols=["c_custkey"], sort_cols=["c_custkey"]
    )
    write_bucketed(cust, "plain_customer", n_buckets=1, bucket_cols=["c_custkey"])
    yield orders, cust
    drop_bucketed(spark, "bkt_orders", "bkt_customer", "plain_customer")


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_elides_both_exchanges(spark, bucketed, no_broadcast):
    bo, bc = spark.table("bkt_orders"), spark.table("bkt_customer")
    joined = bo.join(bc, bo.o_custkey == bc.c_custkey)
    assert n_exchanges(joined) == 0, joined._jdf.queryExecution().executedPlan().toString()
    # and the values are the same join computed from the raw frames
    orders, cust = bucketed
    expect = orders.join(cust, orders.o_custkey == cust.c_custkey).count()
    assert joined.count() == expect


def test_bucketed_vs_plain_join_shuffles_only_plain_side(spark, bucketed, no_broadcast):
    bo = spark.table("bkt_orders")
    plain = spark.table("plain_customer")  # 1 bucket = no useful layout
    joined = bo.join(plain, bo.o_custkey == plain.c_custkey)
    # exactly one exchange: the plain side re-distributes to the bucketed
    # side's layout; the 8-bucket orders table must NOT shuffle
    assert n_exchanges(joined) == 1, joined._jdf.queryExecution().executedPlan().toString()


def test_bucket_key_aggregation_elides_exchange(spark, bucketed, no_broadcast):
    bo = spark.table("bkt_orders")
    agg = bo.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("s"))
    assert n_exchanges(agg) == 0, agg._jdf.queryExecution().executedPlan().toString()
    # a non-bucket-key aggregation on the same table still shuffles
    agg2 = bo.groupBy("o_orderkey").agg(F.sum("o_totalprice").alias("s"))
    assert n_exchanges(agg2) == 1


def test_sortby_elides_smj_sort(spark, bucketed, no_broadcast):
    """sortBy within buckets: the sort-merge join needs no Sort on the
    pre-sorted sides. Two preconditions, both deliberate: one file per
    bucket (write_bucketed repartitions onto the bucket key when sort_cols
    are given) and spark.sql.legacy.bucketedTableScan.outputOrdering=true
    (since 3.0 Spark won't pay planning-time file listing for the sorted
    scan unless asked)."""
    prev = spark.conf.get("spark.sql.legacy.bucketedTableScan.outputOrdering")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        bo, bc = spark.table("bkt_orders"), spark.table("bkt_customer")
        plan = (
            bo.join(bc, bo.o_custkey == bc.c_custkey)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SortMergeJoin" in plan
        assert plan.count("Sort ") == 0, plan
        assert plan.count("Exchange") == 0, plan
    finally:
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", prev)


def test_write_bucketed_validation(spark, sf_dir):
    orders = t(spark, sf_dir, "orders").limit(1)
    with pytest.raises(ValueError, match="n_buckets"):
        write_bucketed(orders, "x", n_buckets=0, bucket_cols=["o_custkey"])
    with pytest.raises(ValueError, match="bucket_cols"):
        write_bucketed(orders, "x", n_buckets=4, bucket_cols=[])
