"""Seventh pipeline batch (round 5, continued): incremental view
maintenance — keeping a grouped aggregate current from a changelog without
rescanning the fact table (operators/ivm.py). The query partitions lineitem
deterministically into a base snapshot, an insert batch and a retraction
batch, maintains the view incrementally, and the oracle recomputes the same
view from scratch over the equivalent final row set — so the driver's value
hash proves merge == recompute."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.operators import ivm
from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import dec, t


@register(
    "incremental_agg_maintenance",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
       COUNT(*) AS n_rows
FROM lineitem
WHERE (l_orderkey % 5 = 0) OR (l_orderkey % 7 <> 3)
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain a pricing-summary view incrementally: base snapshot =
    lineitem rows with l_orderkey % 5 <> 0; the changelog then inserts the
    % 5 == 0 rows (+1) and retracts the base rows with l_orderkey % 7 == 3
    (-1). The merge touches ONLY the existing aggregate (O(groups) rows)
    and the delta — at 100 TB the base facts are never rescanned, which is
    the entire point (a full nightly recompute scans everything; this scans
    the day's changes). Decimal sums keep the merge bit-identical to the
    oracle's from-scratch recompute over the equivalent final row set."""
    li = t(spark, sf_dir, "lineitem")
    base = li.filter(F.col("l_orderkey") % 5 != 0)
    sum_cols = {"sum_qty": dec("l_quantity"), "sum_price": dec("l_extendedprice")}
    base_agg = base.groupBy("l_returnflag", "l_linestatus").agg(
        *[F.sum(c).alias(a) for a, c in sum_cols.items()],
        F.count(F.lit(1)).alias("n_rows"),
    )
    inserts = li.filter(F.col("l_orderkey") % 5 == 0).withColumn("_w", F.lit(1))
    retracts = base.filter(F.col("l_orderkey") % 7 == 3).withColumn("_w", F.lit(-1))
    changes = inserts.unionByName(retracts)
    merged = ivm.merge_agg_delta(
        base_agg,
        changes,
        keys=["l_returnflag", "l_linestatus"],
        sum_cols=sum_cols,
    )
    return merged.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("sum_price").cast("double").alias("sum_price"),
        "n_rows",
    ).orderBy("l_returnflag", "l_linestatus")
