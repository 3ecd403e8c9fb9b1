"""Skyline / Pareto-frontier operator (Börzsönyi et al., "The Skyline
Operator"): the rows not dominated in a 2-objective space (minimize x,
maximize y) — price/recency frontiers, cost/quality trade-off sets.

The naive form checks dominance against every other row — O(n^2), a
cartesian at scale. The 2-D case collapses to prefix arithmetic: a row
survives iff

  1. its y exceeds the best y among all STRICTLY cheaper x
     (otherwise something cheaper is at least as good), and
  2. its y is the best among rows at ITS OWN x
     (otherwise an equal-x row strictly beats it; exact (x, y) duplicates
     tie and all survive).

Both conditions are computed scale-safely:
- the per-x maxima come from one groupBy (map-side combinable) onto the
  DISTINCT-x frame;
- the strictly-before prefix maximum runs over that frame in the same
  two-phase range-partition shape as operators/rank.py: one range
  shuffle, per-partition windows keyed by spark_partition_id, and
  O(partitions) cross-partition offsets via a triangular broadcast — no
  unpartitioned window anywhere, so the plan holds when the distinct-x
  frame itself is huge.

NULLs in either objective are excluded (a NULL has no place in a
dominance order — and NULL sort position differs across engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    num_parts: int | None = None,
) -> DataFrame:
    """Rows of ``df`` on the (min x, max y) Pareto frontier. Returns the
    input columns of the surviving rows (duplicates of a frontier point
    all survive — none strictly dominates another)."""
    spark = df.sparkSession
    n = num_parts or spark.sparkContext.defaultParallelism
    base = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())

    # per-x best y: the only pass over the full input
    per_x = base.groupBy(F.col(x_col).alias("_x")).agg(
        F.max(F.col(y_col)).alias("_xmax")
    )

    # strictly-before prefix max over the distinct-x frame, two-phase
    ranged = (
        per_x.repartitionByRange(n, F.col("_x"))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_prev = (
        W.partitionBy("_pid").orderBy("_x").rowsBetween(W.unboundedPreceding, -1)
    )
    local = ranged.withColumn("_lprev", F.max("_xmax").over(w_prev))
    totals = ranged.groupBy("_pid").agg(F.max("_xmax").alias("_pmax"))
    before = totals.select(
        F.col("_pid").alias("_bpid"), F.col("_pmax").alias("_bmax")
    )
    offsets = (
        totals.join(F.broadcast(before), F.col("_bpid") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(F.max("_bmax").alias("_off"))
    )
    prefixed = local.join(F.broadcast(offsets), "_pid").select(
        "_x",
        "_xmax",
        F.greatest(
            F.coalesce("_lprev", "_off"), F.coalesce("_off", "_lprev")
        ).alias("_prev"),  # max of the two, NULL only if both NULL (global min x)
    )

    survivors_x = prefixed.filter(
        F.col("_prev").isNull() | (F.col("_xmax") > F.col("_prev"))
    )
    return (
        base.join(
            F.broadcast(
                survivors_x.select("_x", "_xmax")
            ),  # frontier-sized: one row per surviving x
            (F.col(x_col) == F.col("_x")) & (F.col(y_col) == F.col("_xmax")),
        )
        .drop("_x", "_xmax")
    )
