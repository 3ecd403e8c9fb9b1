"""Time-series regularization: gap-fill to a fixed grid + forward-fill.

Sensor/event streams are irregular; downstream models want a dense,
regular grid. The scalable shape:

1. aggregate raw rows to ``(key, bucket)`` — one shuffle, map-side
   partial aggregation (the only pass over the big input);
2. build the dense grid per key from that key's [min, max] bucket with
   ``sequence() + explode`` — grid size is O(span / step) per key,
   independent of raw row count, and is generated AFTER the aggregate so
   the explode runs on the small per-key frame;
3. left-join observations onto the grid (equi-join on (key, bucket));
4. forward-fill with ``last(value, ignorenulls=True)`` over a window
   partitioned BY KEY — never an unpartitioned window, so the plan holds
   at any number of keys.

Steps 2-4 all operate on grid-sized data (keys x buckets), not raw-event-
sized data; at 100 TB of events with a bounded grid this is one fact
shuffle plus small-frame work. Semantic contract: the reference's
shuffle-group-reduce over time keys (``/root/reference/MRFCore.cpp:252-446``)
with the grid densification Spark expresses declaratively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def gap_fill_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    agg_col: Column,
    step: str = "1 hour",
    grain: str = "hour",
) -> DataFrame:
    """Dense per-key time grid with forward-filled aggregate values.

    Output: ``key, bucket, value`` (observed aggregate), ``filled_value``
    (forward-filled), ``is_gap`` (1 when the bucket had no raw rows).
    ``agg_col`` must be an aggregate expression (e.g. exact-decimal sum)
    evaluated per (key, bucket).
    """
    obs = (
        df.withColumn("_gf_key", F.col(key_col))
        .withColumn("_gf_bucket", F.date_trunc(grain, F.col(ts_col)))
        .groupBy("_gf_key", "_gf_bucket")
        .agg(agg_col.alias("value"))
        .select(
            F.col("_gf_key").alias("key"),
            F.col("_gf_bucket").alias("bucket"),
            "value",
        )
    )
    # Per-key dense grid: sequence() over that key's observed span. The
    # span agg is O(keys) rows; the explode multiplies only by buckets.
    grid = (
        obs.groupBy("key")
        .agg(F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
        .select(
            "key",
            F.explode(
                F.sequence("_lo", "_hi", F.expr(f"interval {step}"))
            ).alias("bucket"),
        )
    )
    dense = grid.join(obs, ["key", "bucket"], "left")
    ffill = W.partitionBy("key").orderBy("bucket").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return dense.select(
        "key",
        "bucket",
        "value",
        F.last("value", ignorenulls=True).over(ffill).alias("filled_value"),
        F.when(F.col("value").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_gap"),
    )
