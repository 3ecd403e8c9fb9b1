"""Skew-handling aggregation (SURVEY §7 M6): two-phase salted group-by.

A hot grouping key overloads one reducer at 100 TB. Salting splits each key
into `salt` sub-groups for a first partial aggregation, then a second, tiny
aggregation merges the partials. Results are identical to a plain groupBy —
the registered query's oracle proves exactly that — while the heavy shuffle
spreads `salt`-ways. AQE's skew handling covers joins; salting covers
aggregations whose partial-agg states are large (collect_list, distinct)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    group_cols: list[str],
    value_col: Column | str,
    *,
    salt: int = 16,
    sum_alias: str = "total",
    count_alias: str = "n",
) -> DataFrame:
    """groupBy(group_cols).agg(sum, count) with a salted two-phase plan."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(*group_cols, F.spark_partition_id()), F.lit(salt)))
    partial = salted.groupBy(*group_cols, "_salt").agg(
        F.sum(v).alias("_s"), F.count(v).alias("_c")
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("_s").alias(sum_alias), F.sum("_c").cast("bigint").alias(count_alias)
    )
