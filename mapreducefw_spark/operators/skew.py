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


def key_skew_report(
    df: DataFrame,
    key_cols: list[str],
    *,
    top_k: int = 10,
    target_partitions: int = 32,
) -> DataFrame:
    """Pre-shuffle skew diagnostics: what a pipeline author checks BEFORE
    keying a 100 TB join or groupBy on a column. One aggregation over the
    keys (map-side partial combine makes it cheap regardless of skew), then
    a bounded global top-k (TakeOrderedAndProject — never a full sort) and a
    broadcast of the two summary scalars.

    Returns the ``top_k`` heaviest keys with, per row: the key's count, its
    share of all rows, the ratio of its count to the mean key count
    (``hot_factor`` — how many average keys it weighs), and
    ``recommended_salt`` = ceil(count * target_partitions / total): the salt
    fan-out that would spread THIS key across reducers so no reducer gets
    more than ~1/target_partitions of the data (1 = no salting needed, the
    input to salted_sum_count's ``salt`` parameter otherwise). All integer /
    exact arithmetic, so the report is engine-reproducible and
    oracle-checkable.
    """
    cnt = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("cnt"))
    totals = cnt.agg(
        F.sum("cnt").cast("bigint").alias("_total"),
        F.count(F.lit(1)).cast("bigint").alias("_distinct"),
    )
    top = cnt.orderBy(F.desc("cnt"), *key_cols).limit(top_k)
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            *key_cols,
            F.col("cnt").cast("bigint").alias("cnt"),
            F.round(F.col("cnt") / F.col("_total"), 6).alias("share"),
            F.round(F.col("cnt") * F.col("_distinct") / F.col("_total"), 2).alias(
                "hot_factor"
            ),
            F.greatest(
                F.lit(1).cast("bigint"),
                F.ceil(F.col("cnt") * F.lit(target_partitions) / F.col("_total")).cast(
                    "bigint"
                ),
            ).alias("recommended_salt"),
        )
        .orderBy(F.desc("cnt"), *key_cols)
    )
