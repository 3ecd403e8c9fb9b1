"""Table statistics collection (the ANALYZE TABLE surface): per-column
row/null/distinct counts, min/max, and the most-common value with its
frequency — the inputs a cost-based optimizer's cardinality estimates and a
data-quality dashboard both read.

Scale shape: the table is scanned ONCE — columns unpivot map-side into
(column, value) pairs (a stack/explode, no shuffle), then one hash
aggregation per (column, value) feeds the distinct/MCV layer and a second
O(ndv)-sized aggregation collapses to per-column rows. The wide table never
shuffles; what moves is one (name, value, count) row per distinct value —
the same cardinality ANALYZE implementations ship to the catalog. Exact
counts by design (this is the audit/oracle form); a 100 TB profile run
would swap ndv for approx_count_distinct and MCV for a count-min sketch,
both already in the operator surface (approx_count_distinct_parts,
count_min_heavy_hitters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def table_column_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact per-column stats for integer-typed columns ``cols``.

    Returns one row per column: (column, n_rows, n_null, ndv, min_v, max_v,
    mcv, mcv_n) — ndv/min/max/MCV over non-null values, MCV ties broken
    toward the smallest value so the report is deterministic in any engine.
    """
    pairs = df.select(
        F.explode(
            F.create_map(
                *[x for c in cols for x in (F.lit(c), F.col(c).cast("long"))]
            )
        ).alias("column", "v")
    )
    per_value = pairs.groupBy("column", "v").agg(F.count(F.lit(1)).alias("cnt"))
    w = W.partitionBy("column").orderBy(
        F.desc(F.when(F.col("v").isNotNull(), F.col("cnt"))), F.asc_nulls_last("v")
    )
    return (
        per_value.withColumn("_rk", F.row_number().over(w))
        .groupBy("column")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("v").isNull(), F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias("n_null"),
            F.count(F.when(F.col("v").isNotNull(), 1)).cast("bigint").alias("ndv"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.max(F.when(F.col("_rk") == 1, F.col("v"))).alias("mcv"),
            F.max(
                F.when((F.col("_rk") == 1) & F.col("v").isNotNull(), F.col("cnt"))
            )
            .cast("bigint")
            .alias("mcv_n"),
        )
        .orderBy("column")
    )
