"""Shared helpers for registered queries.

Cross-engine float determinism: double summation order differs between Spark
(partial aggregates per partition) and DuckDB, so raw SUM(double) differs in
low bits and fails an exact value-hash compare. Money-like columns are
therefore cast to DECIMAL before aggregation in BOTH engines — decimal
addition is exact and order-independent, so results match bit-for-bit — then
cast back to DOUBLE for a stable output schema. Averages are computed as
exact-decimal sum divided by count in double, identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.session import tune_session
from mapreducefw_spark.sources.tables import table

DEC = "decimal(12,2)"


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    return table(spark, sf_dir, name)  # events nanos handled in the source layer


def dec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: str | Column, alias: str) -> Column:
    """Exact (order-independent) sum of a money-like double column."""
    return F.sum(dec(col)).cast("double").alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """Exact-numerator average: double(sum(decimal)) / count."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c)).cast("double") / F.count(c)).alias(alias)
