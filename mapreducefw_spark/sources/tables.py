"""Parquet table sources for the driver-generated test data.

Mirrors the reference's in-memory source (``MapReduceFramework.h:13``,
``MRFCore.cpp:448-454``) generalized to schema-on-read parquet scans: Catalyst
gets predicate pushdown + column pruning for free, and partition-parallel
reads replace the chunked shared-cursor scheduler (``MRFCore.cpp:46-53``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark rejects by
        # default; read nanos as long and floor-div to microseconds (matches
        # DuckDB's nanos->micros truncation). Handled here in the source
        # layer so every consumer (load_tables, register_views, queries,
        # streaming schema inference) gets a usable timestamp column.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so queries can use spark.sql."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
