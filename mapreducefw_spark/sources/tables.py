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


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to a TIMESTAMP (ltz) whose UTC
    instant equals the file's naive wall-clock value — the semantics DuckDB
    gives the oracle side — regardless of fixture vintage or session timezone.

    Fixture generations have stored ts as TIMESTAMP(NANOS) (which Spark reads
    as bigint under ``nanosAsLong``, and rejects otherwise) or as a type
    Spark reads as TIMESTAMP_NTZ. Shared by the batch loader and the
    streaming sources so both see one stable column type."""
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        # nanos read as long -> floor-div matches DuckDB nanos->micros
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_type == "timestamp_ntz":
        # In a UTC session the ntz->ltz cast interprets the wall clock at
        # zero offset — exactly the semantics we want, with none of the
        # field-arithmetic cost below (which showed up 2x per side in the
        # r4 bench of the self-joining events queries). Both the tuned
        # session and the driver's vanilla one (container TZ=UTC) take
        # this branch; only a genuinely non-UTC session pays the fallback.
        try:
            tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        except Exception:
            tz = None
        if tz in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00", "Universal", "Zulu"):
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        # Non-UTC fallback — timezone-FREE conversion: wall-clock field
        # arithmetic, never a cast through the session zone (a cast would
        # shift the instant by the session offset and hit DST ambiguity;
        # to_utc_timestamp composes with the implicit cast and
        # double-shifts).
        us = (
            (
                F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01")).cast("long") * 86400
                + F.hour("ts").cast("long") * 3600
                + F.minute("ts").cast("long") * 60
            )
            * 1_000_000
            + (F.expr("extract(second from ts)") * 1_000_000).cast("long")
        )
        return df.withColumn("ts", F.timestamp_micros(us))
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
        return normalize_event_ts(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so queries can use spark.sql."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
