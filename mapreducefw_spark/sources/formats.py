"""Format readers/writers beyond parquet (SURVEY §2B sources/sinks).

Explicit schemas everywhere — schema inference is a full extra pass at 100 TB
and non-deterministic under sampling. Delta/Iceberg/Hudi jars are not in this
image; their connectors are gated behind import-try stubs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(spark: SparkSession, path: str, schema: StructType | str, **options) -> DataFrame:
    return spark.read.options(header=True, **options).schema(schema).csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType | str, **options) -> DataFrame:
    return spark.read.options(**options).schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.text(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """Partitioned columnar sink — the 100 TB layout (partition pruning on
    read; one directory per partition value)."""
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


def read_xml(
    spark: SparkSession, path: str, schema: StructType | str, *, row_tag: str, **options
) -> DataFrame:
    """XML source (built into Spark 4 — no external package). rowTag picks the
    repeating element; explicit schema for the same reasons as csv/json."""
    return (
        spark.read.format("xml").options(rowTag=row_tag, **options).schema(schema).load(path)
    )


def write_xml(df: DataFrame, path: str, *, row_tag: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).format("xml").option("rowTag", row_tag).save(path)


def read_jdbc(spark: SparkSession, url: str, dbtable: str, **options) -> DataFrame:
    """JDBC source (requires the driver jar on the classpath — not in this
    image; kept for surface completeness, exercised only against real DBs).
    For scale: pass partitionColumn/lowerBound/upperBound/numPartitions so
    the read parallelizes instead of single-streaming the table."""
    return spark.read.format("jdbc").options(url=url, dbtable=dbtable, **options).load()


def avro_available(spark: SparkSession) -> bool:
    """spark-avro is a separate module; gate callers behind this check."""
    try:
        spark.read.format("avro")
        # format resolution is lazy; a probe load is needed to be sure, so
        # just report the package presence
        return any("avro" in j for j in spark.sparkContext._jsc.sc().listJars())
    except Exception:
        return False


def delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False
