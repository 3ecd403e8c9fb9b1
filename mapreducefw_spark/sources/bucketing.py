"""Bucketed table layout: pre-shuffled storage so co-located joins and
aggregations elide their exchanges entirely (r11 verdict order #9).

``bucketBy`` writes hash-partition the data into a fixed number of bucket
files per partition AT WRITE TIME and record the layout in the catalog;
a later equi-join (or groupBy) on the bucket columns finds both sides
already distributed by the join key, so the sort-merge join plans with
ZERO Exchange nodes — at 100 TB that's the difference between re-shuffling
the fact table on every query and never shuffling it again. ``sortBy``
additionally pre-sorts within buckets, eliding the SMJ's Sort too.

The layout is the DataFrame-API equivalent of Hive bucketing; Spark reads
it back whenever ``spark.sql.sources.bucketing.enabled`` (default true)
and plans bucket-local scans when the bucket counts are equal (or one
divides the other with bucketing.autoBucketedScan). The demo/pin lives in
tests/test_bucketing.py: bucketed-bucketed join -> 0 exchanges,
bucketed-plain join -> exactly one exchange (the plain side only).

Scale guidance: pick n_buckets so one bucket of the LARGER table fits an
executor task comfortably (~128-512 MB compressed); both sides of a
recurring join should use the SAME bucket count and key order. Bucketing
pays one shuffle at write time and amortizes it over every later query —
the right trade for dimension/fact layouts queried repeatedly, wrong for
write-once-read-once staging data.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    n_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Save ``df`` as a managed bucketed table (bucket layout requires
    saveAsTable — plain .save() paths cannot record bucket metadata)."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if not bucket_cols:
        raise ValueError("bucket_cols must be non-empty")
    if mode == "overwrite":
        # the session catalog (in-memory) forgets tables between sessions
        # while their warehouse locations persist; saveAsTable then fails
        # with LOCATION_ALREADY_EXISTS. Overwrite means overwrite: drop
        # the stale catalog entry AND the orphaned default-db location.
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        if "." not in table:
            loc = Path(spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")) / table
            if loc.exists():
                shutil.rmtree(loc)
    if sort_cols:
        # Spark trusts sortBy ONLY when each bucket is a single file (a
        # bucket split across files is sorted per-file, not per-bucket,
        # so the reader must re-Sort and the layout's point is lost).
        # Writers emit one file per (task, bucket), so align tasks with
        # buckets first — one extra write-time shuffle, amortized over
        # every later sort-merge join that skips its Sort.
        df = df.repartition(n_buckets, *bucket_cols)
    writer = df.write.format(fmt).mode(mode).bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def n_exchanges(df: DataFrame) -> int:
    """Count Exchange operators in the (pre-AQE-finalization) physical
    plan — the assertion surface for shuffle-elision pins."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


def drop_bucketed(spark: SparkSession, *tables: str) -> None:
    for tbl in tables:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
