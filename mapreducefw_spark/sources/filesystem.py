"""Filesystem-listing source — the reference Search client's input shape.

The reference's Map scans directories with opendir/readdir and emits
(dir, entry) pairs, skipping '.'/'..' (``SearchMRC.cpp:46-75``). Here the
listing is a catalog operation on the driver (as any external-catalog scan
is) that yields a DataFrame; the search itself is then a declarative
filter+sort that Catalyst pushes down — the filter-after-shuffle the
reference does in Reduce (``SearchMRC.cpp:87``) becomes a pre-shuffle
predicate for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FS_SCHEMA = "dir_path string, file_name string"


def list_directories(spark: SparkSession, paths: list[str]) -> DataFrame:
    """One row per (directory, entry); non-directories silently skipped,
    '.'/'..' excluded — exact Search-client semantics."""
    rows = []
    for p in paths:
        if not os.path.isdir(p):
            continue
        for entry in os.listdir(p):  # os.listdir already excludes . and ..
            rows.append((p, entry))
    return spark.createDataFrame(rows, schema=FS_SCHEMA)


def search(spark: SparkSession, substring: str, paths: list[str]) -> DataFrame:
    """The full Search workload (``Search.cpp:17-50``): filenames containing
    substring, globally sorted, duplicates preserved, NULL payload column."""
    listing = list_directories(spark, paths)
    return (
        listing.filter(F.col("file_name").contains(substring))
        .select(F.col("file_name").alias("key"), F.lit(None).cast("string").alias("value"))
        .orderBy("key")
    )
