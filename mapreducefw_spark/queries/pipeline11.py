"""Eleventh batch (round 5, continued session): modern Spark 4 surface.

- ``events_props_variant`` — the VARIANT type path for semi-structured
  data: ``try_parse_json`` once into Spark's shredded binary variant
  encoding, then typed ``try_variant_get`` extraction. At 100 TB this is
  the replacement for repeated per-expression string JSON parsing
  (``get_json_object`` re-parses the string for every extraction;
  variant parses once and field access is binary navigation).
- ``python_datasource_squares`` — a query over the custom Python
  DataSource (sources/python_datasource.py): proves the user-defined
  source wiring end-to-end against a DuckDB ``generate_series`` oracle,
  with PARTITIONED executor-side reads.

Semantic contract: the reference's user-defined input stream
(``/root/reference/SearchMRC.cpp:46-98``) and shuffle-group-reduce
(``MRFCore.cpp:252-446``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t

DS_N = 10_000
DS_PARTS = 8


@register(
    "events_props_variant",
    oracle=r"""
WITH k AS (
  SELECT event_type,
         -- regexp_full_match guard: DuckDB's string->int cast ROUNDS
         -- '1.5' to 2, Spark's strict parse NULLs it; only integral
         -- strings may cast
         -- TRIM: Spark's try_cast(string->long) trims, so a quoted
         -- padded '{"k": " 7"}' is 7 on the variant path; DuckDB's CAST
         -- trims too, only the full-match guard needed the TRIM
         CASE WHEN json_valid(props)
               AND regexp_full_match(
                     TRIM(COALESCE(json_extract_string(props, '$.k'), '')), '-?\d+')
              THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k
  FROM events
)
SELECT event_type,
       COUNT(k) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k
FROM k
GROUP BY event_type
ORDER BY event_type
""",
)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the props JSON via the Spark 4 VARIANT type:
    parse once (``try_parse_json`` -> binary variant), extract with
    ``try_variant_get`` — NULL-safe on malformed JSON, missing keys and
    non-integral values on both engines (json_valid guard + strict
    string-to-int parse in the oracle). The older string-path
    twin is ``json_extract_events`` (get_json_object); this is the
    parse-once scale form."""
    ev = t(spark, sf_dir, "events")
    # extract as STRING then strict-parse to long: try_variant_get's
    # direct bigint coerces 1.5 -> 1 while DuckDB's CAST rounds -> 2; the
    # string route makes non-integral k NULL identically on both sides
    k = F.try_variant_get(F.try_parse_json("props"), "$.k", "string").try_cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "python_datasource_squares",
    oracle=f"""
SELECT CAST(x % 7 AS BIGINT) AS bucket,
       COUNT(*) AS n,
       CAST(SUM(CAST(x AS BIGINT) * x) AS BIGINT) AS sum_sq
FROM generate_series(0, {DS_N - 1}) t(x)
GROUP BY 1
ORDER BY bucket
""",
)
def python_datasource_squares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over the custom Python DataSource: each of the
    {DS_PARTS} InputPartitions is read as its own executor task (no
    driver-side materialization), then a normal shuffle aggregate on top —
    user-defined sources compose with the engine like any scan."""
    from mapreducefw_spark.sources import python_datasource

    python_datasource.register(spark)
    df = (
        spark.read.format("squares")
        .option("n", str(DS_N))
        .option("partitions", str(DS_PARTS))
        .load()
    )
    return (
        df.select((F.col("id") % 7).alias("bucket"), "square")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("square").alias("sum_sq"))
        .orderBy("bucket")
    )
