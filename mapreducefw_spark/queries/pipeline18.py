"""Round-7 batch 3: remaining modern-Spark scalar surface — XML
struct serialization, engine-native PII masking, and the 3.5-generation
array mutators.

Semantic contract with the reference engine: still the one job shape
(`/root/reference/MapReduceClient.h:47-51`, `MRFCore.cpp:252-446`); these
rows extend the scalar-function breadth of SURVEY §2B.

Scale posture: all three are map-only scans (plus the lineitem
collect_list build in the array query, one keyed shuffle) — no joins, no
windows; expressions stay in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t


@register(
    "xml_roundtrip",
    oracle="""
SELECT event_id,
       event_type AS t_back,
       TRY_CAST(regexp_extract(props, '"k": ?"? *(-?\\d+) *"?\\s*[,}]', 1) AS INT) AS k_back
FROM events
WHERE event_id < 300
ORDER BY event_id
""",
)
def xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 XML surface: struct -> to_xml -> from_xml must be the
    identity on the carried values (including XML entity escaping of
    quotes/ampersands in event_type and NULL-field omission). The oracle
    never sees the XML text — it just restates the inputs, so the check is
    exactly 'the roundtrip lost nothing'. k uses the same
    get_json_object+try_cast contract (and the same optionally-quoted
    oracle regexp) as json_extract_events. Map-only scan."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    k = F.get_json_object("props", "$.k").try_cast("int")
    xml = F.to_xml(F.struct(F.col("event_type").alias("t"), k.alias("k")))
    back = F.from_xml(xml, "t string, k int")
    return ev.select(
        "event_id",
        back["t"].alias("t_back"),
        back["k"].alias("k_back"),
    ).orderBy("event_id")


@register(
    "mask_pii_columns",
    oracle="""
SELECT c_custkey,
       regexp_replace(regexp_replace(regexp_replace(c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS name_masked,
       regexp_replace(regexp_replace(regexp_replace(c_mktsegment, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS segment_masked,
       regexp_replace(regexp_replace(regexp_replace(c_name, '[A-Z]', '#', 'g'), '[a-z]', '#', 'g'), '[0-9]', '#', 'g') AS name_redacted
FROM customer
WHERE c_custkey < 300
ORDER BY c_custkey
""",
)
def mask_pii_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-native PII masking (Spark 3.4 ``mask``): upper -> X,
    lower -> x, digit -> n, punctuation preserved — format-preserving
    redaction that keeps phone/account SHAPES auditable without the
    values ('Customer#000000042' -> 'Xxxxxxxx#nnnnnnnnn'), the masking
    step of the pii_scrub tier done JVM-side instead of regex UDFs. The
    redacted variant maps every letter class to '#'. The oracle is the
    equivalent regexp_replace chain — deterministic by construction.
    Map-only scan."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    full = F.lit("#")
    return cust.select(
        "c_custkey",
        F.mask("c_name").alias("name_masked"),
        F.mask("c_mktsegment").alias("segment_masked"),
        F.mask("c_name", full, full, full).alias("name_redacted"),
    ).orderBy("c_custkey")


@register(
    "array_mutators_35",
    oracle="""
WITH per AS (
  SELECT l_orderkey, list_sort(list(l_partkey)) AS parts
  FROM lineitem WHERE l_orderkey < 200 AND l_partkey IS NOT NULL
  GROUP BY l_orderkey
),
with_null AS (
  SELECT l_orderkey, list_prepend(NULL, parts) AS dirty, parts FROM per
)
SELECT l_orderkey,
       len(dirty) AS n_dirty,
       array_to_string(list_filter(dirty, v -> v IS NOT NULL), ',') AS compacted,
       CAST(list_prepend(0, parts)[1] AS BIGINT) AS prepended_first,
       CAST(list_append(parts, 999999)[len(parts) + 1] AS BIGINT) AS appended_last,
       CAST(COALESCE(list_position(parts, parts[1]), 0) AS BIGINT) AS pos_of_min,
       COALESCE(array_to_string(list_filter(parts, v -> v <> parts[len(parts)]), ','), '') AS max_removed
FROM with_null
ORDER BY l_orderkey
""",
)
def array_mutators_35(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 3.5 array-mutator family over per-order part lists:
    array_compact (NULL scrub — the dirty array gets a NULL prepended
    first so there is something to scrub), array_prepend/array_append,
    array_position (1-based; Spark returns 0 when absent, so the oracle
    COALESCEs DuckDB's NULL to 0), array_remove (drop the max element —
    applied to the compacted array because array_remove keeps NULL
    elements while DuckDB's <> filter drops them; and the oracle
    COALESCEs the empty-list case because DuckDB's array_to_string([]) is
    NULL where Spark's array_join([]) is ''). Output flattens to joined
    strings; one keyed collect_list shuffle, then map-only."""
    # NULL partkeys are excluded on BOTH sides before grouping: Spark's
    # collect_list silently drops NULLs while DuckDB's list() keeps them
    # (edge-fixture find), and an all-NULL group would leave an empty
    # array whose element_at(0) errors
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_orderkey") < 200) & F.col("l_partkey").isNotNull()
    )
    per = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_partkey")).alias("parts")
    )
    dirty = F.array_prepend(F.col("parts"), F.lit(None).cast("bigint"))
    last = F.element_at(F.col("parts"), F.size("parts"))
    return per.select(
        "l_orderkey",
        F.size(dirty).alias("n_dirty"),
        F.array_join(F.array_compact(dirty), ",").alias("compacted"),
        F.element_at(F.array_prepend(F.col("parts"), F.lit(0).cast("bigint")), 1)
        .cast("bigint")
        .alias("prepended_first"),
        F.element_at(
            F.array_append(F.col("parts"), F.lit(999999).cast("bigint")),
            F.size("parts") + 1,
        )
        .cast("bigint")
        .alias("appended_last"),
        F.array_position(F.col("parts"), F.element_at(F.col("parts"), 1))
        .cast("bigint")
        .alias("pos_of_min"),
        F.array_join(F.array_remove(F.col("parts"), last), ",").alias("max_removed"),
    ).orderBy("l_orderkey")


@register(
    "regexp_functions_35",
    oracle="""
SELECT event_id,
       CAST(len(regexp_extract_all(COALESCE(props, ''), '[0-9]+')) AS INT) AS n_digit_runs,
       COALESCE(array_to_string(regexp_extract_all(COALESCE(props, ''), '([0-9]+)', 1), ','), '') AS digit_runs,
       NULLIF(regexp_extract(COALESCE(props, ''), '[0-9]+'), '') AS first_run,
       CAST(CASE WHEN regexp_matches(COALESCE(props, ''), '[0-9]+')
                 THEN position(regexp_extract(COALESCE(props, ''), '[0-9]+') IN COALESCE(props, ''))
                 ELSE 0 END AS INT) AS first_pos
FROM events
WHERE event_id < 500
ORDER BY event_id
""",
)
def regexp_functions_35(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 3.5 regexp family over the props JSON text: regexp_count,
    regexp_extract_all, regexp_substr, regexp_instr. DuckDB twins need two
    guards the docwriter should know: regexp_extract returns '' (not NULL)
    on no match — NULLIF aligns it with regexp_substr's NULL — and there
    is no regexp_instr, but position(first_match IN s) is exact for this
    pattern class because the leftmost match of a digit run cannot have an
    earlier occurrence of itself (any earlier copy would itself contain an
    earlier digit). NULL props COALESCE to '' so counts are 0, not NULL,
    and the joined run list COALESCEs the zero-match case (DuckDB
    array_to_string([]) is NULL where Spark array_join([]) is '' — the
    same trap the array_mutators_35 oracle pins). Map-only scan."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    s = F.coalesce(F.col("props"), F.lit(""))
    pat = F.lit("[0-9]+")
    return ev.select(
        "event_id",
        F.regexp_count(s, pat).alias("n_digit_runs"),
        F.array_join(F.regexp_extract_all(s, F.lit("([0-9]+)"), 1), ",").alias(
            "digit_runs"
        ),
        F.regexp_substr(s, pat).alias("first_run"),
        F.regexp_instr(s, pat).alias("first_pos"),
    ).orderBy("event_id")


@register(
    "bit_aggregates",
    oracle="""
SELECT l_orderkey,
       CAST(bit_and(l_linenumber) AS INT) AS lines_and,
       CAST(bit_or(l_linenumber) AS INT) AS lines_or,
       CAST(bit_xor(l_linenumber) AS INT) AS lines_xor,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_orderkey < 400
GROUP BY l_orderkey
ORDER BY l_orderkey
""",
)
def bit_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate surface (bit_and/bit_or/bit_xor) over line numbers
    per order — the flag-mask combine pattern (e.g. OR-ing permission or
    feature bitmasks per entity) that would otherwise need a custom UDAF.
    Exact integer semantics on both engines; map-side combinable like any
    algebraic aggregate. One keyed shuffle of int partials."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 400)
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.bit_and("l_linenumber").cast("int").alias("lines_and"),
            F.bit_or("l_linenumber").cast("int").alias("lines_or"),
            F.bit_xor("l_linenumber").cast("int").alias("lines_xor"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("l_orderkey")
    )
