"""Sixth batch: second-tier scalar functions (pad/trim/translate/regex-count,
null-handling combinators), higher-order map functions, JSON serialization
round-trip, and global (un-partitioned) windows."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t


@register(
    "string_functions_2",
    oracle="""
SELECT p_partkey,
       LPAD(p_brand, 12, '.') AS padded,
       RPAD(p_type, 10, '_') AS rpadded,
       TRIM('  ' || p_name || ' ') AS trimmed,
       translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
       LENGTH(regexp_replace(p_name, '[aeiou]', '', 'g')) AS n_consonant_chars,
       CASE WHEN p_name LIKE '%e%' THEN regexp_extract(p_name, 'e(.)', 1) END AS after_e,
       REVERSE(p_brand) AS rev_brand,
       REPEAT(p_brand[1:1], 3) AS tripled_initial
FROM part
WHERE p_partkey < 300
ORDER BY p_partkey
""",
)
def string_functions_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    return part.select(
        "p_partkey",
        F.lpad("p_brand", 12, ".").alias("padded"),
        F.rpad("p_type", 10, "_").alias("rpadded"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.translate("p_name", "aeiou", "AEIOU").alias("vowels_up"),
        F.length(F.regexp_replace("p_name", "[aeiou]", "")).alias("n_consonant_chars"),
        F.when(
            F.col("p_name").contains("e"), F.regexp_extract("p_name", "e(.)", 1)
        ).alias("after_e"),
        F.reverse("p_brand").alias("rev_brand"),
        F.repeat(F.substring("p_brand", 1, 1), 3).alias("tripled_initial"),
    ).orderBy("p_partkey")


@register(
    "null_combinators",
    oracle="""
SELECT o_orderkey,
       NULLIF(o_orderstatus, 'O') AS status_or_null,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_label,
       CASE WHEN NULLIF(o_orderstatus, 'O') IS NULL THEN 0 ELSE o_totalprice END AS closed_price,
       GREATEST(o_totalprice, 30000.0) AS floor_30k,
       LEAST(o_totalprice, 60000.0) AS cap_60k
FROM orders
WHERE o_orderkey < 400
ORDER BY o_orderkey
""",
)
def null_combinators(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 400)
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return orders.select(
        "o_orderkey",
        status_or_null.alias("status_or_null"),
        F.coalesce(status_or_null, F.lit("open")).alias("status_label"),
        F.when(status_or_null.isNull(), F.lit(0.0)).otherwise(F.col("o_totalprice")).alias(
            "closed_price"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(30000.0)).alias("floor_30k"),
        F.least(F.col("o_totalprice"), F.lit(60000.0)).alias("cap_60k"),
    ).orderBy("o_orderkey")


@register(
    "map_higher_order",
    oracle="""
WITH per AS (
  SELECT c_nationkey, COALESCE(c_mktsegment, '(none)') AS c_mktsegment,
         COUNT(*) AS cnt
  FROM customer GROUP BY 1, 2
)
SELECT c_nationkey,
       array_to_string(list_sort(list(c_mktsegment || '=' || CAST(cnt * 2 AS VARCHAR))), ',') AS doubled_entries,
       COALESCE(array_to_string(list_sort(list(c_mktsegment) FILTER (WHERE cnt >= 3)), ','), '') AS big_segments
FROM per
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
)
def map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform_values / map_filter over a built map column; output is
    flattened to sorted 'k=v' strings so the oracle stays engine-neutral."""
    cust = t(spark, sf_dir, "customer")
    # NULL segment -> sentinel map key ([NULL_MAP_KEY] crash otherwise);
    # mirrored in the oracle so both sides carry the '(none)' entry
    per = cust.groupBy(
        "c_nationkey",
        F.coalesce("c_mktsegment", F.lit("(none)")).alias("c_mktsegment"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    as_map = per.groupBy("c_nationkey").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("c_mktsegment", "cnt")))
        ).alias("m")
    )
    doubled = F.transform_values(F.col("m"), lambda k, v: v * 2)
    big = F.map_filter(F.col("m"), lambda k, v: v >= 3)
    entries = lambda m: F.array_join(  # noqa: E731
        F.array_sort(
            F.transform(F.map_entries(m), lambda e: F.concat_ws("=", e["key"], e["value"]))
        ),
        ",",
    )
    return as_map.select(
        "c_nationkey",
        entries(doubled).alias("doubled_entries"),
        F.array_join(F.array_sort(F.map_keys(big)), ",").alias("big_segments"),
    ).orderBy("c_nationkey")


@register(
    "to_json_roundtrip",
    oracle="""
WITH x AS (
  SELECT event_id,
         -- escape like Spark's to_json does (backslash first, then quote)
         replace(replace(event_type, '\\', '\\\\'), '"', '\\"') AS event_type,
         -- integer must be FOLLOWED by , or } (a bare \\d+ would match the
         -- integer PREFIX of 1.5 where from_json/strict-int yields NULL)
         TRY_CAST(regexp_extract(props, '"k": ?"? *(-?\\d+) *"?\\s*[,}]', 1) AS INT) AS k
  FROM events WHERE event_id < 300
)
SELECT event_id,
       CASE WHEN event_type IS NOT NULL AND k IS NOT NULL
              THEN '{"t":"' || event_type || '","k":' || k || '}'
            WHEN event_type IS NOT NULL THEN '{"t":"' || event_type || '"}'
            WHEN k IS NOT NULL THEN '{"k":' || k || '}'
            ELSE '{}' END AS packed,
       k AS k_back
FROM x
ORDER BY event_id
""",
)
def to_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """struct -> to_json -> from_json round trip; the oracle builds the same
    canonical JSON text directly — including Spark's to_json contract of
    OMITTING null struct fields ('{}' when every field is null), which the
    oracle's CASE ladder mirrors; TRY_CAST turns keyless/malformed props
    into NULL k like get_json_object does. The regexp accepts an
    optionally-QUOTED integral ('{"k": "7"}' -> 7) because
    get_json_object unquotes + try_cast trims (ADVICE r6, same fix as
    json_extract_events)."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    packed = F.to_json(
        F.struct(
            F.col("event_type").alias("t"),
            # try_cast: a non-integral k ('{"k": 1.5}') must become NULL
            # like the oracle's anchored regexp, not an ANSI cast crash
            F.get_json_object("props", "$.k").try_cast("int").alias("k"),
        )
    )
    back = F.from_json(packed, "t string, k int")
    return ev.select(
        "event_id",
        packed.alias("packed"),
        back["k"].alias("k_back"),
    ).orderBy("event_id")


@register(
    "window_global_rank",
    oracle="""
SELECT s_suppkey, s_acctbal,
       RANK() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS global_rank,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) OVER (ORDER BY s_acctbal DESC, s_suppkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM supplier
ORDER BY global_rank
""",
)
def window_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Un-partitioned window (single-reducer by construction — acceptable for
    small dimensions; at 100 TB use ``window_global_rank_scalable`` below,
    the two-phase range-partitioned form of the same query)."""
    from mapreducefw_spark.queries._util import dec

    supp = t(spark, sf_dir, "supplier")
    w = W.orderBy(F.desc("s_acctbal"), "s_suppkey")
    running = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return supp.select(
        "s_suppkey",
        "s_acctbal",
        F.rank().over(w).alias("global_rank"),
        F.sum(dec("s_acctbal")).over(running).cast("double").alias("running_total"),
    ).orderBy("global_rank")


@register(
    "window_global_rank_scalable",
    oracle="""
SELECT s_suppkey, s_acctbal,
       RANK() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS global_rank,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) OVER (ORDER BY s_acctbal DESC, s_suppkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM supplier
ORDER BY global_rank
""",
)
def window_global_rank_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result as ``window_global_rank``, computed the way a 100 TB input
    demands: one range shuffle, per-partition windows keyed by partition id,
    broadcast offsets — no unpartitioned WindowExec in the plan (pinned in
    tests/test_plan_shapes.py)."""
    from mapreducefw_spark.operators.rank import global_rank_running
    from mapreducefw_spark.queries._util import dec

    supp = t(spark, sf_dir, "supplier")
    ranked = global_rank_running(
        supp,
        [F.desc("s_acctbal"), F.col("s_suppkey")],
        sum_col=dec("s_acctbal"),
    )
    return ranked.select(
        "s_suppkey",
        "s_acctbal",
        "global_rank",
        F.col("running_total").cast("double").alias("running_total"),
    ).orderBy("global_rank")
