"""Third batch: remaining §2B rows — right outer join, INTERSECT ALL,
map-typed columns, from_json struct parsing, and the Pandas-UDF surface
(vectorized scalar UDF + GROUPED_AGG UDAF)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import dec, t


@register(
    "join_right_outer_parts",
    oracle="""
SELECT p_partkey, COUNT(l_orderkey) AS n_lines
FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey
GROUP BY p_partkey
ORDER BY p_partkey
""",
)
def join_right_outer_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    return (
        li.join(part, li.l_partkey == part.p_partkey, "right")
        .groupBy("p_partkey")
        .agg(F.count("l_orderkey").alias("n_lines"))
        .orderBy("p_partkey")
    )


@register(
    "intersect_all_quantities",
    oracle="""
SELECT l_quantity FROM lineitem WHERE l_returnflag = 'A'
INTERSECT ALL
SELECT l_quantity FROM lineitem WHERE l_returnflag = 'R'
ORDER BY l_quantity
""",
)
def intersect_all_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select("l_quantity")
    r = li.filter(F.col("l_returnflag") == "R").select("l_quantity")
    return a.intersectAll(r).orderBy("l_quantity")


@register(
    "map_column_functions",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def map_column_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a map column (map_from_entries), consume it via element_at /
    map_keys — the MapType surface; output reduced to plain columns so the
    oracle stays engine-neutral."""
    orders = t(spark, sf_dir, "orders")
    # NULL priority -> sentinel key: Spark forbids NULL MAP KEYS
    # ([NULL_MAP_KEY] runtime crash, found by the TPC-H NULL edge suite);
    # the sentinel keeps the row in the total while staying out of the
    # urgent lookup, matching the oracle's COUNT(*) / IN-list semantics
    per_status = orders.groupBy(
        "o_orderstatus",
        F.coalesce("o_orderpriority", F.lit("(none)")).alias("o_orderpriority"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    as_map = per_status.groupBy("o_orderstatus").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("o_orderpriority", "cnt")))
        ).alias("prio_counts")
    )
    urgent = F.coalesce(F.element_at("prio_counts", "1-URGENT"), F.lit(0)) + F.coalesce(
        F.element_at("prio_counts", "2-HIGH"), F.lit(0)
    )
    total = F.aggregate(
        F.map_values("prio_counts"), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return as_map.select(
        "o_orderstatus",
        total.alias("n"),
        urgent.cast("bigint").alias("n_urgent"),
    ).orderBy("o_orderstatus")


@register(
    "from_json_struct",
    oracle="""
SELECT event_id,
       TRY_CAST(regexp_extract(props, '"k": ?(-?\\d+)\\s*[,}]', 1) AS INT) AS k,
       TRY_CAST(regexp_extract(props, '"k": ?(-?\\d+)\\s*[,}]', 1) AS INT) % 10 AS k_mod
FROM events
WHERE event_id < 500
ORDER BY event_id
""",
)
def from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-full JSON parsing: from_json into a typed struct, then field
    access — the production path (get_json_object re-parses per call).
    TRY_CAST oracle-side: malformed/keyless props regexp-extract to ''
    and must become NULL like from_json does, not a conversion error; the
    regexp anchors on a following , or } so the integer PREFIX of a
    non-integral number (1.5) is NOT matched — from_json('k int') yields
    NULL there. Unlike the get_json_object paths (json_extract_events,
    to_json_roundtrip), from_json's typed parse REJECTS a quoted integral
    ('{"k": "7"}' -> NULL), so this oracle's regexp deliberately stays
    unquoted-only (fixture-pinned in tests/test_oracle_nulls_events.py)."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    parsed = ev.select("event_id", F.from_json("props", "k int").alias("p"))
    return parsed.select(
        "event_id", F.col("p.k").alias("k"), (F.col("p.k") % 10).alias("k_mod")
    ).orderBy("event_id")


@register(
    "pandas_scalar_udf_margin",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS gross
FROM lineitem
WHERE l_orderkey < 200
ORDER BY l_orderkey, l_linenumber
""",
)
def pandas_scalar_udf_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas_udf (Arrow batches) — the sanctioned Python
    escape hatch; numpy arithmetic matches the engines' double math exactly."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def gross(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        # raw IEEE double product, same operation order as the oracle SQL --
        # bit-identical across engines (rounding would differ: numpy rounds
        # half-even, DuckDB half-away)
        return price * (1 - disc) * (1 + tax)

    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        gross("l_extendedprice", "l_discount", "l_tax").alias("gross"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "pandas_udaf_geomean",
    oracle="""
SELECT c_mktsegment,
       ROUND(EXP(AVG(LN(c_acctbal))), 4) AS geomean_bal
FROM customer
WHERE c_acctbal > 0
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def pandas_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF (UDAF surface): geometric mean per segment.
    numpy log/exp and the engines' ln/exp agree on this data at 4 decimals."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        return float(np.round(np.exp(np.log(v.to_numpy()).mean()), 4))

    cust = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    return (
        cust.groupBy("c_mktsegment")
        .agg(geomean("c_acctbal").alias("geomean_bal"))
        .orderBy("c_mktsegment")
    )
