"""Round-8 batch 8: SQL pipe syntax, temporal point-in-time join,
oracle-paired connected components, script-mixing audit, user growth
curve, PSI drift.

The headline item is `simhash_cluster_assignment`: connected components
were rows-only (`dedup_connected_groups` — iterative min-label
propagation has no single-statement SQL twin at scale); on a BOUNDED
subgraph the DuckDB twin is a recursive-CTE transitive closure, so the
whole fixpoint (operators/dedup.py:429) is differentially checked.

Semantic contract with the reference engine: every query is the
map -> shuffle-by-key -> reduce -> sort job shape
(`/root/reference/MapReduceClient.h:47-51`, `MRFCore.cpp:252-446`).

Scale posture:
- the point-in-time join rides the custkey EQUI-join (the range predicate
  is a carried filter, never a range-only join); version fan-out is a
  fixed 3x explode of the dimension, not the fact.
- connected components: Spark runs min-label propagation (O(diameter)
  rounds of edge-sized equi-joins — the production shape); the O(closure)
  recursive CTE lives ONLY in the oracle, and the query input is an
  id-bounded subgraph so the oracle cost is fixed at any sf.
- growth curve / PSI / script-mixing are map-combined count partials over
  day/bin/source grids.
- determinism: counts BIGINT; PSI's ln terms sum over O(bins); the
  growth-curve cumsum is exact integers on the day grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import dec, t


@register(
    "sql_pipe_syntax",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM orders
WHERE o_orderstatus <> 'F'
GROUP BY o_orderpriority
ORDER BY o_orderpriority NULLS LAST
""",
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (|>), new in Spark 4 — the FROM-first composable
    form (GoogleSQL pipe operators) of a filter+aggregate+sort, checked
    against the classic-SQL oracle: same plan semantics, different
    surface. Decimal-exact revenue; NULL priority pinned LAST."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_pipe")
    return spark.sql(
        """
FROM orders_pipe
|> WHERE o_orderstatus <> 'F'
|> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
   GROUP BY o_orderpriority
|> ORDER BY o_orderpriority ASC NULLS LAST
"""
    )


@register(
    "scd2_point_in_time_join",
    oracle="""
WITH dim AS (
  SELECT c_custkey, v,
         CASE v WHEN 0 THEN DATE '1990-01-01'
                WHEN 1 THEN DATE '1996-01-01' + INTERVAL (c_custkey % 200) DAY
                ELSE DATE '1997-06-01' + INTERVAL (c_custkey % 300) DAY END AS valid_from,
         CASE v WHEN 0 THEN DATE '1996-01-01' + INTERVAL (c_custkey % 200) DAY
                WHEN 1 THEN DATE '1997-06-01' + INTERVAL (c_custkey % 300) DAY
                ELSE DATE '2999-01-01' END AS valid_to
  FROM customer CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS v)
  WHERE c_custkey IS NOT NULL
)
SELECT dim.v AS version,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM orders o
JOIN dim ON dim.c_custkey = o.o_custkey
        AND CAST(o.o_orderdate AS DATE) >= dim.valid_from
        AND CAST(o.o_orderdate AS DATE) < dim.valid_to
WHERE o.o_orderdate IS NOT NULL
GROUP BY dim.v
ORDER BY dim.v
""",
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (AS OF) join against an SCD2 dimension: each order
    matched to the dimension VERSION whose [valid_from, valid_to) range
    covers its order date — the temporal-join every warehouse runs
    against slowly-changing dimensions (the lookup complement to
    scd2_merge_emulation, which builds the versions). The version table
    is synthesized deterministically (3 versions per customer, break
    dates keyed on custkey so both engines build identical ranges, which
    partition time — exactly one match per order). The join is the
    custkey EQUI-join with the range check as a carried predicate: no
    range-only join, broadcast-able dimension, fact scanned once."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_custkey").isNotNull())
    v = F.col("v")
    # Table-independent 3-row version spine (spark.range, matching the
    # oracle's UNNEST([0,1,2])) — deriving it from an unrelated table
    # (e.g. region.limit(1)) would silently empty the result whenever
    # that table is empty while the oracle still returns 3 versions.
    dim = cust.select("c_custkey").join(
        F.broadcast(spark.range(3).select(F.col("id").cast("int").alias("v")))
    )
    f1 = F.date_add(F.lit("1996-01-01").cast("date"), (F.col("c_custkey") % 200).cast("int"))
    f2 = F.date_add(F.lit("1997-06-01").cast("date"), (F.col("c_custkey") % 300).cast("int"))
    dim = dim.select(
        "c_custkey",
        "v",
        F.when(v == 0, F.lit("1990-01-01").cast("date"))
        .when(v == 1, f1)
        .otherwise(f2)
        .alias("valid_from"),
        F.when(v == 0, f1).when(v == 1, f2).otherwise(F.lit("2999-01-01").cast("date")).alias(
            "valid_to"
        ),
    )
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    d = F.to_date("o_orderdate")
    return (
        o.join(
            F.broadcast(dim),
            (dim.c_custkey == o.o_custkey) & (d >= dim.valid_from) & (d < dim.valid_to),
        )
        .groupBy(F.col("v").alias("version"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
        )
        .orderBy("version")
    )


@register(
    "simhash_cluster_assignment",
    oracle="""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE text IS NOT NULL AND doc_id < 400
),
tok AS (
  SELECT DISTINCT doc_id, token
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM corpus)
  WHERE token <> ''
),
th AS (
  SELECT doc_id, CAST(('0x' || substr(md5(token), 1, 12)) AS BIGINT) AS h
  FROM tok
),
votes AS (
  SELECT doc_id, b,
         CAST(SUM((h >> b) & 1) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM th CROSS JOIN (SELECT UNNEST(range(48)) AS b)
  GROUP BY doc_id, b
),
sigs AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s * 2 > n THEN (CAST(1 AS BIGINT) << b)
                       ELSE 0 END) AS BIGINT) AS sig
  FROM votes GROUP BY doc_id
),
edges AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.sig, b.sig)) <= 3
),
undirected AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
labels AS (
  SELECT node, MIN(lbl) AS cluster_id
  FROM (WITH RECURSIVE closure(node, lbl) AS (
          SELECT doc_id, doc_id FROM sigs
          UNION
          SELECT u.dst, c.lbl
          FROM closure c JOIN undirected u ON u.src = c.node
        ) SELECT node, lbl FROM closure)
  GROUP BY node
)
SELECT cluster_id,
       CAST(COUNT(*) AS BIGINT) AS cluster_size
FROM labels
GROUP BY cluster_id
ORDER BY cluster_id
""",
)
def simhash_cluster_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the SimHash near-duplicate graph
    (hamming <= 3 on the portable 48-bit signature), as (cluster_id =
    min reachable doc_id, cluster_size) — the dedup-cluster step after
    pair generation, and the first ORACLE-PAIRED components query (the
    general `dedup_connected_groups` stays rows-only because its input
    pairs come from engine-specific MinHash). Spark runs the production
    fixpoint — iterative min-label propagation, O(graph diameter) rounds
    of edge-sized equi-joins (`operators/dedup.py:429`); the oracle is a
    recursive-CTE TRANSITIVE CLOSURE, correct but O(component²), which
    is why the query input is the id-bounded doc_id < 400 subgraph
    (fixed oracle cost at any sf — the explode_posexplode idiom).
    Equality proves the iterative fixpoint equals the closure's min
    label on every node."""
    from mapreducefw_spark.operators.dedup import dedup_groups, portable_simhash_signatures

    d = t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.col("doc_id") < 400)
    )
    sigs = portable_simhash_signatures(d)
    a, b2 = sigs.alias("a"), sigs.alias("b")
    pairs = (
        a.join(F.broadcast(b2), F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))) <= 3)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    # isolated docs are their own cluster: seed the label table with every
    # node, then let propagation pull connected ones down to the min id
    groups = dedup_groups(pairs)
    all_nodes = sigs.select(F.col("doc_id").alias("doc"))
    labels = (
        all_nodes.join(groups, "doc", "left")
        .select("doc", F.coalesce("group_id", F.col("doc")).alias("cluster_id"))
    )
    return (
        labels.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cluster_size"))
        .orderBy("cluster_id")
    )


@register(
    "script_mixing_report",
    oracle="""
WITH per_doc AS (
  SELECT source,
         len(regexp_extract_all(text, '[A-Za-z]')) AS latin,
         len(regexp_extract_all(text, '[^\\x00-\\x7F]')) AS nonascii
  FROM documents WHERE text IS NOT NULL
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN latin > 0 AND nonascii > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_mixed,
       CAST(SUM(latin) AS BIGINT) AS latin_chars,
       CAST(SUM(nonascii) AS BIGINT) AS nonascii_chars,
       ROUND(CAST(SUM(CASE WHEN latin > 0 AND nonascii > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS mixed_rate
FROM per_doc
GROUP BY source
ORDER BY source NULLS LAST
""",
)
def script_mixing_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Script-mixing audit per source: documents containing BOTH Latin
    letters and non-ASCII characters — the cheap signal for boilerplate
    wrappers around CJK content, mojibake, and wrongly-language-tagged
    docs that a multilingual corpus pipeline screens before training.
    Pure map-side regexp occurrence counts (Java and RE2 agree on the
    explicit \\x00-\\x7F class; no shorthand classes whose unicode
    semantics differ) — only 4 BIGINT partials per source shuffle."""
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    latin = F.regexp_count("text", F.lit(r"[A-Za-z]"))
    nonascii = F.regexp_count("text", F.lit(r"[^\x00-\x7F]"))
    per = d.select("source", latin.alias("latin"), nonascii.alias("nonascii"))
    mixed = F.when((F.col("latin") > 0) & (F.col("nonascii") > 0), 1).otherwise(0)
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(mixed).cast("bigint").alias("n_mixed"),
            F.sum("latin").cast("bigint").alias("latin_chars"),
            F.sum("nonascii").cast("bigint").alias("nonascii_chars"),
        )
        .select(
            "source",
            "n_docs",
            "n_mixed",
            "latin_chars",
            "nonascii_chars",
            F.round(F.col("n_mixed").cast("double") / F.col("n_docs"), 6).alias(
                "mixed_rate"
            ),
        )
        .orderBy(F.asc_nulls_last("source"))
    )


@register(
    "user_growth_curve",
    oracle="""
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY user_id
),
per_day AS (
  SELECT d0 AS d, CAST(COUNT(*) AS BIGINT) AS new_users FROM first_seen GROUP BY d0
)
SELECT d AS day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY d) AS BIGINT) AS cumulative_users
FROM per_day
ORDER BY d
""",
)
def user_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-distinct-user growth curve: new users per day (first-
    seen date) + running total — the exact form of the classic growth
    chart, computed WITHOUT a cumulative-distinct window over raw events
    (count-distinct-to-date is first-seen + prefix sum, an identity that
    turns an unbounded-frame distinct into one user-keyed min exchange
    plus an O(days) integer cumsum on the day grid). All-BIGINT."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    first_seen = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    per_day = first_seen.groupBy(F.col("d0").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("new_users")
    )
    return per_day.select(
        F.col("d").alias("day"),
        "new_users",
        F.sum("new_users").over(W.orderBy("d")).cast("bigint").alias("cumulative_users"),
    ).orderBy("day")


@register(
    "psi_length_drift",
    oracle="""
WITH binned AS (
  SELECT doc_id % 2 AS snap, length(bin(n_chars)) - 1 AS b
  FROM documents WHERE n_chars IS NOT NULL AND n_chars >= 1
),
counts AS (
  SELECT b,
         CAST(SUM(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM binned GROUP BY b
),
tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS ta, CAST(SUM(cb) AS BIGINT) AS tb FROM counts),
terms AS (
  SELECT b,
         (CAST(ca AS DOUBLE) + 1) / (ta + (SELECT COUNT(*) FROM counts)) AS pa,
         (CAST(cb AS DOUBLE) + 1) / (tb + (SELECT COUNT(*) FROM counts)) AS pb
  FROM counts CROSS JOIN tot
)
SELECT CAST((SELECT ta FROM tot) AS BIGINT) AS n_a,
       CAST((SELECT tb FROM tot) AS BIGINT) AS n_b,
       CAST(COUNT(*) AS BIGINT) AS n_bins,
       ROUND(SUM((pa - pb) * LN(pa / pb)), 6) AS psi
FROM terms
""",
)
def psi_length_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two corpus snapshots (the
    deterministic doc_id parity split) over log2 length bins — THE drift
    KPI risk teams page on (PSI > 0.2 = major shift), complementing
    KS/JSD with the banded form auditors expect. Bins are the integer
    binary-string-length bins of histogram_log_bins; distributions are
    add-1 smoothed over the observed-bin set so empty cells contribute
    finite terms identically on both engines. One map-combined (snap,
    bin) count shuffle; the ln sum runs over O(bins) terms."""
    d = t(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull() & (F.col("n_chars") >= 1)
    )
    binned = d.select(
        (F.col("doc_id") % 2).alias("snap"),
        (F.length(F.conv(F.col("n_chars").cast("string"), 10, 2)) - 1).alias("b"),
    )
    counts = binned.groupBy("b").agg(
        F.sum(F.when(F.col("snap") == 0, 1).otherwise(0)).cast("bigint").alias("ca"),
        F.sum(F.when(F.col("snap") == 1, 1).otherwise(0)).cast("bigint").alias("cb"),
    )
    tot = counts.agg(
        F.sum("ca").cast("bigint").alias("ta"),
        F.sum("cb").cast("bigint").alias("tb"),
        F.count(F.lit(1)).cast("bigint").alias("nb"),
    )
    j = counts.join(F.broadcast(tot))
    pa = (F.col("ca").cast("double") + 1) / (F.col("ta") + F.col("nb"))
    pb = (F.col("cb").cast("double") + 1) / (F.col("tb") + F.col("nb"))
    return j.agg(
        F.max("ta").cast("bigint").alias("n_a"),
        F.max("tb").cast("bigint").alias("n_b"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.round(F.sum((pa - pb) * F.log(pa / pb)), 6).alias("psi"),
    )
