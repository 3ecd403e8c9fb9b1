"""Eighth batch (round 5, continued session): record linkage, time-series
regularization, deterministic per-group sampling, corpus drift measurement,
and a scale-safe equi-depth histogram.

Each query is the Spark-first expression of an operator a 100 TB curation /
analytics stack needs but the earlier batches didn't cover:

- ``edit_distance_part_pairs`` — blocked Levenshtein similarity join
  (operators/linkage.py): record linkage without the O(n^2) cartesian.
- ``events_gap_fill_hourly`` — dense per-key time grid + forward fill
  (operators/resample.py): irregular events -> regular series.
- ``reservoir_sample_sources`` — deterministic k-per-group sample via
  hash-order row_number: the distributed, re-runnable equivalent of a
  per-group reservoir (same sample on every engine and every run).
- ``token_divergence_by_source`` — per-source KL divergence of the token
  distribution against the corpus: the drift / mixture-skew monitor that
  decides when a source's weight needs rebalancing.
- ``equi_depth_histogram`` — k-bucket equal-frequency histogram built on
  the two-phase global rank (operators/rank.py), so NO unpartitioned
  window appears in the plan (a bare NTILE would funnel every row through
  one task).

Semantic contract with the reference engine: all five are
shuffle-group-reduce with a global sort on the emitted key, the shape of
``/root/reference/MRFCore.cpp:252-446``; the blocking join is its
group-then-pair reduce specialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.operators.linkage import (
    blocked_levenshtein_pairs,
    deletion_neighborhood_pairs,
)
from mapreducefw_spark.operators.rank import global_rank_running
from mapreducefw_spark.operators.resample import gap_fill_ffill
from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import dec, t

EDIT_MAX_DIST = 2
RESERVOIR_K = 5
RESERVOIR_SALT = ":17"
TOP_TOKENS = 200
HIST_BUCKETS = 8


@register(
    "edit_distance_part_pairs",
    oracle=f"""
WITH s AS (
  SELECT p_partkey AS id, p_name AS txt,
         split_part(p_name, ' ', 2) AS blk, length(p_name) AS len
  FROM part WHERE p_name IS NOT NULL
)
SELECT a.id AS a_id, b.id AS b_id,
       CAST(levenshtein(a.txt, b.txt) AS INTEGER) AS dist
FROM s a JOIN s b
  ON a.blk = b.blk AND a.id < b.id AND abs(a.len - b.len) <= {EDIT_MAX_DIST}
WHERE levenshtein(a.txt, b.txt) BETWEEN 1 AND {EDIT_MAX_DIST}
ORDER BY a_id, b_id
""",
)
def edit_distance_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-miss part names (edit distance 1..2) via blocked Levenshtein.

    The blocking key is the name's second token (the noun), so the join is
    an equi-join shuffling each name to its noun's reducer — candidate
    count is sum(|block|^2) over noun blocks, not n^2 — with the length
    band |len diff| <= k pruning candidates before the DP runs. All
    comparisons are codegen'd JVM built-ins."""
    part = t(spark, sf_dir, "part")
    # F.get (not [1]) tolerates one-token names — ANSI [] throws
    # INVALID_ARRAY_INDEX on them — and the coalesce to '' matches
    # split_part's missing-field result, so single-token names share the
    # '' block on both engines instead of silently dropping (NULL keys
    # never equi-join)
    pairs = blocked_levenshtein_pairs(
        part,
        id_col="p_partkey",
        text_col="p_name",
        block_fn=lambda txt: F.coalesce(F.get(F.split(txt, " "), 1), F.lit("")),
        max_dist=EDIT_MAX_DIST,
    )
    return pairs.orderBy("a_id", "b_id")


@register(
    "edit_distance_pairs_symspell",
    oracle=f"""
WITH s AS (
  SELECT p_partkey AS id, p_name AS txt, length(p_name) AS len
  FROM part WHERE p_name IS NOT NULL
)
SELECT a.id AS a_id, b.id AS b_id,
       CAST(levenshtein(a.txt, b.txt) AS INTEGER) AS dist
FROM s a JOIN s b
  ON a.id < b.id AND abs(a.len - b.len) <= {EDIT_MAX_DIST}
WHERE levenshtein(a.txt, b.txt) BETWEEN 1 AND {EDIT_MAX_DIST}
ORDER BY a_id, b_id
""",
)
def edit_distance_pairs_symspell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL part-name pairs with edit distance 1..2, found by SymSpell-style
    deletion-neighborhood blocking (operators/linkage.py) — complete by the
    deletion-distance property, so this is the GLOBAL answer with no
    domain-blocking assumption, yet nothing quadratic ever runs on the
    engine side: the cost is the O(len^2)-per-row variant index plus
    bucket-sized joins and one Levenshtein per distinct candidate pair.
    The oracle is the quadratic length-banded form — affordable at
    fixture scale precisely because it is the small-data twin this
    operator replaces at 100 TB."""
    part = t(spark, sf_dir, "part")
    pairs = deletion_neighborhood_pairs(
        part, id_col="p_partkey", text_col="p_name", max_dist=EDIT_MAX_DIST
    )
    return pairs.orderBy("a_id", "b_id")


@register(
    "events_gap_fill_hourly",
    oracle="""
WITH obs AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value
  FROM events GROUP BY 1, 2
),
span AS (
  SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM obs GROUP BY 1
),
grid AS (
  SELECT event_type,
         unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM span
)
SELECT g.event_type, g.bucket, o.value,
       last_value(o.value IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
       CASE WHEN o.value IS NULL THEN 1 ELSE 0 END AS is_gap
FROM grid g
LEFT JOIN obs o ON g.event_type = o.event_type AND g.bucket = o.bucket
ORDER BY g.event_type, g.bucket
""",
)
def events_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-event-type series densified over each type's observed
    span, with exact-decimal hourly sums forward-filled across gap hours.

    One shuffle touches raw events (the (type, hour) aggregate with
    map-side partials); the grid explode, left join and forward-fill
    window all run on the grid-sized frame and every window is partitioned
    by key. At 100 TB the grid is O(keys x span/step) regardless of event
    count."""
    ev = t(spark, sf_dir, "events")
    out = gap_fill_ffill(
        ev,
        key_col="event_type",
        ts_col="ts",
        agg_col=F.sum(dec("value")).cast("double"),
        step="1 hour",
        grain="hour",
    )
    return out.select(
        F.col("key").alias("event_type"),
        "bucket",
        "value",
        "filled_value",
        "is_gap",
    ).orderBy("event_type", "bucket")


@register(
    "reservoir_sample_sources",
    oracle=f"""
WITH ranked AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR) || '{RESERVOIR_SALT}'), doc_id
         ) AS sample_rank
  FROM documents
)
SELECT source, doc_id, CAST(sample_rank AS INTEGER) AS sample_rank
FROM ranked WHERE sample_rank <= {RESERVOIR_K}
ORDER BY source, sample_rank
""",
)
def reservoir_sample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sample: rank each group's rows by a salted
    md5 of the key and keep the first k — statistically a uniform
    without-replacement sample (hash order is uniform), operationally a
    reservoir that is REPRODUCIBLE across engines, runs and partitionings,
    which a true streaming reservoir is not. One shuffle (the per-source
    window); k rows per group survive. The md5-order trick is the same
    engine-portable determinism used by shard assignment and
    source_resample_weighted."""
    docs = t(spark, sf_dir, "documents")
    from mapreducefw_spark.operators.rank import topk_per_key

    # two-phase per-key top-k: the per-source md5-order rank otherwise
    # sorts each source's whole doc set in one task (operators/rank.py)
    return topk_per_key(
        docs.select("source", "doc_id"),
        ["source"],
        [
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(RESERVOIR_SALT))),
            F.col("doc_id"),
        ],
        RESERVOIR_K,
        rank_col="sample_rank",
    ).orderBy("source", "sample_rank")


@register(
    "token_divergence_by_source",
    oracle=f"""
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE text IS NOT NULL
),
cnt AS (
  SELECT source, tok, COUNT(*) AS n FROM toks WHERE tok <> '' GROUP BY 1, 2
),
top AS (
  SELECT tok, SUM(n) AS gn FROM cnt GROUP BY tok
  ORDER BY gn DESC, tok LIMIT {TOP_TOKENS}
),
src AS (SELECT c.source, c.tok, c.n, p.gn FROM cnt c JOIN top p USING (tok)),
tot AS (SELECT source, SUM(n) AS st FROM src GROUP BY source),
gtot AS (SELECT SUM(gn) AS gt FROM top)
SELECT s.source,
       CAST(SUM(s.n) AS BIGINT) AS n_top_tokens,
       ROUND(SUM((s.n / t.st) * ln((s.n / t.st) / (s.gn / g.gt))), 5)
         AS kl_divergence
FROM src s JOIN tot t USING (source) CROSS JOIN gtot g
GROUP BY s.source
ORDER BY s.source
""",
)
def token_divergence_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence of the token distribution vs the corpus,
    over the global top-N tokens — the mixture-drift monitor that tells a
    curation pipeline when one source's language is skewing the blend.

    Restricting both distributions to the corpus top-N bounds the state:
    the per-source vectors are at most N rows each, the corpus total is a
    1-row broadcast, and no token outside the top-N ever shuffles past the
    first count. Zero-count source tokens contribute 0 by construction
    (the join drops them; 0*ln(0) -> 0 is the KL convention), and the
    corpus probability of a top-N token is always > 0, so the divergence is
    finite. Tokenization (whitespace split, NULL/empty guarded) and the
    deterministic top-N tie-break (count desc, token asc) mirror the
    oracle exactly; the sum of ~N double terms is rounded to 5 places to
    absorb summation-order low bits."""
    docs = t(spark, sf_dir, "documents")
    cnt = (
        docs.filter(F.col("text").isNotNull())
        .select("source", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = (
        cnt.groupBy("tok")
        .agg(F.sum("n").alias("gn"))
        .orderBy(F.col("gn").desc(), "tok")
        .limit(TOP_TOKENS)
    )
    src = cnt.join(F.broadcast(top), "tok")
    tot = src.groupBy("source").agg(F.sum("n").alias("st"))
    gtot = top.agg(F.sum("gn").alias("gt"))
    p = F.col("n") / F.col("st")
    c = F.col("gn") / F.col("gt")
    return (
        src.join(F.broadcast(tot), "source")
        .crossJoin(F.broadcast(gtot))
        .groupBy("source")
        .agg(
            F.sum("n").alias("n_top_tokens"),
            F.round(F.sum(p * F.log(p / c)), 5).alias("kl_divergence"),
        )
        .orderBy("source")
    )


@register(
    "equi_depth_histogram",
    oracle=f"""
WITH r AS (
  SELECT l_extendedprice,
         ROW_NUMBER() OVER (
           ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
         COUNT(*) OVER () AS n
  FROM lineitem WHERE l_extendedprice IS NOT NULL
)
SELECT CAST(((rn - 1) * {HIST_BUCKETS}) // n AS INTEGER) AS bucket,
       COUNT(*) AS n_rows,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
FROM r
GROUP BY 1
ORDER BY bucket
""",
)
def equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (equi-depth) k-bucket histogram of lineitem prices —
    the statistic ANALYZE-style optimizers and data-profiling reports want,
    done WITHOUT a global NTILE window.

    A bare ``NTILE(k) OVER (ORDER BY price)`` moves every row through one
    task. Here the global position comes from the two-phase range-partition
    rank (operators/rank.py): one range shuffle, per-partition windows,
    O(partitions) offset arithmetic. The bucket is integer math on the
    rank — ``(rank-1)*k div N`` — identical in both engines (the oracle's
    ROW_NUMBER form is the small-data twin; the tie-broken total order
    makes the rank, and hence every bucket boundary, deterministic)."""
    # NULL prices are excluded on BOTH sides: a NULL has no place in a value
    # histogram, and NULL sort position differs across engines (Spark NULLS
    # FIRST vs DuckDB NULLS LAST) — the filter removes the divergence class
    li = (
        t(spark, sf_dir, "lineitem")
        .select("l_extendedprice", "l_orderkey", "l_linenumber")
        .filter(F.col("l_extendedprice").isNotNull())
    )
    ranked = global_rank_running(
        li, [F.col("l_extendedprice"), F.col("l_orderkey"), F.col("l_linenumber")]
    )
    n = li.agg(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .withColumn(
            "bucket",
            F.expr(f"(global_rank - 1) * {HIST_BUCKETS} div _n").cast("int"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_price"),
        )
        .orderBy("bucket")
    )
