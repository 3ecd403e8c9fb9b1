"""Round-8 batch 7: portable SimHash pairs, listagg, seasonal
decomposition, inter-arrival stats, char-ngram profiles, log-bin
histograms.

The headline item is `simhash_portable_pairs`: the SimHash near-dup
family was rows-only (operators/dedup.py:480 hashes with xxhash64, which
DuckDB lacks); this twin rebuilds the 48-bit signature from the portable
md5 hash so the WHOLE pipeline — signature votes, pigeonhole chunk
blocking, Hamming verify — is differentially checked against a
brute-force O(n²) oracle.

Semantic contract with the reference engine: every query is the
map -> shuffle-by-key -> reduce -> sort job shape
(`/root/reference/MapReduceClient.h:47-51`, `MRFCore.cpp:252-446`).

Scale posture:
- SimHash blocking is the production path (4 chunk buckets per doc,
  candidate pairs only for shared chunks — pigeonhole-complete for
  Hamming <= 3); the O(n²) scan lives ONLY in the DuckDB oracle.
- seasonal decomposition / gap stats run their unpartitioned frames on
  the calendar day grid / per-(user, type) partitions; char-trigram and
  log-bin shuffles are vocabulary/bucket-sized count partials.
- cross-engine determinism: signature votes, Hamming distances, gap
  microseconds, and log2 bins are exact integers (the bin comes from
  the BINARY-STRING length, not floor(log2) — no libm boundary at
  powers of two); only means/shares take ROUND(6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import dec, t

_SIMHASH_BITS = 48
_CHUNKS = 4  # 4 x 12-bit chunks: pigeonhole-complete for hamming <= 3


@register(
    "simhash_portable_pairs",
    oracle="""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text
  FROM documents WHERE text IS NOT NULL AND doc_id % 10 = 0
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
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
ORDER BY doc_a, doc_b
""",
)
def simhash_portable_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs (Hamming <= 3 over 48-bit signatures),
    fully oracle-checked: token hashes use the portable 48-bit md5 prefix
    (not engine-native xxhash64, so DuckDB computes the IDENTICAL
    signature), and every 10th doc is unioned back as an exact copy
    (+1000000 id) so the driver data always exercises real matches — the
    deterministic-pair idiom of rouge1_recall_pairs/minhash_accuracy.
    The Spark side runs the PRODUCTION shape: Arrow-vectorized per-bit
    votes (`operators/dedup.py::portable_simhash_signatures` — pure
    integer math, so the UDF emits the exact same BIGINT on any engine
    or partitioning), 4x12-bit pigeonhole chunk blocking (a <= 3-bit-
    distant pair must share a chunk), equi-join on (chunk, value), exact
    Hamming verify. The oracle is the brute-force O(n²) signature scan —
    equality PROVES the blocking loses nothing. Zero-token docs are
    excluded on both sides (they'd all collapse onto signature 0, the
    dedup.py:490 contract). Shuffles carry (doc, sig, chunk) rows —
    never text. Cites `operators/dedup.py:480,508` (the xxhash64 form
    this twin checks)."""
    return portable_simhash_pairs_frame(_sim_corpus(spark, sf_dir))


def _sim_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + every 10th doc re-unioned as an exact copy (+1000000 id)
    so the fixture always exercises real near-dup matches."""
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return d.select("doc_id", "text").unionByName(
        d.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )


def portable_simhash_pairs_frame(
    corpus: DataFrame, *, max_bucket_size: int | None = None
) -> DataFrame:
    """(doc_id, text) -> (doc_a, doc_b, hamming <= 3) via portable 48-bit
    SimHash + 4x12-bit pigeonhole chunk blocking. ``max_bucket_size`` is
    the `cap_bucket_size` escape hatch (operators/dedup.py:244): buckets
    holding more docs are dropped BEFORE the self-join, bounding the
    quadratic-inside-bucket blowup a boilerplate-heavy corpus causes
    (at sf0.1 the worst chunk bucket holds 1829 docs = 1.7M candidate
    pairs on its own). Reused by both registered forms and the pins."""
    from mapreducefw_spark.operators.dedup import (
        cap_bucket_size,
        portable_simhash_signatures,
    )

    sigs = portable_simhash_signatures(corpus, bits=_SIMHASH_BITS)
    width = _SIMHASH_BITS // _CHUNKS
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftright("sig", c * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("v"),
            )
            for c in range(_CHUNKS)
        ]
    )
    blocked = sigs.select(
        "doc_id", "sig", F.explode(chunks).alias("ch")
    ).select("doc_id", "sig", F.col("ch.chunk").alias("chunk"), F.col("ch.v").alias("v"))
    blocked = cap_bucket_size(blocked, ["chunk", "v"], max_bucket_size)
    a, b2 = blocked.alias("a"), blocked.alias("b")
    ham = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).cast("int")
    return (
        a.join(
            b2,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


_CAP = 64  # above the P99 of NON-template buckets at sf0.1 (overall P99 is
# 154, inflated by the template mega-buckets the cap exists to drop), so the
# cap removes only the boilerplate mega-buckets exact dedup catches anyway


@register(
    "simhash_portable_pairs_capped",
    oracle="""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text
  FROM documents WHERE text IS NOT NULL AND doc_id % 10 = 0
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
chunks AS (
  SELECT doc_id, sig, c AS chunk, (sig >> CAST(c * 12 AS INT)) & 4095 AS v
  FROM sigs CROSS JOIN (SELECT UNNEST(range(4)) AS c)
),
kept AS (
  SELECT chunk, v FROM chunks GROUP BY chunk, v HAVING COUNT(*) <= 64
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sa, b.sig AS sb
  FROM chunks a
  JOIN kept k ON k.chunk = a.chunk AND k.v = a.v
  JOIN chunks b ON a.chunk = b.chunk AND a.v = b.v AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(sa, sb)) <= 3
ORDER BY doc_a, doc_b
""",
)
def simhash_portable_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION form of simhash_portable_pairs: identical signature
    math and blocking, but chunk buckets holding > 64 docs are dropped
    before the self-join (`cap_bucket_size`, operators/dedup.py:244) — the
    mass-duplication escape hatch the r8 verdict asked to make code, not
    prose. On a boilerplate-heavy corpus one degenerate bucket is quadratic
    (sf0.1: the worst bucket alone is 1.7M of the 4.68M candidate pairs);
    the cap bounds per-bucket work at 64*63/2 pairs while losing only pairs
    of mass-duplicated docs, which exact dedup (dedup_exact) removes
    upstream in every real pipeline. The DuckDB oracle mirrors the cap
    (HAVING COUNT(*) <= 64 on the same bucket keys), so the capped
    semantics are value-hash verified end-to-end, and
    `tests/test_simhash_portable.py` pins capped == uncapped on a
    cap-unbound fixture. Cites `operators/dedup.py:480,508` (xxhash64
    production family) and `simhash_portable_pairs` (the lossless-blocking
    proof twin this variant trades recall-on-mass-dups for boundedness)."""
    return portable_simhash_pairs_frame(_sim_corpus(spark, sf_dir), max_bucket_size=_CAP)


@register(
    "listagg_within_group",
    oracle="""
SELECT r.r_name AS region,
       string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations_asc,
       string_agg(n.n_name, ',' ORDER BY n.n_name DESC) AS nations_desc,
       CAST(COUNT(n.n_name) AS BIGINT) AS n_named
FROM region r LEFT JOIN nation n ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY r.r_name NULLS LAST
""",
)
def listagg_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL:2023 LISTAGG ... WITHIN GROUP (ORDER BY ...) surface, new
    in Spark 4 — ordered string aggregation per region in both
    directions (== DuckDB string_agg with ORDER BY). NULL names are
    skipped by both engines' aggregate contract (n_named counts what was
    aggregated); the explicit WITHIN GROUP order makes the concatenation
    deterministic, which bare collect_list/concat_ws is NOT under a
    multi-partition shuffle. Dimension-sized join + O(regions) output."""
    t(spark, sf_dir, "region").createOrReplaceTempView("region_lag")
    t(spark, sf_dir, "nation").createOrReplaceTempView("nation_lag")
    return spark.sql(
        """
SELECT r.r_name AS region,
       listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name) AS nations_asc,
       listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name DESC) AS nations_desc,
       CAST(COUNT(n.n_name) AS BIGINT) AS n_named
FROM region_lag r LEFT JOIN nation_lag n ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY r.r_name ASC NULLS LAST
"""
    )


@register(
    "seasonal_decompose_daily",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
),
bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM daily),
spine AS (
  SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
  FROM bounds
),
grid AS (
  SELECT spine.d, COALESCE(daily.rev, 0) AS rev
  FROM spine LEFT JOIN daily USING (d)
),
ma AS (
  SELECT d, CAST(rev AS DOUBLE) AS rev,
         CASE WHEN COUNT(*) OVER w = 7
              THEN CAST(SUM(rev) OVER w AS DOUBLE) / 7 END AS trend
  FROM grid
  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
detr AS (
  SELECT d, rev, trend, rev - trend AS dt, isodow(d) AS dow FROM ma
),
seas AS (
  SELECT dow, ROUND(SUM(dt) / COUNT(dt), 6) AS seasonal
  FROM detr WHERE dt IS NOT NULL GROUP BY dow
)
SELECT detr.d AS day, detr.rev AS revenue,
       ROUND(detr.trend, 6) AS trend,
       seas.seasonal AS seasonal,
       ROUND(detr.dt - seas.seasonal, 6) AS residual
FROM detr LEFT JOIN seas USING (dow)
ORDER BY detr.d
""",
)
def seasonal_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of daily order revenue:
    trend = centered 7-day moving average (only where the window is
    full), weekly seasonal = per-ISO-weekday mean of the detrended
    series, residual = remainder — the decompose() every monitoring
    stack runs before calling something an anomaly (the STL-lite
    complement to seasonal_index_dow's ratio form). The day grid is
    calendar-regularized (missing days enter as exact 0 so the MA window
    is truly 7 consecutive days). Daily sums ride DECIMAL; the MA is
    decimal-sum/7 so both engines divide identical numbers; the
    per-dow seasonal mean is ROUND(6)-ed BEFORE the residual subtraction
    so residuals difference identical doubles. All windows run on the
    O(span) day grid."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(dec("o_totalprice")).alias("rev")
    )
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    grid = spine.join(daily, "d", "left").select(
        "d", F.coalesce("rev", F.lit(0).cast("decimal(12,2)")).alias("rev")
    )
    w = W.orderBy("d").rowsBetween(-3, 3)
    ma = grid.select(
        "d",
        F.col("rev").cast("double").alias("rev"),
        F.when(
            F.count(F.lit(1)).over(w) == 7, F.sum("rev").over(w).cast("double") / 7
        ).alias("trend"),
    )
    detr = ma.select(
        "d",
        "rev",
        "trend",
        (F.col("rev") - F.col("trend")).alias("dt"),
        (F.weekday("d") + 1).alias("dow"),
    )
    seas = (
        detr.filter(F.col("dt").isNotNull())
        .groupBy("dow")
        .agg(F.round(F.sum("dt") / F.count("dt"), 6).alias("seasonal"))
    )
    return (
        detr.join(seas, "dow", "left")
        .select(
            F.col("d").alias("day"),
            F.col("rev").alias("revenue"),
            F.round("trend", 6).alias("trend"),
            "seasonal",
            F.round(F.col("dt") - F.col("seasonal"), 6).alias("residual"),
        )
        .orderBy("day")
    )


@register(
    "interarrival_gap_stats",
    oracle="""
WITH gaps AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap_us
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL
),
r AS (
  SELECT event_type, gap_us,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY gap_us) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM gaps WHERE gap_us IS NOT NULL
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_gaps,
       CAST(CAST(SUM(gap_us) AS BIGINT) // MAX(n) AS BIGINT) AS mean_gap_us,
       CAST(MAX(CASE WHEN rk = CAST(CEIL(0.50 * n) AS BIGINT) THEN gap_us END) AS BIGINT) AS p50_us,
       CAST(MAX(CASE WHEN rk = CAST(CEIL(0.90 * n) AS BIGINT) THEN gap_us END) AS BIGINT) AS p90_us
FROM r
GROUP BY event_type
ORDER BY event_type
""",
)
def interarrival_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time distribution per event type — the cadence
    fingerprint behind rate limiting, bot detection and the debounce
    threshold choice: per-user-stream gaps (lag over (user, type),
    (ts, event_id) tiebreak — never across users), then count/mean/
    p50/p90 per type. Gaps are exact BIGINT microseconds; the mean is
    the FLOORED integer division of exact sums (see inline note); the
    percentiles are DISCRETE (value at rank
    ceil(p·n), the percentile_disc_prices idiom) because interpolating
    percentiles at 1e11-µs magnitudes exceeds ROUND(6)'s reach — the
    continuous forms' (1-f)a+fb evaluation order diverged at 6e-5 in
    testing. The lag window is PARTITIONED by (user, type): partitions
    stay user-sized at any corpus scale; the rank window partitions by
    type over the gap rows (the exact-by-sorting oracle-twin cost, same
    status as percentile_disc_prices)."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
    )
    wl = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wl)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    wr = W.partitionBy("event_type").orderBy("gap_us")
    wn = W.partitionBy("event_type")
    r = gaps.select(
        "event_type",
        "gap_us",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def at(p: float, name: str):
        return (
            F.max(
                F.when(
                    F.col("rk") == F.ceil(F.lit(p) * F.col("n")).cast("long"),
                    F.col("gap_us"),
                )
            )
            .cast("bigint")
            .alias(name)
        )

    return (
        r.groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n_gaps"),
            # floored integer mean: ROUND(sum/n, 6) is meaningless at
            # 1e11-µs magnitudes (double ulp ~3e-5 there, and the two
            # engines' round-huge-double paths disagreed in testing)
            F.expr("CAST(SUM(gap_us) DIV MAX(n) AS BIGINT)").alias("mean_gap_us"),
            at(0.50, "p50_us"),
            at(0.90, "p90_us"),
        )
        .orderBy("event_type")
    )


@register(
    "char_ngram_lang_profile",
    oracle="""
WITH tri AS (
  SELECT lang, UNNEST(list_transform(
           range(1, CASE WHEN length(text) >= 3 THEN length(text) - 1 ELSE 1 END),
           i -> substr(text, CAST(i AS INT), 3))) AS g
  FROM documents WHERE text IS NOT NULL
),
counts AS (
  SELECT lang, g, CAST(COUNT(*) AS BIGINT) AS n FROM tri GROUP BY lang, g
),
tot AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS t FROM counts GROUP BY lang),
ranked AS (
  SELECT counts.lang, g, n, t,
         ROW_NUMBER() OVER (PARTITION BY counts.lang
                            ORDER BY n DESC, g) AS rn
  FROM counts JOIN tot ON tot.lang IS NOT DISTINCT FROM counts.lang
)
SELECT lang, rn AS rank, g AS trigram, n,
       ROUND(CAST(n AS DOUBLE) / t, 6) AS share
FROM ranked WHERE rn <= 5
ORDER BY lang NULLS LAST, rn
""",
)
def char_ngram_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 character trigrams per language with corpus share — the
    classic Cavnar-Trenkle n-gram language profile that langid models
    train on, and the token-free signal that works for zh where
    word-split profiling can't. Trigram extraction is CHARACTER-based on
    both engines (substr/substring count code points, so multi-byte text
    slices identically); the rank is pinned (count desc, trigram asc)
    and NULL lang is its own profile. Shuffle: (lang, trigram) count
    partials after map-side combine — vocabulary-sized; the rank window
    partitions by lang over that grid, never over raw text."""
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    text = F.col("text")
    grams = F.when(
        F.length(text) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length(text) - 2),
            lambda i: text.substr(i, F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        d.select("lang", F.explode(grams).alias("g"))
        .groupBy("lang", "g")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = counts.groupBy("lang").agg(F.sum("n").cast("bigint").alias("t"))
    from mapreducefw_spark.operators.rank import topk_per_key

    # two-phase per-key top-k (operators/rank.py): rank BEFORE the totals
    # join — only 5 survivors per lang reach it, and no one-task-per-lang
    # sort of the full trigram vocabulary
    ranked = (
        topk_per_key(counts, ["lang"], [F.desc("n"), F.asc("g")], 5, rank_col="rn")
        .join(
            tot.select(F.col("lang").alias("tlang"), "t"),
            F.col("lang").eqNullSafe(F.col("tlang")),
        )
        .select("lang", "g", "n", "t", "rn")
    )
    return (
        ranked
        .select(
            "lang",
            F.col("rn").alias("rank"),
            F.col("g").alias("trigram"),
            "n",
            F.round(F.col("n").cast("double") / F.col("t"), 6).alias("share"),
        )
        .orderBy(F.asc_nulls_last("lang"), "rank")
    )


@register(
    "histogram_log_bins",
    oracle="""
WITH binned AS (
  SELECT source, length(bin(n_chars)) - 1 AS b, n_chars
  FROM documents WHERE n_chars IS NOT NULL AND n_chars >= 1
)
SELECT b AS log2_bin,
       CAST(POW(2, b) AS BIGINT) AS lo,
       CAST(POW(2, b + 1) - 1 AS BIGINT) AS hi,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM binned
GROUP BY b
ORDER BY b
""",
)
def histogram_log_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-binned document-length histogram — the standard corpus length
    profile (lengths span orders of magnitude, so fixed-width bins are
    all-empty-or-one-bar). The bin is the BINARY-STRING length minus 1
    (== floor(log2) by construction, exact integer on both engines) —
    NOT floor(log2(x)), whose libm boundary at exact powers of two is a
    cross-engine coin flip. Map-side bin + one O(bins) count shuffle.
    POW(2, int) is exact in double far past 2^52, so lo/hi match."""
    d = t(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull() & (F.col("n_chars") >= 1)
    )
    b = (F.length(F.conv(F.col("n_chars").cast("string"), 10, 2)) - 1).alias("b")
    return (
        d.select(b, "n_chars")
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
        .select(
            F.col("b").alias("log2_bin"),
            F.pow(F.lit(2.0), F.col("b")).cast("bigint").alias("lo"),
            (F.pow(F.lit(2.0), F.col("b") + 1) - 1).cast("bigint").alias("hi"),
            "n_docs",
            "n_chars",
        )
        .orderBy("log2_bin")
    )
