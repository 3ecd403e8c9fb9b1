"""Sixth training-data pipeline batch (round 5): corpus curation — the
selection layer between cleaning/dedup and packing. Stratified per-source
sampling, quality-decile mixture stats over the scalable global rank,
closed-form water-filling token budgets, and a fully oracle-checkable
bloom-filter decontamination pass (md5 hash family end to end, so DuckDB
recomputes identical samples, levels, bitmaps and hits)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.operators import curation, packing, rank
from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t

_MD5_KEY = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':strat'), 1, 8)) AS BIGINT)"
)


@register(
    "stratified_sample_sources",
    oracle=f"""
WITH r AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
             ORDER BY {_MD5_KEY}, doc_id) AS rk
  FROM documents
)
SELECT doc_id, source, n_chars FROM r WHERE rk <= 5
ORDER BY source, doc_id
""",
)
def stratified_sample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exact-k stratified sample: 5 docs per source by md5
    order — per-source caps / eval carve-outs that any engine reproduces
    from the ids alone (sampleBy is RNG-seeded and approximate; this is
    exact and auditable). One shuffle, hash by source."""
    docs = t(spark, sf_dir, "documents")
    return curation.stratified_sample(docs, "source", 5).select(
        "doc_id", "source", "n_chars"
    ).orderBy("source", "doc_id")


@register(
    "quality_decile_mixture",
    oracle="""
WITH scored AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
ranked AS (
  SELECT doc_id, n_tokens,
         ROW_NUMBER() OVER (ORDER BY n_tokens DESC NULLS LAST, doc_id) AS rk,
         COUNT(*) OVER () AS c
  FROM scored
)
SELECT CAST(CEIL(rk * 10.0 / c) AS BIGINT) AS bin,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       MIN(n_tokens) AS min_tokens,
       MAX(n_tokens) AS max_tokens
FROM ranked
GROUP BY bin
ORDER BY bin
""",
)
def quality_decile_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum/mixture binning: docs ranked corpus-wide by a quality
    score (token count here), split into 10 equal-width bins, per-bin doc
    and token totals. The global order comes from the two-phase scalable
    rank (operators/rank.py) — ONE range shuffle, no unpartitioned
    WindowExec — and the bin is derived map-side as ceil(rank*10/count),
    so the whole thing survives a corpus-sized input (a bare ntile() would
    funnel 100 TB through one task). Oracle recomputes the same rank/bin
    closed form with a plain window."""
    docs = t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.when(
            F.col("text").isNotNull(), F.size(F.split("text", " "))
        ).cast("bigint").alias("n_tokens"),
    )
    total = scored.agg(F.count(F.lit(1)).alias("_c"))
    ranked = rank.global_rank_running(
        scored, [F.col("n_tokens").desc_nulls_last(), F.col("doc_id").asc()]
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            F.ceil(F.col("global_rank") * 10.0 / F.col("_c")).alias("bin"),
            "n_tokens",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy("bin")
    )


@register(
    "token_budget_waterfill",
    oracle="""
WITH per AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
b AS (SELECT 0.95 * SUM(n_tokens) AS budget, COUNT(*) AS n FROM per),
st AS (
  SELECT source, n_tokens,
         (b.budget - COALESCE(SUM(n_tokens) OVER (ORDER BY n_tokens, source
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
         / (b.n - (ROW_NUMBER() OVER (ORDER BY n_tokens, source) - 1)) AS cand
  FROM per, b
),
lv AS (
  SELECT MAX(CASE WHEN CAST(n_tokens AS DOUBLE) > cand THEN cand END) AS level
  FROM st
)
SELECT source, n_tokens,
       CASE WHEN level IS NULL OR CAST(n_tokens AS DOUBLE) <= cand
            THEN n_tokens
            ELSE CAST(FLOOR(level) AS BIGINT) END AS alloc_tokens
FROM st, lv
ORDER BY source
""",
)
def token_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling token budget: spend 95% of the corpus's tokens, capping
    small sources at their size and splitting the rest evenly — the fair
    mixture allocation, collapsed from the textbook iterative algorithm to
    a one-window closed form over the per-source aggregate (O(sources)
    rows; the corpus-sized work is the upstream groupBy). The budget rides
    in as a broadcast column so the query is collect-free; the oracle
    replays the identical closed form."""
    docs = t(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.sum(
            F.when(F.col("text").isNotNull(), F.size(F.split("text", " ")))
        ).cast("bigint").alias("n_tokens")
    )
    tot = per.agg((F.lit(0.95) * F.sum("n_tokens")).alias("_budget"))
    staged = per.crossJoin(F.broadcast(tot))
    return curation.token_budget_waterfill(staged, F.col("_budget")).orderBy("source")


@register(
    "bloom_decontaminate",
    oracle="""
WITH contam AS (
  SELECT DISTINCT text FROM documents WHERE doc_id % 7 = 0 AND text IS NOT NULL
),
pos AS (
  SELECT CAST(('0x' || substr(md5(text || ':b0'), 1, 8)) AS BIGINT) % 1048576 AS p FROM contam
  UNION ALL
  SELECT CAST(('0x' || substr(md5(text || ':b1'), 1, 8)) AS BIGINT) % 1048576 FROM contam
  UNION ALL
  SELECT CAST(('0x' || substr(md5(text || ':b2'), 1, 8)) AS BIGINT) % 1048576 FROM contam
  UNION ALL
  SELECT CAST(('0x' || substr(md5(text || ':b3'), 1, 8)) AS BIGINT) % 1048576 FROM contam
),
bitmap AS (
  SELECT p // 32 AS word, bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS bits
  FROM pos GROUP BY 1
),
probes AS (
  SELECT doc_id, source,
         unnest([
           CAST(('0x' || substr(md5(text || ':b0'), 1, 8)) AS BIGINT) % 1048576,
           CAST(('0x' || substr(md5(text || ':b1'), 1, 8)) AS BIGINT) % 1048576,
           CAST(('0x' || substr(md5(text || ':b2'), 1, 8)) AS BIGINT) % 1048576,
           CAST(('0x' || substr(md5(text || ':b3'), 1, 8)) AS BIGINT) % 1048576
         ]) AS p
  FROM documents
),
perdoc AS (
  SELECT pr.doc_id, pr.source,
         COUNT(*) FILTER (WHERE (COALESCE(b.bits, 0)
             & (CAST(1 AS BIGINT) << CAST(pr.p % 32 AS INT))) <> 0) = 4 AS bloom_hit
  FROM probes pr LEFT JOIN bitmap b ON pr.p // 32 = b.word
  GROUP BY pr.doc_id, pr.source
),
exact AS (
  SELECT d.doc_id, d.text IN (SELECT text FROM contam) AS exact_hit
  FROM documents d
)
SELECT p.source,
       COUNT(*) AS n_docs,
       COUNT(*) FILTER (WHERE p.bloom_hit) AS n_bloom_hits,
       COUNT(*) FILTER (WHERE e.exact_hit) AS n_exact_hits
FROM perdoc p JOIN exact e ON p.doc_id = e.doc_id
GROUP BY p.source
ORDER BY p.source
""",
)
def bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination via a DataFrame-native bloom filter: the benchmark
    ('contaminated') texts fold into a 2^20-bit bit-packed bitmap (~32K
    bigint rows, broadcastable regardless of how large the contamination
    set is — its raw strings never move), each corpus doc probes its 4 md5
    positions against the broadcast bitmap, and per-source hit counts
    compare the bloom answer to exact membership. False negatives are
    impossible by construction; the md5 family makes even the false
    positives engine-exact, so the DuckDB oracle value-hash-matches the
    whole pass (pinned FP-rate bounds live in tests/test_curation.py)."""
    docs = t(spark, sf_dir, "documents")
    contam = (
        docs.filter((F.col("doc_id") % 7 == 0) & F.col("text").isNotNull())
        .select("text")
        .distinct()
    )
    bitmap = curation.bloom_bitmap(contam)
    probed = curation.bloom_probe(docs, bitmap)
    exact = probed.join(
        F.broadcast(contam.withColumn("_e", F.lit(True))), "text", "left"
    )
    return (
        exact.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("bloom_hit"), 1)).alias("n_bloom_hits"),
            F.count(F.when(F.col("_e"), 1)).alias("n_exact_hits"),
        )
        .orderBy("source")
    )


@register(
    "vocab_coverage",
    oracle="""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS tk FROM documents WHERE text IS NOT NULL
),
cnt AS (SELECT tk, COUNT(*) AS c FROM tok GROUP BY tk),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cnt),
rk AS (
  SELECT tk, c, ROW_NUMBER() OVER (ORDER BY c DESC, tk) AS r,
         CAST(SUM(c) OVER (ORDER BY c DESC, tk
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM cnt
)
SELECT s.v AS vocab_size,
       CAST(MAX(rk.cum) AS BIGINT) AS covered_tokens,
       MAX(tot.t) AS total_tokens,
       ROUND(CAST(MAX(rk.cum) AS DOUBLE) / MAX(tot.t), 6) AS coverage
FROM (VALUES (100), (500), (1000)) AS s(v)
JOIN rk ON rk.r <= s.v
CROSS JOIN tot
GROUP BY s.v
ORDER BY vocab_size
""",
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary planning: what fraction of all corpus tokens do
    the top-{100,500,1000} types cover? One shuffle for the type counts
    (map-side partial aggs), then the candidate vocab is cut with a BOUNDED
    global top-k (limit max(cutoffs) -> TakeOrderedAndProject, never a full
    sort) and the cumulative coverage window runs over that O(cutoff) frame
    — the corpus never feeds an unpartitioned window. Oracle replays the
    same ranking over the full type table."""
    from pyspark.sql.window import Window as W

    docs = t(spark, sf_dir, "documents")
    cutoffs = [100, 500, 1000]
    counts = (
        docs.filter(F.col("text").isNotNull())
        .select(F.explode(F.split("text", " ")).alias("tk"))
        .groupBy("tk")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = counts.agg(F.sum("c").cast("bigint").alias("t"))
    top = counts.orderBy(F.desc("c"), F.asc("tk")).limit(max(cutoffs))
    w = W.orderBy(F.desc("c"), F.asc("tk"))
    ranked = top.select(
        "tk",
        "c",
        F.row_number().over(w).alias("r"),
        F.sum("c").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("bigint")
        .alias("cum"),
    )
    sizes = spark.createDataFrame([(v,) for v in cutoffs], "vocab_size int")
    return (
        ranked.join(F.broadcast(sizes), F.col("r") <= F.col("vocab_size"))
        .crossJoin(F.broadcast(total))
        .groupBy("vocab_size")
        .agg(
            F.max("cum").alias("covered_tokens"),
            F.max("t").alias("total_tokens"),
            F.round(F.max("cum").cast("double") / F.max("t"), 6).alias("coverage"),
        )
        .orderBy("vocab_size")
    )


@register(
    "trigram_typicality",
    oracle="""
WITH tri AS (
  SELECT doc_id,
         CASE WHEN length(text) >= 3
              THEN list_transform(generate_series(1, length(text) - 2),
                                  i -> substr(text, i, 3))
              ELSE [] END AS tg
  FROM documents
),
inst AS (SELECT doc_id, unnest(tg) AS g FROM tri),
model AS (SELECT g, COUNT(*) AS c FROM inst GROUP BY g),
agg AS (
  SELECT i.doc_id,
         COUNT(*) AS n_tri,
         CAST(SUM(m.c) AS BIGINT) AS tri_mass
  FROM inst i JOIN model m ON i.g = m.g
  GROUP BY i.doc_id
)
SELECT t.doc_id,
       COALESCE(a.n_tri, 0) AS n_tri,
       COALESCE(a.tri_mass, 0) AS tri_mass,
       ROUND(CAST(COALESCE(a.tri_mass, 0) AS DOUBLE)
             / greatest(COALESCE(a.n_tri, 0), 1), 6) AS typicality
FROM tri t LEFT JOIN agg a ON t.doc_id = a.doc_id
ORDER BY t.doc_id
""",
)
def trigram_typicality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram typicality: each doc scored by the average
    corpus-wide frequency of its trigrams — the integer-exact cousin of
    n-gram LM perplexity filtering (gibberish and wrong-charset docs score
    low, boilerplate scores high). Logs are avoided ON PURPOSE: the score
    is a ratio of two exact bigint aggregates, so Spark and DuckDB agree
    bit for bit where a float log-sum would drift in the last ulp.

    Scale shape: trigram instances explode map-side; the model (distinct
    char trigrams — bounded by charset^3, ~100K rows for real corpora, NOT
    corpus-sized) broadcasts back onto the instances; one shuffle per
    groupBy. The length>=3 gate matters: Spark's sequence(1,0) counts
    BACKWARDS (step -1) rather than returning empty, so short/NULL texts
    must take the empty-array branch explicitly."""
    docs = t(spark, sf_dir, "documents")
    tg = F.when(
        F.length("text") >= 3,
        F.expr("transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"),
    ).otherwise(F.array().cast("array<string>"))
    # Aggregate (doc, trigram) -> count FIRST and pin one materialization:
    # model, mass and n_tri all derive from this frame, and without the
    # checkpoint each branch would re-run the transform+explode scan (3x the
    # dominant cost; 20s -> 6s at sf0.01). Same pattern as operators/rank.py.
    pairs = (
        docs.select("doc_id", F.explode(tg).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    model = pairs.groupBy("g").agg(F.sum("n").alias("c"))
    agg = (
        pairs.join(F.broadcast(model), "g")
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("bigint").alias("n_tri"),
            F.sum(F.col("n") * F.col("c")).cast("bigint").alias("tri_mass"),
        )
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tri", F.lit(0).cast("bigint")).alias("n_tri"),
            F.coalesce("tri_mass", F.lit(0).cast("bigint")).alias("tri_mass"),
            F.round(
                F.coalesce("tri_mass", F.lit(0).cast("bigint")).cast("double")
                / F.greatest(F.coalesce("n_tri", F.lit(0).cast("bigint")), F.lit(1)),
                6,
            ).alias("typicality"),
        )
        .orderBy("doc_id")
    )


@register(
    "dup_ngram_stats",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE text IS NOT NULL
),
tg AS (
  SELECT doc_id, w,
         CASE WHEN len(w) >= 3
              THEN list_transform(generate_series(1, len(w) - 2),
                                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
              ELSE [] END AS g3
  FROM toks
)
SELECT doc_id,
       CAST(len(w) AS BIGINT) AS n_tokens,
       CAST(len(g3) AS BIGINT) AS n_grams,
       CAST(len(g3) - len(list_distinct(g3)) AS BIGINT) AS n_dup_grams,
       ROUND(CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE)
             / greatest(len(g3), 1), 6) AS dup_frac
FROM tg
ORDER BY doc_id
""",
)
def dup_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signal (the Gopher/C4 quality rule):
    fraction of duplicate token 3-grams per doc — boilerplate and
    degenerate generations score high and get filtered before training.
    Entirely MAP-ONLY (higher-order array expressions; no explode, no
    shuffle, no join): at 100 TB this costs exactly one scan. The counts
    are exact integers so both engines agree bit for bit."""
    docs = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    w = F.split("text", " ")
    g3 = F.when(
        F.size(w) >= 3,
        F.expr(
            "transform(sequence(1, size(split(text, ' ')) - 2), "
            "i -> concat_ws(' ', split(text, ' ')[i-1], split(text, ' ')[i], "
            "split(text, ' ')[i+1]))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(
            "doc_id",
            F.size(w).cast("bigint").alias("n_tokens"),
            g3.alias("_g3"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.size("_g3").cast("bigint").alias("n_grams"),
            (F.size("_g3") - F.size(F.array_distinct("_g3")))
            .cast("bigint")
            .alias("n_dup_grams"),
            F.round(
                (F.size("_g3") - F.size(F.array_distinct("_g3"))).cast("double")
                / F.greatest(F.size("_g3"), F.lit(1)),
                6,
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


@register(
    "count_min_heavy_hitters",
    oracle="""
WITH cnt AS (
  SELECT tk, COUNT(*) AS c FROM (
    SELECT unnest(string_split(text, ' ')) AS tk
    FROM documents WHERE text IS NOT NULL
  ) GROUP BY tk
),
cells AS (
  SELECT d.d,
         CAST(('0x' || substr(md5(tk || ':cm' || d.d), 1, 8)) AS BIGINT) % 1024 AS p,
         CAST(SUM(c) AS BIGINT) AS cell
  FROM cnt, (VALUES (0), (1), (2), (3)) AS d(d)
  GROUP BY d.d, p
),
top AS (
  SELECT tk, c FROM cnt ORDER BY c DESC, tk LIMIT 20
)
SELECT t.tk AS token,
       CAST(t.c AS BIGINT) AS exact_cnt,
       MIN(cl.cell) AS cms_est,
       CAST(MIN(cl.cell) - t.c AS BIGINT) AS overcount
FROM top t
JOIN cells cl
  ON cl.p = CAST(('0x' || substr(md5(t.tk || ':cm' || cl.d), 1, 8)) AS BIGINT) % 1024
GROUP BY t.tk, t.c
ORDER BY exact_cnt DESC, token
""",
)
def count_min_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (depth 4 x width 1024) estimating the frequencies of
    the top-20 tokens — the streaming-friendly heavy-hitter summary (HLL
    covers distinct counts; CMS covers frequencies). The sketch is built
    FROM the per-token aggregate (sum token counts into cells), not from
    raw instances, so the corpus is scanned once; the 4096-cell sketch
    broadcasts to the probe. One-sided error (est >= exact, pinned in
    tests) with the usual e/w overcount bound. md5 hash family: DuckDB
    builds the bit-identical sketch, so even collision overcounts
    value-hash-match."""
    docs = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    WIDTH, DEPTH = 1024, 4
    cnt = (
        docs.select(F.explode(F.split("text", " ")).alias("tk"))
        .groupBy("tk")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)  # feeds cells, top-k AND the probe
    )

    def pos(tok_col, d: int):
        return (
            F.conv(
                F.substring(F.md5(F.concat(tok_col, F.lit(f":cm{d}"))), 1, 8), 16, 10
            ).cast("long")
            % WIDTH
        )

    cells = (
        cnt.select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(d).alias("d"), pos(F.col("tk"), d).alias("p"))
                        for d in range(DEPTH)
                    ]
                )
            ).alias("dp"),
            "c",
        )
        .groupBy(F.col("dp.d").alias("d"), F.col("dp.p").alias("p"))
        .agg(F.sum("c").cast("bigint").alias("cell"))
    )
    top = cnt.orderBy(F.desc("c"), F.asc("tk")).limit(20)
    probes = top.select(
        F.col("tk").alias("token"),
        F.col("c").cast("bigint").alias("exact_cnt"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(d).alias("d"), pos(F.col("tk"), d).alias("p"))
                    for d in range(DEPTH)
                ]
            )
        ).alias("dp"),
    )
    return (
        probes.join(
            F.broadcast(cells),
            (F.col("dp.d") == F.col("d")) & (F.col("dp.p") == F.col("p")),
        )
        .groupBy("token", "exact_cnt")
        .agg(F.min("cell").alias("cms_est"))
        .select(
            "token",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).cast("bigint").alias("overcount"),
        )
        .orderBy(F.desc("exact_cnt"), "token")
    )


@register(
    "percentile_disc_prices",
    oracle="""
WITH r AS (
  SELECT l_returnflag, l_extendedprice,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rk,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
)
SELECT l_returnflag,
       MAX(CASE WHEN rk = CAST(CEIL(0.50 * n) AS BIGINT) THEN l_extendedprice END) AS p50,
       MAX(CASE WHEN rk = CAST(CEIL(0.90 * n) AS BIGINT) THEN l_extendedprice END) AS p90,
       MAX(CASE WHEN rk = CAST(CEIL(0.99 * n) AS BIGINT) THEN l_extendedprice END) AS p99
FROM r
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def percentile_disc_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DISCRETE percentiles (p50/p90/p99 of extended price per return
    flag): the value at rank ceil(p*n) in the sorted group — no
    interpolation, no float arithmetic, so both engines read the same
    parquet double back out and the family's driver row is a full value
    hash (percentile_approx_prices stays the documented sketch/scale path,
    rows-only + epsilon-pinned; median_exact the interpolating exact form).
    Per-group window over a 3-value key: exact-by-sorting is the oracle
    twin's cost by design, same status as median_exact_prices."""
    from pyspark.sql.window import Window as W

    li = t(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_returnflag").orderBy("l_extendedprice")
    wn = W.partitionBy("l_returnflag")
    r = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def at(p: float, name: str):
        return F.max(
            F.when(
                F.col("rk") == F.ceil(F.lit(p) * F.col("n")).cast("long"),
                F.col("l_extendedprice"),
            )
        ).alias(name)

    return (
        r.groupBy("l_returnflag")
        .agg(at(0.50, "p50"), at(0.90, "p90"), at(0.99, "p99"))
        .orderBy("l_returnflag")
    )


@register(
    "deterministic_sample_pct",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':smp'), 1, 8)) AS BIGINT)
      / 4294967296.0 < 0.15
ORDER BY o_orderkey
""",
)
def deterministic_sample_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~15% Bernoulli sample selected by md5-uniform(key) — the
    driver-checkable twin of TABLESAMPLE (tablesample_seeded stays rows-only:
    its RNG is engine-specific, while this form picks the SAME rows in any
    engine, which is what an auditable 100 TB pipeline actually wants from a
    sample). Map-only: the predicate evaluates in the scan stage."""
    orders = t(spark, sf_dir, "orders")
    return (
        orders.filter(packing.uniform_unit("o_orderkey", "smp") < 0.15)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    )
