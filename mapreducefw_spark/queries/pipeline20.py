"""Round-8 batch 1: scale escape hatches + the end-to-end batch corpus-prep
composition.

Semantic contract with the reference engine: each query is the same
map -> shuffle-by-key -> reduce -> sort job shape
(`/root/reference/MapReduceClient.h:47-51`, `MRFCore.cpp:252-446`);
``corpus_prep_pipeline`` chains five such jobs the way `SearchMRC.cpp`
chains filter -> re-key -> collect, but as ONE declarative plan so
Catalyst fuses the stages.

Scale posture:
- ``ks_two_sample_bucketed`` / ``mann_whitney_u_bucketed``: the 100 TB
  escape hatch promised by the exact forms' docstrings (pipeline19) —
  identical tests on a fixed-width-bucketed value axis, so the
  unpartitioned ECDF/rank cumsum frame is bounded at
  O(value_range / width) no matter how many distinct lengths the corpus
  grows. Width-1 is pytest-pinned bit-equal to the exact forms.
- ``corpus_prep_pipeline``: Gopher gates are per-row array expressions
  (one scan); exact dedup shuffles md5(text) digests, never raw text;
  decontamination shuffles 48-bit gram hashes; every per-source frame
  after that is bucket-count sized and broadcast. The wide per-doc gated
  frame is localCheckpoint'ed once (the ngram_overlap_decontam lesson:
  three consumers would otherwise re-run tokenize+md5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t
from mapreducefw_spark.queries.pipeline15 import CONTAM_MOD
from mapreducefw_spark.queries.pipeline16 import STOPWORDS
from mapreducefw_spark.queries.pipeline19 import (
    _ks_frame,
    _mwu_frame,
    _src_value_counts,
)

BUCKET_WIDTH = 16  # value-axis coarsening for the bucketed drift tests

_BUCKETED_VALS_SQL = f"""
  SELECT CAST(FLOOR(n_chars / {BUCKET_WIDTH}.0) AS BIGINT) AS v,
         CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS c0,
         CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS c1
  FROM documents
  WHERE source IN ('src0', 'src1') AND n_chars IS NOT NULL
  GROUP BY 1
"""


@register(
    "ks_two_sample_bucketed",
    oracle=f"""
WITH vals AS ({_BUCKETED_VALS_SQL}),
tot AS (
  SELECT CAST(SUM(c0) AS BIGINT) AS n0, CAST(SUM(c1) AS BIGINT) AS n1 FROM vals
),
ecdf AS (
  SELECT SUM(c0) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum0,
         SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1
  FROM vals
)
SELECT n0, n1,
       MAX(ABS(CAST(cum0 AS DOUBLE) / n0 - CAST(cum1 AS DOUBLE) / n1)) AS d_stat,
       ROUND(1.358 * SQRT((n0 + n1) / (CAST(n0 AS DOUBLE) * n1)), 6) AS d_crit_95
FROM ecdf, tot
GROUP BY n0, n1
""",
)
def ks_two_sample_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ks_two_sample`` on a fixed-width-bucketed value axis: lengths are
    coarsened to floor(v / 16) BEFORE the grid aggregation, so the D
    statistic is evaluated at bucket boundaries only — a conservative
    (lower-bound) D whose cumsum frame is bounded at
    O(value_range / width) independent of corpus size. This is the
    documented 100 TB path for the drift monitor when the distinct-length
    grid itself grows; with width=1 it is bit-identical to the exact form
    (pytest-pinned, tests/test_stat_bucketed.py). Same exactness argument
    as the exact form: every ECDF step is an integer/total division of
    identical operands."""
    return _ks_frame(_src_value_counts(spark, sf_dir, width=BUCKET_WIDTH))


@register(
    "mann_whitney_u_bucketed",
    oracle=f"""
WITH vals AS ({_BUCKETED_VALS_SQL}),
grid AS (
  SELECT c0, c1, c0 + c1 AS cnt,
         SUM(c0 + c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - (c0 + c1) AS cum_before
  FROM vals
),
s AS (
  SELECT CAST(SUM(c0) AS BIGINT) AS n0, CAST(SUM(c1) AS BIGINT) AS n1,
         SUM(c0 * (cum_before + (cnt + 1) / 2.0)) AS r0,
         CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS ties
  FROM grid
)
SELECT n0, n1,
       r0 - n0 * (n0 + 1) / 2.0 AS u0,
       ROUND((r0 - n0 * (n0 + 1) / 2.0 - n0 * n1 / 2.0)
             / SQRT((CAST(n0 AS DOUBLE) * n1 / 12.0)
                    * ((n0 + n1 + 1) - CAST(ties AS DOUBLE) / ((n0 + n1) * (n0 + n1 - 1.0)))), 6) AS z_tie_corrected
FROM s
""",
)
def mann_whitney_u_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mann_whitney_u`` on the same fixed-width-bucketed axis: values
    sharing a bucket become one tied block, and the tie-corrected normal
    approximation absorbs the coarsening exactly (that is what the tie
    correction is FOR) — the rank sums stay exact multiples of 0.5, so no
    rounding beyond the final z. Width-1 is pytest-pinned bit-equal to
    the exact form; any width bounds the rank cumsum frame at
    O(value_range / width)."""
    return _mwu_frame(_src_value_counts(spark, sf_dir, width=BUCKET_WIDTH))


DECONTAM_MAX = 0.2  # max benchmark 5-gram overlap fraction to keep a doc
PREP_ALPHA = 0.7  # temperature-mix exponent (mT5/PaLM), as pipeline15
PREP_BUDGET = 1_000_000  # token budget to allocate across sources
PREP_SHARDS = 16  # output shard count for the final assignment


@register(
    "corpus_prep_pipeline",
    oracle=f"""
WITH base AS (
  SELECT doc_id, source, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks,
         (doc_id % {CONTAM_MOD} = 0) AS is_bench
  FROM documents
  WHERE text IS NOT NULL AND source IS NOT NULL
),
gated AS (
  SELECT doc_id, source, text, CAST(len(toks) AS BIGINT) AS n_words, is_bench,
         (len(toks) BETWEEN 20 AND 1000
          AND COALESCE(CAST(list_sum(list_transform(toks, x -> strlen(x))) AS DOUBLE) / len(toks)
                       BETWEEN 2 AND 12, FALSE)
          AND COALESCE(CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE) / len(toks)
                       >= 0.8, FALSE)
          AND len(list_filter(toks, x -> list_contains({list(STOPWORDS)}, x))) >= 2) AS passes
  FROM base
),
corpus AS (SELECT * FROM gated WHERE NOT is_bench),
quality AS (SELECT * FROM corpus WHERE passes),
uniq AS (
  SELECT * FROM (
    SELECT doc_id, source, text, n_words,
           ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM quality
  ) WHERE rn = 1
),
grams AS (
  SELECT doc_id, source, n_words,
         CASE WHEN len(string_split(text, ' ')) >= 5
              THEN list_distinct(list_transform(generate_series(1, len(string_split(text, ' ')) - 4),
                   i -> CAST(('0x' || substr(md5(array_to_string(list_slice(string_split(text, ' '), i, i + 4), ' ')), 1, 12)) AS BIGINT)))
              ELSE [] END AS gh
  FROM uniq
),
bench AS (
  SELECT DISTINCT unnest(CASE WHEN len(string_split(text, ' ')) >= 5
              THEN list_distinct(list_transform(generate_series(1, len(string_split(text, ' ')) - 4),
                   i -> CAST(('0x' || substr(md5(array_to_string(list_slice(string_split(text, ' '), i, i + 4), ' ')), 1, 12)) AS BIGINT)))
              ELSE [] END) AS h
  FROM gated WHERE is_bench
),
hits AS (
  SELECT i.doc_id, COUNT(*) AS n_hit
  FROM (SELECT doc_id, unnest(gh) AS h FROM grams) i JOIN bench b ON i.h = b.h
  GROUP BY i.doc_id
),
clean AS (
  SELECT g.doc_id, g.source, g.n_words,
         CAST(('0x' || substr(md5(CAST(g.doc_id AS VARCHAR)), 1, 12)) AS BIGINT)
           % {PREP_SHARDS} AS shard
  FROM grams g LEFT JOIN hits h USING (doc_id)
  WHERE CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / greatest(len(g.gh), 1) <= {DECONTAM_MAX}
),
a AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM corpus GROUP BY 1),
b AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_quality FROM quality GROUP BY 1),
u AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_unique FROM uniq GROUP BY 1),
per_shard AS (
  SELECT source, shard, COUNT(*) AS n FROM clean GROUP BY 1, 2
),
c AS (
  SELECT source, CAST(SUM(n) AS BIGINT) AS n_clean,
         CAST(COUNT(*) AS BIGINT) AS n_shards_used,
         CAST(MAX(n) AS BIGINT) AS max_shard_docs
  FROM per_shard GROUP BY 1
),
tk AS (SELECT source, CAST(SUM(n_words) AS BIGINT) AS n_tokens FROM clean GROUP BY 1),
joined AS (
  SELECT a.source, a.n_docs,
         COALESCE(b.n_quality, 0) AS n_quality,
         COALESCE(u.n_unique, 0) AS n_unique,
         COALESCE(c.n_clean, 0) AS n_clean,
         COALESCE(tk.n_tokens, 0) AS n_tokens,
         COALESCE(c.n_shards_used, 0) AS n_shards_used,
         COALESCE(c.max_shard_docs, 0) AS max_shard_docs
  FROM a LEFT JOIN b USING (source) LEFT JOIN u USING (source)
         LEFT JOIN c USING (source) LEFT JOIN tk USING (source)
),
tot AS (SELECT SUM(n_tokens) AS tt FROM joined),
w AS (
  SELECT joined.*,
         CASE WHEN tot.tt > 0 THEN power(n_tokens / tot.tt, {PREP_ALPHA}) ELSE 0 END AS raw_w
  FROM joined CROSS JOIN tot
),
z AS (SELECT SUM(raw_w) AS z FROM w)
SELECT source, n_docs, n_quality, n_unique, n_clean, n_tokens,
       ROUND(CASE WHEN z.z > 0 THEN raw_w / z.z ELSE 0 END, 6) AS mix_weight,
       CAST(floor(CASE WHEN z.z > 0 THEN raw_w / z.z ELSE 0 END * {PREP_BUDGET}) AS BIGINT) AS alloc_tokens,
       n_shards_used, max_shard_docs
FROM w CROSS JOIN z
ORDER BY source
""",
)
def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end batch corpus preparation as ONE declarative plan — the
    batch twin of the streaming ingest gate (streaming/ingest.py): Gopher
    quality rules -> exact dedup -> benchmark n-gram decontamination ->
    temperature mixture weights -> shard assignment, reporting the
    per-source attrition funnel, token allocation, and shard balance.

    Stage semantics (each individually oracle-proven by its standalone
    query; this composition is where integration bugs would hide):
    1. Gopher gates (gopher_quality_rules): word-count 20..1000,
       mean-word-len 2..12, frac-alpha >= 0.8, >= 2 stopwords.
    2. Exact dedup (dedup_canonical_selection): one survivor per distinct
       text, min doc_id wins; the dedup key is md5(text) so raw text
       never shuffles.
    3. Decontam (ngram_overlap_decontam): docs with > 20% of their
       distinct 5-grams in the benchmark set (doc_id % 97 == 0, held out
       up front) are quarantined. Benchmark docs are NOT quality-gated —
       an eval suite is given, not filtered.
    4. Temperature mix (temperature_mix_allocation): per-source token
       share p^0.7 renormalized, floor-allocated against a fixed budget.
    5. Shard assignment (group_aware_split idiom): 48-bit md5(doc_id)
       % 16; reports shards used + max shard size per source.

    Determinism: counts are exact integers; the only float outputs are
    the pow-based mix weight (ROUND 6; pow drift ~1e-16 relative) and the
    floor allocation on the unrounded weight, both evaluated identically
    by the two engines. The overlap threshold compares an exact
    int/int division on both sides. Sources whose every clean doc count
    is zero keep weight pow(0, .7) = 0 on both engines."""
    docs = t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    base = docs.select(
        "doc_id", "source", "text", toks.alias("toks"),
        (F.col("doc_id") % CONTAM_MOD == 0).alias("is_bench"),
    )
    n_words = F.size("toks").cast("bigint")
    sum_len = F.aggregate(
        "toks", F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
    )
    nz = F.size("toks") > 0
    mean_len = F.when(nz, sum_len.cast("double") / F.size("toks"))
    n_alpha = F.size(F.filter("toks", lambda x: x.rlike("[a-zA-Z]")))
    frac_alpha = F.when(nz, n_alpha.cast("double") / F.size("toks"))
    n_stop = F.size(
        F.filter(
            "toks",
            lambda x: F.array_contains(F.array(*[F.lit(s) for s in STOPWORDS]), x),
        )
    )
    passes = (
        F.size("toks").between(20, 1000)
        & F.coalesce(mean_len.between(2, 12), F.lit(False))
        & F.coalesce(frac_alpha >= 0.8, F.lit(False))
        & (n_stop >= 2)
    )
    # one materialization: the gated frame feeds the benchmark gram set,
    # three funnel counts, and the gram/decontam path
    gated = base.select(
        "doc_id", "source", "text", n_words.alias("n_words"), "is_bench",
        passes.alias("passes"),
    ).localCheckpoint(eager=False)

    corpus = gated.filter(~F.col("is_bench"))
    quality = corpus.filter("passes")
    dw = W.partitionBy(F.md5("text")).orderBy("doc_id")
    uniq = (
        quality.withColumn("rn", F.row_number().over(dw))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    gh = F.when(
        F.size(F.split("text", " ")) >= 5,
        F.array_distinct(
            F.expr(
                "transform(sequence(1, size(split(text, ' ')) - 4), "
                "i -> cast(conv(substr(md5(array_join(slice(split(text, ' '), i, 5), ' ')), 1, 12), 16, 10) as bigint))"
            )
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    # NOTE (r14 measured negative): repartitioning `uniq` below the
    # per-gram md5 transform (the AQE-coalesce-class stage the r13 log
    # flagged) was tried and CPU-probed at 2.17 -> 8.51 CPU-s, wall
    # 4.12 -> 5.99s — the same multi-consumer-checkpoint x tiny-partition
    # loss signature as the r13 gated-scan spread. Do not re-try blind.
    grams = uniq.select("doc_id", "source", "n_words", gh.alias("gh")).localCheckpoint(
        eager=False
    )
    bench = (
        gated.filter("is_bench")
        .select(F.explode(gh).alias("h"))
        .distinct()
    )
    inst = grams.select("doc_id", F.explode("gh").alias("h"))
    hits = inst.join(bench, "h").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("bigint")
        % PREP_SHARDS
    )
    clean = (
        grams.join(hits, "doc_id", "left")
        .filter(
            F.coalesce("n_hit", F.lit(0)).cast("double")
            / F.greatest(F.size("gh"), F.lit(1))
            <= DECONTAM_MAX
        )
        .select("doc_id", "source", "n_words", shard.alias("shard"))
    )

    a = corpus.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    b = quality.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_quality")
    )
    u = uniq.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_unique"))
    per_shard = clean.groupBy("source", "shard").agg(F.count(F.lit(1)).alias("n"))
    c = per_shard.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_clean"),
        F.count(F.lit(1)).cast("bigint").alias("n_shards_used"),
        F.max("n").cast("bigint").alias("max_shard_docs"),
    )
    tk = clean.groupBy("source").agg(F.sum("n_words").cast("bigint").alias("n_tokens"))
    joined = (
        a.join(b, "source", "left")
        .join(u, "source", "left")
        .join(c, "source", "left")
        .join(tk, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_quality", F.lit(0)).alias("n_quality"),
            F.coalesce("n_unique", F.lit(0)).alias("n_unique"),
            F.coalesce("n_clean", F.lit(0)).alias("n_clean"),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_shards_used", F.lit(0)).alias("n_shards_used"),
            F.coalesce("max_shard_docs", F.lit(0)).alias("max_shard_docs"),
        )
    )
    tot = joined.agg(F.sum("n_tokens").alias("tt"))
    # tt == 0 (every doc gated out) would make n_tokens/tt NaN and poison
    # pow/floor differently per engine — weight 0 is the defined answer
    raw_w = F.when(
        F.col("tt") > 0, F.pow(F.col("n_tokens") / F.col("tt"), F.lit(PREP_ALPHA))
    ).otherwise(F.lit(0.0))
    w = joined.crossJoin(F.broadcast(tot)).select("*", raw_w.alias("raw_w"))
    z = w.agg(F.sum("raw_w").alias("z"))
    mix = F.when(F.col("z") > 0, F.col("raw_w") / F.col("z")).otherwise(F.lit(0.0))
    return (
        w.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            "n_quality",
            "n_unique",
            "n_clean",
            "n_tokens",
            F.round(mix, 6).alias("mix_weight"),
            F.floor(mix * PREP_BUDGET).cast("bigint").alias("alloc_tokens"),
            "n_shards_used",
            "max_shard_docs",
        )
        .orderBy("source")
    )
