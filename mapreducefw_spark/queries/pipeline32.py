"""Round-9 batch (pipeline32): trend/changepoint completions, embedding
cosine near-dup pairs, stop-gram boilerplate mining, lexical hapax stats.

Five additions, deliberately few (the r8 verdict capped round-9 growth
below the 50-row/round verification budget): the two rank-based
time-series tests that complete the Theil-Sen/CUSUM family
(Mann-Kendall significance for the slope, Pettitt for the changepoint),
the embedding-cosine near-duplicate pair scan the LLM-dedup tier listed
only as rows-only forms until now, and two corpus-lexicon signals
(frequent-5-gram boilerplate mining, hapax/type-token ratios).

Semantic contract with the reference engine: every query is the
map -> shuffle-by-key -> reduce -> sort job shape
(`/root/reference/MapReduceClient.h:47-51`, `MRFCore.cpp:252-446`).

Scale posture:
- mann_kendall runs its O(days²) sign self-join on the CALENDAR-BOUNDED
  day grid (the theil_sen_trend contract — fixed cost at any fact
  volume); pettitt is rank + two bounded-grid cumsums, no self-join.
- embedding near-dup is the id-bounded brute witness (fixed O(n²));
  the production path is the LSH/SemDeDup/IVF tier in
  operators/similarity.py.
- stop-gram df counts and hapax stats shuffle (source, gram)/(source,
  token) count partials after map-side combine — vocabulary/instance
  sized, never documents (the inverted_index_postings growth mode).
- cross-engine determinism: MK's S and Pettitt's U/K are exact integers
  (DECIMAL sign comparisons, integer rank sums); z/p take one sqrt/exp
  over bit-identical doubles, then ROUND(6); cosines fold identical
  double products in index order on both engines, ROUND(6)-ed before
  thresholding so the cut compares identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import dec, t

# Days whose every price is NULL aggregate to xd = NULL; they carry no
# rankable revenue, and a NULL rank key would diverge (Spark windows sort
# NULLS FIRST, DuckDB NULLS LAST — the pettitt midrank would differ), so
# both engines EXCLUDE them from the series.
_DAILY_SQL = """
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS xd
  FROM orders WHERE o_orderdate IS NOT NULL
  GROUP BY 1
  HAVING SUM(CAST(o_totalprice AS DECIMAL(12,2))) IS NOT NULL
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum(dec("o_totalprice")).cast("decimal(18,2)").alias("xd"))
        .filter(F.col("xd").isNotNull())
    )


@register(
    "mann_kendall_trend",
    oracle=f"""
WITH daily AS ({_DAILY_SQL}),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
s AS (
  SELECT CAST(SUM(CAST(SIGN(b.xd - a.xd) AS INT)) AS BIGINT) AS s_stat
  FROM daily a JOIN daily b ON b.d > a.d
),
ties AS (
  SELECT COALESCE(CAST(SUM(c * (c - 1) * (2 * c + 5)) AS BIGINT), 0) AS tie_term
  FROM (SELECT COUNT(*) AS c FROM daily GROUP BY xd) WHERE c > 1
),
v AS (
  SELECT (n_days * (n_days - 1) * (2 * n_days + 5) - tie_term) / 18.0 AS var_s
  FROM n, ties
)
SELECT n.n_days, s.s_stat, ROUND(v.var_s, 6) AS var_s,
       ROUND(CASE WHEN s.s_stat > 0 THEN (s.s_stat - 1) / SQRT(v.var_s)
                  WHEN s.s_stat < 0 THEN (s.s_stat + 1) / SQRT(v.var_s)
                  ELSE 0.0 END, 6) AS z
FROM n, s, v
""",
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test on daily revenue — the nonparametric
    significance companion to `theil_sen_trend` (same day grid, same
    pairwise frame): S = Σ_{{i<j}} sign(x_j − x_i) counts concordant minus
    discordant day pairs, Var(S) carries the standard tie correction
    Σ t(t−1)(2t+5), and the continuity-corrected z = (S∓1)/√Var is the
    reported statistic. S is an EXACT integer (sign over exact DECIMAL
    daily sums — never a float subtraction), the variance is integer
    arithmetic over /18.0, and z spends one IEEE-correctly-rounded sqrt —
    so both engines agree to the bit before ROUND(6). The O(days²) sign
    self-join is CALENDAR-BOUNDED (the theil_sen_trend contract: ≈3M
    pairs for 7 years, fixed at any fact volume); the scan cost is one
    exact-decimal daily aggregate."""
    daily = _daily(spark, sf_dir)
    n = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    b = daily.select(F.col("d").alias("d2"), F.col("xd").alias("xd2"))
    s = (
        daily.join(b, F.col("d2") > F.col("d"))
        .agg(
            F.sum(F.signum(F.col("xd2") - F.col("xd")).cast("int"))
            .cast("bigint")
            .alias("s_stat")
        )
    )
    ties = (
        daily.groupBy("xd")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("c") * (F.col("c") - 1) * (2 * F.col("c") + 5)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    var_s = (
        (
            F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
            - F.col("tie_term")
        )
        / F.lit(18.0)
    ).alias("var_s")
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt("var_s"))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt("var_s"))
        .otherwise(F.lit(0.0))
    )
    return (
        n.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(ties))
        .select("n_days", "s_stat", var_s)
        .select(
            "n_days",
            "s_stat",
            F.round("var_s", 6).alias("var_s"),
            F.round(z, 6).alias("z"),
        )
    )


@register(
    "pettitt_changepoint",
    oracle=f"""
WITH daily AS ({_DAILY_SQL}),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
vals AS (
  SELECT xd, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(COALESCE(SUM(COUNT(*)) OVER (ORDER BY xd
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS n_less
  FROM daily GROUP BY xd
),
w AS (
  SELECT daily.d, 2 * vals.n_less + vals.c - (SELECT n_days FROM n) AS wi
  FROM daily JOIN vals USING (xd)
),
u AS (
  SELECT d, -SUM(wi) OVER (ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ut
  FROM w
),
k AS (SELECT CAST(MAX(ABS(ut)) AS BIGINT) AS k_stat FROM u)
SELECT (SELECT n_days FROM n) AS n_days, k.k_stat,
       MIN(u.d) AS changepoint_day,
       ROUND(2 * EXP(-6.0 * k.k_stat * k.k_stat /
             ((SELECT n_days FROM n) * (SELECT n_days FROM n) * (SELECT n_days FROM n)
              + (SELECT n_days FROM n) * (SELECT n_days FROM n))), 6) AS p_approx
FROM u, k WHERE ABS(u.ut) = k.k_stat GROUP BY k.k_stat
""",
)
def pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt single-changepoint test on daily revenue — the RANK-based
    complement to `cusum_changepoint` (which scans mean shifts and is
    outlier-sensitive): U_t = Σ_{{i≤t}} Σ_{{j>t}} sign(x_j − x_i), the day
    maximizing |U_t| is the changepoint, K = max|U| with the standard
    approximate significance p ≈ 2·exp(−6K²/(n³+n²)). The O(n²) double
    sum NEVER materializes: with midranks, Σ_j sign(x_i − x_j) =
    2·rank_i − n − 1 exactly (ties included), so U_t is the negative
    running sum of per-day integers W_i = 2·n_less + ties − n — one
    value-grid window for the ranks plus one day-grid cumsum, both on
    CALENDAR/VALUE-BOUNDED frames (the documented sequence_pack_spans
    class). U and K are exact integers on both engines; p spends one
    exp over a bit-identical double, ROUND(6). Ties in the argmax break
    to the earliest day (MIN over the exact-equality filter)."""
    daily = _daily(spark, sf_dir)
    n = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    vw = W.orderBy("xd").rowsBetween(W.unboundedPreceding, -1)
    vals = (
        daily.groupBy("xd")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .select(
            "xd",
            "c",
            F.coalesce(F.sum("c").over(vw), F.lit(0)).cast("bigint").alias("n_less"),
        )
    )
    w = (
        daily.join(vals, "xd")
        .crossJoin(F.broadcast(n))
        .select(
            "d", (2 * F.col("n_less") + F.col("c") - F.col("n_days")).alias("wi")
        )
    )
    cw = W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    u = w.select("d", (-F.sum("wi").over(cw)).alias("ut"))
    k = u.agg(F.max(F.abs("ut")).cast("bigint").alias("k_stat"))
    nd = F.col("n_days")
    p = 2 * F.exp(
        -6.0 * F.col("k_stat") * F.col("k_stat") / (nd * nd * nd + nd * nd)
    )
    return (
        u.join(F.broadcast(k))
        .filter(F.abs("ut") == F.col("k_stat"))
        .groupBy("k_stat")
        .agg(F.min("d").alias("changepoint_day"))
        .crossJoin(F.broadcast(n))
        .select("n_days", "k_stat", "changepoint_day", F.round(p, 6).alias("p_approx"))
    )


@register(
    "embedding_near_dup_pairs",
    oracle="""
WITH ok AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
    AND vec_id < 400
),
corpus AS (
  SELECT vec_id, e FROM ok
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, e FROM ok WHERE vec_id % 10 = 0
),
nz AS (
  -- the norm FILTER uses the NULL-safe list_sum form: AND-ed WHERE
  -- predicates have no evaluation order, and list_dot_product raises on
  -- a NULL element if the optimizer tries it before ok's element filter
  SELECT vec_id, e, SQRT(list_dot_product(e, e)) AS nrm
  FROM corpus WHERE COALESCE(list_sum(list_transform(e, x -> x * x)), 0) > 0
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS cos_sim
FROM nz a JOIN nz b ON a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) >= 0.999
ORDER BY id_a, id_b
""",
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ 0.999) — the exact
    witness for the embedding-dedup tier: every 10th vector of the
    id-bounded vec_id < 400 subset is re-unioned as an exact copy
    (+100000 id, the simhash_portable_pairs idiom), so the scan always
    proves real matches; random synthetic vectors sit far below the
    threshold, so the output is exactly the duplicate structure. Both
    engines fold the same double products in index order and divide by
    the same sqrt norms, then ROUND(6) BEFORE thresholding — the cut
    compares identical values, never 1-ulp neighbors. The O(n²) pair
    scan is id-bounded (fixed cost at any sf); the production path is
    the LSH-bucketed / SemDeDup-cell / IVF tier
    (`operators/similarity.py:49,156,403` — candidates only within
    buckets/cells, never all-pairs). Zero-norm vectors are excluded
    (cosine undefined), NULL-element vectors dropped by the loader
    contract (`operators/similarity.py:75`)."""
    from mapreducefw_spark.operators.similarity import _dot, as_double_vecs

    base = as_double_vecs(t(spark, sf_dir, "embeddings")).filter(F.col("vid") < 400)
    corpus = base.unionByName(
        base.filter(F.col("vid") % 10 == 0).select(
            (F.col("vid") + 100000).alias("vid"), "vec"
        )
    )
    nz = corpus.select(
        "vid", "vec", F.sqrt(_dot(F.col("vec"), F.col("vec"))).alias("nrm")
    ).filter(_dot(F.col("vec"), F.col("vec")) > 0)
    a = nz.select(
        F.col("vid").alias("id_a"), F.col("vec").alias("va"), F.col("nrm").alias("na")
    )
    b = nz.select(
        F.col("vid").alias("id_b"), F.col("vec").alias("vb"), F.col("nrm").alias("nb")
    )
    cos = F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.999)
        .orderBy("id_a", "id_b")
    )


@register(
    "stop_gram_boilerplate",
    oracle="""
WITH dg AS (
  SELECT DISTINCT source, doc_id,
         array_to_string(list_slice(string_split(text, ' '), i, i + 4), ' ') AS gram
  FROM documents
  CROSS JOIN UNNEST(range(1, 10000)) AS t(i)
  WHERE text IS NOT NULL
    AND len(string_split(text, ' ')) >= 5
    AND i <= len(string_split(text, ' ')) - 4
),
df AS (
  SELECT source, gram, CAST(COUNT(*) AS BIGINT) AS doc_freq
  FROM dg GROUP BY source, gram
),
rk AS (
  SELECT source, gram, doc_freq,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY doc_freq DESC, gram ASC) AS INT) AS rnk
  FROM df WHERE doc_freq >= 2
)
SELECT source, gram, doc_freq, rnk FROM rk WHERE rnk <= 3
ORDER BY source NULLS LAST, rnk
""",
)
def stop_gram_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-5-gram boilerplate mining: the top-3 word 5-grams per
    source by DOCUMENT frequency (distinct doc count, df ≥ 2) — the
    C4-style 'stop gram' list that seeds line/paragraph-level boilerplate
    stripping, complementing `boilerplate_prefix_dup` (which only sees
    shared prefixes). Grams are raw split-on-space windows (the
    ngram_overlap_decontam contract, so both engines slice identical
    positions); per-doc DISTINCT collapses within-doc repetition so a
    single spammy doc can't fake a source-wide template. Shuffles carry
    (source, gram) count partials after map-side combine — instance-
    sized like inverted_index_postings, never documents; the top-3 is a
    per-source window over the df grid (vocabulary-sized, partitioned).
    ROW_NUMBER ties break on the ASCII gram text identically on both
    engines."""
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = F.split("text", " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 4),
        lambda i: F.array_join(F.slice(toks, i, 5), " "),
    )
    dg = (
        d.filter(F.size(toks) >= 5)
        .select("source", "doc_id", F.explode(F.array_distinct(grams)).alias("gram"))
        .distinct()
    )
    df = dg.groupBy("source", "gram").agg(
        F.count(F.lit(1)).cast("bigint").alias("doc_freq")
    )
    rw = W.partitionBy("source").orderBy(F.desc("doc_freq"), F.asc("gram"))
    return (
        df.filter(F.col("doc_freq") >= 2)
        .select(
            "source",
            "gram",
            "doc_freq",
            F.row_number().over(rw).cast("int").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
        .orderBy(F.asc_nulls_last("source"), "rnk")
    )


@register(
    "hapax_legomena_stats",
    oracle="""
WITH tk AS (
  SELECT source, token
  FROM (SELECT source, UNNEST(string_split(text, ' ')) AS token FROM documents)
  WHERE token <> ''
),
grid AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
  FROM tk GROUP BY source, token
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_instances,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS type_token_ratio,
       ROUND(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS hapax_share
FROM grid
GROUP BY source
ORDER BY source NULLS LAST
""",
)
def hapax_legomena_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical richness: token instances, distinct types,
    hapax legomena (types seen exactly once in the source), type-token
    ratio and the hapax share — the Heaps'-law-adjacent signals that
    separate natural text (hapax-heavy) from template/boilerplate
    corpora (hapax-starved), and the sanity denominators for
    `zipf_alpha_by_source`. One (source, token) grid aggregate (count
    partials after map-side combine — raw text never shuffles), then an
    O(vocabulary) re-aggregation; integer counts with two exact
    divisions, ROUND(6). NULL texts tokenize to zero rows on both
    engines; a NULL source is its own group, sorted last on both."""
    d = t(spark, sf_dir, "documents")
    grid = (
        d.select("source", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    return (
        grid.groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_instances"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_hapax"),
            F.round(F.count(F.lit(1)).cast("double") / F.sum("c"), 6).alias(
                "type_token_ratio"
            ),
            F.round(
                F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("hapax_share"),
        )
        .orderBy(F.asc_nulls_last("source"))
    )
