"""Round-9 batch (pipeline32): trend/changepoint completions, embedding
cosine near-dup pairs, stop-gram boilerplate mining, lexical hapax stats,
Cochran-Armitage ordered trend, cross-source duplication matrix, and the
oracle-paired twin of the random-hyperplane LSH ANN.

Nine additions, deliberately few (the r8 verdict capped round-9 growth
below the 50-row/round verification budget): the two rank-based
time-series tests that complete the Theil-Sen/CUSUM family
(Mann-Kendall significance for the slope, Pettitt for the changepoint),
the embedding-cosine near-duplicate pair scan the LLM-dedup tier listed
only as rows-only forms until now, two corpus-lexicon signals
(frequent-5-gram boilerplate mining, hapax/type-token ratios), the
ordered-alternative chi-square (Cochran-Armitage), the source-level
contamination matrix (which feeds mirror each other, before doc-level
dedup), and the portable LSH pair `embedding_lsh_topk_portable` /
`embedding_lsh_dedup_portable` — the production random-hyperplane LSH
operator value-hash checked end-to-end from its own sha256 plane
literals, in both search (query×corpus top-k) and dedup (corpus
self-join) modes.

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
- cochran-armitage folds exact BIGINT Σ's over the 7-row dow grid; the
  cross-source matrix shuffles 32-byte md5 digests, never text.
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
WITH toks AS (
  SELECT source, string_split(text, ' ') AS tk FROM documents
  WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 5
),
dg AS (
  SELECT source,
         UNNEST(list_distinct(list_transform(
           range(1, len(tk) - 3),
           i -> array_to_string(list_slice(tk, i, i + 4), ' ')))) AS gram
  FROM toks
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
    positions); doc frequency counts document RECORDS, with within-record
    repetition collapsed MAP-SIDE by array_distinct (DuckDB mirrors via
    list_distinct + UNNEST) — so a single spammy doc can't fake a
    source-wide template and the shuffle carries (source, gram) COUNT
    PARTIALS after map-side combine — the mr_wordcount shape. Measured
    honestly (SHUFFLE.md): on the high-entropy synthetic corpus most
    5-grams are unique, so the distinct vocabulary IS instance-sized and
    the ratio floors at ~11x COMPRESSED input — the dup_passage /
    doc_keywords growth mode, linear never quadratic; on a real
    boilerplate-heavy corpus the combine collapses exactly the repeated
    grams that matter. Three drafts were measured before settling here:
    a (source, doc_id, gram) pre-aggregation DISTINCT shuffled text per
    instance at 24x and defeated the combine entirely; hash-keyed
    counting + winner join-back halved bytes (12.7x) but re-exploded the
    corpus twice and ran 1.6x slower; this one-pass form is the fastest
    (2.6s vs 3.4/5.3 at sf0.1) and combine-eligible. Top-3 per source by
    (df DESC, gram ASC), a source-partitioned window over the df grid."""
    from mapreducefw_spark.operators.textprep import ensure_parallelism

    # gram slicing/joining is this query's CPU (r13 stage probe: 2.8s on
    # ONE task from the unsplittable fixture scan) — spread the scan;
    # the (source, gram) count partials are exact either way
    d = ensure_parallelism(
        t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    )
    toks = F.split("text", " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 4),
        lambda i: F.array_join(F.slice(toks, i, 5), " "),
    )
    dg = d.filter(F.size(toks) >= 5).select(
        "source", F.explode(F.array_distinct(grams)).alias("gram")
    )
    df = dg.groupBy("source", "gram").agg(
        F.count(F.lit(1)).cast("bigint").alias("doc_freq")
    )
    from mapreducefw_spark.operators.rank import topk_per_key

    # two-phase per-key top-k (operators/rank.py): the per-source rank
    # otherwise sorts each source's whole df>=2 gram vocabulary in one task
    return (
        topk_per_key(
            df.filter(F.col("doc_freq") >= 2),
            ["source"],
            [F.desc("doc_freq"), F.asc("gram")],
            3,
            rank_col="rnk",
        )
        .select("source", "gram", "doc_freq", F.col("rnk").cast("int").alias("rnk"))
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


@register(
    "cochran_armitage_trend",
    oracle="""
WITH g AS (
  SELECT isodow(CAST(o_orderdate AS DATE)) AS w,
         CAST(COUNT(*) AS BIGINT) AS n_i,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
              AS BIGINT) AS r_i
  FROM orders WHERE o_orderdate IS NOT NULL
  GROUP BY 1
),
s AS (
  SELECT CAST(SUM(n_i) AS BIGINT) AS n,
         CAST(SUM(r_i) AS BIGINT) AS r,
         CAST(SUM(w * r_i) AS BIGINT) AS swr,
         CAST(SUM(w * n_i) AS BIGINT) AS swn,
         CAST(SUM(w * w * n_i) AS BIGINT) AS sw2n
  FROM g
),
q AS (
  SELECT n, r, swr, swn,
         (CAST(r AS DOUBLE) / n) * (1 - CAST(r AS DOUBLE) / n)
           * (sw2n - CAST(swn AS DOUBLE) * swn / n) AS vr
  FROM s
)
SELECT n AS n_total, r AS n_urgent,
       CASE WHEN vr > 0
            THEN ROUND((swr - CAST(r AS DOUBLE) * swn / n) / SQRT(vr), 6)
       END AS z
FROM q
""",
)
def cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test: is the urgent-order RATE monotone in
    the ISO day-of-week score (1=Mon..7=Sun)? The ordered-alternative
    complement to `chi_square_independence` (which only detects ANY
    association) — the standard dose-response test for a binary outcome
    across ordered categories. T = Σw·r − (R/N)Σw·n with
    Var = (R/N)(1−R/N)(Σw²n − (Σwn)²/N); every Σ is an exact BIGINT over
    the 7-row dow grid (map-combined cell counts, the chi² shuffle
    shape), so both engines evaluate the identical double expression for
    z — one sqrt, ROUND(6). One scan, vocabulary-sized shuffle, 1-row
    output."""
    g = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .groupBy((F.weekday(F.to_date("o_orderdate")) + 1).alias("w"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_i"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("r_i"),
        )
    )
    s = g.agg(
        F.sum("n_i").cast("bigint").alias("n"),
        F.sum("r_i").cast("bigint").alias("r"),
        F.sum(F.col("w") * F.col("r_i")).cast("bigint").alias("swr"),
        F.sum(F.col("w") * F.col("n_i")).cast("bigint").alias("swn"),
        F.sum(F.col("w") * F.col("w") * F.col("n_i")).cast("bigint").alias("sw2n"),
    )
    rd = F.col("r").cast("double")
    # degenerate inputs (one group, all-urgent or no-urgent) make Var = 0;
    # z is undefined there — NULL on both engines, never DIVIDE_BY_ZERO
    vr = (
        (rd / F.col("n"))
        * (1 - rd / F.col("n"))
        * (F.col("sw2n") - F.col("swn").cast("double") * F.col("swn") / F.col("n"))
    )
    z = F.when(
        vr > 0,
        (F.col("swr") - rd * F.col("swn") / F.col("n")) / F.sqrt(vr),
    )
    return s.select(
        F.col("n").alias("n_total"),
        F.col("r").alias("n_urgent"),
        F.round(z, 6).alias("z"),
    )


@register(
    "cross_source_dup_matrix",
    oracle="""
WITH corpus AS (
  SELECT source, text FROM documents WHERE text IS NOT NULL
  UNION ALL
  SELECT 'mirror' AS source, text
  FROM documents WHERE text IS NOT NULL AND doc_id % 7 = 0
),
sh AS (
  SELECT DISTINCT source, md5(text) AS h FROM corpus
),
tot AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_hashes FROM sh GROUP BY source
)
SELECT a.source AS src_a, b.source AS src_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared,
       ROUND(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(tot.n_hashes), 6)
         AS share_of_a
FROM sh a
JOIN sh b ON b.h = a.h AND b.source IS DISTINCT FROM a.source
JOIN tot ON tot.source IS NOT DISTINCT FROM a.source
GROUP BY a.source, b.source
ORDER BY src_a NULLS LAST, src_b NULLS LAST
""",
)
def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every ordered source pair
    (A, B), how many of A's distinct document hashes also appear in B,
    and what share of A's corpus that is — the source-level copy/mirror
    detector that tells a curation pipeline WHICH feeds duplicate each
    other before doc-level dedup runs (`dedup_rate_by_source` is the
    within-source complement). Shuffles carry 32-byte md5 digests and
    source keys, never text (the dedup_exact contract); the join is
    hash-keyed distinct-pair counting; output is O(sources²). NULL-safe
    source comparison keeps a NULL source as its own feed on both
    engines; integer counts + one division, ROUND(6)."""
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    # every 7th doc re-unioned under a synthetic 'mirror' feed (7 is
    # coprime with the 20-source round-robin, so the mirror overlaps every
    # source): the
    # synthetic corpus has no natural cross-source copies, so the fixture
    # always exercises real matrix rows (the simhash exact-copy idiom)
    corpus = d.select("source", "text").unionByName(
        d.filter(F.col("doc_id") % 7 == 0).select(
            F.lit("mirror").alias("source"), "text"
        )
    )
    sh = corpus.select("source", F.md5("text").alias("h")).distinct()
    tot = sh.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_hashes"))
    a = sh.select(F.col("source").alias("src_a"), "h")
    b = sh.select(F.col("source").alias("src_b"), "h")
    return (
        a.join(b, "h")
        .filter(~F.col("src_b").eqNullSafe(F.col("src_a")))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        # null-SAFE totals join: the oracle uses IS NOT DISTINCT FROM, so a
        # NULL-source feed whose hashes appear elsewhere must keep its
        # (NULL, other) matrix row here too — a plain ["src_a"] equi-join
        # would silently drop it
        .join(
            F.broadcast(tot.select(F.col("source").alias("tot_src"), "n_hashes")),
            F.col("src_a").eqNullSafe(F.col("tot_src")),
        )
        .drop("tot_src")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            F.round(F.col("n_shared").cast("double") / F.col("n_hashes"), 6).alias(
                "share_of_a"
            ),
        )
        .orderBy(F.asc_nulls_last("src_a"), F.asc_nulls_last("src_b"))
    )


def _lsh_plane_sql(n_tables: int = 8, n_planes: int = 4, dim: int = 64) -> str:
    """The production hyperplane family as SQL literals: identical ±1
    components to `operators/similarity.py::random_hyperplane_topk`'s
    driver-side sha256 derivation (table t, plane p, dim i), so DuckDB
    buckets every vector into EXACTLY the production signature. Plane
    components are model constants (like a PQ codebook), so embedding
    them as literals is the honest oracle form."""
    import hashlib

    rows = []
    for tab in range(n_tables):
        for p in range(n_planes):
            comps = ", ".join(
                "1.0" if hashlib.sha256(f"{tab}:{p}:{i}".encode()).digest()[0] % 2 == 0
                else "-1.0"
                for i in range(dim)
            )
            rows.append(f"({tab}, {p}, [{comps}]::DOUBLE[])")
    return ",\n".join(rows)


@register(
    "embedding_lsh_topk_portable",
    oracle=f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
    AND COALESCE(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)), 0) > 0
),
q AS (SELECT * FROM v WHERE vec_id < 10),
planes(tbl, p, comp) AS (VALUES
{_lsh_plane_sql()}
),
sigq AS (
  SELECT q.vec_id AS qid, planes.tbl,
         CAST(SUM(CASE WHEN list_dot_product(q.e, planes.comp) > 0
                       THEN (1 << planes.p) ELSE 0 END) AS BIGINT) AS sig
  FROM q CROSS JOIN planes GROUP BY q.vec_id, planes.tbl
),
sigc AS (
  SELECT v.vec_id AS nid, planes.tbl,
         CAST(SUM(CASE WHEN list_dot_product(v.e, planes.comp) > 0
                       THEN (1 << planes.p) ELSE 0 END) AS BIGINT) AS sig
  FROM v CROSS JOIN planes GROUP BY v.vec_id, planes.tbl
),
cand AS (
  SELECT DISTINCT sigq.qid, sigc.nid
  FROM sigq JOIN sigc ON sigc.tbl = sigq.tbl AND sigc.sig = sigq.sig
  WHERE sigq.qid <> sigc.nid
),
rr AS (
  SELECT cand.qid, cand.nid,
         ROUND(list_dot_product(qe.e, ne.e)
               / (SQRT(list_dot_product(qe.e, qe.e))
                  * SQRT(list_dot_product(ne.e, ne.e))), 6) AS sim
  FROM cand
  JOIN v ne ON ne.vec_id = cand.nid
  JOIN q qe ON qe.vec_id = cand.qid
),
rk AS (
  SELECT qid, nid, sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY sim DESC, nid ASC) AS INT) AS rk
  FROM rr
)
SELECT qid, nid, sim, rk FROM rk WHERE rk <= 5
ORDER BY qid, rk
""",
)
def embedding_lsh_topk_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The random-hyperplane LSH ANN — value-hash verified END TO END.
    This runs the PRODUCTION operator
    (`operators/similarity.py::random_hyperplane_topk` — the same code
    path as the rows-only `embedding_lsh_topk`) at 8 tables x 4 planes;
    its hyperplane components are already deterministic driver-side
    sha256 ±1 literals, so the oracle reproduces the IDENTICAL buckets
    from the same literals (emitted into the SQL by `_lsh_plane_sql`) and
    the whole pipeline — per-table sign signatures, OR-construction
    bucket join, candidate dedup, exact cosine rerank, top-5 with the
    (sim DESC, nid ASC) tiebreak — is compared value-by-value. The r8
    portable-MinHash/SimHash move applied to the last rows-only
    similarity family: LSH recall stops being a pytest-only claim and
    becomes an exact function of the corpus the driver hashes. Scale
    posture: signatures are map-only float folds; candidates dedup as
    bare id pairs BEFORE vectors join back (embeddings never ride the
    distinct); the rerank join broadcasts the 10-query side. Both
    engines fold the same doubles in index order, so sign bits and
    ROUND(6) cosines agree bitwise (the embedding_near_dup_pairs
    contract)."""
    from mapreducefw_spark.operators import similarity

    emb = similarity.as_double_vecs(t(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vid") < 10)
    return similarity.random_hyperplane_topk(
        emb, q, k=5, dim=64, n_planes=4, n_tables=8
    ).orderBy("qid", "rk")


# The dedup-mode LSH config shared by `embedding_lsh_dedup_portable` and
# pipeline33's `embedding_dedup_clusters` (whose edge set is defined as
# EXACTLY the pair query's output — one constant, one SQL builder, so the
# two can never drift; r10 self-review finding).
LSH_DEDUP_CONF = {"k": 50, "dim": 64, "n_planes": 4, "n_tables": 3}


def lsh_dedup_candidates_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ANN candidate tier at LSH_DEDUP_CONF: (qid, nid, sim)
    top-k per anchor from the multi-table hyperplane LSH, BEFORE any
    dedup-mode filtering — the single Spark-side source every consumer
    (dedup pairs, clusters, hard-negative mining) derives from. The 'rk'
    rank column topk_per_key adds is dropped so downstream per-key ranks
    can re-rank freely."""
    from mapreducefw_spark.operators import similarity

    emb = similarity.as_double_vecs(t(spark, sf_dir, "embeddings"))
    return similarity.random_hyperplane_topk(
        emb, emb, broadcast_queries=False, **LSH_DEDUP_CONF
    ).select("qid", "nid", "sim")


def lsh_dedup_pairs_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production dedup-mode pair pipeline at LSH_DEDUP_CONF — the
    candidate tier filtered to undirected near-dup edges (sim >= 0.4,
    a < b), the (id_a, id_b, sim) edge set the dedup queries consume."""
    pairs = lsh_dedup_candidates_frame(spark, sf_dir)
    return (
        pairs.filter((F.col("sim") >= 0.4) & (F.col("qid") < F.col("nid")))
        .select(F.col("qid").alias("id_a"), F.col("nid").alias("id_b"), "sim")
    )


def lsh_dedup_candidates_sql() -> str:
    """The candidate tier as oracle CTEs (searchable `v`, label side `lab`,
    plane literals at LSH_DEDUP_CONF, per-table signatures, bucket
    candidates, ROUND(6) rerank), ending in a ``topk(qid, nid, sim)`` CTE —
    the per-anchor top-k BEFORE dedup-mode filtering, mirroring
    `lsh_dedup_candidates_frame` exactly."""
    return f"""
v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
    AND COALESCE(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)), 0) > 0
),
planes(tbl, p, comp) AS (VALUES
{_lsh_plane_sql(n_tables=LSH_DEDUP_CONF["n_tables"], n_planes=LSH_DEDUP_CONF["n_planes"], dim=LSH_DEDUP_CONF["dim"])}
),
sig AS (
  SELECT v.vec_id AS vid, planes.tbl,
         CAST(SUM(CASE WHEN list_dot_product(v.e, planes.comp) > 0
                       THEN (1 << planes.p) ELSE 0 END) AS BIGINT) AS sig
  FROM v CROSS JOIN planes GROUP BY v.vec_id, planes.tbl
),
cand AS (
  SELECT DISTINCT a.vid AS qid, b.vid AS nid
  FROM sig a JOIN sig b ON b.tbl = a.tbl AND b.sig = a.sig
  WHERE a.vid <> b.vid
),
rr AS (
  SELECT cand.qid, cand.nid,
         ROUND(list_dot_product(qe.e, ne.e)
               / (SQRT(list_dot_product(qe.e, qe.e))
                  * SQRT(list_dot_product(ne.e, ne.e))), 6) AS sim
  FROM cand
  JOIN v ne ON ne.vec_id = cand.nid
  JOIN v qe ON qe.vec_id = cand.qid
),
rkk AS (
  SELECT qid, nid, sim,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rk
  FROM rr
),
topk AS (
  SELECT qid, nid, sim FROM rkk WHERE rk <= {LSH_DEDUP_CONF["k"]}
)"""


def lsh_dedup_edges_sql() -> str:
    """The candidate CTEs plus the dedup-mode filter (sim >= 0.4, a < b),
    ending in an ``edges(src, dst, sim)`` CTE consumers select from."""
    return f"""{lsh_dedup_candidates_sql()},
edges AS (
  SELECT qid AS src, nid AS dst, sim
  FROM topk
  WHERE sim >= 0.4 AND qid < nid
)"""


@register(
    "embedding_lsh_dedup_portable",
    oracle=f"""
WITH {lsh_dedup_edges_sql()}
SELECT src AS id_a, dst AS id_b, sim
FROM edges
ORDER BY id_a, id_b
""",
)
def embedding_lsh_dedup_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed embedding near-dup over the FULL corpus — the dedup
    mode of the production operator (queries == corpus,
    `embedding_lsh_dedup`'s exact 3-table x 4-plane config including its
    per-query top-50 truncation and the sim >= 0.4 / id_a < id_b
    post-filter), value-hash verified end-to-end from the same sha256
    plane literals as `embedding_lsh_topk_portable`. The quadratic
    compare runs ONLY inside shared buckets; candidates dedup as bare id
    pairs before vectors join back; queries == corpus so the rerank join
    is NOT force-broadcast (`broadcast_queries=False` — the 8 GB
    broadcast-limit contract in `operators/similarity.py:330`). Completes
    the similarity family's oracle coverage: brute witness
    (embedding_near_dup_pairs), search mode (lsh_topk_portable), dedup
    mode (this). The 3x4 config is the VERIFICATION WITNESS (0.51
    measured pair-recall@0.4) — deployment runs 16 tables (0.93
    measured, >=0.85 pinned in tests/test_accuracy_pins.py)."""
    return lsh_dedup_pairs_frame(spark, sf_dir).orderBy("id_a", "id_b")
