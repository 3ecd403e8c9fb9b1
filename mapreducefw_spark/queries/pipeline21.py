"""Round-8 batch 2: statistical-inference + model-eval tier.

Extends the round-7 statistical family (chi-square, KS, MWU, Gini, ACF,
Benford — pipeline19) with the effect-size / location / autocorrelation /
divergence tests a corpus pipeline runs next to them, plus eval-metric
shapes (ROUGE recall, language-ID confusion) over the documents table.

Semantic contract with the reference engine: every query is the
map -> shuffle-by-key -> reduce -> sort job shape
(`/root/reference/MapReduceClient.h:47-51`, `MRFCore.cpp:252-446`).

Scale posture:
- closed-form Σ statistics everywhere (Welch t, Spearman, DW): one
  map-combined shuffle of partial sums, O(1)-or-O(groups) arithmetic
  after; no per-row Python, no unpartitioned data-sized windows — the
  Spearman rank grids use the TWO-PHASE range rank (operators/rank.py),
  never a bare orderBy window.
- calendar-spine joins (EWMA, Durbin-Watson) run on the day grid —
  calendar-bounded frames whatever the fact volume is.
- exact-integer sums ride BIGINT (DuckDB HUGEINT cast back) so value
  hashes match bit-for-bit; only log/sqrt/pow outputs take ROUND(6)
  (cross-engine libm is 1-ulp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import dec, t


@register(
    "welch_t_test",
    oracle="""
WITH s AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(n_chars) AS BIGINT) AS sx,
         CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
  FROM documents
  WHERE source IN ('src0', 'src1') AND n_chars IS NOT NULL
  GROUP BY source
),
p AS (
  SELECT MAX(CASE WHEN source = 'src0' THEN n END) AS n0,
         MAX(CASE WHEN source = 'src1' THEN n END) AS n1,
         MAX(CASE WHEN source = 'src0' THEN sx END) AS sx0,
         MAX(CASE WHEN source = 'src1' THEN sx END) AS sx1,
         MAX(CASE WHEN source = 'src0' THEN sxx END) AS sxx0,
         MAX(CASE WHEN source = 'src1' THEN sxx END) AS sxx1
  FROM s
),
m AS (
  SELECT n0, n1,
         CAST(sx0 AS DOUBLE) / n0 AS m0,
         CAST(sx1 AS DOUBLE) / n1 AS m1,
         (CAST(sxx0 AS DOUBLE) - CAST(sx0 AS DOUBLE) * sx0 / n0) / (n0 - 1) AS v0,
         (CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * sx1 / n1) / (n1 - 1) AS v1
  FROM p
)
SELECT n0, n1,
       ROUND(m0, 6) AS mean0, ROUND(m1, 6) AS mean1,
       ROUND((m0 - m1) / SQRT(v0 / n0 + v1 / n1), 6) AS t_stat,
       ROUND(POW(v0 / n0 + v1 / n1, 2)
             / (POW(v0 / n0, 2) / (n0 - 1) + POW(v1 / n1, 2) / (n1 - 1)), 6) AS df_welch
FROM m
""",
)
def welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test (src0 vs src1 document lengths) —
    the parametric location complement to mann_whitney_u, with the
    Welch-Satterthwaite degrees of freedom. Everything derives from three
    exact BIGINT sums per group (n, Σx, Σx²): sample means/variances are
    identical double expressions of identical integers on both engines,
    so only the sqrt/pow outputs take ROUND(6). One map-combined shuffle
    of 3-number partials; O(1) arithmetic after."""
    s = (
        t(spark, sf_dir, "documents")
        .filter(F.col("source").isin("src0", "src1") & F.col("n_chars").isNotNull())
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("n_chars").cast("bigint").alias("sx"),
            F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("sxx"),
        )
    )
    p = s.agg(
        *[
            F.max(F.when(F.col("source") == f"src{i}", F.col(c))).alias(f"{c}{i}")
            for c in ("n", "sx", "sxx")
            for i in (0, 1)
        ]
    )
    n0, n1 = F.col("n0"), F.col("n1")
    m0 = F.col("sx0").cast("double") / n0
    m1 = F.col("sx1").cast("double") / n1
    v0 = (F.col("sxx0").cast("double") - F.col("sx0").cast("double") * F.col("sx0") / n0) / (n0 - 1)
    v1 = (F.col("sxx1").cast("double") - F.col("sx1").cast("double") * F.col("sx1") / n1) / (n1 - 1)
    se2 = v0 / n0 + v1 / n1
    return p.select(
        n0.alias("n0"),
        n1.alias("n1"),
        F.round(m0, 6).alias("mean0"),
        F.round(m1, 6).alias("mean1"),
        F.round((m0 - m1) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(
            F.pow(se2, 2) / (F.pow(v0 / n0, 2) / (n0 - 1) + F.pow(v1 / n1, 2) / (n1 - 1)),
            6,
        ).alias("df_welch"),
    )


@register(
    "cramers_v_type_dow",
    oracle="""
WITH obs AS (
  SELECT event_type, isodow(ts) AS dow, COUNT(*) AS o
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
margins AS (
  SELECT event_type, CAST(SUM(o) AS BIGINT) AS row_tot FROM obs GROUP BY 1
),
cols AS (
  SELECT dow, CAST(SUM(o) AS BIGINT) AS col_tot FROM obs GROUP BY 1
),
n AS (SELECT CAST(SUM(o) AS BIGINT) AS total FROM obs),
chi AS (
  SELECT CAST((SELECT COUNT(*) FROM margins) AS INT) AS n_types,
         CAST((SELECT COUNT(*) FROM cols) AS INT) AS n_dows,
         (SELECT total FROM n) AS n_events,
         SUM(POW(o - CAST(row_tot AS DOUBLE) * col_tot / total, 2)
             / (CAST(row_tot AS DOUBLE) * col_tot / total)) AS chi2
  FROM obs JOIN margins USING (event_type) JOIN cols USING (dow), n
)
SELECT n_types, n_dows, n_events,
       ROUND(chi2, 6) AS chi2,
       ROUND(SQRT(chi2 / (n_events * LEAST(n_types - 1, n_dows - 1))), 6) AS cramers_v
FROM chi
""",
)
def cramers_v_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect size on the (event type × ISO day-of-week)
    contingency table — chi_square_independence answers "is there an
    association?"; V answers "how strong?" on a 0..1 scale
    (sqrt(chi2 / (N · min(r-1, c-1)))), which is what makes drift
    thresholds comparable across tables of different shape. Same
    vocabulary-sized plan as the chi-square: one (type, dow) map-combined
    shuffle, broadcast marginals, O(cells) arithmetic. The UNROUNDED chi2
    feeds V on both engines; both outputs take ROUND(6)."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    obs = ev.groupBy("event_type", (F.weekday("ts") + 1).alias("dow")).agg(
        F.count(F.lit(1)).alias("o")
    )
    margins = obs.groupBy("event_type").agg(F.sum("o").cast("bigint").alias("row_tot"))
    cols = obs.groupBy("dow").agg(F.sum("o").cast("bigint").alias("col_tot"))
    n = obs.agg(F.sum("o").cast("bigint").alias("total"))
    nt = margins.agg(F.count(F.lit(1)).cast("int").alias("n_types"))
    nd = cols.agg(F.count(F.lit(1)).cast("int").alias("n_dows"))
    e = F.col("row_tot").cast("double") * F.col("col_tot") / F.col("total")
    chi = (
        obs.join(F.broadcast(margins), "event_type")
        .join(F.broadcast(cols), "dow")
        .join(F.broadcast(n))
        .agg(
            F.sum(F.pow(F.col("o") - e, 2) / e).alias("chi2"),
            F.max("total").alias("n_events"),
        )
        .join(F.broadcast(nt))
        .join(F.broadcast(nd))
    )
    return chi.select(
        "n_types",
        "n_dows",
        "n_events",
        F.round("chi2", 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n_events") * F.least(F.col("n_types") - 1, F.col("n_dows") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


_RANK_GRID_SQL = """
  SELECT {val} AS v, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem WHERE {val} IS NOT NULL
  GROUP BY 1
"""


@register(
    "spearman_rho_qty_price",
    oracle=f"""
WITH gq AS ({_RANK_GRID_SQL.format(val="l_quantity")}),
gp AS ({_RANK_GRID_SQL.format(val="l_extendedprice")}),
rq AS (
  SELECT v, CAST(2 * CAST(SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            - cnt + 1 AS BIGINT) AS ir
  FROM gq
),
rp AS (
  SELECT v, CAST(2 * CAST(SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            - cnt + 1 AS BIGINT) AS ir
  FROM gp
),
rows_ranked AS (
  SELECT rq.ir AS ir1, rp.ir AS ir2
  FROM lineitem l
  JOIN rq ON l.l_quantity = rq.v
  JOIN rp ON l.l_extendedprice = rp.v
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(ir1) AS BIGINT) AS s1, CAST(SUM(ir2) AS BIGINT) AS s2,
         CAST(SUM(ir1 * ir1) AS BIGINT) AS s11,
         CAST(SUM(ir2 * ir2) AS BIGINT) AS s22,
         CAST(SUM(ir1 * ir2) AS BIGINT) AS s12
  FROM rows_ranked
)
SELECT n,
       ROUND((CAST(n AS DOUBLE) * s12 - CAST(s1 AS DOUBLE) * s2)
             / SQRT((CAST(n AS DOUBLE) * s11 - CAST(s1 AS DOUBLE) * s1)
                    * (CAST(n AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s2)), 6) AS spearman_rho
FROM s
""",
)
def spearman_rho_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between quantity and extended price —
    the monotone-association complement to stats_corr_qty_price's
    Pearson r. Tied values take AVERAGE ranks, computed on each column's
    DISTINCT-VALUE grid as cum_before + (cnt+1)/2 (the mann_whitney_u
    idiom); doubling every rank (ir = 2·cum - cnt + 1) keeps all six
    Σ statistics in exact BIGINT, so both engines hash identical integers
    and only the final sqrt takes ROUND(6) — native corr() would differ
    in low bits (SNIPPETS cross-engine rule).

    Scale: the price grid is near-row-cardinality, so its prefix count
    uses the TWO-PHASE range rank (operators/rank.py) — no unpartitioned
    data-sized window anywhere; rows join their rank by value (the small
    quantity grid broadcasts, the price grid sort-merges on the value
    key). Reference contract: global sort-by-k3 (`MRFCore.cpp:252-446`)."""
    from mapreducefw_spark.operators.rank import global_rank_running

    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").isNotNull() & F.col("l_extendedprice").isNotNull()
    )

    def rank_grid(col: str) -> DataFrame:
        grid = li.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt")
        )
        ranked = global_rank_running(grid, [F.col("v")], sum_col=F.col("cnt"))
        # running_total is the INCLUSIVE prefix count; doubled avg rank
        # 2·(cum_before + (cnt+1)/2) = 2·cum - cnt + 1 stays integral
        return ranked.select(
            "v",
            (2 * F.col("running_total") - F.col("cnt") + 1)
            .cast("bigint")
            .alias("ir"),
        )

    rq = rank_grid("l_quantity").withColumnRenamed("ir", "ir1")
    rp = rank_grid("l_extendedprice").withColumnRenamed("ir", "ir2")
    ranked_rows = (
        li.select(F.col("l_quantity").alias("vq"), F.col("l_extendedprice").alias("vp"))
        .join(rq.withColumnRenamed("v", "vq"), "vq")
        .join(rp.withColumnRenamed("v", "vp"), "vp")
    )
    s = ranked_rows.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("ir1").cast("bigint").alias("s1"),
        F.sum("ir2").cast("bigint").alias("s2"),
        F.sum(F.col("ir1") * F.col("ir1")).cast("bigint").alias("s11"),
        F.sum(F.col("ir2") * F.col("ir2")).cast("bigint").alias("s22"),
        F.sum(F.col("ir1") * F.col("ir2")).cast("bigint").alias("s12"),
    )
    nD = F.col("n").cast("double")
    num = nD * F.col("s12") - F.col("s1").cast("double") * F.col("s2")
    den = F.sqrt(
        (nD * F.col("s11") - F.col("s1").cast("double") * F.col("s1"))
        * (nD * F.col("s22") - F.col("s2").cast("double") * F.col("s2"))
    )
    return s.select("n", F.round(num / den, 6).alias("spearman_rho"))


EWMA_ALPHA = 0.3  # smoothing factor; weight (1-alpha)^k decays per lag day
EWMA_WINDOW = 14  # truncation horizon: (0.7)^14 ~ 0.7% residual weight

# (1-alpha)^k as EXACT decimals (0.7^k terminates at k decimal digits, so
# Decimal is lossless): the weighted fold then runs in DECIMAL end-to-end
# and is order-independent — the pow()-double form drifted past ROUND(6)
# at sf0.1's 1e7 daily magnitudes (a few boundary rows in the full-registry
# sf0.1 sweep), exactly the _util rule about money-scale double sums.
from decimal import Decimal as _Dec

EWMA_WEIGHTS = [_Dec("0.7") ** k for k in range(EWMA_WINDOW)]
_EWMA_W_VALUES = ", ".join(
    f"({k}, CAST({w} AS DECIMAL(16,14)))" for k, w in enumerate(EWMA_WEIGHTS)
)


@register(
    "ewma_daily_revenue",
    oracle=f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS x
  FROM orders WHERE o_orderdate IS NOT NULL
  GROUP BY 1
),
shifted AS (
  SELECT daily.d + TO_DAYS(CAST(k.k AS INT)) AS d, k.k, k.w, x
  FROM daily CROSS JOIN (VALUES {_EWMA_W_VALUES}) AS k(k, w)
)
SELECT t.d,
       CAST(COUNT(*) AS INT) AS n_terms,
       -- EXACT half-up rounding at 1e-6, fully in integers: the weighted
       -- sum and weight sum are exact decimals (w widened to DECIMAL(20,14)
       -- first — DuckDB multiplies in the operands' physical int width and
       -- DECIMAL(16,14)*DECIMAL(18,2) overflows int64); lift both to
       -- integers (num x 1e4 after ROUND 4, den x 1e14), then
       -- r = (2a*1e16 + b) // (2b) is round-half-up(a*1e16/b) with zero
       -- float involvement. Every float formulation hit a ROUND(6)
       -- boundary row at sf0.1's 1e7 magnitudes: the decimal->double cast
       -- of a >2^53-mantissa value rounds differently per engine, and
       -- even ROUND(identical double, 6) disagreed once (Spark rounds the
       -- exact binary expansion, DuckDB the x*1e6 double). r/1e6 as the
       -- final double is exact (r < 2^53).
       CAST((2 * CAST(ROUND(SUM(CAST(s.w AS DECIMAL(20,14)) * s.x), 4) * 10000 AS HUGEINT)
               * 10000000000000000
             + CAST(SUM(s.w) * 100000000000000 AS HUGEINT))
            // (2 * CAST(SUM(s.w) * 100000000000000 AS HUGEINT)) AS DOUBLE)
       / 1000000 AS ewma
FROM daily t JOIN shifted s ON s.d = t.d
GROUP BY t.d
ORDER BY t.d
""",
)
def ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily revenue, computed in
    CLOSED FORM: the recursive y_d = αx_d + (1-α)y_{d-1} unrolls to a
    (1-α)^k-weighted sum over recent CALENDAR days, truncated at 14 lags
    (<1% residual weight) and renormalized over the weights actually
    present — which also handles gap days exactly (a row-lag EWMA would
    smear across gaps; same argument as acf_daily_revenue). Plan shape is
    the ACF lag spine: daily exact-DECIMAL sums once, a 14-row broadcast
    spine pre-shifts the series, ONE equi-join on the calendar-bounded
    day grid. Weights are EXACT decimals (0.7^k terminates), the weighted
    fold stays DECIMAL end-to-end, and the final 1e-6 rounding is EXACT
    integer half-up division — (2a·10^16 + b) DIV 2b — because every
    float formulation (pow weights; decimal->double casts; even
    ROUND(identical double, 6)) produced at least one boundary row at
    sf0.1's 1e7 daily magnitudes. The only double in the plan is the
    exact r/1e6 at the very end."""
    daily = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum(dec("o_totalprice")).cast("decimal(18,2)").alias("x"))
    )
    ks = daily.sparkSession.createDataFrame(
        list(enumerate(EWMA_WEIGHTS)), "k int, w decimal(16,14)"
    )
    shifted = daily.join(F.broadcast(ks)).select(
        F.date_add("d", F.col("k")).alias("d"),
        "w",
        "x",
    )
    agg = (
        daily.select("d")
        .join(shifted, "d")
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_terms"),
            (F.round(F.sum(F.col("w") * F.col("x")), 4) * 10000)
            .cast("decimal(38,0)")
            .alias("a"),
            (F.sum("w").cast("decimal(16,14)") * 100000000000000)
            .cast("decimal(38,0)")
            .alias("b"),
        )
    )
    return agg.select(
        "d",
        "n_terms",
        (
            F.expr(
                "CAST((2 * a * CAST(10000000000000000 AS DECIMAL(38,0)) + b)"
                " DIV (2 * b) AS BIGINT)"
            ).cast("double")
            / F.lit(1000000.0)
        ).alias("ewma"),
    ).orderBy("d")


@register(
    "durbin_watson_daily",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS x
  FROM orders WHERE o_orderdate IS NOT NULL
  GROUP BY 1
),
mu AS (SELECT SUM(x) / COUNT(*) AS m, COUNT(*) AS n_days FROM daily),
den AS (SELECT SUM(POW(x - (SELECT m FROM mu), 2)) AS ss FROM daily),
pairs AS (
  SELECT a.x AS xa, b.x AS xb
  FROM daily a JOIN daily b ON b.d + TO_DAYS(1) = a.d
)
SELECT (SELECT n_days FROM mu) AS n_days,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(SUM(POW((xa - (SELECT m FROM mu)) - (xb - (SELECT m FROM mu)), 2))
             / (SELECT ss FROM den), 6) AS dw
FROM pairs
""",
)
def durbin_watson_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic of the daily-revenue residual series (vs
    the global mean): DW = Σ(e_d − e_{d−1})² / Σe² over consecutive
    CALENDAR-day pairs — the classic lag-1 serial-correlation screen
    (DW ≈ 2 means none), complementing acf_daily_revenue's full
    correlogram. Same scale shape as the ACF: one exact-DECIMAL daily
    aggregate, then a single self-equi-join of the calendar-bounded day
    grid on d−1; the mean/denominator ride broadcast 1-row frames.
    ROUND(6) absorbs fold-order ulps."""
    daily = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum(dec("o_totalprice")).cast("double").alias("x"))
    )
    mu = daily.agg(
        (F.sum("x") / F.count(F.lit(1))).alias("m"),
        F.count(F.lit(1)).alias("n_days"),
    )
    den = daily.join(F.broadcast(mu.select("m"))).agg(
        F.sum(F.pow(F.col("x") - F.col("m"), 2)).alias("ss")
    )
    prev = daily.select(F.date_add("d", 1).alias("d"), F.col("x").alias("xb"))
    pairs = daily.join(prev, "d")
    # GLOBAL aggregate, not groupBy(n_days, ss): with zero consecutive-day
    # pairs a grouped agg returns 0 rows while the oracle's bare aggregate
    # returns 1 (COUNT 0, NULL dw) — the empty-group cross-engine trap
    sums = pairs.join(F.broadcast(mu.select("m"))).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(
            F.pow((F.col("x") - F.col("m")) - (F.col("xb") - F.col("m")), 2)
        ).alias("num"),
    )
    return (
        mu.select("n_days")
        .crossJoin(F.broadcast(den))
        .crossJoin(F.broadcast(sums))
        .select(
            "n_days", "n_pairs", F.round(F.col("num") / F.col("ss"), 6).alias("dw")
        )
    )


@register(
    "rouge1_recall_pairs",
    oracle="""
WITH g AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS grams
  FROM documents WHERE text IS NOT NULL
),
pairs AS (
  SELECT r.doc_id AS ref_id, c.doc_id AS cand_id, r.grams AS rg, c.grams AS cg
  FROM g r JOIN g c ON c.doc_id = r.doc_id + 1
  WHERE r.doc_id % 2 = 0 AND len(r.grams) > 0
)
SELECT ref_id, cand_id,
       CAST(len(rg) AS BIGINT) AS n_ref,
       CAST(len(list_intersect(cg, rg)) AS BIGINT) AS n_overlap,
       ROUND(CAST(len(list_intersect(cg, rg)) AS DOUBLE) / len(rg), 6) AS rouge1_recall
FROM pairs
ORDER BY ref_id
""",
)
def rouge1_recall_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1 recall over deterministic (reference, candidate) doc pairs
    — the standard summarization/eval overlap metric, paired here as
    (even doc_id, doc_id+1) so both engines grade identical pairs:
    recall = |distinct unigrams(cand) ∩ distinct unigrams(ref)| / |ref|.
    Set sizes are exact integers (array_intersect vs list_intersect agree
    because only the SIZE is compared), so the only float is the final
    exact-int division; ROUND(6) for hash stability. One equi-join on
    doc_id arithmetic — at corpus scale this is the evaluation harness
    shape: candidate outputs join their references by id, never a cross
    join."""
    g = (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.array_distinct(
                F.filter(F.split("text", " "), lambda x: x != "")
            ).alias("grams"),
        )
    )
    ref = g.filter((F.col("doc_id") % 2 == 0) & (F.size("grams") > 0)).select(
        F.col("doc_id").alias("ref_id"), F.col("grams").alias("rg")
    )
    cand = g.select((F.col("doc_id") - 1).alias("ref_id"), F.col("grams").alias("cg"),
                    F.col("doc_id").alias("cand_id"))
    ov = F.size(F.array_intersect("cg", "rg"))
    return (
        ref.join(cand, "ref_id")
        .select(
            "ref_id",
            "cand_id",
            F.size("rg").cast("bigint").alias("n_ref"),
            ov.cast("bigint").alias("n_overlap"),
            F.round(ov.cast("double") / F.size("rg"), 6).alias("rouge1_recall"),
        )
        .orderBy("ref_id")
    )


@register(
    "jsd_token_drift",
    oracle="""
WITH toks AS (
  SELECT source, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
  FROM documents WHERE text IS NOT NULL AND source IN ('src0', 'src1')
),
cnt AS (
  SELECT tok,
         CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS c0,
         CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS c1
  FROM toks GROUP BY tok
),
tot AS (
  SELECT CAST(SUM(c0) AS BIGINT) AS n0, CAST(SUM(c1) AS BIGINT) AS n1 FROM cnt
),
terms AS (
  SELECT CAST(c0 AS DOUBLE) / n0 AS p, CAST(c1 AS DOUBLE) / n1 AS q
  FROM cnt, tot
)
SELECT (SELECT COUNT(*) FROM cnt) AS n_tokens_union,
       ROUND(SUM(CASE WHEN p > 0 THEN 0.5 * p * ln(2 * p / (p + q)) ELSE 0 END)
           + SUM(CASE WHEN q > 0 THEN 0.5 * q * ln(2 * q / (p + q)) ELSE 0 END), 6) AS jsd_nats
FROM terms
""",
)
def jsd_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between the src0 and src1 unigram
    distributions — the SYMMETRIC, bounded (≤ ln 2) drift metric that
    complements token_divergence_by_source's KL (which blows up on
    vocabulary mismatch): JSD = ½Σp·ln(2p/(p+q)) + ½Σq·ln(2q/(p+q)) with
    0-count terms contributing 0 exactly. Probabilities are exact-integer
    divisions of identical operands; ln is 1-ulp cross-engine, so the
    vocabulary-sized fold takes ROUND(6). One (token)-keyed map-combined
    shuffle, broadcast totals, O(vocab) arithmetic — raw text never
    shuffles."""
    toks = (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & F.col("source").isin("src0", "src1"))
        .select(
            "source",
            F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("tok"),
        )
    )
    cnt = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).cast("bigint").alias("c0"),
        F.sum(F.when(F.col("source") == "src1", 1).otherwise(0)).cast("bigint").alias("c1"),
    )
    tot = cnt.agg(
        F.sum("c0").cast("bigint").alias("n0"),
        F.sum("c1").cast("bigint").alias("n1"),
        F.count(F.lit(1)).alias("n_tokens_union"),
    )
    p = F.col("c0").cast("double") / F.col("n0")
    q = F.col("c1").cast("double") / F.col("n1")
    # GLOBAL aggregate so an empty vocabulary still yields the oracle's
    # single (0, NULL) row — same empty-group trap as durbin_watson_daily
    sums = (
        cnt.join(F.broadcast(tot.select("n0", "n1")))
        .agg(
            F.round(
                F.sum(F.when(p > 0, 0.5 * p * F.log(2 * p / (p + q))).otherwise(0.0))
                + F.sum(F.when(q > 0, 0.5 * q * F.log(2 * q / (p + q))).otherwise(0.0)),
                6,
            ).alias("jsd_nats")
        )
    )
    return (
        tot.select(F.col("n_tokens_union").cast("bigint").alias("n_tokens_union"))
        .crossJoin(F.broadcast(sums))
    )


@register(
    "mode_deterministic_priority",
    oracle="""
WITH c AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
  FROM orders GROUP BY 1, 2
),
r AS (
  SELECT o_orderstatus, o_orderpriority, n,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY n DESC, o_orderpriority NULLS LAST) AS rk
  FROM c
)
SELECT o_orderstatus, o_orderpriority AS mode_priority, CAST(n AS BIGINT) AS n
FROM r WHERE rk = 1
ORDER BY o_orderstatus
""",
)
def mode_deterministic_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: the most frequent order priority per
    order status, ties broken lexicographically — native mode() is
    tie-nondeterministic on BOTH engines, so the portable form is
    count + rank with a total order (the cross-engine rule that also
    bans native corr()). Map-combined (status, priority) counts, then a
    vocabulary-sized window."""
    from pyspark.sql import Window as W

    c = t(spark, sf_dir, "orders").groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    rk = F.row_number().over(
        W.partitionBy("o_orderstatus").orderBy(F.desc("n"), F.asc_nulls_last("o_orderpriority"))
    )
    return (
        c.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").cast("bigint").alias("n"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "seasonal_index_dow",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, isodow(CAST(o_orderdate AS DATE)) AS dow,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS x
  FROM orders WHERE o_orderdate IS NOT NULL
  GROUP BY 1, 2
),
overall AS (SELECT CAST(SUM(x) AS DOUBLE) / COUNT(*) AS m FROM daily)
SELECT dow,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(CAST(SUM(x) AS DOUBLE) / COUNT(*), 6) AS avg_daily_revenue,
       ROUND((CAST(SUM(x) AS DOUBLE) / COUNT(*)) / (SELECT m FROM overall), 6) AS seasonal_index
FROM daily
GROUP BY dow
ORDER BY dow
""",
)
def seasonal_index_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index of revenue: mean daily revenue per ISO
    weekday divided by the overall mean daily revenue — the
    multiplicative-decomposition seasonal factor (index 1.0 = no
    weekday effect), the KPI behind acf's weekly-cycle spike. Daily sums
    are exact DECIMAL; both means divide identical operands; ROUND(6).
    One day-grid aggregate, then O(7) arithmetic against a broadcast
    1-row mean."""
    daily = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .groupBy(
            F.to_date("o_orderdate").alias("d"),
            (F.weekday(F.to_date("o_orderdate")) + 1).alias("dow"),
        )
        .agg(F.sum(dec("o_totalprice")).cast("decimal(18,2)").alias("x"))
    )
    # x stays DECIMAL through both folds: a double x would make the
    # per-dow SUM fold-order dependent (seen as a 1e-6 hash diff at
    # sf0.001) — the _util module-docstring rule
    overall = daily.agg((F.sum("x").cast("double") / F.count(F.lit(1))).alias("m"))
    return (
        daily.groupBy("dow")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            (F.sum("x").cast("double") / F.count(F.lit(1))).alias("avg_rev"),
        )
        .join(F.broadcast(overall))
        .select(
            "dow",
            "n_days",
            F.round("avg_rev", 6).alias("avg_daily_revenue"),
            F.round(F.col("avg_rev") / F.col("m"), 6).alias("seasonal_index"),
        )
        .orderBy("dow")
    )


@register(
    "hhi_source_concentration",
    oracle="""
WITH s AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents WHERE source IS NOT NULL GROUP BY source
),
tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS t, COUNT(*) AS k FROM s)
SELECT k AS n_sources,
       (SELECT t FROM tot) AS n_docs,
       ROUND(SUM(POW(CAST(n_docs AS DOUBLE) / t, 2)), 6) AS hhi,
       ROUND((SUM(POW(CAST(n_docs AS DOUBLE) / t, 2)) - 1.0 / k) / (1 - 1.0 / k), 6)
           AS hhi_normalized
FROM s, tot
GROUP BY k
""",
)
def hhi_source_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration index of the corpus source mix
    (Σ share² over sources, plus the 0..1 normalized form) — the
    one-number "is one crawl dominating the mixture?" monitor next to
    temperature_mix_allocation's reweighting. Shares are exact int/int
    divisions; the O(sources) fold of squares takes ROUND(6). One
    map-combined source count; O(sources) arithmetic."""
    s = (
        t(spark, sf_dir, "documents")
        .filter(F.col("source").isNotNull())
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    tot = s.agg(
        F.sum("n_docs").cast("bigint").alias("t"), F.count(F.lit(1)).alias("k")
    )
    share2 = F.pow(F.col("n_docs").cast("double") / F.col("t"), 2)
    return (
        s.join(F.broadcast(tot))
        .groupBy("k", "t")
        .agg(F.sum(share2).alias("h"))
        .select(
            F.col("k").alias("n_sources"),
            F.col("t").alias("n_docs"),
            F.round("h", 6).alias("hhi"),
            F.round(
                (F.col("h") - 1.0 / F.col("k")) / (1 - 1.0 / F.col("k")), 6
            ).alias("hhi_normalized"),
        )
    )


def _langid_struct_sql() -> str:
    """DuckDB twin of operators/text.py lang_scores: one (score, lang)
    struct per marker language, generated from the SAME LANG_MARKERS
    table so the two engines cannot drift."""
    from mapreducefw_spark.operators.text import LANG_MARKERS

    entries = ", ".join(
        "struct_pack(score := CAST(len(list_filter(toks, x -> list_contains("
        f"{list(markers)}, x))) AS DOUBLE) / greatest(len(toks), 1), "
        f"lang := '{lang}')"
        for lang, markers in LANG_MARKERS.items()
    )
    return f"[{entries}]"


def _langid_oracle() -> str:
    return f"""
WITH toks AS (
  SELECT lang AS label, string_split(text, ' ') AS toks
  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
),
scored AS (
  SELECT label, list_aggregate({_langid_struct_sql()}, 'max') AS best
  FROM toks
),
pred AS (
  SELECT label,
         CASE WHEN best.score > 0 THEN best.lang ELSE 'und' END AS predicted
  FROM scored
)
SELECT label, predicted, CAST(COUNT(*) AS BIGINT) AS n
FROM pred
GROUP BY label, predicted
ORDER BY label, predicted
"""


@register("langid_confusion_matrix", oracle=_langid_oracle())
def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: the stored ``lang`` label vs the
    marker-word heuristic's prediction (operators/text.detect_language —
    argmax of marker-hit ratios, ties to the lexicographically greatest
    lang, 'und' when nothing hits) — the standard audit for a classifier
    gate before it drops corpus data. The oracle's score structs are
    GENERATED from the same LANG_MARKERS table the operator uses, so the
    two engines compare identical int/int ratio doubles and the argmax
    (struct max over (score, lang)) agrees exactly. One map-only scoring
    pass, then a vocabulary-sized (label, predicted) count shuffle."""
    from mapreducefw_spark.operators.text import detect_language

    d = t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    return (
        d.select(F.col("lang").alias("label"), detect_language("text").alias("predicted"))
        .groupBy("label", "predicted")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("label", "predicted")
    )


@register(
    "percentile_cont_by_source",
    oracle="""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(quantile_cont(n_chars, 0.25), 6) AS p25,
       ROUND(quantile_cont(n_chars, 0.50), 6) AS p50,
       ROUND(quantile_cont(n_chars, 0.75), 6) AS p75
FROM documents
WHERE source IS NOT NULL AND n_chars IS NOT NULL
GROUP BY source
ORDER BY source
""",
)
def percentile_cont_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated (type-7 / SQL PERCENTILE_CONT) quartiles of
    document length per source — the grouped continuous-quantile
    complement to percentile_disc_prices (discrete, ungrouped) and
    equi_depth_histogram (rank-based bins). Spark's percentile() and
    DuckDB's quantile_cont share the (n-1)p linear-interpolation
    definition on identical integer inputs; ROUND(6) absorbs the one
    a+(b-a)f vs (1-f)a+fb ulp. Exact per-group sort aggregation is the
    right call at bucket-count group sizes; percentile_approx_prices is
    the pinned sketch path when groups are data-sized."""
    d = t(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull() & F.col("n_chars").isNotNull()
    )
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.percentile("n_chars", F.lit(0.25)), 6).alias("p25"),
            F.round(F.percentile("n_chars", F.lit(0.50)), 6).alias("p50"),
            F.round(F.percentile("n_chars", F.lit(0.75)), 6).alias("p75"),
        )
        .orderBy("source")
    )
