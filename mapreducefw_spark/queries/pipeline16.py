"""Round-7 batch: corpus-quality gating, frequency-law fitting, nucleus
(top-p) mixture selection, exact-distinct bitmap aggregation, schema
evolution by name, user-level co-occurrence PMI, and retrieval-index
(postings list) construction.

Semantic contract with the reference engine: each of these is a
map -> shuffle-by-key -> reduce -> sort pipeline the reference could run as
one MapReduce job (`/root/reference/MapReduceClient.h:47-51` Map/Reduce
hooks, `MRFCore.cpp:252-446` shuffle + k3 sort) — the Spark-first forms
keep the same observable output while letting Catalyst pick the physical
plan.

Scale posture (100 TB notes per query):
- ``gopher_quality_rules``: one scan, per-row array expressions only
  (filter/transform/aggregate HOFs stay in whole-stage codegen); no
  shuffle at all beyond the output sort.
- ``zipf_alpha_by_source``: token counts shuffle once on (source, token)
  with map-side combine; the rank window is PARTITIONED by source and the
  per-source fit consumes only the top-50 ranks, so driver-side state is
  O(sources). The slope comes from explicit Σln sums (the
  stats_corr_qty_price idiom) — native regr_slope differs across engines
  in low-order float bits.
- ``nucleus_topp_sources``: one map-combinable count per source, then an
  O(sources)-row unpartitioned cumulative window — bucket-count frame,
  same class as the allowlisted sequence_pack_spans cumsum.
- ``bitmap_exact_distinct``: EXACT distinct via fixed-width bitmaps
  (bitmap_bucket_number / bitmap_construct_agg): partial bitmaps OR-merge
  map-side, so the shuffle carries one 4 KB bitmap per (group, 32k-id
  bucket) instead of one row per distinct id — the precise-count
  complement to approx_count_distinct/HLL at 100 TB.
- ``union_by_name_evolution``: pure narrow union (no shuffle); schema
  evolution resolved by NAME, the parquet-migration contract.
- ``event_pair_pmi``: distinct (user, type) pairs shuffle once on user;
  the per-user self-join fans out at most |event-type-vocabulary|² per
  user (vocabulary-bounded, not event-bounded); type totals broadcast.
- ``inverted_index_postings``: posexplode -> one (token, doc) shuffle with
  map-side combine; postings concatenate per token. Token-skew (stopword
  postings) is the known hot key — at 100 TB cap postings per token or
  salt the head terms (operators/skew.py); the registered form keeps the
  full list because the sf-scale vocabulary is tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t

STOPWORDS = ("the", "a", "of", "to", "and", "in")


@register(
    "gopher_quality_rules",
    oracle=f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_words,
       CASE WHEN len(toks) > 0
            THEN CAST(list_sum(list_transform(toks, x -> strlen(x))) AS DOUBLE) / len(toks)
       END AS mean_word_len,
       CASE WHEN len(toks) > 0
            THEN CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE) / len(toks)
       END AS frac_alpha,
       CAST(len(list_filter(toks, x -> list_contains({list(STOPWORDS)}, x))) AS BIGINT) AS n_stop,
       CAST(CASE WHEN len(toks) BETWEEN 20 AND 1000
                  AND COALESCE(CAST(list_sum(list_transform(toks, x -> strlen(x))) AS DOUBLE) / len(toks)
                               BETWEEN 2 AND 12, FALSE)
                  AND COALESCE(CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE) / len(toks)
                               >= 0.8, FALSE)
                  AND len(list_filter(toks, x -> list_contains({list(STOPWORDS)}, x))) >= 2
             THEN 1 ELSE 0 END AS INT) AS passes
FROM tk
ORDER BY doc_id
""",
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style (Rae et al. 2021) repetition-free quality rules as one
    scan of per-row array expressions: word-count bounds, mean-word-length
    band, alphabetic-word fraction, stopword floor, and the conjunctive
    pass flag. Divisions are exact-integer-over-integer (identical doubles
    both engines); zero-word docs keep NULL ratios and fail the gate via
    COALESCE(..., FALSE) on both sides."""
    toks = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), " "), lambda x: x != ""
    )
    d = t(spark, sf_dir, "documents").select("doc_id", toks.alias("toks"))
    n_words = F.size("toks").cast("bigint")
    sum_len = F.aggregate(
        "toks", F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
    )
    nz = F.size("toks") > 0
    mean_len = F.when(nz, sum_len.cast("double") / F.size("toks"))
    n_alpha = F.size(F.filter("toks", lambda x: x.rlike("[a-zA-Z]")))
    frac_alpha = F.when(nz, n_alpha.cast("double") / F.size("toks"))
    n_stop = F.size(
        F.filter("toks", lambda x: F.array_contains(F.array(*[F.lit(s) for s in STOPWORDS]), x))
    ).cast("bigint")
    passes = (
        n_words.between(20, 1000)
        & F.coalesce(mean_len.between(2, 12), F.lit(False))
        & F.coalesce(frac_alpha >= 0.8, F.lit(False))
        & (n_stop >= 2)
    )
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        frac_alpha.alias("frac_alpha"),
        n_stop.alias("n_stop"),
        passes.cast("int").alias("passes"),
    ).orderBy("doc_id")


@register(
    "zipf_alpha_by_source",
    oracle="""
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE text IS NOT NULL
),
cnt AS (
  SELECT source, tok, COUNT(*) AS n FROM toks WHERE tok <> '' GROUP BY 1, 2
),
ranked AS (
  SELECT source, n,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n DESC, tok) AS r
  FROM cnt
),
s AS (
  SELECT source, COUNT(*) AS n_pts,
         SUM(ln(r)) AS sx, SUM(ln(n)) AS sy,
         SUM(ln(r) * ln(r)) AS sxx, SUM(ln(r) * ln(n)) AS sxy
  FROM ranked WHERE r <= 50 GROUP BY source
)
SELECT source, n_pts,
       ROUND(-((n_pts * sxy - sx * sy) / (n_pts * sxx - sx * sx)), 6) AS zipf_alpha
FROM s
ORDER BY source
""",
)
def zipf_alpha_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf exponent per source: OLS slope of ln(count) on ln(rank) over
    each source's top-50 token ranks, negated. The fit uses explicit Σln
    sums + the closed-form slope (stats_corr_qty_price idiom) because
    native regr_slope differs between engines in float low bits; ROUND(6)
    absorbs ln()/summation-order ulps. Rank ties break on token text so
    both engines rank identically."""
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok = d.select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    cnt = tok.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("n"))
    from mapreducefw_spark.operators.rank import topk_per_key

    # two-phase: one task per source over the full vocabulary otherwise
    ranked = topk_per_key(
        cnt, ["source"], [F.desc("n"), F.col("tok")], 50, rank_col="r"
    ).select("source", "n", "r")
    lx, ly = F.log(F.col("r")), F.log(F.col("n"))
    s = ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.sum(lx).alias("sx"),
        F.sum(ly).alias("sy"),
        F.sum(lx * lx).alias("sxx"),
        F.sum(lx * ly).alias("sxy"),
    )
    n, sx, sy = F.col("n_pts"), F.col("sx"), F.col("sy")
    slope = (n * F.col("sxy") - sx * sy) / (n * F.col("sxx") - sx * sx)
    return s.select(
        "source", "n_pts", F.round(-slope, 6).alias("zipf_alpha")
    ).orderBy("source")


@register(
    "nucleus_topp_sources",
    oracle="""
WITH per AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
sh AS (
  SELECT source, n_docs,
         CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER () AS share
  FROM per
),
c AS (
  SELECT source, n_docs, share,
         SUM(share) OVER (ORDER BY share DESC, source NULLS LAST
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_share
  FROM sh
)
SELECT source, n_docs,
       ROUND(share, 10) AS share,
       ROUND(cum_share, 10) AS cum_share,
       CAST(CASE WHEN cum_share - share < 0.8 THEN 1 ELSE 0 END AS INT) AS selected
FROM c
ORDER BY cum_share
""",
)
def nucleus_topp_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nucleus (top-p) source selection: keep the smallest share-ordered
    prefix of sources whose cumulative share reaches p=0.8 — the
    distribution-truncation rule applied to corpus mixture weights (a
    source enters while the PREVIOUS cumulative share is < p). Both
    windows run in the same deterministic (share desc, source) order, so
    the cumulative doubles agree bit-for-bit; ROUND(10) is belt and
    braces. The unpartitioned window frame is O(#sources) rows —
    bucket-count-sized, same class as sequence_pack_spans' cumsum."""
    per = t(spark, sf_dir, "documents").groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    total = per.agg(F.sum("n_docs").alias("t"))
    sh = per.join(F.broadcast(total)).select(
        "source", "n_docs", (F.col("n_docs").cast("double") / F.col("t")).alias("share")
    )
    w = W.orderBy(F.desc("share"), F.asc_nulls_last("source")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    c = sh.select("source", "n_docs", "share", F.sum("share").over(w).alias("cum_share"))
    return c.select(
        "source",
        "n_docs",
        F.round("share", 10).alias("share"),
        F.round("cum_share", 10).alias("cum_share"),
        ((F.col("cum_share") - F.col("share")) < 0.8).cast("int").alias("selected"),
    ).orderBy("cum_share")


@register(
    "bitmap_exact_distinct",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per event type via Spark 3.5 bitmap aggregates:
    ids fold into 32k-bit bucket bitmaps (bitmap_bucket_number /
    bitmap_bit_position / bitmap_construct_agg) that OR-merge map-side, so
    the shuffle carries fixed-width bitmaps instead of one row per
    distinct id — the precise complement to HLL when the answer must be
    exact at 100 TB. NULL ids fall out of bitmap_construct_agg exactly as
    COUNT(DISTINCT) ignores them; an all-NULL group COALESCEs to 0. The
    n_events recount rides the same shuffle."""
    ev = t(spark, sf_dir, "events")
    per_bucket = (
        ev.withColumn("bucket", F.expr("bitmap_bucket_number(user_id)"))
        .groupBy("event_type", "bucket")
        .agg(
            F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    return (
        per_bucket.groupBy("event_type")
        .agg(
            F.coalesce(F.sum(F.expr("bitmap_count(bm)")), F.lit(0))
            .cast("bigint")
            .alias("n_users"),
            F.sum("cnt").alias("n_events"),
        )
        .orderBy("event_type")
    )


@register(
    "union_by_name_evolution",
    oracle="""
SELECT * FROM (
  (SELECT o_orderkey, o_orderstatus, o_totalprice
   FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey < 2000)
  UNION ALL BY NAME
  (SELECT o_totalprice, o_orderpriority, o_orderkey
   FROM orders WHERE o_orderkey % 2 = 1 AND o_orderkey < 2000)
)
ORDER BY o_orderkey
""",
)
def union_by_name_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two projections of orders with different
    column ORDER and different column SETS combine by NAME
    (unionByName(allowMissingColumns=True) == DuckDB UNION ALL BY NAME),
    NULL-filling each side's missing column — the contract for reading a
    parquet lake across schema vintages. Narrow op: no shuffle; the
    driver's comparator sorts columns by name so the engines' differing
    output column order is immaterial."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    v1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    v2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_totalprice", "o_orderpriority", "o_orderkey"
    )
    return v1.unionByName(v2, allowMissingColumns=True).orderBy("o_orderkey")


@register(
    "event_pair_pmi",
    oracle="""
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
),
n_tot AS (SELECT COUNT(DISTINCT user_id) AS nu FROM ut),
tc AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_both
  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_both,
       ROUND(ln((CAST(n_both AS DOUBLE) * nu) / (CAST(ca.n AS DOUBLE) * cb.n)), 6) AS pmi
FROM pairs
JOIN tc ca ON type_a = ca.event_type
JOIN tc cb ON type_b = cb.event_type, n_tot
ORDER BY type_a, type_b
""",
)
def event_pair_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of event-type pairs over user presence
    sets: PMI(a,b) = ln(P(a,b)/(P(a)P(b))) with P over distinct users.
    One distinct (user, type) shuffle; the per-user self-join fans out at
    most |type-vocabulary|² rows per user (vocabulary-bounded, never
    event-count-bounded); type totals and the 1-row user count broadcast.
    ln() of exact rationals can differ by 1 ulp between JVM Math.log and
    libm — ROUND(6) absorbs it."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    ut = ev.select("user_id", "event_type").distinct()
    nu = ut.agg(F.countDistinct("user_id").alias("nu"))
    tc = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = ut.select(F.col("user_id").alias("u"), F.col("event_type").alias("type_a"))
    b = ut.select(F.col("user_id").alias("u2"), F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, (F.col("u") == F.col("u2")) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ca = tc.select(F.col("event_type").alias("ta"), F.col("n").alias("n_a"))
    cb = tc.select(F.col("event_type").alias("tb"), F.col("n").alias("n_b"))
    pmi = F.log(
        (F.col("n_both").cast("double") * F.col("nu"))
        / (F.col("n_a").cast("double") * F.col("n_b"))
    )
    return (
        pairs.join(F.broadcast(ca), F.col("type_a") == F.col("ta"))
        .join(F.broadcast(cb), F.col("type_b") == F.col("tb"))
        .join(F.broadcast(nu))
        .select("type_a", "type_b", "n_both", F.round(pmi, 6).alias("pmi"))
        .orderBy("type_a", "type_b")
    )


@register(
    "inverted_index_postings",
    oracle="""
WITH tk AS (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents WHERE doc_id < 200 AND text IS NOT NULL
),
pos AS (
  SELECT doc_id, toks[u.i] AS tok, u.i AS p
  FROM tk, unnest(range(1, len(toks) + 1)) AS u(i)
  WHERE toks[u.i] <> ''
),
per_doc AS (
  SELECT tok, doc_id,
         COUNT(*) AS n_pos,
         lpad(CAST(doc_id AS VARCHAR), 6, '0') || ':' ||
           array_to_string(list_sort(list(p)), ',') AS posting
  FROM pos GROUP BY tok, doc_id
)
SELECT tok,
       COUNT(*) AS n_docs,
       CAST(SUM(n_pos) AS BIGINT) AS n_occurrences,
       array_to_string(list_sort(list(posting)), ' ') AS postings
FROM per_doc
GROUP BY tok
ORDER BY tok
""",
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional inverted-index construction (the retrieval-index build
    step): token -> document frequency, collection frequency, and the
    canonical postings string 'doc:pos,pos ...' with zero-padded doc ids
    so lexicographic order == numeric order on both engines. posexplode is
    0-based, DuckDB's range subscripts 1-based — the +1 aligns them. One
    (token, doc) shuffle with map-side combine, then one token-level
    combine; stopword-token skew is the known hot key at 100 TB (cap or
    salt the head terms via operators/skew.py)."""
    d = t(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 200) & F.col("text").isNotNull()
    )
    pos = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("p0", "tok")
    ).filter(F.col("tok") != "")
    per_doc = pos.groupBy("tok", "doc_id").agg(
        F.count(F.lit(1)).alias("n_pos"),
        F.concat(
            F.lpad(F.col("doc_id").cast("string"), 6, "0"),
            F.lit(":"),
            F.array_join(F.array_sort(F.collect_list(F.col("p0") + 1)), ","),
        ).alias("posting"),
    )
    return (
        per_doc.groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_pos").cast("bigint").alias("n_occurrences"),
            F.array_join(F.array_sort(F.collect_list("posting")), " ").alias("postings"),
        )
        .orderBy("tok")
    )
