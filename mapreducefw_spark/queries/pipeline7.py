"""Seventh pipeline batch (round 5, continued): incremental view
maintenance — keeping a grouped aggregate current from a changelog without
rescanning the fact table (operators/ivm.py). The query partitions lineitem
deterministically into a base snapshot, an insert batch and a retraction
batch, maintains the view incrementally, and the oracle recomputes the same
view from scratch over the equivalent final row set — so the driver's value
hash proves merge == recompute."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.operators import ivm
from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import dec, t


@register(
    "incremental_agg_maintenance",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
       COUNT(*) AS n_rows
FROM lineitem
WHERE (l_orderkey % 5 = 0) OR (l_orderkey % 7 <> 3)
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain a pricing-summary view incrementally: base snapshot =
    lineitem rows with l_orderkey % 5 <> 0; the changelog then inserts the
    % 5 == 0 rows (+1) and retracts the base rows with l_orderkey % 7 == 3
    (-1). The merge touches ONLY the existing aggregate (O(groups) rows)
    and the delta — at 100 TB the base facts are never rescanned, which is
    the entire point (a full nightly recompute scans everything; this scans
    the day's changes). Decimal sums keep the merge bit-identical to the
    oracle's from-scratch recompute over the equivalent final row set."""
    li = t(spark, sf_dir, "lineitem")
    base = li.filter(F.col("l_orderkey") % 5 != 0)
    sum_cols = {"sum_qty": dec("l_quantity"), "sum_price": dec("l_extendedprice")}
    base_agg = base.groupBy("l_returnflag", "l_linestatus").agg(
        *[F.sum(c).alias(a) for a, c in sum_cols.items()],
        F.count(F.lit(1)).alias("n_rows"),
    )
    # Synthesize the changelog in ONE scan (a union of two filters would scan
    # lineitem twice): each row contributes its applicable weights — +1 when
    # it's an insert (k%5==0), -1 when it's a base row being retracted
    # (k%5!=0 and k%7==3), nothing otherwise. In production the changelog is
    # its own small input and this derivation disappears entirely.
    is_insert = F.col("l_orderkey") % 5 == 0
    is_retract = (F.col("l_orderkey") % 5 != 0) & (F.col("l_orderkey") % 7 == 3)
    changes = li.filter(is_insert | is_retract).select(
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        F.when(is_insert, F.lit(1)).otherwise(F.lit(-1)).alias("_w"),
    )
    merged = ivm.merge_agg_delta(
        base_agg,
        changes,
        keys=["l_returnflag", "l_linestatus"],
        sum_cols=sum_cols,
    )
    return merged.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("sum_price").cast("double").alias("sum_price"),
        "n_rows",
    ).orderBy("l_returnflag", "l_linestatus")


@register(
    "dup_passage_coverage",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE text IS NOT NULL
),
g AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 8
              THEN list_transform(generate_series(1, len(w) - 7),
                   i -> CAST(('0x' || substr(md5(array_to_string(list_slice(w, i, i + 7), ' ')), 1, 12)) AS BIGINT))
              ELSE [] END AS gh
  FROM toks
),
inst AS (SELECT doc_id, unnest(gh) AS h FROM g),
dup AS (SELECT h FROM inst GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
cov AS (
  SELECT i.doc_id, COUNT(*) AS n_dup_grams
  FROM inst i JOIN dup d ON i.h = d.h
  GROUP BY i.doc_id
)
SELECT g.doc_id AS doc_id,
       CAST(len(g.gh) AS BIGINT) AS n_grams,
       CAST(COALESCE(c.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
       ROUND(CAST(COALESCE(c.n_dup_grams, 0) AS DOUBLE)
             / greatest(len(g.gh), 1), 6) AS dup_frac
FROM g LEFT JOIN cov c ON g.doc_id = c.doc_id
ORDER BY doc_id
""",
)
def dup_passage_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-passage detection (the Lee et al. 2022
    'Deduplicating Training Data' signal, bounded to 8-token grams instead
    of full suffix arrays): a gram position is 'duplicated' when its 8-token
    window also appears in ANOTHER document; per-doc coverage is the
    fraction of positions so flagged — high-coverage docs are boilerplate /
    syndicated copies worth dropping even when no whole-doc dup fires.

    Scale shape: map-side gram hashing (48-bit md5 prefix — both engines
    compute the identical family, so even collisions agree), ONE pinned
    (doc, pos-hash) frame feeding the cross-doc dup set (min(doc) !=
    max(doc) under groupBy(h) — cheaper than countDistinct, whose
    expand-for-distinct rewrite doubles exchanged rows) and the coverage
    count (semi-join back). Raw gram strings (~50 bytes each) never
    shuffle. Shuffle-probe A/B (SHUFFLE.md, sf0.1): this form exchanges
    3.55 MB; with countDistinct in the dup-set leg it was 4.97 MB, and a
    'single-exchange' groupBy(h) + collect_list(doc) variant measured
    WORSE still (6.47 MB; 8.15 MB with countDistinct alongside) — per-row
    list-serialization overhead exceeds the second exchange of bare
    16-byte (h, doc) rows. Distinguished from
    dup_ngram_stats (WITHIN-doc repetition, map-only) and decontamination
    (corpus x benchmark): this is corpus x itself at passage granularity."""
    docs = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    gh = F.when(
        F.size(F.split("text", " ")) >= 8,
        F.expr(
            "transform(sequence(1, size(split(text, ' ')) - 7), "
            "i -> cast(conv(substr(md5(array_join(slice(split(text, ' '), i, 8), ' ')), 1, 12), 16, 10) as bigint))"
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    base = docs.select("doc_id", gh.alias("gh"))
    inst = (
        base.select("doc_id", F.explode("gh").alias("h"))
        .localCheckpoint(eager=False)  # feeds the dup set AND the coverage join
    )
    dup = (
        inst.groupBy("h")
        .agg(F.min("doc_id").alias("_lo"), F.max("doc_id").alias("_hi"))
        .filter(F.col("_lo") != F.col("_hi"))
        .select("h")
    )
    cov = (
        inst.join(dup, "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dup_grams"))
    )
    return (
        base.join(cov, "doc_id", "left")
        .select(
            "doc_id",
            F.size("gh").cast("bigint").alias("n_grams"),
            F.coalesce("n_dup_grams", F.lit(0)).cast("bigint").alias("n_dup_grams"),
            F.round(
                F.coalesce("n_dup_grams", F.lit(0)).cast("double")
                / F.greatest(F.size("gh"), F.lit(1)),
                6,
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


@register(
    "key_skew_report",
    oracle="""
WITH keyed AS (
  SELECT CASE WHEN l_orderkey % 10 < 9 THEN 7 ELSE l_orderkey END AS k FROM lineitem
),
cnt AS (SELECT k, COUNT(*) AS cnt FROM keyed GROUP BY k),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total, COUNT(*) AS dk FROM cnt)
SELECT k, CAST(cnt AS BIGINT) AS cnt,
       ROUND(cnt * 1.0 / total, 6) AS share,
       ROUND(cnt * dk * 1.0 / total, 2) AS hot_factor,
       greatest(1, CAST(CEIL(cnt * 32.0 / total) AS BIGINT)) AS recommended_salt
FROM cnt, tot
ORDER BY cnt DESC, k
LIMIT 5
""",
)
def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnostics over the same synthesized 90%-hot-key fact the
    skew-join demo uses: the report must surface key 7 with ~0.9 share and
    recommend a ~29-way salt at 32 target partitions, while honest keys get
    salt 1. This is the 'measure before you shuffle' tool that pairs with
    salted_sum_count (aggregation) and the AQE skew join (joins): one
    map-combined count aggregation + a bounded global top-k, never a full
    sort. Exact integer/ratio arithmetic keeps it oracle-green."""
    from mapreducefw_spark.operators.skew import key_skew_report as report

    li = t(spark, sf_dir, "lineitem")
    keyed = li.select(
        F.when(F.col("l_orderkey") % 10 < 9, F.lit(7))
        .otherwise(F.col("l_orderkey"))
        .alias("k")
    )
    return report(keyed, ["k"], top_k=5, target_partitions=32)


@register(
    "weighted_sample_tokens",
    oracle="""
WITH d AS (
  SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
  WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 1
),
k AS (
  SELECT doc_id, source, n_tokens,
         ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':esw'), 1, 8)) AS BIGINT) + 0.5)
            / 4294967296.0) / n_tokens AS es_key
  FROM d
),
r AS (
  SELECT doc_id, source, n_tokens,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY es_key DESC, doc_id) AS rk
  FROM k
)
SELECT source, doc_id, n_tokens FROM r WHERE rk <= 3
ORDER BY source, doc_id
""",
)
def weighted_sample_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted sample, 3 docs per source, Efraimidis-Spirakis keys
    (curation.weighted_sample_es): long documents win proportionally more
    often than short ones — the carve-out a token-budgeted training mix
    wants, where stratified_sample's uniform draw would under-represent
    heavy docs. Deterministic from the ids (md5 family), so DuckDB
    recomputes the identical sample; the proportional-to-weight law is
    pinned in tests/test_curation.py."""
    from mapreducefw_spark.operators.curation import weighted_sample_es

    docs = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    d = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    ).filter(F.col("n_tokens") >= 1)
    return weighted_sample_es(
        d, "source", "n_tokens", 3, id_col="doc_id", salt="esw"
    ).select("source", "doc_id", "n_tokens").orderBy("source", "doc_id")


@register(
    "analyze_column_stats",
    oracle="""
WITH pairs AS (
  SELECT 'l_linenumber' AS col, CAST(l_linenumber AS BIGINT) AS v FROM lineitem
  UNION ALL
  SELECT 'l_suppkey', CAST(l_suppkey AS BIGINT) FROM lineitem
  UNION ALL
  SELECT 'l_partkey', CAST(l_partkey AS BIGINT) FROM lineitem
),
pv AS (SELECT col, v, COUNT(*) AS cnt FROM pairs GROUP BY col, v),
rk AS (
  SELECT col, v, cnt,
         ROW_NUMBER() OVER (PARTITION BY col
             ORDER BY CASE WHEN v IS NOT NULL THEN cnt END DESC NULLS LAST,
                      v ASC NULLS LAST) AS r
  FROM pv
)
SELECT col AS "column",
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN v IS NULL THEN cnt ELSE 0 END) AS BIGINT) AS n_null,
       CAST(COUNT(CASE WHEN v IS NOT NULL THEN 1 END) AS BIGINT) AS ndv,
       MIN(v) AS min_v,
       MAX(v) AS max_v,
       MAX(CASE WHEN r = 1 THEN v END) AS mcv,
       CAST(MAX(CASE WHEN r = 1 AND v IS NOT NULL THEN cnt END) AS BIGINT) AS mcv_n
FROM rk
GROUP BY col
ORDER BY col
""",
)
def analyze_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE-style exact column statistics over three lineitem key
    columns (operators/stats.py): row/null/distinct counts, min/max, and
    the most-common value with frequency — what a cost-based optimizer's
    estimates and a profiling dashboard consume. One scan, columns
    unpivoted map-side; only (column, value, count) rows ever shuffle.
    MCV ties break toward the smallest value, so the report is
    deterministic and the oracle recomputes it exactly."""
    from mapreducefw_spark.operators.stats import table_column_stats

    li = t(spark, sf_dir, "lineitem")
    return table_column_stats(li, ["l_linenumber", "l_suppkey", "l_partkey"])


@register("hll_mergeable_distinct")  # sketch binary is engine-specific: rows-only
def hll_mergeable_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-sketch workflow approx_count_distinct hides: build a
    datasketches HLL per order-priority partition (storable/shippable
    state), then hll_union_agg the stored sketches into the global
    distinct-customer estimate — the re-aggregation pattern that lets a
    100 TB pipeline maintain per-partition sketches incrementally and
    answer any coarser rollup WITHOUT rescanning (union of registers is
    lossless: merged estimate == single-pass estimate, pinned in
    tests/test_accuracy_pins.py along with the error bound). Output: one
    row per priority plus the merged ALL row."""
    orders = t(spark, sf_dir, "orders")
    per = orders.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    per_rows = per.select(
        F.col("o_orderpriority").alias("scope"),
        F.hll_sketch_estimate("sk").cast("bigint").alias("approx_customers"),
    )
    merged = per.agg(F.hll_union_agg("sk").alias("u")).select(
        F.lit("ALL").alias("scope"),
        F.hll_sketch_estimate("u").cast("bigint").alias("approx_customers"),
    )
    return per_rows.unionByName(merged).orderBy("scope")


@register(
    "data_quality_report",
    oracle="""
SELECT 'accepted_values(o_orderstatus)' AS rule,
       CAST(COUNT(CASE WHEN o_orderstatus IS NOT NULL
                        AND o_orderstatus NOT IN ('O','F','P') THEN 1 END) AS BIGINT)
           AS n_violations
FROM orders
UNION ALL
SELECT 'foreign_key(o_custkey)',
       CAST(COUNT(*) AS BIGINT)
FROM orders o
WHERE o.o_custkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'in_range(o_totalprice,0,200000)',
       CAST(COUNT(CASE WHEN o_totalprice IS NOT NULL
                        AND o_totalprice NOT BETWEEN 0 AND 200000 THEN 1 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'not_null(o_custkey)',
       CAST(COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'unique(o_orderkey)',
       CAST(COALESCE(SUM(c - 1), 0) AS BIGINT)
FROM (SELECT o_orderkey, COUNT(*) AS c FROM orders GROUP BY o_orderkey)
ORDER BY rule
""",
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint gate over orders (operators/quality.py):
    not-null, uniqueness, accepted values, numeric range, and referential
    integrity against customer — the dbt-test / Delta-CHECK surface. All
    row-predicate rules fuse into one scan's conditional counts; uniqueness
    is one counts-only groupBy; the FK check is one anti-join against the
    dimension keys. The range rule is set tight enough to actually fire on
    the fixture, proving violations are counted, not just asserted zero."""
    from mapreducefw_spark.operators.quality import Rules

    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    rules = (
        Rules()
        .not_null("o_custkey")
        .unique(["o_orderkey"])
        .accepted_values("o_orderstatus", ["O", "F", "P"])
        .in_range("o_totalprice", 0, 200_000)
        .foreign_key("o_custkey", customer, "c_custkey")
    )
    return rules.report(orders)


@register("bpe_learned_merges")  # iterative argmax loop: rows-only (pytest-pinned)
def bpe_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 10 BPE merge rules learned from the documents corpus
    (operators/bpe.py): tokenizer TRAINING as an iterative DataFrame
    algorithm — one corpus scan builds the word-frequency table, then every
    iteration runs over O(vocab) rows with the winning pair applied via a
    broadcast 1-row cross join (collect-free). Not SQL-oracle-expressible
    (10 chained argmax+rewrite rounds); the exact merge sequence, overlap
    greed, and tie-breaks are pinned against a pure-Python reference in
    tests/test_bpe.py."""
    from mapreducefw_spark.operators.bpe import learn_bpe_merges

    docs = t(spark, sf_dir, "documents")
    return learn_bpe_merges(docs, 10)


@register(
    "basket_part_pairs",
    oracle="""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_orders
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY part_a, part_b
  HAVING COUNT(*) >= 2
)
SELECT part_a, part_b, CAST(n_orders AS BIGINT) AS n_orders
FROM p
ORDER BY n_orders DESC, part_a, part_b
LIMIT 20
""",
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence (the a-priori first pass): part pairs
    ordered together in >= 2 orders, top-20 by support. The self-join is
    keyed on the ORDER, so each hash bucket holds one order's items —
    per-order pair fan-out is bounded by basket size (<= 7 here), making
    the join linear in orders at any corpus scale; the unbounded formulation
    (join on part alone) would be quadratic in part popularity. Bounded
    global top-k = TakeOrderedAndProject, never a full sort."""
    li = t(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("part_a"))
    b = op.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "o")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(20)
    )


@register(
    "purchase_touch_attribution",
    oracle="""
WITH v AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'),
p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
touch AS (
  SELECT p.event_id AS purchase_id, v.event_id AS view_id, v.ts AS vts
  FROM p JOIN v ON p.user_id = v.user_id
   AND v.ts < p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
)
SELECT purchase_id,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       FIRST(view_id ORDER BY vts ASC, view_id ASC) AS first_touch,
       FIRST(view_id ORDER BY vts DESC, view_id ASC) AS last_touch
FROM touch
GROUP BY purchase_id
ORDER BY purchase_id
""",
)
def purchase_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution: each purchase credited to the same-user
    views in the preceding hour — touch count plus first-touch and
    last-touch view ids (the two position-based attribution models),
    integer-exact so the driver hash is stable (fractional credit 1/n is a
    one-line extension but sums floats in engine-specific order). Same
    time-bounded user-keyed join shape as view_click_attribution; ties on
    identical timestamps break toward the lower view id in both engines."""
    ev = t(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("view_id"), F.col("ts").alias("vts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
    )
    touch = p.join(v, "u").filter(
        (F.col("vts") < F.col("pts"))
        & (F.col("vts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR"))
    )
    return (
        touch.groupBy("purchase_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.min_by("view_id", F.struct("vts", "view_id")).alias("first_touch"),
            # latest time, ties to the LOWER id: max over (vts, -id)
            F.max_by("view_id", F.struct(F.col("vts"), (-F.col("view_id")).alias("nid"))).alias("last_touch"),
        )
        .orderBy("purchase_id")
    )


@register(
    "rfm_segmentation",
    oracle="""
WITH mx AS (SELECT MAX(o_orderdate) AS corpus_max FROM orders
            WHERE o_custkey IS NOT NULL),
rfm AS (
  SELECT o_custkey,
         CAST(date_diff('day', MAX(o_orderdate), mx.corpus_max) AS BIGINT) AS recency_days,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS monetary
  FROM orders, mx
  WHERE o_custkey IS NOT NULL
  GROUP BY o_custkey, mx.corpus_max
),
binned AS (
  SELECT o_custkey, recency_days, frequency, monetary,
         NTILE(4) OVER (ORDER BY recency_days ASC NULLS LAST, o_custkey) AS r_bin,
         NTILE(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_bin,
         NTILE(4) OVER (ORDER BY monetary DESC NULLS LAST, o_custkey) AS m_bin
  FROM rfm
)
SELECT r_bin, f_bin, m_bin,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(monetary AS DECIMAL(14,2))) AS DOUBLE) AS segment_revenue
FROM binned
GROUP BY r_bin, f_bin, m_bin
ORDER BY r_bin, f_bin, m_bin
""",
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per customer recency (days since last
    order, relative to the corpus max date so the query is reproducible),
    frequency (order count) and monetary (exact-decimal revenue), each cut
    into quartiles — the classic CRM segmentation matrix. One customer-keyed
    aggregation; the quartile windows run over the O(customers) aggregate,
    not the fact table, with full-order tie-breaks (custkey) so both
    engines assign identical bins. Small-frame form by design: a
    corpus-scale percentile cut composes operators/rank.py's two-phase
    global rank exactly as quality_decile_mixture demonstrates."""
    # anonymous (NULL-custkey) orders are not customers — excluded both
    # sides; NULL recency/monetary (all-NULL dates or prices for a
    # customer) sort NULLS LAST explicitly on BOTH sides (engine defaults
    # differ: Spark ASC=NULLS FIRST, DuckDB=NULLS LAST)
    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey").isNotNull())
    from pyspark.sql.window import Window as W

    mx = orders.agg(F.max("o_orderdate").alias("corpus_max"))
    rfm = (
        orders.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey", "corpus_max")
        .agg(
            F.max("o_orderdate").alias("_last"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(dec("o_totalprice")).cast("double").alias("monetary"),
        )
        .select(
            "o_custkey",
            F.datediff("corpus_max", "_last").cast("bigint").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    binned = rfm.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(4)
        .over(W.orderBy(F.asc_nulls_last("recency_days"), "o_custkey"))
        .alias("r_bin"),
        F.ntile(4).over(W.orderBy(F.desc("frequency"), "o_custkey")).alias("f_bin"),
        F.ntile(4)
        .over(W.orderBy(F.desc_nulls_last("monetary"), "o_custkey"))
        .alias("m_bin"),
    )
    return (
        binned.groupBy("r_bin", "f_bin", "m_bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum(F.col("monetary").cast("decimal(14,2)"))
            .cast("double")
            .alias("segment_revenue"),
        )
        .orderBy("r_bin", "f_bin", "m_bin")
    )
