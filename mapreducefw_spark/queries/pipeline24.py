"""Round-8 batch 5: corpus language-model signals + rank/association tier.

Adds the unigram-LM filtering signals a pretraining-data pipeline computes
next to the Gopher gates (per-source log-perplexity, DSIR-style importance
weights), the exact-dup bookkeeping KPIs (cluster-size histogram,
boilerplate prefix duplication), and two association measures that
complete the statistical family (Kendall tau-b next to spearman_rho,
mutual information next to cramers_v).

Semantic contract with the reference engine: every query is the
map -> shuffle-by-key -> reduce -> sort job shape
(`/root/reference/MapReduceClient.h:47-51`, `MRFCore.cpp:252-446`).

Scale posture:
- token shuffles carry (token) or (source, token) partials after map-side
  combine — raw text never leaves the map side; dedup/prefix keys are
  md5 hashes (32 bytes), the dedup_exact contract.
- the LM joins are token-vocabulary-sized (logppl) or fixed 64-bucket
  (DSIR); corpus totals ride 1-row broadcasts.
- Kendall/MI run on bounded value grids (quantity x discount-pct,
  type x dow) — contingency cells after map-side combine, the
  chi_square_independence shuffle shape; the grid self-join is
  O(cells^2) driver-free arithmetic, never O(rows^2).
- cross-engine determinism: counts stay BIGINT end-to-end; only
  ln/sqrt outputs take ROUND(6) (libm is 1-ulp; the double sums run
  over vocabulary/grid-sized term lists, far below 1e-6 drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t

# 48-bit md5 prefix as a portable nonnegative integer hash — identical on
# both engines (the shard_balance_report / group_aware_split idiom),
# unlike engine-native hash().
_HASH_SQL = "CAST(('0x' || substr(md5({x}), 1, 12)) AS BIGINT)"


def _hash_col(c):
    return F.conv(F.substring(F.md5(c), 1, 12), 16, 10).cast("bigint")


@register(
    "unigram_logppl_by_source",
    oracle="""
WITH tk AS (
  SELECT source, token
  FROM (SELECT source, UNNEST(string_split(text, ' ')) AS token FROM documents)
  WHERE token <> ''
),
vocab AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM tk GROUP BY token),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t_all FROM vocab),
st AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS k FROM tk GROUP BY source, token)
SELECT st.source,
       CAST(SUM(st.k) AS BIGINT) AS n_tokens,
       ROUND(SUM(st.k * (LN(CAST(tot.t_all AS DOUBLE)) - LN(CAST(vocab.c AS DOUBLE))))
             / LN(2) / SUM(st.k), 6) AS avg_bits
FROM st JOIN vocab USING (token) CROSS JOIN tot
GROUP BY st.source
ORDER BY st.source NULLS LAST
""",
)
def unigram_logppl_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram log-perplexity (bits/token) under the corpus's
    own unigram LM — the CCNet/RedPajama-style perplexity-filter signal,
    reduced to its order-independent form: mean bits over a source's
    token instances = sum over the (source, token) grid of
    k * ln(t_all/c) rather than a per-doc double sum, so the only float
    work is vocabulary-sized. Shuffles carry (token) and (source, token)
    count partials after map-side combine — raw text never moves; the
    corpus total is a 1-row broadcast. At 100 TB the vocab join is the
    token-dictionary equi-join every TF-IDF/decontam query here already
    runs. NULL texts tokenize to zero rows on both engines
    (explode(split(NULL)) == UNNEST(string_split(NULL)))."""
    d = t(spark, sf_dir, "documents")
    tk = (
        d.select("source", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    # Deliberately TWO tokenize passes (vocab and grid as parallel branches
    # of one job): the re-agg-from-the-grid form (vocab = st.groupBy(token))
    # chains three sequential shuffle stages and Catalyst materializes the
    # grid subtree once per reference (3 scans, no exchange reuse pre-AQE),
    # measuring 1.3x slower at sf0.1 (0.359 vs 0.275 s A/B min-of-7).
    vocab = tk.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    tot = vocab.agg(F.sum("c").alias("t_all"))
    st = tk.groupBy("source", "token").agg(F.count(F.lit(1)).alias("k"))
    bits = (
        F.col("k")
        * (F.log(F.col("t_all").cast("double")) - F.log(F.col("c").cast("double")))
    )
    return (
        st.join(vocab, "token")
        .join(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.sum("k").cast("bigint").alias("n_tokens"),
            F.round(F.sum(bits) / F.log(F.lit(2.0)) / F.sum("k"), 6).alias("avg_bits"),
        )
        .orderBy(F.asc_nulls_last("source"))
    )


@register(
    "dsir_importance_weights",
    oracle=f"""
WITH tk AS (
  SELECT source, lang, {_HASH_SQL.format(x="token")} % 64 AS b
  FROM (SELECT source, lang, UNNEST(string_split(text, ' ')) AS token FROM documents)
  WHERE token <> ''
),
raw AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM tk GROUP BY b),
tgt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS ct FROM tk WHERE lang = 'en' GROUP BY b),
bkt AS (
  SELECT raw.b, raw.cr, COALESCE(tgt.ct, 0) AS ct,
         SUM(raw.cr) OVER () AS tr, SUM(COALESCE(tgt.ct, 0)) OVER () AS tt
  FROM raw LEFT JOIN tgt USING (b)
),
delta AS (
  SELECT b,
         LN((CAST(ct AS DOUBLE) + 1) / (CAST(tt AS DOUBLE) + 64))
         - LN((CAST(cr AS DOUBLE) + 1) / (CAST(tr AS DOUBLE) + 64)) AS d
  FROM bkt
),
sb AS (SELECT source, b, CAST(COUNT(*) AS BIGINT) AS k FROM tk GROUP BY source, b),
docs AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
         FROM documents WHERE text IS NOT NULL GROUP BY source)
SELECT docs.source, docs.n_docs,
       ROUND(COALESCE(SUM(sb.k * delta.d), 0) / docs.n_docs, 6) AS mean_logweight
FROM docs
LEFT JOIN sb ON sb.source IS NOT DISTINCT FROM docs.source
LEFT JOIN delta USING (b)
GROUP BY docs.source, docs.n_docs
ORDER BY docs.source NULLS LAST
""",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style (Xie et al. 2023) importance weights: hashed unigram
    features (portable 48-bit md5 hash into 64 buckets), add-one-smoothed
    bucket distributions for the TARGET (lang='en') vs the RAW corpus,
    and the per-source MEAN log importance weight. The per-doc sum
    Σ_b k_db·Δ_b folds to Σ_b K_sb·Δ_b / n_docs, so the float sum runs
    over a fixed 64-bucket grid per source — order-independent to well
    under ROUND(6). Shuffles: (source, bucket) count partials after
    map-side combine; the bucket table is 64 rows (broadcast). The
    target/raw totals are O(buckets) window frames. At 100 TB this is
    two token scans and a 64-row join — the canonical cheap
    data-selection pass before any quality model."""
    d = t(spark, sf_dir, "documents")
    tk = (
        d.select("source", "lang", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .select("source", "lang", (_hash_col(F.col("token")) % 64).alias("b"))
    )
    from pyspark.sql import Window as W

    raw = tk.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tgt = tk.filter(F.col("lang") == "en").groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    bkt = (
        raw.join(tgt, "b", "left")
        .select("b", "cr", F.coalesce("ct", F.lit(0)).alias("ct"))
        .withColumn("tr", F.sum("cr").over(W.partitionBy()))
        .withColumn("tt", F.sum("ct").over(W.partitionBy()))
    )
    delta = bkt.select(
        "b",
        (
            F.log((F.col("ct").cast("double") + 1) / (F.col("tt").cast("double") + 64))
            - F.log((F.col("cr").cast("double") + 1) / (F.col("tr").cast("double") + 64))
        ).alias("d"),
    )
    sb = tk.groupBy("source", "b").agg(F.count(F.lit(1)).alias("k"))
    docs = (
        d.filter(F.col("text").isNotNull())
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    contrib = sb.join(F.broadcast(delta), "b").select(
        "source", (F.col("k") * F.col("d")).alias("kd")
    )
    return (
        docs.join(contrib, docs.source.eqNullSafe(contrib.source), "left")
        .select(docs.source.alias("source"), "n_docs", "kd")
        .groupBy("source", "n_docs")
        .agg(
            F.round(
                F.coalesce(F.sum("kd"), F.lit(0.0)) / F.col("n_docs"), 6
            ).alias("mean_logweight")
        )
        .orderBy(F.asc_nulls_last("source"))
    )


@register(
    "kendall_tau_b",
    oracle="""
WITH cells AS (
  SELECT CAST(ROUND(l_quantity, 0) AS INT) AS x,
         CAST(ROUND(l_discount * 100, 0) AS INT) AS y,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
  GROUP BY 1, 2
),
pq AS (
  SELECT CAST(SUM(CASE WHEN b.y > a.y THEN a.n * b.n ELSE 0 END) AS BIGINT) AS p,
         CAST(SUM(CASE WHEN b.y < a.y THEN a.n * b.n ELSE 0 END) AS BIGINT) AS q
  FROM cells a JOIN cells b ON a.x < b.x
),
marg AS (
  SELECT CAST(SUM(nx) AS BIGINT) AS n_all,
         CAST(SUM(nx * (nx - 1) / 2) AS BIGINT) AS n1
  FROM (SELECT x, CAST(SUM(n) AS BIGINT) AS nx FROM cells GROUP BY x)
),
marg2 AS (
  SELECT CAST(SUM(my * (my - 1) / 2) AS BIGINT) AS n2
  FROM (SELECT y, CAST(SUM(n) AS BIGINT) AS my FROM cells GROUP BY y)
)
SELECT n_all, p AS concordant, q AS discordant,
       ROUND((CAST(p AS DOUBLE) - CAST(q AS DOUBLE))
             / (SQRT(CAST(n_all AS DOUBLE) * (n_all - 1) / 2 - n1)
                * SQRT(CAST(n_all AS DOUBLE) * (n_all - 1) / 2 - n2)), 6) AS tau_b
FROM pq, marg, marg2
""",
)
def kendall_tau_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between l_quantity and the discount
    percentage — the concordance complement to spearman_rho_qty_price,
    with the tie-corrected denominator. Computed ENTIRELY on the joint
    contingency grid (quantity levels x discount levels, both bounded
    vocabularies): concordant/discordant pair counts are a grid
    self-join Σ n_a·n_b over cell pairs — O(cells²) exact BIGINT
    arithmetic, never O(rows²). The only shuffle is the map-combined
    cell-count exchange (the chi_square shape); n0-n1 and n0-n2 are kept
    under separate SQRTs because their product overflows BIGINT at
    n ~ 2^31 rows (sqrt is IEEE exact-rounded, so the doubles match
    bit-for-bit). ROUND(6) on the final ratio only."""
    li = t(spark, sf_dir, "lineitem")
    cells = (
        li.filter(F.col("l_quantity").isNotNull() & F.col("l_discount").isNotNull())
        .groupBy(
            F.round("l_quantity", 0).cast("int").alias("x"),
            F.round(F.col("l_discount") * 100, 0).cast("int").alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a, b = cells.alias("a"), cells.alias("b")
    pq = (
        a.join(F.broadcast(b), F.col("a.x") < F.col("b.x"))
        .agg(
            F.sum(
                F.when(F.col("b.y") > F.col("a.y"), F.col("a.n") * F.col("b.n")).otherwise(0)
            )
            .cast("bigint")
            .alias("p"),
            F.sum(
                F.when(F.col("b.y") < F.col("a.y"), F.col("a.n") * F.col("b.n")).otherwise(0)
            )
            .cast("bigint")
            .alias("q"),
        )
    )
    nx = cells.groupBy("x").agg(F.sum("n").alias("nx"))
    marg = nx.agg(
        F.sum("nx").cast("bigint").alias("n_all"),
        F.sum(F.col("nx") * (F.col("nx") - 1) / 2).cast("bigint").alias("n1"),
    )
    my = cells.groupBy("y").agg(F.sum("n").alias("my"))
    marg2 = my.agg(F.sum(F.col("my") * (F.col("my") - 1) / 2).cast("bigint").alias("n2"))
    n0 = F.col("n_all").cast("double") * (F.col("n_all") - 1) / 2
    return (
        pq.join(F.broadcast(marg))
        .join(F.broadcast(marg2))
        .select(
            "n_all",
            F.col("p").alias("concordant"),
            F.col("q").alias("discordant"),
            F.round(
                (F.col("p").cast("double") - F.col("q").cast("double"))
                / (F.sqrt(n0 - F.col("n1")) * F.sqrt(n0 - F.col("n2"))),
                6,
            ).alias("tau_b"),
        )
    )


@register(
    "mutual_information_type_dow",
    oracle="""
WITH obs AS (
  SELECT event_type, isodow(ts) AS dow, CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2
),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
rows_m AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY 1),
cols_m AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY 1),
mi AS (
  SELECT SUM((CAST(o AS DOUBLE) / n)
             * LN(CAST(o AS DOUBLE) * n / (CAST(r AS DOUBLE) * c))) AS mi_nats
  FROM obs JOIN rows_m USING (event_type) JOIN cols_m USING (dow) CROSS JOIN tot
),
hx AS (SELECT -SUM((CAST(r AS DOUBLE) / n) * LN(CAST(r AS DOUBLE) / n)) AS h
       FROM rows_m CROSS JOIN tot),
hy AS (SELECT -SUM((CAST(c AS DOUBLE) / n) * LN(CAST(c AS DOUBLE) / n)) AS h
       FROM cols_m CROSS JOIN tot)
SELECT tot.n AS n_events,
       ROUND(mi.mi_nats, 6) AS mi_nats,
       CASE WHEN hx.h * hy.h > 0
            THEN ROUND(mi.mi_nats / SQRT(hx.h * hy.h), 6) END AS nmi
FROM mi, hx, hy, tot
""",
)
def mutual_information_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) between event_type and ISO weekday, plus
    the sqrt-normalized NMI — the information-theoretic complement to
    cramers_v_type_dow on the same contingency grid. One map-combined
    (type, dow) cell-count shuffle; marginals and totals are grid-sized
    frames; the MI/entropy sums run over ≤ |types|·7 terms so the double
    sum is order-stable far below ROUND(6). weekday()+1 == DuckDB isodow
    (the pipeline19 alignment)."""
    ev = t(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", (F.weekday("ts") + 1).alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    tot = obs.agg(F.sum("o").cast("bigint").alias("n"))
    rows_m = obs.groupBy("event_type").agg(F.sum("o").alias("r"))
    cols_m = obs.groupBy("dow").agg(F.sum("o").alias("c"))
    j = (
        obs.join(rows_m, "event_type")
        .join(cols_m, "dow")
        .join(F.broadcast(tot))
    )
    mi = j.agg(
        F.sum(
            (F.col("o").cast("double") / F.col("n"))
            * F.log(
                F.col("o").cast("double") * F.col("n")
                / (F.col("r").cast("double") * F.col("c"))
            )
        ).alias("mi_nats")
    )
    hx = (
        rows_m.join(F.broadcast(tot))
        .agg(
            (-F.sum(
                (F.col("r").cast("double") / F.col("n"))
                * F.log(F.col("r").cast("double") / F.col("n"))
            )).alias("h")
        )
    )
    hy = (
        cols_m.join(F.broadcast(tot))
        .agg(
            (-F.sum(
                (F.col("c").cast("double") / F.col("n"))
                * F.log(F.col("c").cast("double") / F.col("n"))
            )).alias("h")
        )
    )
    return (
        mi.join(F.broadcast(hx.withColumnRenamed("h", "hx")))
        .join(F.broadcast(hy.withColumnRenamed("h", "hy")))
        .join(F.broadcast(tot))
        .select(
            F.col("n").alias("n_events"),
            F.round("mi_nats", 6).alias("mi_nats"),
            # a degenerate (single-type or single-dow) grid has zero
            # marginal entropy: NMI is undefined -> NULL, and ANSI mode
            # would otherwise throw DIVIDE_BY_ZERO on the 0/0
            F.when(
                F.col("hx") * F.col("hy") > 0,
                F.round(F.col("mi_nats") / F.sqrt(F.col("hx") * F.col("hy")), 6),
            ).alias("nmi"),
        )
    )


@register(
    "dup_cluster_size_histogram",
    oracle="""
WITH clusters AS (
  SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS k
  FROM documents GROUP BY md5(text)
)
SELECT k AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(k * COUNT(*) AS BIGINT) AS n_docs,
       CAST((k - 1) * COUNT(*) AS BIGINT) AS docs_removed
FROM clusters
GROUP BY k
ORDER BY k
""",
)
def dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate cluster-size distribution — the dedup audit table a
    corpus report prints next to dedup_rate_by_source: how many clusters
    of each size exist and how many docs exact-dedup would remove. Both
    shuffles carry 32-byte md5 keys or 8-byte sizes after map-side
    combine (the dedup_exact contract — raw text never moves); output is
    O(distinct sizes). All-BIGINT, no float work at all. md5(NULL) is
    NULL on both engines, so NULL texts form one cluster."""
    d = t(spark, sf_dir, "documents")
    clusters = d.groupBy(F.md5("text").alias("h")).agg(F.count(F.lit(1)).alias("k"))
    return (
        clusters.groupBy(F.col("k").alias("cluster_size"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).cast("bigint").alias("n_docs"),
            ((F.col("cluster_size") - 1) * F.col("n_clusters"))
            .cast("bigint")
            .alias("docs_removed"),
        )
        .orderBy("cluster_size")
    )


@register(
    "boilerplate_prefix_dup",
    oracle="""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT md5(substr(regexp_replace(text, '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g'), 1, 40))) AS BIGINT) AS n_prefixes,
       ROUND(1 - CAST(COUNT(DISTINCT md5(substr(regexp_replace(text, '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g'), 1, 40))) AS DOUBLE)
                 / COUNT(*), 6) AS prefix_dup_rate
FROM documents
WHERE text IS NOT NULL
GROUP BY source
ORDER BY source NULLS LAST
""",
)
def boilerplate_prefix_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detector: share of documents per source whose
    whitespace-normalized 40-char prefix collides with another doc's —
    the cheap first-pass signal for templated/boilerplate content
    (Common Crawl header/footer spam) before any MinHash pass. The
    distinct count runs on md5(prefix) so the shuffle carries 32-byte
    hashes, not text (the dedup_exact contract). The whitespace class is
    the EXPLICIT [ \\t\\n\\r\\f\\x0B]+ on both engines — Java's '\\s'
    includes vertical tab \\x0B while RE2/DuckDB's does not, so the
    shorthand would diverge on \\x0B-bearing text; substr is
    character-based on both engines, so the prefix is byte-identical
    cross-engine. Integer counts + one division; ROUND(6)."""
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    pre = F.md5(F.substring(F.regexp_replace("text", "[ \\t\\n\\r\\f\\x0B]+", " "), 1, 40))
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct(pre).cast("bigint").alias("n_prefixes"),
        )
        .select(
            "source",
            "n_docs",
            "n_prefixes",
            F.round(
                1 - F.col("n_prefixes").cast("double") / F.col("n_docs"), 6
            ).alias("prefix_dup_rate"),
        )
        .orderBy(F.asc_nulls_last("source"))
    )
