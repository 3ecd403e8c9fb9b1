"""Scale-path LLM-pipeline queries over the operators package (SURVEY §7 M4).

``jaccard_token_pairs`` is oracle-checked (DuckDB computes the naive O(n²)
form; Spark runs the inverted-index similarity join — same result, different
plan). The LSH/IVF/SimHash entries are not SQL-expressible, so the driver
records rows-only checks; their semantics are pinned by pytest property tests
(exact duplicates are always found, IVF recall vs brute force, etc.).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.operators import dedup, multimodal, similarity, text
from mapreducefw_spark.operators.persist import pin
from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t

# The embeddings fixture's vector length (constant across all sf dirs —
# verified via parquet metadata). Vector dim is table metadata in any real
# vector store; operators take it as a parameter instead of sniffing a row,
# which would run a Spark action during plan construction.
EMBEDDING_DIM = 64


@register(
    "jaccard_token_pairs",
    oracle="""
WITH s AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS w
  FROM documents WHERE doc_id < 200
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       ROUND(CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
             / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))), 6) AS jaccard
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
      / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) >= 0.5
ORDER BY doc_a, doc_b
""",
)
def jaccard_token_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set Jaccard near-dup pairs; Spark side is the scalable
    inverted-index join, the oracle is the quadratic definition."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return dedup.jaccard_token_pairs(docs, threshold=0.5).orderBy("doc_a", "doc_b")


@register("jaccard_pairs_df_capped")  # approximation: rows-only
def jaccard_pairs_df_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale-safe Jaccard join: tokens in >95% of docs are dropped from
    the inverted index, bounding the hottest posting lists (near-universal
    tokens would otherwise make the self-join quadratic at corpus scale).
    The word-soup fixture's tiny vocabulary makes every token 'hot', so the
    cap is set high; real corpora use 0.1-0.5. The fractional cap resolves
    inside the plan (broadcast count aggregate) — no driver-side action."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return dedup.jaccard_token_pairs(
        docs, threshold=0.5, max_doc_freq_frac=0.95
    ).orderBy("doc_a", "doc_b")


@register("minhash_dedup_pairs")  # LSH banding: not SQL-expressible -> rows-only
def minhash_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # scale path: opt into the bucket cap (degenerate-bucket guard); at the
    # fixture scales no bucket comes near 10k docs so output is exact
    docs = t(spark, sf_dir, "documents")
    return dedup.minhash_dedup_pairs(docs, threshold=0.5, max_bucket_size=10_000)


@register("dedup_connected_groups")  # iterative algorithm: rows-only
def dedup_connected_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: MinHash pairs -> connected components -> one
    representative (min doc id) per group with its member count."""
    docs = t(spark, sf_dir, "documents")
    pairs = dedup.minhash_dedup_pairs(docs, threshold=0.5, max_bucket_size=10_000)
    groups = dedup.dedup_groups(pairs)
    return (
        groups.groupBy("group_id")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy("group_id")
    )


@register(
    "dedup_groups_small",
    oracle="""
WITH RECURSIVE s AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS w
  FROM documents WHERE doc_id < 100
),
p AS (
  SELECT a.doc_id AS da, b.doc_id AS db
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
        / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) >= 0.5
),
e AS (SELECT da AS src, db AS dst FROM p UNION SELECT db, da FROM p),
walk(doc, r) AS (
  SELECT src, src FROM e
  UNION
  SELECT e.src, walk.r FROM e JOIN walk ON walk.doc = e.dst
)
SELECT doc, MIN(r) AS group_id FROM walk GROUP BY doc ORDER BY doc
""",
)
def dedup_groups_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components, oracle-checked: exact token-Jaccard pairs on a
    doc_id<100 slice feed min-label propagation; DuckDB computes the same
    components via a recursive reachability CTE. Pins the iterative
    algorithm's semantics end-to-end (the full-corpus form stays rows-only)."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    pairs = dedup.jaccard_token_pairs(docs, threshold=0.5)
    return dedup.dedup_groups(pairs).orderBy("doc")


@register("simhash_near_pairs")  # rows-only
def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return dedup.simhash_near_pairs(docs, max_hamming=3, max_bucket_size=10_000)


@register("embedding_ivf_topk")  # ANN: rows-only (recall pinned in pytest)
def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = similarity.as_double_vecs(t(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vid") < 10)
    # kmeans_iters=0: seed centroids give equal recall on this clustered
    # fixture at half the cost; refinement is covered by pytest
    return similarity.ivf_topk(emb, q, k=5, n_cells=16, nprobe=4, kmeans_iters=0).orderBy(
        "qid", "rk"
    )


@register("embedding_lsh_topk")  # rows-only
def embedding_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = similarity.as_double_vecs(t(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vid") < 10)
    # multi-table OR-construction: 12 tables x 4 planes. One table alone
    # recalls ~12% of true top-5 at this corpus's neighbor angles (~69deg,
    # p~0.61 per plane); the 12-table union measures 0.78 recall@5 (pinned
    # >= 0.6 in tests/test_accuracy_pins.py). Signatures are map-only float
    # folds; candidates dedup as bare id pairs before the vector rerank join.
    return similarity.random_hyperplane_topk(
        emb, q, k=5, dim=EMBEDDING_DIM, n_planes=4, n_tables=12
    ).orderBy("qid", "rk")


@register(
    "embedding_cosine_dedup",
    oracle="""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
           WHERE vec_id IS NOT NULL AND vec_id < 300 AND embedding IS NOT NULL
             AND len(list_filter(embedding, x -> x IS NULL)) = 0
             AND COALESCE(list_sum(list_transform(embedding::DOUBLE[], x -> x*x)), 0) > 0)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.e, b.e), 6) AS sim
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.e, b.e) >= 0.4
ORDER BY id_a, id_b
""",
)
def embedding_cosine_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-based near-duplicate pairs (cosine >= 0.4 — the synthetic
    vectors max out near 0.46, so a production-style 0.9 returns nothing;
    the operator shape is identical). The oracle is
    the quadratic definition on a 300-vector slice; the scale path for the
    full corpus is LSH-bucketed (embedding_lsh_dedup below)."""
    emb = similarity.filter_searchable(
        similarity.as_double_vecs(t(spark, sf_dir, "embeddings")).filter(
            F.col("vid") < 300
        )
    )
    a = emb.select(F.col("vid").alias("id_a"), F.col("vec").alias("ea"))
    b = emb.select(F.col("vid").alias("id_b"), F.col("vec").alias("eb"))
    sim = similarity.cosine(F.col("ea"), F.col("eb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(sim >= 0.4)
        .select("id_a", "id_b", F.round(sim, 6).alias("sim"))
        .orderBy("id_a", "id_b")
    )


@register("embedding_lsh_dedup")  # LSH-bucketed near-dup over the full corpus: rows-only
def embedding_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: candidates share a random-hyperplane signature bucket, so
    the quadratic compare runs only inside buckets.

    CONFIG NOTE (r9 verdict order #6): 3 tables x 4 planes is the
    VERIFICATION WITNESS config (cheap, SQL-mirrorable, 0.51 measured
    pair-recall@0.4) — production dedup should run 16 tables x 4 planes
    (0.93 measured pair-recall@0.4, >=0.85 pinned in
    tests/test_accuracy_pins.py::test_lsh_dedup_deployment_config_recall_pinned;
    24 tables measured 1.00). Tables scale recall as 1-(1-p)^n with
    p~0.158 per table at cosine 0.4 — pick n from that curve, linear
    cost in signatures, same plan shape."""
    emb = similarity.as_double_vecs(t(spark, sf_dir, "embeddings"))
    # 4 planes x 3 tables: per-table P(bucket collision) ~ (1 - theta/pi)^4
    # is ~16% at cosine 0.4; OR over 3 tables lifts pair recall to ~51%
    # (measured) while each table's buckets keep the in-bucket compare far
    # from quadratic — the witness config; see the docstring for deployment
    pairs = similarity.random_hyperplane_topk(
        emb, emb, k=50, dim=EMBEDDING_DIM, n_planes=4, n_tables=3,
        broadcast_queries=False,  # queries == corpus: never force-broadcast it
    )
    return (
        pairs.filter((F.col("sim") >= 0.4) & (F.col("qid") < F.col("nid")))
        .select(F.col("qid").alias("id_a"), F.col("nid").alias("id_b"), "sim")
        .orderBy("id_a", "id_b")
    )


@register("semantic_dedup_cells")  # rows-only (float k-means; pins in pytest)
def semantic_dedup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (similarity.semantic_dedup): k-means
    cells, near-dup compare only within a cell (n²/k instead of n²), keep
    the lowest id per duplicate pair. Reported per cell: members and docs
    marked duplicate. Rows-only by design — cell assignment is float
    k-means, not SQL-oracle-expressible; the no-false-pairs subset property
    and full recall on a genuinely clustered corpus are pinned in
    tests/test_similarity.py, and the exact quadratic twin
    (embedding_cosine_dedup) carries the family's oracle row."""
    emb = similarity.as_double_vecs(t(spark, sf_dir, "embeddings"))
    sd = similarity.semantic_dedup(
        emb, n_cells=16, threshold=0.4, kmeans_iters=1, max_cell_size=100_000
    )
    return (
        sd.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("dup_of").isNotNull(), 1)).alias("n_dups"),
        )
        .orderBy("cell")
    )


def _langid_dist_oracle() -> str:
    """DuckDB twin of detect_language, generated from the same
    LANG_MARKERS table (the pipeline21 langid_confusion_matrix idiom) —
    what upgraded this query from rows-only to oracle-paired in r8."""
    from mapreducefw_spark.queries.pipeline21 import _langid_struct_sql

    return f"""
WITH toks AS (
  SELECT string_split(text, ' ') AS toks, text FROM documents
),
scored AS (
  SELECT CASE
           WHEN text IS NULL THEN 'und'
           ELSE (
             SELECT CASE WHEN best.score > 0 THEN best.lang ELSE 'und' END
             FROM (SELECT list_aggregate({_langid_struct_sql()}, 'max') AS best)
           )
         END AS detected_lang
  FROM toks
)
SELECT detected_lang, CAST(COUNT(*) AS BIGINT) AS n
FROM scored
GROUP BY detected_lang
ORDER BY detected_lang
"""


@register("lang_id_heuristic", oracle=_langid_dist_oracle())
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus language distribution by the marker-word heuristic
    (operators/text.detect_language): argmax of marker-hit ratios, ties
    to the lexicographically greatest lang, 'und' when nothing hits or
    text is NULL. The oracle re-derives the identical score structs from
    the shared LANG_MARKERS table, so this is oracle-paired as of r8
    (it was rows-only before the generated-SQL idiom existed). Map-only
    scoring; one vocabulary-sized count shuffle."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", text.detect_language("text").alias("detected_lang"))
        .groupBy("detected_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("detected_lang")
    )


@register(
    "rolling_fingerprint",
    oracle=None,  # xxhash64 is Spark-specific -> rows-only
)
def rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", text.rolling_fingerprint("text", window=8).alias("fp")
    ).orderBy("doc_id")


@register("multimodal_pipeline")  # decode stub is engine-specific -> rows-only
def multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = multimodal.synthesize_media(docs)
    decoded = multimodal.decode_media(media, deterministic_fake=True)
    return decoded.select(
        "media_id",
        "media_type",
        "width",
        "height",
        F.size("features").alias("feat_dim"),
        F.round(F.element_at("features", 1), 6).alias("f0"),
    ).orderBy("media_id")


@register(
    "embedding_truncated_topk",
    oracle="""
WITH ok AS (
       -- guard on the SLICED vector: searchability is decided in the
       -- truncated space the query actually searches
       SELECT vec_id, (embedding::DOUBLE[])[1:16] AS e FROM embeddings
       WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
         AND len(list_filter((embedding::DOUBLE[])[1:16], x -> x IS NULL)) = 0
         AND COALESCE(list_sum(list_transform((embedding::DOUBLE[])[1:16],
                                               x -> x*x)), 0) > 0
     ),
     q AS (SELECT vec_id AS qid, e AS qe FROM ok WHERE vec_id < 10),
     c AS (SELECT vec_id AS nid, e AS ne FROM ok),
     sims AS (
       SELECT qid, nid, ROUND(list_cosine_similarity(qe, ne), 6) AS sim
       FROM q CROSS JOIN c
       WHERE qid <> nid
     ),
     ranked AS (
       SELECT qid, nid, sim,
              ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk
       FROM sims
     )
SELECT qid, nid, sim, rk FROM ranked WHERE rk <= 5
ORDER BY qid, rk
""",
)
def embedding_truncated_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension truncation: exact cosine top-k over the
    FIRST 16 of 64 dimensions — the standard cheap first pass when the
    embedding model was trained with nested (MRL) objectives. 4x fewer
    bytes in scan/shuffle and 4x fewer multiply-adds per pair than the
    full-dim baseline, same plan shape (broadcast queries, corpus scanned
    once); recall vs the full-dim truth is pinned in
    tests/test_similarity.py. Complements int8 quantization
    (embedding_quantized_topk): truncation cuts DIMENSIONS, quantization
    cuts BYTES PER DIMENSION — production stacks compose both."""
    emb = similarity.as_double_vecs(t(spark, sf_dir, "embeddings")).select(
        "vid", F.slice("vec", 1, 16).alias("vec")
    )
    q = emb.filter(F.col("vid") < 10)
    return similarity.brute_force_topk(emb, q, k=5).orderBy("qid", "rk")


@register("embedding_pq_topk")  # rows-only: float k-means codebooks are engine-specific
def embedding_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al.), two-stage: normalize, train
    m=16 x k=16 codebooks (dim floats -> 16 bytes per vector, a 16x
    shuffle/RAM cut), retrieve top-50 per query by ADC table lookups, then
    exact-cosine rerank to top-5. On this near-orthogonal fixture the ADC
    candidate set contains 90% of the exact top-5 (recall pinned >= 0.8 in
    tests/test_accuracy_pins.py); at production scale PQ composes with IVF
    (IVF-ADC) so each query scans nprobe cells of byte codes, not floats."""
    emb = similarity.as_double_vecs(t(spark, sf_dir, "embeddings"))
    # ONE materialization of the normalized corpus (r13): the staged-norm
    # projection inside l2_normalize is collapsed by Catalyst back into
    # the transform lambda (plan-verified), so every downstream consumer
    # that re-derives anything from `nrm` lazily (searchable guards,
    # rerank norms, Arrow input projections, Lloyd passes) re-evaluates
    # an O(dim^2)-per-row fold — measured as 2.4-4.9s SINGLE-TASK scan
    # stages. The checkpoint pins plain double vectors for its >= 2
    # downstream passes; same values, same rows.
    nrm = pin(similarity.l2_normalize(emb))
    books = similarity.pq_train(nrm, m=16, k=16, iters=2, dim=EMBEDDING_DIM)
    coded = similarity.pq_encode(nrm, books, assume_searchable=True)  # nrm is guarded
    q = nrm.filter(F.col("vid") < 10)
    cand = similarity.pq_topk(coded, q, books, k=50)
    return similarity.exact_rerank(cand, nrm, q, k=5).orderBy("qid", "rk")


@register("embedding_ivf_pq_topk")  # rows-only: float k-means codebooks + cells
def embedding_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-ADC composition (the billion-scale form from the PQ paper): each
    query scans 6 of 16 inverted-file cells in m=16-byte PQ codes, scores
    by ADC table lookups, exact-reranks the top 50 to the final 5 —
    IVF's scan cut x PQ's 16x memory cut multiplied together. Recall@5
    pinned >= 0.7 (0.86 measured) in tests/test_accuracy_pins.py."""
    emb = similarity.as_double_vecs(t(spark, sf_dir, "embeddings"))
    # ONE materialization of the normalized corpus (r13): the staged-norm
    # projection inside l2_normalize is collapsed by Catalyst back into
    # the transform lambda (plan-verified), so every downstream consumer
    # that re-derives anything from `nrm` lazily (searchable guards,
    # rerank norms, Arrow input projections, Lloyd passes) re-evaluates
    # an O(dim^2)-per-row fold — measured as 2.4-4.9s SINGLE-TASK scan
    # stages. The checkpoint pins plain double vectors for its >= 2
    # downstream passes; same values, same rows.
    nrm = pin(similarity.l2_normalize(emb))
    books = similarity.pq_train(nrm, m=16, k=16, iters=2, dim=EMBEDDING_DIM)
    q = nrm.filter(F.col("vid") < 10)
    return similarity.ivf_pq_topk(
        nrm, q, books, k=5, n_cells=16, nprobe=6, retrieve=50
    ).orderBy("qid", "rk")
