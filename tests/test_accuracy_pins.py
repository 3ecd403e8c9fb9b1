"""Numeric accuracy pins (VERDICT r2 items 4-6): approximate sketches bounded
against exact answers computed from the SAME data, ANN recall@k vs the exact
brute-force baseline, and MinHash/LSH end-to-end recall vs the exact
shingle-Jaccard join. These restore independent evidence for the operators
whose driver rows are rows-only by design (sketches and LSH are
engine-specific, so value-hash oracles can't apply)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducefw_spark.operators import dedup, similarity
from mapreducefw_spark.queries._util import t

SF_MED = "/root/testdata/sf0.01"


def test_percentile_approx_within_eps_of_exact(spark, sf_dir):
    """percentile_approx(accuracy=10000) rank error is <= n/10000 rows per
    group; fixture groups are ~2k rows, so the sketch should land within 1%
    of the exact percentile value."""
    li = t(spark, sf_dir, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.75], 10000).alias("approx"),
            F.expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        for a, e in zip(r.approx, r.exact):
            assert abs(a - e) / e <= 0.01, (r.l_returnflag, a, e)


def test_approx_count_distinct_within_rsd_bounds(spark, sf_dir):
    """HLL++ at rsd=0.05: |approx - exact| / exact stays within 3 standard
    deviations (15%) — a real accuracy bound, not just rows > 0."""
    part = t(spark, sf_dir, "part")
    r = part.agg(
        F.approx_count_distinct("p_type", 0.05).alias("approx"),
        F.countDistinct("p_type").alias("exact"),
    ).collect()[0]
    assert abs(r.approx - r.exact) / r.exact <= 0.15, (r.approx, r.exact)


@pytest.fixture(scope="module")
def docs_01(spark):
    return t(spark, SF_MED, "documents")


def _exact_shingle_pairs(docs, threshold=0.5):
    """Quadratic exact shingle-Jaccard ground truth (test-only: 500 docs)."""
    hs = dedup.shingle_hashes(docs)
    a = hs.select(F.col("doc").alias("doc_a"), F.col("hs").alias("hs_a"))
    b = hs.select(F.col("doc").alias("doc_b"), F.col("hs").alias("hs_b"))
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    union = F.size("hs_a") + F.size("hs_b") - inter
    return (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def test_minhash_recall_vs_exact_jaccard(docs_01):
    """End-to-end LSH recall on the sf0.01 corpus: 16 bands x 2 rows catches
    a pair at shingle-Jaccard exactly 0.5 with prob 1-(1-0.25)^16 ~= 0.99
    (higher above 0.5). Pin >= 0.95 to leave room for unlucky seeds; also pin
    precision = 1.0 (the exact-verification step removes all false positives)."""
    exact = {(r.doc_a, r.doc_b) for r in _exact_shingle_pairs(docs_01, 0.5).collect()}
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_dedup_pairs(docs_01, threshold=0.5).collect()
    }
    assert exact, "fixture corpus must contain near-duplicate pairs"
    recall = len(got & exact) / len(exact)
    assert recall >= 0.95, f"recall {recall}: missed {sorted(exact - got)[:10]}"
    assert got <= exact, f"false positives: {sorted(got - exact)[:10]}"


def test_simhash_pairs_are_exactly_hamming_bounded(docs_01):
    """SimHash blocking misses nothing within hamming<=3 (pigeonhole is exact,
    not probabilistic): compare against quadratic signature comparison."""
    sigs = dedup.simhash_signatures(docs_01)
    a = sigs.select(F.col("doc").alias("doc_a"), F.col("simhash").alias("sa"))
    b = sigs.select(F.col("doc").alias("doc_b"), F.col("simhash").alias("sb"))
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    exact = {
        (r.doc_a, r.doc_b)
        for r in a.crossJoin(b)
        .filter((F.col("doc_a") < F.col("doc_b")) & (ham <= 3))
        .collect()
    }
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup.simhash_near_pairs(docs_01, max_hamming=3).collect()
    }
    assert got == exact


def test_cross_snapshot_minhash_recall_vs_exact(docs_01):
    """The rows-only cross-corpus LSH form (cross_snapshot_minhash) against
    the quadratic exact shingle-Jaccard cross-pairs on the same even/odd
    split: recall >= 0.95 (banding catches J>=0.5 pairs w.p. ~0.99) and
    precision 1.0 (the exact verification step removes every false positive).
    Measured 1.0/1.0 on this corpus — the pin leaves room for unlucky seeds
    after a fixture regeneration."""
    hs = dedup.shingle_hashes(docs_01)
    a = hs.filter(F.col("doc") % 2 == 0).select(
        F.col("doc").alias("doc_a"), F.col("hs").alias("hs_a")
    )
    b = hs.filter(F.col("doc") % 2 == 1).select(
        F.col("doc").alias("doc_b"), F.col("hs").alias("hs_b")
    )
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    union = F.size("hs_a") + F.size("hs_b") - inter
    exact = {
        (r.doc_a, r.doc_b)
        for r in a.crossJoin(b)
        .select("doc_a", "doc_b", (inter / union).alias("j"))
        .filter(F.col("j") >= 0.5)
        .collect()
    }
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup.cross_corpus_minhash_pairs(
            docs_01.filter(F.col("doc_id") % 2 == 0),
            docs_01.filter(F.col("doc_id") % 2 == 1),
            threshold=0.5,
            max_bucket_size=10_000,
        ).collect()
    }
    assert exact, "fixture corpus must contain cross-split near-duplicate pairs"
    recall = len(got & exact) / len(exact)
    assert recall >= 0.95, f"recall {recall}: missed {sorted(exact - got)[:10]}"
    assert got <= exact, f"false positives: {sorted(got - exact)[:10]}"


def test_jaccard_capped_recall_vs_uncapped(docs_01):
    """The rows-only hot-token-capped Jaccard join (jaccard_pairs_df_capped)
    against its exact uncapped twin on the same doc_id<200 slice: dropping
    tokens in >95% of docs must lose <5% of true pairs and invent none (the
    cap only ever shrinks intersections, so capped jaccard underestimates).
    Measured equal sets on this corpus."""
    sl = docs_01.filter(F.col("doc_id") < 200)
    full = {
        (r.doc_a, r.doc_b)
        for r in dedup.jaccard_token_pairs(sl, threshold=0.5).collect()
    }
    capped = {
        (r.doc_a, r.doc_b)
        for r in dedup.jaccard_token_pairs(
            sl, threshold=0.5, max_doc_freq_frac=0.95
        ).collect()
    }
    assert full, "fixture slice must contain near-duplicate pairs"
    recall = len(capped & full) / len(full)
    assert recall >= 0.95, f"recall {recall}: missed {sorted(full - capped)[:10]}"
    assert capped <= full, f"false positives: {sorted(capped - full)[:10]}"


@pytest.fixture(scope="module")
def vecs_01(spark):
    return similarity.as_double_vecs(t(spark, SF_MED, "embeddings")).cache()


def test_ivf_recall_pinned(vecs_01):
    q = vecs_01.filter(F.col("vid") < 10)
    exact = similarity.brute_force_topk(vecs_01, q, k=5).collect()
    ann = similarity.ivf_topk(vecs_01, q, k=5, n_cells=16, nprobe=8).collect()
    truth = {}
    for r in exact:
        truth.setdefault(r.qid, set()).add(r.nid)
    hits = sum(r.nid in truth[r.qid] for r in ann)
    assert hits / len(exact) >= 0.9, f"recall@5 {hits / len(exact)}"


def test_quantized_topk_recall_vs_float(vecs_01):
    """int8 scalar quantization against the float brute-force baseline:
    recall@5 must stay high (quantization error on 64-dim unit-scale vectors
    shifts cosine by <~1%, only reordering near-ties)."""
    q = vecs_01.filter(F.col("vid") < 10)
    exact = similarity.brute_force_topk(vecs_01, q, k=5).collect()
    qz = similarity.quantize_int8(vecs_01)
    got = similarity.quantized_topk(qz, qz.filter(F.col("vid") < 10), k=5).collect()
    truth = {}
    for r in exact:
        truth.setdefault(r.qid, set()).add(r.nid)
    hits = sum(r.nid in truth[r.qid] for r in got)
    assert hits / len(exact) >= 0.8, f"recall@5 {hits / len(exact)}"


def test_lsh_ann_recall_pinned(vecs_01):
    """Hyperplane-LSH recall floor at the registered query's config
    (4 planes x 12 tables, OR-construction). A single table measured 0.12
    recall@5 on this corpus; the 12-table union measured 0.78 — the
    multi-table union is what makes LSH a real ANN path, and this pin keeps
    it honest."""
    q = vecs_01.filter(F.col("vid") < 10)
    exact = similarity.brute_force_topk(vecs_01, q, k=5).collect()
    ann = similarity.random_hyperplane_topk(
        vecs_01, q, k=5, dim=64, n_planes=4, n_tables=12
    ).collect()
    truth = {}
    for r in exact:
        truth.setdefault(r.qid, set()).add(r.nid)
    hits = sum(r.nid in truth[r.qid] for r in ann)
    assert hits / len(exact) >= 0.6, f"recall@5 {hits / len(exact)}"


def test_lsh_portable_config_recall_pinned(vecs_01):
    """Recall floor for the ORACLE-PAIRED config (4 planes x 8 tables —
    embedding_lsh_topk_portable, pipeline32). Fewer tables than the
    rows-only 12-table form trades recall for a SQL-mirrorable plane set;
    this pin documents the price: measured 0.60 recall@5 on the sf0.01
    corpus (vs 0.78 at 12 tables). The value-hash oracle proves the
    buckets/rerank EXACT; this pin proves the config is still a real ANN."""
    q = vecs_01.filter(F.col("vid") < 10)
    exact = similarity.brute_force_topk(vecs_01, q, k=5).collect()
    ann = similarity.random_hyperplane_topk(
        vecs_01, q, k=5, dim=64, n_planes=4, n_tables=8
    ).collect()
    truth = {}
    for r in exact:
        truth.setdefault(r.qid, set()).add(r.nid)
    hits = sum(r.nid in truth[r.qid] for r in ann)
    assert hits / len(exact) >= 0.5, f"recall@5 {hits / len(exact)}"


def test_lsh_dedup_deployment_config_recall_pinned(vecs_01):
    """DEDUP-mode recall story (r9 verdict order #6). The 3-table x
    4-plane config the oracle pairs (`embedding_lsh_dedup` /
    `embedding_lsh_dedup_portable`) is the VERIFICATION WITNESS — it
    measured 0.51 pair-recall at the operator's own cosine>=0.4
    threshold on this corpus, which would leave half the near-dups in a
    production corpus. The DEPLOYMENT config is 16 tables x 4 planes:
    measured 0.93 pair-recall@0.4 here (14 tables ~ 0.90, 24 tables =
    1.00 — matching the OR-construction theory 1-(1-0.158)^n at
    cosine 0.4). This pin holds the deployment config >= 0.85 so a user
    has a measured table count to ship, not the demo config."""
    pairs_all = similarity.brute_force_topk(
        vecs_01, vecs_01, k=500, exclude_self=True
    )
    truth = {
        (r.qid, r.nid)
        for r in pairs_all.filter(
            (F.col("qid") < F.col("nid")) & (F.col("sim") >= 0.4)
        ).collect()
    }
    assert truth  # non-vacuous: the corpus has real >=0.4 pairs
    got = {
        (r.qid, r.nid)
        for r in similarity.random_hyperplane_topk(
            vecs_01, vecs_01, k=50, dim=64, n_planes=4, n_tables=16,
            broadcast_queries=False,
        )
        .filter((F.col("sim") >= 0.4) & (F.col("qid") < F.col("nid")))
        .collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.85, f"dedup pair recall@0.4 {recall}"


def test_hll_sketch_merge_is_lossless_and_bounded(spark, sf_dir):
    """Mergeable-sketch law: hll_union_agg over per-partition sketches gives
    EXACTLY the single-pass sketch's estimate (register union is lossless),
    and the estimate sits within the standard HLL error of the exact
    distinct count."""
    orders = t(spark, sf_dir, "orders")
    per = orders.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    merged = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0].est
    single = orders.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("est")
    ).collect()[0].est
    assert merged == single
    exact = orders.select("o_custkey").distinct().count()
    assert abs(merged - exact) / exact <= 0.05


def test_pq_two_stage_recall_pinned(vecs_01):
    """Product quantization end-to-end: ADC top-50 retrieval (m=16 x k=16
    codebooks on normalized vectors) + exact rerank recovers >= 0.8 of the
    exact cosine top-5 on the sf0.01 corpus (0.9 measured; the margin
    absorbs k-means float-summation variation). The near-orthogonal random
    fixture is PQ's adversarial regime — real embedding corpora cluster and
    quantize better, so the pin is conservative."""
    emb = vecs_01
    from pyspark.sql import functions as F

    from mapreducefw_spark.operators import similarity as S

    nrm = emb.select(
        "vid", F.transform("vec", lambda x: x / S._norm(F.col("vec"))).alias("vec")
    )
    books = S.pq_train(nrm, m=16, k=16, iters=2, dim=64)
    coded = S.pq_encode(nrm, books)
    q = nrm.filter(F.col("vid") < 10)
    got = {
        (r.qid, r.nid)
        for r in S.exact_rerank(S.pq_topk(coded, q, books, k=50), nrm, q, k=5).collect()
    }
    exact = {
        (r.qid, r.nid)
        for r in S.brute_force_topk(emb, emb.filter(F.col("vid") < 10), k=5).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.8, f"recall {recall}"
    # codes really are m small ints (the 16-bytes-per-vector claim)
    row = coded.first()
    assert len(row.codes) == 16 and all(0 <= c < 16 for c in row.codes)


def test_ivf_pq_recall_pinned(vecs_01):
    """IVF-ADC end-to-end: nprobe=6/16 cells scanned in 16-byte PQ codes,
    ADC shortlist of 50, exact rerank to 5 — recall@5 >= 0.7 vs brute
    force (0.86 measured; compound losses of cell pruning x quantization
    on the adversarial near-orthogonal fixture)."""
    emb = vecs_01
    from pyspark.sql import functions as F

    from mapreducefw_spark.operators import similarity as S

    nrm = emb.select(
        "vid", F.transform("vec", lambda x: x / S._norm(F.col("vec"))).alias("vec")
    )
    books = S.pq_train(nrm, m=16, k=16, iters=2, dim=64)
    q = nrm.filter(F.col("vid") < 10)
    got = {
        (r.qid, r.nid)
        for r in S.ivf_pq_topk(nrm, q, books, k=5, n_cells=16, nprobe=6).collect()
    }
    exact = {
        (r.qid, r.nid)
        for r in S.brute_force_topk(emb, emb.filter(F.col("vid") < 10), k=5).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.7, f"recall {recall}"
