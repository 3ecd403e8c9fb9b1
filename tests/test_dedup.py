"""Property tests for dedup operators (SURVEY §5.2 item 4): exact duplicates
must always be found; near-duplicates above threshold surface as pairs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducefw_spark.operators import dedup


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy cat again and again today"
    far = "completely different words nothing shared here at all whatsoever ok"
    rows = [
        (0, base),
        (1, base),        # exact dup of 0
        (2, near),        # near dup of 0/1
        (3, far),
        (4, "x y z"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_dedup_keeps_lowest_id(docs):
    kept = dedup.dedup_exact_hash(docs).select("doc_id").orderBy("doc_id")
    assert [r.doc_id for r in kept.collect()] == [0, 2, 3, 4]


def test_jaccard_pairs_find_exact_and_near(docs):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.jaccard_token_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0  # exact dup => jaccard exactly 1
    assert pairs[(0, 2)] >= 0.5 and pairs[(1, 2)] >= 0.5
    assert (0, 3) not in pairs and (0, 4) not in pairs


def test_minhash_finds_exact_and_near_dups(docs):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.minhash_dedup_pairs(docs, threshold=0.4).collect()
    }
    # exact duplicates always collide in every band
    assert pairs[(0, 1)] == 1.0
    # near-dup shares most shingles; banding at 8x4 catches >=0.4 reliably here
    assert (0, 2) in pairs
    assert (0, 3) not in pairs


def test_minhash_deterministic(docs):
    a = sorted(map(tuple, dedup.minhash_dedup_pairs(docs, threshold=0.4).collect()))
    b = sorted(map(tuple, dedup.minhash_dedup_pairs(docs, threshold=0.4).collect()))
    assert a == b


def test_minhash_broadcast_and_shuffle_prune_agree(docs):
    """The size-gated candidate-id prune (r9 verdict order #5): the
    broadcast semi-join and the plain shuffle semi-join are the same
    FILTER, so forcing either path must yield identical pairs — the pin
    that makes the 100 TB fallback a semantics-free switch."""
    bcast = sorted(
        map(
            tuple,
            dedup.minhash_dedup_pairs(docs, threshold=0.4, cand_broadcast=True).collect(),
        )
    )
    shuffle = sorted(
        map(
            tuple,
            dedup.minhash_dedup_pairs(docs, threshold=0.4, cand_broadcast=False).collect(),
        )
    )
    auto = sorted(
        map(tuple, dedup.minhash_dedup_pairs(docs, threshold=0.4).collect())
    )
    assert bcast == shuffle == auto
    assert bcast  # non-vacuous: the fixture has real near-dup pairs


def test_dedup_groups_connected_components(spark):
    # two chains and a singleton edge: {1,2,3,4} via 1-2,2-3,3-4 and {10,11}
    pairs = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (10, 11, 1.0)],
        "doc_a bigint, doc_b bigint, jaccard double",
    )
    groups = {r.doc: r.group_id for r in dedup.dedup_groups(pairs).collect()}
    assert groups == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_dedup_groups_deep_chain_cap_semantics(spark):
    """A component whose diameter EXCEEDS max_iters (verdict r11 order #3):
    on_cap='raise' must fail loudly instead of returning unconverged ids
    (oracle-paired callers like embedding_dedup_clusters depend on this —
    silent unconvergence would surface only as an opaque hash mismatch),
    'warn' must emit RuntimeWarning, and a cap >= diameter must converge
    to the exact min-label closure."""
    # path graph 0-1-2-...-8: min-label propagation moves the 0 label one
    # hop per iteration, so node 8 needs 8 rounds — max_iters=3 is capped
    chain = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(8)],
        "doc_a bigint, doc_b bigint, jaccard double",
    )
    with pytest.raises(RuntimeError, match="iteration cap"):
        dedup.dedup_groups(chain, max_iters=3, on_cap="raise").collect()
    with pytest.warns(RuntimeWarning, match="UNCONVERGED"):
        dedup.dedup_groups(chain, max_iters=3, on_cap="warn").collect()
    # generous cap: exact closure, every node labeled 0 — the same call
    # shape the oracle-paired queries use (on_cap='raise', default cap)
    groups = {
        r.doc: r.group_id
        for r in dedup.dedup_groups(chain, on_cap="raise").collect()
    }
    assert groups == {i: 0 for i in range(9)}
    with pytest.raises(ValueError, match="bad on_cap"):
        dedup.dedup_groups(chain, on_cap="explode")


def test_minhash_explicit_gate_skips_size_count_jobs(docs, spark):
    """verdict r11 order #6 (measured form): explicit cand_broadcast callers
    must not pay the size-gate count. Fully-zero-job construction is NOT
    attainable here — under AQE, localCheckpoint(eager=False) on a joined
    plan finalizes the adaptive plan, which materializes its intermediate
    shuffle map stages as jobs (work the final action then reuses, so
    nothing is wasted — just scheduled early). What IS contract: both
    explicit paths run the same construction-job count, the default
    (None = eager size gate) runs strictly more, and explain() adds none."""
    sc = spark.sparkContext

    def jobs_during(tag, fn):
        sc.setJobGroup(tag, tag)
        out = fn()
        return out, len(sc.statusTracker().getJobIdsForGroup(tag))

    frame, n_false = jobs_during(
        "mh_exp_f", lambda: dedup.minhash_dedup_pairs(docs, threshold=0.5, cand_broadcast=False)
    )
    _, n_true = jobs_during(
        "mh_exp_t", lambda: dedup.minhash_dedup_pairs(docs, threshold=0.5, cand_broadcast=True)
    )
    _, n_default = jobs_during(
        "mh_gate", lambda: dedup.minhash_dedup_pairs(docs, threshold=0.5)
    )
    _, n_explain = jobs_during("mh_explain", lambda: frame.explain())
    assert n_false == n_true, (n_false, n_true)
    assert n_default > n_false, (n_default, n_false)
    assert n_explain == 0
    # and the explicit frame still computes correctly when finally acted on
    assert frame.count() > 0


@pytest.fixture(scope="module")
def boilerplate(spark):
    """Degenerate corpus: 2000 identical docs — every LSH bucket collapses to
    one giant bucket, the quadratic-inside-bucket edge case."""
    text = "terms of service apply to all users of this site every day forever"
    return spark.createDataFrame(
        [(i, text) for i in range(2000)], "doc_id bigint, text string"
    )


def test_minhash_bucket_cap_bounds_degenerate_corpus(boilerplate):
    # capped: the 2000-doc bucket exceeds max_bucket_size and is dropped,
    # so candidate generation never goes quadratic (2M pairs -> 0)
    capped = dedup.minhash_dedup_pairs(boilerplate, threshold=0.5, max_bucket_size=100)
    assert capped.count() == 0
    # a cap above the corpus size keeps exact behavior: all pairs survive
    kept = dedup.minhash_dedup_pairs(
        boilerplate.filter(F.col("doc_id") < 40), threshold=0.5, max_bucket_size=10_000
    )
    assert kept.count() == 40 * 39 // 2


def test_simhash_bucket_cap_bounds_degenerate_corpus(boilerplate):
    capped = dedup.simhash_near_pairs(boilerplate, max_bucket_size=100)
    assert capped.count() == 0
    kept = dedup.simhash_near_pairs(
        boilerplate.filter(F.col("doc_id") < 40), max_bucket_size=10_000
    )
    assert kept.count() == 40 * 39 // 2


def test_simhash_identical_docs_distance_zero(docs):
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in dedup.simhash_near_pairs(docs).collect()}
    assert pairs[(0, 1)] == 0
    assert (0, 4) not in pairs


def test_cross_corpus_minhash_inter_pairs_only(docs):
    """A x B near-dups surface; intra-corpus pairs never do."""
    a = docs.filter(F.col("doc_id").isin(0, 3))      # new snapshot: base + far
    b = docs.filter(F.col("doc_id").isin(1, 2, 4))   # existing corpus
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.cross_corpus_minhash_pairs(a, b, threshold=0.4).collect()
    }
    assert pairs[(0, 1)] == 1.0          # exact dup across corpora
    assert (0, 2) in pairs               # near dup across corpora
    assert all(da in (0, 3) and db in (1, 2, 4) for da, db in pairs)
    assert (3, 4) not in pairs           # dissimilar stays out


def test_containment_catches_subsumed_doc_jaccard_misses(spark):
    """A short doc fully contained in a much longer one: overlap coefficient
    1.0 (found), while its Jaccard is far below any dedup threshold — the
    case this operator exists for."""
    from pyspark.sql import functions as F

    long_text = " ".join(f"w{i}" for i in range(400))
    short_text = " ".join(f"w{i}" for i in range(40, 60))  # strict subset
    other = " ".join(f"x{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, long_text), (2, short_text), (3, other)], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.overlap
        for r in dedup.overlap_coefficient_pairs(docs, threshold=0.9).collect()
    }
    assert got == {(1, 2): 1.0}
    jac = dedup.jaccard_token_pairs(docs, threshold=0.4).collect()
    assert jac == []  # symmetric Jaccard (20/400 = 0.05) misses it
