"""Deduplication operators for LLM training-data pipelines (SURVEY §7 M4).

Four tiers, all shuffle-architected for 100 TB corpora:

- exact: group on a 256-bit content hash (32-byte shuffle key, never the
  document bytes), keep lowest id. See also queries/llm.py::dedup_exact.
- token-set Jaccard: similarity join via inverted index (explode distinct
  tokens -> self-join on token -> count intersections). Work is proportional
  to the posting lists, not n² over documents.
- MinHash + LSH banding: k minhashes per doc via k seeded xxhash64 mins
  (one explode + one groupBy with k partial-agg mins = one shuffle), band
  hashes -> bucket join for candidates -> exact-Jaccard verification on
  candidates only. The classic sublinear near-dup pipeline.
- SimHash: 64-bit signature from token-hash bit votes; candidates share one
  of four 16-bit chunks; verified by Hamming distance (bit_count of xor).

Everything is deterministic (xxhash64, fixed seeds) so results are stable
across runs and partitionings.

Digest-keying assumption (the canonical note — digest-keyed call sites
cross-reference here; r12 verdict order #6): operators that shuffle or
group on a hash OF the content instead of the content itself (md5 block
keys in queries/pipeline38.py::_block_filter_frame, dup_passage_coverage's
passage digests, exact_substring's gram hashes, the minhash shingle and
band keys below) accept hash collisions as a correctness trade: a
CONSTRUCTED collision (md5 collisions are practical; xxhash64/64-bit
truncations collide at birthday scale ~2^32) makes two distinct contents
count as duplicates of each other. This is the standard large-corpus
dedup posture (the suffix-array / MinHash literature keys on digests for
exactly this shuffle-width reason); for adversarial inputs swap the key
to sha256 (~2x digest cost, no plan change) — `dedup_exact_hash` below
already uses sha2-256 for the exact tier, where a collision would merge
unrelated documents rather than merely over-count a block.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd  # noqa: F401  (resolves pandas_udf type hints under PEP 563)
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from mapreducefw_spark.operators.persist import pin
from mapreducefw_spark.operators.textprep import (
    distinct_tokens,
    ensure_parallelism,
    hash64,
    shingles,
)

_LOG = logging.getLogger(__name__)


def dedup_exact_hash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per exact content (hash-grouped)."""
    w = W.partitionBy(F.sha2(text_col, 256)).orderBy(id_col)
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def jaccard_token_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
    max_doc_freq_frac: float | None = None,
) -> DataFrame:
    """All document pairs with token-set Jaccard >= threshold.

    Inverted-index similarity join: |A∩B| from a self-join on token postings,
    |A∪B| = |A|+|B|-|A∩B|. Scales with posting-list sizes; a hot token (stop
    word) makes its posting list quadratic, so the 100 TB run caps document
    frequency to drop tokens appearing in too many documents — either an
    absolute count (max_doc_freq) or a corpus fraction (max_doc_freq_frac,
    resolved INSIDE the plan via a broadcast total-count aggregate, so no
    driver-side action runs while the query is being built). The result then
    under-counts intersections through dropped tokens (an upper-bounded
    approximation); leave both None for exact semantics (the oracle-checked
    form).
    """
    toks = ensure_parallelism(df).select(F.col(id_col).alias("doc"), distinct_tokens(text_col).alias("w"))
    sizes = toks.select("doc", F.size("w").alias("n"))
    posting = toks.select("doc", F.explode("w").alias("token"))
    if max_doc_freq is not None or max_doc_freq_frac is not None:
        dfreq = posting.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
        if max_doc_freq_frac is not None:
            ndocs = F.broadcast(toks.agg(F.count(F.lit(1)).alias("nd")))
            dfreq = dfreq.crossJoin(ndocs).filter(
                F.col("df") <= F.greatest(F.col("nd") * max_doc_freq_frac, F.lit(1.0))
            )
        if max_doc_freq is not None:
            dfreq = dfreq.filter(F.col("df") <= max_doc_freq)
        posting = posting.join(dfreq.select("token"), "token")
    a, b = posting.alias("a"), posting.alias("b")
    inter = (
        a.join(b, (F.col("a.token") == F.col("b.token")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    max_gram_freq: int | None = None,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark-contamination check: for each corpus document, how many
    distinct word n-grams it shares with each benchmark document.

    The standard decontamination pass before pre-training: any corpus doc
    sharing enough n-grams with an eval set is dropped. Implemented as an
    inverted-index join on 64-bit gram hashes — the shuffle carries
    (gram_hash, doc_id) pairs, never document text, and the benchmark side
    of a real run is tiny (eval sets), so its posting list broadcasts by
    default; pass ``broadcast_benchmark=False`` when the "benchmark" is a
    corpus-sized slice (e.g. decontaminating one shard against another) —
    a broadcast that big would blow the driver/executor broadcast limits.
    ``max_gram_freq`` caps hot grams (boilerplate) exactly like the Jaccard
    join's doc-frequency guard; leave None for exact semantics.

    Returns (corpus_doc, bench_doc, n_shared) — threshold downstream.
    """
    c = shingle_hashes(corpus, text_col=text_col, id_col=id_col, shingle_n=n).select(
        F.col("doc").alias("corpus_doc"), F.explode("hs").alias("g")
    )
    b = shingle_hashes(benchmark, text_col=text_col, id_col=id_col, shingle_n=n).select(
        F.col("doc").alias("bench_doc"), F.explode("hs").alias("g")
    )
    if max_gram_freq is not None:
        freq = c.groupBy("g").agg(F.count(F.lit(1)).alias("cf"))
        c = c.join(freq.filter(F.col("cf") <= max_gram_freq).select("g"), "g")
    if broadcast_benchmark:
        b = F.broadcast(b)
    return (
        c.join(b, "g")
        .groupBy("corpus_doc", "bench_doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def overlap_coefficient_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Containment dedup: pairs whose token-set overlap coefficient
    |A∩B| / min(|A|,|B|) >= threshold — catches a document SUBSUMED by a
    longer one (quote-inside-article, boilerplate-wrapped reposts), which
    symmetric Jaccard misses: a 50-token doc fully contained in a 5000-token
    doc has Jaccard ~0.01 but containment 1.0.

    Same inverted-index shape as jaccard_token_pairs (posting-list self-join;
    shuffle carries (token, doc) pairs, never text), same hot-token cap for
    the 100 TB form. Returns (doc_a, doc_b, overlap) with doc_a < doc_b.
    """
    toks = ensure_parallelism(df).select(
        F.col(id_col).alias("doc"), distinct_tokens(text_col).alias("w")
    )
    sizes = toks.select("doc", F.size("w").alias("n"))
    posting = toks.select("doc", F.explode("w").alias("token"))
    if max_doc_freq is not None:
        dfreq = posting.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
        posting = posting.join(dfreq.filter(F.col("df") <= max_doc_freq).select("token"), "token")
    a, b = posting.alias("a"), posting.alias("b")
    inter = (
        a.join(b, (F.col("a.token") == F.col("b.token")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n").alias("nb"))
    ov = F.col("inter") / F.least(F.col("na"), F.col("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(ov, 6).alias("overlap"))
        .filter(F.col("overlap") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """(doc, minhash array of length num_hashes): shingles are string-hashed
    once (map-only), then k seeded long-hash mins via explode + hash
    aggregation — map-side partial agg keeps the exchange at one k-long row
    per doc per partition."""
    base = shingle_hashes(df, text_col=text_col, id_col=id_col, shingle_n=shingle_n)
    return _minhash_from_hashes(base, num_hashes)


def shingle_hashes(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id", shingle_n: int = 3
) -> DataFrame:
    """(doc, distinct shingle hashes as array<long>) — each string shingle is
    hashed exactly once; downstream hash families and Jaccard verification
    operate on the longs (collisions at 64 bits are negligible)."""
    return ensure_parallelism(df).select(
        F.col(id_col).alias("doc"),
        F.array_distinct(
            F.transform(shingles(text_col, shingle_n), lambda s: F.xxhash64(s))
        ).alias("hs"),
    )


def _minhash_from_hashes(hs_df: DataFrame, num_hashes: int) -> DataFrame:
    """(doc, hs array<long>) -> (doc, minhash array<int>).

    k array_min(transform(...)) expressions in ONE map-only projection — no
    shuffle at all in the signature path. Measured 4x faster at sf0.1 than
    the explode + k-column hash-aggregate alternative (which pays an exchange
    plus 32-column partial aggs); at 100 TB shuffle-free also means the
    signature build pipelines straight into banding within the same stage.

    Signatures are INT32: the low 32 bits of a 64-bit uniform hash are
    uniform, and minhash theory needs only a uniform family per seed, so
    min-of-int32 is the same estimator at half the signature bytes — the
    signature array is what downstream banding shuffles, so this halves the
    network cost of the 100 TB dedup path (collision probability within a
    doc's shingle set at 2^32 is ~n^2/2^33, irrelevant at n ~ thousands;
    recall/precision pins in tests/test_dedup.py hold unchanged)."""
    # ONE SQL expr for all k mins (r14, guide §7.3): building the k
    # transform/array_min trees Column-by-Column cost ~5k py4j round
    # trips (~1.3s of driver time per construction, paid by every bench
    # rep). The parsed tree is identical — integer seed literals, the
    # bigint mask/shift (low-32-bit extraction is mask-and-subtract, not
    # a narrowing CAST from the full 64 bits, which ANSI would throw on),
    # the same 0-based fold — so signatures are bit-identical.
    mins_sql = ", ".join(
        f"array_min(transform(hs, h -> "
        f"CAST(((xxhash64({i}, h) & 4294967295) - 2147483648) AS INT)))"
        for i in range(num_hashes)
    )
    return hs_df.select("doc", F.expr(f"array({mins_sql})").alias("minhash"))


def cap_bucket_size(
    buckets: DataFrame, key_cols: list[str], max_bucket_size: int | None
) -> DataFrame:
    """Drop LSH buckets holding more than max_bucket_size docs.

    Candidate generation self-joins on bucket keys, so one degenerate bucket
    (millions of identical boilerplate docs sharing a band hash) is quadratic
    inside that bucket. A window count over the bucket key bounds it: the
    count rides the same hash partitioning the self-join needs anyway, so the
    guard adds no extra exchange. Dropped buckets lose only pairs of
    mass-duplicated docs — exactly the ones exact dedup already catches
    upstream, which is why production near-dup pipelines run hash-dedup first.
    """
    if max_bucket_size is None:
        return buckets
    w = W.partitionBy(*key_cols)
    return (
        buckets.withColumn("_bsz", F.count(F.lit(1)).over(w))
        .filter(F.col("_bsz") <= max_bucket_size)
        .drop("_bsz")
    )


def _band_buckets(sigs: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """(doc, minhash) -> (doc, band, h): one bucket row per band, the band's
    signature rows folded into a single 64-bit key. Map-only."""
    # one SQL expr for the whole band array (same py4j-round-trip saving
    # as _minhash_from_hashes above; identical 0-based GetArrayItem /
    # xxhash64 tree, so band keys are bit-identical)
    structs = ", ".join(
        "named_struct('band', {b}, 'h', xxhash64({args}))".format(
            b=b,
            args=", ".join(
                f"minhash[{b * rows_per_band + r}]" for r in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    return sigs.select("doc", F.explode(F.expr(f"array({structs})")).alias("bh")).select(
        "doc", F.col("bh.band").alias("band"), F.col("bh.h").alias("h")
    )


def minhash_candidate_pairs(
    sigs: DataFrame,
    *,
    bands: int = 8,
    rows_per_band: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH banding: docs sharing any band hash become candidate pairs.

    Buckets above max_bucket_size are dropped before the self-join (see
    cap_bucket_size) — the quadratic-inside-bucket guard for boilerplate-heavy
    corpora. The default (None) keeps exact candidate semantics: silently
    capping would drop true near-dup pairs for callers that never asked for
    it. Scale-path call sites (the registered corpus queries) opt in
    explicitly."""
    buckets = _band_buckets(sigs, bands, rows_per_band)
    buckets = cap_bucket_size(buckets, ["band", "h"], max_bucket_size)
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


# Broadcast gate for the candidate-id semi-join: 10M long ids is ~160 MB
# serialized — comfortably inside executor broadcast budgets and far under
# the 8 GB hard ceiling. Above it (a boilerplate-heavy crawl where banding
# still yields a huge candidate set) the prune falls back to a plain
# shuffle semi-join: same semantics, no driver/executor memory cliff.
_CAND_BROADCAST_MAX_IDS = 10_000_000


def minhash_dedup_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket_size: int | None = None,
    cand_broadcast: bool | None = None,
) -> DataFrame:
    """Near-duplicate pairs: MinHash/LSH candidates verified by exact shingle
    Jaccard (computed only for candidates — the expensive step stays small).

    Banding default 16 bands x 2 rows: candidate s-curve threshold
    (1/b)^(1/r) ~= 0.25, so pairs at Jaccard >= 0.5 are caught with
    probability >= 1-(1-0.5^2)^16 ~= 0.99 — false positives below the
    threshold are removed by the exact verification step.

    The shingle-hash pass feeds three consumers (signatures + both sides of
    the verification join) and is deterministic (xxhash64), so it is simply
    recomputed — a map-only pass. No persist(): caching it would pin
    corpus-sized state in executor memory for the session (round-1 bench
    logged cache-thrash warnings); a 100 TB run that wants reuse should
    checkpoint hs to storage between the two jobs instead.

    NOTE: ``cand_broadcast=None`` (the default) makes construction EAGER —
    it runs a size-gate count over the localCheckpoint'ed candidate frame
    (whose materialization the main job reuses) to decide the candidate-id
    broadcast. Callers that don't want the gate (explain, composition
    without execution) pass an explicit True/False and skip those jobs.
    Construction is still not fully job-free even then: under AQE,
    ``localCheckpoint(eager=False)`` on a joined plan finalizes the
    adaptive plan, which schedules its intermediate shuffle map stages as
    jobs at construction time — stages the final action reuses, so the
    work is early, not wasted (pinned differentially in
    tests/test_dedup.py::test_minhash_explicit_gate_skips_size_count_jobs)."""
    rows_per_band = num_hashes // bands
    # ONE materialization of the shingle hashes: the frame feeds the
    # signature path AND the verification join, and without the pin each
    # subtree re-runs shingling plus its ensure_parallelism exchange
    # (measured as a duplicated 0.85 MB shuffle at sf0.1 — the probe's
    # stage 1/stage 10 twins). localCheckpoint spills to executor-local
    # disk, not heap, so the round-1 cache-thrash concern doesn't apply.
    hs = shingle_hashes(
        df, text_col=text_col, id_col=id_col, shingle_n=shingle_n
    ).localCheckpoint(eager=False)
    sigs = _minhash_from_hashes(hs, num_hashes)
    cands = minhash_candidate_pairs(
        sigs, bands=bands, rows_per_band=rows_per_band, max_bucket_size=max_bucket_size
    ).localCheckpoint(eager=False)  # reused by the join AND the id-set below
    # The verification join only needs shingle arrays for docs that actually
    # appear in a candidate pair — at near-dup rates that is a small fraction
    # of the corpus, and shuffling every doc's full hash array was the
    # dominant shuffle of this pipeline (measured 3.2 MB vs 0.6 MB input at
    # sf0.1; SHUFFLE.md). The candidate-id set is USUALLY bounded by banding
    # + the bucket cap, so it broadcasts — but "usually" is not a 100 TB
    # guarantee, so the broadcast is SIZE-GATED (r9 verdict order #5):
    # cand_broadcast=None counts the id set (one job over the already-
    # checkpointed candidate frame) and broadcasts only under
    # _CAND_BROADCAST_MAX_IDS; above it the prune is a plain shuffle
    # semi-join — same semantics (pinned in tests/test_dedup.py), no
    # broadcast-ceiling cliff. True/False force a path.
    cand_ids = (
        cands.select(F.col("doc_a").alias("doc"))
        .union(cands.select(F.col("doc_b").alias("doc")))
        .distinct()
    )
    if cand_broadcast is None:
        # This count runs a Spark job NOW, at plan-construction time — loud
        # by design (ADVICE r10): plan-only callers (explain/composition)
        # that want to stay lazy should pass cand_broadcast=True/False.
        n_cand_ids = cand_ids.count()
        cand_broadcast = n_cand_ids <= _CAND_BROADCAST_MAX_IDS
        _LOG.info(
            "minhash_dedup_pairs: eager size-gate job counted %d candidate "
            "ids -> %s prune (pass cand_broadcast=True/False to skip the "
            "eager count)",
            n_cand_ids,
            "broadcast" if cand_broadcast else "shuffle semi-join",
        )
    hs_c = hs.join(
        F.broadcast(cand_ids) if cand_broadcast else cand_ids, "doc", "left_semi"
    )
    sa = hs_c.select(F.col("doc").alias("doc_a"), F.col("hs").alias("hs_a"))
    sb = hs_c.select(F.col("doc").alias("doc_b"), F.col("hs").alias("hs_b"))
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    union = F.size("hs_a") + F.size("hs_b") - inter
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(inter / union, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def cross_corpus_minhash_pairs(
    corpus_a: DataFrame,
    corpus_b: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs ACROSS two corpora — the snapshot-merge dedup:
    which docs of a new crawl (A) near-duplicate the corpus already ingested
    (B). Self-join LSH would also emit intra-corpus pairs and pay a bucket
    join over |A|+|B|; banding each side separately and joining A-buckets to
    B-buckets on (band, h) yields only inter-corpus candidates, and the
    existing corpus's buckets are a reusable artifact (write once per
    snapshot, join each new crawl against it). Candidates are verified by
    exact shingle Jaccard, same as the self-join form.

    Returns (doc_a, doc_b, jaccard) with doc_a from A, doc_b from B.
    """
    rows_per_band = num_hashes // bands
    hs_a = shingle_hashes(corpus_a, text_col=text_col, id_col=id_col, shingle_n=shingle_n)
    hs_b = shingle_hashes(corpus_b, text_col=text_col, id_col=id_col, shingle_n=shingle_n)
    bk_a = cap_bucket_size(
        _band_buckets(_minhash_from_hashes(hs_a, num_hashes), bands, rows_per_band),
        ["band", "h"],
        max_bucket_size,
    )
    bk_b = cap_bucket_size(
        _band_buckets(_minhash_from_hashes(hs_b, num_hashes), bands, rows_per_band),
        ["band", "h"],
        max_bucket_size,
    )
    cands = (
        bk_a.alias("a")
        .join(bk_b.alias("b"), ["band", "h"])
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    sa = hs_a.select(F.col("doc").alias("doc_a"), F.col("hs").alias("hs_a"))
    sb = hs_b.select(F.col("doc").alias("doc_b"), F.col("hs").alias("hs_b"))
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    union = F.size("hs_a") + F.size("hs_b") - inter
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(inter / union, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def dedup_groups(
    pairs: DataFrame, *, max_iters: int = 20, on_cap: str = "warn"
) -> DataFrame:
    """Connected components over near-duplicate pairs -> (doc, group_id).

    group_id is the minimum doc id reachable through the pair graph, found by
    iterative min-label propagation (each round: every node takes the min of
    its own and its neighbors' labels). Converges in O(graph diameter)
    rounds; near-dup clusters are shallow, so max_iters=20 is generous.
    Deterministic: labels are ids, min is order-free.

    If the loop exits via the iteration cap while labels are still
    changing (a component with diameter > max_iters), the returned ids
    are UNCONVERGED — ``on_cap`` controls the reaction: "warn" (default)
    emits a RuntimeWarning, "raise" fails loudly (the right choice for
    oracle-paired callers, where silent unconvergence would surface only
    as an opaque hash mismatch), "ignore" keeps the old silent behavior.
    """
    if on_cap not in ("warn", "raise", "ignore"):
        raise ValueError(f"dedup_groups: bad on_cap {on_cap!r}")
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .persist()
    )
    # Round-1 shortcut (r14, exact algebra): labels start as the identity,
    # so round 1's min(self ∪ neighbor labels) is just least(src, min of
    # neighbor ids) — ONE map-side-combinable aggregate over the edge
    # frame replaces the identity-label build + the first edges-x-labels
    # join (every node appears as src because edges are symmetric; _old
    # is the identity by definition). Rounds 2+ run the general form.
    labels = None  # built by round 1; identity fallback only at max_iters=0
    changed = 0
    done = 0
    while done < max_iters:
        # One round = ONE join + ONE aggregate (r13 optimization): the
        # neighbor contributions and the node's own label are unioned and
        # min-folded together — min(self ∪ neighbors) is exactly the old
        # least(own, coalesce(neighbor_min, own)) — instead of the former
        # join + groupBy + second (left) join. The own label rides the
        # union under an _own tag so the SAME aggregate also yields the
        # old label, which makes the convergence check a scan of the
        # checkpointed output (new < old somewhere?) rather than a third
        # join of consecutive label frames. Exact-integer min: identical
        # labels, identical round count, order-free.
        #
        # Pointer doubling (label-of-label self-join after the fold) was
        # implemented and MEASURED here in r14: oracle-identical (the
        # fixpoint is the component minimum either way) but 63 jobs /
        # 14.7s vs 48 jobs / 9.5s on embedding_dedup_pipeline —
        # near-dup components are shallow, so the extra self-join's AQE
        # stages per round cost more than the rounds it saves. Reverted;
        # re-evaluate only for deep-diameter graphs (guide §2.4 / §1.2).
        if labels is None:
            folded = (
                edges.groupBy(F.col("src").alias("doc"))
                .agg(F.min("dst").alias("_m"))
                .select(
                    "doc",
                    F.least(F.col("doc"), F.col("_m")).alias("label"),
                    F.col("doc").alias("_old"),
                )
            )
        else:
            contrib = edges.join(labels, edges.dst == labels.doc).select(
                F.col("src").alias("doc"), "label", F.lit(False).alias("_own")
            )
            folded = (
                contrib.unionByName(labels.select("doc", "label", F.lit(True).alias("_own")))
                .groupBy("doc")
                .agg(
                    F.min("label").alias("label"),
                    F.min(F.when(F.col("_own"), F.col("label"))).alias("_old"),
                )
            )
        done += 1
        # lazy pin + the count below = ONE action per round (r14): the
        # convergence count's scan is what materializes this round's
        # checkpoint, where the former eager checkpoint + a separate
        # limit(1).count() paid two actions per round. A two-rounds-per-
        # pin variant (lazy odd rounds, check every second round — exact,
        # since the loop stops iff the LAST round changed nothing) was
        # also measured in r14: 51 jobs / wall within noise vs this
        # form's 48 jobs — compiling the doubled plan costs what the
        # skipped pin saved. Reverted; don't re-try blind.
        folded = pin(folded)
        changed = folded.filter(F.col("label") < F.col("_old")).count()
        labels = folded.select("doc", "label")
        if changed == 0:
            break
    if changed != 0:
        msg = (
            f"dedup_groups: min-label propagation hit the iteration cap "
            f"(max_iters={max_iters}) while labels were still changing — "
            f"a component has diameter > {max_iters}; group ids are "
            f"UNCONVERGED"
        )
        if on_cap == "raise":
            edges.unpersist()
            raise RuntimeError(msg)
        if on_cap == "warn":
            import warnings

            warnings.warn(msg, RuntimeWarning, stacklevel=2)
    if labels is None:  # max_iters == 0: no propagation ran, identity labels
        labels = (
            edges.select(F.col("src").alias("doc")).distinct()
            .withColumn("label", F.col("doc"))
        )
    # labels is pinned (materialized), so the edge cache can be released
    # as soon as the loop exits — nothing downstream re-reads it
    edges.unpersist()
    return labels.select("doc", F.col("label").alias("group_id"))


def simhash_signatures(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """64-bit SimHash: per-bit vote of token hashes (+1 if bit set, else -1).

    Map-only: token hashes land in an array column once, then each bit's vote
    is an array count (set bits = size of a filter) — vote_b > 0 iff set_b >
    n/2. No explode, no shuffle; the signature build pipelines into chunk
    blocking within one stage (same rationale as _minhash_from_hashes).

    Null-text docs are dropped up front: split(NULL) is a null array, every
    bit vote is false, and all such docs would collapse onto simhash 0 —
    pairing with each other and with genuine all-zero signatures at
    hamming 0 (the earlier explode-based form dropped them implicitly)."""
    hashed = ensure_parallelism(df.filter(F.col(text_col).isNotNull())).select(
        F.col(id_col).alias("doc"),
        F.transform(distinct_tokens(text_col), lambda tk: hash64(tk, seed=7)).alias("th"),
    )
    n = F.size("th")
    sig = None
    for b in range(bits):
        set_b = F.size(F.filter(F.col("th"), lambda h: F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1))
        bit = F.when(set_b * 2 > n, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        sig = term if sig is None else sig.bitwiseXOR(term)  # disjoint bits: xor == or
    return hashed.select("doc", sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Pairs within Hamming distance via 4x16-bit chunk blocking (pigeonhole:
    distance <= 3 guarantees at least one identical chunk). Chunk buckets
    above max_bucket_size are dropped before the self-join (cap_bucket_size)
    so a mass-duplicated signature can't go quadratic; the default (None) is
    exact — scale-path call sites opt into the cap explicitly."""
    if max_hamming > 3:
        raise ValueError(
            "4-chunk blocking only guarantees recall for max_hamming <= 3; "
            f"got {max_hamming} (increase the chunk count to go further)"
        )
    sigs = simhash_signatures(df, text_col=text_col, id_col=id_col)
    chunks = [
        F.struct(
            F.lit(c).alias("chunk"),
            F.shiftright("simhash", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("v"),
        )
        for c in range(4)
    ]
    blocked = sigs.select("doc", "simhash", F.explode(F.array(*chunks)).alias("ch")).select(
        "doc", "simhash", F.col("ch.chunk").alias("chunk"), F.col("ch.v").alias("v")
    )
    blocked = cap_bucket_size(blocked, ["chunk", "v"], max_bucket_size)
    a, b = blocked.alias("a"), blocked.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"), ham.alias("hamming"))
        # filter BEFORE distinct: the hamming predicate is map-side, so the
        # dedup shuffle only carries qualifying pairs (each pair can appear
        # once per shared chunk, up to 4x otherwise)
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def portable_minhash_signatures(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int | None = None,
) -> DataFrame:
    """Cross-engine-reproducible minhash: per-token md5 hash family instead
    of xxhash64, so ANY engine (DuckDB, offline audit tools) recomputes the
    identical signatures and band keys from the same text — the property
    that lets a driver value-hash oracle check the minhash math exactly
    (the xxhash64 production form in ``minhash_signatures`` is faster but
    Spark-only, hence rows-only checkable).

    Output: (id, h0..h{k-1} bigint, band0..band{k/r-1} 16-hex-char keys).
    Hash i of a token is the first 32 bits of md5(token || ':i'); the
    signature is the min over the doc's DISTINCT whitespace tokens (set
    semantics, like the production shingle path). Band keys are md5 over the
    ':'-joined band rows — two docs share a band key iff they agree on that
    band, the standard LSH OR-construction. Map-only, no shuffle; same scale
    shape as ``_minhash_from_hashes``.

    NULL text propagates: every h_i and band key is NULL (concat/md5 NULL
    semantics match DuckDB's || operator).

    ``shingle_n`` switches the hashed set from distinct raw tokens to
    distinct word n-gram shingles (the production minhash unit —
    discriminating where template corpora share most of their word SET
    but not their word ORDER).
    """
    # NULL guard on the shingle path: shingles() builds grams via concat_ws,
    # which swallows the NULL slice and would give a NULL-text doc the same
    # signature as an empty-text doc — violating the NULL-propagation
    # contract above. F.when keeps toks NULL so every h_i/band stays NULL.
    toks = (
        F.array_distinct(F.split(F.col(text_col), " "))
        if shingle_n is None
        else F.when(F.col(text_col).isNotNull(), shingles(text_col, shingle_n))
    )

    def seeded(i: int):
        # single-parameter lambda on purpose: a two-arg callable is
        # transform()'s (element, index) form, which would silently replace
        # the seed with the array position (same trap as _minhash_from_hashes)
        return lambda tk: F.conv(
            F.substring(F.md5(F.concat(tk, F.lit(f":{i}"))), 1, 8), 16, 10
        ).cast("long")

    def h(i: int) -> Column:
        return F.array_min(F.transform(toks, seeded(i))).alias(f"h{i}")

    sigs = df.select(F.col(id_col), *[h(i) for i in range(num_hashes)])
    bands = []
    for b in range(num_hashes // rows_per_band):
        row_cols: list[Column] = []
        for r in range(rows_per_band):
            if row_cols:
                row_cols.append(F.lit(":"))
            row_cols.append(F.col(f"h{b * rows_per_band + r}").cast("string"))
        # F.concat (NOT concat_ws): any NULL row must NULL the band key,
        # matching DuckDB's || — concat_ws would skip NULLs and hash ""
        bands.append(F.substring(F.md5(F.concat(*row_cols)), 1, 16).alias(f"band{b}"))
    return sigs.select(id_col, *[f"h{i}" for i in range(num_hashes)], *bands)


def portable_simhash_signatures(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id", bits: int = 48
) -> DataFrame:
    """48-bit SimHash from the PORTABLE md5-prefix token hash (the
    group_aware_split idiom) — the oracle-checkable twin of
    simhash_signatures (whose xxhash64 DuckDB lacks). Zero-token docs are
    excluded (they'd all collapse onto signature 0, the
    simhash_signatures:490 contract).

    The per-bit vote is Arrow-vectorized: an expression-tree form (48
    F.filter passes over each doc's hash array) runs INTERPRETED at
    ~1ms/doc — the same per-row-array-scan trap the SemDeDup centroid
    assignment hit (SCALING.md: 202.9s -> 3.8s after the numpy rewrite);
    here one numpy broadcast per row computes all 48 votes at once
    (4.1s -> ~0.6s for the registered pair query at sf0.1). The UDF is
    pure integer math (shift/compare/sum), so its output is the exact
    same BIGINT signature on any engine, batch size or partitioning —
    oracle parity is untouched.
    """
    from pyspark.sql.functions import pandas_udf

    shifts = np.arange(bits, dtype=np.int64)

    @pandas_udf("long")
    def _sig(th: pd.Series) -> pd.Series:
        out = np.empty(len(th), dtype=np.int64)
        for i, arr in enumerate(th):
            h = np.asarray(arr, dtype=np.int64)
            votes = ((h[:, None] >> shifts) & 1).sum(axis=0) * 2 > len(h)
            out[i] = int((votes.astype(np.int64) << shifts).sum())
        return pd.Series(out)

    toks = F.array_distinct(
        F.filter(F.split(text_col, " "), lambda x: x != "")
    )
    hashed = (
        ensure_parallelism(df.filter(F.col(text_col).isNotNull()))
        .select(
            F.col(id_col).alias("doc_id"),
            F.transform(
                toks,
                lambda tk: F.conv(F.substring(F.md5(tk), 1, 12), 16, 10).cast("long"),
            ).alias("th"),
        )
        .filter(F.size("th") > 0)
    )
    return hashed.select("doc_id", _sig("th").alias("sig"))
