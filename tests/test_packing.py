"""Sequence-packing + sharding invariants (operators/packing.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducefw_spark.operators import packing
from mapreducefw_spark.queries._util import t


def test_pack_spans_offsets_are_contiguous(spark, sf_dir):
    """The two-phase prefix sum must equal the naive cumsum: doc n+1 starts
    exactly where doc n ends, INCLUDING across bucket boundaries (bucket_size
    50 over 500 docs forces 10 boundaries)."""
    docs = t(spark, sf_dir, "documents")
    rows = packing.pack_spans(docs, seq_len=512, bucket_size=50).orderBy("doc_id").collect()
    assert rows[0].start_off == 0
    for prev, cur in zip(rows, rows[1:]):
        assert cur.start_off == prev.end_off, (prev.doc_id, cur.doc_id)
        assert cur.end_off - cur.start_off == cur.n_tokens


def test_pack_spans_chunk_arithmetic(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    rows = packing.pack_spans(docs, seq_len=100, bucket_size=50).collect()
    for r in rows:
        assert r.first_chunk == r.start_off // 100
        assert r.last_chunk == (r.end_off - 1) // 100
        assert r.chunks_spanned == r.last_chunk - r.first_chunk + 1
        assert r.chunks_spanned >= 1
    # with seq_len 100 and avg docs ~100 tokens, some doc must straddle
    assert any(r.chunks_spanned > 1 for r in rows)


def test_pack_spans_bucket_size_invariant(spark, sf_dir):
    """Offsets are a function of the data, not the bucketing."""
    docs = t(spark, sf_dir, "documents")
    a = {r.doc_id: r.start_off for r in packing.pack_spans(docs, bucket_size=37).collect()}
    b = {r.doc_id: r.start_off for r in packing.pack_spans(docs, bucket_size=200).collect()}
    assert a == b


def test_pack_spans_null_text_is_zero_tokens(spark):
    """A null-text doc contributes 0 tokens. Unguarded, size(split(NULL))
    is -1, which would give end_off < start_off and shift every later doc's
    global offset — silent corruption of all downstream chunk bounds."""
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, None), (2, "d e")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in packing.pack_spans(docs, seq_len=4, bucket_size=2).collect()}
    assert rows[1].n_tokens == 0
    assert rows[1].start_off == rows[1].end_off == 3
    assert rows[2].start_off == 3 and rows[2].end_off == 5  # unshifted


def test_shard_assignment_deterministic_and_balanced(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    a = {r.doc_id: r.shard for r in packing.shard_assignment(docs, n_shards=16, seed=42).collect()}
    b = {r.doc_id: r.shard for r in packing.shard_assignment(docs, n_shards=16, seed=42).collect()}
    assert a == b  # deterministic
    counts = {}
    for s in a.values():
        counts[s] = counts.get(s, 0) + 1
    assert len(counts) == 16  # every shard populated at 500 docs
    assert max(counts.values()) <= 4 * min(counts.values())  # rough uniformity
    c = {r.doc_id: r.shard for r in packing.shard_assignment(docs, n_shards=16, seed=7).collect()}
    assert a != c  # a new seed reshuffles


def test_chunk_documents_covers_every_token_and_reconstructs(spark, sf_dir):
    """Chunking invariants: every token position of every doc falls in at
    least one chunk; stride-aligned chunk prefixes concatenate back to the
    original text; all chunks except possibly the tail are full-width."""
    from pyspark.sql import functions as F

    docs = t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.col("doc_id") < 50)
    )
    originals = {r.doc_id: r.text.split(" ") for r in docs.collect()}
    chunks = packing.chunk_documents(docs, chunk_tokens=64, stride=48).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(originals)
    for doc_id, rows in by_doc.items():
        toks = originals[doc_id]
        rows.sort(key=lambda r: r.chunk_start)
        # coverage: starts are 1, 49, 97, ... through len
        starts = [r.chunk_start for r in rows]
        assert starts == list(range(1, len(toks) + 1, 48))
        covered = set()
        rebuilt = []
        for i, r in enumerate(rows):
            ctoks = r.chunk_text.split(" ") if r.chunk_text else []
            assert len(ctoks) == r.n_tokens
            expected = toks[r.chunk_start - 1 : r.chunk_start - 1 + 64]
            assert ctoks == expected  # chunk content == source slice
            covered.update(range(r.chunk_start, r.chunk_start + r.n_tokens))
            take = len(ctoks) if i == len(rows) - 1 else min(48, len(ctoks))
            rebuilt.extend(ctoks[:take])
        assert covered == set(range(1, len(toks) + 1))
        # non-overlapping prefixes reconstruct the doc exactly
        assert rebuilt[: len(toks)] == toks


def test_uniform_unit_is_uniform_and_engine_stable(spark, sf_dir):
    """md5 U[0,1): values in [0,1), mean near 0.5, deterministic across
    calls, and salt changes decorrelate — the properties weighted
    resampling depends on."""
    from pyspark.sql import functions as F

    docs = t(spark, sf_dir, "documents")
    u = [r.u for r in docs.select(packing.uniform_unit("doc_id", "rs").alias("u")).collect()]
    assert all(0.0 <= x < 1.0 for x in u)
    assert abs(sum(u) / len(u) - 0.5) < 0.05  # 500 draws: mean within 5pp
    v = [r.u for r in docs.select(packing.uniform_unit("doc_id", "rs").alias("u")).collect()]
    assert u == v  # deterministic
    w = [r.u for r in docs.select(packing.uniform_unit("doc_id", "other").alias("u")).collect()]
    assert u != w  # a new salt reshuffles
