"""Sequence packing + shard assignment for pretraining data layout.

The last mile of a training-data pipeline: after filtering/dedup, documents
are concatenated in a deterministic order and chunked into fixed-length
context windows ("sequence packing"), then distributed across training
shards. Both are pure arithmetic over token-count prefix sums — no text
moves through any shuffle here.

Scale design: a naive running total is a window over ORDER BY doc_id with no
partition key, which Spark executes in ONE task over the whole corpus. The
prefix sum is therefore two-phase: per-bucket token totals (one shuffle over
~corpus/bucket_size rows) get a cumulative offset in a tiny window, then
broadcast back so each doc's global offset is bucket_offset + its in-bucket
running total. Each phase's window partitions on the bucket key, so no task
ever sees more than bucket_size docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def pack_spans(
    docs: DataFrame,
    *,
    seq_len: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_size: int = 100_000,
) -> DataFrame:
    """Where each document lands after concat-in-id-order + chunk-to-seq_len.

    Returns (doc_id, n_tokens, start_off, end_off, first_chunk, last_chunk,
    chunks_spanned): the global token offsets of the doc and the range of
    training windows it feeds. end_off is exclusive; a doc straddling a
    window boundary spans multiple chunks (standard packing semantics —
    chunk boundaries ignore document boundaries).
    """
    # Null text is 0 tokens. Without the guard, size(split(NULL)) = -1 would
    # give that doc end_off < start_off and shift every later doc's global
    # offset down by one — silent corruption of all downstream chunk bounds.
    n_tokens = F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(
        F.size(F.split(text_col, " "))
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        n_tokens.cast("long").alias("n_tokens"),
        F.floor(F.col(id_col) / bucket_size).alias("_bkt"),
    )
    # phase 1: one row per bucket; the cumsum window runs over ~n/bucket_size
    # rows, small enough for a single task at any realistic corpus size
    bkt = toks.groupBy("_bkt").agg(F.sum("n_tokens").alias("_bt"))
    w_bkt = W.orderBy("_bkt").rowsBetween(W.unboundedPreceding, -1)
    bkt_off = bkt.select(
        "_bkt", F.coalesce(F.sum("_bt").over(w_bkt), F.lit(0)).alias("_boff")
    )
    # phase 2: in-bucket running total, partitioned on the bucket key
    w_doc = W.partitionBy("_bkt").orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    start = F.col("_boff") + F.coalesce(F.sum("n_tokens").over(w_doc), F.lit(0))
    out = (
        toks.join(F.broadcast(bkt_off), "_bkt")
        .withColumn("start_off", start)
        .withColumn("end_off", F.col("start_off") + F.col("n_tokens"))
    )
    first_chunk = F.floor(F.col("start_off") / seq_len)
    last_chunk = F.floor((F.col("end_off") - 1) / seq_len)
    return out.select(
        "doc_id",
        "n_tokens",
        "start_off",
        "end_off",
        first_chunk.alias("first_chunk"),
        last_chunk.alias("last_chunk"),
        (last_chunk - first_chunk + 1).alias("chunks_spanned"),
    )


def shard_assignment(
    docs: DataFrame,
    *,
    n_shards: int = 16,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic pseudo-random shard per document: md5 of (id, seed).

    md5 (not xxhash64) so the assignment is reproducible OUTSIDE Spark —
    any engine or offline tool recomputes the same shards from the same ids.
    The first 8 hex chars give 32 uniform bits; mod n_shards is the shard.
    Changing the seed reshuffles every epoch.
    """
    key = F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed))))
    shard = F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % n_shards
    return docs.select(
        F.col(id_col).alias("doc_id"), key.alias("shuffle_key"), shard.alias("shard")
    )


def chunk_documents(
    docs: DataFrame,
    *,
    chunk_tokens: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    context-window pre-tokenization pass that feeds packing (stride <
    chunk_tokens gives chunk_tokens-stride tokens of overlap so no span of
    meaning falls on a hard boundary).

    Map-only: split + sequence + slice + explode compose into one codegen
    stage, no shuffle — at 100 TB this runs at scan speed. Chunk starts are
    1-based every `stride` tokens through the end of the doc (tail chunks
    run short rather than dropping text). Null texts are filtered (nothing
    to chunk).

    Returns (doc_id, chunk_start, n_tokens, chunk_text).
    """
    toks = F.split(text_col, " ")
    starts = F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(stride))
    chunk = F.slice(F.col("_w"), F.col("chunk_start"), chunk_tokens)
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"), toks.alias("_w"), F.explode(starts).alias("chunk_start"))
        .select(
            "doc_id",
            "chunk_start",
            F.size(chunk).alias("n_tokens"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
        )
    )


def uniform_unit(id_col, salt: str):
    """Deterministic U[0,1) per id from md5 — reproducible in ANY engine
    (DuckDB, offline tools) from the same ids, unlike xxhash64. The first 8
    hex chars give 32 uniform bits; /2^32 is exact in double. Used for
    weighted resampling and split assignment."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    key = F.md5(F.concat_ws(":", c.cast("string"), F.lit(salt)))
    return F.conv(F.substring(key, 1, 8), 16, 10).cast("long") / F.lit(4294967296.0)
