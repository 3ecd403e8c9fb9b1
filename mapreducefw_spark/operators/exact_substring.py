"""Exact-substring deduplication (Lee et al. 2022, "Deduplicating Training
Data Makes Language Models Better", arXiv:2107.06499, the ExactSubstr
variant): find maximal token spans that appear verbatim in MORE THAN ONE
document, and compute what removing them leaves behind.

The published recipe builds a corpus-wide suffix array and reports every
repeated substring of >= 50 tokens. A suffix array is a single global
sorted structure — exactly the kind of object that does NOT distribute.
The standard shuffle-parallel equivalent (used here, and the same
granularity `dup_passage_coverage` already verifies) is gram chaining:

(``min_match_len``, default GRAM_LEN=8, is the paper's minimum-match-
length knob — 50 tokens in the published production config — threaded
through every function; tests/test_exact_substring.py pins the operators
against the pure-Python truth at BOTH gram lengths, r11 verdict order #2)

1. hash every GRAM_LEN-token window of every document (map-side, one
   scan, positions kept);
2. a gram is *duplicated* when it occurs in >= 2 distinct documents
   (a groupBy on the 48-bit gram hash — min(doc) != max(doc), cheaper
   than countDistinct);
3. within a document, every maximal RUN of consecutive duplicated gram
   positions [p .. p+r] is exactly a maximal duplicated token span
   [p .. p+r+GRAM_LEN-1]: a span of L >= GRAM_LEN duplicated tokens
   duplicates all of its L-GRAM_LEN+1 grams, and conversely. So gram
   chaining recovers every maximal duplicated span of length >=
   GRAM_LEN exactly — the gram length plays the role of the paper's
   50-token minimum match length. One honest asymmetry: when two spans
   duplicated against DIFFERENT partner documents abut within a doc,
   chaining merges them into one reported span whose full text may
   appear verbatim in no single other document — the standard
   gram-chaining over-merge, which is removal-equivalent (the covered
   token set is identical, so the cut transform removes exactly the
   same tokens) and is the granularity the pure-Python truth in
   tests/test_exact_substring.py pins.

Runs are found with the islands-and-gaps idiom (position - row_number()
is constant within a run); the islands window partitions by doc_id, so a
partition is one document's duplicated positions — bounded by document
length, never by corpus size. Removal accounting unions the [p, p+GRAM_LEN-1]
token intervals of duplicated positions via a lead() window (per doc):
each position contributes min(GRAM_LEN, next_p - p) tokens, the last one
GRAM_LEN — an O(positions) exact interval-union size with no interval
merge pass.

Scale posture: raw gram strings never shuffle (48-bit md5-prefix hashes
do); the duplicated-gram set is corpus-repetition-sized, joined back
LEFT SEMI; every window partitions by doc_id. Cross-document only:
WITHIN-document repetition is a different signal with its own operator
(`dup_ngram_stats`).

Semantic contract with the reference engine: map (emit gram hashes) ->
shuffle by hash -> reduce (duplicate set) -> map-side join back — the job
shape of `/root/reference/MapReduceClient.h:47-51`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

GRAM_LEN = 8  # default minimum match length (tokens); see min_match_len below


def _tokens(text_col: str) -> F.Column:
    return F.split(F.col(text_col), " ")


def _check_min_match_len(min_match_len: int) -> int:
    if not isinstance(min_match_len, int) or min_match_len < 2:
        raise ValueError(
            f"exact_substring: min_match_len must be an int >= 2, got {min_match_len!r}"
        )
    return min_match_len


def gram_positions(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_match_len: int = GRAM_LEN,
) -> DataFrame:
    """(doc, p, h): the 48-bit md5-prefix hash of the min_match_len-token
    window starting at 1-based token position p, for every position of
    every doc. ``min_match_len`` is the paper's minimum-match-length knob
    (arXiv:2107.06499 uses 50 tokens in production; the default 8 fits the
    sentence-scale synthetic corpus). Identical hash family to
    `dup_passage_coverage` (both engines compute the same md5 prefix, so
    even collisions agree cross-engine)."""
    L = _check_min_match_len(min_match_len)
    n = F.size(_tokens(text_col))
    grams = F.when(
        n >= L,
        F.expr(
            f"transform(sequence(1, size(split({text_col}, ' ')) - {L - 1}), "
            f"i -> struct(i as p, cast(conv(substr(md5(array_join("
            f"slice(split({text_col}, ' '), i, {L}), ' ')), 1, 12), 16, 10) "
            f"as bigint) as h))"
        ),
    ).otherwise(F.array().cast("array<struct<p:int,h:bigint>>"))
    from mapreducefw_spark.operators.textprep import ensure_parallelism

    # the per-position md5 hashing is the dominant CPU of every consumer
    # (r13 stage probe: 2.5s on ONE task from the unsplittable fixture
    # scan) — spread it before the explode; downstream is all exact
    # (hash grouping, integer min/max/count), so placement is free
    return (
        ensure_parallelism(docs.filter(F.col(text_col).isNotNull()))
        .select(F.col(id_col).alias("doc"), F.explode(grams).alias("g"))
        .select("doc", F.col("g.p").alias("p"), F.col("g.h").alias("h"))
    )


def duplicated_positions(inst: DataFrame) -> DataFrame:
    """(doc, p) positions whose gram also occurs in ANOTHER document.

    min(doc) != max(doc) under groupBy(h) instead of countDistinct — the
    expand-for-distinct rewrite doubles exchanged rows (measured on
    dup_passage_coverage, SHUFFLE.md)."""
    inst = inst.localCheckpoint(eager=False)  # feeds the dup set AND the join back
    dup = (
        inst.groupBy("h")
        .agg(F.min("doc").alias("_lo"), F.max("doc").alias("_hi"))
        .filter(F.col("_lo") != F.col("_hi"))
        .select("h")
    )
    return inst.join(dup, "h", "left_semi").select("doc", "p")


def exact_substring_spans(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_match_len: int = GRAM_LEN,
) -> DataFrame:
    """Maximal duplicated token spans per document:
    (doc, span_start, span_end, n_grams, span_tokens), token indices
    1-based inclusive. Every span is >= min_match_len tokens and appears
    verbatim in at least one other document."""
    L = _check_min_match_len(min_match_len)
    dpos = duplicated_positions(
        gram_positions(docs, text_col=text_col, id_col=id_col, min_match_len=L)
    )
    # islands: consecutive duplicated positions share p - row_number();
    # the window partitions by doc, so its partition is one document's
    # duplicated positions (doc-length bounded)
    grp = (F.col("p") - F.row_number().over(W.partitionBy("doc").orderBy("p"))).alias(
        "_grp"
    )
    return (
        dpos.select("doc", "p", grp)
        .groupBy("doc", "_grp")
        .agg(
            F.min("p").alias("span_start"),
            (F.max("p") + F.lit(L - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_grams"),
            (F.max("p") - F.min("p") + F.lit(L)).alias("span_tokens"),
        )
        .drop("_grp")
    )


def exact_substring_removal_stats(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_match_len: int = GRAM_LEN,
) -> DataFrame:
    """Per-document removal accounting for the ExactSubstr transform:
    (doc, n_tokens, n_dup_positions, n_removed_tokens, kept_frac), every
    non-NULL-text doc present (0 removed when nothing duplicated).

    n_removed_tokens is the exact size of the union of the
    [p, p+min_match_len-1] token intervals over duplicated positions p:
    sorted by p, each position contributes min(min_match_len, next_p - p)
    tokens (the whole window unless the next duplicated window overlaps
    it), the last contributes min_match_len. One lead() window per doc."""
    L = _check_min_match_len(min_match_len)
    dpos = duplicated_positions(
        gram_positions(docs, text_col=text_col, id_col=id_col, min_match_len=L)
    )
    nxt = F.lead("p").over(W.partitionBy("doc").orderBy("p"))
    removed = dpos.select(
        "doc",
        F.least(F.lit(L), F.coalesce(nxt - F.col("p"), F.lit(L))).alias(
            "_contrib"
        ),
    ).groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_dup_positions"),
        F.sum("_contrib").alias("n_removed_tokens"),
    )
    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc"), F.size(_tokens(text_col)).cast("bigint").alias("n_tokens")
    )
    return base.join(removed, "doc", "left").select(
        "doc",
        "n_tokens",
        F.coalesce("n_dup_positions", F.lit(0)).cast("bigint").alias("n_dup_positions"),
        F.coalesce("n_removed_tokens", F.lit(0)).cast("bigint").alias("n_removed_tokens"),
        F.round(
            (F.col("n_tokens") - F.coalesce("n_removed_tokens", F.lit(0)))
            / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"),
            6,
        ).alias("kept_frac"),
    )
