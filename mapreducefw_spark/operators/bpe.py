"""BPE vocabulary induction (Sennrich et al. 2016) as an iterative
DataFrame algorithm — the tokenizer-training workload of a data pipeline,
not just tokenization with a fixed vocab (operators/text.py::bpe_pretokens
covers that side).

Scale shape: the classic formulation already is the scalable one — BPE
trains on the WORD FREQUENCY TABLE, not the corpus. One corpus scan builds
(word, count); every merge iteration then runs over O(vocab) rows
regardless of corpus size. Each iteration is: explode adjacent symbol
pairs weighted by word count -> one hash aggregation -> a 1-row global
argmax (TakeOrderedAndProject) that is CROSS-JOIN BROADCAST back, so the
winning pair is applied in-plan — no collect() anywhere; the driver only
orchestrates the loop (same shape as kmeans_refine), with a localCheckpoint
per iteration to keep lineage flat.

The merge application is a left-to-right greedy fold (F.aggregate) with a
carry, matching the reference algorithm on overlaps ("aaa" under a+a ->
["aa","a"]); ties in pair frequency break lexicographically so the learned
merge sequence is deterministic — pinned against a pure-Python reference
implementation in tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus scan -> (word, n) frequency table, the only corpus-sized
    step of BPE training. Words become character-symbol arrays with the
    </w> end marker the classic algorithm uses."""
    words = (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.explode(F.split(text_col, " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    syms = F.concat(F.split("w", ""), F.array(F.lit("</w>")))
    return words.select(syms.alias("syms"), "n")


def _adjacent_pairs(syms: Column) -> Column:
    n = F.size(syms)
    return F.when(
        n >= 2,
        F.expr(
            "transform(sequence(1, size(syms) - 1), "
            "i -> struct(syms[i-1] AS left, syms[i] AS right))"
        ),
    ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))


def _apply_merge(syms: Column, left: Column, right: Column) -> Column:
    """Left-to-right greedy single-rule merge via a carry fold."""
    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("carry"),
    )

    def step(acc, s):
        hit = acc["carry"].eqNullSafe(left) & (s == right)
        return F.when(
            hit,
            F.struct(
                F.concat(acc["out"], F.array(F.concat(left, right))).alias("out"),
                F.lit(None).cast("string").alias("carry"),
            ),
        ).otherwise(
            F.struct(
                F.when(
                    acc["carry"].isNotNull(), F.concat(acc["out"], F.array(acc["carry"]))
                )
                .otherwise(acc["out"])
                .alias("out"),
                s.alias("carry"),
            )
        )

    def finish(acc):
        return F.when(
            acc["carry"].isNotNull(), F.concat(acc["out"], F.array(acc["carry"]))
        ).otherwise(acc["out"])

    return F.aggregate(syms, acc0, step, finish)


def learn_bpe_merges(
    docs: DataFrame, n_merges: int = 10, *, text_col: str = "text"
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merge rules from a corpus.

    Returns (rank, left, right, pair_count) in learned order. Deterministic:
    frequency ties break by (left, right) lexicographically.
    """
    spark = docs.sparkSession
    freq = word_freq_table(docs, text_col).localCheckpoint(eager=False)
    learned = []
    for rank in range(1, n_merges + 1):
        pair_counts = (
            freq.select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "n")
            .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
            .agg(F.sum("n").cast("bigint").alias("pair_count"))
        )
        # 1-row lazy checkpoint: `best` feeds BOTH the next freq (cross join)
        # and the output row — without it the O(vocab) pair count recomputes
        # twice per iteration (measured ~2x the loop cost)
        best = (
            pair_counts.orderBy(F.desc("pair_count"), "left", "right")
            .limit(1)
            .localCheckpoint(eager=False)
        )
        # apply the winner in-plan (broadcast 1-row cross join, no collect)
        freq = (
            freq.crossJoin(F.broadcast(best))
            .select(
                _apply_merge(F.col("syms"), F.col("left"), F.col("right")).alias("syms"),
                "n",
            )
            .localCheckpoint(eager=False)
        )
        learned.append(
            best.select(F.lit(rank).alias("rank"), "left", "right", "pair_count")
        )
    out = learned[0]
    for fr in learned[1:]:
        out = out.unionByName(fr)
    return out.orderBy("rank")


def bpe_encode_words(
    df: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    words: DataFrame | None = None,
) -> DataFrame:
    """Encode every DISTINCT whitespace word under the learned merge rules,
    returning (w, n_syms) — the word-level vocabulary view the corpus
    joins back against.

    Semantics match training application exactly: each rule is one
    left-to-right greedy non-overlapping pass, applied in rank order
    (Sennrich et al.; parity vs the pure-Python reference pinned in
    tests/test_bpe.py). The merge list is MODEL-sized and enters the plan
    as literals — the same allowed-collect class as k-means centroids and
    PQ codebooks. Canonicalize-first: each distinct word pays the fold
    once regardless of corpus frequency.

    Pass ``words`` (a single-column ``w`` frame of distinct words) when a
    caller already tokenized the corpus — re-deriving it here would pay
    the full-text explode a second time."""
    if words is None:
        words = (
            df.filter(F.col(text_col).isNotNull())
            .select(F.explode(F.split(text_col, " ")).alias("w"))
            .filter(F.col("w") != "")
            .distinct()
        )
    syms = F.concat(F.split("w", ""), F.array(F.lit("</w>")))
    for left, right in merges:
        syms = _apply_merge(syms, F.lit(left), F.lit(right))
    return words.select("w", F.size(syms).alias("n_syms"))


def bpe_fertility_by_source(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Tokenizer-fertility report: per source, how many BPE symbols the
    learned vocabulary spends per whitespace word (the metric tokenizer
    evaluations call fertility; high-fertility sources are expensive to
    train on). One corpus scan to (source, word, count), a join against
    the distinct-word encoding (vocabulary-sized, broadcastable), exact
    integer sums, one deterministic division. The distinct-word frame the
    encoder runs on derives from the SAME (source, word, count) pass — the
    corpus text is tokenized exactly once here."""
    per_word = (
        docs.filter(F.col(text_col).isNotNull())
        .select(source_col, F.explode(F.split(text_col, " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy(source_col, "w")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)  # feeds the encoder AND the join
    )
    enc = bpe_encode_words(
        docs, merges, text_col=text_col, words=per_word.select("w").distinct()
    )
    return (
        per_word.join(enc, "w")
        .groupBy(source_col)
        .agg(
            F.sum("n").cast("bigint").alias("n_words"),
            F.sum(F.col("n") * F.col("n_syms")).cast("bigint").alias("bpe_tokens"),
        )
        .select(
            source_col,
            "n_words",
            "bpe_tokens",
            F.round(F.col("bpe_tokens") * 1.0 / F.col("n_words"), 6).alias(
                "tokens_per_word"
            ),
        )
        .orderBy(source_col)
    )


def learn_wordpiece_merges(
    docs: DataFrame, n_merges: int = 10, *, text_col: str = "text"
) -> DataFrame:
    """Learn the first ``n_merges`` WordPiece merge rules (Schuster &
    Nakajima 2012; Wu et al. 2016 §4.1): identical loop shape to
    ``learn_bpe_merges`` but the winner maximizes the LIKELIHOOD score
    count(ab) / (count(a) * count(b)) instead of the raw pair count — the
    merge that most increases corpus likelihood under a unigram-over-
    symbols model, which prefers gluing rare-but-always-adjacent symbols
    over merely frequent pairs.

    Distributed shape per iteration: the same O(vocab) pair aggregation
    as BPE plus one O(symbols) unigram count, joined pair->left/right
    symbol (both frames vocabulary-bounded), a 1-row global argmax
    (score DESC, then left, right — the score is double(count(ab)) /
    (double(count(a)) * double(count(b))), the same two-rounding float
    recipe on every engine and in the pytest reference, so the argmax is
    deterministic ACROSS ENGINES; note it is NOT the correctly-rounded
    exact-integer ratio — when count(a)*count(b) exceeds 2^53 the product
    itself rounds, so a 1-ulp-apart score tie could in principle resolve
    differently than infinite precision would. Accepted: the flip needs
    two pairs whose exact scores differ by < 1 ulp AND counts > 2^53,
    ADVICE r11),
    cross-join broadcast back, no collect() anywhere. Returns
    (rank, left, right, pair_count, score) in learned order; score is
    ROUND(9) for a stable report surface (the raw ratio drives the
    argmax). Pinned against a pure-Python reference in tests/test_bpe.py.
    """
    freq = word_freq_table(docs, text_col).localCheckpoint(eager=False)
    learned = []
    for rank in range(1, n_merges + 1):
        sym_counts = (
            freq.select(F.explode("syms").alias("sym"), "n")
            .groupBy("sym")
            .agg(F.sum("n").cast("bigint").alias("sym_count"))
        )
        pair_counts = (
            freq.select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "n")
            .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
            .agg(F.sum("n").cast("bigint").alias("pair_count"))
        )
        scored = (
            pair_counts.join(
                F.broadcast(
                    sym_counts.select(
                        F.col("sym").alias("left"), F.col("sym_count").alias("lc")
                    )
                ),
                "left",
            )
            .join(
                F.broadcast(
                    sym_counts.select(
                        F.col("sym").alias("right"), F.col("sym_count").alias("rc")
                    )
                ),
                "right",
            )
            .select(
                "left",
                "right",
                "pair_count",
                (
                    F.col("pair_count").cast("double")
                    / (F.col("lc").cast("double") * F.col("rc").cast("double"))
                ).alias("score"),
            )
        )
        best = (
            scored.orderBy(F.desc("score"), "left", "right")
            .limit(1)
            .localCheckpoint(eager=False)
        )
        freq = (
            freq.crossJoin(F.broadcast(best))
            .select(
                _apply_merge(F.col("syms"), F.col("left"), F.col("right")).alias(
                    "syms"
                ),
                "n",
            )
            .localCheckpoint(eager=False)
        )
        learned.append(
            best.select(
                F.lit(rank).alias("rank"),
                "left",
                "right",
                "pair_count",
                F.round("score", 9).alias("score"),
            )
        )
    out = learned[0]
    for fr in learned[1:]:
        out = out.unionByName(fr)
    return out.orderBy("rank")
