"""Record-linkage: blocked edit-distance similarity join.

The naive form is an all-pairs Levenshtein — O(n^2) comparisons, a
cartesian shuffle, dead at scale. The standard scalable shape (Febrl /
Dedoop style blocking) is used here:

1. derive a deterministic BLOCKING KEY per record (caller-chosen — e.g. a
   high-selectivity token, a phonetic code, a q-gram prefix);
2. equi-join on the block key, so the shuffle moves each record to exactly
   the reducers that hold its block — candidate count is
   sum(|block|^2), not n^2;
3. cheap pre-filters inside the block (``|len(a) - len(b)| <= k`` — a
   lower bound on edit distance, so it never drops a true pair);
4. the exact ``levenshtein`` check last, on the surviving candidates only.

All comparisons are JVM-side built-ins (``F.levenshtein`` is a codegen'd
expression) — no Python in the hot path. At 100 TB the extra levers are
Spark's threshold form ``levenshtein(l, r, k)`` (early-exits the DP once
the band exceeds k — same results, less CPU) and capping pathological
blocks the way the Jaccard join caps hot tokens; the plain form is kept
here because the DuckDB oracle has no threshold variant and the driver
compares values bit-for-bit.

Semantic contract: the reference's pairwise-compare-within-group shape
(shuffle = group by key, reduce = per-group pairing), cf.
``/root/reference/MRFCore.cpp:252-446``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_expr: Column,
    max_dist: int,
) -> DataFrame:
    """Pairs (a < b by id) within a block whose edit distance is in
    [1, max_dist]. Output: ``a_id, b_id, dist``.

    ``block_expr`` must be deterministic in the row (it is evaluated once
    and joined on). Distance-0 pairs are excluded on purpose — exact
    duplicates are the exact-dedup operator's job, and excluding them keeps
    this output a *near*-miss report.
    """
    side = df.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_txt"),
        block_expr.alias("_blk"),
        F.length(text_col).alias("_len"),
    ).filter(F.col("_txt").isNotNull())
    a = side.select(
        F.col("_id").alias("a_id"),
        F.col("_txt").alias("_ta"),
        F.col("_blk").alias("_blk"),
        F.col("_len").alias("_la"),
    )
    b = side.select(
        F.col("_id").alias("b_id"),
        F.col("_txt").alias("_tb"),
        F.col("_blk").alias("_blk"),
        F.col("_len").alias("_lb"),
    )
    # Equi-join on the block key; the length band rides along as a cheap
    # non-equi filter (|len diff| <= k lower-bounds edit distance).
    cand = a.join(b, "_blk").filter(
        (F.col("a_id") < F.col("b_id"))
        & (F.abs(F.col("_la") - F.col("_lb")) <= max_dist)
    )
    return (
        cand.withColumn("dist", F.levenshtein("_ta", "_tb"))
        .filter((F.col("dist") >= 1) & (F.col("dist") <= max_dist))
        .select("a_id", "b_id", "dist")
    )


def deletion_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int,
) -> DataFrame:
    """ALL pairs (a < b) with edit distance in [1, max_dist] (max_dist <= 2),
    via SymSpell-style deletion-neighborhood blocking — complete by the
    deletion-distance property: if ``lev(a, b) <= k`` then ``deletes<=k(a)``
    and ``deletes<=k(b)`` intersect (each side deletes its chars on the
    non-matching side of an optimal alignment, <= k apiece). So unlike
    domain blocking, NO true pair can be missed, and unlike the quadratic
    form nothing ever crosses n^2: the cost is the variant index
    (1 + L + L(L-1)/2 keys per row at k=2 — SymSpell's published space
    tradeoff; its prefix-truncation bounds this for long strings) plus
    bucket-sized joins. Candidate pairs are distinct-ed BEFORE the DP so
    each pair pays one Levenshtein regardless of how many variants it
    shares. Output: ``a_id, b_id, dist``.
    """
    if max_dist not in (1, 2):
        raise ValueError("deletion_neighborhood_pairs supports max_dist in {1, 2}")
    s = "_txt"
    d1 = (
        f"transform(sequence(1, length({s})), i -> "
        f"concat(substring({s}, 1, i - 1), substring({s}, i + 1, length({s}))))"
    )
    d2 = (
        f"flatten(transform(sequence(1, length({s})), i -> "
        f"transform(sequence(i + 1, length({s})), j -> "
        f"concat(substring({s}, 1, i - 1), substring({s}, i + 1, j - i - 1), "
        f"substring({s}, j + 1, length({s}))))))"
    )
    parts = [f"array({s})", d1] + ([d2] if max_dist >= 2 else [])
    variants = f"array_distinct(concat({', '.join(parts)}))"
    side = (
        df.select(
            F.col(id_col).alias("_id"),
            F.col(text_col).alias("_txt"),
            F.length(text_col).alias("_len"),
        )
        .filter(F.col("_txt").isNotNull())
        .select("_id", "_txt", "_len", F.explode(F.expr(variants)).alias("_v"))
    )
    a = side.select(
        F.col("_id").alias("a_id"), F.col("_txt").alias("_ta"),
        F.col("_len").alias("_la"), "_v",
    )
    b = side.select(
        F.col("_id").alias("b_id"), F.col("_txt").alias("_tb"),
        F.col("_len").alias("_lb"), "_v",
    )
    cand = (
        a.join(b, "_v")
        .filter(
            (F.col("a_id") < F.col("b_id"))
            & (F.abs(F.col("_la") - F.col("_lb")) <= max_dist)
        )
        .select("a_id", "b_id", "_ta", "_tb")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("_ta", "_tb"))
        .filter((F.col("dist") >= 1) & (F.col("dist") <= max_dist))
        .select("a_id", "b_id", "dist")
    )
