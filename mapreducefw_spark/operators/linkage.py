"""Record-linkage: blocked edit-distance similarity join.

The naive form is an all-pairs Levenshtein — O(n^2) comparisons, a
cartesian shuffle, dead at scale. Two standard scalable shapes live here,
both built on the same canonicalize-first skeleton:

0. CANONICALIZE: collapse exact-duplicate texts before any pairing — the
   expensive DP phase runs over DISTINCT texts (d rows), never raw rows
   (n). Real corpora are duplicate-heavy (that's why exact dedup is a
   first-class operator), and id-level pairing of duplicated texts
   multiplies every true pair by |copies_a| x |copies_b| BEFORE the
   distance is even computed. Comparing distinct texts and re-expanding
   to id pairs afterwards produces the identical result set with the
   blow-up moved to a single post-verify equi-join.
1. BLOCK (``blocked_levenshtein_pairs``): a caller-chosen deterministic
   blocking key (a high-selectivity token, phonetic code, q-gram prefix)
   bounds candidates to sum(|block|^2) — Febrl/Dedoop-style domain
   blocking; may miss cross-block pairs by design.
2. DELETION NEIGHBORHOOD (``deletion_neighborhood_pairs``): SymSpell-style
   delete-<=k variant index — COMPLETE for k <= 2 (if ``lev(a,b) <= k``
   the delete-neighborhoods intersect: each side deletes its chars on the
   non-matching side of an optimal alignment, <= k apiece), so this is the
   global answer with no blocking assumption.
3. cheap pre-filters before the DP (``|len(a) - len(b)| <= k`` lower-bounds
   edit distance, so it never drops a true pair).

All comparisons are JVM-side built-ins (``F.levenshtein`` is a codegen'd
expression) — no Python in the hot path. At 100 TB the further levers are
Spark's threshold form ``levenshtein(l, r, k)`` (early-exits the DP band —
same results, less CPU; not used because the DuckDB oracle has no
threshold variant and the driver compares bit-for-bit) and SymSpell's
prefix truncation to bound the O(len^2) variant count for long strings.

Semantic contract: the reference's pairwise-compare-within-group shape
(shuffle = group by key, reduce = per-group pairing), cf.
``/root/reference/MRFCore.cpp:252-446``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _expand_to_id_pairs(name_pairs: DataFrame, ids: DataFrame) -> DataFrame:
    """Map verified distinct-text pairs (_ta < _tb, dist) back to id pairs.

    ``ids`` is (``_id``, ``_txt``). Each unordered id pair appears exactly
    once: the text pair is canonical (_ta < _tb lexicographically, texts
    distinct) and every id carries one text, so the two joins enumerate
    each (copy_a, copy_b) combination once; least/greatest restores the
    id-ordered output contract. Identical-text id pairs are dist 0 and
    excluded upstream by construction (_ta < _tb is strict).

    The verified name-pair frame is force-broadcast: it is distinct-text
    near-pair sized (the DP survivors), orders of magnitude below the
    corpus, so the first expansion join is map-side; only the second join
    shuffles, and what it shuffles is output-sized — the floor for an
    operator whose answer IS those rows. (The 16x scale probe showed the
    planner demoting this join to shuffle once the raw side outgrew the
    auto-broadcast threshold, a 10x step; pair frames are the side that
    stays small.)"""
    a = ids.select(F.col("_id").alias("_ia"), F.col("_txt").alias("_ta"))
    b = ids.select(F.col("_id").alias("_ib"), F.col("_txt").alias("_tb"))
    return (
        a.join(F.broadcast(name_pairs), "_ta")
        .join(b, "_tb")
        .select(
            F.least("_ia", "_ib").alias("a_id"),
            F.greatest("_ia", "_ib").alias("b_id"),
            "dist",
        )
    )


def blocked_levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_fn: Callable[[Column], Column],
    max_dist: int,
) -> DataFrame:
    """Pairs (a < b by id) within a block whose edit distance is in
    [1, max_dist]. Output: ``a_id, b_id, dist``.

    ``block_fn`` maps the text column to its blocking key and must be a
    pure function of the text (it is applied on the distinct-text frame).
    Distance-0 pairs are excluded on purpose — exact duplicates are the
    exact-dedup operator's job, and excluding them keeps this output a
    *near*-miss report.
    """
    ids = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_txt")
    ).filter(F.col("_txt").isNotNull())
    names = (
        ids.select("_txt")
        .distinct()
        .select(
            "_txt",
            block_fn(F.col("_txt")).alias("_blk"),
            F.length("_txt").alias("_len"),
        )
    )
    a = names.select(
        F.col("_txt").alias("_ta"), "_blk", F.col("_len").alias("_la")
    )
    b = names.select(
        F.col("_txt").alias("_tb"), "_blk", F.col("_len").alias("_lb")
    )
    # Equi-join on the block key; the length band rides along as a cheap
    # non-equi filter (|len diff| <= k lower-bounds edit distance).
    name_pairs = (
        a.join(b, "_blk")
        .filter(
            (F.col("_ta") < F.col("_tb"))
            & (F.abs(F.col("_la") - F.col("_lb")) <= max_dist)
        )
        .withColumn("dist", F.levenshtein("_ta", "_tb"))
        .filter((F.col("dist") >= 1) & (F.col("dist") <= max_dist))
        .select("_ta", "_tb", "dist")
    )
    return _expand_to_id_pairs(name_pairs, ids)


def deletion_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int,
) -> DataFrame:
    """ALL pairs (a < b) with edit distance in [1, max_dist] (max_dist <= 2),
    via SymSpell-style deletion-neighborhood blocking — complete by the
    deletion-distance property (module docstring), so unlike domain
    blocking NO true pair can be missed, and unlike the quadratic form
    nothing scales with n^2: the variant index (1 + L + L(L-1)/2 keys per
    DISTINCT text at k=2 — SymSpell's published space tradeoff) feeds
    bucket-sized joins, candidate text pairs are distinct-ed BEFORE the DP
    so each pays one Levenshtein, and raw-row cardinality only ever enters
    through the final id-expansion join. Output: ``a_id, b_id, dist``.
    """
    if max_dist not in (1, 2):
        raise ValueError("deletion_neighborhood_pairs supports max_dist in {1, 2}")
    s = "_txt"
    d1 = (
        f"if(length({s}) >= 1, "
        f"transform(sequence(1, length({s})), i -> "
        f"concat(substring({s}, 1, i - 1), substring({s}, i + 1, length({s})))), "
        f"array())"
    )
    # outer index stops at length-1 (and the whole term is gated on
    # length >= 2): for i = length the inner sequence(i + 1, length) would
    # DESCEND (Spark defaults step -1 when start > stop), emitting junk
    # variants that only stayed harmless because candidates are re-verified
    # with levenshtein — but cost spurious explode rows and join work
    d2 = (
        f"if(length({s}) >= 2, "
        f"flatten(transform(sequence(1, length({s}) - 1), i -> "
        f"transform(sequence(i + 1, length({s})), j -> "
        f"concat(substring({s}, 1, i - 1), substring({s}, i + 1, j - i - 1), "
        f"substring({s}, j + 1, length({s})))))), "
        f"array())"
    )
    parts = [f"array({s})", d1] + ([d2] if max_dist >= 2 else [])
    variants = f"array_distinct(concat({', '.join(parts)}))"
    ids = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_txt")
    ).filter(F.col("_txt").isNotNull())
    # NOTE (r14 measured negative): repartitioning the distinct-names
    # frame below the variant explode (AQE coalesces it to 1-3 tasks) was
    # tried and CPU-probed at 2.64 -> 3.59 CPU-s, wall 2.49 -> 3.04s —
    # the stage is latency-bound, not compute-bound, and 32 tiny tasks'
    # overhead swamps the parallelism. Do not re-try blind (guide §1.2).
    names = ids.select("_txt").distinct().select(
        "_txt", F.length("_txt").alias("_len")
    )
    exploded = names.select(
        "_txt", "_len", F.explode(F.expr(variants)).alias("_v")
    )
    a = exploded.select(
        F.col("_txt").alias("_ta"), F.col("_len").alias("_la"), "_v"
    )
    b = exploded.select(
        F.col("_txt").alias("_tb"), F.col("_len").alias("_lb"), "_v"
    )
    name_pairs = (
        a.join(b, "_v")
        .filter(
            (F.col("_ta") < F.col("_tb"))
            & (F.abs(F.col("_la") - F.col("_lb")) <= max_dist)
        )
        .select("_ta", "_tb")
        .distinct()
        .withColumn("dist", F.levenshtein("_ta", "_tb"))
        .filter((F.col("dist") >= 1) & (F.col("dist") <= max_dist))
    )
    return _expand_to_id_pairs(name_pairs, ids)
