"""Shared text-preparation expressions: tokens, shingles, stable 64-bit hashes.

All JVM-side (split/transform/xxhash64) — no Python in the hot path, so these
compose into whole-stage codegen and scale to 100 TB corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Spread compute-heavy map stages across local cores.

    The sandbox fixtures are single-row-group parquet (unsplittable -> one
    task), which serializes shingling/hashing. The decision is STATIC — local
    master => repartition to core count, cluster master => pass through
    untouched. No ``df.rdd`` probe: that forces analysis + an RDD conversion
    per call, and on a real cluster inputs arrive well-split, where a blind
    repartition would shuffle the whole corpus for nothing.

    Idempotent under composition: operators that stack (e.g. a query spreading
    its input before handing it to an operator that spreads again) skip the
    shuffle when the input is already spread, because the partition-count
    probe sees the upstream repartition's output count. The probe (not a
    plan-string scan) is the gate on purpose: a substring match on
    "Repartition" would be fooled by an upstream coalesce(1) or an undersized
    repartition(2, key) — both produce Repartition nodes yet leave the data
    badly split, which is exactly the serialization this function exists to
    prevent. getNumPartitions() on the planned RDD needs no job, and the
    cluster-master early-return keeps the per-call planning cost local-only."""
    sc = df.sparkSession.sparkContext
    if not sc.master.startswith("local"):
        return df
    # sf0.1 fixtures already split into enough tasks, where a blind
    # repartition measured 1.3x on the jaccard join; single-row-group small
    # fixtures (and upstream coalesces) still get spread
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def tokens(col: str | Column = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def distinct_tokens(col: str | Column = "text") -> Column:
    return F.array_distinct(tokens(col))


def shingles(col: str | Column = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles, e.g. 'a b c' for n=3."""
    toks = tokens(col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.array_distinct(grams)


def hash64(col: Column, seed: int = 0) -> Column:
    """Deterministic 64-bit hash; distinct seeds give independent families."""
    return F.xxhash64(F.lit(seed), col)
