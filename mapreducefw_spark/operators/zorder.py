"""Z-order (Morton-curve) clustered layout for multi-dimensional data
skipping.

Why it matters at 100 TB: parquet readers prune row groups and files by
min/max column statistics. A layout sorted on ONE column gives tight stats
(and so real skipping) on that column only — a box predicate on two columns
still touches every file for the second dimension. Interleaving the bits of
both columns (the Morton / Z-value) and range-partitioning + sorting on that
single derived key makes every file a small hyper-rectangle in BOTH
dimensions, so a 2-d box query's stats-eligible file set shrinks from
O(all files) toward O(files overlapping the box). This is the same layout
primitive Delta/Iceberg expose as ``OPTIMIZE ... ZORDER BY``; here it is
plain DataFrame expressions + a range-partitioned parquet write, so it works
on any path.

Everything is JVM-side bit arithmetic (shiftleft/shiftright folds unrolled
driver-side into a fixed expression tree — ``bits`` terms per column); the
min/max normalization bounds ride in as a broadcast row, so the operator is
collect-free and the whole thing is one extra narrow projection on the write
path plus the range shuffle the clustered write needs anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(c: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Linear map of a numeric column onto [0, 2^bits) integer cells.
    Degenerate ranges (min == max) map to cell 0."""
    span = (cmax.cast("double") - cmin.cast("double"))
    cells = F.lit((1 << bits) - 1)
    frac = F.when(span > 0, (c.cast("double") - cmin.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    return F.least(F.floor(frac * (cells + 1)).cast("long"), cells.cast("long"))


def interleave(cells: list[Column], bits: int) -> Column:
    """Morton code: bit b of column i lands at position b * len(cells) + i.
    With n columns at ``bits`` bits each, the result uses n*bits bits — keep
    n * bits <= 62 to stay in a signed long (asserted)."""
    n = len(cells)
    assert n * bits <= 62, f"z-value would overflow a long: {n} cols x {bits} bits"
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cells):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * n + i)
    return z


def zvalue(df: DataFrame, cols: list[str], *, bits: int = 16) -> DataFrame:
    """Append a ``_z`` Morton key over ``cols``. Normalization bounds come
    from one aggregate broadcast back onto the rows (collect-free)."""
    bounds = df.agg(
        *[F.min(c).alias(f"_min_{c}") for c in cols],
        *[F.max(c).alias(f"_max_{c}") for c in cols],
    )
    staged = df.crossJoin(F.broadcast(bounds))
    cells = [
        quantize(F.col(c), F.col(f"_min_{c}"), F.col(f"_max_{c}"), bits) for c in cols
    ]
    return staged.withColumn("_z", interleave(cells, bits)).drop(
        *[f"_min_{c}" for c in cols], *[f"_max_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame, path: str, cols: list[str], *, n_files: int, bits: int = 16
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the Z-curve of
    ``cols``: range-partition by the Morton key (each file = one contiguous
    curve segment = one small hyper-rectangle per dimension), sort within
    files so row-group stats are tight too, drop the key before writing."""
    z = zvalue(df, cols, bits=bits)
    (
        z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
