"""Incremental view maintenance for distributive aggregates.

The 100 TB pattern this implements: a grouped aggregate (a "materialized
view" of SUM/COUNT measures) is kept current by folding in a changelog of
fact rows — inserts carry weight +1, retractions weight -1 — WITHOUT ever
rescanning the base fact table. The only inputs are the existing aggregate
(O(groups) rows) and the delta (O(changed rows)); cost is one map-side
partial aggregation of the delta plus one shuffle over the union of the two
small frames. A nightly full recompute of the same view would scan the whole
fact table; this is the standard self-maintainable-view result for
distributive measures (SUM, COUNT — and anything algebraic over them, e.g.
AVG = SUM/COUNT at read time).

Out of scope by mathematics, not by implementation: MIN/MAX are NOT
self-maintainable under retraction (deleting the current minimum requires
rescanning its group), so this operator takes only summable measures. An
insert-only stream can maintain MIN/MAX with F.least/F.greatest at merge
time; retraction workloads recompute affected groups instead.

Reference parity note: the reference's Reduce sees the full value list per
key (/root/reference/MapReduceClient.h:50) — a full recompute shape. This
operator is the Spark-first answer to the same aggregation contract when the
input arrives as a delta rather than a full scan.
"""

from __future__ import annotations

import os
from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def delta_aggregate(
    changes: DataFrame,
    *,
    keys: list[str],
    sum_cols: Mapping[str, Column | str],
    count_alias: str = "n_rows",
    weight_col: str = "_w",
) -> DataFrame:
    """Aggregate a weighted changelog to per-group signed partial sums.

    ``changes``: fact-shaped rows plus ``weight_col`` (+1 insert / -1
    retract). ``sum_cols`` maps output alias -> measure column (pre-cast to
    an exact type by the caller if cross-engine bit-equality matters — see
    queries/_util.py on decimal sums). The signed count lands in
    ``count_alias``.
    """
    w = F.col(weight_col)
    aggs = [
        F.sum(w * (F.col(c) if isinstance(c, str) else c)).alias(a)
        for a, c in sum_cols.items()
    ]
    aggs.append(F.sum(w).cast("bigint").alias(count_alias))
    return changes.groupBy(*keys).agg(*aggs)


def merge_agg_delta(
    base_agg: DataFrame,
    changes: DataFrame,
    *,
    keys: list[str],
    sum_cols: Mapping[str, Column | str],
    count_alias: str = "n_rows",
    weight_col: str = "_w",
) -> DataFrame:
    """New view = old view ⊎ delta, merged by summing partial aggregates.

    ``base_agg`` columns: keys + the ``sum_cols`` aliases + ``count_alias``
    (i.e. exactly what this function returned last time, or what the initial
    full aggregation produced). Groups whose row count reaches zero drop out
    of the view, matching what a recompute would produce. A union + groupBy
    is deliberately used instead of a full-outer join: it is one shuffle over
    two group-sized frames, has no column-collision bookkeeping, and is the
    same "merge partial aggregates" shape Spark itself uses below every
    two-phase hash aggregate.

    Contract: a retraction must refer to a row previously inserted (standard
    changelog discipline — CDC sources with before-images provide it). A
    group's count going negative means the changelog violated that contract;
    callers wanting a hard failure can assert ``count_alias >= 0`` on the
    result.
    """
    delta = delta_aggregate(
        changes,
        keys=keys,
        sum_cols=sum_cols,
        count_alias=count_alias,
        weight_col=weight_col,
    )
    cols = [*keys, *sum_cols.keys(), count_alias]
    # Align the delta's measure types to the view's: sum(weight * measure)
    # widens decimal precision differently than the view's plain sum, and
    # union is strict about types.
    base_types = dict(base_agg.dtypes)
    delta = delta.select(
        *keys,
        *[F.col(a).cast(base_types[a]).alias(a) for a in sum_cols.keys()],
        F.col(count_alias).cast(base_types[count_alias]).alias(count_alias),
    )
    merged = (
        base_agg.select(*cols)
        .unionByName(delta.select(*cols))
        .groupBy(*keys)
        .agg(
            *[F.sum(a).alias(a) for a in sum_cols.keys()],
            F.sum(count_alias).cast("bigint").alias(count_alias),
        )
    )
    return merged.filter(F.col(count_alias) != 0)


class ParquetViewMerger:
    """foreachBatch sink: streaming incremental view maintenance.

    Feed it a weighted changelog STREAM (same contract as merge_agg_delta:
    fact columns + weight ±1) and it keeps a parquet materialized view
    current, folding each micro-batch's delta into the previous epoch's view
    and writing a NEW ``epoch=<id>`` directory — the prior epoch stays
    intact, so a crash mid-write loses nothing, and foreachBatch's replay of
    an epoch after restart rewrites the same directory (idempotent).
    Production systems commit the epoch pointer through a transactional
    table format; here the newest complete epoch is the view — the same
    newest-wins recovery rule as sources/maintenance.compact_parquet.

    Because merge order is irrelevant for summed measures, a retraction
    arriving in an EARLIER micro-batch than its insert (out-of-order CDC)
    nets out correctly once both have been applied — intermediate epochs may
    transiently hold negative counts, final state is exact. This is the
    property that lets the view trail an at-least-once changelog without
    coordination.
    """

    def __init__(
        self,
        view_dir: str,
        *,
        keys: list[str],
        sum_cols: Mapping[str, Column | str],
        count_alias: str = "n_rows",
        weight_col: str = "_w",
    ) -> None:
        self.view_dir = view_dir
        self.keys = keys
        self.sum_cols = dict(sum_cols)
        self.count_alias = count_alias
        self.weight_col = weight_col
        self.current: str | None = None

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        if self.current is None:
            view = delta_aggregate(
                batch_df,
                keys=self.keys,
                sum_cols=self.sum_cols,
                count_alias=self.count_alias,
                weight_col=self.weight_col,
            ).filter(F.col(self.count_alias) != 0)
        else:
            base = batch_df.sparkSession.read.parquet(self.current)
            view = merge_agg_delta(
                base,
                batch_df,
                keys=self.keys,
                sum_cols=self.sum_cols,
                count_alias=self.count_alias,
                weight_col=self.weight_col,
            )
        path = os.path.join(self.view_dir, f"epoch={epoch_id}")
        view.write.mode("overwrite").parquet(path)
        self.current = path
