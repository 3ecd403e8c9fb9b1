"""Declarative data-quality constraints (the dbt-tests / Delta CHECK /
Great-Expectations surface): express table expectations as rules, get back
one row per rule with its exact violation count — the gate a 100 TB
ingestion pipeline runs before publishing a partition.

Scale shape: all row-predicate rules (not_null, in_range, accepted_values)
fuse into ONE conditional-count aggregation over a single scan of the
table; uniqueness is one groupBy over the key columns (map-side combine,
counts only); referential integrity is one left-anti join against the
(usually broadcastable) dimension's key projection. Nothing ever moves full
rows — violations are COUNTED where they sit; callers wanting samples
re-filter with the same predicate.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Rules:
    """Builder: accumulate rules, then ``report(df)``."""

    _predicates: list[tuple[str, Column]] = field(default_factory=list)
    _uniques: list[tuple[str, list[str]]] = field(default_factory=list)
    _fks: list[tuple[str, str, DataFrame, str]] = field(default_factory=list)

    def not_null(self, col: str) -> "Rules":
        self._predicates.append((f"not_null({col})", F.col(col).isNull()))
        return self

    def in_range(self, col: str, lo, hi) -> "Rules":
        # NULLs are not range violations — not_null is its own rule
        self._predicates.append(
            (
                f"in_range({col},{lo},{hi})",
                F.col(col).isNotNull() & ~F.col(col).between(lo, hi),
            )
        )
        return self

    def accepted_values(self, col: str, values: list) -> "Rules":
        self._predicates.append(
            (
                f"accepted_values({col})",
                F.col(col).isNotNull() & ~F.col(col).isin(*values),
            )
        )
        return self

    def unique(self, cols: list[str]) -> "Rules":
        self._uniques.append((f"unique({','.join(cols)})", cols))
        return self

    def foreign_key(self, col: str, dim: DataFrame, dim_col: str) -> "Rules":
        self._fks.append((f"foreign_key({col})", col, dim, dim_col))
        return self

    def report(self, df: DataFrame) -> DataFrame:
        """One row per rule: (rule, n_violations), ordered by rule name.

        unique counts EXCESS rows (group count - 1 per duplicated key);
        foreign_key counts fact rows whose non-null key misses the
        dimension (NULL keys are not FK violations, per SQL semantics).
        """
        frames = []
        if self._predicates:
            frames.append(
                df.agg(
                    *[
                        F.sum(F.when(pred, 1).otherwise(0)).cast("bigint").alias(name)
                        for name, pred in self._predicates
                    ]
                ).select(
                    F.explode(
                        F.create_map(
                            *[
                                x
                                for name, _ in self._predicates
                                for x in (F.lit(name), F.col(name))
                            ]
                        )
                    ).alias("rule", "n_violations")
                )
            )
        for name, cols in self._uniques:
            frames.append(
                df.groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("_c"))
                .agg(
                    F.coalesce(F.sum(F.col("_c") - 1), F.lit(0))
                    .cast("bigint")
                    .alias("n_violations")
                )
                .select(F.lit(name).alias("rule"), "n_violations")
            )
        for name, col, dim, dim_col in self._fks:
            missing = (
                df.select(F.col(col).alias("_k"))
                .filter(F.col("_k").isNotNull())
                .join(dim.select(F.col(dim_col).alias("_k")), "_k", "left_anti")
            )
            frames.append(
                missing.agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
                .select(F.lit(name).alias("rule"), "n_violations")
            )
        out = frames[0]
        for fr in frames[1:]:
            out = out.unionByName(fr)
        return out.orderBy("rule")
