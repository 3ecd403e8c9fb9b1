"""ANSI SQL MERGE (SQL:2023, incl. WHEN NOT MATCHED BY SOURCE) as a
DataFrame composition — the classic warehouse upsert verb, format-agnostic.

Spark's ``MERGE INTO`` statement needs a v2 table provider implementing
row-level operations (Delta/Iceberg), which plain parquet tables don't
have; the RELATIONAL semantics of MERGE, though, are one full-outer join
plus per-row clause dispatch, and that runs on any source. This operator
implements the full three-family clause model:

- WHEN MATCHED [AND cond] THEN UPDATE SET ... / DELETE
- WHEN NOT MATCHED [AND cond] THEN INSERT ...
- WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET ... / DELETE

with ANSI first-true-clause-wins dispatch within each family, and the
ANSI cardinality rule (a target row matched by MORE THAN ONE source row
is an error — SQLSTATE 21000, the same check Delta enforces) as a lazy
plan-side guard.

Scale design (100 TB target, GB-scale source — the usual shape): ONE
full-outer join on the merge keys = one scan of each side, one shuffle
exchange each, clause dispatch as pure projections (whole-stage codegen).
Spark cannot broadcast a full-outer hash join, so a daily-changelog
upsert that needs no target-side values and no NOT-MATCHED-BY-SOURCE
clauses should prefer ``cdc.apply_changelog`` (anti-join + union,
broadcast-able); merge_into is the GENERAL verb — conditional clause
dispatch, target-referencing updates, by-source clauses — and pays the
general price.

Reference job shape: map (tag rows) -> shuffle by key -> reduce (dispatch
clauses per key) — `/root/reference/MapReduceClient.h:47-51`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


@dataclass(frozen=True)
class MergeClause:
    """One WHEN clause. ``action`` is 'update' / 'delete' / 'insert';
    ``condition`` (optional) and update/insert ``assignments`` (target
    column -> Column) may reference ``t.<col>`` and ``s.<col>``."""

    action: str
    condition: Column | None = None
    assignments: dict[str, Column] = field(default_factory=dict)


def when_matched_update(assignments: dict[str, Column], condition: Column | None = None):
    return MergeClause("update", condition, dict(assignments))


def when_matched_delete(condition: Column | None = None):
    return MergeClause("delete", condition)


def when_not_matched_insert(assignments: dict[str, Column], condition: Column | None = None):
    return MergeClause("insert", condition, dict(assignments))


def when_not_matched_by_source_update(
    assignments: dict[str, Column], condition: Column | None = None
):
    return MergeClause("update", condition, dict(assignments))


def when_not_matched_by_source_delete(condition: Column | None = None):
    return MergeClause("delete", condition)


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    *,
    matched: list[MergeClause] = (),
    not_matched: list[MergeClause] = (),
    not_matched_by_source: list[MergeClause] = (),
    enforce_cardinality: bool = True,
) -> DataFrame:
    """Merged snapshot with target's schema (one row per surviving key).

    Defaults mirror ANSI: a matched row with no true matched-clause stays
    unchanged; a source-only row with no true insert-clause is NOT
    inserted; a target-only row with no true by-source-clause stays.

    ``enforce_cardinality``: if two source rows share a merge key (one
    target row would be updated twice, nondeterministically), the merged
    frame fails AT ACTION TIME via raise_error — plan construction stays
    lazy; the guard is a window count over the SOURCE only."""
    for cl in matched:
        if cl.action not in ("update", "delete"):
            raise ValueError(f"WHEN MATCHED supports update/delete, got {cl.action!r}")
    for cl in not_matched:
        if cl.action != "insert":
            raise ValueError(f"WHEN NOT MATCHED supports insert, got {cl.action!r}")
    for cl in not_matched_by_source:
        if cl.action not in ("update", "delete"):
            raise ValueError(
                f"WHEN NOT MATCHED BY SOURCE supports update/delete, got {cl.action!r}"
            )
    out_cols = list(target.columns)
    if enforce_cardinality:
        # the guard is woven INTO the first merge-key column (not a
        # dropped side column, which column pruning would eliminate along
        # with the error): key value passes through unless duplicated
        n = F.count(F.lit(1)).over(W.partitionBy(*on))
        msg = F.concat(
            F.lit(
                "MERGE cardinality violation (SQLSTATE 21000): "
                "source has duplicate merge key "
            ),
            F.to_json(F.struct(*on)),
        )
        k0 = on[0]
        guarded = F.when(n > 1, F.raise_error(msg)).otherwise(F.col(k0)).alias(k0)
        source = source.select(
            *[guarded if c == k0 else F.col(c) for c in source.columns]
        )
    # explicit presence tags, NOT key-isNotNull sniffing: a NULL merge key
    # is a legal row value (ANSI equality just never matches it), and
    # inferring presence from key nullability would misclassify such rows
    # as absent. Plain `=` join per ANSI — a NULL-key target row is
    # NOT MATCHED BY SOURCE, a NULL-key source row is NOT MATCHED.
    t = target.withColumn("_t_present", F.lit(True)).alias("t")
    s = source.withColumn("_s_present", F.lit(True)).alias("s")
    join_cond = None
    for k in on:
        c = F.col(f"t.{k}") == F.col(f"s.{k}")
        join_cond = c if join_cond is None else (join_cond & c)
    joined = t.join(s, join_cond, "full_outer")

    has_t = F.coalesce(F.col("t._t_present"), F.lit(False))
    has_s = F.coalesce(F.col("s._s_present"), F.lit(False))
    is_matched = has_t & has_s
    is_insert = ~has_t & has_s
    is_tonly = has_t & ~has_s

    # clause dispatch, first-true-wins: a clause fires only when its
    # condition holds AND no EARLIER clause in the same family fired, so
    # effective conditions are mutually exclusive (a later unconditional
    # UPDATE must not restyle rows an earlier conditional UPDATE already
    # took — ANSI dispatch). NULL conditions count as not-satisfied
    # (three-valued logic would otherwise poison the ~prev chain).
    def effective(family_tag: Column, clauses) -> list[tuple[Column, MergeClause]]:
        prev = F.lit(False)
        out = []
        for cl in clauses:
            c = (
                family_tag
                if cl.condition is None
                else (family_tag & F.coalesce(cl.condition, F.lit(False)))
            )
            out.append((c & ~prev, cl))
            prev = prev | c
        return out

    keep = F.lit(True)  # matched / target-only rows default to kept-unchanged
    values: dict[str, Column] = {c: F.col(f"t.{c}") for c in out_cols}
    for cond, cl in effective(is_matched, matched):
        if cl.action == "delete":
            keep = F.when(cond, F.lit(False)).otherwise(keep)
        else:
            for c, expr in cl.assignments.items():
                values[c] = F.when(cond, expr).otherwise(values[c])
    ins_keep = F.lit(False)  # source-only rows default to not-inserted
    for cond, cl in effective(is_insert, not_matched):
        ins_keep = F.when(cond, F.lit(True)).otherwise(ins_keep)
        for c, expr in cl.assignments.items():
            values[c] = F.when(cond, expr).otherwise(values[c])
    for cond, cl in effective(is_tonly, not_matched_by_source):
        if cl.action == "delete":
            keep = F.when(cond, F.lit(False)).otherwise(keep)
        else:
            for c, expr in cl.assignments.items():
                values[c] = F.when(cond, expr).otherwise(values[c])

    row_keep = F.when(is_insert, ins_keep).otherwise(keep)
    typed = dict(target.dtypes)
    return joined.filter(row_keep).select(
        *[values[c].cast(typed[c]).alias(c) for c in out_cols]
    )
