"""Ordered-sequence funnel matching (the MATCH_RECOGNIZE workload): per
user, how far through an ordered list of event-type stages did they get,
with each stage STRICTLY after the accepted previous stage's timestamp?

Shape: one scan + one user-keyed exchange; each user's events collapse to a
time-sorted struct array walked by an F.aggregate (stage, last_ts) fold.
The fold touches a handful of events per user — the small-array case where
higher-order expressions are the right tool (contrast
similarity.assign_cells_vectorized, where the scanned array grows with the
corpus). A sorted-order fold accepts the minimal qualifying timestamp per
stage, so the semantics equal the staged-CTE formulation
(min t1 -> min qualifying t2 -> ...), which is what the DuckDB oracle of
``funnel_view_click_purchase`` runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stage_per_user(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Returns (user_col, stage): stage = number of funnel steps completed
    in strict event-time order (0..len(steps)).

    Bound: one sorted struct array PER USER (qualifying events only). At
    human-scale event counts that is a handful of elements; a single bot
    or power user with 10^7 qualifying events becomes one task's
    in-memory array. When per-user volume is unbounded, use
    funnel_stage_per_user_staged (array-free, len(steps) min-shuffles,
    exact same semantics — equality pinned in tests/test_scale_features.py)
    or the O(1)-state streaming twin
    streaming/stateful.py::funnel_stage_stream."""
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = events.filter(F.col(type_col).isin(*steps))
    seq = F.array_sort(F.collect_list(F.struct(F.col(ts_col), F.col(type_col))))
    per_user = ev.groupBy(user_col).agg(seq.alias("seq"))
    acc0 = F.struct(
        F.lit(0).alias("stage"), F.lit("1900-01-01").cast("timestamp").alias("lt")
    )

    def step(acc, e):
        out = acc
        for i, name in enumerate(steps):
            cond = (acc["stage"] == i) & (e[type_col] == name)
            if i > 0:
                cond = cond & (e[ts_col] > acc["lt"])
            out = F.when(
                cond,
                F.struct(F.lit(i + 1).alias("stage"), e[ts_col].alias("lt")),
            ).otherwise(out)
        return out

    return per_user.select(
        F.col(user_col), F.aggregate("seq", acc0, step)["stage"].alias("stage")
    )


def funnel_stage_per_user_staged(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Array-free exact twin of funnel_stage_per_user: the staged-min
    formulation (min t1 -> min qualifying t2 -> ...) run directly as
    len(steps) user-keyed min-aggregations instead of one collect_list
    fold.

    This is the UNBOUNDED-per-user scale path: funnel_stage_per_user
    materializes one sorted struct array per user, so a single bot/power
    user with 10^7 events becomes one task's in-memory array at 100 TB.
    Here no per-user state beyond one timestamp ever exists — each stage
    is a filter + join against the previous stage's (user, ts) frame
    (user-cardinality, min-combined map-side) + a min aggregation, all on
    the same user hash partitioning so the exchanges reuse. Cost:
    len(steps) passes instead of one; right when steps is small and users
    can be hot. The O(1)-state streaming twin is
    streaming/stateful.py::funnel_stage_stream.

    Joins are NULL-SAFE on the user key: the fold form's groupBy treats a
    NULL user as an ordinary group, so the staged joins must too (a plain
    equi-join would silently cap every NULL-user row at stage 1).

    steps=[] raises in both variants (ADVICE r6: F.greatest(single-arg)
    crashed here while the fold form degraded to stage 0 — the guard keeps
    the two forms behavior-identical).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = events.filter(F.col(type_col).isin(*steps)).select(
        F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts"), F.col(type_col).alias("_ty")
    )
    base = ev.select("_u").distinct()
    prev = None  # (user, accepted ts of previous stage)
    stage_frames = []
    for i, name in enumerate(steps):
        s = ev.filter(F.col("_ty") == name)
        if prev is not None:
            s = (
                s.join(prev, F.col("_u").eqNullSafe(F.col("_pu")))
                .filter(F.col("_ts") > F.col("_pt"))
                .drop("_pu", "_pt")
            )
        cur = s.groupBy("_u").agg(F.min("_ts").alias("_pt"))
        stage_frames.append(cur.select(F.col("_u").alias("_pu"), F.lit(i + 1).alias(f"_s{i}")))
        prev = cur.select(F.col("_u").alias("_pu"), "_pt")
    out = base
    for i, sf_ in enumerate(stage_frames):
        out = out.join(sf_, F.col("_u").eqNullSafe(F.col("_pu")), "left").drop("_pu")
    stage = F.greatest(
        F.lit(0), *[F.coalesce(F.col(f"_s{i}"), F.lit(0)) for i in range(len(steps))]
    )
    return out.select(F.col("_u").alias(user_col), stage.alias("stage"))
