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
    in strict event-time order (0..len(steps))."""
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
