"""Stream-stream joins (Structured Streaming) — the last big streaming shape
after windowed aggs, sessionization, and stateful ops.

Spark buffers both sides in state keyed by the equi column; the watermark plus
the event-time range bound how long a row can wait for a match, so state is
GC-able and the join runs unbounded. The batch twin
(``queries/timeseries.py::view_click_attribution``) is oracle-checked; pytest
pins stream == batch on the bounded replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _attribution_join(
    views: DataFrame, clicks: DataFrame, *, within: str, watermark: str, how: str
) -> DataFrame:
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return v.join(
        c,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") > F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {within}")),
        how,
    ).select(
        "view_id",
        "click_id",
        # full outer: an unmatched CLICK row has NULL v_user — the user
        # comes from whichever side is present (equal when both are)
        F.coalesce(F.col("v_user"), F.col("c_user")).alias("user_id"),
    )


def view_click_join(
    views: DataFrame,
    clicks: DataFrame,
    *,
    within: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Attribute each click to the views by the same user in the preceding
    ``within`` interval (click strictly after the view).

    Both inputs need watermarks — without them Spark would keep every view
    forever waiting for a possible future click. The range condition on the
    two event times lets the state store evict a view once the watermark
    passes view_ts + within.
    """
    return _attribution_join(
        views, clicks, within=within, watermark=watermark, how="inner"
    )


def view_click_join_outer(
    views: DataFrame,
    clicks: DataFrame,
    *,
    within: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER stream-stream join: every view emits — matched pairs as
    they meet, UNMATCHED views with a NULL click_id once the watermark
    proves no qualifying click can still arrive (watermark past
    view_ts + within). That deferred NULL emission is the semantic heart of
    streaming outer joins: correctness depends on event-time progress, not
    on micro-batch boundaries, so a bounded replay only flushes its tail
    after a later-timestamped row advances the watermark (the pytest pin
    stages exactly such a flush row). Funnel analyses (views that never
    converted) run on this shape unchanged against Kafka."""
    return _attribution_join(
        views, clicks, within=within, watermark=watermark, how="leftOuter"
    )


def view_click_join_full_outer(
    views: DataFrame,
    clicks: DataFrame,
    *,
    within: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """FULL OUTER stream-stream join: the left-outer contract plus the
    symmetric click leg — a click with NO qualifying preceding view (the
    direct-navigation / lost-referrer case) emits with a NULL view_id once
    the watermark proves no older view can still arrive. State eviction is
    two-sided: a view leaves when the watermark passes view_ts + within, a
    click when it passes click_ts (its match range only extends backward).
    The three-way split this yields in one operator — converted pairs,
    never-converted views, unattributed clicks — is the complete
    attribution ledger downstream reconciliation wants."""
    return _attribution_join(
        views, clicks, within=within, watermark=watermark, how="fullOuter"
    )
