"""Custom stateful streaming operator via applyInPandasWithState.

Running per-key event counters with arbitrary user state — the streaming
analog of the reference's Reduce-with-full-group semantics, except state is
incremental and watermark-bounded instead of materializing the whole group
(required once the stream is unbounded).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_counts(events: DataFrame) -> DataFrame:
    """Per-user running event count + running value sum, updated per batch."""

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, total_value double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_profile_stats(events: DataFrame) -> DataFrame:
    """Per-user running stats on the Spark 4 transformWithStateInPandas API —
    typed composite state (a ValueState counter plus a MapState of per-type
    counts) instead of applyInPandasWithState's single packed tuple.

    The state store scales horizontally: each shuffle partition owns its key
    range (RocksDB-backed on a real cluster), so 100 TB of history streams
    through with per-key state bounded by profile size, not event count.

    Requires protobuf (the TWS state-server wire protocol); this sandbox
    image lacks it, so the pytest is skipped here and applyInPandasWithState
    (running_user_counts above) remains the exercised stateful path.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class Profile(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n bigint, total double")
            self._by_type = handle.getMapState("by_type", "t string", "c bigint")

        def handleInputRows(self, key, rows, timer_values) -> Iterator[pd.DataFrame]:
            n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                for et, c in pdf["event_type"].value_counts().items():
                    prev = self._by_type.getValue((et,)) if self._by_type.containsKey((et,)) else (0,)
                    self._by_type.updateValue((et,), (prev[0] + int(c),))
            self._totals.update((n, total))
            n_types = sum(1 for _ in self._by_type.keys())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "n_event_types": [n_types],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Profile(),
        outputStructType="user_id bigint, n_events bigint, total_value double, n_event_types bigint",
        outputMode="Update",
        timeMode="None",
    )


def cdc_materialize(changes: DataFrame) -> DataFrame:
    """Streaming CDC materialization: fold an (key, seq, op, val) changelog
    stream into per-key current state — the live MERGE INTO whose final
    answer must equal the batch fold (operators/cdc.py::apply_changelog;
    equivalence pinned in tests/test_streaming.py, with the base snapshot
    entering the stream as seq=-1 upserts since applyInPandasWithState has
    no initial-state hook).

    State per key is just (seq, op, val) of the LATEST applied change —
    last-writer-wins on seq, exactly the batch operator's window rule, and
    robust to late/out-of-order delivery ACROSS micro-batches (a stale seq
    arriving after a newer one is ignored). Deletes stay in state as
    tombstones so a late pre-delete update cannot resurrect the row. Emits
    the current row per key per batch (update mode); the reader takes each
    key's last emit and drops tombstones to get the table."""

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seq, op, val = state.get if state.exists else (-2, "", "")
        for pdf in batches:
            # fold this batch's rows; ties impossible (contract: unique seq)
            for s, o, v in zip(
                pdf["seq"].to_numpy(), pdf["op"].to_numpy(), pdf["val"].to_numpy()
            ):
                if int(s) > seq:
                    seq, op, val = int(s), str(o), "" if v is None else str(v)
        state.update((seq, op, val))
        yield pd.DataFrame(
            {"key": [key[0]], "seq": [seq], "op": [op], "val": [val]}
        )

    return changes.groupBy("key").applyInPandasWithState(
        update,
        outputStructType="key bigint, seq bigint, op string, val string",
        stateStructType="seq bigint, op string, val string",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def funnel_stage_stream(events: DataFrame, steps: list[str]) -> DataFrame:
    """Streaming funnel: per-user (stage, last_ts) state advanced by each
    micro-batch — the applyInPandasWithState twin of
    operators/funnel.py::funnel_stage_per_user, emitting the user's current
    stage per batch (outputMode=update; the latest emit is the answer).

    Ordering contract: stage state only advances, so events must arrive in
    event-time order ACROSS micro-batches for exact batch-parity (within a
    batch they are sorted here). That is the standard funnel-streaming
    assumption — a roughly time-ordered source (Kafka by ingestion time)
    with the watermark bounding the disorder; the batch-equivalence test
    replays time-partitioned files. State is O(1) per user forever, where
    the batch form materializes each user's full event array.
    """

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            stage, last_us = state.get
        else:
            stage, last_us = 0, -(2**62)
        rows = pd.concat(list(batches), ignore_index=True)
        rows = rows[rows["event_type"].isin(steps)]
        rows = rows.sort_values(["ts", "event_type"], kind="mergesort")
        for ts, et in zip(rows["ts"], rows["event_type"]):
            ts_us = int(pd.Timestamp(ts).value // 1000)
            if stage < len(steps) and et == steps[stage] and (
                stage == 0 or ts_us > last_us
            ):
                stage += 1
                last_us = ts_us
        state.update((stage, last_us))
        yield pd.DataFrame({"user_id": [key[0]], "stage": [stage]})

    # pre-filter to funnel steps so users with no step events never enter
    # state (matches the batch form, which filters before grouping — an
    # error-only user must be absent, not stage 0)
    stepped = events.filter(events["event_type"].isin(steps))
    return stepped.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, stage int",
        stateStructType="stage int, last_us bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def gap_fill_stream(keyed: DataFrame, step_seconds: int = 3600) -> DataFrame:
    """Streaming gap-fill + forward-fill: the applyInPandasWithState twin of
    operators/resample.py::gap_fill_ffill, emitting each key's dense bucket
    rows incrementally as the stream advances.

    Input columns: ``key string, ts timestamp, value double``. Per key the
    state is (last emitted bucket, last filled value) — O(1) forever. Each
    micro-batch aggregates its rows per bucket, then emits every bucket
    from state.last+1 (first observed bucket on first sight of the key)
    through the batch's max observed bucket: observed buckets carry their
    sum, missing buckets carry NULL + the forward-filled value + is_gap=1.
    Rows are emitted exactly once per (key, bucket), so the union of emits
    is the dense grid — heartbeat/missed-interval detection for free.

    Ordering contract (same as funnel_stage_stream): buckets only advance,
    so events must arrive bucket-ordered ACROSS micro-batches for exact
    batch parity; within a batch order is irrelevant (the batch is
    aggregated before emission). A late event for an already-emitted
    bucket is dropped with the bucket already reported — the watermarked
    windowed-aggregate operators are the late-tolerant alternative when
    completeness beats latency. Per-batch emission is bounded by the
    key's bucket span in that batch, not by event count.
    """

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        has, last_b, last_v = state.get if state.exists else (0, 0, 0.0)
        rows = pd.concat(list(batches), ignore_index=True)
        # NULL-ts policy matches the batch twin (gap_fill_ffill / the
        # windowed event queries): a timeless row has no bucket. Without
        # this, NaT converts to int64 MIN below and a first-batch key
        # would try to emit ~2.5e15 "gap" buckets from year -290308.
        rows = rows[rows["ts"].notna()]
        if rows.empty:
            return
        us = rows["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        buckets = us // (step_seconds * 1_000_000)
        agg = (
            pd.DataFrame({"_b": buckets, "value": rows["value"].to_numpy()})
            .groupby("_b")["value"]
            .sum()
        )
        hi = int(agg.index.max())
        if has and hi <= int(last_b):
            # Entirely-late batch: every bucket was already emitted. Drop it
            # without touching state — updating would regress the cursor to
            # hi and make the next in-order batch re-emit (key, bucket) rows.
            return
        start = int(last_b) + 1 if has else int(agg.index.min())
        out_b, out_v, out_f, out_g = [], [], [], []
        fv = float(last_v)
        for b in range(start, hi + 1):
            if b in agg.index:
                v = float(agg.loc[b])
                fv = v
                out_v.append(v)
                out_g.append(0)
            else:
                out_v.append(None)
                out_g.append(1)
            out_b.append(b)
            out_f.append(fv)
        state.update((1, hi, fv))
        yield pd.DataFrame(
            {
                "key": str(key[0]),
                "bucket": pd.to_datetime(
                    pd.Series(out_b, dtype="int64") * (step_seconds * 1_000_000),
                    unit="us",
                ),
                "value": pd.Series(out_v, dtype="float64"),
                "filled_value": pd.Series(out_f, dtype="float64"),
                "is_gap": pd.Series(out_g, dtype="int32"),
            }
        )

    return keyed.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=(
            "key string, bucket timestamp, value double, "
            "filled_value double, is_gap int"
        ),
        stateStructType="has int, last_b bigint, last_v double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def session_close_stream(events: DataFrame, gap_min: int = 30) -> DataFrame:
    """Sessionization with EVENT-TIME TIMEOUTS: a user's session closes (and
    emits exactly once) when the WATERMARK passes last_event + gap — not
    when the next event for that user happens to arrive. This is the
    applyInPandasWithState timeout API the other stateful operators don't
    need (they emit per batch): ``GroupStateTimeout.EventTimeTimeout`` +
    ``state.setTimeoutTimestamp``, with the timed-out callback delivering
    the closed session. Idle users therefore emit WITHOUT new input — the
    semantics ``session_window`` gives aggregations, here available to
    arbitrary per-session state.

    Input columns: ``user_id, ts`` (pre-filtered/projected; the stream must
    carry a watermark on ts). Output one row per CLOSED session:
    ``user_id, session_start, session_end (last event + gap), n_events``.
    State per user is (start, last, n) — O(1) forever. Ordering contract
    matches the other stateful forms: event-time order across batches
    (within a batch, rows are sorted here); a gap WITHIN one batch also
    splits sessions, batch-side, so replays coarser than the gap still
    close correctly.
    """
    gap_us = gap_min * 60 * 1_000_000

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def emit(start_us: int, last_us: int, n: int) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": pd.to_datetime([start_us], unit="us"),
                    "session_end": pd.to_datetime([last_us + gap_us], unit="us"),
                    "n_events": [n],
                }
            )

        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield emit(start_us, last_us, n)
            return

        rows = pd.concat(list(batches), ignore_index=True)
        us = np.sort(rows["ts"].to_numpy().astype("datetime64[us]").astype("int64"))
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = int(us[0]), int(us[0]) - 1, 0
        out = []
        for t_us in us:
            t_us = int(t_us)
            if n and t_us - last_us > gap_us:
                out.append(emit(start_us, last_us, n))
                start_us, n = t_us, 0
            last_us = t_us
            n += 1
        state.update((start_us, last_us, n))
        # close the open session once the WATERMARK passes last + gap
        state.setTimeoutTimestamp(int((last_us + gap_us) / 1000) + 1)
        for pdf in out:
            yield pdf

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id bigint, session_start timestamp, "
            "session_end timestamp, n_events bigint"
        ),
        stateStructType="start_us bigint, last_us bigint, n bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
