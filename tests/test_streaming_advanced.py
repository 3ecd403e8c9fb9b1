"""Advanced streaming: stream-static join, streaming dedup with watermark,
foreachBatch sink (SURVEY §2B streaming rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducefw_spark.queries._util import t
from mapreducefw_spark.streaming import windows


def test_stream_static_join(spark, sf_dir):
    """Enrich a stream with a static dimension — the classic lookup join."""
    stream = windows.events_stream(spark, sf_dir)
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"), ("purchase", "revenue"),
         ("signup", "growth"), ("error", "ops")],
        "event_type string, category string",
    )
    enriched = stream.join(F.broadcast(dim), "event_type").groupBy("category").agg(
        F.count(F.lit(1)).alias("n")
    )
    out = windows.run_bounded(enriched, "t_enrich")
    batch = (
        t(spark, sf_dir, "events")
        .join(dim, "event_type")
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))


def test_streaming_dedup_with_watermark(spark, sf_dir):
    """dropDuplicates on a stream: re-delivered events collapse to one."""
    stream = windows.events_stream(spark, sf_dir)
    doubled = stream.unionByName(stream)  # simulate at-least-once redelivery
    deduped = doubled.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])
    agg = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    out = windows.run_bounded(agg, "t_dedup")
    batch = t(spark, sf_dir, "events").groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))


def test_foreachbatch_sink(spark, sf_dir, tmp_path):
    """foreachBatch: arbitrary exactly-once-style sink logic per microbatch."""
    stream = windows.events_stream(spark, sf_dir)
    target = str(tmp_path / "fb_out")
    seen_epochs = []

    def sink(batch_df, epoch_id):
        seen_epochs.append(epoch_id)
        batch_df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).write.mode(
            "append"
        ).parquet(target)

    q = stream.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert seen_epochs, "sink never invoked"
    written = spark.read.parquet(target).groupBy("event_type").agg(F.sum("n").alias("n"))
    batch = t(spark, sf_dir, "events").groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    assert sorted(map(tuple, written.collect())) == sorted(map(tuple, batch.collect()))


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """Stream-stream interval join == the batch twin on the bounded replay.

    Append mode: inner stream-stream join emits once per matched pair."""
    from mapreducefw_spark.streaming import joins

    stream = windows.events_stream(spark, sf_dir)
    joined = joins.view_click_join(
        stream.filter(F.col("event_type") == "view"),
        stream.filter(F.col("event_type") == "click"),
        within="30 minutes",
    )
    out = windows.run_bounded(joined, "t_ssj", output_mode="append")
    ev = t(spark, sf_dir, "events")
    batch = joins.view_click_join(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "click"),
        within="30 minutes",
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))


def test_stream_stream_left_outer_join_matches_batch(spark, sf_dir, tmp_path):
    """LEFT OUTER stream-stream join == batch left-outer on the bounded
    replay. Outer NULLs for unmatched views only emit once the watermark
    passes view_ts + within, so the replay stages a far-future sentinel row
    on BOTH sides (the query watermark is the min across inputs) with a
    newer mtime, forcing a final batch whose watermark flushes every
    remaining unmatched view from state."""
    import datetime
    import os
    import time

    from mapreducefw_spark.streaming import joins

    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "ts")
    views_b = ev.filter(F.col("event_type") == "view").drop("event_type")
    clicks_b = ev.filter(F.col("event_type") == "click").drop("event_type")
    vdir, cdir = str(tmp_path / "v_src"), str(tmp_path / "c_src")
    views_b.coalesce(1).write.parquet(vdir)
    clicks_b.coalesce(1).write.parquet(cdir)

    far = ev.agg(F.max("ts")).collect()[0][0] + datetime.timedelta(days=30)
    flush = spark.createDataFrame([(-1, -999, far)], views_b.schema)
    now = time.time()
    for d in (vdir, cdir):
        before = set(os.listdir(d))
        flush.coalesce(1).write.mode("append").parquet(d)
        for f in os.listdir(d):
            path = os.path.join(d, f)
            # real data strictly older than the sentinel so the file source
            # (which orders batches by mtime) replays the sentinel last
            ts_f = now if f not in before or f == "_SUCCESS" else now - 100
            os.utime(path, (ts_f, ts_f))

    vs = (
        spark.readStream.schema(views_b.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(vdir)
    )
    cs = (
        spark.readStream.schema(clicks_b.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(cdir)
    )
    joined = joins.view_click_join_outer(vs, cs)
    out = windows.run_bounded(joined, "t_ssj_outer", output_mode="append")
    # NULL-safe, same reason as the full-outer twin below
    got = out.filter(F.col("user_id").isNull() | (F.col("user_id") != -999))
    expect = joins.view_click_join_outer(views_b, clicks_b)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))
    # the outer legs actually exercised: some unmatched views must exist
    assert got.filter(F.col("click_id").isNull()).count() > 0


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas needs protobuf (TWS state-server protocol); absent in this image",
)
def test_transform_with_state_profiles(spark, sf_dir):
    """Spark 4 transformWithStateInPandas: final per-user profile == batch."""
    from mapreducefw_spark.streaming import stateful

    stream = windows.events_stream(spark, sf_dir)
    out = windows.run_bounded(
        stateful.user_profile_stats(stream), "t_tws", output_mode="update"
    )
    final = out.groupBy("user_id").agg(
        F.max("n_events").alias("n"), F.max("n_event_types").alias("nt")
    )
    ev = t(spark, sf_dir, "events")
    expected = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("event_type").alias("nt"),
    )
    assert sorted(map(tuple, final.collect())) == sorted(map(tuple, expected.collect()))


def test_dedup_within_watermark_bounds_state(spark, sf_dir):
    """dropDuplicatesWithinWatermark: the state-bounded streaming dedup —
    duplicates arriving within the watermark horizon collapse; state for
    old keys is evictable (unlike plain dropDuplicates, whose state grows
    forever). On the bounded replay every duplicate is near-time, so the
    result equals exact dedup."""
    from mapreducefw_spark.streaming import windows as swin

    stream = swin.events_stream(spark, sf_dir)
    doubled = stream.union(stream)  # re-delivery: every event twice
    deduped = doubled.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    out = swin.run_bounded(deduped, "t_dedup_wm", output_mode="append")
    from mapreducefw_spark.queries._util import t as load

    expected = load(spark, sf_dir, "events").count()
    assert out.count() == expected


def test_stream_static_dim_refresh_requires_batch_side_read(spark, tmp_path):
    """Stream-static join semantics users trip over: the static side's FILE
    LISTING is bound when the streaming query starts, so overwriting the
    dim parquet mid-stream breaks the plan-bound join (FileNotFound on the
    vanished old part files — refreshByPath on the session catalog does not
    reach the running query's analyzed plan). The supported pattern for a
    dim that changes while the stream runs is re-reading it INSIDE
    foreachBatch: each micro-batch then joins the dim as of that batch.
    Both behaviors pinned here."""
    import os
    import time

    from pyspark.sql.streaming import StreamingQueryException

    src, dim = str(tmp_path / "src"), str(tmp_path / "dim")
    spark.createDataFrame([(1, "a")], "id int, k string").coalesce(1).write.parquet(src)
    before = set(os.listdir(src))
    spark.createDataFrame([(2, "a")], "id int, k string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    now = time.time()
    for f in os.listdir(src):  # id=1's file strictly older -> its batch first
        ts = now - 100 if f in before and f != "_SUCCESS" else now
        os.utime(os.path.join(src, f), (ts, ts))
    spark.createDataFrame([("a", "v1")], "k string, label string").write.parquet(dim)

    def rewrite_dim():
        spark.createDataFrame(
            [("a", "v2")], "k string, label string"
        ).write.mode("overwrite").parquet(dim)
        spark.catalog.refreshByPath(dim)

    def source():
        return (
            spark.readStream.schema("id int, k string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    # 1) plan-bound static join: dim overwrite mid-stream kills the query
    plan_bound = source().join(spark.read.parquet(dim), "k").select("id", "label")

    def breaking_sink(bdf, eid):
        ids = [r.id for r in bdf.collect()]
        if 1 in ids:
            rewrite_dim()

    q = plan_bound.writeStream.foreachBatch(breaking_sink).start()
    with pytest.raises(StreamingQueryException):
        q.processAllAvailable()
    q.stop()

    # 2) correct pattern: re-read the dim inside foreachBatch
    spark.createDataFrame(
        [("a", "v1")], "k string, label string"
    ).write.mode("overwrite").parquet(dim)
    seen = []

    def perbatch_sink(bdf, eid):
        d = bdf.sparkSession.read.parquet(dim)
        rows = [(r.id, r.label) for r in bdf.join(d, "k").select("id", "label").collect()]
        seen.extend(rows)
        if any(i == 1 for i, _ in rows):
            rewrite_dim()

    q2 = source().writeStream.foreachBatch(perbatch_sink).start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    labels = dict(seen)
    assert labels == {1: "v1", 2: "v2"}, seen


def test_streaming_funnel_equals_batch_on_time_ordered_replay(spark, sf_dir, tmp_path):
    """funnel_stage_stream == the batch funnel fold when the replay respects
    event-time order across micro-batches (funnel state only advances — the
    documented ordering contract). Events are split into three time-range
    files replayed oldest-first; the final per-user emit must equal
    operators/funnel.py::funnel_stage_per_user on the same data."""
    import os
    import time

    from mapreducefw_spark.operators.funnel import funnel_stage_per_user
    from mapreducefw_spark.streaming import stateful

    steps = ["view", "click", "purchase"]
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / 3
    src = str(tmp_path / "ev_src")
    cuts = [lo + span, lo + 2 * span]
    parts = [
        ev.filter(F.col("ts") < cuts[0]),
        ev.filter((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])),
        ev.filter(F.col("ts") >= cuts[1]),
    ]
    now = time.time()
    for i, p in enumerate(parts):
        before = set(os.listdir(src)) if i else set()
        p.coalesce(1).write.mode("append").parquet(src)
        for f in os.listdir(src):
            if f not in before and f != "_SUCCESS":
                ts_f = now - 100 + i  # strictly increasing mtimes
                os.utime(os.path.join(src, f), (ts_f, ts_f))

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = windows.run_bounded(
        stateful.funnel_stage_stream(stream, steps), "t_funnel", output_mode="update"
    )
    final = {
        r.user_id: r.stage
        for r in out.groupBy("user_id").agg(F.max("stage").alias("stage")).collect()
    }
    batch = {
        r.user_id: r.stage for r in funnel_stage_per_user(ev, steps).collect()
    }
    assert final == batch


def test_streaming_gap_fill_equals_batch_on_time_ordered_replay(spark, sf_dir, tmp_path):
    """gap_fill_stream == the batch gap_fill_ffill grid when the replay
    respects bucket order across micro-batches (buckets only advance — the
    documented ordering contract). Events are split into three time-range
    files replayed oldest-first; the union of streaming emits must cover
    the same dense per-key grid with the same gap flags and forward-filled
    values (float sums compared to 1e-9 — the streaming side sums in
    pandas, the batch side in decimal)."""
    import os
    import time

    from mapreducefw_spark.operators.resample import gap_fill_ffill
    from mapreducefw_spark.streaming import stateful

    ev = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("key"), "ts", "value"
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / 3
    src = str(tmp_path / "gf_src")
    cuts = [lo + span, lo + 2 * span]
    parts = [
        ev.filter(F.col("ts") < cuts[0]),
        ev.filter((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])),
        ev.filter(F.col("ts") >= cuts[1]),
    ]
    now = time.time()
    for i, p in enumerate(parts):
        before = set(os.listdir(src)) if i else set()
        p.coalesce(1).write.mode("append").parquet(src)
        for f in os.listdir(src):
            if f not in before and f != "_SUCCESS":
                ts_f = now - 100 + i
                os.utime(os.path.join(src, f), (ts_f, ts_f))

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = windows.run_bounded(
        stateful.gap_fill_stream(stream, 3600), "t_gapfill", output_mode="update"
    )
    streamed = {
        (r.key, r.bucket): (r.value, r.filled_value, r.is_gap)
        for r in out.collect()
    }
    # exactly-once per (key, bucket)
    assert len(streamed) == out.count()
    batch = {
        (r.key, r.bucket): (r.value, r.filled_value, r.is_gap)
        for r in gap_fill_ffill(
            ev, "key", "ts", F.sum("value").cast("double")
        ).collect()
    }
    assert set(streamed) == set(batch)
    for k, (sv, sf_, sg) in streamed.items():
        bv, bf, bg = batch[k]
        assert sg == bg, k
        assert (sv is None) == (bv is None), k
        if bv is not None:
            assert abs(sv - bv) < 1e-6, k
        assert abs(sf_ - bf) < 1e-6, k


def test_watermark_late_row_reemits_window_best_effort(spark, tmp_path):
    """Pins the ACTUAL (best-effort) watermark contract of streaming
    aggregation, measured, not assumed: a row arriving AFTER the watermark
    passed its window does NOT silently vanish — its evicted window is
    re-opened and RE-EMITTED in a later append batch (Spark's docs only
    promise data later than the watermark "may" be dropped; the strict
    filter applies to state-backed ops like dedup/joins, not this path).
    Operational consequences pinned here: (1) append-mode consumers must
    merge on window key because a window can emit twice, (2) the ops
    signal for lateness is the watermark advance in progress metrics.
    Three files replayed in order; the last carries an event 3 hours
    older than the advanced watermark."""
    import os
    import time

    from datetime import datetime, timedelta

    src = str(tmp_path / "wm_src")
    base = datetime(2024, 5, 1, 10, 0, 0)
    batches = [
        [(1, base, 1, "click", 1.0, "{}")],
        [(2, base + timedelta(hours=2), 1, "click", 1.0, "{}")],  # advances wm
        [(3, base - timedelta(hours=1), 1, "click", 1.0, "{}")],  # LATE
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    now = time.time()
    for i, rows in enumerate(batches):
        before = set(os.listdir(src)) if i else set()
        spark.createDataFrame(rows, schema=schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        for f in os.listdir(src):
            if f not in before and f != "_SUCCESS":
                os.utime(os.path.join(src, f), (now - 100 + i, now - 100 + i))

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .count()
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_wm_drop")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        watermarks = [
            p.get("eventTime", {}).get("watermark", "") for p in q.recentProgress
        ]
    finally:
        q.stop()
    # observability: the watermark visibly advanced past the late event
    assert any(wm >= "2024-05-01T11:30:00" for wm in watermarks), watermarks
    out = sorted(
        (r.s.hour, r["count"])
        for r in spark.sql("SELECT window.start AS s, count FROM t_wm_drop").collect()
    )
    # behavior: the late 09:00 event re-opened its already-finalized window
    # and emitted it — it was NOT dropped despite arriving 3 h behind the
    # watermark (best-effort semantics; a sink keyed on the window would
    # see this as a second version of the 09:00 row)
    assert out == [(9, 1), (10, 1)], out


def test_event_time_timeout_closes_sessions_like_batch(spark, sf_dir, tmp_path):
    """session_close_stream == batch 30-min sessionization on a time-ordered
    replay: sessions must close via the EVENT-TIME TIMEOUT (watermark
    passing last_event + gap), incl. idle users with no further input. A
    far-future sentinel row advances the final watermark so every open
    session times out and emits; each session emits exactly once."""
    import os
    import time

    from datetime import timedelta

    from mapreducefw_spark.streaming import stateful

    ev = t(spark, sf_dir, "events").select("user_id", "ts").filter(
        F.col("user_id").isNotNull()
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / 3
    src = str(tmp_path / "sc_src")
    cuts = [lo + span, lo + 2 * span]
    parts = [
        ev.filter(F.col("ts") < cuts[0]),
        ev.filter((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])),
        ev.filter(F.col("ts") >= cuts[1]),
        spark.createDataFrame([(-999, hi + timedelta(days=30))], ev.schema),
    ]
    now = time.time()
    for i, p in enumerate(parts):
        before = set(os.listdir(src)) if i else set()
        p.coalesce(1).write.mode("append").parquet(src)
        for f in os.listdir(src):
            if f not in before and f != "_SUCCESS":
                os.utime(os.path.join(src, f), (now - 100 + i, now - 100 + i))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "1 minute")
    )
    out = windows.run_bounded(
        stateful.session_close_stream(stream, 30), "t_sclose", output_mode="append"
    ).filter(F.col("user_id") != -999)
    got = sorted(
        (r.user_id, r.session_start, r.n_events) for r in out.collect()
    )
    assert len(got) == len(set(got)), "a session emitted twice"

    # batch truth: 30-min-gap islands per user
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy("ts")
    micros = F.unix_micros(F.col("ts"))
    gap = micros - F.lag(micros).over(w)
    brk = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    islands = ev.select("user_id", "ts", F.sum(brk).over(run).alias("sid"))
    batch = sorted(
        (r.user_id, r.session_start, r.n_events)
        for r in islands.groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    )
    assert got == batch


def test_streaming_ohlc_bars_equal_batch(spark, sf_dir):
    """OHLC bars as a watermarked streaming windowed aggregation: min_by/
    max_by against the (ts, event_id) order struct work as streaming agg
    functions (partial states merge associatively), so the bars equal the
    batch ohlc_hourly_bars query on the bounded replay."""
    from mapreducefw_spark.queries import QUERIES, load_all

    load_all()
    stream = windows.events_stream(spark, sf_dir).filter(F.col("value").isNotNull())
    key = F.struct("ts", "event_id")
    bars = (
        stream.withWatermark("ts", "2 hours")
        .groupBy("event_type", F.window("ts", "1 hour"))
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total"),
        )
        .select(
            "event_type", F.col("window.start").alias("bar"),
            "open", "high", "low", "close", "n_ticks", "total",
        )
    )
    out = windows.run_bounded(bars, "t_ohlc_stream")
    got = sorted(map(tuple, out.collect()))
    batch = sorted(map(tuple, QUERIES["ohlc_hourly_bars"](spark, sf_dir).collect()))
    assert got == batch


def test_streaming_gap_fill_entirely_late_batch_does_not_regress_cursor(
    spark, tmp_path
):
    """Regression pin for the late-batch cursor bug: a micro-batch whose
    buckets were ALL already emitted (hi <= state.last_b) must be dropped
    WITHOUT touching state. Before the fix, state.update regressed the
    cursor to hi, so the next in-order batch re-emitted every bucket in
    (hi, old_last_b] — violating the exactly-once-per-(key, bucket)
    contract. Replay: buckets {0,2} -> late-only {1} -> {4}; the union
    must be the dense grid 0..4 with each bucket exactly once and bucket 3
    a gap carrying bucket 4's predecessor fill (bucket 2's value)."""
    import os
    import time

    from datetime import datetime

    from mapreducefw_spark.streaming import stateful

    src = str(tmp_path / "gf_late_src")
    h = 3600
    mk = lambda b, v: ("k", datetime.utcfromtimestamp(b * h), float(v))
    batches = [
        [mk(0, 1.0), mk(2, 3.0)],
        [mk(1, 99.0)],  # entirely late: hi=1 < last_b=2
        [mk(4, 5.0)],
    ]
    now = time.time()
    for i, rows in enumerate(batches):
        before = set(os.listdir(src)) if i else set()
        spark.createDataFrame(
            rows, "key string, ts timestamp, value double"
        ).coalesce(1).write.mode("append").parquet(src)
        for f in os.listdir(src):
            if f not in before and f != "_SUCCESS":
                os.utime(os.path.join(src, f), (now - 100 + i, now - 100 + i))

    stream = (
        spark.readStream.schema("key string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = windows.run_bounded(
        stateful.gap_fill_stream(stream, h), "t_gf_late", output_mode="update"
    )
    rows = out.collect()
    got = {
        int(r.bucket.timestamp() // h): (r.value, r.filled_value, r.is_gap)
        for r in rows
    }
    assert len(rows) == len(got), "a (key, bucket) emitted more than once"
    assert set(got) == {0, 1, 2, 3, 4}
    assert got[1] == (None, 1.0, 1)  # gap from batch 1, NOT the late 99.0
    assert got[2] == (3.0, 3.0, 0)
    assert got[3] == (None, 3.0, 1)  # would re-emit/misfill if cursor regressed
    assert got[4] == (5.0, 5.0, 0)


def test_stream_stream_full_outer_join_matches_batch(spark, sf_dir, tmp_path):
    """FULL OUTER stream-stream join == batch full-outer on the bounded
    replay: converted pairs + never-converted views (NULL click_id) +
    unattributed clicks (NULL view_id). Both outer legs flush only on
    event-time progress, so the replay stages the same far-future
    sentinel on both sides as the left-outer pin."""
    import datetime
    import os
    import time

    from mapreducefw_spark.streaming import joins

    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "ts")
    views_b = ev.filter(F.col("event_type") == "view").drop("event_type")
    clicks_b = ev.filter(F.col("event_type") == "click").drop("event_type")
    vdir, cdir = str(tmp_path / "v_src"), str(tmp_path / "c_src")
    views_b.coalesce(1).write.parquet(vdir)
    clicks_b.coalesce(1).write.parquet(cdir)

    far = ev.agg(F.max("ts")).collect()[0][0] + datetime.timedelta(days=30)
    flush = spark.createDataFrame([(-1, -999, far)], views_b.schema)
    now = time.time()
    for d in (vdir, cdir):
        before = set(os.listdir(d))
        flush.coalesce(1).write.mode("append").parquet(d)
        for f in os.listdir(d):
            path = os.path.join(d, f)
            ts_f = now if f not in before or f == "_SUCCESS" else now - 100
            os.utime(path, (ts_f, ts_f))

    vs = (
        spark.readStream.schema(views_b.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(vdir)
    )
    cs = (
        spark.readStream.schema(clicks_b.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(cdir)
    )
    joined = joins.view_click_join_full_outer(vs, cs)
    out = windows.run_bounded(joined, "t_ssj_full", output_mode="append")
    # NULL-safe sentinel filter: a plain != -999 would also drop NULL-user
    # outer rows from the streaming side only (NULL != -999 is NULL)
    got = out.filter(F.col("user_id").isNull() | (F.col("user_id") != -999))
    expect = joins.view_click_join_full_outer(views_b, clicks_b)
    assert sorted(map(tuple, got.collect()), key=str) == sorted(
        map(tuple, expect.collect()), key=str
    )
    # all three legs actually exercised
    assert got.filter(F.col("click_id").isNull()).count() > 0
    assert got.filter(F.col("view_id").isNull()).count() > 0
    assert got.filter(
        F.col("view_id").isNotNull() & F.col("click_id").isNotNull()
    ).count() > 0


def test_streaming_gap_fill_null_ts_dropped(spark, tmp_path):
    """A NULL-ts row in a key's FIRST batch must be dropped, not converted
    (NaT -> int64 min would seed the cursor at bucket ~-2.56e15 and the
    emit loop would try to yield quadrillions of gap rows). Policy matches
    the batch twin: timeless rows have no bucket."""
    import os
    import time

    from datetime import datetime

    from mapreducefw_spark.streaming import stateful

    src = str(tmp_path / "gf_null_src")
    h = 3600
    rows = [
        ("k", None, 99.0),
        ("k", datetime.utcfromtimestamp(0 * h), 1.0),
        ("k", datetime.utcfromtimestamp(2 * h), 3.0),
    ]
    spark.createDataFrame(
        rows, "key string, ts timestamp, value double"
    ).coalesce(1).write.parquet(src)
    now = time.time()
    for f in os.listdir(src):
        os.utime(os.path.join(src, f), (now - 100, now - 100))
    stream = (
        spark.readStream.schema("key string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = windows.run_bounded(
        stateful.gap_fill_stream(stream, h), "t_gf_null", output_mode="update"
    )
    got = {
        int(r.bucket.timestamp() // h): (r.value, r.is_gap) for r in out.collect()
    }
    assert got == {0: (1.0, 0), 1: (None, 1), 2: (3.0, 0)}
