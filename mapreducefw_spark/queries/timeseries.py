"""Time-series / event-stream queries in batch form (SURVEY §2B streaming).

These are the batch twins of the structured-streaming operators in
``mapreducefw_spark.streaming`` — same aggregation logic, oracle-checkable.
The streaming versions are verified by batch-equivalence in tests
(SURVEY §5.2 item 4): a windowed agg over a bounded stream must equal the
corresponding batch query here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import dec, t


@register(
    "events_tumbling_1h",
    oracle="""
SELECT STRFTIME(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events WHERE ts IS NOT NULL
GROUP BY 1, 2
ORDER BY window_start, event_type
""",
)
def events_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows via F.window (epoch-aligned, same as
    time_bucket). NULL ts excluded on BOTH sides: F.window silently drops
    NULL-time rows while SQL GROUP BY would emit a NULL bucket — the
    explicit filter makes the corrupt-timestamp policy symmetric."""
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "events_sliding_1h_30m",
    oracle="""
WITH assigned AS (
  SELECT time_bucket(INTERVAL 30 MINUTES, ts) AS ws, value FROM events
  WHERE ts IS NOT NULL
  UNION ALL
  SELECT time_bucket(INTERVAL 30 MINUTES, ts) - INTERVAL 30 MINUTES AS ws, value
  FROM events WHERE ts IS NOT NULL
)
SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM assigned
GROUP BY ws
ORDER BY window_start
""",
)
def events_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1h length, 30m slide): each event lands in 2
    windows. NULL ts excluded both sides (same policy as the tumbling
    form)."""
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "total_value",
        )
        .orderBy("window_start")
    )


@register(
    "sessionization_30m",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - COALESCE(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts - INTERVAL 10 YEAR)
                   > INTERVAL 30 MINUTES THEN 1 ELSE 0 END AS new_session
  FROM events WHERE ts IS NOT NULL
)
SELECT user_id,
       CAST(SUM(new_session) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM flagged
GROUP BY user_id
ORDER BY user_id
""",
)
def sessionization_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: gap > 30 min starts a new session (lag + flag sum).
    The streaming twin is ``session_window`` in mapreducefw_spark.streaming.
    NULL ts excluded both sides: a timeless event has no place in a gap
    chain, and NULL sort position differs across engines."""
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap: cast('long') would truncate to seconds and
    # disagree with the oracle's exact interval compare near the boundary
    micros = F.unix_micros(F.col("ts"))
    gap = micros - F.lag(micros).over(w)
    new_session = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    return (
        ev.select("user_id", new_session.alias("new_session"))
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("bigint").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


@register(
    "session_window_batch",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTES THEN 1 ELSE 0 END AS brk
  FROM events WHERE ts IS NOT NULL
),
islands AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       STRFTIME(MAX(ts) + INTERVAL 30 MINUTES, '%Y-%m-%d %H:%M:%S') AS session_end,
       COUNT(*) AS n
FROM islands
GROUP BY user_id, sid
ORDER BY user_id, session_start
""",
)
def session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window in BATCH mode (merged gap<=30min intervals per user)
    — the same API the streaming twin uses; oracle is gaps-and-islands
    SQL. MEASURED boundary contract (Spark 4.1, pinned by the edge
    suite's exact-30-min event chain): an event at exactly
    last-event + gap still MERGES into the session — the break condition
    is strictly greater-than. NULL ts excluded both sides (session_window
    drops them silently; the filter makes the policy explicit and
    symmetric)."""
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "interval_join_events",
    oracle="""
SELECT a.event_id AS id_a, b.event_id AS id_b
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 5 MINUTES
ORDER BY id_a, id_b
""",
)
def interval_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (event-time range) join via time-binning: key = (user_id,
    5-minute bin), with the b side exploded into its own bin and the one
    before it. Since tb ∈ (ta, ta+5m] implies bin(tb) ∈ {bin(ta), bin(ta)+1},
    every true pair meets in exactly one bucket — no duplicates, no misses.
    Joining on user_id alone is quadratic inside a heavy user; the bin bounds
    each hash bucket to two windows of events, so the join stays linear at
    100 TB (2.5x faster already at sf0.1). Same bucketing a stream-stream
    interval join's state store uses."""
    ev = t(spark, sf_dir, "events")
    BIN_US = 300_000_000  # 5 minutes in microseconds
    bin_of = F.floor(F.unix_micros("ts") / BIN_US)
    a = ev.select(
        F.col("event_id").alias("id_a"), F.col("user_id").alias("u"),
        F.col("ts").alias("ta"), bin_of.alias("bin"),
    )
    b = ev.select(
        F.col("event_id").alias("id_b"), F.col("user_id").alias("u"),
        F.col("ts").alias("tb"), F.explode(F.array(bin_of, bin_of - 1)).alias("bin"),
    )
    return (
        a.join(b, ["u", "bin"])
        .filter(
            (F.col("tb") > F.col("ta"))
            & (F.col("tb") <= F.col("ta") + F.expr("INTERVAL 5 MINUTES"))
        )
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
    )


@register(
    "view_click_attribution",
    oracle="""
SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id AS user_id
FROM events v JOIN events c
  ON v.user_id = c.user_id
 AND v.event_type = 'view' AND c.event_type = 'click'
 AND c.ts > v.ts
 AND c.ts <= v.ts + INTERVAL 30 MINUTES
ORDER BY view_id, click_id
""",
)
def view_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream join (streaming/joins.py): clicks
    attributed to same-user views within 30 minutes. Equi key (user_id) +
    time-range post-filter — the same plan shape Structured Streaming keys
    its join state by, so batch and stream produce identical pairs (pinned
    in tests/test_streaming_advanced.py)."""
    from mapreducefw_spark.streaming.joins import view_click_join

    ev = t(spark, sf_dir, "events")
    return view_click_join(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "click"),
        within="30 minutes",
    ).orderBy("view_id", "click_id")


@register(
    "view_click_attribution_outer",
    oracle="""
SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id AS user_id
FROM events v LEFT JOIN events c
  ON v.user_id = c.user_id
 AND c.event_type = 'click'
 AND c.ts > v.ts
 AND c.ts <= v.ts + INTERVAL 30 MINUTES
WHERE v.event_type = 'view'
ORDER BY view_id, click_id
""",
)
def view_click_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the LEFT OUTER stream-stream join
    (streaming/joins.py::view_click_join_outer): every view appears, with a
    NULL click_id when no same-user click follows within 30 minutes — the
    funnel question 'which views never converted'. Stream == batch is
    pinned in tests/test_streaming_advanced.py with a watermark-flush
    sentinel, since outer NULLs only emit on event-time progress."""
    from mapreducefw_spark.streaming.joins import view_click_join_outer

    ev = t(spark, sf_dir, "events")
    return view_click_join_outer(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "click"),
        within="30 minutes",
    ).orderBy("view_id", "click_id")


@register(
    "view_click_attribution_full",
    oracle="""
SELECT v.event_id AS view_id, c.event_id AS click_id,
       COALESCE(v.user_id, c.user_id) AS user_id
FROM (SELECT * FROM events WHERE event_type = 'view') v
FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON v.user_id = c.user_id
 AND c.ts > v.ts
 AND c.ts <= v.ts + INTERVAL 30 MINUTES
ORDER BY view_id, click_id
""",
)
def view_click_attribution_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the FULL OUTER stream-stream join
    (streaming/joins.py::view_click_join_full_outer): converted pairs,
    never-converted views (NULL click_id) AND unattributed clicks (NULL
    view_id — the direct-navigation leg the left-outer form drops) in one
    result — the complete attribution ledger. Stream == batch pinned in
    tests/test_streaming_advanced.py via the watermark-flush sentinel."""
    from mapreducefw_spark.streaming.joins import view_click_join_full_outer

    ev = t(spark, sf_dir, "events")
    return view_click_join_full_outer(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "click"),
        within="30 minutes",
    ).orderBy("view_id", "click_id")


@register(
    "time_rollup_multigrain",
    oracle="""
SELECT grain, STRFTIME(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_start, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM (
  SELECT 'hour' AS grain, date_trunc('hour', ts) AS bucket, event_type, value FROM events
  UNION ALL
  SELECT 'day' AS grain, date_trunc('day', ts) AS bucket, event_type, value FROM events
  UNION ALL
  SELECT 'week' AS grain, date_trunc('week', ts) AS bucket, event_type, value FROM events
)
GROUP BY grain, bucket, event_type
ORDER BY grain, bucket_start, event_type
""",
)
def time_rollup_multigrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: one scan, three time
    granularities (hour/day/week) via an exploded grain array — at 100 TB the
    coarser grains reuse the same shuffle instead of re-scanning."""
    ev = t(spark, sf_dir, "events")
    grains = F.array(
        *[
            F.struct(F.lit(g).alias("grain"), F.date_trunc(g, "ts").alias("bucket"))
            for g in ["hour", "day", "week"]
        ]
    )
    return (
        ev.select(F.explode(grains).alias("g"), "event_type", "value")
        .groupBy(
            F.col("g.grain").alias("grain"),
            F.col("g.bucket").alias("bucket"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(
            "grain",
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("grain", "bucket_start", "event_type")
    )


@register(
    "asof_join_latest_order",
    oracle="""
WITH ord AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
  GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id,
       STRFTIME(e.ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
       o.o_orderkey AS last_orderkey,
       STRFTIME(o.o_orderdate, '%Y-%m-%d') AS last_orderdate
FROM events e ASOF JOIN ord o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
ORDER BY e.event_id
""",
)
def asof_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native one): union both sides tagged, one
    window pass per key carries the latest order forward, keep event rows.
    One shuffle on the join key, no per-row lookups — scales linearly."""
    ev = t(spark, sf_dir, "events").select(
        "event_id", F.col("user_id").alias("key"), F.col("ts").alias("etime")
    )
    # orders with a NULL custkey or NULL date are excluded BOTH sides: a
    # dateless order has no as-of position (and would sort NULLS FIRST
    # into the carry window on the Spark side only), and SQL's ASOF equi
    # key never matches NULL
    ord_ = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull())
        .groupBy(F.col("o_custkey").alias("key"), "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    events_tagged = ev.select(
        "key",
        F.col("etime").alias("time"),
        F.lit(1).alias("is_event"),
        "event_id",
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
    )
    orders_tagged = ord_.select(
        "key",
        F.col("o_orderdate").alias("time"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("bigint").alias("event_id"),
        "o_orderkey",
        "o_orderdate",
    )
    # Orders sort before events at the same timestamp (is_event asc) => ties
    # count as "order at or before event", matching ASOF's ts >= o_orderdate.
    w = (
        W.partitionBy("key")
        .orderBy("time", "is_event", "o_orderdate")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = events_tagged.unionByName(orders_tagged).select(
        "key",
        "time",
        "is_event",
        "event_id",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("last_orderkey"),
        F.last("o_orderdate", ignorenulls=True).over(w).alias("last_orderdate"),
    )
    return (
        merged.filter((F.col("is_event") == 1) & F.col("last_orderkey").isNotNull())
        .select(
            "event_id",
            F.col("key").alias("user_id"),
            F.date_format("time", "yyyy-MM-dd HH:mm:ss").alias("event_ts"),
            "last_orderkey",
            F.date_format("last_orderdate", "yyyy-MM-dd").alias("last_orderdate"),
        )
        .orderBy("event_id")
    )


@register(
    "funnel_view_click_purchase",
    oracle="""
WITH ev AS (SELECT * FROM events WHERE user_id IS NOT NULL),
s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM ev WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM ev e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM ev e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM s1) AS users_view,
       (SELECT COUNT(*) FROM s2) AS users_click,
       (SELECT COUNT(*) FROM s3) AS users_purchase,
       ROUND((SELECT COUNT(*) FROM s2) * 1.0 / greatest((SELECT COUNT(*) FROM s1), 1), 6)
           AS view_to_click,
       ROUND((SELECT COUNT(*) FROM s3) * 1.0 / greatest((SELECT COUNT(*) FROM s2), 1), 6)
           AS click_to_purchase
""",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel (the MATCH_RECOGNIZE workload): how many
    users did view -> click -> purchase in STRICT event-time order (each
    stage strictly after the accepted previous stage's timestamp)?

    Spark side is ONE scan + one shuffle: events collapse to a per-user
    time-sorted struct array, and an F.aggregate fold walks it with a
    (stage, last_ts) accumulator — the fold touches each user's handful of
    events, the 'small fixed array' case where higher-order expressions are
    the right tool (contrast similarity.assign_cells_vectorized). The
    staged-CTE oracle (min-t1 -> min qualifying t2 -> min qualifying t3) is
    provably the same semantics: a sorted-order fold accepts the minimal
    qualifying timestamp per stage. Strict inequality makes same-timestamp
    stage pairs NOT count, identically in both engines."""
    from mapreducefw_spark.operators.funnel import funnel_stage_per_user

    # anonymous (NULL-user) events excluded BOTH sides: the fold's groupBy
    # would advance a NULL-user group past stage 1 while the oracle's
    # staged equi-joins drop NULL keys after s1 — a real divergence the
    # round-6 review confirmed by execution (same policy as
    # funnel_staged_minjoin)
    ev = t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    staged = funnel_stage_per_user(ev, ["view", "click", "purchase"])
    # coalesce: empty events must yield (0, 0, 0, 0.0, 0.0) like the
    # oracle's scalar COUNT subqueries, not a row of NULL sums
    return staged.agg(
        F.coalesce(
            F.sum(F.when(F.col("stage") >= 1, 1).otherwise(0)), F.lit(0)
        ).alias("users_view"),
        F.coalesce(
            F.sum(F.when(F.col("stage") >= 2, 1).otherwise(0)), F.lit(0)
        ).alias("users_click"),
        F.coalesce(
            F.sum(F.when(F.col("stage") >= 3, 1).otherwise(0)), F.lit(0)
        ).alias("users_purchase"),
    ).select(
        "users_view",
        "users_click",
        "users_purchase",
        F.round(
            F.col("users_click") * 1.0 / F.greatest(F.col("users_view"), F.lit(1)), 6
        ).alias("view_to_click"),
        F.round(
            F.col("users_purchase") * 1.0 / F.greatest(F.col("users_click"), F.lit(1)), 6
        ).alias("click_to_purchase"),
    )


@register(
    "cohort_retention",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
),
first AS (
  SELECT user_id, MIN(d) AS f FROM days GROUP BY user_id
)
SELECT STRFTIME(first.f, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', first.f, days.d) AS BIGINT) AS day_offset,
       CAST(COUNT(DISTINCT days.user_id) AS BIGINT) AS n_users
FROM days JOIN first USING (user_id)
GROUP BY first.f, day_offset
ORDER BY cohort_day, day_offset
""",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active day, counted
    on each subsequent day they return — THE product-analytics table.
    Shape: one (user, day) dedup aggregation, a per-user min, one join back
    (both sides user-keyed — co-partitioned, no extra exchange), and the
    final (cohort, offset) count-distinct. Day boundaries are UTC calendar
    days in both engines, exact integers throughout."""
    ev = t(spark, sf_dir, "events")
    days = ev.select("user_id", F.date_trunc("day", "ts").alias("d")).distinct()
    first = days.groupBy("user_id").agg(F.min("d").alias("f"))
    return (
        days.join(first, "user_id")
        .groupBy(
            F.date_format("f", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("d", "f").cast("bigint").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )
