"""Ninth batch (round 5, continued session): graph + sequence analytics.

- ``pagerank_copurchase`` — 5 power-iterations of PageRank over the part
  co-purchase graph: the canonical ITERATIVE algorithm, expressed as
  join + groupBy per iteration with per-iteration lineage truncation.
- ``event_transition_matrix`` — first-order Markov transition counts and
  probabilities over per-user event sequences (next-event prediction
  table).
- ``session_paths_top`` — most frequent session paths (first five event
  types per 30-min-gap session): funnel discovery, the free-form cousin
  of the fixed-stage funnel.
- ``winsorized_price_stats`` — outlier clipping at exact global p05/p95
  computed on the two-phase rank (no global window), then exact-decimal
  aggregates of the clipped values.

Semantic contract with the reference engine: each phase is a
shuffle-group-reduce (``/root/reference/MRFCore.cpp:252-446``); the
PageRank loop is that shape iterated with the previous iteration's output
as the next map input — the classic chained-MapReduce formulation the
reference would run as repeated jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from mapreducefw_spark.operators.rank import global_rank_running
from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import dec, t

PR_ITERS = 5
PR_DAMP = 0.85
SESSION_GAP_MIN = 30
PATH_LEN = 5


def _pagerank_oracle() -> str:
    its = []
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        its.append(f"""
r{i} AS (
  SELECT nd.node,
         CAST(1 - {PR_DAMP} AS DOUBLE) / nn.n
           + CAST({PR_DAMP} AS DOUBLE) * COALESCE(s.acc, 0) AS pr
  FROM nodes nd CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS node, SUM(r.pr / dg.d) AS acc
    FROM edges e
    JOIN {prev} r ON e.src = r.node
    JOIN deg dg ON e.src = dg.src
    GROUP BY e.dst
  ) s USING (node)
)""")
        prev = f"r{i}"
    return f"""
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (SELECT node, CAST(1 AS DOUBLE) / nn.n AS pr FROM nodes CROSS JOIN nn),
{','.join(its)}
SELECT node AS part, ROUND(pr, 6) AS pagerank
FROM {prev}
ORDER BY pagerank DESC, part
LIMIT 100
"""


@register("pagerank_copurchase", oracle=_pagerank_oracle())
def pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (d=0.85, 5 power iterations) over the undirected part
    co-purchase graph (parts sharing an order), top 100 by rank.

    The iterative shape Spark-first: edges/degrees/node-count build ONCE
    and pin with localCheckpoint (reused by every iteration); each
    iteration is one edge-rank equi-join + groupBy(dst) + a node-frame
    left join, with ``localCheckpoint(eager=False)`` truncating lineage so
    the plan stays iteration-shaped instead of exponentially nested (at
    cluster scale the same slot is a reliable-storage checkpoint every few
    iterations). The 1-row node-count is a broadcast, never a driver-side
    scalar. Ranks are rounded to 6 places at output only — neighbor-sum
    summation order is engine-specific in the low bits; the 1e-6 grid is
    ~9 orders of magnitude coarser than the accumulated drift."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "k")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("pr")
    )
    # Rank and degree frames are node-cardinality; broadcasting them keeps
    # the edge frame in place (checkpointed once, never re-shuffled) and
    # cuts the per-iteration shuffle to the aggregated contributions —
    # node-sized, not edge-sized. (The planner can't pick this itself:
    # localCheckpoint erases size stats, so the iteration joins default to
    # shuffle; the SHUFFLE.md probe measured 185 MB for 5 iterations over a
    # 10.8 MB input before the hint.) Beyond broadcastable node counts the
    # textbook alternative is GraphX-style co-partitioning: edges hashed by
    # src once, ranks shuffled to the edge partitioning each round — still
    # node-sized per-iteration traffic.
    degb = F.broadcast(deg)
    for _ in range(PR_ITERS):
        contribs = (
            edges.join(F.broadcast(ranks.withColumnRenamed("node", "src")), "src")
            .join(degb, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("d")).alias("acc"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(nn))
            .join(contribs.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit(1 - PR_DAMP) / F.col("n")
                    + F.lit(PR_DAMP) * F.coalesce(F.col("acc"), F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        ranks.select(
            F.col("node").alias("part"), F.round("pr", 6).alias("pagerank")
        )
        .orderBy(F.col("pagerank").desc(), "part")
        .limit(100)
    )


@register(
    "event_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
),
trans AS (
  SELECT prev AS prev_type, event_type AS next_type, COUNT(*) AS n
  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT prev_type, CAST(SUM(n) AS BIGINT) AS st FROM trans GROUP BY 1)
SELECT tr.prev_type, tr.next_type,
       CAST(tr.n AS BIGINT) AS n_transitions,
       tr.n / tt.st AS prob
FROM trans tr JOIN tot tt USING (prev_type)
ORDER BY prev_type, next_type
""",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    P(next event type | current) — the next-event-prediction table.

    One user-partitioned lag window (the only raw-sized pass), then
    O(types^2) aggregation. The probability is one BIGINT/BIGINT IEEE
    division of identical operands on both engines — deterministic without
    rounding.

    NULL ts and NULL event_type rows are excluded on BOTH sides: a
    timeless event has no position in the lag chain (and NULL sort
    position differs across engines), and a typeless event is not a
    Markov state — lag() returning NULL must mean 'chain start', not
    'previous type unknown'."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    tot = trans.groupBy("prev_type").agg(F.sum("n_transitions").alias("st"))
    return (
        trans.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n_transitions",
            (F.col("n_transitions") / F.col("st")).alias("prob"),
        )
        .orderBy("prev_type", "next_type")
    )


@register(
    "session_paths_top",
    oracle=f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTES
              THEN 1 ELSE 0 END AS brk
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
islands AS (
  SELECT user_id, event_type, ts, event_id,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
),
paths AS (
  SELECT user_id, sid,
         array_to_string(
           list_slice(list(event_type ORDER BY ts, event_id), 1, {PATH_LEN}),
           '>') AS path
  FROM islands GROUP BY user_id, sid
)
SELECT path, COUNT(*) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 20
""",
)
def session_paths_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent session paths: the first {PATH_LEN} event types of each
    30-min-gap session joined with '>', counted across sessions, top 20 —
    free-form funnel discovery (which journeys actually happen) next to
    the fixed-stage funnel's conversion counting.

    Same session islands as sessionization_30m (microsecond-exact strict
    30-min gap, (ts, event_id) total order). The per-session event-type
    array is collected under a per-(user, session) grouping — bounded by
    session length, never a global window — and sorted by (ts, event_id)
    struct order so the path string is deterministic on both engines.
    NULL ts / NULL event_type rows are excluded both sides (no island
    position without a time; concat_ws silently SKIPS NULL array elements
    while DuckDB's array_to_string does not — filtering removes the
    divergence class at the source)."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    gap = micros - F.lag(micros).over(w)
    brk = F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60 * 1_000_000), 1).otherwise(0)
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    islands = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.sum(brk).over(run).alias("sid"),
    )
    paths = (
        islands.groupBy("user_id", "sid")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("evs")
        )
        .select(
            F.concat_ws(
                ">",
                F.slice(
                    F.transform("evs", lambda e: e["event_type"]), 1, PATH_LEN
                ),
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(20)
    )


@register(
    "winsorized_price_stats",
    oracle="""
WITH r AS (
  SELECT o_totalprice, o_orderpriority,
         ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER () AS n
  FROM orders WHERE o_totalprice IS NOT NULL
),
q AS (
  SELECT MAX(CASE WHEN rn = CAST(CEIL(0.05 * n) AS BIGINT)
             THEN o_totalprice END) AS lo,
         MAX(CASE WHEN rn = CAST(CEIL(0.95 * n) AS BIGINT)
             THEN o_totalprice END) AS hi
  FROM r
)
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       MIN(CASE WHEN o_totalprice IS NOT NULL
           THEN GREATEST(LEAST(o_totalprice, hi), lo) END) AS min_clipped,
       MAX(CASE WHEN o_totalprice IS NOT NULL
           THEN GREATEST(LEAST(o_totalprice, hi), lo) END) AS max_clipped,
       CAST(SUM(CASE WHEN o_totalprice IS NOT NULL
                THEN CAST(GREATEST(LEAST(o_totalprice, hi), lo)
                          AS DECIMAL(12,2)) END) AS DOUBLE) AS sum_clipped
FROM orders CROSS JOIN q
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (outlier clipping at exact global p05/p95) followed by
    exact-decimal per-priority aggregates — the robust-statistics
    preprocessing step for price-like columns.

    The exact discrete global quantiles come from the two-phase
    range-partition rank (operators/rank.py) — the value at rank
    ceil(p*N) — so NO unpartitioned window touches the fact table; the
    two boundary values collapse to a 1-row broadcast and the clip itself
    is map-only. (At production scale approx_percentile is the documented
    cheap path; exact-by-rank costs one range shuffle and stays
    driver-checkable.)"""
    orders = t(spark, sf_dir, "orders")
    # the quantile rank frame excludes NULL prices on BOTH sides (NULL sort
    # position differs across engines); NULL rows still count in n_orders
    # but their price stays NULL through the clip (least/greatest would
    # otherwise swallow the NULL and inject the p95 boundary), so the
    # min/max/sum aggregates skip them
    priced = orders.filter(F.col("o_totalprice").isNotNull())
    ranked = global_rank_running(
        priced.select("o_totalprice", "o_orderkey"),
        [F.col("o_totalprice"), F.col("o_orderkey")],
    )
    n = priced.agg(F.count(F.lit(1)).alias("_n"))
    q = (
        ranked.crossJoin(F.broadcast(n))
        .select(
            F.when(
                F.col("global_rank")
                == F.ceil(F.lit(0.05) * F.col("_n")).cast("long"),
                F.col("o_totalprice"),
            ).alias("_lo"),
            F.when(
                F.col("global_rank")
                == F.ceil(F.lit(0.95) * F.col("_n")).cast("long"),
                F.col("o_totalprice"),
            ).alias("_hi"),
        )
        .agg(F.max("_lo").alias("lo"), F.max("_hi").alias("hi"))
    )
    clipped = F.when(
        F.col("o_totalprice").isNotNull(),
        F.greatest(F.least(F.col("o_totalprice"), F.col("hi")), F.col("lo")),
    )
    return (
        orders.crossJoin(F.broadcast(q))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min(clipped).alias("min_clipped"),
            F.max(clipped).alias("max_clipped"),
            F.sum(dec(clipped)).cast("double").alias("sum_clipped"),
        )
        .orderBy("o_orderpriority")
    )
