"""Differential NULL/edge robustness for the events-table queries.

Companion to tests/test_oracle_nulls.py: the driver regenerates the events
fixture between rounds (its ts STORAGE type already changed once, breaking
nothing only because the loader normalizes vintages). This suite writes an
all-edge events table via pyarrow as TIMESTAMP_NTZ — the current fixture
vintage — with NULL user ids/values/props, malformed JSON, exact
window-boundary timestamps, duplicate (user, ts) pairs and single-event
users, then diffs each events query against its registered DuckDB oracle.
"""

from __future__ import annotations

from datetime import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mapreducefw_spark.queries import ORACLES, QUERIES, load_all

load_all()

EDGE_QUERIES = [
    "events_tumbling_1h",
    "events_sliding_1h_30m",
    "sessionization_30m",
    "session_window_batch",
    "interval_join_events",
    "time_rollup_multigrain",
    "events_zscore_anomalies",
    "json_extract_events",
    # round-5 continued-session additions (NULL user_id rows matter: funnel
    # and cohort group NULL users; attribution joins drop them)
    "funnel_view_click_purchase",
    "cohort_retention",
    "purchase_touch_attribution",
    "view_click_attribution_outer",
    # pipeline8-11 events queries (NULL value rows feed the gap-fill
    # aggregate and MAD filter; NULL users their own transition partition;
    # malformed JSON the variant path; the 30-min hole splits paths)
    "events_gap_fill_hourly",
    "event_transition_matrix",
    "session_paths_top",
    "robust_outliers_mad",
    "events_props_variant",
    "rolling_weekly_active_users",
    "ohlc_hourly_bars",
    # round-6 additions (NULL users: staged funnel filters them both
    # sides; debounce partitions them; decay attribution drops them via
    # the join; NULL value feeds the decay credit's coalesce)
    "funnel_staged_minjoin",
    "debounce_consecutive_events",
    "attribution_time_decay",
    "view_click_attribution_full",
    "group_aware_split",
    "approx_topk_event_types",
    # round-6 sweep: every remaining events-reading oracle query (the
    # fixture also writes an edge orders table for the join forms)
    "view_click_attribution",
    "asof_join_latest_order",
    "asof_tolerance_join",
    "skew_join_events_orders",
    "from_json_struct",
    "to_json_roundtrip",
    # round 7 (NULL user_id must fall out of the bitmap exactly as
    # COUNT(DISTINCT) drops it; NULL event_type is its own bitmap group
    # but is excluded from PMI presence sets on both sides)
    "bitmap_exact_distinct",
    "event_pair_pmi",
    # round-7 batch 2 (NULL ts/user/value excluded from the TWAP time axis
    # identically both sides; NULL users form one session chain; dup
    # (user, ts) pairs tie-break on event_id in both windows)
    "twap_user_daily",
    "session_conversion_bounce",
    # NULL ts/type rows leave the lag chain identically both sides
    "transition_entropy_by_type",
    # XML roundtrip must survive the quote/backslash event_type and the
    # quoted-k props rows (entity escaping + the json k contract)
    "xml_roundtrip",
    # NULL props COALESCE to '' (0 runs, NULL first_run) both sides
    "regexp_functions_35",
    # NULL ts/type rows leave the contingency table identically both sides
    "chi_square_independence",
    # round 8: Cramér's V shares the chi2 contingency; a single-type edge
    # table would make min(r-1,c-1)=0 -> NaN identically both engines
    "cramers_v_type_dow",
    # round 8 batch 4: single-day users are 1-day islands; purchases with
    # no preceding view drop from the latency set identically; zero
    # conversions degrade to the oracle's single NULL-percentile row
    "activity_islands_per_user", "conversion_time_percentiles",
    # round 8 batch 5/6: MI shares the chi2/cramers contingency grid (its
    # NaN corner matches via the same marginals); the purchase-hour
    # interpolation spine covers the single-purchase (lo==hi) corner and
    # NULL-value hours (rev NULL -> interpolated both sides)
    "mutual_information_type_dow", "linear_interpolation_gaps",
    # round 8 batch 7: dup (user, ts) rows exercise the (ts, event_id)
    # lag tiebreak; single-event streams contribute no gaps; zero gaps
    # (same-ts pairs) enter the discrete percentiles
    "interarrival_gap_stats",
    # round 8 batch 8: NULL user/ts rows leave the first-seen exchange
    # identically; all users sharing one first day collapse to one
    # growth-curve row
    "user_growth_curve",
    # round 8 batch 11: dup (user, ts) rows exercise the session-rule
    # (ts, event_id) tiebreak; single-type sessions emit no rules
    "session_rule_lift",
]


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


ROWS = [
    # event_id, ts, user_id, event_type, value, props
    (1, _ts("2024-03-01 00:00:00"), 1, "click", 1.0, '{"page": "a", "ms": 10}'),
    (2, _ts("2024-03-01 00:59:59.999999"), 1, "click", 2.0, '{"page": "b", "ms": 20}'),
    (3, _ts("2024-03-01 01:00:00"), 1, "view", 3.0, None),  # window boundary + NULL props
    (4, _ts("2024-03-01 01:00:00"), 2, "view", None, "not json at all"),  # NULL value + bad JSON
    (5, _ts("2024-03-01 01:00:00"), 2, "view", 5.0, '{"page": null}'),  # dup (user, ts)
    (6, _ts("2024-03-01 01:04:59"), 2, "click", -1.0, "{}"),
    (7, _ts("2024-03-01 01:05:00"), 2, "click", 0.0, '{"ms": "7"}'),  # 5-min bin edge
    (8, _ts("2024-03-01 02:30:00"), None, "click", 8.0, '{"page": "c"}'),  # NULL user
    (9, _ts("2024-03-01 02:35:00"), None, "view", 9.0, None),  # second NULL user
    (10, _ts("2024-03-01 05:00:00"), 3, "purchase", 100.0, '{"ms": 1}'),  # lone event
    (11, _ts("2024-03-02 00:00:00"), 1, "click", 11.0, '{"page": "d"}'),  # next day
    (12, _ts("2024-03-02 00:29:59"), 1, "click", 12.0, None),  # 30-min session edge
    (13, _ts("2024-03-02 00:30:00"), 1, "click", 13.0, None),  # exactly gap-sized hole
    # round 6: NULL ts (a corrupt/unparseable event time) and NULL type
    (14, None, 4, "view", 14.0, None),
    (15, _ts("2024-03-02 01:00:00"), 4, None, 15.0, "{}"),
    # NULL-user click AFTER the NULL-user view at 02:35 — the sequence
    # that diverged pre-fix (fold advanced the NULL group to stage 2,
    # the oracle's equi-joins dropped it after s1)
    (16, _ts("2024-03-01 02:40:00"), None, "click", 16.0, "{}"),
    (17, _ts("2024-03-01 06:00:00"), 5, "view", 17.0, '{"k": -42, "page": "z"}'),
    # round-6 review: non-integral k (strict-int parse must NULL, not
    # prefix-match '1'), and a quote+backslash event_type (to_json escapes)
    (18, _ts("2024-03-01 06:30:00"), 5, "view", 18.0, '{"k": 1.5}'),
    (19, _ts("2024-03-01 07:00:00"), 5, 'say "hi" \\ bye', 19.0, '{"k": 7}'),
    # round-7 (ADVICE r6): QUOTED integrals. get_json_object+try_cast and
    # the variant string route read "7"/" 7" as 7; from_json('k int')'s
    # typed parse NULLs them; quoted "1.5" is NULL everywhere. Each oracle
    # now states which contract it mirrors — these rows make the gap
    # non-latent.
    (20, _ts("2024-03-01 07:30:00"), 5, "view", 20.0, '{"k": "7"}'),
    (21, _ts("2024-03-01 08:00:00"), 5, "view", 21.0, '{"k": " 7", "page": "q"}'),
    (22, _ts("2024-03-01 08:30:00"), 5, "view", 22.0, '{"k": "1.5"}'),
]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_events")
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            # timestamp[us] with no tz -> parquet TIMESTAMP_NTZ, the current
            # fixture vintage (exercises the loader's UTC-cast branch)
            "ts": pa.array([r[1] for r in ROWS], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS], pa.string()),
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
            "props": pa.array([r[5] for r in ROWS], pa.string()),
        }
    )
    pq.write_table(tbl, str(d / "events.parquet"))
    # edge orders for the events x orders join queries: NULL custkey,
    # NULL orderdate, duplicate (custkey, date) pairs, a date after every
    # event, and a customer matching the NULL-user events (never joins)
    ord_rows = [
        # (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
        (1, 1, "O", 10.0, _ts("2024-02-25 00:00:00"), "1-URGENT"),
        (2, 1, "O", 20.0, _ts("2024-02-25 00:00:00"), "1-URGENT"),  # dup (cust, date)
        (3, 2, "F", 30.0, None, "5-LOW"),                           # NULL date
        (4, None, "F", 40.0, _ts("2024-02-20 00:00:00"), "5-LOW"),  # NULL cust
        (5, 3, "O", 50.0, _ts("2024-01-01 00:00:00"), "3-MEDIUM"),  # >30d stale
        (6, 2, "O", 60.0, _ts("2024-12-31 00:00:00"), "3-MEDIUM"),  # after all events
    ]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in ord_rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in ord_rows], pa.int64()),
                "o_orderstatus": pa.array([r[2] for r in ord_rows], pa.string()),
                "o_totalprice": pa.array([r[3] for r in ord_rows], pa.float64()),
                "o_orderdate": pa.array([r[4] for r in ord_rows], pa.timestamp("us")),
                "o_orderpriority": pa.array([r[5] for r in ord_rows], pa.string()),
            }
        ),
        str(d / "orders.parquet"),
    )
    return str(d)




@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_events_match_oracle(spark, edge_dir, name):
    from tests._edge_compare import assert_query_matches_oracle

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{edge_dir}/events.parquet'"
    )
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{edge_dir}/orders.parquet'"
    )
    assert_query_matches_oracle(QUERIES[name](spark, edge_dir), con, ORACLES[name])
