"""Cross-engine ANSI-SQL parity: the oracle TEXTS themselves run through
``spark.sql`` over temp views and must match DuckDB bit-for-bit.

The driver contract proves the DataFrame queries match their oracles; this
suite proves the pure-SQL API surface (a user submitting the same ANSI text
to both engines) agrees too — 80 of the registry's oracle strings execute
unmodified on both engines with identical results. Excluded oracles use
genuine dialect-specific surface (DuckDB ``unnest``/``list()``/``sha256``/
``string_split``, regex-class dialects), not semantic divergence.

This doubles as a dialect-drift tripwire: an oracle edit that silently
leaves ANSI (breaking future Spark-side reuse) fails here first.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mapreducefw_spark.queries import ORACLES, load_all
from mapreducefw_spark.sources.tables import TABLES, table

load_all()

# Every oracle text verified to run unmodified through spark.sql AND match
# DuckDB exactly at sf0.001 (empirically determined; keep sorted).
ANSI_PARITY = [
    "agg_supplier_stats",
    "basket_part_pairs",
    "cdc_apply_changelog",
    "conditional_aggregates",
    "count_distinct_parts",
    "cube_lineitem_flags",
    "dedup_exact",
    "edit_distance_pairs_symspell",
    "edit_distance_part_pairs",
    "dedup_exact_keyed",
    "distinct_segments",
    "event_transition_matrix",
    "events_zscore_anomalies",
    "except_all_nations",
    "filter_predicates",
    "funnel_view_click_purchase",
    "grouping_sets_explicit",
    "incremental_agg_maintenance",
    "intersect_all_quantities",
    "intersect_nations",
    "interval_join_events",
    "join_anti_orderless_customers",
    "join_broadcast_nation_region",
    "join_full_outer_nation_presence",
    "join_left_outer_order_counts",
    "join_range_theta",
    "join_right_outer_parts",
    "join_semi_big_spenders",
    "lateral_topn_orders",
    "math_conditional",
    "null_combinators",
    "nullsafe_join_counts",
    "ols_price_size_by_brand",
    "pagerank_copurchase",
    "percentile_disc_prices",
    "pivot_flag_status",
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q4_priority_exists",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "q10_returned_revenue",
    "q11_important_stock",
    "q12_priority_by_returnflag",
    "q13_order_count_distribution",
    "q14_promo_share",
    "q15_top_supplier",
    "q16_supplier_count_by_part",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_pushdown",
    "q20_dominant_blue_suppliers",
    "q21_sole_late_supplier",
    "q22_global_sales_opportunity",
    "robust_outliers_mad",
    "rollup_order_priority",
    "salted_skew_aggregate",
    "sessionization_30m",
    "skew_join_events_orders",
    "sort_multikey_nulls",
    "stats_corr_qty_price",
    "subquery_above_avg_orders",
    "subquery_correlated_max",
    "topk_orders_global",
    "topk_parts_per_brand",
    "union_all_segments",
    "unpivot_supplier_metrics",
    "view_click_attribution",
    "view_click_attribution_outer",
    "window_distribution_fns",
    "window_frames_running",
    "window_lag_lead_orders",
    "window_nth_last_value",
    "window_range_frame",
    "window_rank_customers",
    "winsorized_price_stats",
    "yoy_revenue_growth",
    # round 6
    "funnel_staged_minjoin",
    "recursive_cte_reachability",
]


@pytest.fixture(scope="module")
def engines(spark, sf_dir):
    for tn in TABLES:
        table(spark, sf_dir, tn).createOrReplaceTempView(tn)
    con = duckdb.connect()
    for tn in TABLES:
        con.execute(f"CREATE VIEW {tn} AS SELECT * FROM '{sf_dir}/{tn}.parquet'")
    return spark, con


def _key(row):
    # NULL-safe total order over heterogeneous cells
    return tuple((v is None, str(type(v)), v if v is not None else 0) for v in row)


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


@pytest.mark.parametrize("name", ANSI_PARITY)
def test_oracle_text_runs_identically_on_spark_sql(engines, name):
    spark, con = engines
    sql = ORACLES[name]
    srows = sorted(
        (tuple(_norm(v) for v in r) for r in spark.sql(sql).collect()), key=_key
    )
    drows = sorted(
        (tuple(_norm(v) for v in r) for r in con.execute(sql).fetchall()), key=_key
    )
    assert srows == drows, f"{name}: spark.sql vs duckdb mismatch"
