"""Differential NULL/edge robustness across the WHOLE TPC-H relational
surface: every oracle-paired query that reads only the seven star-schema
tables and is not already covered by a sibling edge suite (84 queries).

All seven tables are rebuilt as edge fixtures: NULL keys, NULL names,
NULL measures, NULL dates, dangling foreign keys, duplicate names,
duplicate measure values (window ties), negative balances, empty strings,
and a few rows that DO satisfy the queries' literal predicates (PROMO
types, BUILDING segment, R return flags, 1994 ship dates) so filters
exercise both branches. Spark vs DuckDB, exact compare — the same check
the driver runs, on data the driver's generated fixtures don't contain.
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
    "agg_supplier_stats", "analyze_column_stats", "array_agg_order_parts",
    "basket_part_pairs", "catalog_input_file_name", "conditional_aggregates",
    "count_distinct_parts", "cube_lineitem_flags", "data_quality_report",
    "date_functions", "deterministic_sample_pct", "distinct_segments",
    "except_all_nations", "filter_predicates", "grouping_sets_explicit",
    "incremental_agg_maintenance", "intersect_all_quantities",
    "intersect_nations", "join_anti_orderless_customers",
    "join_broadcast_nation_region", "join_full_outer_nation_presence",
    "join_left_outer_order_counts", "join_range_theta",
    "join_right_outer_parts", "join_semi_big_spenders", "key_skew_report",
    "lateral_topn_orders", "map_column_functions", "map_higher_order",
    "math_conditional", "median_exact_prices", "mr_search",
    "null_combinators", "nullsafe_join_counts", "pandas_scalar_udf_margin",
    "pandas_udaf_geomean", "percentile_disc_prices", "pivot_flag_status",
    "projection_rekey", "q10_returned_revenue", "q11_important_stock",
    "q12_priority_by_returnflag", "q13_order_count_distribution",
    "q14_promo_share", "q15_top_supplier", "q16_supplier_count_by_part",
    "q17_small_quantity_revenue", "q18_large_orders",
    "q19_disjunctive_pushdown", "q1_pricing_summary",
    "q20_dominant_blue_suppliers", "q21_sole_late_supplier",
    "q22_global_sales_opportunity", "q2_min_cost_supplier",
    "q3_top_revenue_orders", "q4_priority_exists", "q5_region_revenue",
    "q6_forecast_revenue", "q7_nation_volume", "q8_market_share",
    "q9_profit_by_nation_year", "rfm_segmentation", "rollup_order_priority",
    "salted_skew_aggregate", "scd2_merge_emulation", "sort_multikey_nulls",
    "stats_corr_qty_price", "string_agg_nation_names", "string_functions",
    "string_functions_2", "subquery_above_avg_orders",
    "subquery_correlated_max", "topk_orders_global", "topk_parts_per_brand",
    "union_all_segments", "unpivot_supplier_metrics",
    "window_distribution_fns", "window_frames_running",
    "window_global_rank", "window_global_rank_scalable",
    "window_lag_lead_orders", "window_nth_last_value", "window_range_frame",
    "window_rank_customers",
    # round 7: mask over NULL/empty names identically NULL/'' both sides;
    # array mutators over single-item and duplicate-part orders
    "mask_pii_columns", "array_mutators_35", "fixed_width_histogram",
    "bit_aggregates",
    # zero-spend (orderless) + NULL-price customers enter the Gini ranking
    "gini_customer_spend",
    # NULL dates drop out of the day grid; NULL/sub-1 prices out of Benford
    "acf_daily_revenue", "benford_first_digit",
    # round 8: tie-heavy tiny columns stress Spearman's average ranks;
    # NULL-price days ride the EWMA/DW/seasonal day grids as NULL x both
    # engines; mode ties break (n desc, priority NULLS LAST) — pinned
    "spearman_rho_qty_price", "ewma_daily_revenue", "durbin_watson_daily",
    "mode_deterministic_priority", "seasonal_index_dow",
    # round 8 batch 3: NULL segment is its own encoding category; sparse
    # edge day grids exercise the empty/1-day corners of the trend,
    # changepoint and anomaly shapes; NULL prices/brands ride the band
    # join's decimal filter and NULL grouping
    "target_encoding_smoothed", "theil_sen_trend", "cusum_changepoint",
    "dow_adjusted_anomalies", "covariance_matrix_lineitem",
    "band_join_prices",
    # round 8 batch 4: NULL quasi-identifiers form their own k-anon
    # class; all-NULL sensitive column -> l_div 0 both engines; GROUP BY
    # ALL infers the same grouping set from the edge lineitem
    "k_anonymity_report", "sql_group_by_all",
    # round 8 batch 5/6: Kendall runs on the tiny tie-heavy grid (n1/n2
    # dominate); NULL price/quantity rows drop from the weighted-median
    # grid both sides; the edge orders table exercises Lorenz's sub-10-
    # customer deciles, the KM censor boundary, and the try_* NULL paths
    "kendall_tau_b", "weighted_median_price", "lorenz_curve_deciles",
    "kaplan_meier_retention", "try_arithmetic_functions",
    # round 8 batch 7: NULL region/nation names ride listagg's skip-NULL
    # aggregate contract (n_named counts what aggregated); the sparse
    # edge day grid leaves the 7-day MA window unfilled -> NULL
    # trend/seasonal/residual identically on both engines
    "listagg_within_group", "seasonal_decompose_daily",
    # round 8 batch 8: NULL order status drops from the pipe filter on
    # both engines (NULL <> 'F' is NULL); NULL custkeys are excluded
    # from the synthesized SCD2 dimension and NULL dates from the facts
    "sql_pipe_syntax", "scd2_point_in_time_join",
    # round 8 batch 11: single-order customers never convert (NULL
    # days_to_repeat both sides); same-day repeat orders rank via the
    # (date, orderkey) tiebreak
    "cohort_conversion_matrix",
    # round 8 batch 12: the sparse edge day grid exercises the runs
    # test's tiny-n corners (exactly-median days drop on both engines)
    "runs_test_daily",
    # round 9: the sparse tie-heavy edge day grid stresses MK's tie
    # correction (t(t-1)(2t+5) over duplicate revenues) and Pettitt's
    # midrank identity; NULL dates drop from the daily frames both sides
    "mann_kendall_trend",
    "pettitt_changepoint",
    # round 9: NULL dates/priorities drop from the dow grid; the edge
    # table's tiny urgent counts stress the 0-variance corner
    "cochran_armitage_trend",
]

_D = datetime


REGION = [  # (r_regionkey, r_name)
    (0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
    (4, "MIDDLE EAST"), (5, None),                       # NULL name
]

NATION = [  # (n_nationkey, n_name, n_regionkey)
    (0, "ALGERIA", 0), (1, "BRAZIL", 1), (2, "CHINA", 2),
    (3, "FRANCE", 3), (4, None, 3),                      # NULL name
    (5, "EGYPT", None),                                  # NULL region link
    (6, "DANGLING", 99),                                 # FK to nothing
]

CUSTOMER = [  # (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
    (1, "Customer#1", 0, 100.0, "BUILDING"),
    (2, "Customer#2", 1, -50.25, "AUTOMOBILE"),          # negative balance
    (3, None, 2, 0.0, "BUILDING"),                       # NULL name
    (4, "Customer#4", None, 75.5, None),                 # NULL nation + segment
    (5, "Customer#5", 3, None, "MACHINERY"),             # NULL balance
    (6, "Customer#5", 3, 75.5, "MACHINERY"),             # dup name + dup balance
    (7, "", 4, 200.0, "HOUSEHOLD"),                      # empty name
    (8, "Customer#8", 5, 300.0, "FURNITURE"),            # nation w/ NULL region
    (9, "Customer#9", 6, 300.0, "BUILDING"),             # dangling nation, tie bal
]

SUPPLIER = [  # (s_suppkey, s_name, s_nationkey, s_acctbal)
    (1, "Supplier#1", 0, 500.0),
    (2, "Supplier#2", 1, 500.0),                         # acctbal tie
    (3, None, 2, 10.0),                                  # NULL name
    (4, "Supplier#4", None, -10.0),                      # NULL nation, negative
    (5, "Supplier#5", 3, None),                          # NULL balance
    (6, "BRAZIL sup", 1, 20.0),
]

PART = [  # (p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)
    (1, "steel blue gear", "Brand#11", "PROMO POLISHED STEEL", 5, 100.0),
    (2, "misty rose bolt", "Brand#12", "STANDARD BRUSHED TIN", 10, 200.0),
    (3, None, "Brand#11", "PROMO ANODIZED NICKEL", 15, 300.0),  # NULL name
    (4, "navy blue widget", None, None, None, None),     # NULL brand/type/size/price
    (5, "", "Brand#13", "ECONOMY PLATED COPPER", 20, 50.0),  # empty name
    (6, "steel blue gear", "Brand#12", "PROMO POLISHED STEEL", 5, 100.0),  # dup
    (7, "blue", "Brand#11", "MEDIUM BLUE STUFF", 1, 10.0),
]

ORDERS = [  # (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
    (1, 1, "O", 100.0, _D(1994, 1, 5), "1-URGENT"),
    (2, 1, "F", 200.5, _D(1994, 6, 5), "2-HIGH"),
    (3, 2, "O", None, _D(1995, 2, 1), "1-URGENT"),       # NULL price
    (4, None, "F", 300.0, _D(1995, 3, 1), "5-LOW"),      # NULL custkey
    (5, 3, None, 400.0, None, "3-MEDIUM"),               # NULL status + date
    (6, 4, "O", 500.0, _D(1996, 7, 1), None),            # NULL priority
    (7, 5, "P", 100.0, _D(1994, 1, 5), "1-URGENT"),      # dup price + date
    (8, 8, "O", 600.0, _D(1997, 8, 1), "4-NOT SPECIFIED"),
    (9, 9, "O", 700.0, _D(1993, 9, 1), "2-HIGH"),
]

LINEITEM = [
    # (l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
    #  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate)
    (1, 1, 1, 1, 10.0, 100.0, 0.06, 0.02, "R", "F", _D(1994, 2, 1)),   # q6/q10 match
    (1, 2, 2, 2, 40.0, 400.0, 0.00, 0.00, "N", "O", _D(1994, 2, 2)),
    (2, 3, 3, 1, 5.0, 50.0, 0.05, 0.01, "A", "F", _D(1994, 7, 1)),
    (2, None, 1, 2, 1.0, 10.0, 0.10, 0.00, "R", "F", _D(1995, 1, 1)),  # NULL part
    (3, 4, None, 1, 2.0, 20.0, None, None, "N", "O", _D(1995, 3, 1)),  # NULL supp/disc/tax
    (4, 5, 4, 1, None, None, 0.02, 0.03, None, None, _D(1995, 4, 1)),  # NULL qty/price/flags
    (5, 6, 5, 1, 3.0, 30.0, 0.07, 0.04, "R", "F", None),               # NULL shipdate
    (7, 7, 6, 1, 23.0, 230.0, 0.06, 0.01, "R", "F", _D(1994, 3, 1)),   # q6 qty<24
    (8, 1, 1, 1, 10.0, 100.0, 0.06, 0.02, "R", "F", _D(1994, 2, 1)),   # exact dup values
    (9, 6, 2, 1, 7.0, 70.0, 0.01, 0.00, "N", "O", _D(1993, 10, 1)),
]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_tpch")
    def col(rows, i, typ):
        return pa.array([r[i] for r in rows], typ)

    pq.write_table(pa.table({
        "r_regionkey": col(REGION, 0, pa.int32()),
        "r_name": col(REGION, 1, pa.string()),
    }), str(d / "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": col(NATION, 0, pa.int32()),
        "n_name": col(NATION, 1, pa.string()),
        "n_regionkey": col(NATION, 2, pa.int32()),
    }), str(d / "nation.parquet"))
    pq.write_table(pa.table({
        "c_custkey": col(CUSTOMER, 0, pa.int64()),
        "c_name": col(CUSTOMER, 1, pa.string()),
        "c_nationkey": col(CUSTOMER, 2, pa.int32()),
        "c_acctbal": col(CUSTOMER, 3, pa.float64()),
        "c_mktsegment": col(CUSTOMER, 4, pa.string()),
    }), str(d / "customer.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": col(SUPPLIER, 0, pa.int64()),
        "s_name": col(SUPPLIER, 1, pa.string()),
        "s_nationkey": col(SUPPLIER, 2, pa.int32()),
        "s_acctbal": col(SUPPLIER, 3, pa.float64()),
    }), str(d / "supplier.parquet"))
    pq.write_table(pa.table({
        "p_partkey": col(PART, 0, pa.int64()),
        "p_name": col(PART, 1, pa.string()),
        "p_brand": col(PART, 2, pa.string()),
        "p_type": col(PART, 3, pa.string()),
        "p_size": col(PART, 4, pa.int32()),
        "p_retailprice": col(PART, 5, pa.float64()),
    }), str(d / "part.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": col(ORDERS, 0, pa.int64()),
        "o_custkey": col(ORDERS, 1, pa.int64()),
        "o_orderstatus": col(ORDERS, 2, pa.string()),
        "o_totalprice": col(ORDERS, 3, pa.float64()),
        "o_orderdate": col(ORDERS, 4, pa.timestamp("us")),
        "o_orderpriority": col(ORDERS, 5, pa.string()),
    }), str(d / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": col(LINEITEM, 0, pa.int64()),
        "l_partkey": col(LINEITEM, 1, pa.int64()),
        "l_suppkey": col(LINEITEM, 2, pa.int64()),
        "l_linenumber": col(LINEITEM, 3, pa.int32()),
        "l_quantity": col(LINEITEM, 4, pa.float64()),
        "l_extendedprice": col(LINEITEM, 5, pa.float64()),
        "l_discount": col(LINEITEM, 6, pa.float64()),
        "l_tax": col(LINEITEM, 7, pa.float64()),
        "l_returnflag": col(LINEITEM, 8, pa.string()),
        "l_linestatus": col(LINEITEM, 9, pa.string()),
        "l_shipdate": col(LINEITEM, 10, pa.timestamp("us")),
    }), str(d / "lineitem.parquet"))
    return str(d)


TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_tpch_match_oracle(spark, edge_dir, name):
    from tests._edge_compare import assert_query_matches_oracle

    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{edge_dir}/{tbl}.parquet'")
    assert_query_matches_oracle(QUERIES[name](spark, edge_dir), con, ORACLES[name])
