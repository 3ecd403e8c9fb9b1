"""Differential NULL/edge robustness for the part/orders/lineitem queries
added in the round-5 continued session (linkage, regression, winsorize,
histogram, PageRank, entity resolution, YoY).

Same contract as the documents/events edge suites: the driver regenerates
fixtures between rounds, and today's fixtures contain no NULL names, NULL
prices, NULL dates, duplicate names, or degenerate one-value groups — so
per-round oracle checks can't prove the queries survive them. This table
set is ALL edge cases, diffed Spark-vs-DuckDB exactly like the driver
would. The NULL-sort divergence class (Spark windows default NULLS FIRST,
DuckDB NULLS LAST) is handled in the queries by excluding NULL measures
from rank frames on BOTH sides.
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
    "edit_distance_part_pairs",
    "edit_distance_pairs_symspell",
    "entity_resolution_clusters",
    "ols_price_size_by_brand",
    "equi_depth_histogram",
    "pagerank_copurchase",
    "copurchase_triangles",
    "pareto_orders_skyline",
    "winsorized_price_stats",
    "yoy_revenue_growth",
    # round 6: recursive BFS over the same NULL/dup-tolerant edge build
    "recursive_cte_reachability",
    # round 7: NULL totalprice/date pass through both union sides; the
    # NAME-resolved fill column stays NULL-distinguishable from them
    "union_by_name_evolution",
    # NULL totalprice rows drop out of min/max AND the binning identically
    "fixed_width_histogram",
]

PART_ROWS = [
    # (p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)
    (1, None, "B1", "t", 1, 10.0),           # NULL name
    (2, "", "B1", "t", 1, 11.0),             # empty name
    (3, "a", "B1", "t", 2, 12.0),            # 1-char (dist 1 to empty)
    (4, "ab", "B2", "t", 3, None),           # NULL price feeds OLS sums
    (5, "red gear", "B2", "t", 4, 14.0),
    (6, "red gear", "B2", "t", 5, 15.0),     # exact duplicate name
    (7, "ted gear", "B3", "t", 6, 16.0),     # dist 1 from red gear
    (8, "red bear", "B3", "t", 7, 17.0),     # dist 2 from red gear
    (9, "blue widget", "B3", "t", 8, 18.0),  # isolated node
    (10, "ab", "B4", "t", 9, 19.0),          # duplicate of key 4's name
    (11, "zz top", "B5", "t", 3, 20.0),      # single-row brand B5... with
    (12, "zz tap", "B5", "t", 3, 21.0),      # same size -> OLS denom 0
]

ORDER_ROWS = [
    # (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
    (1, 1, "O", 100.0, datetime(2023, 1, 5), "1-URGENT"),
    (2, 1, "O", None, datetime(2023, 2, 5), "1-URGENT"),   # NULL price
    (3, 2, "F", 300.0, None, "1-URGENT"),                  # NULL date
    (4, 2, "F", 250.0, datetime(2024, 3, 1), "1-URGENT"),
    (5, 3, "O", 50.0, datetime(2024, 6, 1), "5-LOW"),      # single-year priority
    (6, 3, "O", 100.0, datetime(2023, 6, 1), "3-MEDIUM"),
    (7, 4, "O", 100.0, datetime(2024, 6, 1), "3-MEDIUM"),  # flat YoY (0 growth)
]

LINE_ROWS = [
    # (l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
    #  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate)
    (1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", datetime(2023, 1, 10)),
    (1, 2, 1, 2, 1.0, None, 0.0, 0.0, "N", "O", datetime(2023, 1, 10)),  # NULL price
    (1, 3, 1, 3, 1.0, 10.0, 0.0, 0.0, "N", "O", datetime(2023, 1, 10)),  # dup price
    (2, 2, 1, 1, 1.0, 30.0, 0.0, 0.0, "R", "F", datetime(2023, 2, 10)),
    (2, 3, 1, 2, 1.0, 40.0, 0.0, 0.0, "R", "F", datetime(2023, 2, 10)),
    (3, 4, 1, 1, 1.0, 50.0, 0.0, 0.0, "A", "F", datetime(2023, 3, 10)),  # lone part
    (4, 1, 1, 1, 1.0, 60.0, 0.0, 0.0, "N", "O", datetime(2023, 4, 10)),
    (4, 2, 1, 2, 1.0, 70.0, 0.0, 0.0, "N", "O", datetime(2023, 4, 10)),
    (4, 3, 1, 3, 1.0, 80.0, 0.0, 0.0, "N", "O", datetime(2023, 4, 10)),
]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_rel")
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([r[0] for r in PART_ROWS], pa.int64()),
                "p_name": pa.array([r[1] for r in PART_ROWS], pa.string()),
                "p_brand": pa.array([r[2] for r in PART_ROWS], pa.string()),
                "p_type": pa.array([r[3] for r in PART_ROWS], pa.string()),
                "p_size": pa.array([r[4] for r in PART_ROWS], pa.int32()),
                "p_retailprice": pa.array([r[5] for r in PART_ROWS], pa.float64()),
            }
        ),
        str(d / "part.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in ORDER_ROWS], pa.int64()),
                "o_custkey": pa.array([r[1] for r in ORDER_ROWS], pa.int64()),
                "o_orderstatus": pa.array([r[2] for r in ORDER_ROWS], pa.string()),
                "o_totalprice": pa.array([r[3] for r in ORDER_ROWS], pa.float64()),
                "o_orderdate": pa.array([r[4] for r in ORDER_ROWS], pa.timestamp("us")),
                "o_orderpriority": pa.array([r[5] for r in ORDER_ROWS], pa.string()),
            }
        ),
        str(d / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in LINE_ROWS], pa.int64()),
                "l_partkey": pa.array([r[1] for r in LINE_ROWS], pa.int64()),
                "l_suppkey": pa.array([r[2] for r in LINE_ROWS], pa.int64()),
                "l_linenumber": pa.array([r[3] for r in LINE_ROWS], pa.int32()),
                "l_quantity": pa.array([r[4] for r in LINE_ROWS], pa.float64()),
                "l_extendedprice": pa.array([r[5] for r in LINE_ROWS], pa.float64()),
                "l_discount": pa.array([r[6] for r in LINE_ROWS], pa.float64()),
                "l_tax": pa.array([r[7] for r in LINE_ROWS], pa.float64()),
                "l_returnflag": pa.array([r[8] for r in LINE_ROWS], pa.string()),
                "l_linestatus": pa.array([r[9] for r in LINE_ROWS], pa.string()),
                "l_shipdate": pa.array([r[10] for r in LINE_ROWS], pa.timestamp("us")),
            }
        ),
        str(d / "lineitem.parquet"),
    )
    return str(d)





@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_relational_match_oracle(spark, edge_dir, name):
    from tests._edge_compare import assert_query_matches_oracle

    con = duckdb.connect()
    for tbl in ("part", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{edge_dir}/{tbl}.parquet'")
    assert_query_matches_oracle(QUERIES[name](spark, edge_dir), con, ORACLES[name])


def test_winsorized_null_price_not_injected(spark, edge_dir):
    """Ground-truth pin (parity alone can't catch a symmetric bug): a NULL
    o_totalprice must NOT clip to a boundary value. least/greatest SKIP
    NULL args in both Spark and DuckDB, so an unguarded clip turns
    NULL -> hi and inflates sum/max — both engines agreeing on the wrong
    statistic. 1-URGENT has orders 100, NULL, 300, 250: sum_clipped must
    be 650 (the unguarded form would say 950)."""
    rows = {
        r.o_orderpriority: r
        for r in QUERIES["winsorized_price_stats"](spark, edge_dir).collect()
    }
    u = rows["1-URGENT"]
    assert u.n_orders == 4
    assert u.sum_clipped == pytest.approx(650.0)
    assert u.max_clipped == pytest.approx(300.0)
    assert u.min_clipped == pytest.approx(100.0)
