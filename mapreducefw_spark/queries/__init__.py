"""Query registry: every operator from SURVEY.md §2 gets a named entry.

Each entry is a callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) an ANSI-SQL oracle string DuckDB runs on the same parquet
tables. The driver compares row count + schema + order-insensitive value hash,
so every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optional DuckDB oracle SQL) to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The driver's correctness harness checks the FIRST 50 registered queries.
# Round 1 verified the relational batches (48/50 green, CORRECTNESS_r01);
# round 2 the windows/timeseries/LLM half (49/49 non-failing); round 3 the
# attribution/pipeline batch + re-verified round-1 greens (50/50 non-failing).
# Round-4 window: the 22 queries that have NEVER held a checked slot
# (relational7, relational8 — completing driver rows for all 22 TPC-H shapes
# — and pipeline4), this round's two new queries (scalable global rank,
# AQE-skew fact x fact join), the permanent canary core, and the 16 stalest
# round-2-checked queries (every events/timestamp query is included — the
# fixture ts type changed this round and the normalization deserves driver
# rows). After this round every query registered BEFORE round 4 has at least
# one driver correctness row. Rotated-out queries are still checked locally
# each round via `python tools/check_oracle.py` over the FULL registry.
# Round-5 rotation queue (stalest driver rows after this round): the
# remaining r2-only re-verifies — windows batch (window_lag_lead_orders,
# window_frames_running, window_range_frame, window_distribution_fns,
# window_nth_last_value, topk_parts_per_brand, window_rank_customers),
# scalar batch 2 (string_functions_2, null_combinators, map_higher_order,
# to_json_roundtrip, conditional_aggregates, explode_posexplode_tokens,
# catalog_input_file_name, tablesample_seeded, python_udtf_bigrams), and the
# LLM tier (dedup_exact_keyed, doc_fingerprint, text_quality_scores,
# embedding_label_norms, multimodal_bytes_meta, dedup_connected_groups,
# dedup_groups_small, simhash_near_pairs, the embedding ivf/lsh/cosine
# forms, lang_id_heuristic, rolling_fingerprint, multimodal_pipeline,
# dedup_exact, median_exact_prices, window_global_rank) — plus
# containment_dedup_pairs (registered in round 4, locally oracle-green at
# sf0.001/0.01/0.1, no driver row yet).
CHECK_PRIORITY: tuple[str, ...] = (
    # -- never driver-checked: relational7 batch
    "q4_priority_exists",
    "q7_nation_volume",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "q13_order_count_distribution",
    "q17_small_quantity_revenue",
    "q22_global_sales_opportunity",
    "lateral_topn_orders",
    "nullsafe_join_counts",
    # -- never driver-checked: relational8 batch (completes all 22 TPC-H)
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q12_priority_by_returnflag",
    "q15_top_supplier",
    "q16_supplier_count_by_part",
    "q20_dominant_blue_suppliers",
    "q21_sole_late_supplier",
    # -- never driver-checked: pipeline4 batch
    "sequence_pack_spans",
    "snapshot_diff",
    "training_shard_stats",
    "dedup_canonical_selection",
    "text_normalize_stats",
    "cdc_apply_changelog",
    # -- new this round
    "window_global_rank_scalable",
    "skew_join_events_orders",
    # -- permanent canary core (r1-r3 proven; every round)
    "mr_search",
    "mr_wordcount",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "join_left_outer_order_counts",
    "join_semi_big_spenders",
    "join_anti_orderless_customers",
    "grouping_sets_explicit",
    "sort_multikey_nulls",
    # -- stalest r2-checked: every events/timestamp query (ts normalization
    #    changed this round) + bench-headline LLM/window queries
    "events_tumbling_1h",
    "events_sliding_1h_30m",
    "sessionization_30m",
    "session_window_batch",
    "interval_join_events",
    "time_rollup_multigrain",
    "asof_join_latest_order",
    "events_zscore_anomalies",
    "embedding_cosine_topk",
    "minhash_dedup_pairs",
    "jaccard_token_pairs",
    "tfidf_top_terms",
    "percentile_approx_prices",
    # -- new pipeline5 batch (no driver row yet — first rows this round;
    #    displaced dedup_exact/median/window_global_rank re-verifies, which
    #    keep their r2 rows and stay in the local full-registry check)
    "doc_chunking",
    "embedding_quantized_topk",
    "source_resample_weighted",
)


def load_all() -> None:
    """Import every query module, then order the registry so the driver's
    checked-50 window covers CHECK_PRIORITY (rest keep registration order)."""
    from mapreducefw_spark.queries import (  # noqa: F401
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        relational6,
        relational7,
        relational8,
        windows,
        windows2,
        timeseries,
        llm,
        llm_scale,
        parity,
        pipeline,
        pipeline2,
        pipeline3,
        pipeline4,
        pipeline5,
    )

    ordered = [n for n in CHECK_PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES if n not in CHECK_PRIORITY]
    for registry in (QUERIES, ORACLES):
        snapshot = {n: registry[n] for n in ordered if n in registry}
        registry.clear()
        registry.update(snapshot)
