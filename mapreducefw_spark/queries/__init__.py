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
# Round-5 window (this round): every slot goes to an ORACLE-bearing query
# (round 4 burned 2 slots re-recording rows-only results — no_oracle queries
# stay out of the window; their rows-only records from r2 stand).
# Composition: the 2 queries with no driver row (containment_dedup_pairs from
# r4; minhash_signatures_portable — NEW, the md5-family driver-checkable twin
# of the xxhash64 production minhash), the 3 r4 hash-reds re-checked after
# their oracle HUGEINT casts landed (q12, pack_spans, shard_stats — Spark
# answers were verified exact; the fix is oracle-side CAST AS BIGINT), the
# permanent canary core, all 15 queries whose latest driver row is r1-vintage
# (the stalest on file), and 20 of the 26 r2-stale oracle-bearing re-verifies.
# Five r2-green scalar-expression re-verifies (string_functions_2,
# conditional_aggregates, map_higher_order, to_json_roundtrip,
# null_combinators, explode_posexplode_tokens — pure
# expression evaluation, lowest plan-regression risk) were displaced by the
# new pipeline6 curation batch and join the round-6 queue.
# The 6 r2-stale left to the local full-registry check each have a sibling
# with a fresh r4 row or an in-window twin: window_global_rank (scalable form
# r4-green), dedup_groups_small (dedup_canonical_selection r4-green),
# dedup_exact (dedup_exact_keyed in-window), median_exact_prices (bench-
# measured, r2-green), text_token_stats (text_normalize_stats r4-green),
# embedding_label_norms (cosine/quantized top-k r4-green).
# Also displaced for new-query rows: text_quality_scores (quality family
# freshly covered by trigram_typicality + dup_ngram_stats),
# topk_parts_per_brand (bench headline, plan-pinned in CI),
# window_distribution_fns (window family keeps 5 other in-window rows).
# Round-6 rotation queue (stalest after this round): the 12 displaced
# r1-stale re-verifies (see the session-3 block below), the 6
# sibling-covered r2-stale, the displaced scalar/window/quality
# re-verifies, the r3-vintage attribution/pipeline batch, the 4 session-3
# queries that missed the window (reservoir_sample_sources,
# token_divergence_by_source, session_paths_top, yoy_revenue_growth,
# copurchase_triangles, pareto_orders_skyline, rolling_weekly_active_users,
# ohlc_hourly_bars, embedding_dim_stats;
# embedding_pq_topk / embedding_ivf_pq_topk are rows-only by design —
# recall-pinned, they stay out per the no-oracle rule),
# and any new registrations — including the
# pipeline8 linkage/resample/stats batch (edit_distance_part_pairs,
# edit_distance_pairs_symspell, events_gap_fill_hourly,
# reservoir_sample_sources, token_divergence_by_source,
# equi_depth_histogram; all oracle-green locally at sf0.001/0.01/0.1) and
# the pipeline9 graph/sequence batch (pagerank_copurchase,
# event_transition_matrix, session_paths_top, winsorized_price_stats;
# oracle-green locally at sf0.001/0.01/0.1), the pipeline10 deterministic
# statistics (ols_price_size_by_brand, robust_outliers_mad; 3 sfs) and the
# pipeline11 modern-surface batch (events_props_variant,
# python_datasource_squares; sf0.001/0.01) and pipeline12 composition
# batch (entity_resolution_clusters, yoy_revenue_growth; sf0.001/0.01).
CHECK_PRIORITY: tuple[str, ...] = (
    # -- no driver row yet (pipeline6 curation batch is new this round)
    "containment_dedup_pairs",
    "minhash_signatures_portable",
    "stratified_sample_sources",
    "quality_decile_mixture",
    "token_budget_waterfill",
    "bloom_decontaminate",
    "vocab_coverage",
    "trigram_typicality",
    "dup_ngram_stats",
    "count_min_heavy_hitters",
    "percentile_disc_prices",
    # -- r4 hash-reds, oracle HUGEINT casts fixed this round
    "q12_priority_by_returnflag",
    "sequence_pack_spans",
    "training_shard_stats",
    # -- permanent canary core (every round)
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
    # -- session-3 registrations, all oracle-bearing with NO driver row.
    #    These 12 take the slots previously queued for the r1-stale
    #    re-verifies (distinct_segments, from_json_struct,
    #    higher_order_token_fns, intersect_all_quantities, intersect_nations,
    #    join_right_outer_parts, map_column_functions,
    #    pandas_scalar_udf_margin, projection_rekey, salted_skew_aggregate,
    #    scd2_merge_emulation, topk_orders_global — every one already holds
    #    an r1 driver row, and the round-4 verdict ranked a rowless
    #    registered query its #1 gap; the displaced twelve head the round-6
    #    queue). All 12 below are green in the local vanilla-session driver
    #    simulation (tools/drive_entry.py) at the driver's sf0.01 and in the
    #    NULL/edge differential suites.
    "edit_distance_part_pairs",
    "edit_distance_pairs_symspell",
    "events_gap_fill_hourly",
    "equi_depth_histogram",
    "pagerank_copurchase",
    "event_transition_matrix",
    "winsorized_price_stats",
    "ols_price_size_by_brand",
    "robust_outliers_mad",
    "entity_resolution_clusters",
    "events_props_variant",
    "python_datasource_squares",
    # -- new this round (session 2), all oracle-bearing with no prior driver
    #    row: IVM merge == recompute, outer interval-join batch twin,
    #    cross-doc duplicated-passage coverage, sequence funnel, key-skew
    #    report, matryoshka truncation, E-S weighted sampling, ANALYZE
    #    column stats, data-quality gate, cohort retention. Each displaced
    #    one r2-green re-verify into the round-6 queue (window_nth_last_value,
    #    window_range_frame, window_frames_running, doc_fingerprint,
    #    embedding_cosine_dedup, python_udtf_bigrams, window_lag_lead_orders,
    #    catalog_input_file_name, dedup_exact_keyed, window_rank_customers);
    #    the window family's fresh rows are window_global_rank_scalable
    #    (r4-green) + quality_decile_mixture in-window, dedup keeps
    #    dup_passage_coverage + the dedup_exact canary twin, embeddings gets
    #    a fresh row via embedding_truncated_topk.
    "incremental_agg_maintenance",
    "view_click_attribution_outer",
    "dup_passage_coverage",
    "funnel_view_click_purchase",
    "key_skew_report",
    "embedding_truncated_topk",
    "weighted_sample_tokens",
    "analyze_column_stats",
    "data_quality_report",
    "cohort_retention",
    "basket_part_pairs",
    "purchase_touch_attribution",
    "rfm_segmentation",
    # -- r2-stale re-verify (oracle-bearing; the window family's fresh row
    #    is window_global_rank_scalable, r4-green + canary-adjacent)
    "multimodal_bytes_meta",
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
        pipeline6,
        pipeline7,
        pipeline8,
        pipeline9,
        pipeline10,
        pipeline11,
        pipeline12,
        pipeline13,
        pipeline14,
    )

    ordered = [n for n in CHECK_PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES if n not in CHECK_PRIORITY]
    for registry in (QUERIES, ORACLES):
        snapshot = {n: registry[n] for n in ordered if n in registry}
        registry.clear()
        registry.update(snapshot)
