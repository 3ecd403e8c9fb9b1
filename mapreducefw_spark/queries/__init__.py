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
# Round 1 verified the relational batches (48/50 green, see
# CORRECTNESS_r01.json); round 2 rotates the other half of the surface --
# parity / windows / timeseries / llm / dedup / ANN -- into the checked
# window. Proven-green queries rotate out and back in on later rounds.
CHECK_PRIORITY: tuple[str, ...] = (
    # reference parity (the literal reference workload, SearchMRC.cpp:46-98)
    "mr_search",
    "mr_wordcount",
    # window functions
    "window_rank_customers",
    "window_lag_lead_orders",
    "window_frames_running",
    "window_range_frame",
    "topk_parts_per_brand",
    "window_distribution_fns",
    "window_nth_last_value",
    "tfidf_top_terms",
    "window_global_rank",
    # timeseries / streaming batch twins
    "events_tumbling_1h",
    "events_sliding_1h_30m",
    "sessionization_30m",
    "session_window_batch",
    "interval_join_events",
    "time_rollup_multigrain",
    "asof_join_latest_order",
    # LLM-pipeline: text analysis + exact dedup + embeddings
    "dedup_exact",
    "dedup_exact_keyed",
    "doc_fingerprint",
    "text_token_stats",
    "text_quality_scores",
    "embedding_cosine_topk",
    "embedding_label_norms",
    "multimodal_bytes_meta",
    # LLM-pipeline: scale-path dedup + ANN
    "jaccard_token_pairs",
    "minhash_dedup_pairs",
    "dedup_connected_groups",
    "dedup_groups_small",
    "simhash_near_pairs",
    "embedding_ivf_topk",
    "embedding_lsh_topk",
    "embedding_cosine_dedup",
    "embedding_lsh_dedup",
    "lang_id_heuristic",
    "rolling_fingerprint",
    "multimodal_pipeline",
    # aggregate extensions
    "median_exact_prices",
    "conditional_aggregates",
    "events_zscore_anomalies",
    "percentile_approx_prices",
    # scalar-function batch 2
    "string_functions_2",
    "null_combinators",
    "map_higher_order",
    "to_json_roundtrip",
    # generators / catalog / sampling / UDTF
    "explode_posexplode_tokens",
    "catalog_input_file_name",
    "tablesample_seeded",
    "python_udtf_bigrams",
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
        windows,
        windows2,
        timeseries,
        llm,
        llm_scale,
        parity,
        pipeline,
        pipeline2,
        pipeline3,
    )

    ordered = [n for n in CHECK_PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES if n not in CHECK_PRIORITY]
    for registry in (QUERIES, ORACLES):
        snapshot = {n: registry[n] for n in ordered if n in registry}
        registry.clear()
        registry.update(snapshot)
