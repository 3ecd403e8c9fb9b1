"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line with total + per-query
wall seconds. Results materialize via the noop sink so timings measure the
full distributed plan without driver-collect overhead (large outputs) while
small aggregates still pay their real cost.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from mapreducefw_spark.queries import QUERIES, load_all
from mapreducefw_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "join_left_outer_order_counts",
    "filter_predicates",
    "window_rank_customers",
    "topk_parts_per_brand",
    "events_tumbling_1h",
    "sessionization_30m",
    "asof_join_latest_order",
    "json_extract_events",
    "dedup_exact",
    "jaccard_token_pairs",
    "minhash_dedup_pairs",
    "embedding_cosine_topk",
    "text_token_stats",
    "mr_wordcount",
    "q10_returned_revenue",
    "median_exact_prices",
    "session_window_batch",
    "time_rollup_multigrain",
    "interval_join_events",
    "tfidf_top_terms",
    "salted_skew_aggregate",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    load_all()
    spark = get_spark(app_name="mapreducefw-bench", cpus=cpus)
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None

    # warm the JVM + parquet footers outside the timed region
    QUERIES["q1_pricing_summary"](spark, sf_dir).write.mode("overwrite").format("noop").save()

    per_query: dict[str, float] = {}
    for name in HEADLINE:
        best = None
        for _ in range(2):  # min of 2 runs: strips scheduler/GC noise
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        per_query[name] = round(best, 3)

    total = round(sum(per_query.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
                "cpus": int(cpus),
            }
        )
    )


if __name__ == "__main__":
    main()
