"""Shuffle-volume probe: measure bytes SHUFFLED per query (Spark REST
status API) against the on-disk size of the tables it reads — the direct
evidence behind the scale claims ("dedup shuffles 32-byte hashes, never
text"; "the bloom probe never shuffles the corpus"). Stage inputBytes is
NOT used as the denominator: the local-FS vectorized reader under-reports
it; file sizes are deterministic. Writes SHUFFLE.md.

Run: python tools/shuffle_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mapreducefw_spark.queries import QUERIES, load_all
from mapreducefw_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"

# query -> (tables read, why its shuffle volume is the interesting number)
PROBED = {
    "dedup_exact": (["documents"], "exact dedup shuffles content HASHES, never document text"),
    "jaccard_token_pairs": (["documents"], "inverted-index join: shuffle ~ posting lists, not n^2 text"),
    "minhash_dedup_pairs": (["documents"], "signatures+banding: shuffle ~ k longs/doc + candidate ids"),
    "bloom_decontaminate": (["documents"], "probe side is broadcast joins — corpus shuffle ~ final agg only"),
    "q1_pricing_summary": (["lineitem"], "scan-heavy agg: shuffle = tiny partial-agg rows"),
    "mr_wordcount": (["documents"], "classic wordcount: shuffle = distinct tokens after map-side combine"),
    "sequence_pack_spans": (["documents"], "two-phase prefix sum: one bucket-keyed doc exchange"),
    "incremental_agg_maintenance": (["lineitem"], "IVM: shuffle = two group-sized partial-agg frames, never facts"),
    "dup_passage_coverage": (["documents"], "passage dedup: shuffle = 8-byte gram hashes + doc ids, never gram text"),
    "funnel_view_click_purchase": (["events"], "funnel fold: one user-keyed exchange of (ts, type) structs"),
    "key_skew_report": (["lineitem"], "skew report: map-side combine leaves per-key partials + a bounded top-k"),
    "edit_distance_pairs_symspell": (["part"], "linkage: output-sized — 2.4M verified pairs ARE the answer; DP inputs are distinct-name sized"),
    "events_gap_fill_hourly": (["events"], "gap-fill: one (key, bucket) partial-agg exchange; grid work is grid-sized"),
    "equi_depth_histogram": (["lineitem"], "two-phase rank: ONE range exchange of (price, keys), offsets O(partitions)"),
    "pagerank_copurchase": (["lineitem"], "5 iterations: shuffle ~ edges x iters (rank contributions), never raw facts re-scanned"),
    "token_divergence_by_source": (["documents"], "drift monitor: shuffle ~ (source, token) partials, top-N margins broadcast"),
    # round 6
    "ngram_overlap_decontam": (["documents"], "overlap decontam: shuffle = 8-byte gram hashes + doc ids; raw text and gram strings never leave the map side"),
    "funnel_staged_minjoin": (["events"], "staged funnel: 3 user-keyed min-combined exchanges of (user, ts) — no per-user arrays, bot-user safe"),
    "asof_tolerance_join": (["events", "orders"], "as-of: ONE key exchange of the tagged union; tolerance check rides carried columns"),
    "debounce_consecutive_events": (["events"], "debounce: one (user, type) window exchange of (type, ts, id) rows"),
    "group_aware_split": (["events"], "group split: map-combined per-user counts, then O(groups) rows"),
    # round 7
    "gopher_quality_rules": (["documents"], "quality gate: pure map-side array HOFs — shuffle is the output sort only"),
    "bitmap_exact_distinct": (["events"], "exact distinct: shuffle = OR-merged fixed-width bucket bitmaps, not per-id rows"),
    "event_pair_pmi": (["events"], "PMI: one distinct (user, type) exchange + vocabulary-bounded pair partials"),
    "inverted_index_postings": (["documents"], "postings build: (token, doc) partials after map-side combine; text stays map-side"),
    "twap_user_daily": (["events"], "TWAP: one (user, day) exchange reused by window AND aggregation"),
    "dedup_rate_by_source": (["documents"], "dedup KPI: md5(text)-keyed exchange — hashes + ids, never text"),
    # round 8
    "chi_square_independence": (["events"], "chi-square: map-combined (type, dow) cell counts — vocabulary-sized, marginals broadcast"),
    "mann_whitney_u": (["documents"], "MWU: per-distinct-length partials, then an O(grid) cumsum; raw docs never shuffle"),
    "gini_customer_spend": (["customer", "orders"], "Gini: per-customer spend partials + ONE range exchange for the two-phase rank"),
    "acf_daily_revenue": (["orders"], "ACF: daily partial-agg exchange; the 7-lag spine join runs on the calendar-bounded day grid"),
    "session_conversion_bounce": (["events"], "session chain: one user-hash exchange shared by both windows and the session reduce"),
    "kfold_assignment": (["documents"], "kfold: one lang-keyed exchange of (doc_id, md5) pairs; fold is arithmetic"),
    "corpus_prep_pipeline": (["documents"], "corpus prep: md5 dedup keys + 8-byte gram hashes + bucket-sized per-source frames; raw text shuffles only in the md5-keyed dedup carry"),
    "unigram_logppl_by_source": (["documents"], "unigram LM: (token) + (source, token) count partials after map-side combine — text never shuffles"),
    "dsir_importance_weights": (["documents"], "DSIR: fixed 64-bucket hashed-feature partials; bucket table broadcast"),
    "kendall_tau_b": (["lineitem"], "Kendall: map-combined contingency cells — vocabulary-sized, grid self-join broadcast"),
    "kaplan_meier_retention": (["orders"], "KM survival: one customer-keyed min/max exchange, then day-grid frames"),
    "dup_cluster_size_histogram": (["documents"], "dedup audit: 32-byte md5 keys, then integer size rows"),
    "boilerplate_prefix_dup": (["documents"], "prefix dedup: md5(prefix) 32-byte distinct shuffle, never text"),
    "simhash_portable_pairs": (["documents"], "simhash (uncapped lossless-proof form): map-only 48-bit votes; shuffle is candidate-PAIR-sized — the template-heavy synthetic corpus packs near-identical signatures, so chunk buckets fan out; the registered CAPPED twin below is the production answer, and text never moves"),
    "simhash_portable_pairs_capped": (["documents"], "simhash with cap_bucket_size(64) applied (r8 verdict order #4): mega-buckets dropped before the self-join, so the pair fan-out collapses to the non-boilerplate candidates; capped == uncapped pinned on cap-unbound fixtures (tests/test_simhash_portable.py)"),
    "char_ngram_lang_profile": (["documents"], "trigram profile: (lang, trigram) count partials after map-side combine"),
    "interarrival_gap_stats": (["events"], "gap stats: one (user, type) exchange for the lag, one type exchange for the rank"),
    "user_growth_curve": (["events"], "growth curve: user-keyed min exchange, then O(days) integer rows"),
    "scd2_point_in_time_join": (["orders", "customer"], "point-in-time: broadcast 3-version dim; facts never shuffle"),
    "psi_length_drift": (["documents"], "PSI: map-combined (snap, bin) counts — O(bins) rows move"),
    "centroid_per_label": (["embeddings"], "centroids: (label, dim) partial means — model-sized exchange"),
    "centroid_confusion_matrix": (["embeddings"], "confusion: per-dim partials + broadcast centroid model; vectors never shuffle whole"),
    "doc_keywords_tfidf": (["documents"], "keywords: df build shuffles (token, doc) distinct partials — instance-sized vs compressed input (the postings growth mode); the tf/application side is id-bounded"),
    "portable_minhash_pairs": (["documents"], "portable LSH: id-bounded 400-doc witness — every frame fits a broadcast at this size so NOTHING shuffles; the scale story lives in the production minhash_dedup_pairs row"),
    "ngram_novelty_rate": (["documents"], "novelty: 8-byte gram-hash anti-join, never gram text — >1 vs COMPRESSED input because distinct gram hashes are instance-sized (the dup_passage growth mode); text itself never moves"),
    # round 9
    "stop_gram_boilerplate": (["documents"], "stop-gram mining: per-record dedup is MAP-SIDE (array_distinct), so the shuffle is (source, gram) count partials after combine — on this high-entropy synthetic corpus most grams are unique so the vocabulary is instance-sized (the dup_passage growth mode; ~11x vs 24x for the naive per-instance distinct draft); real boilerplate corpora combine down"),
    "hapax_legomena_stats": (["documents"], "lexicon stats: one (source, token) grid of count partials after map-side combine, then an O(vocabulary) re-agg — text never shuffles"),
    "mann_kendall_trend": (["orders"], "MK test: one exact-decimal daily aggregate; the sign pair frame is a CALENDAR-BOUNDED broadcast self-join, so shuffle is day-grid partials only"),
    "embedding_near_dup_pairs": (["embeddings"], "cosine near-dup witness: id-bounded subset broadcast against itself — shuffle is the output sort of qualifying pairs; the 100 TB path is the LSH/SemDeDup/IVF tier"),
    # round 10
    "embedding_pq_topk_portable": (["embeddings"], "PQ/ADC: the corpus moves as m=16 BYTE-CODE rows into the per-query top-k window — float vectors stay map-side; codebook and query LUTs are model-sized closure constants; the rerank join touches 50 float rows per query"),
    "embedding_ivf_pq_topk_portable": (["embeddings"], "IVF-ADC: only nprobe/n_cells of the corpus shuffles, as (cell, codes) byte-code candidates — IVF's scan cut times PQ's 16x byte cut; centroids/codebook ride closures; rerank is retrieve-bounded"),
    "semantic_dedup_portable": (["embeddings"], "SemDeDup: ONE cell-keyed exchange of (vid, vec); the quadratic compare runs within cells only and survivors leave as bare id pairs"),
}


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}") as r:
        return json.loads(r.read())


def main() -> None:
    spark = get_spark(
        app_name="shuffle-probe",
        cpus=32,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4049",
            # the probe sums shuffleWriteBytes over ALL completed stages:
            # with 40+ probed queries the default retainedStages=1000
            # EVICTS early stages mid-run, so the cumulative "after" sum
            # can drop below "before" (a negative delta appeared in the
            # portable_minhash_pairs row before this was raised)
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    load_all()
    base = "http://localhost:4049"
    app_id = _api(base, "applications")[0]["id"]

    def shuffle_written() -> int:
        return sum(
            st.get("shuffleWriteBytes", 0)
            for st in _api(base, f"applications/{app_id}/stages?status=complete")
        )

    lines = [
        "# SHUFFLE — bytes shuffled vs on-disk input per query "
        "(tools/shuffle_probe.py, sf0.1, local[32])",
        "",
        "Shuffle write is the cluster-network cost a plan pays; the denominator",
        "is the compressed on-disk size of the tables the query reads. A ratio",
        "around or below 1 means the plan moves keys, hashes and partial",
        "aggregates — not multiplied raw data — which is the difference between",
        "a join that works at 100 TB and one that melts the network. (Shuffled",
        "rows are uncompressed, so even a pass-through exchange would exceed",
        "1.0; sub-1 ratios are genuinely reductive plans.)",
        "",
        "| query | input on disk | shuffle write | shuffle/input | why it matters |",
        "|---|---|---|---|---|",
    ]
    for name, (tables, why) in PROBED.items():
        on_disk = sum(
            os.path.getsize(f"{SF_DIR}/{t}.parquet") for t in tables
        )
        QUERIES[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()  # warm
        w0 = shuffle_written()
        QUERIES[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
        written = shuffle_written() - w0
        ratio = written / on_disk
        fmt = lambda b: f"{b / 1e6:.2f} MB"
        lines.append(
            f"| {name} | {fmt(on_disk)} | {fmt(written)} | {ratio:.3f} | {why} |"
        )
        print(lines[-1])
    Path("SHUFFLE.md").write_text("\n".join(lines) + "\n")
    print("wrote SHUFFLE.md")


if __name__ == "__main__":
    main()
