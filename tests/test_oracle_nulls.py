"""Differential NULL/edge-text robustness for the documents-table queries.

The driver regenerates fixtures between rounds and the current ones happen
to contain no NULL, empty, or sub-n-gram texts — so the per-round oracle
checks can't prove the queries survive them. This suite builds a tiny
documents table that is ALL edge cases (NULLs, empty strings, one- and
two-token docs, exact duplicates, whitespace runs) and diffs Spark against
the registered DuckDB oracle on it, exactly like the driver would.
"""

from __future__ import annotations


import duckdb
import pytest
from pyspark.sql import functions as F  # noqa: F401 (parity with sibling suites)

from mapreducefw_spark.queries import ORACLES, QUERIES, load_all

load_all()

# documents-only queries whose semantics must hold on edge texts
EDGE_QUERIES = [
    "doc_chunking",
    "source_resample_weighted",
    "sequence_pack_spans",
    "minhash_signatures_portable",
    "stratified_sample_sources",
    "quality_decile_mixture",
    "token_budget_waterfill",
    "bloom_decontaminate",
    "vocab_coverage",
    "trigram_typicality",
    "dup_ngram_stats",
    "containment_dedup_pairs",
    "count_min_heavy_hitters",
    # round-5 continued-session additions
    "dup_passage_coverage",
    "weighted_sample_tokens",
    # session-3 additions (NULL texts: reservoir keeps them — no text
    # dependence; divergence filters them on both sides)
    "reservoir_sample_sources",
    "token_divergence_by_source",
    # round 6 (contamination set holds doc 0's NULL text; short/empty
    # docs produce empty gram arrays -> zero-gram rows with frac 0)
    "ngram_overlap_decontam",
    "collation_token_counts",
    "temperature_mix_allocation",
    # round-6 sweep: every remaining documents-reading oracle query
    "benchmark_contamination",
    "bigram_top_terms",
    "bpe_token_counts",
    "cdc_apply_changelog",
    "cross_snapshot_jaccard",
    "dedup_canonical_selection",
    "dedup_exact",
    "dedup_exact_keyed",
    "dedup_groups_small",
    "doc_fingerprint",
    "explode_posexplode_tokens",
    "higher_order_token_fns",
    "jaccard_token_pairs",
    "mr_wordcount",
    "multimodal_bytes_meta",
    "pii_scrub_stats",
    "python_udtf_bigrams",
    "repetition_scores",
    "snapshot_diff",
    "source_mix_weights",
    "stopword_candidates",
    "stratified_split_counts",
    "text_normalize_stats",
    "text_quality_scores",
    "text_token_stats",
    "tfidf_top_terms",
    "training_prep_pipeline",
    "training_shard_stats",
    # round 7 (NULL/empty texts: zero-word docs must fail the Gopher gate
    # with NULL ratios, not crash; NULL source is its own Zipf/nucleus
    # group; the postings index drops NULL texts on both sides)
    "gopher_quality_rules",
    "zipf_alpha_by_source",
    "nucleus_topp_sources",
    "inverted_index_postings",
    # NULL lang is its own k-fold stratum on both engines
    "kfold_assignment",
    # NULL texts form one dedup group (both engines group NULLs); the
    # shard hash is NULL-free (doc_id keyed)
    "dedup_rate_by_source",
    "shard_balance_report",
    # NULL/empty texts fail the first funnel gate with NULL-free ratios
    "quality_funnel_attrition",
    # KS over the src0/src1 slices of the edge table (tiny samples, tied
    # values; NULL n_chars rows drop out both sides)
    "ks_two_sample",
    # tie-heavy tiny samples are exactly the MWU average-rank stress case
    "mann_whitney_u",
    # round 8: bucketed drift tests collapse the tiny edge grid into 1-2
    # buckets (maximal coarsening); Welch/JSD run on the same sparse
    # src0/src1 slices; ROUGE pairs skip NULL-text refs/absent cands;
    # langid must call NULL-lang rows out (filtered) and empty tokens in;
    # the corpus-prep composition gates EVERY edge doc out (n_words < 20)
    # -> all-zero funnels and guarded 0 mix weights, not NaN
    "ks_two_sample_bucketed",
    "mann_whitney_u_bucketed",
    "welch_t_test",
    "jsd_token_drift",
    "rouge1_recall_pairs",
    "hhi_source_concentration",
    "langid_confusion_matrix",
    "percentile_cont_by_source",
    "corpus_prep_pipeline",
    # round 8 batch 3: empty-string tokens stay out of the hashing-trick
    # buckets both sides; NULL-text docs drop their accuracy-report pairs
    "feature_hashing_counts",
    "minhash_accuracy_report",
    # oracle-paired in r8 (generated-SQL langid twin): NULL text -> 'und'
    "lang_id_heuristic",
    # round 8 batch 4: zero-length token lists ride the BM25 avgdl; query
    # terms hit the edge stopword docs
    "bm25_scores",
    # round 8 batch 5: NULL/empty texts tokenize to zero rows (logppl/
    # DSIR sources with no tokens vanish on both engines; NULL source is
    # its own group, pinned NULLS LAST); the two NULL texts form one
    # md5(NULL) dup cluster; all-empty sources hit the NULLIF guards in
    # the readability formula, not a division error
    "unigram_logppl_by_source",
    "dsir_importance_weights",
    "dup_cluster_size_histogram",
    "boilerplate_prefix_dup",
    "readability_flesch_proxy",
    # round 8 batch 7: the exact-dup fixture texts (docs 5/6) are the
    # guaranteed hamming-0 simhash pair; zero-token docs are excluded
    # from signatures on BOTH sides (they'd collapse onto sig 0);
    # sub-3-char texts yield no trigrams via the length guard; n_chars=0
    # rows drop out of the log-bin filter
    "simhash_portable_pairs",
    "char_ngram_lang_profile",
    "histogram_log_bins",
    # round 8 batch 8: the exact-dup docs 5/6 form one cluster, isolated
    # docs are their own; mixed ascii+NULL-source rows ride the script
    # report's pinned NULLS LAST; the parity split leaves sparse PSI bins
    # (add-1 smoothing keeps every term finite)
    "simhash_cluster_assignment",
    "script_mixing_report",
    "psi_length_drift",
    # round 8 batch 9: df stats scan the whole edge corpus (NULL/empty
    # texts contribute nothing) while the keyword side is id-bounded
    "doc_keywords_tfidf",
    # round 8 batch 10: the exact-dup docs 5/6 are the guaranteed
    # jaccard-1.0 minhash pair; token sets KEEP empty split tokens
    # (signature parity); NULL texts fingerprint to NULL; sub-5-token
    # docs contribute zero novelty grams
    "portable_minhash_pairs",
    "rolling_fingerprint_portable",
    "ngram_novelty_rate",
    # round 8 batch 12: zero-length and single-doc sources stress the
    # k-group Σ-statistics (n=1 groups contribute s²/n exactly); the
    # tie-heavy tiny grid is the Kruskal average-rank stress case;
    # zero-pooled-variance pairs yield NULL d, not DIVIDE_BY_ZERO
    "anova_f_length_by_source",
    "kruskal_wallis_length",
    "cohens_d_src_pair",
    # round 9: sub-5-token docs contribute zero stop-grams; NULL/empty
    # texts add no hapax instances; the exact-dup docs 5/6 double their
    # shared grams' doc frequency on both engines
    "stop_gram_boilerplate",
    "hapax_legomena_stats",
    # the exact-dup docs 5/6 share one md5 ACROSS the fixture's sources
    # iff their sources differ; the mirror feed injects guaranteed rows
    "cross_source_dup_matrix",
    # round 10: NULL texts drop; empty/whitespace texts still produce a
    # token count (split counts empty fragments) and land in bucket 1/2
    "padding_waste_report",
    # round 11: NULL texts drop; sub-8-token texts emit zero grams (no
    # spans, n_removed 0, kept_frac 1.0); the exact-dup docs 5/6 make
    # every one of their gram positions duplicated, so the whole doc is
    # one maximal span and kept_frac 0 on both engines
    "exact_substring_spans",
    "exact_substring_removal",
    # round 11 batch 1: rrf_hybrid_retrieval / rag_retrieval_pipeline are
    # EXCLUDED here only because this fixture writes no embeddings table
    # (they fuse documents + embeddings); their lexical NULL handling is
    # bm25_scores' (above, same scoring), their empty-input behavior is
    # pinned in test_oracle_empty.py, and their dense side carries the
    # dim=64 query-vector contract (test_oracle_nulls_embeddings.py note).
    # round 11 batch 2: the NULL-source docs form their own cap domain;
    # there is no NULL doc_id in the fixture but the drop filter is
    # exercised by the empty suite and the oracle carries the same WHERE
    "source_frequency_cap",
    # round 11 batch 4: NULL/empty texts drop on both engines; the
    # exact-dup docs 5/6 duplicate every block they share (kept_frac 0);
    # sub-block docs form one short block; the classifier's dyadic logit
    # stays exact on 1-token docs and the NULL-source group aggregates
    # as its own row
    "duplicate_block_filter",
    "quality_classifier_scores",
]

ROWS = [
    # (doc_id, text, lang, source, n_chars)
    (0, None, "en", "src0", 0),
    (1, "", "en", "src0", 0),
    (2, "one", "en", "src0", 3),
    (3, "two words", "en", "src1", 9),
    (4, "a b", "en", "src1", 3),
    (5, "the same text again", "en", "src1", 19),
    (6, "the same text again", "en", "src2", 19),  # exact duplicate
    (7, "x  double  spaces", "en", "src2", 17),  # empty split tokens
    (8, "repeat repeat repeat repeat repeat", "en", "src2", 34),
    (9, None, "de", "src3", 0),  # second NULL, different source
    (10, "normal looking document with several distinct words inside", "de", "src3", 59),
    (14, "tail doc for the seventh-id contamination bucket", "de", "src3", 48),
    (21, "another multiple of seven lands in the contamination set", "en", "src0", 56),
    # round 6: NULL source + NULL lang (grouping / salt keys go NULL)
    (22, "null source document with enough words to gram", None, None, 46),
    # round 10 (ADVICE r9): a NULL-source doc that IS mirrored
    # (doc_id % 7 == 0) — its text lands under the synthetic 'mirror' feed,
    # so cross_source_dup_matrix must emit a (NULL, mirror) row; a plain
    # equi-join on src_a would silently drop it vs the IS NOT DISTINCT FROM
    # oracle. Doc 35 duplicates it under a named source so the natural
    # (NULL, src1) / (src1, NULL) cross-source path is exercised too.
    (28, "mirrored null source text shared with a named feed", None, None, 50),
    (35, "mirrored null source text shared with a named feed", "en", "src1", 50),
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_docs")
    spark.createDataFrame(
        ROWS, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)




@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_documents_match_oracle(spark, edge_dir, name):
    from tests._edge_compare import assert_query_matches_oracle

    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; DuckDB needs the file glob
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{edge_dir}/documents.parquet/*.parquet'"
    )
    assert_query_matches_oracle(QUERIES[name](spark, edge_dir), con, ORACLES[name])
