"""Query registry: every operator from SURVEY.md §2 (+ north-star ops).

Importing this package populates :data:`registry.QUERIES`. Each entry has
a PySpark implementation and (when SQL-expressible) a DuckDB oracle SQL
string the driver diffs against at sf=0.01.
"""

# The driver's correctness gate verifies the FIRST 50 registered queries, so
# registration order is rotated each round onto the least-recently-verified
# surface. Round 4 window (explicit list below): the 47 queries that have
# never had a driver CORRECTNESS row in r01-r03 (the full round-3 ANN/dedup/
# analytics batch), plus three re-verifies whose DuckDB oracles were attached
# AFTER their last driver row (their only driver rows say `no_oracle`):
# dedup_simhash, sim_lsh_bucketed_topk, agg_approx_distinct_users.
#
# ROUND-5 ROTATION CANDIDATES — put these FIRST next round. The list is
# in add-order (oldest un-verified first) and is LONGER than the 50-slot
# window: take the first 50 verbatim as _R5_WINDOW and carry the tail to
# round 6 (everything here is already green in the local parity replica,
# tests/test_oracle_parity.py — the driver row is what's missing):
#   trend_rolling_7d_users_approx  (sibling trend_rolling_7d_users green r03;
#                                   dropped from the full r4 window)
#   sim_topk_multi_query           (sibling sim_topk_bruteforce green r01-r02;
#                                   dropped from the full r4 window)
#   curate_kcenter_diversity       (new in r4 — greedy k-center selection)
#   trend_ewma_spikes              (new in r4 — EWMA spike flags)
#   curate_decontaminate_bloom     (new in r4 — bloom decontamination)
#   stat_embedding_gram            (new in r4 — distributed Gram matrix)
#   analytics_concurrent_sessions  (new in r4 — distributed sweep-line)
#   dedup_jaccard_prefix           (new in r4 — PPJoin-style prefix filter)
#   dedup_simhash_hamming          (new in r4 — banded Hamming-radius pairs)
#   dedup_events_debounce          (new in r4 — 5s same-type debounce)
#   curate_mix_temperature         (new in r4 — sqrt-temperature mixing)
#   lake_versioned_timetravel      (new in r4 — commit/time-travel cycle)
#   lake_matview_refresh           (new in r4 — incremental view refresh)
#   analytics_power_users_pareto   (new in r4 — activity concentration)
#   stat_tv_distance_sources       (new in r4 — log-free drift monitor)
#   sim_ivf_kmeans_topk            (re-verify: gained a full oracle in r4;
#                                   its r4 row is from the same round)
#   sim_topk_pq                    (same — oracle attached in r4)
#   quality_perplexity_unigram     (new in r4 — CCNet-style LM deciles)
#   quality_perplexity_bigram      (new in r4 — interpolated bigram LM)
#   text_bm25_topk                 (new in r4 — BM25 ranked retrieval)
#   graph_pagerank_purchases       (new in r4 — int64 fixed-point PageRank)
#   graph_degree_histogram         (new in r4 — purchase-graph degrees)
#   agg_hll_sketch_rollup          (new in r4 — mergeable HLL rollup pin)
#   agg_heavy_hitters_mg           (new in r4 — Misra-Gries exact HH)
#   quality_oov_rate               (new in r4 — vocab-coverage filter)
#   curate_curriculum_stages       (new in r4 — easy→hard schedule)
#   analytics_market_basket        (new in r4 — support/confidence/lift)
#   graph_triangle_count           (new in r4 — co-purchase triangles)
#   curate_lm_pipeline             (new in r4 — LM-curation capstone)
#   trend_autocorr_daily           (new in r4 — lag-1..7 autocorrelation)
#   sim_rrf_fusion                 (new in r4 — hybrid retrieval fusion)
#   sim_ann_recall_audit           (new in r4 — IVF recall@k audit)
#   analytics_attribution_last_touch (new in r4 — 1h last-touch credit)
#   graph_kcore_peel               (new in r4 — bounded k-core survivors)
#   stat_welch_ttest_sources       (new in r4 — unequal-variance t-test)
#   stat_mannwhitney_sources       (new in r4 — integer-exact rank test)
#   stat_ks_sources                (new in r4 — integer ECDF sup-distance)
#   trend_weekday_profile          (new in r4 — weekday seasonal index)
#   analytics_time_to_convert      (new in r4 — activation-latency histogram)
#   curate_domain_weights_lm       (new in r4 — DoReMi-style source weights)
#   text_tokenizer_fertility       (new in r4 — subtokens-per-word by lang)
#   stat_embedding_drift_split     (new in r4 — centroid-cosine drift)
#   pack_bins_shelf                (new in r4 — whole-doc shelf packing)
#   dedup_rate_by_source           (new in r4 — provenance dup rates)
#   analytics_stickiness_dau_wau   (new in r4 — DAU/WAU engagement ratio)
#   analytics_growth_accounting    (new in r4 — new/retained/resurrected)
#   trend_cusum_changepoint        (new in r4 — int-exact CUSUM locator)
#   dedup_cross_source_syndication (new in r4 — feed-overlap detector)
#   quality_fk_orphans             (new in r4 — FK referential-integrity audit)
#   quality_expectations           (new in r4 — single-pass expectation suite)
#   analytics_activity_bitmap      (new in r4 — int64 day-bitmap engagement)
#   analytics_funnel_windowed      (new in r4 — 24h-bounded funnel)
#   stat_embedding_pca_power       (new in r4 — int fixed-point power iteration)
#   stat_winsorized_mean           (new in r4 — rank-based p10/p90 clamp)
#   lake_merge_upsert              (new in r4 — COW MERGE round-trip)
#   graph_hits_bipartite           (new in r4 — HITS hubs/authorities)
#   agg_quantile_sketch_rollup     (new in r4 — mergeable histogram quantiles)
#   multimodal_image_dims          (new in r4 — binary header field parse)
#   join_interval_overlap          (new in r4 — day-bucketed overlap join)
#   agg_countmin_tokens            (new in r4 — CM frequency sketch + audit)
#   trend_anomaly_mad              (new in r4 — median/MAD robust anomalies)
#   stat_benford_first_digit       (new in r4 — first-digit forensic audit)
#   text_readability_ari           (new in r4 — integer ARI difficulty bands)
#   lake_schema_evolution          (new in r4 — mergeSchema additive columns)
#   stat_theil_sen_daily_trend     (new in r4 — median-of-slopes robust trend)
#   multimodal_frame_sample        (new in r4 — container header + frame plan)
#   analytics_survival_curve       (new in r4 — censoring-aware survival)
#   lake_scd2_history              (new in r4 — SCD Type 2 close+insert)
#   analytics_attribution_linear   (new in r4 — equal-split multi-touch)
#   window_value_range_frame       (new in r4 — data-dependent RANGE frames)
#   lake_write_observed            (new in r4 — observe() write metrics)
#   agg_mode_per_group             (new in r4 — deterministic-tie-break mode)
#   trend_seasonal_decompose       (new in r4 — trend/weekday/residual split)
#   join_asof_nearest              (new in r4 — bidirectional tolerance as-of)
#   trend_wow_growth               (new in r4 — WoW permille growth rates)
from . import text, dedup, similarity, tpch, extra, reshape, sets, core, joins, aggregates, windows, tpch_ext, scale_paths, text_ext, clustering, curation, stats, tpch_ps, quality, analytics, lake, lm, graph, validate  # noqa: F401,E402
from .registry import QUERIES, oracle_map, query_map  # noqa: F401

_R4_WINDOW = [
    # stale re-verifies — oracles attached after their last driver row
    "dedup_simhash",
    "sim_lsh_bucketed_topk",
    "agg_approx_distinct_users",
    # text (3)
    "text_normalize_clean",
    "text_char_trigram_profiles",
    "text_fuzzy_join_qgram",
    # dedup (8)
    "dedup_span_coverage",
    "dedup_span_trim",
    "dedup_semantic_prune",
    "dedup_containment_pairs",
    "dedup_prefix_groups",
    "dedup_embedding_lsh_pairs",
    "dedup_fuzzy_corpus",
    "curate_dedup_audit",
    # similarity / ANN scale paths (10)
    "sim_knn_classify",
    "sim_matryoshka_rerank",
    "sim_topk_binary_hamming",
    "sim_ivf_topk",
    "sim_ivf_kmeans_topk",
    "emb_quantize_int8",
    "sim_topk_int8",
    "sim_topk_pq",
    "sim_label_centroids_quantized",
    "stat_embedding_separation",
    # skew paths (2)
    "agg_salted_value_counts",
    "join_salted_hotkey",
    # joins (1)
    "join_asof_next_purchase",
    # packing / splits (2)
    "pack_sequences",
    "split_by_cluster",
    # text analytics (5)
    "text_inverted_index",
    "text_bpe_merge_step",
    "text_doc_keywords",
    "text_collocations_lift",
    "text_zipf_table",
    # curation (3)
    "curate_importance_weights",
    "curate_sample_quota",
    "curate_token_budget",
    "curate_semantic_pipeline",
    # quality (5)
    "quality_token_rarity",
    "quality_ngram_diversity",
    "quality_word_concentration",
    "quality_lang_confusion",
    "quality_equidepth_histogram",
    # stats (1)
    "stat_chi2_lang_source",
    # trends / analytics (6)
    "trend_gap_filled_hourly",
    "trend_anomaly_days",
    "analytics_event_transitions",
    "analytics_rfm_segments",
    "analytics_user_paths_topk",
    "analytics_event_gaps_histogram",
]


def _apply_rotation(window: list[str]) -> None:
    """Reorder the registry dict so `window` occupies the first slots.

    dicts preserve insertion order, and the driver iterates
    ``queries()`` in that order — this is the rotation mechanism.
    Unknown names fail loudly (a typo here would silently shrink the
    verified window).
    """
    missing = [n for n in window if n not in QUERIES]
    if missing:
        raise ValueError(f"rotation window names not registered: {missing}")
    rest = {n: d for n, d in QUERIES.items() if n not in set(window)}
    ordered = {n: QUERIES[n] for n in window}
    ordered.update(rest)
    QUERIES.clear()
    QUERIES.update(ordered)


_apply_rotation(_R4_WINDOW)
