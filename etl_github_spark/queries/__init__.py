"""Query registry: every operator from SURVEY.md §2 (+ north-star ops).

Importing this package populates :data:`registry.QUERIES`. Each entry has
a PySpark implementation and (when SQL-expressible) a DuckDB oracle SQL
string the driver diffs against at sf=0.01.
"""

# The driver's correctness gate verifies the FIRST 50 registered queries,
# so registration order is rotated each round onto the least-recently-
# verified surface. The window below is GENERATED, not curated — run
#
#   python tools_gen_rotation.py [--promote name,...]
#
# and paste its stdout here. Ordering: latest-red first (fixes must
# re-verify), then promoted names (this round's must-verify additions),
# then never-driver-verified in registry add-order, then green by
# staleness. Round 5 promotes the seven gha_* raw-ingest parity queries
# (judge r4 task #3: the reference's core extraction path had no driver
# row) ahead of the r4 backlog; the ~32-query tail carries to r6.
from . import text, dedup, similarity, tpch, extra, reshape, sets, core, joins, aggregates, windows, tpch_ext, scale_paths, text_ext, clustering, curation, stats, tpch_ps, quality, analytics, lake, lm, graph, validate, gha_parity  # noqa: F401,E402
from .registry import QUERIES, oracle_map, query_map  # noqa: F401

_R5_WINDOW = [
    "dedup_minhash_lsh",  # RED r02
    "analytics_rfm_segments",  # RED r04
    "gha_extract_commits",  # never driver-verified (promoted)
    "gha_extract_creates",  # never driver-verified (promoted)
    "gha_extract_prs",  # never driver-verified (promoted)
    "gha_extract_comments",  # never driver-verified (promoted)
    "gha_extract_watches",  # never driver-verified (promoted)
    "gha_extract_forks",  # never driver-verified (promoted)
    "gha_corrupt_count",  # never driver-verified (promoted)
    "text_tokenizer_fertility",  # never driver-verified
    "multimodal_image_dims",  # never driver-verified
    "text_readability_ari",  # never driver-verified
    "multimodal_frame_sample",  # never driver-verified
    "dedup_jaccard_prefix",  # never driver-verified
    "dedup_simhash_hamming",  # never driver-verified
    "dedup_rate_by_source",  # never driver-verified
    "dedup_cross_source_syndication",  # never driver-verified
    "join_interval_overlap",  # never driver-verified
    "join_asof_nearest",  # never driver-verified
    "agg_hll_sketch_rollup",  # never driver-verified
    "agg_quantile_sketch_rollup",  # never driver-verified
    "agg_countmin_tokens",  # never driver-verified
    "agg_mode_per_group",  # never driver-verified
    "window_value_range_frame",  # never driver-verified
    "sim_topk_multi_query",  # never driver-verified
    "curate_kcenter_diversity",  # never driver-verified
    "agg_heavy_hitters_mg",  # never driver-verified
    "sim_ann_recall_audit",  # never driver-verified
    "pack_bins_shelf",  # never driver-verified
    "curate_decontaminate_bloom",  # never driver-verified
    "curate_mix_temperature",  # never driver-verified
    "curate_curriculum_stages",  # never driver-verified
    "stat_embedding_gram",  # never driver-verified
    "trend_autocorr_daily",  # never driver-verified
    "stat_welch_ttest_sources",  # never driver-verified
    "stat_mannwhitney_sources",  # never driver-verified
    "stat_ks_sources",  # never driver-verified
    "trend_weekday_profile",  # never driver-verified
    "stat_embedding_drift_split",  # never driver-verified
    "trend_cusum_changepoint",  # never driver-verified
    "stat_embedding_pca_power",  # never driver-verified
    "stat_winsorized_mean",  # never driver-verified
    "stat_theil_sen_daily_trend",  # never driver-verified
    "quality_oov_rate",  # never driver-verified
    "trend_rolling_7d_users_approx",  # never driver-verified
    "trend_ewma_spikes",  # never driver-verified
    "analytics_concurrent_sessions",  # never driver-verified
    "dedup_events_debounce",  # never driver-verified
    "analytics_power_users_pareto",  # never driver-verified
    "stat_tv_distance_sources",  # never driver-verified
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


_apply_rotation(_R5_WINDOW)
