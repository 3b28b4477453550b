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
# staleness. Round 7: 1 latest-red (`analytics_rfm_segments`, red r4-r6
# with local parity green — root-caused this round to the driver's
# pandas canonicalization leaking DuckDB HUGEINT sums as float64, and
# rewritten on BOTH sides: BIGINT-cast oracle sums + row_number integer
# quartile arithmetic over epoch-micro longs, no ntile) + all 45
# never-driver-verified round-7 additions (the Delta protocol family:
# partitioned/checkpoint/stats-skip/evolution/OPTIMIZE/change feed/
# z-order/DV delete/merge/restore/clone/constraints/column mapping/
# generated cols; BFS + LPA + resource-allocation link prediction;
# 7 streaming replays incl. exactly-once txn sink and delta-source;
# BPE train+apply + Kneser-Ney bigram LM; k-anonymity, split-leakage,
# bootstrap CI, Spearman, weighted median, skew/kurtosis, null-safe
# join, MIPS augmentation, audio frames, patch plan, Holt forecast,
# bloom prefilter, shard assignment, Kendall tau-b, Holt-Winters
# seasonal, Markov removal-effect attribution, streaming SCD2
# replay) + 4 stale-green ballast.
from . import text, dedup, similarity, tpch, extra, reshape, sets, core, joins, aggregates, windows, tpch_ext, scale_paths, text_ext, clustering, curation, stats, tpch_ps, quality, analytics, lake, lm, graph, validate, gha_parity, streaming_bridge  # noqa: F401,E402
from .registry import QUERIES, oracle_map, query_map  # noqa: F401

_R7_WINDOW = [
    "analytics_rfm_segments",  # RED r06
    "multimodal_patch_plan",  # never driver-verified
    "multimodal_audio_frames",  # never driver-verified
    "join_bloom_prefilter",  # never driver-verified
    "join_null_safe_eq",  # never driver-verified
    "agg_weighted_median",  # never driver-verified
    "agg_skew_kurtosis",  # never driver-verified
    "sim_mips_augmented",  # never driver-verified
    "text_bpe_train_merges",  # never driver-verified
    "text_bpe_apply_tokenize",  # never driver-verified
    "text_kneser_ney_bigram",  # never driver-verified
    "curate_split_leakage",  # never driver-verified
    "curate_shard_assignment",  # never driver-verified
    "stat_bootstrap_ci",  # never driver-verified
    "stat_spearman_rank",  # never driver-verified
    "stat_kendall_tau_daily",  # never driver-verified
    "quality_k_anonymity",  # never driver-verified
    "trend_holt_linear_forecast",  # never driver-verified
    "trend_holt_winters_seasonal",  # never driver-verified
    "analytics_markov_attribution",  # never driver-verified
    "lake_delta_partitioned",  # never driver-verified
    "lake_delta_checkpoint",  # never driver-verified
    "lake_delta_stats_skip",  # never driver-verified
    "lake_delta_evolution",  # never driver-verified
    "lake_delta_optimize",  # never driver-verified
    "lake_delta_change_feed",  # never driver-verified
    "lake_delta_zorder_skip",  # never driver-verified
    "lake_matview_delta_feed",  # never driver-verified
    "lake_delta_delete_dv",  # never driver-verified
    "lake_delta_merge",  # never driver-verified
    "lake_delta_restore",  # never driver-verified
    "lake_delta_clone",  # never driver-verified
    "lake_delta_constraints",  # never driver-verified
    "lake_delta_column_mapping",  # never driver-verified
    "lake_delta_generated",  # never driver-verified
    "graph_bfs_shortest_paths",  # never driver-verified
    "graph_label_propagation",  # never driver-verified
    "graph_resource_allocation",  # never driver-verified
    "stream_heavy_hitters_replay",  # never driver-verified
    "stream_attribution_replay",  # never driver-verified
    "stream_spike_gate_replay",  # never driver-verified
    "stream_interval_join_replay",  # never driver-verified
    "stream_outer_join_replay",  # never driver-verified
    "stream_delta_sink_exactly_once",  # never driver-verified
    "stream_delta_source_replay",  # never driver-verified
    "stream_scd2_replay",  # never driver-verified
    "flagship_popular_user_clicks",  # green r01
    "filter_eq",  # green r01
    "filter_substring_ci",  # green r01
    "filter_not_prefix",  # green r01
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


_apply_rotation(_R7_WINDOW)
