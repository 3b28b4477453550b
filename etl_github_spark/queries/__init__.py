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
# with local parity green — rewritten this round to drop every engine-
# version-sensitive construct: ntile's remainder-distribution rule and
# raw-timestamp ordering, replaced by row_number integer arithmetic
# over epoch-micro longs) + 11 earlier round-7 additions (Delta
# partitioned/checkpoint/stats-skip/evolution, BFS, Holt, bloom join,
# patch plan, 3 stateful bridges) + 23 promoted late-round additions
# (Delta OPTIMIZE, change feed, z-order skip, DV delete/merge/restore,
# shallow clone, CHECK constraints, column mapping, generated cols,
# k-anonymity, BPE train+apply, delta-feed matview, stream-stream
# inner+outer joins, exactly-once txn sink + delta-source replay,
# audio frames, LPA communities, MIPS
# augmentation, split-leakage audit, bootstrap
# CI) + 15 stale-green ballast.
from . import text, dedup, similarity, tpch, extra, reshape, sets, core, joins, aggregates, windows, tpch_ext, scale_paths, text_ext, clustering, curation, stats, tpch_ps, quality, analytics, lake, lm, graph, validate, gha_parity, streaming_bridge  # noqa: F401,E402
from .registry import QUERIES, oracle_map, query_map  # noqa: F401

_R7_WINDOW = [
    "analytics_rfm_segments",  # RED r06
    "lake_delta_optimize",  # never driver-verified (promoted)
    "lake_delta_change_feed",  # never driver-verified (promoted)
    "lake_delta_zorder_skip",  # never driver-verified (promoted)
    "quality_k_anonymity",  # never driver-verified (promoted)
    "text_bpe_train_merges",  # never driver-verified (promoted)
    "lake_matview_delta_feed",  # never driver-verified (promoted)
    "stream_interval_join_replay",  # never driver-verified (promoted)
    "stream_outer_join_replay",  # never driver-verified (promoted)
    "stream_delta_sink_exactly_once",  # never driver-verified (promoted)
    "stream_delta_source_replay",  # never driver-verified (promoted)
    "text_bpe_apply_tokenize",  # never driver-verified (promoted)
    "lake_delta_delete_dv",  # never driver-verified (promoted)
    "lake_delta_merge",  # never driver-verified (promoted)
    "lake_delta_restore",  # never driver-verified (promoted)
    "lake_delta_clone",  # never driver-verified (promoted)
    "lake_delta_constraints",  # never driver-verified (promoted)
    "lake_delta_column_mapping",  # never driver-verified (promoted)
    "lake_delta_generated",  # never driver-verified (promoted)
    "multimodal_audio_frames",  # never driver-verified (promoted)
    "stat_bootstrap_ci",  # never driver-verified (promoted)
    "sim_mips_augmented",  # never driver-verified (promoted)
    "curate_split_leakage",  # never driver-verified (promoted)
    "multimodal_patch_plan",  # never driver-verified
    "join_bloom_prefilter",  # never driver-verified
    "trend_holt_linear_forecast",  # never driver-verified
    "lake_delta_partitioned",  # never driver-verified
    "lake_delta_checkpoint",  # never driver-verified
    "lake_delta_stats_skip",  # never driver-verified
    "lake_delta_evolution",  # never driver-verified
    "graph_label_propagation",  # never driver-verified (promoted)
    "graph_bfs_shortest_paths",  # never driver-verified
    "stream_heavy_hitters_replay",  # never driver-verified
    "stream_attribution_replay",  # never driver-verified
    "stream_spike_gate_replay",  # never driver-verified
    "flagship_popular_user_clicks",  # green r01
    "filter_eq",  # green r01
    "filter_substring_ci",  # green r01
    "filter_not_prefix",  # green r01
    "filter_disjunction",  # green r01
    "filter_having",  # green r01
    "project_subset",  # green r01
    "project_json_prop",  # green r01
    "project_json_struct",  # green r01
    "scalar_string_funcs",  # green r01
    "scalar_math_funcs",  # green r01
    "scalar_case_when",  # green r01
    "sort_topk",  # green r01
    "sort_multi_col",  # green r01
    "limit_deterministic",  # green r01
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
