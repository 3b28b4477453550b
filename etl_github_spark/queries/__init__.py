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
# staleness. Round 9 (per VERDICT r8): 15 promotions — the five
# never-driver-verified queries (stat_levene_brown_forsythe, landed
# after the r8 window froze; this round's new IVF-PQ store
# probe + upsert + compaction lifecycle queries; and
# dedup_semantic_prune_lsh, the banded-SemDeDup scale sibling the
# round-9 10× probe motivated)
# plus the ten queries whose execution paths changed this round (the
# clustering de-broadcast + pointer-jumping CC rewrite touches every
# dedup_cluster_*/split/fuzzy/DBSCAN consumer; the IVF-PQ helper
# extraction touches both ivfpq siblings; dedup_embedding_cosine lost
# its forced full-table broadcast) — then 35 slots of the
# stalest greens (r01-vintage), the staleness re-verification sweep
# the judge asked for (≥35 per the r8 verdict; the one green displaced
# by the new sibling, window_rank_topn_per_group, is bench-headline-
# covered every round). The window below is asserted equal to
# compute_window(_R9_PROMOTED) by tests/test_new_invariants.py, so a
# stale paste fails CI instead of silently wasting driver slots.
from . import text, dedup, similarity, tpch, extra, reshape, sets, core, joins, aggregates, windows, tpch_ext, scale_paths, text_ext, clustering, curation, stats, tpch_ps, quality, analytics, lake, lm, graph, validate, gha_parity, streaming_bridge  # noqa: F401,E402
from .registry import QUERIES, oracle_map, query_map  # noqa: F401

_R9_PROMOTED = [
    "stat_levene_brown_forsythe",
    "sim_ivfpq_store_probe",
    "sim_ivfpq_store_upsert",
    "sim_ivfpq_store_compact",
    "dedup_semantic_prune_lsh",
    "dedup_cluster_components",
    "dedup_cluster_survivors",
    "split_by_cluster",
    "dedup_soft_downweight",
    "dedup_fuzzy_corpus",
    "cluster_dbscan_embeddings",
    "cluster_dbscan_lsh",
    "sim_ivfpq_residual_topk",
    "sim_ivfpq_topk",
    "dedup_embedding_cosine",
]

_R9_WINDOW = [
    "stat_levene_brown_forsythe",  # never driver-verified (promoted)
    "sim_ivfpq_store_probe",  # never driver-verified (promoted)
    "sim_ivfpq_store_upsert",  # never driver-verified (promoted)
    "sim_ivfpq_store_compact",  # never driver-verified (promoted)
    "dedup_semantic_prune_lsh",  # never driver-verified (promoted)
    "dedup_cluster_components",  # changed this round (promoted), green r03
    "dedup_cluster_survivors",  # changed this round (promoted), green r03
    "split_by_cluster",  # changed this round (promoted), green r04
    "dedup_soft_downweight",  # changed this round (promoted), green r08
    "dedup_fuzzy_corpus",  # changed this round (promoted), green r04
    "cluster_dbscan_embeddings",  # changed this round (promoted), green r08
    "cluster_dbscan_lsh",  # changed this round (promoted), green r08
    "sim_ivfpq_residual_topk",  # changed this round (promoted), green r08
    "sim_ivfpq_topk",  # changed this round (promoted), green r08
    "dedup_embedding_cosine",  # changed this round (promoted), green r02
    "filter_disjunction",  # green r01 (stalest)
    "filter_having",  # green r01 (stalest)
    "filter_null_safe",  # green r01 (stalest)
    "filter_range_date",  # green r01 (stalest)
    "project_subset",  # green r01 (stalest)
    "project_json_prop",  # green r01 (stalest)
    "project_json_struct",  # green r01 (stalest)
    "scalar_string_funcs",  # green r01 (stalest)
    "scalar_math_funcs",  # green r01 (stalest)
    "scalar_case_when",  # green r01 (stalest)
    "sort_topk",  # green r01 (stalest)
    "sort_multi_col",  # green r01 (stalest)
    "limit_deterministic",  # green r01 (stalest)
    "join_inner_broadcast",  # green r01 (stalest)
    "join_left_outer_agg",  # green r01 (stalest)
    "join_semi",  # green r01 (stalest)
    "join_anti",  # green r01 (stalest)
    "join_full_outer",  # green r01 (stalest)
    "join_cross",  # green r01 (stalest)
    "join_multiway_dims",  # green r01 (stalest)
    "join_fact_fact_revenue",  # green r01 (stalest)
    "q1_pricing_summary",  # green r01 (stalest)
    "agg_value_counts",  # green r01 (stalest)
    "agg_global_count",  # green r01 (stalest)
    "agg_multi_shared_scan",  # green r01 (stalest)
    "agg_max_watermark",  # green r01 (stalest)
    "agg_group_multi_key",  # green r01 (stalest)
    "agg_distinct_per_group",  # green r01 (stalest)
    "agg_rollup",  # green r01 (stalest)
    "agg_cube",  # green r01 (stalest)
    "agg_stats_per_nation",  # green r01 (stalest)
    "agg_variance_deterministic",  # green r01 (stalest)
    "trend_daily_counts",  # green r01 (stalest)
    "trend_hourly_by_type",  # green r01 (stalest)
    "trend_year_month_orders",  # green r01 (stalest)
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


_apply_rotation(_R9_WINDOW)
