"""Query registry: every operator from SURVEY.md §2 (+ north-star ops).

Importing this package populates :data:`registry.QUERIES`. Each entry has
a PySpark implementation and (when SQL-expressible) a DuckDB oracle SQL
string the driver diffs against at sf=0.01.
"""

from . import text, dedup, similarity, tpch, extra, reshape, sets, core, joins, aggregates, windows, tpch_ext, scale_paths, text_ext, clustering, curation, stats, tpch_ps, quality, analytics, lake, lm, graph, validate, gha_parity, streaming_bridge, freshness  # noqa: F401,E402
from .registry import QUERIES, oracle_map, query_map  # noqa: F401

# The driver's correctness gate verifies the FIRST 50 registered queries,
# so registration order is rotated each round onto the least-recently-
# verified surface. The window below is GENERATED, not curated — run
#
#   python tools_gen_rotation.py [--promote name,...]
#
# and paste its stdout here. Ordering: latest-red first (fixes must
# re-verify), then promoted names (this round's must-verify additions),
# then never-driver-verified in registry add-order, then green by
# staleness. Round 12 (per VERDICT r11 tasks 1, 2, 7): 12 promotions —
# the two NEW capstones (curate_lineage_manifest, the per-stage
# lineage/audit funnel of the curation pipeline;
# pipeline_index_freshness, the build→append→judge/retrieve freshness
# contract across the LSH band store AND the IVF-PQ store under one
# hash), two NEW production-shape ops (sim_ivfpq_rerank_exact,
# PQ-shortlist → exact-rerank two-stage retrieval — the FAISS refine
# step over the residual IVF-PQ index; dedup_lsh_store_delta,
# incremental pair maintenance whose delta ∪ bootstrap = full-corpus
# pairs identity is pytest-pinned), plus the eight queries whose
# execution paths this round's
# store/streaming restructure touched: the dedup_lsh_store_* lifecycle
# quartet (sigs/ is now hash-bucket partitioned; store_judge_docs
# collision-joins skinny bands before attaching signatures), the two
# stream_neardup replays (the static corpus side is now skinny bands +
# a separate sig frame joined post-collision), and
# dedup_chunks_global / curate_pipeline_full (the _chunk_kept split in
# quality.py). Then the staleness backlog: the 19 r3-vintage greens
# VERDICT r11 task 1 names (dedup_chunks_global / curate_pipeline_full
# double as changed-path promotions), which retires every pre-r4 row,
# and the stalest r4 greens fill the remainder — backlog after this
# window: 0. The window below is asserted equal to
# compute_window(_R12_PROMOTED, before_round=12) by
# tests/test_new_invariants.py, so a stale paste (or the driver's own
# post-commit CORRECTNESS_r12.json) cannot redden or silently waste
# driver slots.
_R12_PROMOTED = [
    "curate_lineage_manifest",
    "pipeline_index_freshness",
    "sim_ivfpq_rerank_exact",
    "dedup_lsh_store_delta",
    "dedup_lsh_store_pairs",
    "dedup_lsh_store_upsert",
    "dedup_lsh_store_compact",
    "dedup_lsh_store_judge",
    "stream_neardup_replay",
    "stream_neardup_eventtime_replay",
    "dedup_chunks_global",
    "curate_pipeline_full",
]

_R12_WINDOW = [
    "curate_lineage_manifest",  # never driver-verified (promoted)
    "pipeline_index_freshness",  # never driver-verified (promoted)
    "sim_ivfpq_rerank_exact",  # never driver-verified (promoted)
    "dedup_lsh_store_delta",  # never driver-verified (promoted)
    "dedup_lsh_store_pairs",  # green r11
    "dedup_lsh_store_upsert",  # green r11
    "dedup_lsh_store_compact",  # green r11
    "dedup_lsh_store_judge",  # green r11
    "stream_neardup_replay",  # green r11
    "stream_neardup_eventtime_replay",  # green r11
    "dedup_chunks_global",  # green r03
    "curate_pipeline_full",  # green r03
    "stat_ols_slope_per_lang",  # green r03
    "stat_ols_pandas_grouped",  # green r03
    "stat_corr_per_lang",  # green r03
    "q11_important_stock",  # green r03
    "q20_potential_promotion",  # green r03
    "quality_gopher_stats",  # green r03
    "quality_gopher_filter",  # green r03
    "quality_repetition_stats",  # green r03
    "quality_pii_redact",  # green r03
    "quality_boilerplate_ngrams",  # green r03
    "quality_length_histogram",  # green r03
    "stat_outliers_zscore",  # green r03
    "funnel_conversion",  # green r03
    "cohort_retention",  # green r03
    "profile_documents",  # green r03
    "trend_rolling_7d_users",  # green r03
    "dedup_events_hourly",  # green r03
    "text_normalize_clean",  # green r04
    "text_char_trigram_profiles",  # green r04
    "dedup_simhash",  # green r04
    "dedup_span_coverage",  # green r04
    "dedup_span_trim",  # green r04
    "dedup_semantic_prune",  # green r04
    "dedup_containment_pairs",  # green r04
    "dedup_prefix_groups",  # green r04
    "sim_lsh_bucketed_topk",  # green r04
    "sim_knn_classify",  # green r04
    "sim_matryoshka_rerank",  # green r04
    "sim_topk_binary_hamming",  # green r04
    "join_asof_next_purchase",  # green r04
    "agg_approx_distinct_users",  # green r04
    "sim_ivf_topk",  # green r04
    "emb_quantize_int8",  # green r04
    "sim_ivf_kmeans_topk",  # green r04
    "agg_salted_value_counts",  # green r04
    "join_salted_hotkey",  # green r04
    "sim_label_centroids_quantized",  # green r04
    "text_fuzzy_join_qgram",  # green r04
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


_apply_rotation(_R12_WINDOW)
