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
# staleness. Round 10 (per VERDICT r9 task 3): 9 promotions — the five
# new round-10 queries (sim_knn_classify_lsh, the bucketed classify
# sibling the r9 verdict asked for; dedup_semantic_prune_autok, the
# auto-k quantizer growth entry; sim_ivf_autok_topk, its IVF twin
# with count-derived k AND nprobe; stream_corpus_dedup_replay, the
# oracle replay of the de-broadcast stream-static fingerprint join;
# stream_neardup_replay, the streaming banded-MinHash near-dup whose
# per-doc verdicts replay exactly) plus the four queries whose
# execution paths this round refactored: the two SRP-banded siblings whose
# Spark band-explode path was extracted into the shared _srp_bands_df
# helper this round, and the two md5-family LSH queries now routed
# through the extracted _md5_band_rows — then the staleness backlog: the 8
# r1-vintage window functions and 33 of the 42 r2-vintage greens (the
# sweep the r9 verdict scheduled; the 9 promotions displace the other 9
# r2 greens, which are the only pre-r3 rows left after this window).
# The window below is asserted equal to
# compute_window(_R10_PROMOTED, before_round=10) by
# tests/test_new_invariants.py, so a stale paste (or the driver's own
# post-commit CORRECTNESS_r10.json) cannot redden or silently waste
# driver slots.
from . import text, dedup, similarity, tpch, extra, reshape, sets, core, joins, aggregates, windows, tpch_ext, scale_paths, text_ext, clustering, curation, stats, tpch_ps, quality, analytics, lake, lm, graph, validate, gha_parity, streaming_bridge  # noqa: F401,E402
from .registry import QUERIES, oracle_map, query_map  # noqa: F401

_R10_PROMOTED = [
    "sim_knn_classify_lsh",
    "dedup_semantic_prune_autok",
    "sim_ivf_autok_topk",
    "stream_corpus_dedup_replay",
    "stream_neardup_replay",
    "dedup_embedding_lsh_pairs",
    "dedup_semantic_prune_lsh",
    "dedup_minhash_lsh",
    "dedup_lsh_recall",
]

_R10_WINDOW = [
    "sim_knn_classify_lsh",  # never driver-verified (promoted)
    "dedup_semantic_prune_autok",  # never driver-verified (promoted)
    "sim_ivf_autok_topk",  # never driver-verified (promoted)
    "stream_corpus_dedup_replay",  # never driver-verified (promoted)
    "stream_neardup_replay",  # never driver-verified (promoted)
    "dedup_embedding_lsh_pairs",  # green r04
    "dedup_semantic_prune_lsh",  # green r09
    "dedup_minhash_lsh",  # green r05
    "dedup_lsh_recall",  # green r03
    "window_rank_topn_per_group",  # green r01
    "window_rank_dense",  # green r01
    "window_lag_lead",  # green r01
    "window_moving_sum",  # green r01
    "window_cumulative_share",  # green r01
    "window_time_range_count",  # green r01
    "window_percent_rank",  # green r01
    "window_ntile_quartiles",  # green r01
    "text_token_count",  # green r02
    "text_word_freq",  # green r02
    "text_bigram_freq",  # green r02
    "text_quality_score",  # green r02
    "text_lang_id_heuristic",  # green r02
    "text_fingerprint",  # green r02
    "text_token_count_bpe",  # green r02
    "text_levenshtein_pairs",  # green r02
    "multimodal_binary_meta",  # green r02
    "dedup_exact_distinct",  # green r02
    "dedup_exact_keep_first",  # green r02
    "dedup_summary",  # green r02
    "dedup_jaccard_pairs",  # green r02
    "sim_cosine_threshold",  # green r02
    "sim_topk_bruteforce",  # green r02
    "sim_norms",  # green r02
    "sim_label_centroids",  # green r02
    "q3_shipping_priority",  # green r02
    "q5_local_supplier_volume",  # green r02
    "q6_forecast_revenue",  # green r02
    "q10_returned_items",  # green r02
    "join_asof_last_view",  # green r02
    "agg_grouping_sets",  # green r02
    "agg_pivot_conditional",  # green r02
    "scalar_date_arith",  # green r02
    "scalar_regexp",  # green r02
    "filter_in_list",  # green r02
    "filter_like_pattern",  # green r02
    "scalar_coalesce_nullif",  # green r02
    "window_first_last",  # green r02
    "agg_argmax_per_group",  # green r02
    "agg_median_exact",  # green r02
    "set_union_distinct",  # green r02
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


_apply_rotation(_R10_WINDOW)
