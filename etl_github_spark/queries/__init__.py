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
# staleness. Round 11 (per VERDICT r10 tasks 2, 5, 6): 13 promotions —
# the six new round-11 queries (dedup_minhash_lsh_autoband, the
# planner-derived banding sibling the r10 verdict asked for;
# stream_neardup_eventtime_replay, the append-mode watermark near-dup
# path under the driver hash; the dedup_lsh_store_* lifecycle trio —
# the persisted fit-free band index with sidecar-validated append and
# per-band compaction, and the store-judge twin of the streaming
# verdict path) plus the seven queries whose execution
# paths this round's refactors touched: stream_neardup_replay (the
# ANSI-safe unmatched-branch guard in streaming/dedup.py) and the six
# md5/SRP banding-family entries routed through _md5_band_rows /
# _md5_minhash_candidates, which gained band_size/carry parameters
# (defaults unchanged), plus gha_ingest_roundtrip (the chunked-decode
# oversized-line rewrite in gha/pipeline.py). Then the staleness
# backlog: the 9 r2-vintage greens the r10 promotions displaced — the
# last pre-r3 rows anywhere, retiring the staleness backlog completely
# (r10 verdict task 2) — and the stalest r3 greens fill the remainder.
# The window below is asserted equal to
# compute_window(_R11_PROMOTED, before_round=11) by
# tests/test_new_invariants.py, so a stale paste (or the driver's own
# post-commit CORRECTNESS_r11.json) cannot redden or silently waste
# driver slots.
from . import text, dedup, similarity, tpch, extra, reshape, sets, core, joins, aggregates, windows, tpch_ext, scale_paths, text_ext, clustering, curation, stats, tpch_ps, quality, analytics, lake, lm, graph, validate, gha_parity, streaming_bridge  # noqa: F401,E402
from .registry import QUERIES, oracle_map, query_map  # noqa: F401

_R11_PROMOTED = [
    "dedup_minhash_lsh_autoband",
    "stream_neardup_eventtime_replay",
    "dedup_lsh_store_pairs",
    "dedup_lsh_store_upsert",
    "dedup_lsh_store_compact",
    "dedup_lsh_store_judge",
    "stream_neardup_replay",
    "stream_corpus_dedup_replay",
    "dedup_minhash_lsh",
    "dedup_lsh_recall",
    "dedup_embedding_lsh_pairs",
    "dedup_semantic_prune_lsh",
    "gha_ingest_roundtrip",
]

_R11_WINDOW = [
    "dedup_minhash_lsh_autoband",  # never driver-verified (promoted)
    "stream_neardup_eventtime_replay",  # never driver-verified (promoted)
    "dedup_lsh_store_pairs",  # never driver-verified (promoted)
    "dedup_lsh_store_upsert",  # never driver-verified (promoted)
    "dedup_lsh_store_compact",  # never driver-verified (promoted)
    "dedup_lsh_store_judge",  # never driver-verified (promoted)
    "stream_neardup_replay",  # green r10
    "stream_corpus_dedup_replay",  # green r10
    "dedup_minhash_lsh",  # green r10
    "dedup_lsh_recall",  # green r10
    "dedup_embedding_lsh_pairs",  # green r10
    "dedup_semantic_prune_lsh",  # green r10
    "gha_ingest_roundtrip",  # green r06
    "sessionize_events",  # green r02
    "join_range_predicate",  # green r02
    "reshape_unpivot",  # green r02
    "reshape_posexplode",  # green r02
    "scalar_bitwise",  # green r02
    "curate_training_docs",  # green r02
    "set_union_all",  # green r02
    "set_intersect",  # green r02
    "set_except",  # green r02
    "text_stopword_removal",  # green r03
    "sim_normalize_embeddings",  # green r03
    "sim_topk_pandas_vectorized",  # green r03
    "agg_approx_percentile",  # green r03
    "q2_min_cost_supplier",  # green r03
    "q4_order_priority",  # green r03
    "q7_volume_shipping",  # green r03
    "q8_market_share",  # green r03
    "q9_product_type_profit",  # green r03
    "q12_priority_by_status",  # green r03
    "q14_promo_effect",  # green r03
    "q16_supplier_part_cnt",  # green r03
    "q18_large_volume_customers",  # green r03
    "q19_disjunctive_revenue",  # green r03
    "q22_idle_rich_customers",  # green r03
    "q13_customer_distribution",  # green r03
    "q15_top_supplier",  # green r03
    "q17_small_qty_revenue",  # green r03
    "q21_waiting_suppliers",  # green r03
    "text_chunk_tokens",  # green r03
    "text_train_val_split",  # green r03
    "curate_sample_stratified",  # green r03
    "curate_source_mixing",  # green r03
    "curate_tfidf_top_terms",  # green r03
    "curate_decontaminate",  # green r03
    "curate_length_outliers",  # green r03
    "curate_domain_cap",  # green r03
    "curate_sample_weighted",  # green r03
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


_apply_rotation(_R11_WINDOW)
