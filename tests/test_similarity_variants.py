"""Cross-variant consistency: every similarity implementation must agree
on the ranked result, whatever its execution strategy."""

from __future__ import annotations

from etl_github_spark.queries.registry import QUERIES

from .conftest import SF_ORACLE


def _ids(spark, name):
    return [r["vec_id"] for r in QUERIES[name].fn(spark, SF_ORACLE).collect()]


def test_pandas_vectorized_matches_fold_topk(spark):
    assert _ids(spark, "sim_topk_pandas_vectorized") == _ids(spark, "sim_topk_bruteforce")


def test_lsh_topk_subset_of_bruteforce_ranking(spark):
    """SRP-LSH returns bucket-local candidates re-ranked by exact cosine:
    its results must be a subsequence of the exhaustive ranking (it may
    miss neighbors — that's the documented recall trade — but must never
    invent or misorder them)."""
    brute = _ids(spark, "sim_topk_bruteforce")
    lsh = _ids(spark, "sim_lsh_bucketed_topk")
    brute_pos = {v: i for i, v in enumerate(brute)}
    in_brute = [v for v in lsh if v in brute_pos]
    assert in_brute == sorted(in_brute, key=lambda v: brute_pos[v])
    assert lsh[0] == 0  # the query vector itself always collides with itself


def test_embedding_lsh_pairs_subset_of_exact(spark):
    """SRP-banded near-dup candidates re-ranked by exact cosine must be a
    subset of the all-pairs baseline (bounded-recall contract), and every
    surviving pair must carry the identical deterministic cosine."""
    lsh = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in QUERIES["dedup_embedding_lsh_pairs"].fn(spark, SF_ORACLE).collect()
    }
    exact = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in QUERIES["dedup_embedding_cosine"].fn(spark, SF_ORACLE).collect()
    }
    assert set(lsh) <= set(exact)
    assert len(lsh) > 0
    for pair, cos in lsh.items():
        assert cos == exact[pair]  # bit-identical left-fold on both paths


def test_ivf_topk_subsequence_of_bruteforce(spark):
    """IVF probes a cell subset, so its ranking must be a subsequence of
    the exhaustive ranking with the query vector first (its own cell is
    always probed)."""
    brute = _ids(spark, "sim_topk_bruteforce")
    ivf = _ids(spark, "sim_ivf_topk")
    assert ivf[0] == 0
    brute_pos = {v: i for i, v in enumerate(brute)}
    in_brute = [v for v in ivf if v in brute_pos]
    assert in_brute == sorted(in_brute, key=lambda v: brute_pos[v])


def test_ivf_kmeans_topk_subsequence_of_bruteforce(spark):
    """Learned-quantizer IVF must obey the same contract as the
    label-cell variant: subsequence of the exhaustive ranking, query
    vector first (its own cell is always probed)."""
    brute = _ids(spark, "sim_topk_bruteforce")
    ivf = _ids(spark, "sim_ivf_kmeans_topk")
    assert ivf[0] == 0
    assert len(ivf) == 10
    brute_pos = {v: i for i, v in enumerate(brute)}
    in_brute = [v for v in ivf if v in brute_pos]
    assert in_brute == sorted(in_brute, key=lambda v: brute_pos[v])


def test_ols_pandas_grouped_matches_moment_aggregation(spark):
    """Grouped-map applyInPandas OLS must be bit-equal to the integer-
    moment aggregate version (same int64 sums, same IEEE ops)."""
    from .conftest import SF_ORACLE

    agg = {
        r["lang"]: (r["n"], r["slope"], r["intercept"])
        for r in QUERIES["stat_ols_slope_per_lang"].fn(spark, SF_ORACLE).collect()
    }
    pandas_ = {
        r["lang"]: (r["n"], r["slope"], r["intercept"])
        for r in QUERIES["stat_ols_pandas_grouped"].fn(spark, SF_ORACLE).collect()
    }
    assert agg == pandas_  # exact equality, not approx
    # fixture domain safely inside the int64 moment-overflow bound
    assert all(n < 3_000_000_000 for n, _, _ in agg.values())


def test_int8_topk_recall_vs_bruteforce(spark):
    """Quantized retrieval searches the compressed codes, so the tail of
    the ranking may swap under quantization noise — but the head must
    hold: the query matches itself, and ≥8/10 of the exact top-10
    survive (9/10 on the fixture, pinned loosely so an unrelated
    refactor that nukes recall fails loudly)."""
    brute = _ids(spark, "sim_topk_bruteforce")
    q8 = _ids(spark, "sim_topk_int8")
    assert q8[0] == 0
    assert len(set(q8) & set(brute)) >= 8


def test_pq_topk_recall_vs_bruteforce(spark):
    """ADC over 16-byte PQ codes (16× compression): the query always
    retrieves itself, the fit is bit-deterministic (codebook means go
    through the exact scaled-integer path, so two runs return the
    identical ranking — no partitioning/run-order wobble), and recall
    holds its SF-dependent floor: 9/10 at sf0.01, 5/10 at the sf0.001
    fixture where 64 codes per subspace over ~100 vectors overfit."""
    brute = _ids(spark, "sim_topk_bruteforce")
    pq = _ids(spark, "sim_topk_pq")
    assert pq == _ids(spark, "sim_topk_pq")  # bit-deterministic re-run
    assert pq[0] == 0
    floor = 8 if "0.001" not in SF_ORACLE else 5
    assert len(set(pq) & set(brute)) >= floor


def test_matryoshka_rerank_recall_vs_bruteforce(spark):
    """Prefix-dim shortlist (first 16/64 dims, top-100) then exact
    full-dim rerank: the query retrieves itself and >= 6/10 of the
    exact top-10 survive (observed 7-8 across SFs — the synthetic
    fixture's prefix dims carry only 1/4 of the variance; trained
    matryoshka embeddings would do far better with smaller
    shortlists). Oracle parity pins the exact row set; this pins the
    semantic floor against the unsliced ranking."""
    brute = _ids(spark, "sim_topk_bruteforce")
    mat = _ids(spark, "sim_matryoshka_rerank")
    assert mat[0] == 0
    assert len(set(mat) & set(brute)) >= 6


def test_binary_hamming_recall_vs_bruteforce(spark):
    """Two 32-bit sign words (32x compression) + Hamming shortlist-64 +
    exact rerank: the query retrieves itself and >= 8/10 of the exact
    top-10 survive (observed 9/10 at sf0.001 and sf0.01). Oracle parity
    pins the exact row set; this pins the semantic floor."""
    brute = _ids(spark, "sim_topk_bruteforce")
    ham = _ids(spark, "sim_topk_binary_hamming")
    assert ham[0] == 0
    assert len(set(ham) & set(brute)) >= 8


def test_kcenter_selection_is_spread_and_deterministic(spark):
    """Greedy k-center: k distinct ids, seed first, and each selected
    point is farther from the already-selected set than ANY point is
    after the next round (non-increasing selection radius — the
    farthest-point invariant)."""
    import numpy as np

    from etl_github_spark.io.tables import load_table
    from etl_github_spark.queries.scale_paths import curate_kcenter_diversity

    from .conftest import SF_SMALL

    sel = curate_kcenter_diversity(spark, SF_SMALL).collect()
    ids = [r.vec_id for r in sel]
    assert len(ids) == 8 and len(set(ids)) == 8
    assert sel[0].sel_round == 0 and sel[0].vec_id == 0

    emb = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in load_table(spark, SF_SMALL, "embeddings").collect()
    }
    radii = []
    for r in range(1, 8):
        prior = [emb[i] for i in ids[:r]]
        d = min(((emb[ids[r]] - p) ** 2).sum() for p in prior)
        radii.append(d)
    assert all(a >= b - 1e-9 for a, b in zip(radii, radii[1:]))


def test_ivfpq_topk_recall_and_pruning(spark):
    """The IVF-PQ composite must (a) be bit-deterministic across runs,
    (b) retrieve the query itself, and (c) hold a recall floor vs the
    exact brute force (loose: cell pruning AND code quantization both
    cost recall; the floor exists so a refactor that nukes either
    fails loudly)."""
    brute = _ids(spark, "sim_topk_bruteforce")
    ivfpq = _ids(spark, "sim_ivfpq_topk")
    assert ivfpq == _ids(spark, "sim_ivfpq_topk")
    assert ivfpq[0] == 0
    floor = 6 if "0.001" not in SF_ORACLE else 3
    assert len(set(ivfpq) & set(brute)) >= floor


def test_ivfpq_residual_recall_and_determinism(spark):
    """Residual IVF-PQ must (a) be bit-deterministic across runs,
    (b) retrieve the query itself (its residual quantizes to its own
    codes, and its ADC self-distance is the table minimum per
    subspace), and (c) hold at least the global-codebook composite's
    recall floor — residual encoding exists to recall BETTER at equal
    code size, so falling below the non-residual floor means the
    residual join is wired wrong."""
    brute = _ids(spark, "sim_topk_bruteforce")
    res = _ids(spark, "sim_ivfpq_residual_topk")
    assert res == _ids(spark, "sim_ivfpq_residual_topk")
    assert res[0] == 0
    floor = 6 if "0.001" not in SF_ORACLE else 3
    assert len(set(res) & set(brute)) >= floor


def test_ivf_autok_topk_subsequence_and_derived_sizes(spark):
    """The auto-sized IVF obeys the same subsequence contract as its
    hand-sized twin, and its k/nprobe really are the count-derived
    rules (not frozen defaults): at a 4x fixture the quantizer must be
    larger than the k=8 default would give."""
    from etl_github_spark.queries.scale_paths import _auto_k, _auto_nprobe

    brute = _ids(spark, "sim_topk_bruteforce")
    ivf = _ids(spark, "sim_ivf_autok_topk")
    assert ivf[0] == 0
    assert len(ivf) == 10
    brute_pos = {v: i for i, v in enumerate(brute)}
    in_brute = [v for v in ivf if v in brute_pos]
    assert in_brute == sorted(in_brute, key=lambda v: brute_pos[v])
    # the sizing rules themselves
    assert _auto_k(500) == 8 and _auto_nprobe(500) == 3      # sf0.01
    assert _auto_k(2000) == 32 and _auto_nprobe(2000) == 4   # sf0.1
    assert _auto_k(20000) == 313 and _auto_nprobe(20000) == 40  # 10x probe
