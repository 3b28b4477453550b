"""Cross-variant pins: each scale-path sibling must agree with its exact
baseline (the property that makes it a drop-in replacement)."""

from __future__ import annotations

from etl_github_spark.queries.registry import QUERIES

from .conftest import SF_SMALL


def test_quantized_centroid_within_grid_error(spark):
    """|quantized − exact| ≤ 1e-6 per (label, dim): floor-to-grid error
    of the mean is bounded by the grid step."""
    exact = {
        (r["label"], r["dim"]): r["centroid"]
        for r in QUERIES["sim_label_centroids"].fn(spark, SF_SMALL).collect()
    }
    quant = {
        (r["label"], r["dim"]): r["centroid"]
        for r in QUERIES["sim_label_centroids_quantized"].fn(spark, SF_SMALL).collect()
    }
    assert exact.keys() == quant.keys()
    worst = max(abs(exact[k] - quant[k]) for k in exact)
    assert worst <= 1.000001e-6, worst


def test_fuzzy_qgram_join_equals_all_pairs(spark):
    """The 2-gram + length prefilter must have full recall at dist<=1
    over the fixture domain: result set identical to the baseline."""
    base = {
        tuple(r) for r in QUERIES["text_levenshtein_pairs"].fn(spark, SF_SMALL).collect()
    }
    fuzzy = {
        tuple(r) for r in QUERIES["text_fuzzy_join_qgram"].fn(spark, SF_SMALL).collect()
    }
    assert base == fuzzy and len(base) > 0


def test_rolling_wau_sketch_within_hll_tolerance(spark):
    """HLL-merged rolling uniques must track the exact join-based WAU
    within ~3x the sketch's relative standard deviation."""
    exact = {
        r["day"]: r["wau"]
        for r in QUERIES["trend_rolling_7d_users"].fn(spark, SF_SMALL).collect()
    }
    approx = {
        r["day"]: (r["wau_exact"], r["approx_ok"])
        for r in QUERIES["trend_rolling_7d_users_approx"].fn(spark, SF_SMALL).collect()
    }
    assert exact.keys() == approx.keys()
    for day, n in exact.items():
        got_exact, ok = approx[day]
        # exact side re-derived by the independent join-based twin, and
        # the sketch's tolerance verdict must hold on every day
        assert got_exact == n, (day, n, got_exact)
        assert ok is True, day


def test_srp_plane_dot_sign_margin():
    """The SRP-pairs oracle replays the bucketing with a left-fold while
    the Spark kernel uses numpy (pairwise summation): signs agree only
    because no fixture plane-dot sits near zero. Assert the margin is
    orders of magnitude above summation-order error (~1e-13 rel)."""
    import numpy as np
    import pyarrow.parquet as pq

    from etl_github_spark.queries.similarity import _srp_planes

    for sf in ("sf0.01", "sf0.1"):
        t = pq.read_table(f"/root/testdata/{sf}/embeddings.parquet")
        m = np.stack(
            [np.asarray(e, dtype=np.float64) for e in t["embedding"].to_pylist()]
        )
        pm = np.asarray(_srp_planes(16, 64), dtype=np.float64).T
        assert np.abs(m @ pm).min() > 1e-8


def test_ivf_probe_cell_score_margin():
    """sim_ivf_topk's oracle assumes both engines pick the same probe
    cells even though centroid means are float-order-dependent: assert
    the fixture gap between adjacent cell scores around the probe
    cutoff dwarfs summation-order error (~1e-15 rel)."""
    import numpy as np
    import pyarrow.parquet as pq

    for sf in ("sf0.01", "sf0.1"):
        t = pq.read_table(f"/root/testdata/{sf}/embeddings.parquet")
        emb = np.stack([np.asarray(e, np.float64) for e in t["embedding"].to_pylist()])
        lab = np.asarray(t["label"].to_pylist())
        vid = np.asarray(t["vec_id"].to_pylist())
        cents = np.stack([emb[lab == c].mean(axis=0) for c in range(lab.max() + 1)])
        q = emb[vid == 0][0]
        qn = q / np.linalg.norm(q)
        norms = np.linalg.norm(cents, axis=1)
        scores = np.sort((cents @ qn) / np.where(norms > 0, norms, 1))[::-1]
        assert np.abs(np.diff(scores[:4])).min() > 1e-7


def test_lsh_dbscan_is_conservative_underclustering(spark):
    """LSH candidate edges are a subset of the exact eps-edges, so
    degrees can only drop: every point's role under `cluster_dbscan_lsh`
    is ≤ its exact-DBSCAN role (core→border/noise possible, never an
    upgrade), and any point the LSH path does cluster must carry a
    cluster id ≤ ... well, a valid core id from the exact labeling's
    component structure is NOT guaranteed (splits re-root the min id),
    so pin only the role monotonicity + the shared-noise direction."""
    from .conftest import SF_ORACLE
    from etl_github_spark.queries.registry import QUERIES

    rank = {"noise": 0, "border": 1, "core": 2}
    exact = {
        r.vec_id: r.role
        for r in QUERIES["cluster_dbscan_embeddings"].fn(spark, SF_ORACLE).collect()
    }
    lsh = {
        r.vec_id: r.role
        for r in QUERIES["cluster_dbscan_lsh"].fn(spark, SF_ORACLE).collect()
    }
    assert set(exact) == set(lsh)
    for v, role in lsh.items():
        assert rank[role] <= rank[exact[v]], (v, role, exact[v])


def test_semdedup_lsh_is_conservative_subset_of_exact(spark):
    """Banded-SRP SemDeDup can only MISS in-cell pairs, never invent
    them: every vector it drops is dropped by the exact cell-exhaustive
    prune, and its reported max_cos is a lower bound of the exact one
    (equal whenever the maximizing pair shares a band bucket)."""
    from .conftest import SF_ORACLE

    exact = {
        r.vec_id: (r.keep, r.max_cos_to_earlier)
        for r in QUERIES["dedup_semantic_prune"].fn(spark, SF_ORACLE).collect()
    }
    lsh = {
        r.vec_id: (r.keep, r.max_cos_to_earlier)
        for r in QUERIES["dedup_semantic_prune_lsh"].fn(spark, SF_ORACLE).collect()
    }
    assert set(exact) == set(lsh)
    dropped_lsh = {v for v, (k, _) in lsh.items() if not k}
    dropped_exact = {v for v, (k, _) in exact.items() if not k}
    assert dropped_lsh and dropped_lsh <= dropped_exact
    for v, (_, mc) in lsh.items():
        assert mc <= exact[v][1] + 1e-12, (v, mc, exact[v][1])
