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


def test_knn_lsh_classify_is_banded_restriction_of_exact(spark):
    """The banded kNN is the exact vote RESTRICTED to colliding
    candidates — so the sharp property is conditional, not global
    agreement (the fixture's 5-NN sit at cos 0.3–0.45 where 4×4 SRP
    per-neighbor recall is ~50%; global agreement is recall-bound by
    construction): (a) its query set ⊆ the exact classifier's with
    matching true labels and votes in [1, 5]; (b) an independent numpy
    replay of the banding + candidate-restricted vote reproduces every
    prediction bit-for-bit; (c) for queries whose exact top-5 ALL
    collide, the prediction equals the exact classifier's."""
    import numpy as np
    import pyarrow.parquet as pq

    from etl_github_spark.queries.similarity import _srp_planes

    from .conftest import SF_ORACLE

    exact = {
        r.query_vec_id: (r.true_label, r.pred_label)
        for r in QUERIES["sim_knn_classify"].fn(spark, SF_ORACLE).collect()
    }
    lsh = {
        r.query_vec_id: (r.true_label, r.pred_label, r.votes)
        for r in QUERIES["sim_knn_classify_lsh"].fn(spark, SF_ORACLE).collect()
    }
    assert lsh and set(lsh) <= set(exact)
    for qid, (tl, _, votes) in lsh.items():
        assert tl == exact[qid][0], qid
        assert 1 <= votes <= 5, (qid, votes)

    t = pq.read_table(f"{SF_ORACLE}/embeddings.parquet")
    vid = np.asarray(t["vec_id"].to_pylist())
    lab = np.asarray(t["label"].to_pylist())
    emb = np.stack([np.asarray(e, np.float64) for e in t["embedding"].to_pylist()])
    planes = np.asarray(_srp_planes(16, 64), np.float64).T
    bits = (emb @ planes) >= 0
    bands = np.stack(
        [
            (bits[:, b * 4 : (b + 1) * 4] * (1 << np.arange(4))).sum(axis=1)
            for b in range(4)
        ],
        axis=1,
    )  # (n, 4) band buckets
    is_q = vid % 50 == 0
    norms = np.linalg.norm(emb, axis=1)

    def vote(cands_idx, qi):
        cos = (emb[cands_idx] @ emb[qi]) / (norms[cands_idx] * norms[qi])
        order = sorted(zip(-cos, vid[cands_idx], lab[cands_idx]))[:5]
        counts: dict[int, int] = {}
        for _, _, cl in order:
            counts[cl] = counts.get(cl, 0) + 1
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        return best[0], best[1]

    for qi in np.flatnonzero(is_q):
        collide = (~is_q) & (bands == bands[qi]).any(axis=1)
        cands = np.flatnonzero(collide)
        if len(cands) == 0:
            assert int(vid[qi]) not in lsh
            continue
        pred, votes = vote(cands, qi)
        got = lsh[int(vid[qi])]
        assert got[1] == pred and got[2] == votes, (vid[qi], got, pred, votes)
        # conditional agreement: exact top-5 fully collided → same answer
        exact_top5 = {
            v for _, v, _ in sorted(
                zip(
                    -(emb[~is_q] @ emb[qi]) / (norms[~is_q] * norms[qi]),
                    vid[~is_q],
                    lab[~is_q],
                )
            )[:5]
        }
        if exact_top5 <= set(vid[cands]):
            assert pred == exact[int(vid[qi])][1], vid[qi]


def test_semdedup_autok_prune_rule_and_cell_budget(spark):
    """Auto-k SemDeDup invariants: every vector appears exactly once;
    the learned partition uses at most _auto_k(N) cells (k is the
    count-derived growth rule, not a constant); keep is exactly the
    no-qualifying-earlier-neighbor predicate (max_cos sentinel -1.0);
    and a dropped vector's max_cos clears tau."""
    from .conftest import SF_ORACLE
    from etl_github_spark.queries.dedup import _SEMDEDUP_TAU
    from etl_github_spark.queries.scale_paths import _auto_k

    rows = QUERIES["dedup_semantic_prune_autok"].fn(spark, SF_ORACLE).collect()
    import pyarrow.parquet as pq

    n = pq.read_metadata(f"{SF_ORACLE}/embeddings.parquet").num_rows
    assert len(rows) == n
    assert len({r.vec_id for r in rows}) == n
    cells = {r.cell for r in rows}
    assert len(cells) <= _auto_k(n)
    assert len(cells) >= 2  # the partition is real, not degenerate
    dropped = 0
    for r in rows:
        if r.keep:
            assert r.max_cos_to_earlier == -1.0, r
        else:
            dropped += 1
            assert r.max_cos_to_earlier >= _SEMDEDUP_TAU - 1e-12, r
    assert dropped > 0  # tau is calibrated to make the prune non-trivial


def test_autok_sql_and_python_rules_agree():
    """The auto-k (and auto-nprobe) sizing rules exist twice — a Python
    function on the Spark side and a LIMIT-subquery expression in the
    static oracle. If they ever disagree for some corpus size, the
    driver hash diverges only AT THAT SF — so pin them equal over a
    wide sweep of counts, including the budget boundaries."""
    import duckdb

    from etl_github_spark.queries.scale_paths import (
        _AUTO_NPROBE_SQL_EXPR,
        _AUTOK_SQL_EXPR,
        _auto_k,
        _auto_nprobe,
    )

    con = duckdb.connect()
    ns = [1, 2, 63, 64, 65, 127, 128, 129, 500, 2000, 20000, 123457, 10**7]
    for n in ns:
        con.sql(f"CREATE OR REPLACE VIEW x AS SELECT * FROM range({n}) t(i)")
        k_sql = con.sql(_AUTOK_SQL_EXPR).fetchone()[0]
        np_sql = con.sql(_AUTO_NPROBE_SQL_EXPR).fetchone()[0]
        assert k_sql == _auto_k(n), (n, k_sql, _auto_k(n))
        assert np_sql == _auto_nprobe(n), (n, np_sql, _auto_nprobe(n))


def test_autoband_selection_matches_python_twin_and_fixed_sibling(spark):
    """The autoband layout rule must (a) agree with a from-first-
    principles Python evaluation of the S-curve costs, (b) select the
    8x4 layout the fixed sibling hard-codes for n=32 at t=0.5 (the
    static oracle goes empty-set otherwise), and (c) produce exactly
    the fixed sibling's pair set plus the two layout metadata columns."""
    import math

    from etl_github_spark.queries.dedup import (
        _AUTOBAND_CONFIGS,
        _LSH_GRID,
        _LSH_THRESHOLD,
        _autoband_choice_rows,
        _autoband_select,
    )

    def py_cost(b, r):
        fp = fn = 0
        for sp in range(_LSH_GRID[0], 1000, 50):
            s = sp / 1000.0
            p = 1.0 - (1.0 - s**r) ** b
            if sp < _LSH_THRESHOLD:
                fp += math.floor(p * 1e9)
            else:
                fn += math.floor((1.0 - p) * 1e9)
        return fp + fn

    py_best = min(_AUTOBAND_CONFIGS, key=lambda br: (py_cost(*br), br[0]))
    rows = _autoband_choice_rows(spark)
    assert _autoband_select(rows) == py_best == (8, 4)

    fixed = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in QUERIES["dedup_minhash_lsh"].fn(spark, SF_SMALL).collect()
    }
    auto = QUERIES["dedup_minhash_lsh_autoband"].fn(spark, SF_SMALL).collect()
    assert {(r["doc_a"], r["doc_b"]): r["est_jaccard"] for r in auto} == fixed
    assert all((r["bands"], r["rows_per_band"]) == (8, 4) for r in auto)
