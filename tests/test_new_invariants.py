"""Structural invariants of the round-4 late-addition operators —
properties the DuckDB oracle can't state (it replays the same
computation, so a shared logic error passes parity; these pin the math
against its own contracts instead).
"""

from __future__ import annotations

from etl_github_spark.queries.registry import QUERIES

from .conftest import SF_ORACLE


def _rows(spark, name):
    return QUERIES[name].fn(spark, SF_ORACLE).collect()


def test_countmin_never_undercounts(spark):
    """CM sketch guarantee: estimate >= exact for every probed token,
    and the overcount column is exactly their difference."""
    rows = _rows(spark, "agg_countmin_tokens")
    assert rows
    for r in rows:
        assert r.cm_est >= r.exact_cnt, r
        assert r.overcount == r.cm_est - r.exact_cnt


def test_quantile_sketch_monotone_and_merge_consistent(spark):
    """p50 <= p90 <= p99 per scope, and the GLOBAL sketch's n equals
    the sum of the per-source n (the merge lost nothing)."""
    rows = _rows(spark, "agg_quantile_sketch_rollup")
    g = [r for r in rows if r.scope == "GLOBAL"]
    src = [r for r in rows if r.scope != "GLOBAL"]
    assert len(g) == 1 and src
    for r in rows:
        assert r.p50_est <= r.p90_est <= r.p99_est, r
    assert g[0].n == sum(r.n for r in src)


def test_survival_curve_monotone_with_censoring(spark):
    """Survival counts are non-increasing in k, survived <= at-risk
    everywhere, and k=0 has every user at risk and surviving."""
    rows = sorted(_rows(spark, "analytics_survival_curve"), key=lambda r: r.day_k)
    assert rows and rows[0].day_k == 0
    assert rows[0].n_at_risk == rows[0].n_survived  # everyone survives day 0
    prev_ar, prev_sv = None, None
    for r in rows:
        assert r.n_survived <= r.n_at_risk, r
        if prev_ar is not None:
            assert r.n_at_risk <= prev_ar and r.n_survived <= prev_sv, r
        prev_ar, prev_sv = r.n_at_risk, r.n_survived


def test_activity_bitmap_counts_conserve_users(spark):
    """Histogram buckets partition the user set: sum(n_users) equals the
    distinct active users, active_days stays within the 64-bit window,
    and week-intersection counts never exceed the bucket."""
    from pyspark.sql import functions as F

    from etl_github_spark.io.tables import load_table

    rows = _rows(spark, "analytics_activity_bitmap")
    n_users = (
        load_table(spark, SF_ORACLE, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.n_users for r in rows) == n_users
    for r in rows:
        assert 1 <= r.active_days <= 63  # bit 63 excluded (sign bit)
        assert 0 <= r.n_both_weeks <= r.n_users


def test_hits_scores_bounded_by_renormalization(spark):
    """The per-round integer renormalization bounds every emitted score:
    score div (max div S) keeps values near S regardless of degree —
    the overflow contract the docstring claims."""
    rows = _rows(spark, "graph_hits_bipartite")
    assert rows
    roles = {r.role for r in rows}
    assert roles == {"authority", "hub"}
    for r in rows:
        assert 0 <= r.score_q6 <= 3_000_000, r  # ~2x the 1e6 scale + slack


def test_fk_orphans_covers_every_edge_and_no_orphans_in_fixture(spark):
    """All seven audited edges report, each with n_rows equal to the
    child table's count; the TPC-H-shaped fixture is referentially
    intact so every orphan count is zero."""
    from etl_github_spark.io.tables import load_table
    from etl_github_spark.queries.validate import _FK_EDGES

    rows = {r.fk_edge: r for r in _rows(spark, "quality_fk_orphans")}
    assert set(rows) == {e[0] for e in _FK_EDGES}
    for label, child, _, _, _ in _FK_EDGES:
        assert rows[label].n_rows == load_table(spark, SF_ORACLE, child).count()
        assert rows[label].n_orphans == 0, label


def test_expectations_full_row_accounting(spark):
    """Every check row carries the same n_rows (single shared scan) and
    violations never exceed the row count."""
    rows = _rows(spark, "quality_expectations")
    assert len(rows) == 8
    ns = {r.n_rows for r in rows}
    assert len(ns) == 1
    for r in rows:
        assert 0 <= r.n_violations <= r.n_rows
        assert r.viol_permille == (1000 * r.n_violations) // r.n_rows


def test_winsorized_mean_between_cutoffs(spark):
    """A winsorized mean is clamped by construction: lo <= mean <= hi,
    and cutoffs are ordered."""
    for r in _rows(spark, "stat_winsorized_mean"):
        assert r.lo <= r.hi
        assert r.lo <= r.winsor_mean <= r.hi, r


def test_pca_power_vector_is_unit_scale_fixed_point(spark):
    """The iterated vector's max |component| sits at the 1e6 fixed-point
    scale (the renormalization contract) and the eigenvalue estimate is
    positive for a Gram (PSD) matrix."""
    rows = _rows(spark, "stat_embedding_pca_power")
    assert len(rows) == 64
    mx = max(abs(r.v_q6) for r in rows)
    assert 900_000 <= mx <= 2_100_000  # ~S, slack for div truncation
    assert rows[0].eig_scaled > 0


def test_theil_sen_slope_within_pairwise_extremes(spark):
    """The median slope must lie within the min/max pairwise slopes and
    the pair count must be n*(n-1)/2."""
    r = _rows(spark, "stat_theil_sen_daily_trend")[0]
    assert r.n_pairs == r.n_days * (r.n_days - 1) // 2
    # a median of slopes is itself a pairwise slope: finite, and for a
    # roughly-stationary daily series it stays near zero while OLS may
    # wander — only sanity-bound it here
    assert abs(r.ts_slope) < 1e6 and abs(r.ols_slope) < 1e6


def test_frame_sample_bounded_fanout_and_timestamps(spark):
    """Every clip emits ceil(n_frames/stride) rows, indices stay below
    n_frames, and timestamps are consistent with fps."""
    import collections

    rows = _rows(spark, "multimodal_frame_sample")
    per = collections.defaultdict(list)
    for r in rows:
        per[r.doc_id].append(r)
    for doc, rs in per.items():
        nf, fps = rs[0].n_frames, rs[0].fps
        assert len(rs) == (nf + 9) // 10
        for r in rs:
            assert 0 <= r.frame_idx < nf
            assert r.ts_ms == (1000 * r.frame_idx) // fps
            assert r.duration_ms == (1000 * nf) // fps


def test_mad_anomaly_flags_match_definition(spark):
    """Flags recompute from the emitted med/mad columns — the flag can
    never disagree with its own published statistics."""
    for r in _rows(spark, "trend_anomaly_mad"):
        expect = 1 if 2 * abs(r.n_events - r.med) > 5 * max(r.mad, 1) else 0
        assert r.is_anomaly == expect, r


def test_benford_permille_accounting(spark):
    """Digits 1-9 all present, observed permille consistent with counts,
    deviations equal observed minus expected."""
    rows = _rows(spark, "stat_benford_first_digit")
    assert {r.first_digit for r in rows} == set(range(1, 10))
    total = sum(r.n for r in rows)
    for r in rows:
        assert r.obs_permille == (1000 * r.n) // total
        assert r.dev_permille == r.obs_permille - r.benford_permille


def test_interval_overlap_bucketing_adds_no_duplicates(spark):
    """The day-bucketed equi-join must agree with a direct (unbucketed)
    overlap join computed on the same session frame — bucketing is an
    execution strategy, not a semantics change."""
    from pyspark.sql import functions as F

    from etl_github_spark.io.tables import load_table

    e = load_table(spark, SF_ORACLE, "events")
    s = e.groupBy(F.session_window("ts", "1 day").alias("w"), "user_id").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    days = e.select(F.to_date("ts").alias("day")).distinct()
    c = days.select(
        "day",
        (F.col("day").cast("timestamp") + F.expr("INTERVAL 12 HOURS")).alias("c_start"),
        (F.col("day").cast("timestamp") + F.expr("INTERVAL 14 HOURS")).alias("c_end"),
    )
    direct = (
        s.crossJoin(c)
        .where((F.col("s_start") < F.col("c_end")) & (F.col("s_end") >= F.col("c_start")))
        .groupBy("day")
        .agg(F.count("*").alias("n_sessions"), F.countDistinct("user_id").alias("n_users"))
    )
    want = {(r.day, r.n_sessions, r.n_users) for r in direct.collect()}
    got = {
        (r.day, r.n_sessions, r.n_users)
        for r in _rows(spark, "join_interval_overlap")
    }
    assert got == want


def test_minhash_xxhash_variant_pinned_to_canonical_family(spark):
    """The unregistered xxhash64 production LSH variant must behave like
    the registry-canonical md5/affine family on the invariants that are
    hash-family-independent: identical output schema, est_jaccard in
    [0.5, 1], doc_a < doc_b, and — deterministically, for ANY correct
    MinHash-LSH — every exact-duplicate pair (true Jaccard == 1.0, so
    identical signatures collide in every band) surfaced with est 1.0.
    The fixture has no exact dups, so the test plants them: each doc is
    unioned with a copy under doc_id+OFFSET."""
    from pyspark.sql import functions as F

    from etl_github_spark.io.tables import load_table
    from etl_github_spark.queries.dedup import (
        _md5_minhash_candidates,
        _xxhash_lsh_candidates,
    )

    base = (
        load_table(spark, SF_ORACLE, "documents")
        .select("doc_id", "text")
        .where(F.size(F.split("text", " ")) >= 3)
        .limit(100)
    )
    offset = 10_000_000
    docs = base.unionByName(
        base.select((F.col("doc_id") + offset).alias("doc_id"), "text")
    )
    planted = {(r.doc_id, r.doc_id + offset) for r in base.collect()}
    for name, cand in (
        ("md5", _md5_minhash_candidates(docs, with_est=True)),
        ("xxhash", _xxhash_lsh_candidates(docs)),
    ):
        rows = cand.where(F.col("est_jaccard") >= 0.5).collect()
        assert rows and rows[0].__fields__ == ["doc_a", "doc_b", "est_jaccard"]
        got = {(r.doc_a, r.doc_b): r.est_jaccard for r in rows}
        for r in rows:
            assert 0.5 <= r.est_jaccard <= 1.0 and r.doc_a < r.doc_b
        for pair in planted:
            assert got.get(pair) == 1.0, (name, pair)


def test_winnowing_guarantee_shared_run_yields_shared_fingerprint(spark):
    """The winnowing theorem: two documents sharing a token run of
    length >= k+w-1 (= 6 here) MUST share at least one selected
    fingerprint — the recall contract dedup_winnow_overlap's candidate
    stage relies on. Planted docs share exactly one 6-token run inside
    otherwise-disjoint text; a third doc with no overlap must share
    nothing."""
    from etl_github_spark.queries.text_ext import (
        _WINNOW_K,
        _WINNOW_W,
        text_winnow_fingerprints,
    )

    assert _WINNOW_K + _WINNOW_W - 1 == 6
    run = "alpha bravo charlie delta echo foxtrot"
    docs = spark.createDataFrame(
        [
            (1, f"one two three {run} four five six"),
            (2, f"seven eight nine ten {run} eleven twelve"),
            (3, "totally different words with no shared run at all here"),
        ],
        "doc_id long, text string",
    )
    # route the fixture loader at our in-memory frame
    import etl_github_spark.queries.text_ext as te

    orig_T = te.T
    te.T = lambda _s, _d, _n: docs
    try:
        rows = text_winnow_fingerprints(spark, "ignored").collect()
    finally:
        te.T = orig_T
    by_doc = {d: set() for d in (1, 2, 3)}
    for r in rows:
        by_doc[r["doc_id"]].add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared 6-token run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])


def test_bloom_prefilter_prunes_without_false_negatives(spark):
    """The join bloom: (a) passes EVERY true-matching fact row (no
    false negatives — the correctness property the exact join cannot
    repair), (b) actually prunes (pass rate well below 1 for a
    selective key set), (c) the prefiltered exact join equals the
    plain join exactly."""
    from pyspark.sql import functions as F

    from etl_github_spark.queries._util import T
    from etl_github_spark.queries.joins import bloom_prefilter

    sf = "/root/testdata/sf0.001"
    li = T(spark, sf, "lineitem").select("l_suppkey", "l_orderkey")
    # a selective key set: suppliers with s_suppkey % 7 == 0 (~14%)
    keys = (
        T(spark, sf, "supplier")
        .where(F.col("s_suppkey") % 7 == 0)
        .select("s_suppkey")
    )
    pref = bloom_prefilter(li, "l_suppkey", keys, "s_suppkey")

    total = li.count()
    passed = pref.count()
    true_match = li.join(keys, li.l_suppkey == keys.s_suppkey, "left_semi").count()
    assert passed >= true_match  # no false negatives
    assert passed < total * 0.6  # genuinely prunes a selective probe

    exact_after = (
        pref.join(keys, pref.l_suppkey == keys.s_suppkey)
        .groupBy("l_suppkey")
        .count()
        .collect()
    )
    plain = (
        li.join(keys, li.l_suppkey == keys.s_suppkey)
        .groupBy("l_suppkey")
        .count()
        .collect()
    )
    assert sorted(map(tuple, exact_after)) == sorted(map(tuple, plain))


def test_bloom_prefilter_rejects_mismatched_key_types(spark):
    """xxhash64 is type-sensitive (int 5 and bigint 5 hash to different
    values), so a type mismatch between the fact and key columns would
    silently fail every membership probe — dropping every true match
    before the exact join can repair it. The helper must raise, never
    guess a cast."""
    import pytest
    from pyspark.sql import functions as F

    from etl_github_spark.queries._util import T
    from etl_github_spark.queries.joins import bloom_prefilter

    sf = "/root/testdata/sf0.001"
    li = T(spark, sf, "lineitem").select(
        F.col("l_suppkey").cast("int").alias("l_suppkey")
    )
    keys = T(spark, sf, "supplier").select("s_suppkey")  # bigint
    with pytest.raises(TypeError, match="type-sensitive"):
        bloom_prefilter(li, "l_suppkey", keys, "s_suppkey")


def test_degenerate_group_guards_null_on_both_engines(spark):
    """Constant-valued / single-row groups must yield NULL — never an
    engine-version-sensitive 0/0 (NULL vs NaN vs ANSI error) — from
    the shared shape/correlation expressions. The guard text is the
    SAME string both engines evaluate, so assert both."""
    import duckdb

    from etl_github_spark.queries.aggregates import _KURT_EXPR, _SKEW_EXPR
    from etl_github_spark.queries.stats import _RHO_EXPR, _TAU_EXPR

    cases = [
        # constant x = 3 over n = 5 rows: s_k = 5 * 3^k → m2 = 0
        (f"SELECT {_SKEW_EXPR} AS v FROM "
         "(SELECT 5 AS n, 15 AS s1, 45 AS s2, 135 AS s3, 405 AS s4)"),
        (f"SELECT {_KURT_EXPR} AS v FROM "
         "(SELECT 5 AS n, 15 AS s1, 45 AS s2, 135 AS s3, 405 AS s4)"),
        # all-tied x ranks: sxx = 0
        (f"SELECT {_RHO_EXPR} AS v FROM "
         "(SELECT 4 AS n, 0 AS sxy, 0 AS sxx, 20 AS syy)"),
        # single-day series and fully-tied series
        (f"SELECT {_TAU_EXPR} AS v FROM "
         "(SELECT 1 AS n, 0 AS c, 0 AS d, 0 AS ty)"),
        (f"SELECT {_TAU_EXPR} AS v FROM "
         "(SELECT 5 AS n, 0 AS c, 0 AS d, 10 AS ty)"),
    ]
    con = duckdb.connect()
    for q in cases:
        assert spark.sql(q).first()["v"] is None, q
        assert con.sql(q).fetchone()[0] is None, q
    con.close()
