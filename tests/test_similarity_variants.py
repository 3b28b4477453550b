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
