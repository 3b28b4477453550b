#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>}

Each query materializes via the `noop` sink (full execution, no
driver-side collect overhead) after a warm-up of the session JVM.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from etl_github_spark.queries.registry import QUERIES
from etl_github_spark.session import get_spark

#: headline set: the reference-shaped flagship + one representative per
#: operator family, weighted toward the shuffle/join/explode-heavy ops
#: whose scaling actually matters.
HEADLINE = [
    "flagship_popular_user_clicks",
    "q1_pricing_summary",
    "join_fact_fact_revenue",
    "join_left_outer_agg",
    "window_rank_topn_per_group",
    "agg_multi_shared_scan",
    "trend_hourly_by_type",
    "text_word_freq",
    "text_bigram_freq",
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "sim_topk_bruteforce",
    "sim_lsh_bucketed_topk",
]


def run_query(spark, name: str, sf_dir: str) -> float:
    """Steady-state timing: one untimed warm-up (whole-stage codegen JIT,
    parquet footer caching), then one timed run — the per-query constant
    that matters when the same plan runs over thousands of partitions."""
    fn = QUERIES[name].fn
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("etl-github-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warm-up on a trivial action (not counted)
    spark.range(1000).selectExpr("sum(id)").write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        try:
            timings[name] = round(run_query(spark, name, sf_dir), 3)
        except Exception as e:  # keep the bench line parseable on failure
            print(f"BENCH ERROR {name}: {e}", file=sys.stderr)
            timings[name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
