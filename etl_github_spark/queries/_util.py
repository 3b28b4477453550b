"""Shared helpers for query implementations.

Cross-engine float determinism: IEEE double summation is
order-dependent, and Spark/DuckDB reduce in different orders, so every
double *reduction* here goes through exact fixed-point integers. The
fixture money/measure columns are true 2-decimal values stored as
double, so ``round(x * 10^s)`` recovers the exact scaled integer in both
engines (the double sits within ~1e-11 of the integer — never near a
rounding tie). Long sums are exact and order-insensitive, and ~2.5×
faster than Spark's BigDecimal aggregation path.

Overflow envelope: int64 carries ~9.2e18. A 2-decimal money column
(≤1e7) summed over 1e9 rows stays ≤1e18 — fine through sf100-scale
fixtures; genuinely unbounded 100 TB rollups would pre-aggregate per
partition or fall back to decimal(38,s).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.tables import load_table
from ..session import tune


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a fixture table on a tuned session."""
    tune(spark)
    return load_table(spark, sf_dir, name)


def par(df: DataFrame, n: int | None = None) -> DataFrame:
    """Spread a small single-partition scan across cores before
    compute-heavy per-row work (shingling, hashing, n-gram explode).

    The fixture parquet files are one row group, so every downstream op
    runs on one task until a shuffle; a cheap round-robin repartition
    unlocks the full local[N] (or cluster) width. Only use ahead of
    per-row work that dwarfs one extra exchange of the (small) input —
    at 100 TB inputs already arrive in thousands of partitions and
    callers would skip this.
    """
    n = n or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def fxp(c: Column | str, scale: int = 2) -> Column:
    """Exact scaled-integer view of a fixed-decimal double column."""
    return F.round(_c(c) * (10**scale)).cast("long")


def fxp_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(round(({expr}) * {10 ** scale}) AS BIGINT)"


def dsum(c: Column | str, scale: int = 2) -> Column:
    """Order-insensitive (exact) sum of a fixed-decimal double column,
    returned as double — bit-identical across engines and run orders."""
    return F.sum(fxp(c, scale)) / float(10**scale)


def dsum_sql(expr: str, scale: int = 2) -> str:
    # CAST(.. AS BIGINT) collapses DuckDB's INT128 sum to int64 so the
    # int→double conversion is the same correctly-rounded op as Spark's.
    return f"(CAST(sum({fxp_sql(expr, scale)}) AS BIGINT) / {float(10 ** scale)})"


def davg(c: Column | str, scale: int = 2) -> Column:
    """Deterministic mean: exact integer sum / count, evaluated in double."""
    return dsum(c, scale) / F.count(_c(c))


def davg_sql(expr: str, scale: int = 2) -> str:
    return f"({dsum_sql(expr, scale)} / count({expr}))"


#: Target rows per shuffle task inside iterative refinement loops.
#: Originally 1M (sized for 16-32 MB of narrow int64 rows), which
#: collapsed the 1.17M-edge purchase-graph loops to 1-2 tasks of REAL
#: per-round join/aggregate work — measured SLOWER than full width
#: (graph_label_propagation 5.4 → 9 s at p=1). 100k rows keeps genuinely
#: tiny frames (CC labels, DBSCAN eps-graphs: ≤ 10k rows) at the
#: measured-optimal single task while string-keyed edge loops fan out
#: to ~½ wave (pagerank 3.9 → 3.1 s, modularity 5.5 → 4.3 s, BFS
#: 4.6 → 3.8 s at sf0.1; see OPTIMIZATION_r13.md).
_LOOP_ROWS_PER_TASK = 100_000


@contextmanager
def loop_shuffle(spark: SparkSession, n_rows: int):
    """Scale-adaptive shuffle width for an iterative refinement loop
    (CC / PageRank / LPA / BFS / k-core ... — many tiny rounds over one
    materialized frame of known size).

    The session-wide ``spark.sql.shuffle.partitions`` is sized for one
    wave of full-scan work; an iterative loop re-shuffles a (usually
    far smaller) frontier/label frame every round, and with AQE each
    exchange becomes its own scheduled stage — at fixture scale the
    fixed per-task/per-stage cost dominates the round (measured: 5 CC
    rounds over a 4k-edge graph take 14.1 s at 32 shuffle partitions
    vs 3.7 s at 1). Deriving the width from the MEASURED row count of
    the loop's frame (guide §2: "derive from input size, not a
    constant tuned for either local mode or the cluster") keeps local
    rounds at single-task cost while a 100 TB edge list still fans out
    to ``rows / _LOOP_ROWS_PER_TASK`` tasks (capped at 8 waves of the
    cluster). Restores
    the session value on exit — same set/restore discipline
    `streaming_bridge._replay` uses for state-store sizing. Results
    are partitioning-independent by construction (all loop reductions
    here are min/max/sum over exact types), so this is layout-only.
    """
    sc = spark.sparkContext
    p = max(1, min(int(n_rows) // _LOOP_ROWS_PER_TASK + 1,
                   sc.defaultParallelism * 8))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", str(p))
    if p == 1:
        # One partition leaves AQE nothing to adapt (no coalescing, no
        # skew split within a chosen-single partition), but each
        # exchange still becomes a separately scheduled query stage —
        # measured 3.7 → 2.1 s over the same 5 CC rounds. Only at the
        # provably-degenerate width; any multi-partition loop keeps AQE.
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
