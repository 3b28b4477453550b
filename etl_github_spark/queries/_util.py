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
