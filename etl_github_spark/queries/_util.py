"""Shared helpers for query implementations."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.tables import load_table
from ..session import tune


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a fixture table on a tuned session."""
    tune(spark)
    return load_table(spark, sf_dir, name)


def dsum(c: Column | str, scale: int = 4) -> Column:
    """Order-insensitive (exact) sum of a double column, returned as double.

    IEEE double summation is order-dependent; Spark and DuckDB reduce in
    different orders. Summing through DECIMAL(18,scale) is exact, so the
    result is bit-identical across engines regardless of parallelism —
    this is also the right call at 100 TB, where partial-aggregate order
    varies run to run.
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def dsum_sql(expr: str, scale: int = 4) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def davg(c: Column | str, scale: int = 4) -> Column:
    """Deterministic mean: exact decimal sum / count, evaluated in double."""
    c = F.col(c) if isinstance(c, str) else c
    return dsum(c, scale) / F.count(c)


def davg_sql(expr: str, scale: int = 4) -> str:
    return f"({dsum_sql(expr, scale)} / count({expr}))"


def dec(c: Column | str, p: int = 18, s: int = 2) -> Column:
    """Exact decimal view of a *raw* fixture column.

    Fixture money/measure columns are true 2-decimal values stored as
    double, so this cast is never near a rounding boundary and both
    engines agree bit-for-bit. Products of such decimals stay exact —
    use this (NOT a cast of a double product, whose double→decimal
    rounding differs between Spark and DuckDB) when summing computed
    measures like price*(1-discount).
    """
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(f"decimal({p},{s})")


def dec_sql(expr: str, p: int = 18, s: int = 2) -> str:
    return f"CAST({expr} AS DECIMAL({p},{s}))"
