"""Lakehouse sinks: date-partitioned append/overwrite + compaction.

The reference writes Delta tables via ``write_deltalake(mode="append",
partition_by="date")`` and rewrites query results wholesale
(preprocess.py:165-175,226-230). Spark-side this is
``df.write.format(...).mode(...).partitionBy("date")``. Delta is used
when the delta-spark package is importable; otherwise plain Parquet
preserves the same layout and semantics (SURVEY.md §1.4) — the
``_delta_log`` transaction features degrade to directory semantics.

The reference's append+retry design can double-append on retry
(preprocess.py:261; SURVEY.md §7 risk register); Spark task retries plus
atomic job commit make a single ``write`` per batch idempotent-safe, so
no retry loop appears here by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def delta_available() -> bool:
    try:  # pragma: no cover - environment probe
        import delta  # noqa: F401

        return True
    except Exception:
        return False


_FORMAT = "delta" if delta_available() else "parquet"


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: tuple[str, ...] = ("date",),
    fmt: str | None = None,
) -> None:
    """Append/overwrite a date-partitioned table (S4/S6)."""
    w = df.write.format(fmt or _FORMAT).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_table(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    """Delta/Parquet table scan (S5)."""
    return spark.read.format(fmt or _FORMAT).load(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int = 32,
    sort_cols: tuple[str, ...] = (),
) -> None:
    """Bucketed managed-table writer: pre-shuffles once so later equi-joins
    and aggregations on ``bucket_cols`` are shuffle-free — the 100 TB
    answer to repeated fact-fact joins (e.g. lineitem ⋈ orders on the
    order key)."""
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def compact_table(spark: SparkSession, path: str, target_files_per_partition: int = 1) -> None:
    """Small-file compaction (S7, preprocess.py:199-206).

    With Delta this is OPTIMIZE; for plain Parquet we rewrite each date
    partition coalesced. Hourly appends create 24 small files/day — at
    100 TB an uncompacted table turns scans into metadata storms, which
    is exactly why the reference compacts after every ingest batch.
    """
    if _FORMAT == "delta":  # pragma: no cover - delta not present in CI env
        from delta.tables import DeltaTable

        DeltaTable.forPath(spark, path).optimize().executeCompaction()
        return
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    (
        df.repartition(target_files_per_partition, "date")
        .write.mode("overwrite")
        .partitionBy("date")
        .parquet(tmp)
    )
    # atomic-ish swap via filesystem rename (local/HDFS; object stores
    # would use the Delta path above instead)
    import shutil

    shutil.rmtree(path)
    shutil.move(tmp, path)
