"""SparkSession factory tuned for the engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); the same
conf set is what we'd ship on a 1000-executor cluster — AQE on (runtime
re-planning, skew-join splitting, partition coalescing), broadcast
threshold sized for dimension tables, UTC session time zone (reference
parses tz-aware ISO-8601 timestamps; SURVEY.md §7 risk register).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime-settable confs applied to *any* session (including a session the
#: driver harness hands us) — safe to set after the JVM is up.
RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # dim tables (region/nation/customer at test SF; repo-counts table in the
    # reference's flagship join, preprocess.py:216) should broadcast.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # fixture events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
    # reader rejects; read as long and convert in the loader (io.tables).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Every oracle is written against Spark 4 ANSI semantics (try_cast /
    # F.get / bounded sequence() keep the plans throw-free); pin it so a
    # legacy-configured driver session can't flip null-vs-sentinel
    # behaviors (e.g. non-ANSI size(NULL)=-1) under the same hashes.
    "spark.sql.ansi.enabled": "true",
    # At 100 TB this is sized per-cluster; for local[32] keep one wave of
    # tasks per stage. Runtime-settable, so a vanilla driver session gets
    # the same value the tuned builder uses — batch plans are insensitive
    # (AQE coalesces), but streaming state-store partitioning is fixed at
    # query start and would otherwise default to 200 tiny state partitions.
    "spark.sql.shuffle.partitions": "32",
}

#: Builder-time confs (need to be set before the JVM starts).
BUILDER_CONF = {
    "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (idempotent)."""
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf may be static in some envs
            pass
    return spark


def get_spark(app_name: str = "etl-github-spark", master: str | None = None) -> SparkSession:
    """Create (or reuse) a tuned SparkSession."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    b = SparkSession.builder.appName(app_name).master(master)
    for k, v in {**BUILDER_CONF, **RUNTIME_CONF}.items():
        b = b.config(k, v)
    return tune(b.getOrCreate())
