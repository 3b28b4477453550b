"""Incremental ingest bookkeeping (SURVEY.md §2.8, T1-T4).

The reference derives its resume point from Delta add-action file stats
(max created_at of the ``comment`` table; parse_start_stop,
preprocess.py:178-190) and caps the window at now-1h so partially
published hours are never ingested (T2 — a hand-rolled completeness
watermark).

Spark equivalent: ``agg(max(created_at))`` on the sink — with Parquet
this resolves from footer min/max statistics, i.e. a metadata-only scan,
the same trick the reference plays on the transaction log.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..io.sink import read_table

EPOCH = dt.datetime(2024, 2, 29, tzinfo=dt.timezone.utc)  # reference default start
_HOUR = dt.timedelta(hours=1)


def _ceil_hour(t: dt.datetime) -> dt.datetime:
    floored = t.replace(minute=0, second=0, microsecond=0)
    return floored if t == floored else floored + _HOUR


def high_water_mark(spark: SparkSession, table_path: str) -> dt.datetime | None:
    """max(created_at) of an ingested table (stats-backed scan)."""
    try:
        row = read_table(spark, table_path).agg(F.max("created_at").alias("hw")).first()
    except Exception:  # table does not exist yet → full backfill
        return None
    if row is None or row["hw"] is None:
        return None
    hw = row["hw"]
    return hw.replace(tzinfo=dt.timezone.utc) if hw.tzinfo is None else hw


def parse_start_stop(
    spark: SparkSession,
    watermark_table_path: str,
    start: dt.datetime | None = None,
    stop: dt.datetime | None = None,
    now: dt.datetime | None = None,
) -> tuple[dt.datetime, dt.datetime]:
    """Resolve the (start, stop) ingest window (preprocess.py:178-190).

    start: explicit, else ceil-hour of the sink's high-water mark, else
    the epoch default. stop: explicit, else floor-hour(now) - 1h — the
    current hour is still being published upstream (T2).
    """
    if start is None:
        hw = high_water_mark(spark, watermark_table_path)
        start = _ceil_hour(hw) if hw is not None else EPOCH
    now = now or dt.datetime.now(dt.timezone.utc)
    if stop is None:
        stop = now.replace(minute=0, second=0, microsecond=0) - _HOUR
    return start, stop
