"""Streaming deduplication: exact dedup over an unbounded stream.

The batch dedup operators (queries/dedup.py) assume the corpus is
finite; a training-data ingest pipeline sees documents arrive
continuously and must drop re-crawls/re-posts on the fly. Spark-native
that is ``dropDuplicates`` under an event-time watermark: state is the
set of keys seen inside the watermark horizon, pruned by the engine, so
memory is bounded by (arrival rate × watermark) instead of the full
history — the only formulation that survives at 100 TB/day.

Two variants with different guarantees:

- :func:`stream_dedup_exact` — ``dropDuplicates([key, bucket])``
  keyed by (key, truncated event time): a duplicate arriving within the
  same bucket is dropped; one arriving in a later bucket re-emits.
  Deterministic state size, at-most-one emission per bucket.
- :func:`stream_dedup_within_watermark` —
  ``dropDuplicatesWithinWatermark([key])``: drops any duplicate whose
  event time lands within the watermark delay of the first-seen row,
  regardless of window alignment (Spark 3.5+ operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup_exact(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "created_at",
    watermark: str = "1 hour",
    bucket: str = "hour",
) -> DataFrame:
    """First occurrence per (keys, event-time bucket); duplicates within
    the bucket are dropped, state pruned past the watermark.

    The bucket is a ``date_trunc`` unit, not ``F.window()``: the window
    function mints a *second* event-time column, which streaming
    dedup rejects ("more than one event time column"); a truncated
    timestamp is an ordinary column and keys the state just as well.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .withColumn("__w", F.date_trunc(bucket, F.col(ts_col)))
        .dropDuplicates([*keys, "__w"])
        .drop("__w")
    )


def stream_dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "created_at",
    watermark: str = "1 hour",
) -> DataFrame:
    """Window-alignment-free dedup: any duplicate arriving within the
    watermark delay of the first-seen row is dropped."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
