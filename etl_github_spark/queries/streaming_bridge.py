"""Structured Streaming execution under the driver hash.

The streaming modules (`streaming/*.py`) are pytest-verified — their
semantics are stateful and incremental, which a one-shot SQL oracle
cannot watch happen. But a bounded replay CAN be hashed: run the REAL
streaming machinery (file source → event-time window aggregation →
sink) over the fixture with `Trigger.AvailableNow`, let it terminate,
and compare the materialized result to the closed-form batch answer.
That pins the micro-batch engine end-to-end — source discovery,
event-time windowing, watermark bookkeeping, sink commit — not just a
batch query that happens to share the SQL shape (the same move
`lake_scd2_history` / `lake_cdc_apply` make for the mutating sinks).
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from ._util import T
from .registry import query

#: unique-but-deterministic memory-sink names (queries may run several
#: times per session; timestamps/uuids would break replay determinism).
_SINK_IDS = itertools.count()


@query(
    "stream_hourly_counts_replay",
    sql="""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
    """,
    tags=("streaming", "window", "bridge"),
)
def stream_hourly_counts_replay(spark, sf_dir):
    """Event-time tumbling-hour counts computed by the STREAMING engine:
    `readStream` file source over the events fixture, 1-hour windows
    with a 1-hour watermark, complete-mode memory sink, AvailableNow
    trigger — the bounded replay of `streaming/pipeline.py::
    stream_windowed_counts`. The oracle is the batch closed form, so
    the driver hash asserts the streaming replay CONVERGES to the batch
    answer (the streaming-batch duality every downstream consumer
    relies on). Spark's hour windows are epoch-aligned == date_trunc.

    In production the same plan runs unbounded with an append-mode
    parquet sink and the watermark closing windows incrementally; the
    replay form is what a backfill runs, and AvailableNow is exactly
    the backfill trigger (T3/T4, reference's catch-up loop). State is
    bounded by the watermark horizon at any corpus size; the fixture
    replay arrives as one micro-batch per file-source batch.

    ts arrives as parquet TIMESTAMP(NANOS) → long (nanosAsLong), then
    integer-truncates to micros exactly like the batch loader
    (`io/tables.py`), so streaming and batch see identical timestamps.
    """
    from pyspark.sql.types import LongType

    T(spark, sf_dir, "events")  # tune() the session (nanosAsLong, UTC)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(raw_schema["ts"].dataType, LongType):
        # nanos surfaced as long → truncate to micros like io/tables.py
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        # engine already narrowed nanos → timestamp (micro truncation)
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("n"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n")
    )
    sink = f"stream_hourly_replay_{next(_SINK_IDS)}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    rows = [
        (r["hour_start"], r["event_type"], r["n"])
        for r in spark.sql(f"SELECT * FROM {sink}").collect()
    ]
    spark.catalog.dropTempView(sink)
    return spark.createDataFrame(rows, "hour_start timestamp, event_type string, n long")
