"""End-to-end GH Archive ingest: manifest → parse → extract → sink.

The reference hand-schedules per-file futures with retries and barriers
(workflow, preprocess.py:247-266). Spark-first, the whole thing is one
declarative plan per table over the full file list: partition-per-file
parallelism, retries, and barriers are the engine's job (SURVEY.md §3).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from ..io.sink import write_table
from .extract import EXTRACTORS, parse_raw_lines

_HOUR = dt.timedelta(hours=1)


def list_files(
    start: dt.datetime,
    stop: dt.datetime,
    template: str = "https://data.gharchive.org/{:%Y-%m-%d-}{}.json.gz",
) -> list[str]:
    """Hourly file manifest for [start, stop) (preprocess.py:193-196).

    GH Archive names hours without zero-padding ("2024-02-29-3.json.gz").
    """
    out = []
    t = start.replace(minute=0, second=0, microsecond=0)
    while t < stop:
        out.append(template.format(t, t.hour))
        t += _HOUR
    return out


def read_raw(spark: SparkSession, paths: list[str]) -> DataFrame:
    """NDJSON(.gz) scan (S1/S2): gzip decoded by extension; one partition
    per gz file (gzip is not splittable — same per-file parallelism the
    reference gets from client.map, preprocess.py:260). Plain-text files
    split at spark.sql.files.maxPartitionBytes."""
    return spark.read.text(paths)


def extract_tables(raw_lines: DataFrame) -> dict[str, DataFrame]:
    """Parsed events → the six normalized DataFrames.

    The parsed events plan is reused by all six extractors; Spark scans
    the input once per action, so callers ingesting all tables should
    ``.persist()`` the parsed frame (gha.ipynb cell 23's shared-scan
    idiom, SURVEY.md §4)."""
    events = parse_raw_lines(raw_lines)
    return {name: fn(events) for name, fn in EXTRACTORS.items()}


def ingest_files(
    spark: SparkSession,
    paths: list[str],
    outdir: str,
    mode: str = "append",
    fmt: str | None = None,
) -> dict[str, str]:
    """Read hourly NDJSON files and append all six tables to ``outdir``.

    One cached parse feeds six partitioned writes — the Spark shape of
    process_file + write_delta (preprocess.py:143-175).
    """
    from pyspark import StorageLevel

    raw = read_raw(spark, paths)
    events = parse_raw_lines(raw).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        out = {}
        for name, fn in EXTRACTORS.items():
            path = f"{outdir}/{name}"
            write_table(fn(events), path, mode=mode, fmt=fmt)
            out[name] = path
        return out
    finally:
        events.unpersist()
