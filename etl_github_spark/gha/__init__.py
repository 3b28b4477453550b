"""GH Archive ingest path: NDJSON → six normalized, date-partitioned tables.

Spark-first re-expression of the reference ETL (preprocess.py:40-175):
the Dask bag-of-dicts / per-file pandas machinery collapses into one
declarative plan per table — ``read.text`` → ``from_json`` (corrupt →
null) → per-type filters → nested-field projections (+ ``explode`` for
push commits) → ``write.partitionBy("date")``.
"""

from .schemas import RAW_EVENT_SCHEMA, TABLE_SCHEMAS  # noqa: F401
from .extract import EXTRACTORS, parse_raw_lines  # noqa: F401
from .pipeline import ingest_files, list_files  # noqa: F401
