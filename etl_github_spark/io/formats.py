"""Source/sink format breadth: schema-preserving round-trips beyond the
reference's NDJSON-in / Delta-out pair.

A drop-in engine must also read and write the formats neighboring
systems hand it. Spark ships parquet/ORC (columnar, footer stats,
pushdown), JSON-lines and CSV (schemaful text interchange) natively —
one writer/reader pair covers all four declaratively. Text formats
carry caveats the helpers encode rather than leak to callers:

- CSV has no complex types (arrays/structs must be projected out or
  serialized first) and needs explicit header+schema to round-trip.
- JSON preserves structs/arrays but types come back as Spark infers
  them unless a schema is supplied — so reads here always re-apply the
  written schema instead of inferring.
- Timestamps round-trip through ISO-8601 in both text formats (UTC
  session pinned in session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

FORMATS = ("parquet", "orc", "json", "csv")


def write_format(df: DataFrame, path: str, fmt: str) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format: {fmt!r} (one of {FORMATS})")
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.option("header", True)
    w.save(path)


def read_format(
    spark: SparkSession, path: str, fmt: str, schema=None
) -> DataFrame:
    """Read back with the WRITTEN schema (text formats never infer)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format: {fmt!r} (one of {FORMATS})")
    r = spark.read.format(fmt)
    if fmt == "csv":
        r = r.option("header", True)
    if schema is not None:
        r = r.schema(schema)
    elif fmt in ("json", "csv"):
        raise ValueError(f"{fmt} reads require the written schema")
    return r.load(path)
