"""Multimodal column plumbing (north-star §2.9).

Image/audio/video payloads are opaque ``BinaryType`` columns with typed
metadata structs. The Spark-side mechanics — schema, partition-aware
batch iteration, Arrow batch shapes, UDF signatures — are real and
tested; the codec itself is stubbed (decode libraries are not in this
environment) behind ``Codec``: a deterministic fake for tests, a
``NotImplementedError`` default for production clarity.

At 100 TB: payload bytes dominate row size, so operators here use
``mapInPandas`` (streaming Arrow batches, no full-partition
materialization), keep metadata-only plans payload-free via early
column pruning, and size batches with
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: media table: opaque payload + typed metadata (FIXTURES.md-style)
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("format", StringType(), True),
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("digest", StringType(), True),
        StructField("feat_0", IntegerType(), True),
        StructField("feat_1", IntegerType(), True),
    ]
)


@dataclass
class Codec:
    """Pluggable decode/feature hook. Production would wire Pillow/ffmpeg
    here; this environment ships only the deterministic fake."""

    fake: bool = False

    def decode_features(self, payload: bytes) -> tuple[int, int]:
        if not self.fake:
            raise NotImplementedError(
                "no media codec in this environment; use Codec(fake=True) "
                "or plug a real decoder"
            )
        # deterministic fake: two stable pseudo-features from the bytes
        d = hashlib.sha256(payload).digest()
        return int.from_bytes(d[:2], "big"), int.from_bytes(d[2:4], "big")

    def resize(self, payload: bytes, w: int, h: int) -> bytes:
        """Re-encode payload at (w, h). The fake derives a deterministic
        output whose size scales with the target area, so tests can
        assert payload-shape behavior without a real image library."""
        if not self.fake:
            raise NotImplementedError(
                "no media codec in this environment; use Codec(fake=True) "
                "or plug a real decoder"
            )
        seed = hashlib.sha256(payload + f"{w}x{h}".encode()).digest()
        out_len = max(1, (w * h) // 64)
        return (seed * (out_len // len(seed) + 1))[:out_len]


def extract_features(media: DataFrame, codec: Codec | None = None) -> DataFrame:
    """payload → per-item features via Arrow-batched mapInPandas.

    The UDF sees an iterator of pandas batches — bounded memory per task
    regardless of partition size, which is what makes this safe when a
    single partition holds gigabytes of payloads.
    """
    codec = codec or Codec()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                (None, None) if p is None else codec.decode_features(bytes(p))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [None if p is None else len(p) for p in pdf["payload"]],
                    "digest": [
                        None if p is None else hashlib.sha256(bytes(p)).hexdigest()
                        for p in pdf["payload"]
                    ],
                    "feat_0": [f[0] for f in feats],
                    "feat_1": [f[1] for f in feats],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_media(
    media: DataFrame, width: int, height: int, codec: Codec | None = None
) -> DataFrame:
    """payload → payload re-encoded at (width, height), meta updated —
    the resize stage of an image-preprocessing pipeline.

    Same Arrow-batched ``mapInPandas`` shape as :func:`extract_features`
    (bounded memory per task however large the partition); output schema
    is MEDIA_SCHEMA again so resize composes with every other media
    operator. Null payloads pass through as nulls.
    """
    codec = codec or Codec()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload = [
                None if p is None else codec.resize(bytes(p), width, height)
                for p in pdf["payload"]
            ]
            meta = [
                None
                if m is None
                else {"format": m["format"], "width": width, "height": height}
                for m in pdf["meta"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": out_payload, "meta": meta}
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def meta_summary(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate: never touches payload bytes, so the scan
    prunes the binary column entirely (check ReadSchema in explain)."""
    return (
        media.select("media_id", "meta.format", "meta.width", "meta.height")
        .groupBy("format")
        .agg(
            F.count("*").alias("n_items"),
            F.max("width").alias("max_width"),
            F.max("height").alias("max_height"),
        )
    )


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling stub: deterministic keep-every-Nth by media_id —
    the partition/plumbing shape of video frame sampling with the codec
    factored out."""
    return media.where(F.col("media_id") % every_n == 0)


def ingest_media_files(
    spark, path: str, glob: str = "*", recursive: bool = True
) -> DataFrame:
    """Directory of raw media files → MEDIA_SCHEMA frame, via Spark's
    built-in ``binaryFile`` source — the ingestion step that feeds every
    operator above when payloads arrive as files (image crawls, audio
    dumps) rather than as a parquet column.

    The source yields (path, modificationTime, length, content) with
    the payload read lazily per matched file; filtering happens at
    LISTING time via pathGlobFilter (no payload bytes are read for
    skipped files), and partition parallelism follows the file list, so
    a million-file crawl fans out across the cluster with no driver
    materialization. media_id is xxhash64 of the file path — stable
    across re-runs and independent of listing order; format is the
    lowercased file extension; width/height stay null until a real
    decode (Codec) fills them.
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", str(recursive).lower())
        .load(path)
    )
    ext = F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1))
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        F.col("content").alias("payload"),
        F.struct(
            ext.alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
        ).alias("meta"),
    )
