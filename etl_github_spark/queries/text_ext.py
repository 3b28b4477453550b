"""Training-data preparation operators beyond basic text analysis:
token-window chunking (sequence packing) and deterministic dataset
splitting. Registered after the driver's verification window (see
queries/__init__.py); oracle-checked locally by test_oracle_parity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import T
from .registry import query

_CHUNK = 32  # tokens per training chunk


@query(
    "text_chunk_tokens",
    sql=f"""
    SELECT doc_id,
           CAST(t.i AS INTEGER) AS chunk_id,
           array_to_string(toks[(t.i * {_CHUNK} + 1):((t.i + 1) * {_CHUNK})], ' ')
             AS chunk_text,
           CAST(least({_CHUNK}, len(toks) - t.i * {_CHUNK}) AS INTEGER) AS n_tokens
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         range(0, 100000) t(i)
    WHERE t.i * {_CHUNK} < len(toks)
    """,
    tags=("text", "training-prep"),
)
def text_chunk_tokens(spark, sf_dir):
    """Fixed-size token-window chunking — the sequence-packing step of a
    training pipeline: each document becomes ceil(n/K) rows of at most
    K tokens, the unit LLM training shards are built from.

    Pure per-row explode (1 → ceil(n/K) rows, no shuffle); the chunk
    slice is taken from the materialized token array, so the document
    is tokenized once however many chunks it yields. The oracle's
    unbounded range() is constrained by the same i·K < len predicate.
    """
    k = _CHUNK
    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    n_chunks = F.ceil(F.size("toks") / F.lit(k)).cast("int")
    return (
        d.select(
            "doc_id",
            "toks",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.concat_ws(" ", F.slice("toks", F.col("chunk_id") * k + 1, k)).alias(
                "chunk_text"
            ),
            F.least(F.lit(k), F.size("toks") - F.col("chunk_id") * k)
            .cast("int")
            .alias("n_tokens"),
        )
    )


@query(
    "text_train_val_split",
    sql="""
    SELECT s.split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT n_chars,
             CASE WHEN substr(md5(text), 1, 1) BETWEEN '0' AND 'b'
                  THEN 'train' ELSE 'val' END AS split
      FROM documents
    ) s
    GROUP BY s.split
    """,
    tags=("text", "training-prep"),
)
def text_train_val_split(spark, sf_dir):
    """Deterministic content-hash dataset split (≈75/25 via the first
    md5 nibble) — split assignment must be a pure function of content,
    never of row order or partitioning, so re-runs, engine changes, and
    cluster resizes all produce the same split. md5 is bit-identical
    across engines, making this oracle-checkable end-to-end.

    Splitting on the *text* hash (not doc_id) also sends exact
    duplicates to the same side — no train/val leakage through dups.
    """
    d = T(spark, sf_dir, "documents")
    split = F.when(
        F.substring(F.md5("text"), 1, 1).between("0", "b"), F.lit("train")
    ).otherwise(F.lit("val"))
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )
