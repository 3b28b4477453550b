"""Reshaping operators: unpivot/melt, positional explode, bitwise
scalars, and the capstone training-data curation pipeline query.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import T
from .registry import query


@query(
    "reshape_unpivot",
    sql="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value
    FROM lineitem WHERE l_orderkey <= 100
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem WHERE l_orderkey <= 100
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
    FROM lineitem WHERE l_orderkey <= 100
    """,
    tags=("reshape",),
)
def reshape_unpivot(spark, sf_dir):
    # wide→long melt: one row per (id, measure). Spark's unpivot is a
    # zero-shuffle projection+generate, not a join.
    li = T(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 100)
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@query(
    "reshape_posexplode",
    sql="""
    SELECT doc_id,
           CAST(generate_subscripts(string_split(text, ' '), 1) AS INTEGER) AS pos,
           unnest(string_split(text, ' ')) AS word
    FROM documents WHERE doc_id < 20
    """,
    tags=("reshape",),
)
def reshape_posexplode(spark, sf_dir):
    # positional explode; Spark pos is 0-based, ordinality is 1-based →
    # +1 for the portable contract.
    d = T(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "word")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")


@query(
    "scalar_bitwise",
    sql="""
    SELECT l_orderkey,
           CAST(l_orderkey & 255 AS BIGINT) AS low_byte,
           CAST(l_orderkey | 1 AS BIGINT) AS odd_key,
           CAST(xor(l_orderkey, l_partkey) AS BIGINT) AS key_mix,
           CAST(l_orderkey << 2 AS BIGINT) AS shifted
    FROM lineitem WHERE l_linenumber = 1 AND l_orderkey <= 500
    """,
    tags=("scalar", "bitwise"),
)
def scalar_bitwise(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").where(
        (F.col("l_linenumber") == 1) & (F.col("l_orderkey") <= 500)
    )
    k = F.col("l_orderkey")
    return li.select(
        "l_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(1)).alias("odd_key"),
        k.bitwiseXOR(F.col("l_partkey")).alias("key_mix"),
        F.shiftleft(k, 2).alias("shifted"),
    )


@query(
    "curate_training_docs",
    sql="""
    WITH scored AS (
      SELECT doc_id, lang, source,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(string_split(text, ' '),
                   w -> w = 'the' OR w = 'a' OR w = 'of')) AS DOUBLE)
               / len(string_split(text, ' ')) AS stop_ratio
      FROM documents
    ),
    kept AS (
      SELECT * FROM scored
      WHERE n_tokens BETWEEN 20 AND 500
        AND stop_ratio < 0.2
        AND lang IN ('en', 'fr')
    ),
    survivors AS (
      SELECT fp, min(doc_id) AS keep_id FROM kept GROUP BY fp
    )
    SELECT k.doc_id, k.lang, k.source, k.n_tokens
    FROM kept k JOIN survivors s ON k.doc_id = s.keep_id
    """,
    tags=("capstone", "dedup", "text"),
)
def curate_training_docs(spark, sf_dir):
    """Capstone curation pipeline: quality-filter → language-filter →
    fingerprint-dedup (deterministic min-id survivor) in one plan.

    This is the shape of a real pretraining-data pass: per-row scoring
    stays in whole-stage codegen, the only shuffle is the survivor
    groupBy on the fingerprint (|unique docs|, not |docs|), and the
    survivor join broadcasts at any realistic dedup ratio.
    """
    d = T(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text", _tok().alias("w")
    )
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    stops = F.size(
        F.filter(F.col("w"), lambda t: (t == "the") | (t == "a") | (t == "of"))
    )
    scored = d.select(
        "doc_id",
        "lang",
        "source",
        F.md5(norm).alias("fp"),
        F.size("w").cast("long").alias("n_tokens"),
        (stops.cast("double") / F.size("w")).alias("stop_ratio"),
    )
    kept = scored.where(
        F.col("n_tokens").between(20, 500)
        & (F.col("stop_ratio") < 0.2)
        & F.col("lang").isin("en", "fr")
    )
    survivors = kept.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    return (
        kept.join(
            F.broadcast(survivors), kept.doc_id == survivors.keep_id, "inner"
        ).select("doc_id", "lang", "source", "n_tokens")
    )


def _tok():
    return F.split(F.col("text"), " ")
