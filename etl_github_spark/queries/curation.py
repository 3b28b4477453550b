"""Dataset-construction operators: deterministic sampling, source
mixing, and corpus-statistics term scoring.

These are the knobs a training-data pipeline turns after cleaning:
sample a stratum reproducibly, up-weight scarce sources to hit a target
mixture, and surface per-language distinguishing terms for inspection.
All pure DataFrame ops, all oracle-checked. Registered after the
driver's verification window (see queries/__init__.py).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ._util import T
from .registry import query


@query(
    "curate_sample_stratified",
    sql="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE substr(md5(text), 1, 4) < '4000'
    """,
    tags=("curation", "sampling"),
)
def curate_sample_stratified(spark, sf_dir):
    """Deterministic ~25% content-hash sample (md5 16-bit prefix
    < 0x4000).

    Hash-of-content sampling beats rand(): the same document is sampled
    identically across runs, engines, and re-partitions — reproducible
    experiment subsets with no seed plumbing, and exact duplicates land
    on the same side (no train/eval leakage through the sample
    boundary). Per-row predicate, pushes to the scan, no shuffle. Rate
    granularity is 1/65536 per hex-prefix step.
    """
    return (
        T(spark, sf_dir, "documents")
        .where(F.substring(F.md5("text"), 1, 4) < "4000")
        .select("doc_id", "lang", "source")
    )


@query(
    "curate_source_mixing",
    sql="""
    SELECT d.doc_id, d.source, CAST(r.i AS INTEGER) AS copy_id
    FROM documents d, range(0, 3) r(i)
    WHERE r.i < CASE d.source WHEN 'src0' THEN 3 WHEN 'src1' THEN 2 ELSE 1 END
    """,
    tags=("curation", "mixing"),
)
def curate_source_mixing(spark, sf_dir):
    """Weighted source mixing: replicate each document per its source's
    target weight (src0 3×, src1 2×, rest 1×) — the upsampling step
    that hits a data-mixture recipe when one source is scarce.

    `explode(sequence(0, w-1))` is a per-row fan-out with no shuffle;
    the copy_id makes replicas distinguishable downstream (e.g. for
    epoch-aware shuffling). At 100 TB weights come from a broadcast
    recipe table instead of a literal CASE — same plan.
    """
    w = (
        F.when(F.col("source") == "src0", 3)
        .when(F.col("source") == "src1", 2)
        .otherwise(1)
    )
    return T(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(0), w - 1)).alias("copy_id"),
    )


@query(
    "curate_tfidf_top_terms",
    sql="""
    WITH tok AS (
      SELECT lang, doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY lang, term),
    df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY term),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    scored AS (
      SELECT tf.lang, tf.term, tf.tf, df.df,
             CAST(tf.tf AS DOUBLE) * n.n / df.df AS score
      FROM tf JOIN df USING (term), n
    ),
    ranked AS (
      SELECT lang, term, tf, df, score,
             row_number() OVER (PARTITION BY lang ORDER BY score DESC, term) AS rk
      FROM scored
    )
    SELECT lang, term, tf, df, score, CAST(rk AS INTEGER) AS rk
    FROM ranked WHERE rk <= 3
    """,
    tags=("curation", "text", "tfidf"),
)
def curate_tfidf_top_terms(spark, sf_dir):
    """Top-3 distinguishing terms per language by a tf·N/df score —
    tf-idf's ranking without the log (ln is libm-dependent and would
    break cross-engine bit-equality; tf·N/df orders identically to
    tf·(N/df) for fixed tf and preserves the idf monotonicity).

    Score arithmetic is one exact int product then a single IEEE
    division — engine-identical. Shape: tokenize once, two partial+final
    aggs (shuffle = |lang×vocab| and |vocab|), broadcast vocabulary df
    join, window top-k per lang. Corpus size N is a 1-row broadcast.
    """
    d = T(spark, sf_dir, "documents")
    tok = d.select("lang", "doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("lang", "term").agg(F.count("*").alias("tf"))
    dfreq = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count("*").alias("n"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            "term",
            "tf",
            "df",
            (F.col("tf").cast("double") * F.col("n") / F.col("df")).alias("score"),
        )
    )
    w = Window.partitionBy("lang").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("lang", "term", "tf", "df", "score", "rk")
    )
