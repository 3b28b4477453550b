"""Statistical language-model scoring: perplexity-style quality filters
and BM25 ranked retrieval.

The CCNet/RedPajama-class pipelines keep or drop documents by n-gram
LM perplexity; retrieval-based curation ranks documents by BM25 against
probe queries. Both scores are log-based, and ``ln`` is the one libm
call that may differ by 1 ulp between Spark's JVM and DuckDB — so these
operators never let a float reduction (or a raw log) reach the result:

* surprisal is quantized to integer nano-nats **per vocabulary type**
  (one ``ln`` per distinct token/bigram, not per occurrence);
* per-document scores are exact BIGINT sums of those integers
  (order-insensitive, overflow-safe: 1e9-scaled surprisals ≤ ~40e9 per
  token × 1e6 tokens/doc stays far under int64);
* emitted columns are integers and rank buckets (deciles / top-k rank),
  never raw doubles.

The only cross-engine nondeterminism left is a floor-boundary event on
the per-type quantization: P ≈ grid·ulp ≈ 1.8e-6 per vocab entry, i.e.
negligible at fixture vocab sizes and ~1-in-500k entries at a 1M-token
vocabulary (a flipped entry shifts one doc's integer score by 1e-9
nats — it changes a decile only on an exact tie boundary).

Reference parity: the reference pipeline has no LM scorer; these extend
the quality/curation surface (SURVEY.md §2.9 north-star ops) beyond
`quality_token_rarity`'s integer df-surrogate with true smoothed-LM
cross-entropy.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ._util import T, par
from .registry import query

_Q = int(1e9)  # nano-nat quantization for per-type surprisal


def _tokens(spark, sf_dir):
    """Token stream (doc_id, tok), materialized once for the multiple
    consumers (vocab aggregation + per-doc join) — Spark does not reuse
    the exchange across the two subtrees otherwise."""
    return (
        par(T(spark, sf_dir, "documents"))
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .localCheckpoint(eager=False)
    )


@query(
    "quality_perplexity_unigram",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    vocab AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok
    ),
    tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS vsize
      FROM vocab
    ),
    surp AS (
      SELECT tok,
             CAST(floor(ln(CAST(total + vsize AS DOUBLE) / (c + 1)) * {_Q})
                  AS BIGINT) AS s
      FROM vocab, tot
    ),
    doc AS (
      SELECT t.doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(s) AS BIGINT) AS surprisal_q9
      FROM toks t JOIN surp USING (tok)
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_tokens, surprisal_q9,
           CAST(ntile(10) OVER (
             ORDER BY CAST(surprisal_q9 AS DOUBLE) / n_tokens, doc_id
           ) AS INTEGER) AS ppl_decile
    FROM doc
    """,
    tags=("quality", "lm", "training-prep"),
)
def quality_perplexity_unigram(spark, sf_dir):
    """Unigram-LM perplexity deciles — the CCNet-style quality split:
    train an add-one-smoothed unigram model on the corpus itself, score
    each document by mean token surprisal, and bucket documents into
    perplexity deciles (decile 1 = most predictable / head-like,
    decile 10 = most surprising / tail-or-garble). Downstream curation
    keeps a decile band instead of thresholding a raw float.

    Scale shape: the surprisal table is VOCAB-sized and broadcasts to
    the token stream; the per-doc sum is the only corpus-sized shuffle
    (keyed by doc_id, uniform). The final decile is an exact global
    ntile — a single-reducer sort over one row per document; at 100 TB
    replace it with `approx_percentile` cutoffs broadcast from a 1-row
    aggregate (same output contract, no global sort) — exact ntile is
    kept here because the oracle must reproduce bucket boundaries
    bit-for-bit.
    """
    toks = _tokens(spark, sf_dir)
    vocab = toks.groupBy("tok").agg(F.count("*").cast("long").alias("c"))
    tot = vocab.agg(
        F.sum("c").cast("long").alias("total"),
        F.count("*").cast("long").alias("vsize"),
    )
    surp = vocab.join(F.broadcast(tot)).select(
        "tok",
        F.floor(
            F.log(
                (F.col("total") + F.col("vsize")).cast("double")
                / (F.col("c") + F.lit(1))
            )
            * F.lit(_Q)
        )
        .cast("long")
        .alias("s"),
    )
    doc = (
        toks.join(F.broadcast(surp), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("s").cast("long").alias("surprisal_q9"),
        )
    )
    w = Window.orderBy(
        F.col("surprisal_q9").cast("double") / F.col("n_tokens"), F.col("doc_id")
    )
    return doc.select(
        "doc_id",
        "n_tokens",
        "surprisal_q9",
        F.ntile(10).over(w).cast("int").alias("ppl_decile"),
    )


_LAMBDA = 0.7  # interpolation weight on the bigram term


@query(
    "quality_perplexity_bigram",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, tok, pos FROM (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
      )
    ),
    uni AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok
    ),
    tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS vsize
      FROM uni
    ),
    bg AS (
      SELECT doc_id, tok AS w1,
             lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM toks
    ),
    bge AS (SELECT doc_id, w1, w2 FROM bg WHERE w2 IS NOT NULL),
    c12 AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bge GROUP BY w1, w2
    ),
    hist AS (
      SELECT w1, CAST(sum(c12) AS BIGINT) AS h FROM c12 GROUP BY w1
    ),
    surp AS (
      SELECT c12.w1, c12.w2,
             CAST(floor(-ln(
               ({_LAMBDA} * (c12.c12 + 1.0) / (hist.h + tot.vsize))
               + ({1 - _LAMBDA} * (uni.c + 1.0) / (tot.total + tot.vsize))
             ) * {_Q}) AS BIGINT) AS s
      FROM c12
      JOIN hist USING (w1)
      JOIN uni ON uni.tok = c12.w2
      CROSS JOIN tot
    ),
    doc AS (
      SELECT b.doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(s) AS BIGINT) AS surprisal_q9
      FROM bge b JOIN surp USING (w1, w2)
      GROUP BY b.doc_id
    )
    SELECT doc_id, n_bigrams, surprisal_q9,
           CAST(ntile(10) OVER (
             ORDER BY CAST(surprisal_q9 AS DOUBLE) / n_bigrams, doc_id
           ) AS INTEGER) AS ppl_decile
    FROM doc
    """,
    tags=("quality", "lm", "training-prep"),
)
def quality_perplexity_bigram(spark, sf_dir):
    """Interpolated bigram-LM perplexity deciles — the stronger KenLM-
    style scorer: p(w2|w1) = λ·(c12+1)/(h(w1)+V) + (1−λ)·(c(w2)+1)/(T+V)
    with λ=0.7, scored as mean bigram surprisal per document and
    bucketed into deciles. The interpolation backs off to the unigram
    for unseen transitions, so repetitive boilerplate (predictable
    transitions) lands in low deciles and shuffled/garbled text in high
    ones even when its unigram profile is normal — the case the unigram
    scorer cannot separate.

    The interpolation expression is a fixed-order arithmetic chain over
    integers (IEEE-identical cross-engine); one ln per distinct BIGRAM
    type, quantized as in the module contract. Bigram streams come from
    a lead() window partitioned by doc_id (no self-join); the surprisal
    table is bigram-vocab-sized and broadcasts. Docs with a single token
    have no bigrams and drop out (scored by the unigram sibling).
    """
    d = par(T(spark, sf_dir, "documents")).select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    ).localCheckpoint(eager=False)
    uni = d.groupBy("tok").agg(F.count("*").cast("long").alias("c"))
    tot = uni.agg(
        F.sum("c").cast("long").alias("total"),
        F.count("*").cast("long").alias("vsize"),
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    bge = (
        d.select(
            "doc_id",
            F.col("tok").alias("w1"),
            F.lead("tok").over(wdoc).alias("w2"),
        )
        .where(F.col("w2").isNotNull())
        .localCheckpoint(eager=False)
    )
    c12 = bge.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c12"))
    hist = c12.groupBy("w1").agg(F.sum("c12").cast("long").alias("h"))
    surp = (
        c12.join(hist, "w1")
        .join(uni.withColumnRenamed("tok", "w2"), "w2")
        .join(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.floor(
                -F.log(
                    (
                        F.lit(_LAMBDA)
                        * (F.col("c12") + F.lit(1.0))
                        / (F.col("h") + F.col("vsize"))
                    )
                    + (
                        F.lit(1 - _LAMBDA)
                        * (F.col("c") + F.lit(1.0))
                        / (F.col("total") + F.col("vsize"))
                    )
                )
                * F.lit(_Q)
            )
            .cast("long")
            .alias("s"),
        )
    )
    doc = (
        bge.join(F.broadcast(surp), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("s").cast("long").alias("surprisal_q9"),
        )
    )
    w = Window.orderBy(
        F.col("surprisal_q9").cast("double") / F.col("n_bigrams"), F.col("doc_id")
    )
    return doc.select(
        "doc_id",
        "n_bigrams",
        "surprisal_q9",
        F.ntile(10).over(w).cast("int").alias("ppl_decile"),
    )


_BM25_TERMS = ("merge", "window", "stream")
_K1 = 1.2
_B = 0.75
_TOPK = 20


@query(
    "text_bm25_topk",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    dl AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS total
      FROM dl
    ),
    tf AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN tok = '{_BM25_TERMS[0]}' THEN 1 ELSE 0 END) AS BIGINT) AS tf1,
             CAST(sum(CASE WHEN tok = '{_BM25_TERMS[1]}' THEN 1 ELSE 0 END) AS BIGINT) AS tf2,
             CAST(sum(CASE WHEN tok = '{_BM25_TERMS[2]}' THEN 1 ELSE 0 END) AS BIGINT) AS tf3
      FROM toks GROUP BY doc_id
    ),
    df AS (
      SELECT CAST(count(CASE WHEN tf1 > 0 THEN 1 END) AS BIGINT) AS df1,
             CAST(count(CASE WHEN tf2 > 0 THEN 1 END) AS BIGINT) AS df2,
             CAST(count(CASE WHEN tf3 > 0 THEN 1 END) AS BIGINT) AS df3
      FROM tf
    ),
    scored AS (
      SELECT t.doc_id, t.tf1, t.tf2, t.tf3, d.dl,
             (ln(1 + (s.n_docs - f.df1 + 0.5) / (f.df1 + 0.5))
                * (t.tf1 * ({_K1} + 1))
                / (t.tf1 + {_K1} * (1 - {_B} + {_B} * d.dl
                                    / (CAST(s.total AS DOUBLE) / s.n_docs))))
           + (ln(1 + (s.n_docs - f.df2 + 0.5) / (f.df2 + 0.5))
                * (t.tf2 * ({_K1} + 1))
                / (t.tf2 + {_K1} * (1 - {_B} + {_B} * d.dl
                                    / (CAST(s.total AS DOUBLE) / s.n_docs))))
           + (ln(1 + (s.n_docs - f.df3 + 0.5) / (f.df3 + 0.5))
                * (t.tf3 * ({_K1} + 1))
                / (t.tf3 + {_K1} * (1 - {_B} + {_B} * d.dl
                                    / (CAST(s.total AS DOUBLE) / s.n_docs))))
             AS score
      FROM tf t
      JOIN dl d USING (doc_id)
      CROSS JOIN stats s CROSS JOIN df f
      WHERE t.tf1 + t.tf2 + t.tf3 > 0
    )
    SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER)
             AS rank,
           doc_id, tf1, tf2, tf3, dl
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT {_TOPK}
    """,
    tags=("text", "retrieval"),
)
def text_bm25_topk(spark, sf_dir):
    """BM25 top-20 ranked retrieval for a fixed probe query — the
    retrieval-based curation primitive (rank a corpus against probe
    queries; keep/inspect the head). Okapi BM25 with k1=1.2, b=0.75 over
    whitespace tokens.

    Determinism: the score is a fixed-order arithmetic chain over the
    per-doc integers (tf1..tf3, dl) and three idf constants — per-row
    double math, IEEE-identical cross-engine up to the three ln calls,
    whose ulp-level engine difference shifts every doc's score by the
    same per-term amount and cannot reorder docs (ties are exact:
    identical (tf, dl) tuples produce identical scores in both engines,
    and are broken by doc_id). The emitted columns are the rank and the
    integer inputs, never the float score.

    Scale shape: one token-scan computes dl and the three tf columns as
    conditional aggregates (no per-term join, no pivot shuffle); the
    corpus-wide stats (N, total length, df per term) are a 1-row
    broadcast; scoring is map-side; the top-k is TakeOrderedAndProject.
    """
    toks = _tokens(spark, sf_dir)
    per_doc = toks.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("dl"),
        *[
            F.sum(F.when(F.col("tok") == t, 1).otherwise(0))
            .cast("long")
            .alias(f"tf{i + 1}")
            for i, t in enumerate(_BM25_TERMS)
        ],
    )
    stats = per_doc.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total"),
        *[
            F.count(F.when(F.col(f"tf{i + 1}") > 0, 1))
            .cast("long")
            .alias(f"df{i + 1}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    avgdl = F.col("total").cast("double") / F.col("n_docs")

    def contrib(i: int):
        tf = F.col(f"tf{i}")
        idf = F.log(
            F.lit(1)
            + (F.col("n_docs") - F.col(f"df{i}") + F.lit(0.5))
            / (F.col(f"df{i}") + F.lit(0.5))
        )
        return (
            idf
            * (tf * F.lit(_K1 + 1))
            / (tf + F.lit(_K1) * (F.lit(1 - _B) + F.lit(_B) * F.col("dl") / avgdl))
        )

    scored = (
        per_doc.join(F.broadcast(stats))
        .where(sum(F.col(f"tf{i + 1}") for i in range(len(_BM25_TERMS))) > 0)
        .select(
            "doc_id",
            "tf1",
            "tf2",
            "tf3",
            "dl",
            (contrib(1) + contrib(2) + contrib(3)).alias("score"),
        )
    )
    # top-k first (TakeOrderedAndProject — no global sort materializes),
    # then rank the k survivors with a trivial window.
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(_TOPK)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "doc_id",
        "tf1",
        "tf2",
        "tf3",
        "dl",
    )


def _lm_capstone_sql() -> str:
    from .registry import QUERIES

    uni = QUERIES["quality_perplexity_unigram"].sql
    oov = QUERIES["quality_oov_rate"].sql
    return f"""
    WITH ppl AS (SELECT * FROM ({uni})),
    oov AS (SELECT * FROM ({oov})),
    surv AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    dfreq AS (
      SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM toks GROUP BY tok
    ),
    diff AS (
      SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(df) AS BIGINT) AS sum_df
      FROM toks t JOIN dfreq USING (tok) GROUP BY t.doc_id
    ),
    kept AS (
      SELECT p.doc_id, p.ppl_decile, o.oov_permille, d.n_tokens, d.sum_df
      FROM ppl p
      JOIN oov o USING (doc_id)
      JOIN surv s USING (doc_id)
      JOIN diff d USING (doc_id)
      WHERE p.ppl_decile <= 9 AND o.kept
    ),
    ranked AS (
      SELECT doc_id, ppl_decile, oov_permille,
             CAST(row_number() OVER (
               ORDER BY CAST(sum_df AS DOUBLE) / n_tokens DESC, doc_id
             ) AS BIGINT) AS rank,
             CAST(count(*) OVER () AS BIGINT) AS n_docs
      FROM kept
    )
    SELECT doc_id, ppl_decile, oov_permille, rank,
           CAST(least(((8 * (rank - 1)) // n_docs) + 1, 8) AS INTEGER) AS stage
    FROM ranked
    """


@query(
    "curate_lm_pipeline",
    sql=_lm_capstone_sql(),
    tags=("curation", "lm", "capstone"),
)
def curate_lm_pipeline(spark, sf_dir):
    """LM-curation capstone — the round-4 pieces composed the way a
    training-data pipeline chains them: drop the worst perplexity
    decile (garble tail), drop >20%-OOV docs (encoding damage), keep
    one exact-dup survivor per text (min doc_id), then schedule the
    survivors easy → hard into 8 curriculum stages. Emits the final
    training order: (doc_id, ppl_decile, oov_permille, rank, stage).

    Composition reuses the registered ops verbatim (their functions on
    the Spark side, their oracle SQL as subqueries on the DuckDB side),
    so capstone parity is evidence the PIECES compose, not a parallel
    reimplementation. Each piece keeps its own scan; at 100 TB the
    filters all derive from the same token explode and a combined
    single-pass plan would fuse them — the join keys are doc_id
    everywhere, so the composition adds doc-count-sized joins, not
    corpus-sized ones.
    """
    from .curation import _STAGES
    from .quality import quality_oov_rate

    ppl = quality_perplexity_unigram(spark, sf_dir).select("doc_id", "ppl_decile")
    oov = quality_oov_rate(spark, sf_dir).select("doc_id", "oov_permille", "kept")
    docs = T(spark, sf_dir, "documents")
    surv = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    toks = (
        par(docs)
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .localCheckpoint(eager=False)
    )
    dfreq = toks.groupBy("tok").agg(
        F.count_distinct("doc_id").cast("long").alias("df")
    )
    diff = (
        toks.join(F.broadcast(dfreq), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("df").cast("long").alias("sum_df"),
        )
    )
    kept = (
        ppl.where(F.col("ppl_decile") <= 9)
        .join(oov.where(F.col("kept")).drop("kept"), "doc_id")
        .join(surv, "doc_id")
        .join(diff, "doc_id")
    )
    w = Window.orderBy(
        (F.col("sum_df").cast("double") / F.col("n_tokens")).desc(), "doc_id"
    )
    ranked = kept.select(
        "doc_id",
        "ppl_decile",
        "oov_permille",
        F.row_number().over(w).cast("long").alias("rank"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("n_docs"),
    )
    return ranked.select(
        "doc_id",
        "ppl_decile",
        "oov_permille",
        "rank",
        F.least(
            F.expr(f"(({_STAGES} * (rank - 1)) div n_docs) + 1"), F.lit(_STAGES)
        )
        .cast("int")
        .alias("stage"),
    )


_RRF_K = 60  # standard RRF dampening constant
_RRF_LIST = 20  # per-retriever shortlist length


def _rrf_sql() -> str:
    from .registry import QUERIES
    from .similarity import _COS_SQL

    bm25 = QUERIES["text_bm25_topk"].sql
    return f"""
    WITH lex AS (
      SELECT CAST(rank AS BIGINT) AS bm25_rank, doc_id FROM ({bm25})
    ),
    dense AS (
      SELECT CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id)
                  AS BIGINT) AS cos_rank,
             vec_id AS doc_id
      FROM ({_COS_SQL}
            SELECT vec_id, cos_sim FROM cos
            ORDER BY cos_sim DESC, vec_id LIMIT {_RRF_LIST})
    ),
    f AS (
      SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
             l.bm25_rank, d.cos_rank,
             coalesce(1.0 / ({_RRF_K} + l.bm25_rank), 0.0)
               + coalesce(1.0 / ({_RRF_K} + d.cos_rank), 0.0) AS rrf
      FROM lex l FULL JOIN dense d ON l.doc_id = d.doc_id
    )
    SELECT CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INTEGER)
             AS fused_rank,
           doc_id, bm25_rank, cos_rank
    FROM f ORDER BY rrf DESC, doc_id LIMIT {_RRF_LIST}
    """


@query("sim_rrf_fusion", sql=_rrf_sql(), tags=("similarity", "retrieval", "lm"))
def sim_rrf_fusion(spark, sf_dir):
    """Hybrid retrieval by reciprocal-rank fusion: the BM25 lexical
    shortlist and the dense cosine shortlist (query = vec 0; vec_id and
    doc_id share the fixture id domain) fused as
    Σ 1/(60 + rank) over the lists each doc appears in — the standard
    RAG-stack fusion that needs no score calibration because it
    consumes RANKS, not scores.

    Determinism: both input ranks are integers (each list's internal
    ordering is already engine-deterministic by its own op's contract);
    the fused score is a fixed-order sum of two correctly-rounded
    divisions of integers — bit-identical cross-engine. Each retriever
    contributes a k-row shortlist (TakeOrdered on its own side), so the
    fusion join touches 2k rows regardless of corpus size.
    """
    from .similarity import _cosine_vs_query

    lex = text_bm25_topk(spark, sf_dir).select(
        F.col("rank").cast("long").alias("bm25_rank"), "doc_id"
    )
    shortlist = (
        _cosine_vs_query(spark, sf_dir)
        .select("vec_id", "cos_sim")
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(_RRF_LIST)
    )
    dense = shortlist.select(
        F.row_number()
        .over(Window.orderBy(F.col("cos_sim").desc(), "vec_id"))
        .cast("long")
        .alias("cos_rank"),
        F.col("vec_id").alias("doc_id"),
    )
    f = lex.join(dense, "doc_id", "full").select(
        "doc_id",
        "bm25_rank",
        "cos_rank",
        (
            F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("bm25_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("cos_rank")), F.lit(0.0))
        ).alias("rrf"),
    )
    top = f.orderBy(F.col("rrf").desc(), "doc_id").limit(_RRF_LIST)
    return top.select(
        F.row_number()
        .over(Window.orderBy(F.col("rrf").desc(), "doc_id"))
        .cast("int")
        .alias("fused_rank"),
        "doc_id",
        "bm25_rank",
        "cos_rank",
    )


def _domain_weights_sql() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    vocab AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok
    ),
    tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS vsize
      FROM vocab
    ),
    surp AS (
      SELECT tok,
             CAST(floor(ln(CAST(total + vsize AS DOUBLE) / (c + 1)) * {_Q})
                  AS BIGINT) AS s
      FROM vocab, tot
    ),
    per_src AS (
      SELECT d.source,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(s) AS BIGINT) AS surprisal_q9
      FROM toks t
      JOIN documents d USING (doc_id)
      JOIN surp USING (tok)
      GROUP BY d.source
    ),
    w AS (
      SELECT source, n_tokens, surprisal_q9,
             surprisal_q9 // n_tokens AS mean_q9
      FROM per_src
    )
    SELECT source, n_tokens, CAST(mean_q9 AS BIGINT) AS mean_surprisal_q9,
           CAST(mean_q9 AS DOUBLE)
             / (SELECT CAST(sum(mean_q9) AS DOUBLE) FROM w) AS weight
    FROM w
    """


@query(
    "curate_domain_weights_lm",
    sql=_domain_weights_sql(),
    tags=("curation", "lm", "training-prep"),
)
def curate_domain_weights_lm(spark, sf_dir):
    """DoReMi-flavored domain reweighting signal: per-source mean token
    surprisal under the corpus unigram LM, normalized into sampling
    weights — a source whose text the LM finds hard gets upweighted
    (the one-shot surrogate for DoReMi's proxy-model excess-loss loop;
    `curate_importance_weights` is the DSIR counterpart keyed on target
    similarity rather than difficulty).

    Mean surprisal is integer (exact BIGINT sum div BIGINT count); the
    weight is one correctly-rounded division by the summed means of the
    |sources|-row frame. Per-source sums shuffle by source (map-side
    combinable) after the same vocab-broadcast join the perplexity ops
    use.
    """
    toks = _tokens(spark, sf_dir)
    vocab = toks.groupBy("tok").agg(F.count("*").cast("long").alias("c"))
    tot = vocab.agg(
        F.sum("c").cast("long").alias("total"),
        F.count("*").cast("long").alias("vsize"),
    )
    surp = vocab.join(F.broadcast(tot)).select(
        "tok",
        F.floor(
            F.log(
                (F.col("total") + F.col("vsize")).cast("double")
                / (F.col("c") + F.lit(1))
            )
            * F.lit(_Q)
        )
        .cast("long")
        .alias("s"),
    )
    src = T(spark, sf_dir, "documents").select("doc_id", "source")
    per_src = (
        toks.join(F.broadcast(surp), "tok")
        .join(F.broadcast(src), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("s").cast("long").alias("surprisal_q9"),
        )
        .select(
            "source",
            "n_tokens",
            F.expr("surprisal_q9 div n_tokens").cast("long").alias("mean_q9"),
        )
    )
    denom = per_src.agg(F.sum("mean_q9").cast("long").alias("denom"))
    return per_src.join(F.broadcast(denom)).select(
        "source",
        "n_tokens",
        F.col("mean_q9").alias("mean_surprisal_q9"),
        (F.col("mean_q9").cast("double") / F.col("denom")).alias("weight"),
    )

