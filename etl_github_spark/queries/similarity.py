"""Similarity search over ``embeddings`` (north-star §2.9).

Brute-force cosine is the correctness baseline; SRP-LSH bucketing is the
100 TB path (bounded candidate sets per bucket instead of an O(N·Q)
scan).

Determinism note: float dot products are order-sensitive, so the oracle
pairing forces the *same* left-fold order in both engines — Spark
``F.aggregate`` over ``zip_with`` products vs DuckDB ``list_reduce``
over ``list_transform`` products. float→double widening is exact and a
float32×float32 product is exactly representable in double, so both
engines execute the identical IEEE op sequence → bit-identical cosines.
No decimal routing needed (and no explode/shuffle: the whole cosine is a
single whole-stage-codegen projection).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ._util import T, par
from .registry import query

_DIM = 64  # fixture embedding dimensionality (FIXTURES.md §A)


def fold_dot(a, b) -> Column:
    """Deterministic left-fold dot product of two array<float> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a, b) -> Column:
    return fold_dot(a, b) / (F.sqrt(fold_dot(a, a)) * F.sqrt(fold_dot(b, b)))


def _fold_dot_sql(a: str, b: str, dim: int = _DIM) -> str:
    return (
        f"list_reduce(list_transform(range(1, {dim + 1}), "
        f"i -> CAST({a}[CAST(i AS INT)] AS DOUBLE) * CAST({b}[CAST(i AS INT)] AS DOUBLE)), "
        f"(acc, x) -> acc + x)"
    )


_COS_SQL = """
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    cos AS (
      SELECT e.vec_id, e.label,
             {dot} / (sqrt({n1}) * sqrt({n2})) AS cos_sim
      FROM embeddings e, q
    )
""".format(
    dot=_fold_dot_sql("e.embedding", "q.qe"),
    n1=_fold_dot_sql("e.embedding", "e.embedding"),
    n2=_fold_dot_sql("q.qe", "q.qe"),
)


def allpairs_cosine_threshold(emb: DataFrame, eps: float) -> DataFrame:
    """All-pairs exact cosine-threshold pairs — (va, vb, cos_sim) with
    va < vb and cos_sim >= eps — as a BLOCKED cogroup kernel (r14;
    guide §3 block-broadcast / §4.2).

    The r13 form was a grid-partitioned nested-loop join evaluating the
    interpreted fold cosine per pair — correct but per-pair-overhead
    bound (10.4 s for ~2M pairs at sf0.1). Here rows are hashed into G
    id-blocks and each of the G·(G+1)/2 unordered BLOCK PAIRS becomes
    one cogroup group: the kernel matmuls the two blocks (the
    `sim_topk_pandas_vectorized` trick), prefilters at eps − 1e-6, and
    recomputes the EXACT left-fold cosine for the surviving candidates
    only — per-row products widened to float64 and summed in index
    order via cumsum, norms the same way, so every emitted cos_sim is
    bit-identical to `cosine()`/the oracle's list_reduce (the fold is
    symmetric: products commute element-wise and the two norm sqrts
    commute, so orientation cannot change a bit). The 1e-6 prefilter
    margin is ~8 orders wider than the worst-case matmul-vs-fold
    divergence for 64-dim unit-scale data, so no qualifying pair can
    be dropped; membership is decided ONLY by the exact value.

    Scale shape: still O(N²) compute by contract (this backs the
    exhaustive truth anchors), but per-task memory is bounded by two
    blocks (~4k rows each) + the candidate buffer — no driver collect,
    no corpus broadcast; shuffle volume is ~(G+1)/2 copies of each
    row. G derives from the measured count and the cluster width, so
    the same code fans out on real clusters.
    """
    import math

    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    n = emb.count()
    g = max(
        int(math.ceil(math.sqrt(2.0 * spark.sparkContext.defaultParallelism))),
        int(math.ceil(n / 4096.0)),
    )
    src = emb.select(
        "vec_id",
        "embedding",
        F.pmod(F.xxhash64("vec_id"), F.lit(g)).cast("int").alias("g"),
    )
    # One frame, side-tagged, grouped by block pair — NOT a cogroup:
    # Spark's column pruning strips a FlatMapCoGroupsInPandas node's
    # data columns down to the grouping keys when the query above it
    # needs none of the UDF's outputs (e.g. a bare count), silently
    # starving the kernel; grouped FlatMapGroupsInPandas keeps its
    # input columns under the same plans (probed empirically on 4.1).
    left = src.select(
        F.col("g").alias("gi"),
        F.explode(F.sequence(F.col("g"), F.lit(g - 1))).alias("gj"),
        F.lit(0).alias("side"),
        "vec_id",
        "embedding",
    )
    right = src.select(
        F.explode(F.sequence(F.lit(0), F.col("g"))).alias("gi"),
        F.col("g").alias("gj"),
        F.lit(1).alias("side"),
        "vec_id",
        "embedding",
    )
    both = left.unionByName(right)

    def block_pairs(key, pdf):
        gi, gj = key
        lp = pdf[pdf["side"] == 0]
        rp = pdf[pdf["side"] == 1]
        if len(lp) == 0 or len(rp) == 0:
            return pd.DataFrame({"va": [], "vb": [], "cos_sim": []}).astype(
                {"va": "int64", "vb": "int64", "cos_sim": "float64"}
            )
        ids_x = lp["vec_id"].to_numpy()
        ids_y = rp["vec_id"].to_numpy()
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in lp["embedding"]])
        y = np.asarray([np.asarray(v, dtype=np.float64) for v in rp["embedding"]])
        # exact per-row norm folds: cumsum is a sequential left fold
        nx = np.sqrt(np.cumsum(x * x, axis=1)[:, -1])
        ny = np.sqrt(np.cumsum(y * y, axis=1)[:, -1])
        cos_m = (x @ y.T) / (nx[:, None] * ny[None, :])  # prefilter only
        cand = cos_m >= eps - 1e-6
        if gi == gj:  # same block both sides: keep each unordered pair once
            cand &= ids_x[:, None] < ids_y[None, :]
        ii, jj = np.nonzero(cand)
        if len(ii) == 0:
            return pd.DataFrame({"va": [], "vb": [], "cos_sim": []}).astype(
                {"va": "int64", "vb": "int64", "cos_sim": "float64"}
            )
        ab = np.cumsum(x[ii] * y[jj], axis=1)[:, -1]  # exact index-order fold
        cos = ab / (nx[ii] * ny[jj])
        keep = cos >= eps
        ia, ja = ii[keep], jj[keep]
        return pd.DataFrame(
            {
                "va": np.minimum(ids_x[ia], ids_y[ja]),
                "vb": np.maximum(ids_x[ia], ids_y[ja]),
                "cos_sim": cos[keep],
            }
        )

    return both.groupBy("gi", "gj").applyInPandas(
        block_pairs, schema="va long, vb long, cos_sim double"
    )


def _cosine_vs_query(spark, sf_dir) -> DataFrame:
    """vec_id, label, cos_sim(embedding, embedding[vec_id=0])."""
    emb = T(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    return emb.crossJoin(F.broadcast(q)).select(
        "vec_id",
        "label",
        cosine(F.col("embedding"), F.col("qe")).alias("cos_sim"),
    )


@query(
    "sim_cosine_threshold",
    sql=_COS_SQL + "SELECT vec_id, label, cos_sim FROM cos WHERE cos_sim >= 0.2",
    tags=("similarity",),
)
def sim_cosine_threshold(spark, sf_dir):
    return _cosine_vs_query(spark, sf_dir).where(F.col("cos_sim") >= 0.2)


@query(
    "sim_topk_bruteforce",
    sql=_COS_SQL + "SELECT vec_id, cos_sim FROM cos ORDER BY cos_sim DESC, vec_id LIMIT 10",
    tags=("similarity", "topk"),
)
def sim_topk_bruteforce(spark, sf_dir):
    # top-k by exact cosine: Spark plans TakeOrderedAndProject (no global
    # sort). cos_sim is bit-deterministic, so the row set is stable.
    return (
        _cosine_vs_query(spark, sf_dir)
        .select("vec_id", "cos_sim")
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


@query(
    "sim_norms",
    sql="""
    SELECT vec_id, label, sqrt({ss}) AS l2_norm
    FROM embeddings e
    """.format(ss=_fold_dot_sql("e.embedding", "e.embedding")),
    tags=("similarity",),
)
def sim_norms(spark, sf_dir):
    emb = T(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.sqrt(fold_dot(F.col("embedding"), F.col("embedding"))).alias("l2_norm"),
    )


@query(
    "sim_normalize_embeddings",
    sql="""
    SELECT vec_id, CAST(t.i AS INTEGER) AS dim,
           CAST(embedding[CAST(t.i AS INT)] AS DOUBLE) / sqrt({ss}) AS unit_val
    FROM embeddings e, range(1, {d}) t(i)
    """.format(ss=_fold_dot_sql("e.embedding", "e.embedding"), d=_DIM + 1),
    tags=("similarity",),
)
def sim_normalize_embeddings(spark, sf_dir):
    # unit-norm projection: per-row transform, norm via the shared
    # left-fold — the standard pre-step that turns cosine into dot
    # product for downstream ANN. Output is posexploded to one scalar
    # row per (vec_id, dim): the driver's canonicalizer cannot sort
    # array cells (r02 hard fail), and per-element doubles make the
    # float comparison element-wise — stricter than hashing a
    # stringified array.
    emb = T(spark, sf_dir, "embeddings")
    norm = F.sqrt(fold_dot(F.col("embedding"), F.col("embedding")))
    unit = F.transform("embedding", lambda x: x.cast("double") / norm)
    return emb.select("vec_id", F.posexplode(unit).alias("i", "unit_val")).select(
        "vec_id", (F.col("i") + 1).alias("dim"), "unit_val"
    )


@query(
    "sim_label_centroids",
    sql="""
    WITH ex AS (
      SELECT label, t.i AS dim,
             CAST(embedding[CAST(t.i AS INT)] AS DOUBLE) AS x
      FROM embeddings, range(1, {d}) t(i)
    )
    SELECT label, CAST(dim AS INTEGER) AS dim,
           list_reduce(list_sort(list(x)), (acc, v) -> acc + v) / count(*) AS centroid
    FROM ex GROUP BY label, dim
    """.format(d=_DIM + 1),
    tags=("similarity", "centroid"),
)
def sim_label_centroids(spark, sf_dir):
    """Per-label centroid, one row per (label, dimension).

    Cross-row float sums are order-dependent, so both engines fold the
    *sorted* value list (sort_array+aggregate ↔ list_sort+list_reduce):
    identical op sequence → bit-identical means. At 100 TB you'd trade
    this for a two-level fixed-point quantized mean; here exactness is
    the contract.
    """
    emb = T(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode("embedding").alias("i", "xf")
    ).select("label", (F.col("i") + 1).alias("dim"), F.col("xf").cast("double").alias("x"))
    folded = F.aggregate(
        F.sort_array(F.collect_list("x")), F.lit(0.0), lambda acc, v: acc + v
    )
    return ex.groupBy("label", "dim").agg(
        (folded / F.count("x")).alias("centroid")
    )


# --- scale path: SRP-LSH bucketed search (rows-only) -----------------------


def _srp_planes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no numpy RNG state needed:
    a splitmix64-style hash of (seed, plane, dim) → uniform in [-1, 1))."""

    def u(p: int, d: int) -> float:
        x = (seed * 0x9E3779B97F4A7C15 + p * 0xBF58476D1CE4E5B9 + d * 0x94D049BB133111EB) & (
            2**64 - 1
        )
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) & (2**64 - 1)
        x ^= x >> 27
        x = (x * 0x94D049BB133111EB) & (2**64 - 1)
        x ^= x >> 31
        return (x / 2**63) - 1.0

    return [[u(p, d) for d in range(dim)] for p in range(n_planes)]


def srp_bucket(vec_col, planes: list[list[float]]) -> Column:
    """Signed-random-projection bucket id for an array<float> column.

    Pure-JVM column-expression form, kept for composition inside larger
    plans. For bulk bucketing prefer :func:`srp_bucketize` — one numpy
    matmul per Arrow batch computes all plane projections at once,
    where this expression tree pays per-plane fold overhead (and its
    analysis/codegen cost grows with n_planes × dim).
    """
    bits = []
    for p, plane in enumerate(planes):
        dot = fold_dot(vec_col, F.array(*[F.lit(v) for v in plane]))
        bits.append(
            F.when(dot >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def srp_bucketize(df: DataFrame, planes: list[list[float]]) -> DataFrame:
    """Append an SRP ``bucket`` column via one Arrow-batched numpy matmul.

    All plane projections for a batch are a single (n × dim) @ (dim × p)
    matmul — the vectorized sibling of :func:`srp_bucket` (same bit
    convention: bit p set iff plane-p dot ≥ 0). At 100 TB this runs in
    the loader once and ``bucket`` becomes the partition key.
    """
    import numpy as np

    pm = np.asarray(planes, dtype=np.float64).T  # dim × planes
    weights = 1 << np.arange(pm.shape[1], dtype=np.int64)
    sc = df.sparkSession.sparkContext
    bpm = sc.broadcast(pm)

    from pyspark.sql.types import LongType, StructField, StructType

    # note: StructType.add mutates in place — build a fresh copy
    schema = StructType(list(df.schema.fields) + [StructField("bucket", LongType())])

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(bucket=np.array([], dtype=np.int64))
                continue
            m = np.stack(pdf["embedding"].map(np.asarray).to_numpy()).astype(np.float64)
            bits = (m @ bpm.value) >= 0
            yield pdf.assign(bucket=bits @ weights)

    return df.mapInPandas(kernel, schema=schema)


@query(
    "sim_topk_pandas_vectorized",
    sql=_COS_SQL
    + """
    SELECT CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS rnk,
           vec_id
    FROM cos ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
    tags=("similarity", "topk", "pandas"),
)
def sim_topk_pandas_vectorized(spark, sf_dir):
    """Brute-force top-k via an Arrow-batched pandas/numpy kernel.

    The documented exception to "UDFs are the slow path": for dense
    numeric kernels a vectorized numpy matmul over Arrow batches beats
    per-element JVM folds as dimensionality grows. Output is
    (rank, vec_id) only — float-free, so the exact left-fold oracle
    applies verbatim: numpy's pairwise-reduction cosines differ from
    the fold in the last ulps but the fixture margins between ranked
    neighbors are orders of magnitude wider (equality of the full
    ranking vs the fold baseline is additionally pinned in pytest).
    """
    import numpy as np
    import pandas as pd

    emb = T(spark, sf_dir, "embeddings")
    q_vec = emb.where(F.col("vec_id") == 0).first()["embedding"]
    qn = np.asarray(q_vec, dtype=np.float64)
    qn = qn / np.linalg.norm(qn)
    b = spark.sparkContext.broadcast(qn)

    def score(batches):
        for pdf in batches:
            m = np.stack(pdf["embedding"].map(np.asarray).to_numpy()).astype(np.float64)
            norms = np.linalg.norm(m, axis=1)
            cos = (m @ b.value) / norms
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "cos_sim": cos})

    scored = emb.select("vec_id", "embedding").mapInPandas(
        score, schema="vec_id long, cos_sim double"
    )
    top = scored.orderBy(F.desc("cos_sim"), "vec_id").limit(10)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cos_sim"), "vec_id")
    return top.select(
        F.row_number().over(w).cast("int").alias("rnk"), "vec_id"
    )


def _srp_bucket_sql(table_alias: str, planes: list[list[float]]) -> str:
    """SRP bucket id of ``<alias>.embedding`` as a DuckDB expression with
    the planes embedded as double literals (repr round-trips exactly);
    each plane dot is the same CAST-to-double left-fold the cosine
    oracle uses, so bucket bits replay exactly (sign margin asserted in
    tests/test_scale_siblings.py)."""
    terms = []
    for p, vals in enumerate(planes):
        lits = ", ".join(repr(v) for v in vals)
        dot = (
            f"list_reduce(list_transform(range(1, {_DIM + 1}), "
            f"i -> CAST({table_alias}.embedding[CAST(i AS INT)] AS DOUBLE) * "
            f"([{lits}][CAST(i AS INT)])), (acc, x) -> acc + x)"
        )
        terms.append(
            f"(CASE WHEN ({dot}) >= 0 THEN (CAST(1 AS BIGINT) << {p}) ELSE 0 END)"
        )
    return " + ".join(terms)


def _lsh_bucketed_topk_sql() -> str:
    bucket = _srp_bucket_sql("e", _srp_planes(8, _DIM))
    return f"""
    WITH bk AS (SELECT e.vec_id, e.embedding, {bucket} AS bucket FROM embeddings e),
    qb AS (SELECT bucket AS qbucket, embedding AS qe FROM bk WHERE vec_id = 0),
    cand AS (
      SELECT b.vec_id,
             {_fold_dot_sql('b.embedding', 'qb.qe')}
               / (sqrt({_fold_dot_sql('b.embedding', 'b.embedding')})
                  * sqrt({_fold_dot_sql('qb.qe', 'qb.qe')})) AS cos_sim
      FROM bk b, qb WHERE b.bucket = qb.qbucket
    )
    SELECT CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS rnk,
           vec_id
    FROM cand ORDER BY cos_sim DESC, vec_id LIMIT 10
    """


@query("sim_lsh_bucketed_topk", sql=_lsh_bucketed_topk_sql(), tags=("similarity", "lsh"))
def sim_lsh_bucketed_topk(spark, sf_dir):
    """ANN top-k: SRP-LSH bucket join, exact cosine re-rank inside bucket.

    At 100 TB: bucket id becomes the partition/cluster key; the query side
    broadcasts and only bucket-colliding candidates are scored —
    O(N/2^bits) per query instead of O(N).

    Bucketing, bucket filter, AND cosine scoring are fused in one
    Arrow-batched numpy kernel (all 8 plane projections + the candidate
    cosines = two matmul-shaped ops per batch); only (vec_id, cos_sim)
    scalars for the ~N/2^planes colliders cross back to the JVM for the
    top-k. The round-1 per-plane ``srp_bucket`` fold expressions were
    4.7× slower than brute force at sf0.1 — plan-size and
    interpreted-fold overhead, not data volume. Scoring in-kernel (same
    numpy pipeline as sim_topk_pandas_vectorized, whose ranking is
    pinned equal to the fold baseline) also avoids shipping candidate
    embeddings back through Arrow. (:func:`srp_bucketize` is the
    standalone loader-time variant that materializes the bucket column
    as a partition key; exact-value re-ranks that must bit-match the
    fold oracle — dedup_embedding_lsh_pairs — keep the JVM fold.)
    """
    import numpy as np
    import pandas as pd

    emb = T(spark, sf_dir, "embeddings")
    planes = _srp_planes(8, _DIM)
    q_vec = emb.where(F.col("vec_id") == 0).first()["embedding"]
    qn = np.asarray(q_vec, dtype=np.float64)
    qn = qn / np.linalg.norm(qn)
    pm = np.asarray(planes, dtype=np.float64)
    weights = 1 << np.arange(len(planes), dtype=np.int64)
    q_bucket = int(((pm @ np.asarray(q_vec, dtype=np.float64)) >= 0) @ weights)

    sc = spark.sparkContext
    bpm = sc.broadcast(pm.T)  # dim × planes
    bq = sc.broadcast(qn)

    def collide_and_score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf["embedding"].map(np.asarray).to_numpy()).astype(np.float64)
            hit = (((m @ bpm.value) >= 0) @ weights) == q_bucket
            if not hit.any():
                continue
            mh = m[hit]
            cos = (mh @ bq.value) / np.linalg.norm(mh, axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy()[hit], "cos_sim": cos}
            )

    cand = emb.select("vec_id", "embedding").mapInPandas(
        collide_and_score, schema="vec_id long, cos_sim double"
    )
    top = cand.orderBy(F.desc("cos_sim"), "vec_id").limit(10)
    # float-free (rnk, vec_id) output: the literal-plane oracle replays
    # the bucketing exactly and ranks by the fold cosine — numpy's
    # kernel cosines differ only in final ulps, far inside the ranking
    # margins (same contract as sim_topk_pandas_vectorized).
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cos_sim"), "vec_id")
    return top.select(F.row_number().over(w).cast("int").alias("rnk"), "vec_id")


_KNN_SQL = """
    WITH q AS (
      SELECT vec_id AS qid, label AS true_label, embedding AS qe
      FROM embeddings WHERE vec_id % 50 = 0
    ),
    c AS (
      SELECT vec_id AS cid, label AS clabel, embedding
      FROM embeddings WHERE vec_id % 50 <> 0
    ),
    scored AS (
      SELECT qid, true_label, cid, clabel,
             {dot} / (sqrt({nc}) * sqrt({nq})) AS cos_sim
      FROM c, q
    ),
    top AS (
      SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rnk
      FROM scored
    ),
    votes AS (
      SELECT qid, true_label, clabel, count(*) AS cnt
      FROM top WHERE rnk <= 5 GROUP BY qid, true_label, clabel
    )
    SELECT qid AS query_vec_id, true_label,
           clabel AS pred_label, CAST(cnt AS BIGINT) AS votes
    FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cnt DESC, clabel) AS r
          FROM votes)
    WHERE r = 1
""".format(
    dot=_fold_dot_sql("c.embedding", "q.qe"),
    nc=_fold_dot_sql("c.embedding", "c.embedding"),
    nq=_fold_dot_sql("q.qe", "q.qe"),
)


@query("sim_knn_classify", sql=_KNN_SQL, tags=("similarity", "classify"))
def sim_knn_classify(spark, sf_dir):
    """k-NN label prediction over the embedding corpus — the
    weak-labeling / label-QA primitive of a training-data pipeline
    (impute labels for unlabeled docs from their nearest labeled
    neighbors; disagreements between true_label and pred_label surface
    mislabeled rows). Holdout contract: every 50th vector is a query,
    classified by majority vote of its 5 nearest non-query neighbors
    (cosine); vote ties break deterministically by (votes desc, label).

    Scale shape: broadcast the query set over one corpus scan (the
    O(N·Q) exact baseline — same contract as `sim_topk_multi_query`),
    per-query top-k via a rank window partitioned by query id, then a
    query-sized vote aggregation. The query set grows with the corpus
    (every 50th vector), so the broadcast is contract-bound to this
    exact baseline; the registered web-scale sibling is
    :func:`~.scale_paths.sim_knn_classify_lsh` — SRP-banded candidates
    into the same unchanged vote logic, no pinned frame.
    """
    from pyspark.sql import Window

    emb = T(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("true_label"),
        F.col("embedding").alias("qe"),
    )
    c = emb.where(F.col("vec_id") % 50 != 0).select(
        F.col("vec_id").alias("cid"),
        F.col("label").alias("clabel"),
        "embedding",
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "qid",
        "true_label",
        "cid",
        "clabel",
        cosine(F.col("embedding"), F.col("qe")).alias("cos_sim"),
    )
    top = (
        scored.withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("cos_sim"), "cid")
            ),
        )
        .where(F.col("rnk") <= 5)
    )
    votes = top.groupBy("qid", "true_label", "clabel").agg(
        F.count("*").alias("cnt")
    )
    return (
        votes.withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("cnt"), "clabel")
            ),
        )
        .where(F.col("r") == 1)
        .select(
            F.col("qid").alias("query_vec_id"),
            "true_label",
            F.col("clabel").alias("pred_label"),
            F.col("cnt").cast("long").alias("votes"),
        )
    )


_MATRYOSHKA_SQL = """
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    sl AS (
      SELECT e.vec_id, e.embedding, q.qe,
             {pdot} / (sqrt({pn1}) * sqrt({pn2})) AS prefix_cos
      FROM embeddings e, q
      ORDER BY prefix_cos DESC, vec_id LIMIT 100
    )
    SELECT vec_id,
           {dot} / (sqrt({n1}) * sqrt({n2})) AS cos_sim
    FROM sl ORDER BY cos_sim DESC, vec_id LIMIT 10
    """.format(
    pdot=_fold_dot_sql("e.embedding", "q.qe", dim=16),
    pn1=_fold_dot_sql("e.embedding", "e.embedding", dim=16),
    pn2=_fold_dot_sql("q.qe", "q.qe", dim=16),
    dot=_fold_dot_sql("sl.embedding", "sl.qe"),
    n1=_fold_dot_sql("sl.embedding", "sl.embedding"),
    n2=_fold_dot_sql("sl.qe", "sl.qe"),
)


@query(
    "sim_matryoshka_rerank",
    sql=_MATRYOSHKA_SQL,
    tags=("similarity", "topk", "ann"),
)
def sim_matryoshka_rerank(spark, sf_dir):
    """Truncated-dimension retrieve-then-rerank: shortlist top-100 by
    cosine over the FIRST 16 of 64 dims (matryoshka prefix), then
    rerank the shortlist by full-dimension cosine and keep top-10.

    The fixture embeddings are synthetic (prefix dims carry no more
    signal than any other 16), so the pinned recall floor is modest
    (>= 6/10 across SFs, observed 7-8); on matryoshka-TRAINED
    embeddings the prefix concentrates variance and the same plan
    reaches ~full recall with far smaller shortlists.

    The 100 TB shape: the shortlist pass reads a 4x-narrower vector
    (prefix dims can be stored as their own column/file for a 4x scan
    + FLOP cut), plans as TakeOrderedAndProject (no global sort), and
    the exact rerank touches only the 100-row shortlist. Both cosines
    use the shared left-fold — bit-identical to the DuckDB oracle; the
    prefix slice is positional so both engines fold dims 1..16 in the
    same order. Recall vs full brute force is pinned in pytest.
    """
    emb = T(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    pre = lambda c: F.slice(c, 1, 16)  # noqa: E731
    shortlist = (
        emb.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "embedding",
            "qe",
            cosine(pre(F.col("embedding")), pre(F.col("qe"))).alias("prefix_cos"),
        )
        .orderBy(F.desc("prefix_cos"), "vec_id")
        .limit(100)
    )
    return (
        shortlist.select(
            "vec_id", cosine(F.col("embedding"), F.col("qe")).alias("cos_sim")
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


def _sign_word(col, lo: int) -> Column:
    """Pack the sign bits of dims lo..lo+31 (1-based) of an array<float>
    column into one non-negative long. Shift constants are Python-side
    literals, so no runtime shift (and no bit-63 overflow — 32 bits per
    word keeps both engines in-range). One zip_with+fold, not 32
    element_at lookups: the 64-term expression chain evaluated ~2×
    slower at sf0.1."""
    bits = F.array(*[F.lit(1 << i).cast("long") for i in range(32)])
    return F.aggregate(
        F.zip_with(
            F.slice(col, lo, 32),
            bits,
            lambda v, b: F.when(v > 0, b).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


def _sign_word_sql(col: str, lo: int) -> str:
    terms = " + ".join(
        f"(CASE WHEN {col}[{lo + i}] > 0 THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i in range(32)
    )
    return f"({terms})"


_HAMMING_SQL = """
    WITH qs AS (
      SELECT embedding AS qe, {qlo} AS qlo, {qhi} AS qhi
      FROM embeddings WHERE vec_id = 0
    ),
    short AS (
      SELECT e.vec_id, e.embedding, qs.qe,
             bit_count(xor({lo}, qs.qlo)) + bit_count(xor({hi}, qs.qhi)) AS hamming
      FROM embeddings e, qs
      ORDER BY hamming, e.vec_id LIMIT 64
    )
    SELECT vec_id, CAST(hamming AS INTEGER) AS hamming, {cos} AS cos_sim
    FROM short ORDER BY cos_sim DESC, vec_id LIMIT 10
    """.format(
    qlo=_sign_word_sql("embedding", 1),
    qhi=_sign_word_sql("embedding", 33),
    lo=_sign_word_sql("e.embedding", 1),
    hi=_sign_word_sql("e.embedding", 33),
    cos="{d} / (sqrt({n1}) * sqrt({n2}))".format(
        d=_fold_dot_sql("embedding", "qe"),
        n1=_fold_dot_sql("embedding", "embedding"),
        n2=_fold_dot_sql("qe", "qe"),
    ),
)


@query("sim_topk_binary_hamming", sql=_HAMMING_SQL, tags=("similarity", "topk", "ann"))
def sim_topk_binary_hamming(spark, sf_dir):
    """Binary-quantization ANN: 1-bit sign quantization packs each
    64-dim float vector into two 32-bit sign words (32x compression);
    retrieval shortlists top-64 by Hamming distance (two XOR+popcount
    per candidate — the cheapest distance there is), then reranks the
    shortlist by exact full-precision cosine and keeps top-10. The
    binary-quantize + rescore recipe used by production vector stores.

    100 TB shape: the scan reads 8 bytes of signature per vector
    instead of 256 bytes of floats (signatures can be materialized as
    their own column); both passes plan as TakeOrderedAndProject (no
    global sort) and the exact rerank touches only the 64-row
    shortlist. Integer Hamming is exact cross-engine; the rerank
    cosine uses the shared left-fold — full-value oracle.
    """
    emb = T(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe"),
        _sign_word(F.col("embedding"), 1).alias("qlo"),
        _sign_word(F.col("embedding"), 33).alias("qhi"),
    )
    ham = (
        F.bit_count(_sign_word(F.col("embedding"), 1).bitwiseXOR(F.col("qlo")))
        + F.bit_count(_sign_word(F.col("embedding"), 33).bitwiseXOR(F.col("qhi")))
    )
    shortlist = (
        emb.crossJoin(F.broadcast(q))
        .select("vec_id", "embedding", "qe", ham.alias("hamming"))
        .orderBy("hamming", "vec_id")
        .limit(64)
    )
    return (
        shortlist.select(
            "vec_id",
            F.col("hamming").cast("int").alias("hamming"),
            cosine(F.col("embedding"), F.col("qe")).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


_KNN_K = 3
_KNN_PLANES = 6


def _knn_join_sql() -> str:
    bucket = _srp_bucket_sql("e", _srp_planes(_KNN_PLANES, _DIM))
    return f"""
    WITH bk AS (
      SELECT e.vec_id, e.embedding, {bucket} AS bucket FROM embeddings e
    ),
    pairs AS (
      SELECT a.vec_id AS vec_id, b.vec_id AS b_id,
             {_fold_dot_sql('a.embedding', 'b.embedding')}
               / (sqrt({_fold_dot_sql('a.embedding', 'a.embedding')})
                  * sqrt({_fold_dot_sql('b.embedding', 'b.embedding')})) AS cos_sim
      FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    )
    SELECT vec_id, CAST(rnk AS INTEGER) AS rnk, b_id AS neighbor_id
    FROM (
      SELECT vec_id, b_id,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos_sim DESC, b_id) AS rnk
      FROM pairs
    ) WHERE rnk <= {_KNN_K}
    """


@query("sim_knn_join_bucketed", sql=_knn_join_sql(), tags=("similarity", "lsh", "knn-join"))
def sim_knn_join_bucketed(spark, sf_dir):
    """kNN JOIN — every vector's top-3 neighbors, corpus vs corpus (the
    all-pairs sibling of `sim_lsh_bucketed_topk`'s one-query form):
    the primitive behind SemDeDup-style semantic dedup, kNN-graph
    clustering, and split-contamination sweeps, where the output is a
    neighbor GRAPH, not a query answer. SRP-bucket (6 planes) every
    vector, self-join on the bucket, exact cosine inside the bucket,
    per-vector rank window. Vectors whose true neighbors land in other
    buckets get fewer/farther neighbors — the standard LSH recall
    trade, measured for this plane family by `sim_ann_recall_audit`;
    more bands = OR-amplified recall (`dedup_embedding_lsh_pairs`).

    Scale shape: the self-join shuffles BOTH sides by bucket once —
    co-located quadratic work is per-bucket O((N/2^p)²), tuned by p;
    the rank window rides the same bucket partitioning (vec_id is a
    subset-key of the bucket co-partition... it is not, so the window
    re-shuffles by vec_id — at 100 TB that exchange carries only
    (vec_id, b_id, cos) scalars, never embeddings). Buckets and
    cosines are the JVM fold family — bit-identical to the oracle's
    list_reduce, so ranks (the only output) replay exactly; the numpy
    `srp_bucketize` kernel is the loader-time bulk path.
    """
    emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planes = _srp_planes(_KNN_PLANES, _DIM)
    bk = par(emb).select(
        "vec_id", "embedding", srp_bucket(F.col("embedding"), planes).alias("bucket")
    )
    a = bk.select(
        F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_e"), "bucket"
    )
    b = bk.select(
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_e"), "bucket"
    )
    pairs = (
        a.join(b, "bucket")
        .where(F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id", cosine(F.col("a_e"), F.col("b_e")).alias("cos_sim"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("a_id").orderBy(F.desc("cos_sim"), "b_id")
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _KNN_K)
        .select(
            F.col("a_id").alias("vec_id"),
            F.col("rnk").cast("int").alias("rnk"),
            F.col("b_id").alias("neighbor_id"),
        )
    )
