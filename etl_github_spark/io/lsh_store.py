"""Physical LSH band-index store: the persisted, fit-free sibling of
`io/ivf_store.py` for the banded-MinHash near-dup family.

`dedup_minhash_lsh` demonstrates the *algorithm* — signatures, 8×4 band
buckets, bucket-local candidate join — recomputed from raw text on
every call. At 100 TB the production shape is an INDEX: shingle, hash,
and band each document ONCE, persist the band rows, and answer every
later near-dup question (corpus self-dedup, new-batch judging,
incremental ingest) from the store. This module is that storage half:

- ``bands/`` — (doc_id, bucket) parquet PARTITIONED BY band: 8 skinny
  rows per document, the self-join input. Band partitioning keeps
  compaction and the candidate join's co-location unit aligned with
  the banding itself.
- ``sigs/`` — (doc_id, sig) parquet PARTITIONED BY ``sbucket =
  pmod(hash(doc_id), 16)``: the 32-component signature stored ONCE per
  document (not 8× through the band explode), attached to candidate
  pairs only when an agreement estimate is needed — the same cand +
  sig-join shape the family's SQL oracle states. The hash-bucket
  partitioning exists for COMPACTION: each bucket directory rewrites
  independently (16 parallel tasks, never a single O(corpus) task) with
  the same per-directory swap as ``bands/``.
- ``_lsh_index.json`` — the family sidecar (n_hashes, band count, rows
  per band, family name, sig bucket count). The hash family itself is
  the module-constant md5/affine chain (`queries.dedup._md5_band_rows`
  — shared with the batch AND streaming paths), so unlike the IVF
  store there is nothing to fit: the sidecar exists to REFUSE appends
  from a mismatched family/layout, the drift that would silently
  corrupt an index. Written via temp-file + ``os.replace`` so a crash
  mid-dump can never leave a truncated sidecar (a JSONDecodeError
  instead of the designed family-mismatch refusal).

Append is embarrassingly incremental — banding is per-row map-side
work, so a new batch pays one scan + one partitioned append and the
appended index is BIT-IDENTICAL to a full rebuild (no refit identity
to argue, unlike IVF-PQ; `dedup_lsh_store_upsert` pins it under the
driver hash). Compaction rewrites each band / sig-bucket partition to
one file via a per-directory swap; see :func:`compact_bands_store` for
the exact crash-recovery contract.

Reference semantics: the dedup contract is the reference's corpus
hygiene concern re-expressed as a persisted index (see SURVEY.md §2.9);
the store layout itself is the standard FAISS/Delta "fit-free inverted
index + sidecar metadata" pattern.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SIG_BUCKETS = 16


def _cluster_for_write(df: DataFrame, part_col: str, id_col: str = "doc_id") -> DataFrame:
    """Single-column wrapper over :func:`io.sink.cluster_for_write`
    (the shared salted keyed-repartition that makes output file count
    track data volume instead of ``tasks × partition-values`` — see
    that docstring). Measured here at sf0.1: 256 band + 508 sig files
    per store build → 24, append 9.1 s → 2.5 s."""
    from .sink import cluster_for_write

    return cluster_for_write(df, (part_col,), id_col)


def _family_meta() -> dict:
    from ..queries.dedup import _BAND_SIZE, _N_HASHES

    return {
        "family": "md5-affine",
        "n_hashes": _N_HASHES,
        "band_size": _BAND_SIZE,
        "n_bands": _N_HASHES // _BAND_SIZE,
        "sig_buckets": _SIG_BUCKETS,
    }


def _band_frames(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(bands, sigs) frames for ``docs`` under the shared md5/affine
    family — one banding pass, signatures split out so they are stored
    once per doc instead of once per band row. ``sigs`` carries the
    ``sbucket`` partition column for the bucketed sink."""
    from ..queries.dedup import _md5_band_rows

    rows = _md5_band_rows(docs, with_sig=True)
    rows = rows.localCheckpoint(eager=False)  # bands + sigs sinks share one pass
    bands = rows.select("doc_id", "band", "bucket")
    sigs = rows.where(F.col("band") == 0).select(
        "doc_id", "sig", F.pmod(F.hash("doc_id"), F.lit(_SIG_BUCKETS)).alias("sbucket")
    )
    return bands, sigs


def _write_sidecar(path: str) -> None:
    """Atomic sidecar publish: temp file + ``os.replace`` so a reader
    (or a crash) never sees a half-written JSON."""
    dest = os.path.join(path, "_lsh_index.json")
    tmp = dest + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(_family_meta(), fh)
    os.replace(tmp, dest)


def write_bands_store(docs: DataFrame, path: str) -> None:
    """Build the index: band + sign the corpus once, write ``bands/``
    partitioned by band, ``sigs/`` partitioned by hash bucket, and the
    family sidecar. One scan of the corpus, map-side banding, two
    partitioned sinks."""
    bands, sigs = _band_frames(docs)
    _cluster_for_write(bands, "band").write.partitionBy("band").mode(
        "overwrite"
    ).parquet(os.path.join(path, "bands"))
    _cluster_for_write(sigs, "sbucket").write.partitionBy("sbucket").mode(
        "overwrite"
    ).parquet(os.path.join(path, "sigs"))
    _write_sidecar(path)


def read_lsh_index(path: str) -> dict:
    with open(os.path.join(path, "_lsh_index.json")) as fh:
        return json.load(fh)


def _check_family(path: str) -> None:
    meta = read_lsh_index(path)
    if meta != _family_meta():
        raise ValueError(
            f"LSH store family mismatch: store={meta} runtime={_family_meta()}"
        )


def _read_sigs(spark: SparkSession, path: str) -> DataFrame:
    """(doc_id, sig) from the bucketed ``sigs/`` table — the ``sbucket``
    partition column is a physical-layout detail and never leaves the
    reader."""
    return spark.read.parquet(os.path.join(path, "sigs")).select("doc_id", "sig")


def append_bands_store(docs: DataFrame, path: str) -> None:
    """Incremental index maintenance: band a NEW document batch with the
    stored family and append. Banding is fit-free, so append-then-query
    is bit-identical to a full rebuild over the union — the property
    `dedup_lsh_store_upsert` driver-hashes. Refuses a store whose
    sidecar disagrees with the module's family constants (an index
    built under different banding would silently miss duplicates)."""
    _check_family(path)
    bands, sigs = _band_frames(docs)
    _cluster_for_write(bands, "band").write.partitionBy("band").mode(
        "append"
    ).parquet(os.path.join(path, "bands"))
    _cluster_for_write(sigs, "sbucket").write.partitionBy("sbucket").mode(
        "append"
    ).parquet(os.path.join(path, "sigs"))


def _compact_partitioned(spark: SparkSession, root: str, part_col: str) -> None:
    """Rewrite every ``<part_col>=<v>`` directory under ``root`` to one
    file (parallel across partitions via a key repartition), then swap
    the rewritten directories in.

    Crash-recovery contract: phase 1 moves every live directory to
    ``<dir>.old`` and its rewrite into place; the ``.old`` directories
    are deleted only in phase 2, AFTER every partition has swapped. A
    crash mid-phase-1 therefore always leaves each partition's rows in
    exactly one of ``<dir>`` (new) or ``<dir>.old`` (pre-compaction) —
    recovery is "restore any ``.old`` whose ``<dir>`` is missing, then
    delete the rest". This is single-writer compaction (the Delta-log
    sibling `io/delta_log.py` owns multi-writer commit arbitration); a
    concurrent READER between the two renames of one partition can see
    that directory absent for the duration of an ``os.rename``, which
    is the same exposure every swap-based OPTIMIZE without a
    transaction log has.

    Idempotence after a crash: compaction first runs
    :func:`recover_compaction` on ``root``, so leftovers of an
    interrupted earlier run (``*.old`` dirs that partition discovery
    would otherwise merge back in as stale rows, or a stale
    ``*_compact_tmp`` that ``shutil.move`` would nest new output
    inside) are healed instead of corrupting the rewrite."""
    import glob
    import shutil

    recover_compaction(root)
    tmp = root + "_compact_tmp"
    (
        spark.read.parquet(root)
        .repartition(part_col)
        .write.partitionBy(part_col)
        .mode("overwrite")
        .parquet(tmp)
    )
    olds = []
    for pdir in sorted(glob.glob(os.path.join(tmp, f"{part_col}=*"))):
        dest = os.path.join(root, os.path.basename(pdir))
        old = dest + ".old"
        shutil.move(dest, old)
        shutil.move(pdir, dest)
        olds.append(old)
    # every partition swapped — only now drop the pre-compaction copies
    for old in olds:
        shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)


def compact_bands_store(spark: SparkSession, path: str) -> dict:
    """OPTIMIZE for the band index: steady-state appends leave one small
    file per batch in every partition directory; rewrite each ``band=``
    and ``sbucket=`` partition to ONE file. Both tables use the same
    keyed repartition (parallel across partitions — sigs compaction is
    16 concurrent bucket rewrites, never one O(corpus) task) and the
    same deferred-delete directory swap (see :func:`_compact_partitioned`
    for the crash-recovery contract). Refuses a mismatched-family store
    (same guard as append/judge — compacting a legacy layout would
    otherwise die mid-rewrite with bands/ done and sigs/ untouched).
    Returns {"files_before": n, "files_after": m}."""
    import glob

    _check_family(path)

    def _count():
        return len(
            glob.glob(os.path.join(path, "bands", "band=*", "*.parquet"))
        ) + len(glob.glob(os.path.join(path, "sigs", "sbucket=*", "*.parquet")))

    before = _count()
    _compact_partitioned(spark, os.path.join(path, "bands"), "band")
    _compact_partitioned(spark, os.path.join(path, "sigs"), "sbucket")
    return {"files_before": before, "files_after": _count()}


def store_neardup_pairs(spark: SparkSession, path: str) -> DataFrame:
    """Answer the corpus near-dup question PURELY from the store — no
    text, no re-shingling, no re-hashing: bucket-local self-join of the
    skinny ``bands/`` rows for candidates, then two ``sigs/`` joins
    attach the signatures for the agreement estimate (est >= 0.5 via
    the integer compare). Exactly `dedup_minhash_lsh`'s output — the
    store is an execution strategy, not a semantics change, so the SAME
    oracle SQL hashes both."""
    from ..queries.dedup import _N_HASHES

    bands = spark.read.parquet(os.path.join(path, "bands"))
    sigs = _read_sigs(spark, path)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (agree.cast("double") / _N_HASHES).alias("est_jaccard"),
        )
        .where(F.col("est_jaccard") >= 0.5)
    )


def store_judge_docs(spark: SparkSession, path: str, docs: DataFrame) -> DataFrame:
    """Judge an incoming document batch against the persisted index —
    the batch twin of `streaming/dedup.py::stream_neardup_against_
    corpus`, answered from the STORE instead of an in-plan corpus
    banding. Verdict ``(doc_id, max_agree, kept)`` with kept ⇔
    max_agree·2 < n_hashes — the identical verdict arithmetic (and the
    identical SQL oracle) as the streaming path, so stream, batch, and
    store agree on what "near-dup" means. Refuses a mismatched-family
    store like the append path.

    Join order is the scale contract (same shape as
    :func:`store_neardup_pairs`): the batch's SKINNY band rows
    collision-join the store's SKINNY ``bands/`` on (band, bucket),
    candidates reduce to DISTINCT (doc_id, c_doc) pairs, and only THEN
    does ``sigs/`` attach — one signature per *colliding corpus doc*,
    not 8 copies per corpus band row shuffled for docs that never
    collide. Collision-free batch docs re-enter via a left-outer join
    of the batch's own signature table against the per-doc maxima
    (agree = 0, kept = true)."""
    from ..queries.dedup import _N_HASHES

    _check_family(path)
    inc_bands, inc_sigs = _band_frames(docs)
    inc_sigs = inc_sigs.select("doc_id", "sig")
    store_bands = spark.read.parquet(os.path.join(path, "bands")).select(
        F.col("doc_id").alias("c_doc"), "band", "bucket"
    )
    cand = (
        inc_bands.join(store_bands, ["band", "bucket"])
        .select("doc_id", "c_doc")
        .distinct()
    )
    store_sigs = _read_sigs(spark, path).select(
        F.col("doc_id").alias("c_doc"), F.col("sig").alias("c_sig")
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig", "c_sig", lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    hits = (
        cand.join(store_sigs, "c_doc")
        .join(inc_sigs, "doc_id")
        .select("doc_id", agree.alias("agree"))
        .groupBy("doc_id")
        .agg(F.max("agree").alias("agree"))
    )
    return (
        inc_sigs.select("doc_id")
        .join(hits, "doc_id", "left_outer")
        .select(
            "doc_id",
            F.coalesce(F.col("agree"), F.lit(0)).cast("long").alias("max_agree"),
            (F.coalesce(F.col("agree"), F.lit(0)) * 2 < F.lit(_N_HASHES)).alias(
                "kept"
            ),
        )
    )


def store_delta_pairs(spark: SparkSession, path: str, docs: DataFrame) -> DataFrame:
    """Incremental near-dup pair maintenance: ONLY the pairs that touch
    an arriving batch — batch×store collisions plus batch-internal
    collisions — never a recompute of the store's own self-join. This
    is how a 100 TB corpus keeps a duplicate-pair (or dup-graph) table
    current: the full `store_neardup_pairs` self-join is a once-ever
    bootstrap; every later batch pays O(batch band rows + collisions),
    and `delta ∪ previous-pairs = pairs(store ∪ batch)` exactly
    (pinned by pytest) because banding is fit-free.

    Same join discipline as :func:`store_judge_docs`: skinny band rows
    collide first, candidates reduce to DISTINCT ordered (doc_a,
    doc_b), signatures attach once per candidate pair from the union
    of `sigs/` and the batch's own signature frame. Output schema and
    threshold are exactly `store_neardup_pairs`'s (est_jaccard >= 0.5),
    so downstream consumers cannot tell delta rows from bootstrap
    rows. Assumes batch doc_ids are disjoint from the store's (the
    append contract)."""
    from ..queries.dedup import _N_HASHES

    _check_family(path)
    inc_bands, inc_sigs = _band_frames(docs)
    inc_sigs = inc_sigs.select("doc_id", "sig")
    store_bands = spark.read.parquet(os.path.join(path, "bands")).select(
        F.col("doc_id").alias("s_doc"), "band", "bucket"
    )
    cross = (
        inc_bands.join(store_bands, ["band", "bucket"])
        .select(
            F.least("doc_id", "s_doc").alias("doc_a"),
            F.greatest("doc_id", "s_doc").alias("doc_b"),
        )
    )
    a, b = inc_bands.alias("a"), inc_bands.alias("b")
    intra = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    cand = cross.unionByName(intra).distinct()
    sigs = _read_sigs(spark, path).unionByName(inc_sigs)
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (agree.cast("double") / _N_HASHES).alias("est_jaccard"),
        )
        .where(F.col("est_jaccard") >= 0.5)
    )


def recover_compaction(root: str) -> dict:
    """Crash recovery for a directory-swap compaction. ``root`` is ONE
    partitioned-table root: for an IVF store that is the store path
    itself (``cell=*`` lives directly under it); for an LSH store call
    this TWICE — once on ``<store>/bands`` and once on ``<store>/sigs``
    (calling it on the LSH store root is a silent no-op, since no
    ``*.old``/staging dirs live there). Restore any ``<dir>.old`` whose
    ``<dir>`` is missing (the crash hit between that partition's two
    renames), delete the rest (their swap completed), and drop a
    leftover ``*_compact_tmp`` staging dir. Idempotent; safe to run on
    a healthy store (no-op). Returns counts of restored/deleted ``.old``
    directories so an operator can see what the crash interrupted."""
    import glob
    import shutil

    restored = deleted = 0
    for old in sorted(glob.glob(os.path.join(root, "*.old"))):
        dest = old[: -len(".old")]
        if os.path.exists(dest):
            shutil.rmtree(old, ignore_errors=True)
            deleted += 1
        else:
            shutil.move(old, dest)
            restored += 1
    for tmp in glob.glob(os.path.join(root, "*_compact_tmp")) + glob.glob(
        root + "_compact_tmp"
    ):
        shutil.rmtree(tmp, ignore_errors=True)
    return {"restored": restored, "deleted": deleted}
