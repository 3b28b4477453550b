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
- ``sigs/`` — (doc_id, sig) parquet: the 32-component signature stored
  ONCE per document (not 8× through the band explode), attached to
  candidate pairs only when an agreement estimate is needed — the same
  cand + sig-join shape the family's SQL oracle states.
- ``_lsh_index.json`` — the family sidecar (n_hashes, band count, rows
  per band, family name). The hash family itself is the module-constant
  md5/affine chain (`queries.dedup._md5_band_rows` — shared with the
  batch AND streaming paths), so unlike the IVF store there is nothing
  to fit: the sidecar exists to REFUSE appends from a mismatched
  family/layout, the drift that would silently corrupt an index.

Append is embarrassingly incremental — banding is per-row map-side
work, so a new batch pays one scan + one partitioned append and the
appended index is BIT-IDENTICAL to a full rebuild (no refit identity
to argue, unlike IVF-PQ; `dedup_lsh_store_upsert` pins it under the
driver hash). Compaction rewrites each band partition to one file with
the same atomic per-directory swap as the IVF store.

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


def _family_meta() -> dict:
    from ..queries.dedup import _BAND_SIZE, _N_HASHES

    return {
        "family": "md5-affine",
        "n_hashes": _N_HASHES,
        "band_size": _BAND_SIZE,
        "n_bands": _N_HASHES // _BAND_SIZE,
    }


def _band_frames(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(bands, sigs) frames for ``docs`` under the shared md5/affine
    family — one banding pass, signatures split out so they are stored
    once per doc instead of once per band row."""
    from ..queries.dedup import _md5_band_rows

    rows = _md5_band_rows(docs, with_sig=True)
    rows = rows.localCheckpoint(eager=False)  # bands + sigs sinks share one pass
    bands = rows.select("doc_id", "band", "bucket")
    sigs = rows.where(F.col("band") == 0).select("doc_id", "sig")
    return bands, sigs


def write_bands_store(docs: DataFrame, path: str) -> None:
    """Build the index: band + sign the corpus once, write ``bands/``
    partitioned by band, ``sigs/`` flat, and the family sidecar. One
    scan of the corpus, map-side banding, two partitioned sinks."""
    bands, sigs = _band_frames(docs)
    bands.write.partitionBy("band").mode("overwrite").parquet(
        os.path.join(path, "bands")
    )
    sigs.write.mode("overwrite").parquet(os.path.join(path, "sigs"))
    with open(os.path.join(path, "_lsh_index.json"), "w") as fh:
        json.dump(_family_meta(), fh)


def read_lsh_index(path: str) -> dict:
    with open(os.path.join(path, "_lsh_index.json")) as fh:
        return json.load(fh)


def append_bands_store(spark: SparkSession, docs: DataFrame, path: str) -> None:
    """Incremental index maintenance: band a NEW document batch with the
    stored family and append. Banding is fit-free, so append-then-query
    is bit-identical to a full rebuild over the union — the property
    `dedup_lsh_store_upsert` driver-hashes. Refuses a store whose
    sidecar disagrees with the module's family constants (an index
    built under different banding would silently miss duplicates)."""
    meta = read_lsh_index(path)
    if meta != _family_meta():
        raise ValueError(
            f"LSH store family mismatch: store={meta} runtime={_family_meta()}"
        )
    bands, sigs = _band_frames(docs)
    bands.write.partitionBy("band").mode("append").parquet(
        os.path.join(path, "bands")
    )
    sigs.write.mode("append").parquet(os.path.join(path, "sigs"))


def compact_bands_store(spark: SparkSession, path: str) -> dict:
    """OPTIMIZE for the band index: steady-state appends leave one small
    file per batch in every ``band=<b>`` directory; rewrite each band
    partition to ONE file (hash-repartition by band keeps the rewrite
    parallel across bands), atomic per-directory swap so a concurrent
    reader never sees a half-written band. ``sigs/`` is rewritten to a
    single file the same way (it is flat and O(corpus) rows — at real
    scale it would carry its own partitioning; the swap logic is
    identical). Returns {"files_before": n, "files_after": m}."""
    import glob
    import shutil

    def _count():
        return len(
            glob.glob(os.path.join(path, "bands", "band=*", "*.parquet"))
        ) + len(glob.glob(os.path.join(path, "sigs", "*.parquet")))

    before = _count()
    tmp = os.path.join(path, "_compact_tmp")
    (
        spark.read.parquet(os.path.join(path, "bands"))
        .repartition("band")
        .write.partitionBy("band")
        .mode("overwrite")
        .parquet(tmp)
    )
    for bdir in glob.glob(os.path.join(tmp, "band=*")):
        dest = os.path.join(path, "bands", os.path.basename(bdir))
        old = dest + ".old"
        shutil.move(dest, old)
        shutil.move(bdir, dest)  # atomic publish per band
        shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    sig_tmp = os.path.join(path, "_sigs_tmp")
    spark.read.parquet(os.path.join(path, "sigs")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(sig_tmp)
    old = os.path.join(path, "sigs.old")
    shutil.move(os.path.join(path, "sigs"), old)
    shutil.move(sig_tmp, os.path.join(path, "sigs"))
    shutil.rmtree(old, ignore_errors=True)
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
    sigs = spark.read.parquet(os.path.join(path, "sigs"))
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
    banding: the batch is banded map-side with the shared family, its
    band rows LEFT OUTER join the store's ``bands/`` on (band, bucket)
    (collision-free docs keep a row), store signatures attach from
    ``sigs/``, and one max-aggregation per doc yields the verdict
    ``(doc_id, max_agree, kept)`` with kept ⇔ max_agree·2 < n_hashes —
    the identical verdict arithmetic (and the identical SQL oracle) as
    the streaming path, so stream, batch, and store agree on what
    "near-dup" means. Refuses a mismatched-family store like the
    append path."""
    from ..queries.dedup import _N_HASHES, _md5_band_rows

    meta = read_lsh_index(path)
    if meta != _family_meta():
        raise ValueError(
            f"LSH store family mismatch: store={meta} runtime={_family_meta()}"
        )
    incoming = _md5_band_rows(docs, with_sig=True)
    store_bands = spark.read.parquet(os.path.join(path, "bands")).select(
        F.col("doc_id").alias("c_doc"), "band", "bucket"
    )
    store_sigs = spark.read.parquet(os.path.join(path, "sigs")).select(
        F.col("doc_id").alias("c_doc"), F.col("sig").alias("c_sig")
    )
    hit = store_bands.join(store_sigs, "c_doc")
    agree = F.size(
        F.filter(
            F.zip_with("sig", "c_sig", lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    j = incoming.join(hit, ["band", "bucket"], "left_outer").select(
        "doc_id",
        F.when(F.col("c_sig").isNull(), F.lit(0)).otherwise(agree).alias("agree"),
    )
    return j.groupBy("doc_id").agg(
        F.max("agree").cast("long").alias("max_agree"),
        (F.max("agree") * 2 < F.lit(_N_HASHES)).alias("kept"),
    )
