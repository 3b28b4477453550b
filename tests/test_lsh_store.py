"""Persisted LSH band-index store (io/lsh_store.py): layout, sidecar
family validation, incremental append identity, compaction."""

from __future__ import annotations

import glob
import os

from etl_github_spark.io.lsh_store import (
    append_bands_store,
    compact_bands_store,
    read_lsh_index,
    store_neardup_pairs,
    write_bands_store,
)

from .conftest import SF_SMALL


def _docs(spark):
    from etl_github_spark.io.tables import load_table

    return load_table(spark, SF_SMALL, "documents")


def test_store_layout_and_sidecar(spark, tmp_path):
    """bands/ is partitioned by band (8 dirs), sigs/ holds one row per
    banded doc, and the sidecar records the md5/affine family."""
    path = str(tmp_path / "store")
    docs = _docs(spark)
    write_bands_store(docs, path)
    band_dirs = sorted(glob.glob(os.path.join(path, "bands", "band=*")))
    assert len(band_dirs) == 8
    meta = read_lsh_index(path)
    assert meta["family"] == "md5-affine"
    assert meta["n_hashes"] == 32 and meta["band_size"] == 4
    n_sigs = spark.read.parquet(os.path.join(path, "sigs")).count()
    n_banded = docs.where("size(split(text, ' ')) >= 3").count()
    assert n_sigs == n_banded
    # every banded doc contributes exactly 8 band rows
    n_bands = spark.read.parquet(os.path.join(path, "bands")).count()
    assert n_bands == 8 * n_sigs


def test_append_equals_full_rebuild(spark, tmp_path):
    """Fit-free index: build-half + append-half must equal the full
    build bit for bit (pairs AND estimates)."""
    docs = _docs(spark)
    full, inc = str(tmp_path / "full"), str(tmp_path / "inc")
    write_bands_store(docs, full)
    write_bands_store(docs.where("doc_id % 2 = 0"), inc)
    append_bands_store(spark, docs.where("doc_id % 2 = 1"), inc)
    rows_full = sorted(tuple(r) for r in store_neardup_pairs(spark, full).collect())
    rows_inc = sorted(tuple(r) for r in store_neardup_pairs(spark, inc).collect())
    assert rows_full == rows_inc and rows_full


def test_append_refuses_family_mismatch(spark, tmp_path):
    """A sidecar that disagrees with the runtime family constants must
    refuse the append — a mixed-family index silently misses dups."""
    import json

    import pytest

    path = str(tmp_path / "store")
    docs = _docs(spark)
    write_bands_store(docs, path)
    meta = read_lsh_index(path)
    meta["band_size"] = 8  # a 4x8 layout store
    with open(os.path.join(path, "_lsh_index.json"), "w") as fh:
        json.dump(meta, fh)
    with pytest.raises(ValueError, match="family mismatch"):
        append_bands_store(spark, docs.limit(1), path)


def test_compaction_reduces_files_and_preserves_results(spark, tmp_path):
    """After two appends each band dir holds >=3 files; compaction must
    bring every band partition to one file without changing a single
    pair or estimate."""
    path = str(tmp_path / "store")
    docs = _docs(spark)
    write_bands_store(docs.where("doc_id % 3 = 0"), path)
    append_bands_store(spark, docs.where("doc_id % 3 = 1"), path)
    append_bands_store(spark, docs.where("doc_id % 3 = 2"), path)
    before = sorted(tuple(r) for r in store_neardup_pairs(spark, path).collect())
    stats = compact_bands_store(spark, path)
    assert stats["files_after"] < stats["files_before"]
    for bdir in glob.glob(os.path.join(path, "bands", "band=*")):
        assert len(glob.glob(os.path.join(bdir, "*.parquet"))) == 1
    after = sorted(tuple(r) for r in store_neardup_pairs(spark, path).collect())
    assert before == after


def test_store_judge_agrees_with_streaming_verdicts(spark, tmp_path):
    """Judging a batch from the store must reproduce the streaming
    path's verdicts row for row (same family, same kept rule), and a
    family-mismatched store must refuse to judge."""
    import json

    import pytest
    from pyspark.sql import functions as F

    from etl_github_spark.io.lsh_store import store_judge_docs
    from etl_github_spark.queries.dedup import _md5_band_rows
    from etl_github_spark.streaming.dedup import stream_neardup_against_corpus

    docs = _docs(spark)
    corpus = docs.where("doc_id % 2 = 0")
    batch = docs.where("doc_id % 2 = 1")
    path = str(tmp_path / "store")
    write_bands_store(corpus, path)
    from_store = sorted(
        tuple(r) for r in store_judge_docs(spark, path, batch).collect()
    )
    streaming = sorted(
        tuple(r)
        for r in stream_neardup_against_corpus(
            batch, _md5_band_rows(corpus, with_sig=True)
        ).collect()
    )
    assert from_store == streaming and from_store

    meta = read_lsh_index(path)
    meta["n_hashes"] = 64
    with open(os.path.join(path, "_lsh_index.json"), "w") as fh:
        json.dump(meta, fh)
    with pytest.raises(ValueError, match="family mismatch"):
        store_judge_docs(spark, path, batch.limit(1))
