"""Manifest-versioned tables: time travel, atomic concurrent commits,
crash invisibility, vacuum."""

from __future__ import annotations

import os

import pytest

from etl_github_spark.io.versioned import (
    latest_version,
    vread,
    vvacuum,
    vwrite,
)


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x long")


def _vals(spark, path, version=None):
    return sorted(r.x for r in vread(spark, path, version).collect())


def test_append_overwrite_and_time_travel(spark, tmp_path):
    p = str(tmp_path / "t")
    assert vwrite(_df(spark, [1, 2]), p) == 1
    assert vwrite(_df(spark, [3]), p) == 2
    assert vwrite(_df(spark, [9]), p, mode="overwrite") == 3

    assert _vals(spark, p) == [9]               # head
    assert _vals(spark, p, 1) == [1, 2]         # time travel
    assert _vals(spark, p, 2) == [1, 2, 3]
    assert latest_version(p) == 3


def test_crashed_writer_is_invisible_and_vacuumed(spark, tmp_path):
    p = str(tmp_path / "t")
    vwrite(_df(spark, [1]), p)
    # a writer that died after the data write but before the manifest
    # commit: batch dir exists, no manifest references it
    _df(spark, [999]).write.parquet(f"{p}/batch-deadbeef")

    assert _vals(spark, p) == [1]  # invisible to readers
    removed = vvacuum(p, keep_versions=1)
    assert removed == ["batch-deadbeef"]
    assert _vals(spark, p) == [1]


def test_vacuum_drops_history_but_keeps_retained(spark, tmp_path):
    p = str(tmp_path / "t")
    vwrite(_df(spark, [1]), p)
    vwrite(_df(spark, [2]), p)
    vwrite(_df(spark, [7]), p, mode="overwrite")

    removed = vvacuum(p, keep_versions=1)
    # the overwritten history's batch dirs are gone, head still reads
    assert len(removed) == 2
    assert _vals(spark, p) == [7]
    with pytest.raises(Exception):
        vread(spark, p, 1)


def test_concurrent_appends_both_land(spark, tmp_path):
    """Two appenders racing for the same version must BOTH commit (the
    loser retries against the winner's manifest) — no lost update."""
    import threading

    p = str(tmp_path / "t")
    vwrite(_df(spark, [0]), p)

    errs = []

    def appender(v):
        try:
            vwrite(_df(spark, [v]), p)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=appender, args=(v,)) for v in (1, 2, 3, 4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    assert latest_version(p) == 5
    assert _vals(spark, p) == [0, 1, 2, 3, 4]


def test_readers_see_consistent_snapshot_during_commit(spark, tmp_path):
    """A reader that resolved version N keeps reading N's files even
    after an overwrite commits N+1 (no torn read), until vacuum."""
    p = str(tmp_path / "t")
    vwrite(_df(spark, [1, 2]), p)
    snapshot = vread(spark, p)  # resolves v1's file list now
    vwrite(_df(spark, [9]), p, mode="overwrite")
    assert sorted(r.x for r in snapshot.collect()) == [1, 2]
    assert _vals(spark, p) == [9]
