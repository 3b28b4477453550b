"""Manifest-versioned tables: time travel + optimistic concurrent
commits on the plain-parquet layout.

This recovers the two Delta behaviors a parquet directory alone cannot
give (ARCHITECTURE.md §storage: delta-spark is not installable here):

- **Snapshot isolation / time travel.** Every commit writes its data
  files under an immutable batch directory, then publishes a manifest
  ``_v<N>.json`` listing ALL live batch dirs for that version. Readers
  resolve a manifest first, so they see a consistent snapshot no matter
  what writers do concurrently, and ``vread(..., version=K)`` reads any
  retained historical version.
- **Atomic, concurrent-writer commits.** The commit point is creating
  the next version file with ``O_CREAT | O_EXCL`` — atomic on POSIX and
  on object stores with put-if-absent. Two concurrent appenders race
  for version N; the loser re-reads the winner's manifest and retries
  at N+1, so both appends land (serialized, neither lost) — the
  optimistic-concurrency loop of a Delta/Iceberg commit. A writer that
  crashes pre-publish leaves an unreferenced batch dir: invisible to
  every reader, reaped by ``vvacuum``.

The reference's Delta usage (append + overwrite + vacuum,
preprocess.py:165-206) maps onto ``vwrite(mode=...)`` + ``vvacuum``;
what parquet-only `write_table` cannot express — reading yesterday's
snapshot while today's append commits — this can.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_V_PREFIX = "_v"


def _versions(path: str) -> list[int]:
    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return []
    out = []
    for n in names:
        if n.startswith(_V_PREFIX) and n.endswith(".json"):
            try:
                out.append(int(n[len(_V_PREFIX) : -5]))
            except ValueError:
                pass
    return sorted(out)


def latest_version(path: str) -> int | None:
    vs = _versions(path)
    return vs[-1] if vs else None


def _read_manifest(path: str, version: int) -> dict:
    with open(os.path.join(path, f"{_V_PREFIX}{version}.json")) as fh:
        return json.load(fh)


def vwrite(
    df: DataFrame,
    path: str,
    mode: str = "append",
    max_retries: int = 20,
) -> int:
    """Commit ``df`` as a new table version; returns the version number.

    The data write happens ONCE into an immutable uuid batch dir; only
    the (tiny) manifest commit retries under contention.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    os.makedirs(path, exist_ok=True)
    batch = f"batch-{uuid.uuid4().hex}"
    df.write.mode("error").parquet(os.path.join(path, batch))

    for _ in range(max_retries):
        head = latest_version(path)
        if mode == "append" and head is not None:
            batches = _read_manifest(path, head)["batches"] + [batch]
        else:
            batches = [batch]
        target = (head or 0) + 1
        manifest = {"version": target, "batches": batches, "parent": head}
        tmp = os.path.join(path, f".{_V_PREFIX}{target}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1)
        final = os.path.join(path, f"{_V_PREFIX}{target}.json")
        try:
            # commit point: hard-link the fully-written manifest to the
            # version name — fails if the version exists (first wins)
            # and the winner's content appears atomically, so no reader
            # can ever observe a partial or empty manifest.
            os.link(tmp, final)
            os.unlink(tmp)
            return target
        except FileExistsError:
            os.unlink(tmp)
            # another writer took this version — recompute against the
            # new head (append folds their batches in; overwrite simply
            # claims the next slot)
            time.sleep(0.01)
    raise RuntimeError(f"commit contention: gave up after {max_retries} retries")


def vread(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Read a consistent snapshot (latest, or time-travel to ``version``)."""
    head = latest_version(path) if version is None else version
    if head is None:
        raise FileNotFoundError(f"no committed version in {path}")
    m = _read_manifest(path, head)
    return spark.read.parquet(*[os.path.join(path, b) for b in m["batches"]])


def vvacuum(path: str, keep_versions: int = 1) -> list[str]:
    """Drop manifests older than the newest ``keep_versions`` and delete
    batch dirs no retained manifest references (crashed pre-publish
    writers and overwritten history). Returns removed batch dirs."""
    vs = _versions(path)
    keep = set(vs[-keep_versions:]) if vs else set()
    live: set[str] = set()
    for v in keep:
        live |= set(_read_manifest(path, v)["batches"])
    removed = []
    for v in vs:
        if v not in keep:
            os.unlink(os.path.join(path, f"{_V_PREFIX}{v}.json"))
    for e in os.listdir(path):
        full = os.path.join(path, e)
        if e.startswith("batch-") and os.path.isdir(full) and e not in live:
            shutil.rmtree(full)
            removed.append(e)
    return removed
