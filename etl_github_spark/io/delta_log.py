"""Minimal Delta-Lake transaction log: append/overwrite commits + replay.

The reference stores its lakehouse in Delta (preprocess.py:169-175
`write_deltalake`, :181-186 add-action stats scan, :199-206
OPTIMIZE/VACUUM). This environment has no delta-spark, so the engine's
primary storage is plain Parquet with the semantics re-implemented on
manifests (io/sink.py, io/versioned.py — SURVEY §1.4 sanctioned
fallback). This module closes part of the remaining FORMAT gap with a
from-scratch implementation of the published Delta transaction-log
protocol (delta-io/delta PROTOCOL.md), scoped to the subset the
reference actually uses:

* ``_delta_log/<20-digit version>.json`` commits containing
  ``protocol`` / ``metaData`` / ``add`` / ``remove`` actions
  (NDJSON, one action per line — reader version 1, writer version 2);
* append commits (add actions only) and overwrite commits (remove all
  live files + add the new ones) — the reference's two write modes;
* snapshot replay at latest or any historical version (time travel by
  version, the DESCRIBE HISTORY analog via :func:`history`);
* per-file ``stats`` on add actions (numRecords + min/max of the stats
  columns) so the high-water-mark scan can be answered from the LOG
  alone, like the reference's dt.get_add_actions() trick.

Deliberately out of scope (documented, not silently faked): checkpoint
parquet files (readers must replay JSON from 0), deletion vectors,
column mapping, partitioned tables (partitionValues always {}), and
concurrent-writer conflict detection beyond atomic
O_CREAT-new-file commit (two writers racing the same version: exactly
one wins, the loser raises — the same optimistic protocol real Delta
uses on filesystems with atomic create). Interop with delta-spark
cannot be tested in this env; the protocol shape follows the public
spec so a real reader should accept these tables, and the round-trip
is pinned by tests + a driver-hashed registry query
(``lake_delta_log_scan``).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


_LOG_DIR = "_delta_log"


def _log_path(table: str) -> str:
    return os.path.join(table, _LOG_DIR)


def _version_file(table: str, version: int) -> str:
    return os.path.join(_log_path(table), f"{version:020d}.json")


def _list_versions(table: str) -> list[int]:
    log = _log_path(table)
    if not os.path.isdir(log):
        return []
    out = []
    for name in os.listdir(log):
        if name.endswith(".json") and len(name) == 25:
            try:
                out.append(int(name[:-5]))
            except ValueError:
                continue
    return sorted(out)


def _stage_files(df: DataFrame, table: str, stats_cols: tuple[str, ...]) -> list[dict]:
    """Write df's parquet files under the table dir and return their add
    actions (path relative to the table root, size, stats)."""
    import glob
    import shutil

    stage = os.path.join(table, f".stage-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(stage)
    adds = []
    for f in sorted(glob.glob(os.path.join(stage, "part-*.parquet"))):
        import pyarrow.parquet as pq

        if pq.ParquetFile(f).metadata.num_rows == 0:
            continue  # empty partitions produce 0-row files: nothing to commit
        name = f"part-{uuid.uuid4().hex}.parquet"
        dest = os.path.join(table, name)
        shutil.move(f, dest)
        stats = _file_stats(dest, stats_cols)
        adds.append(
            {
                "path": name,
                "partitionValues": {},
                "size": os.path.getsize(dest),
                "modificationTime": 0,
                "dataChange": True,
                **({"stats": json.dumps(stats)} if stats else {}),
            }
        )
    shutil.rmtree(stage, ignore_errors=True)
    return adds


def _file_stats(path: str, cols: tuple[str, ...]) -> dict | None:
    """numRecords + min/max per requested column from the parquet footer
    (metadata-only — no data read), serialized the way Delta stores
    them (JSON string on the add action)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    stats: dict = {"numRecords": md.num_rows, "minValues": {}, "maxValues": {}}
    if not cols:
        return stats
    name_to_idx = {md.schema.column(i).name: i for i in range(len(md.schema))}
    for c in cols:
        i = name_to_idx.get(c)
        if i is None:
            continue
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            s = md.row_group(rg).column(i).statistics
            if s is None or not s.has_min_max:
                return stats  # incomplete stats: omit rather than lie
            mins.append(s.min)
            maxs.append(s.max)
        if mins:
            stats["minValues"][c] = min(mins)
            stats["maxValues"][c] = max(maxs)
    return stats


def _commit(table: str, version: int, actions: list[dict]) -> None:
    """Atomically create the next version file. O_CREAT|O_EXCL gives the
    real protocol's optimistic-concurrency guarantee on local/HDFS-like
    filesystems: exactly one writer wins a version; losers raise."""
    os.makedirs(_log_path(table), exist_ok=True)
    payload = "\n".join(json.dumps(a) for a in actions) + "\n"
    fd = os.open(_version_file(table, version), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    try:
        os.write(fd, payload.encode())
    finally:
        os.close(fd)


def write_delta(
    df: DataFrame,
    table: str,
    mode: str = "append",
    stats_cols: tuple[str, ...] = (),
) -> int:
    """Commit df to the Delta table at ``table`` (append or overwrite);
    returns the committed version. Version 0 carries protocol+metaData
    like real Delta; overwrite commits remove every live file first."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unsupported mode: {mode}")
    os.makedirs(table, exist_ok=True)
    versions = _list_versions(table)
    version = (versions[-1] + 1) if versions else 0
    actions: list[dict] = []
    if version == 0:
        actions.append({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}})
        actions.append(
            {
                "metaData": {
                    "id": uuid.uuid4().hex,
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": df.schema.json(),
                    "partitionColumns": [],
                    "configuration": {},
                    "createdTime": 0,
                }
            }
        )
    elif mode == "overwrite":
        for f in snapshot_files(table):
            actions.append(
                {"remove": {"path": f, "deletionTimestamp": 0, "dataChange": True}}
            )
    actions.extend({"add": a} for a in _stage_files(df, table, stats_cols))
    actions.append(
        {
            "commitInfo": {
                "operation": "WRITE",
                "operationParameters": {"mode": mode.upper()},
                "timestamp": 0,
            }
        }
    )
    _commit(table, version, actions)
    return version


def _replay(table: str, version: int | None = None) -> dict[str, dict]:
    """Replay the log up to ``version`` (inclusive; None = latest) →
    {relative path: add action} of live files."""
    versions = _list_versions(table)
    if not versions:
        raise FileNotFoundError(f"not a Delta table (no {_LOG_DIR}): {table}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(f"version {version} not in table history {versions}")
    live: dict[str, dict] = {}
    for v in versions:
        if v > version:
            break
        with open(_version_file(table, v)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "add" in action:
                    live[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
    return live


def snapshot_files(table: str, version: int | None = None) -> list[str]:
    """Live data-file paths (relative) at a version — the scan manifest."""
    return sorted(_replay(table, version))


def read_delta(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Snapshot scan (time travel with ``version``). Reads exactly the
    live files the log names — never a directory listing, so stray or
    uncommitted files are invisible, like real Delta."""
    files = [os.path.join(table, f) for f in snapshot_files(table, version)]
    if not files:
        # empty snapshot: derive schema from the log's metaData
        from pyspark.sql.types import StructType

        with open(_version_file(table, 0)) as fh:
            for line in fh:
                action = json.loads(line)
                if "metaData" in action:
                    schema = StructType.fromJson(
                        json.loads(action["metaData"]["schemaString"])
                    )
                    return spark.createDataFrame([], schema)
        raise ValueError(f"no metaData action in version 0 of {table}")
    return spark.read.parquet(*files)


def high_water_mark(table: str, col: str, version: int | None = None):
    """max(col) over the live snapshot answered from add-action STATS
    alone — zero data files opened (the reference's get_add_actions
    trick, preprocess.py:181-186). Returns None when any live file
    lacks stats for the column (falling back to a scan is the caller's
    choice — never silently wrong)."""
    maxes = []
    for add in _replay(table, version).values():
        stats = json.loads(add["stats"]) if "stats" in add else None
        if not stats or col not in stats.get("maxValues", {}):
            return None
        maxes.append(stats["maxValues"][col])
    return max(maxes) if maxes else None


def history(table: str) -> list[dict]:
    """DESCRIBE HISTORY analog: one row per commit (version, operation,
    file add/remove counts)."""
    out = []
    for v in _list_versions(table):
        adds = removes = 0
        op = None
        with open(_version_file(table, v)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                adds += "add" in action
                removes += "remove" in action
                if "commitInfo" in action:
                    op = action["commitInfo"].get("operation")
        out.append({"version": v, "operation": op, "adds": adds, "removes": removes})
    return out
