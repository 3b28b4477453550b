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
  live files + add the new ones) — the reference's two write modes,
  BOTH schema-enforced against the table's metaData by field names and
  types (nullability/metadata-insensitive: Spark file sources force
  read schemas nullable, so a table's own read-back snapshot must
  append cleanly);
* snapshot replay at latest or any historical version (time travel by
  version, the DESCRIBE HISTORY analog via :func:`history`), with the
  scan schema taken from the LOG's metaData, not file-order luck;
* per-file ``stats`` on add actions (numRecords + min/max of the stats
  columns) so the high-water-mark scan can be answered from the LOG
  alone, like the reference's dt.get_add_actions() trick.

Crash/concurrency story: a commit is staged as a hidden temp file,
fsync'd, then atomically CLAIMED via ``os.link`` to the version name —
the version file is never visible in a torn state, exactly one writer
wins a version (losers raise FileExistsError), and a loser's staged
data files are removed before the error propagates (no orphan leak).
:func:`vacuum_delta` additionally reaps any data file the log does not
reference (crashed pre-commit stagings). :func:`_replay` refuses
non-contiguous logs (a missing version file means lost commits — an
error, never a silently wrong snapshot).

Deliberately out of scope (documented, not silently faked): checkpoint
parquet files (readers must replay JSON from 0), deletion vectors,
column mapping, partitioned tables (partitionValues always {}), and
schema EVOLUTION (writes must match the recorded schema's field names
and types — real Delta's default behavior without mergeSchema). Interop with
delta-spark cannot be tested in this env; the protocol shape follows
the public spec so a real reader should accept these tables, and the
round-trip is pinned by tests + a driver-hashed registry query
(``lake_delta_log_scan``).
"""

from __future__ import annotations

import datetime as _dt
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


def _json_safe(v):
    """Stats values → JSON-storable form (Delta stores timestamps/dates
    as ISO strings). Returns ``_OMIT`` for types stats can't carry."""
    if isinstance(v, bool) or v is None:
        return v
    if isinstance(v, (int, float, str)):
        return v
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:  # normalize to naive UTC, like the engine
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    return _OMIT


_OMIT = object()


def _stage_files(df: DataFrame, table: str, stats_cols: tuple[str, ...]) -> list[dict]:
    """Write df's parquet files under the table dir and return their add
    actions (path relative to the table root, size, stats)."""
    import glob
    import shutil

    import pyarrow.parquet as pq

    stage = os.path.join(table, f".stage-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(stage)
    adds = []
    try:
        for f in sorted(glob.glob(os.path.join(stage, "part-*.parquet"))):
            md = pq.ParquetFile(f).metadata  # one footer read per file
            if md.num_rows == 0:
                continue  # empty partitions produce 0-row files: nothing to commit
            name = f"part-{uuid.uuid4().hex}.parquet"
            dest = os.path.join(table, name)
            shutil.move(f, dest)
            stats = _file_stats(md, stats_cols)
            adds.append(
                {
                    "path": name,
                    "partitionValues": {},
                    "size": os.path.getsize(dest),
                    "modificationTime": 0,
                    "dataChange": True,
                    **({"stats": json.dumps(stats)} if stats is not None else {}),
                }
            )
    except Exception:
        _remove_staged(table, adds)
        raise
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return adds


def _remove_staged(table: str, adds: list[dict]) -> None:
    for a in adds:
        try:
            os.remove(os.path.join(table, a["path"]))
        except OSError:
            pass


def _file_stats(md, cols: tuple[str, ...]) -> dict | None:
    """numRecords + min/max per requested column from the parquet footer
    metadata (no data read), serialized the way Delta stores them (JSON
    string on the add action). A column with incomplete or
    non-JSON-able stats is OMITTED (never guessed); other columns keep
    theirs. Stats are metadata — they must never fail a commit, so any
    unexpected footer shape degrades to numRecords-only."""
    stats: dict = {"numRecords": md.num_rows, "minValues": {}, "maxValues": {}}
    try:
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
                    mins = []
                    break
                mins.append(s.min)
                maxs.append(s.max)
            if not mins:
                continue  # omit THIS column only
            lo, hi = _json_safe(min(mins)), _json_safe(max(maxs))
            if lo is _OMIT or hi is _OMIT:
                continue
            stats["minValues"][c] = lo
            stats["maxValues"][c] = hi
        return stats
    except Exception:  # pragma: no cover - stats never abort a commit
        # unexpected footer shape: degrade to numRecords-only, as promised
        return {"numRecords": md.num_rows, "minValues": {}, "maxValues": {}}


def _commit(table: str, version: int, actions: list[dict]) -> None:
    """Atomically publish the next version file: stage a hidden temp
    file with the FULL payload, fsync, then CLAIM the version name via
    ``os.link`` — readers can never observe a torn or empty version
    file, and exactly one of two racing writers wins (the loser's link
    raises FileExistsError — the real protocol's optimistic-concurrency
    guarantee on filesystems with atomic link/create)."""
    os.makedirs(_log_path(table), exist_ok=True)
    payload = ("\n".join(json.dumps(a) for a in actions) + "\n").encode()
    tmp = os.path.join(_log_path(table), f".tmp-{uuid.uuid4().hex}.json")
    fd = os.open(tmp, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    try:
        written = os.write(fd, payload)
        if written != len(payload):  # pragma: no cover - short write (ENOSPC)
            raise OSError(f"short write committing version {version}")
        os.fsync(fd)
    finally:
        os.close(fd)
    try:
        os.link(tmp, _version_file(table, version))
    except Exception:
        try:
            os.remove(tmp)
        except OSError:  # pragma: no cover
            pass  # vacuum_delta reaps leaked .tmp files
        raise
    # PUBLISHED. Nothing after this point may look like a failed commit:
    # the version file exists and its data files must stay. Make the new
    # directory entry durable (a power loss before the dirent flushes
    # would silently lose an acknowledged latest version), then drop the
    # temp name — both best-effort, both irrelevant to correctness of
    # the already-linked version file's CONTENT (it was fsync'd above).
    try:  # pragma: no cover - platform-dependent dir-fsync support
        dfd = os.open(_log_path(table), os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    except OSError:
        pass
    try:
        os.remove(tmp)
    except OSError:  # pragma: no cover
        pass


def write_delta(
    df: DataFrame,
    table: str,
    mode: str = "append",
    stats_cols: tuple[str, ...] = (),
) -> int:
    """Commit df to the Delta table at ``table`` (append or overwrite);
    returns the committed version. Version 0 carries protocol+metaData
    like real Delta; both modes are schema-enforced against that
    metaData by field names/types (schema evolution is out of scope —
    mismatches raise, they never silently drop or null columns);
    overwrite commits remove every live file first. If the version race
    is lost, this attempt's staged data files are removed before
    FileExistsError propagates; once the version file is linked, the
    commit is irrevocable and later cleanup hiccups cannot unstage it."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unsupported mode: {mode}")
    os.makedirs(table, exist_ok=True)
    versions = _list_versions(table)
    _check_contiguous(table, versions)  # never commit onto a gapped log
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
    else:
        recorded = _table_schema_json(table)
        if recorded is not None and _schema_shape(
            json.loads(recorded)
        ) != _schema_shape(json.loads(df.schema.json())):
            raise ValueError(
                f"schema mismatch writing to {table} (mode={mode}): the "
                "table's metaData schema differs from the DataFrame's in "
                "field names or types. Append and overwrite both enforce "
                "the recorded schema — metaData is written once, so an "
                "unchecked write would make readers apply a stale schema; "
                "schema evolution is out of scope for this minimal writer"
            )
        if mode == "overwrite":
            for f in snapshot_files(table):
                actions.append(
                    {"remove": {"path": f, "deletionTimestamp": 0, "dataChange": True}}
                )
    adds = _stage_files(df, table, stats_cols)
    actions.extend({"add": a} for a in adds)
    actions.append(
        {
            "commitInfo": {
                "operation": "WRITE",
                "operationParameters": {"mode": mode.upper()},
                "timestamp": 0,
            }
        }
    )
    try:
        _commit(table, version, actions)
    except Exception:
        _remove_staged(table, adds)  # lost race / failed publish: no orphans
        raise
    return version


def _schema_shape(schema_dict):
    """Schema compared by field NAMES and TYPES only: nullability and
    field metadata are dropped recursively. Spark file sources force
    read schemas nullable, so exact JSON equality would reject a
    table's own read-back snapshot — real Delta accepts
    nullable-compatible writes."""
    if isinstance(schema_dict, dict):
        return {
            k: _schema_shape(v)
            for k, v in schema_dict.items()
            if k not in ("nullable", "metadata", "containsNull", "valueContainsNull")
        }
    if isinstance(schema_dict, list):
        return [_schema_shape(v) for v in schema_dict]
    return schema_dict


def _check_contiguous(table: str, versions: list[int]) -> None:
    if versions and (
        versions[0] != 0 or versions != list(range(versions[0], versions[-1] + 1))
    ):
        raise ValueError(
            f"non-contiguous Delta log in {table}: versions {versions} "
            "(a missing version file means lost commits)"
        )


def _table_schema_json(table: str) -> str | None:
    try:
        with open(_version_file(table, 0)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "metaData" in action:
                    return action["metaData"]["schemaString"]
    except (OSError, json.JSONDecodeError):
        return None
    return None


def _replay(table: str, version: int | None = None) -> dict[str, dict]:
    """Replay the log up to ``version`` (inclusive; None = latest) →
    {relative path: add action} of live files. A gap in the version
    chain means commits were lost: raise, never return a silently
    wrong snapshot."""
    versions = _list_versions(table)
    if not versions:
        raise FileNotFoundError(f"not a Delta table (no {_LOG_DIR}): {table}")
    _check_contiguous(table, versions)
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


def _log_schema(table: str):
    from pyspark.sql.types import StructType

    schema_json = _table_schema_json(table)
    if schema_json is None:
        raise ValueError(f"no metaData action in version 0 of {table}")
    return StructType.fromJson(json.loads(schema_json))


def read_delta(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Snapshot scan (time travel with ``version``). Reads exactly the
    live files the log names — never a directory listing, so stray or
    uncommitted files are invisible — under the LOG's recorded schema
    (not whichever footer Spark happens to resolve first), like real
    Delta."""
    schema = _log_schema(table)
    files = [os.path.join(table, f) for f in snapshot_files(table, version)]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*files)


def vacuum_delta(table: str, retention_seconds: float = 24 * 3600) -> list[str]:
    """Remove files the log does not reference — crashed pre-commit
    stagings (data part files, ``.stage-*`` dirs) and leaked
    ``.tmp-*.json`` commit stagings in ``_delta_log``. Returns the
    reaped relative paths.

    ``retention_seconds`` guards the inherent race with an IN-FLIGHT
    writer (whose staged data files are log-unreferenced until its
    commit lands): only files older than the retention are reaped —
    the same reason real Delta's VACUUM has a retention period and
    warns on retention 0. Refuses to run on a non-contiguous log: with
    versions missing, every file the lost versions added would look
    unreferenced, and vacuuming would turn a recoverable log problem
    into permanent data loss."""
    import glob
    import shutil
    import time

    _check_contiguous(table, _list_versions(table))
    cutoff = time.time() - retention_seconds
    live = set()
    for v in _list_versions(table):
        with open(_version_file(table, v)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "add" in action:
                    live.add(action["add"]["path"])
    reaped = []
    for f in glob.glob(os.path.join(table, "part-*.parquet")):
        rel = os.path.basename(f)
        if rel not in live and os.path.getmtime(f) < cutoff:
            os.remove(f)
            reaped.append(rel)
    for f in glob.glob(os.path.join(_log_path(table), ".tmp-*.json")):
        if os.path.getmtime(f) < cutoff:
            os.remove(f)
            reaped.append(os.path.join(_LOG_DIR, os.path.basename(f)))
    for d in glob.glob(os.path.join(table, ".stage-*")):
        if os.path.getmtime(d) < cutoff:
            shutil.rmtree(d, ignore_errors=True)
            reaped.append(os.path.basename(d))
    return sorted(reaped)


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
