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

Round 7 closes the two gaps the round-5 review named first:

* **partitioned tables** (the reference's actual layout is
  ``partition_by="date"``, preprocess.py:169-175): ``write_delta``
  takes ``partition_by``; files are laid out hive-style
  (``col=value/part-*.parquet``), add actions carry real
  ``partitionValues`` (string-encoded per the spec, null →
  ``__HIVE_DEFAULT_PARTITION__`` on disk / JSON null in the action),
  and readers prune partitions FROM THE LOG — a
  ``partition_filter`` scan never opens (or even lists) a file in a
  non-matching partition;
* **checkpoints**: :func:`checkpoint_delta` writes a spec-shaped
  ``<version>.checkpoint.parquet`` (one row per live action, nested
  add/metaData/protocol columns) plus ``_last_checkpoint``; replay
  starts from the newest checkpoint at-or-below the target version
  and applies only the JSON tail, so a 9,504-commit hourly backfill
  (the reference's own window, gha.ipynb:19-29) replays O(live files
  + tail) instead of O(all commits). :func:`cleanup_log` may then
  drop JSON files at-or-below the checkpoint; time travel to a
  version whose JSON prefix was cleaned raises (never guesses), and
  log-gap detection still fires on the post-checkpoint tail.

Round 7 also adds the read-side and evolution pieces a user hits next:
min/max DATA SKIPPING off add-action stats (``stats_filter`` on
:func:`snapshot_files`/:func:`read_delta` — zone maps), and ADDITIVE
schema evolution (``write_delta(..., merge_schema=True)`` commits a
fresh metaData action with the widened schema; metadata resolution is
version-aware, so time travel below the evolution commit reads under
the old schema and pre-evolution files fill new columns with nulls —
real Delta's mergeSchema semantics).

Deliberately out of scope (documented, not silently faked): deletion
vectors, column mapping, checkpoint tombstones (``remove`` actions are
not carried into checkpoints — after :func:`cleanup_log`, files
removed before the checkpoint become log-unreferenced and are reaped
by :func:`vacuum_delta` after retention, which is also real Delta's
end state), and non-additive schema changes (drops/renames/type
changes — ``overwriteSchema`` territory — always raise).
Interop with delta-spark cannot be tested in
this env; the protocol shape follows the public spec so a real reader
should accept these tables, and the round-trip is pinned by tests +
driver-hashed registry queries (``lake_delta_log_scan``,
``lake_delta_partitioned``, ``lake_delta_checkpoint``).
"""

from __future__ import annotations

import datetime as _dt
import functools
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


_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _decode_hive_dir(segment: str) -> tuple[str, str | None]:
    """``col=value`` hive path segment → (col, decoded value).

    Spark percent-escapes special characters in partition dir names and
    spells null as ``__HIVE_DEFAULT_PARTITION__``; the add action's
    partitionValues stores the DECODED string (JSON null for null), per
    the Delta spec."""
    from urllib.parse import unquote

    col, _, raw = segment.partition("=")
    return unquote(col), (None if raw == _HIVE_NULL else unquote(raw))


def _stage_files(
    df: DataFrame,
    table: str,
    stats_cols: tuple[str, ...],
    partition_by: tuple[str, ...] = (),
) -> list[dict]:
    """Write df's parquet files under the table dir and return their add
    actions (path relative to the table root, size, partitionValues,
    stats). Partitioned stages keep Spark's hive layout
    (``col=value/.../part-*.parquet``) so the table directory looks
    exactly like real Delta's; partition columns are NOT duplicated
    inside the data files (Spark's partitionBy drops them — same as
    Delta), readers re-derive them from the log/paths."""
    import glob
    import shutil

    import pyarrow.parquet as pq

    stage = os.path.join(table, f".stage-{uuid.uuid4().hex}")
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(stage)
    adds = []
    try:
        pattern = os.path.join(stage, *(["*"] * len(partition_by)), "part-*.parquet")
        for f in sorted(glob.glob(pattern)):
            md = pq.ParquetFile(f).metadata  # one footer read per file
            if md.num_rows == 0:
                continue  # empty partitions produce 0-row files: nothing to commit
            rel_dirs = os.path.relpath(os.path.dirname(f), stage)
            segments = [] if rel_dirs == "." else rel_dirs.split(os.sep)
            pvals = dict(_decode_hive_dir(s) for s in segments)
            name = f"part-{uuid.uuid4().hex}.parquet"
            rel = os.path.join(*segments, name) if segments else name
            dest = os.path.join(table, rel)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            shutil.move(f, dest)
            stats = _file_stats(md, stats_cols)
            adds.append(
                {
                    "path": rel.replace(os.sep, "/"),
                    "partitionValues": pvals,
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


def last_txn_version(table: str, app_id: str) -> int | None:
    """Latest ``txn`` action version recorded for ``app_id`` — the
    protocol's idempotent-writer bookkeeping (a streaming sink asks
    "did I already commit this micro-batch?" here before writing).
    Returns None when no txn for the app is recorded in the retained
    JSON log; raises when the log prefix was checkpoint-cleaned and no
    retained txn exists — a vanished commit might have carried the
    app's txn, and guessing "never written" would double-apply a batch
    (txn persistence through parquet checkpoints is documented out of
    scope; keep the JSON tail longer than the app's replay horizon)."""
    versions = _list_versions(table)
    latest: int | None = None
    # newest-first, first hit wins: write_delta enforces per-app txn
    # monotonicity (at-or-below is skipped), so the newest commit
    # carrying the app's txn holds its max — a streaming sink's
    # per-batch check is O(commits since the app's last write), not
    # O(whole retained log)
    for v in reversed(versions):
        with open(_version_file(table, v)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                txn = action.get("txn")
                if txn and txn.get("appId") == app_id:
                    latest = txn["version"]
                    break
        if latest is not None:
            break
    if latest is None:
        cp = _last_checkpoint(table)
        if cp is not None and (not versions or min(versions) > 0):
            raise ValueError(
                f"txn visibility for app {app_id!r} on {table} is lost: "
                "the JSON log below the checkpoint was cleaned and no "
                "retained commit carries the app's txn — cannot decide "
                "idempotency safely"
            )
    return latest


def write_delta(
    df: DataFrame,
    table: str,
    mode: str = "append",
    stats_cols: tuple[str, ...] = (),
    partition_by: tuple[str, ...] = (),
    merge_schema: bool = False,
    retries: int = 0,
    txn: tuple[str, int] | None = None,
) -> int | None:
    """Commit df to the Delta table at ``table`` (append or overwrite);
    returns the committed version. Version 0 carries protocol+metaData
    like real Delta (including ``partitionColumns`` when
    ``partition_by`` is given — the reference's own layout is
    ``partition_by="date"``, preprocess.py:169-175); both modes are
    schema-enforced against that metaData by field names/types —
    mismatches raise, they never silently drop or null columns.
    ``merge_schema=True`` (Delta's ``mergeSchema``) permits exactly the
    ADDITIVE case: every recorded field present with its recorded
    shape plus new fields; the commit then carries a fresh metaData
    action with the widened schema (same table id), old files read
    back with nulls in the new columns, and time travel below the
    evolution commit still applies the old schema. Column drops,
    renames, and type changes still raise (that is ``overwriteSchema``
    territory — out of scope). Later writes must agree with the
    recorded partition columns (pass ``partition_by=()`` to inherit
    them — appends don't re-declare layout; a conflicting non-empty
    value raises; evolution cannot change the layout either).
    Overwrite commits remove every live file first. If
    the version race is lost, this attempt's staged data files are
    removed before FileExistsError propagates; once the version file is
    linked, the commit is irrevocable and later cleanup hiccups cannot
    unstage it.

    ``retries`` (append only) is the real protocol's optimistic
    concurrency: a BLIND append reads nothing, so it commutes with any
    concurrent append/OPTIMIZE — on a lost version race the already-
    staged files are re-validated against the NEW head (the winner may
    have evolved the schema or created the table with a different
    layout, which still raises) and re-committed at the next version.
    Overwrite never retries: its remove-set was computed against the
    old snapshot, and silently re-running it would drop the concurrent
    winner's rows — the loser must re-read and re-decide.

    ``txn=(app_id, txn_version)`` (append only) records the protocol's
    transaction-identifier action alongside the data, making the write
    IDEMPOTENT: if the table already carries a txn for ``app_id`` at
    or above ``txn_version``, the write is skipped and None returned —
    the exactly-once contract a streaming micro-batch sink needs on
    at-least-once redelivery. The check re-runs on every retry attempt,
    so losing a version race to a DUPLICATE of yourself (the crashed
    predecessor's commit) also resolves to a skip, not a double-write."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unsupported mode: {mode}")
    if txn is not None and mode != "append":
        raise ValueError("txn idempotency is defined for append commits only")
    os.makedirs(table, exist_ok=True)
    adds: list[dict] | None = None
    staged_layout: tuple[str, ...] | None = None
    staged_mapping: tuple[str | None, str] | None = None  # (physical-name
    # map, generated-columns key) in effect when the files were staged
    attempts = 1 + max(0, retries if mode == "append" else 0)
    for attempt in range(attempts):
        if txn is not None and os.path.isdir(_log_path(table)):
            app_id, txn_version = txn
            try:
                seen = last_txn_version(table, app_id)
            except ValueError:
                if adds is not None:  # no-orphan invariant holds on the
                    _remove_staged(table, adds)  # visibility-lost path too
                raise
            if seen is not None and seen >= txn_version:
                if adds is not None:  # staged in a lost-race prior attempt
                    _remove_staged(table, adds)
                return None
        version = _next_version(table)  # refuses gapped logs
        actions: list[dict] = []
        mapped_meta: dict | None = None
        df_eff = df  # generated columns may extend this per attempt
        gen_key = ""
        if version == 0:
            actions.append(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
            )
            actions.append(
                {
                    "metaData": {
                        "id": uuid.uuid4().hex,
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": df.schema.json(),
                        "partitionColumns": list(partition_by),
                        "configuration": {},
                        "createdTime": 0,
                    }
                }
            )
            layout = tuple(partition_by)
        else:
            # ONE metadata walk per commit (schema + layout both come off
            # it) — with checkpointing every N commits the walk is O(tail),
            # and not repeating it keeps an N-commit append loop O(N·tail)
            try:
                meta = _table_metadata(table)
            except Exception:
                if adds is not None:
                    _remove_staged(table, adds)
                raise
            if mode == "overwrite":
                try:
                    _refuse_append_only(meta, "write_delta(mode='overwrite')")
                except Exception:
                    if adds is not None:
                        _remove_staged(table, adds)
                    raise
            try:  # generated columns: compute absent, verify present
                df_eff = _apply_generated_columns(df, meta)
            except Exception:
                if adds is not None:
                    _remove_staged(table, adds)
                raise
            gen_key = json.dumps(_generated_columns(meta), sort_keys=True)
            recorded = None if meta is None else meta["schemaString"]
            if recorded is not None and _schema_shape(
                json.loads(recorded)
            ) != _schema_shape(json.loads(df_eff.schema.json())):
                if merge_schema and _mapping_on(meta):
                    if adds is not None:
                        _remove_staged(table, adds)
                    raise ValueError(
                        "schema evolution on a column-mapped table is not "
                        "supported (new fields need column-id assignment)"
                    )
                if merge_schema and _is_additive_evolution(
                    json.loads(recorded), json.loads(df_eff.schema.json())
                ):
                    actions.append(
                        {"metaData": {**meta, "schemaString": df_eff.schema.json()}}
                    )
                else:
                    if adds is not None:
                        _remove_staged(table, adds)
                    raise ValueError(
                        f"schema mismatch writing to {table} (mode={mode}): the "
                        "table's metaData schema differs from the DataFrame's in "
                        "field names or types. Append and overwrite both enforce "
                        "the recorded schema; pass merge_schema=True for the "
                        "additive case (every recorded field kept with its "
                        "recorded shape, new fields added) — drops, renames, "
                        "and type changes always raise"
                    )
            try:  # CHECK constraints (re-read per attempt: the winner of
                # a lost race may have added one)
                _check_constraints(df_eff, meta)
            except ValueError:
                if adds is not None:
                    _remove_staged(table, adds)
                raise
            mapped_meta = meta if _mapping_on(meta) else None
            recorded_parts = (
                () if meta is None else tuple(meta.get("partitionColumns", []))
            )
            if partition_by and tuple(partition_by) != recorded_parts:
                if adds is not None:
                    _remove_staged(table, adds)
                raise ValueError(
                    f"partition mismatch writing to {table}: table is "
                    f"partitioned by {recorded_parts}, write declared "
                    f"{tuple(partition_by)}. Layout is fixed at version 0; "
                    "pass partition_by=() to inherit it"
                )
            layout = recorded_parts
            if mode == "overwrite":
                for f in snapshot_files(table):
                    actions.append(
                        {
                            "remove": {
                                "path": f,
                                "deletionTimestamp": 0,
                                "dataChange": True,
                            }
                        }
                    )
        mapping_key = (
            None if mapped_meta is None else mapped_meta["schemaString"],
            gen_key,
        )
        if adds is not None and (
            staged_layout != layout or staged_mapping != mapping_key
        ):
            # lost a CREATE race to a winner with a different layout or
            # column mapping: the staged files' hive paths /
            # partitionValues / physical column names are wrong
            _remove_staged(table, adds)
            adds = None
        if adds is None:  # stage ONCE; retries recommit the same files
            stage_df, stage_stats = df_eff, stats_cols
            if mapped_meta is not None:
                # column mapping: data files store PHYSICAL names; the
                # caller's frame (and stats_cols) speak logical
                from pyspark.sql import functions as F
                from pyspark.sql.types import StructType as _ST

                fields = _ST.fromJson(
                    json.loads(mapped_meta["schemaString"])
                ).fields
                phys_of = {f.name: _physical_name(f) for f in fields}
                stage_df = df_eff.select(
                    *[F.col(n).alias(phys_of[n]) for n in df_eff.columns]
                )
                stage_stats = tuple(phys_of.get(c, c) for c in stats_cols)
            adds = _stage_files(
                stage_df, table, stage_stats, partition_by=layout
            )
            staged_layout = layout
            staged_mapping = mapping_key
        actions.extend({"add": a} for a in adds)
        if txn is not None:
            actions.append({"txn": {"appId": txn[0], "version": txn[1]}})
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
        except FileExistsError:
            if attempt + 1 < attempts:
                continue  # lost the version race: re-validate, re-commit
            _remove_staged(table, adds)
            raise
        except Exception:
            _remove_staged(table, adds)  # failed publish: no orphans
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
    """The retained JSON chain must be contiguous, and must start at 0
    unless a checkpoint covers the cleaned prefix (start ≤ cp+1)."""
    if not versions:
        return
    cp = _last_checkpoint(table)
    cpv = None if cp is None else cp["version"]
    if versions != list(range(versions[0], versions[-1] + 1)) or not (
        versions[0] == 0 or (cpv is not None and versions[0] <= cpv + 1)
    ):
        raise ValueError(
            f"non-contiguous Delta log in {table}: versions {versions}"
            + (f" with last checkpoint {cpv}" if cpv is not None else "")
            + " (a missing version file means lost commits)"
        )


def _table_metadata(table: str, version: int | None = None) -> dict | None:
    """The table's metaData action AS OF ``version`` (None = latest):
    the NEWEST metaData action at-or-below the version wins — schema
    evolution commits a fresh metaData action, and time travel must
    read each snapshot under the schema it was written with (real
    Delta replay semantics). For a target at-or-above the checkpoint,
    only the JSON TAIL after the checkpoint is scanned (newest-first)
    before falling back to the checkpoint's carried metaData — the
    scan is O(tail), and checkpointing every N commits bounds it the
    same way it bounds replay. Time travel below the checkpoint walks
    the retained JSON chain down from the target. A missing or corrupt
    version file inside the needed range RAISES (a swallowed parse
    error here would silently resolve an evolved table to its older
    schema — the guess this module never makes)."""
    versions = _list_versions(table)
    cp = _last_checkpoint(table)
    cpv = None if cp is None else cp["version"]
    if version is None:
        version = max(versions[-1] if versions else -1, cpv if cpv is not None else -1)
    lo = cpv if (cpv is not None and version >= cpv) else -1
    for v in (v for v in reversed(versions) if lo < v <= version):
        with open(_version_file(table, v)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "metaData" in action:
                    return action["metaData"]
    if cpv is not None and cpv <= version:
        meta, _, _ = _read_checkpoint(table, cp)
        return meta
    return None


def _table_protocol(table: str, version: int | None = None) -> dict:
    """The table's protocol action AS OF ``version`` — newest at-or-
    below wins (feature commits like CHECK constraints and column
    mapping upgrade it); falls back to the checkpoint's carried
    protocol, then to the module's base (1, 2)."""
    versions = _list_versions(table)
    cp = _last_checkpoint(table)
    cpv = None if cp is None else cp["version"]
    if version is None:
        version = max(versions[-1] if versions else -1, cpv if cpv is not None else -1)
    lo = cpv if (cpv is not None and version >= cpv) else -1
    for v in (v for v in reversed(versions) if lo < v <= version):
        with open(_version_file(table, v)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "protocol" in action:
                    return dict(action["protocol"])
    if cpv is not None and cpv <= version:
        _, proto, _ = _read_checkpoint(table, cp)
        if proto is not None:
            return dict(proto)
    return {"minReaderVersion": 1, "minWriterVersion": 2}


def partition_columns(table: str) -> list[str]:
    """The partition layout recorded at table creation (metaData's
    partitionColumns — [] for unpartitioned tables; schema evolution
    never changes it — the writer enforces that)."""
    meta = _table_metadata(table)
    if meta is None:
        raise ValueError(f"no metaData action found for {table}")
    return list(meta.get("partitionColumns", []))


def _apply_version_file(table: str, v: int, live: dict[str, dict]) -> None:
    with open(_version_file(table, v)) as fh:
        for line in fh:
            if not line.strip():
                continue
            action = json.loads(line)
            if "add" in action:
                live[action["add"]["path"]] = action["add"]
            elif "remove" in action:
                live.pop(action["remove"]["path"], None)


def _latest_version(table: str) -> int:
    versions = _list_versions(table)
    cp = _last_checkpoint(table)
    latest = versions[-1] if versions else -1
    if cp is not None:
        latest = max(latest, cp["version"])
    if latest < 0:
        raise FileNotFoundError(f"not a Delta table (no {_LOG_DIR}): {table}")
    return latest


def _next_version(table: str) -> int:
    """The version a new commit must claim: latest + 1 over the
    retained JSON and the checkpoint pointer, after refusing gapped
    logs. THE one place the fold lives — write_delta/optimize/zorder
    all route through it, so the claim-at-this-version O_EXCL link is
    what turns any concurrent commit into an explicit conflict."""
    versions = _list_versions(table)
    _check_contiguous(table, versions)
    cp = _last_checkpoint(table)
    latest = versions[-1] if versions else -1
    if cp is not None:
        latest = max(latest, cp["version"])
    return latest + 1


def _replay(table: str, version: int | None = None) -> dict[str, dict]:
    """Replay the log up to ``version`` (inclusive; None = latest) →
    {relative path: add action} of live files.

    Starts from the newest checkpoint at-or-below ``version`` whenever
    one exists and applies only the JSON tail (O(live files + tail
    actions) — the point of checkpoints on hourly-append logs, and it
    must kick in while the JSON prefix is still retained, not only
    after cleanup: real Delta replays from the checkpoint
    unconditionally). Time travel below the checkpoint falls back to
    the pure-JSON ``0..version`` chain. A gap in whichever chain is
    needed means commits were lost: raise, never return a silently
    wrong snapshot; likewise time travel to a version whose JSON
    prefix was cleaned past the checkpoint."""
    latest = _latest_version(table)
    if version is None:
        version = latest
    if version < 0 or version > latest:
        raise ValueError(f"version {version} not in table history 0..{latest}")
    have = set(_list_versions(table))
    cp = _last_checkpoint(table)
    cpv = None if cp is None else cp["version"]
    if cpv is not None and version >= cpv:
        _, _, adds = _read_checkpoint(table, cp)
        live = {a["path"]: a for a in adds}
        start = cpv + 1
        missing = [v for v in range(start, version + 1) if v not in have]
        if missing:
            raise ValueError(
                f"non-contiguous Delta log in {table}: versions {missing} "
                f"missing after checkpoint {cpv} (lost commits)"
            )
    elif all(v in have for v in range(version + 1)):
        live = {}
        start = 0
    elif cpv is None:
        missing = sorted(set(range(version + 1)) - have)
        raise ValueError(
            f"non-contiguous Delta log in {table}: versions {missing} "
            "missing (a missing version file means lost commits)"
        )
    else:
        raise ValueError(
            f"cannot replay version {version} of {table}: its JSON prefix "
            f"was cleaned up past checkpoint {cpv} (time travel below the "
            "checkpoint requires the retained JSON chain)"
        )
    for v in range(start, version + 1):
        _apply_version_file(table, v, live)
    return live


def _match_partition(add: dict, partition_filter: dict | None) -> bool:
    if not partition_filter:
        return True
    pvals = add.get("partitionValues", {})
    return all(
        pvals.get(k) == (None if v is None else str(v))
        for k, v in partition_filter.items()
    )


_STATS_OPS = ("=", "==", "<", "<=", ">", ">=")


def _stats_excludes(add: dict, stats_filter) -> bool:
    """True iff the add action's recorded min/max stats PROVE the file
    can contain no row satisfying the conjunction of ``stats_filter``
    predicates — the zone-map skipping rule. Missing or non-comparable
    stats keep the file (pruning must only ever be provably sound;
    null column values never satisfy <,<=,>,>=,= so min/max — which
    ignore nulls — stay a sound bound)."""
    if not stats_filter:
        return False
    try:
        stats = json.loads(add["stats"]) if "stats" in add else None
    except (TypeError, json.JSONDecodeError):
        stats = None
    if not stats:
        return False
    mins, maxs = stats.get("minValues", {}), stats.get("maxValues", {})
    for col, op, value in stats_filter:
        if col not in mins or col not in maxs:
            continue  # no stats for this column: cannot skip on it
        lo, hi = mins[col], maxs[col]
        same_kind = (
            isinstance(lo, str) and isinstance(value, str)
        ) or (
            isinstance(lo, (int, float)) and not isinstance(lo, bool)
            and isinstance(value, (int, float)) and not isinstance(value, bool)
        )
        if not same_kind:
            continue  # never guess across types; keep the file
        if (
            (op in (">", ">=") and (hi < value or (op == ">" and hi == value)))
            or (op in ("<", "<=") and (lo > value or (op == "<" and lo == value)))
            or (op in ("=", "==") and (value < lo or value > hi))
        ):
            return True  # this predicate alone is unsatisfiable here
    return False


def _check_stats_filter(stats_filter) -> None:
    for pred in stats_filter or ():
        if len(pred) != 3 or pred[1] not in _STATS_OPS:
            raise ValueError(
                f"stats_filter predicates are (col, op, value) with op in "
                f"{_STATS_OPS}; got {pred!r}"
            )
        if pred[2] is None:
            raise ValueError(
                "stats_filter cannot express NULL predicates: min/max "
                "stats ignore nulls, so no file is provably free of them"
            )


def snapshot_files(
    table: str,
    version: int | None = None,
    partition_filter: dict | None = None,
    stats_filter=None,
) -> list[str]:
    """Live data-file paths (relative) at a version — the scan
    manifest. ``partition_filter`` ({col: value}) prunes from the LOG's
    partitionValues: non-matching files are never listed, let alone
    opened (values compare as their string encoding; None matches null
    partitions). Filter keys are validated against the table's
    recorded partitionColumns — a typo'd or non-partition key would
    otherwise match nothing (``pvals.get(k)`` is None for every file)
    and silently return an empty scan, the exact class of silently
    wrong answer this module refuses everywhere else.

    ``stats_filter`` (iterable of ``(col, op, value)``, op ∈
    ``=,==,<,<=,>,>=``, conjunction semantics) additionally DATA-SKIPS
    on the add actions' recorded min/max column stats: a file whose
    stats prove no row can match is never listed (Delta data skipping
    / zone maps — at 100 TB this is what turns a point/range query on
    a sorted-write column from a full scan into a handful of files).
    Skipping is an optimization with an exactness contract: only
    provably-non-matching files are dropped, and the CALLER still owns
    applying the actual predicate to the surviving rows — files
    without stats on a column always survive."""
    if partition_filter:
        pcols = set(partition_columns(table))
        bad = sorted(set(partition_filter) - pcols)
        if bad:
            raise ValueError(
                f"partition_filter keys {bad} are not partition columns of "
                f"{table} (partitioned by {sorted(pcols)})"
            )
    stats_filter = _translate_stats_filter(
        _table_metadata(table, version), stats_filter
    )
    _check_stats_filter(stats_filter)
    return sorted(
        p
        for p, add in _replay(table, version).items()
        if _match_partition(add, partition_filter)
        and not _stats_excludes(add, stats_filter)
    )


def _is_additive_evolution(recorded: dict, proposed: dict) -> bool:
    """True iff ``proposed`` keeps every recorded top-level field with
    an identical shape (name + type, nullability ignored) and only
    ADDS fields — the mergeSchema-eligible case."""
    rec = {f["name"]: _schema_shape(f) for f in recorded.get("fields", [])}
    prop = {f["name"]: _schema_shape(f) for f in proposed.get("fields", [])}
    return all(name in prop and prop[name] == shape for name, shape in rec.items())


def read_delta(
    spark: SparkSession,
    table: str,
    version: int | None = None,
    partition_filter: dict | None = None,
    stats_filter=None,
) -> DataFrame:
    """Snapshot scan (time travel with ``version``). Reads exactly the
    live files the log names — never a directory listing, so stray or
    uncommitted files are invisible — under the LOG's recorded schema
    (not whichever footer Spark happens to resolve first), like real
    Delta.

    Partitioned tables: ``partition_filter`` ({col: value}) prunes the
    file list from the log's partitionValues BEFORE Spark sees it — a
    corrupt or missing file in a non-matching partition can never fail
    the scan. Partition columns are not stored in the data files (same
    as real Delta); the scan re-derives them from the hive paths under
    ``basePath`` and casts them per the log's schema, so the returned
    frame always has the full recorded schema in recorded order.

    ``stats_filter`` data-skips whole files on the log's min/max stats
    (see :func:`snapshot_files`); the caller must still ``.where()``
    the actual predicate — surviving files may contain non-matching
    rows.

    Schema is resolved AS OF the requested version: a snapshot below a
    merge_schema evolution commit reads under the old schema, at-or-
    above it under the widened one (pre-evolution files fill the new
    columns with nulls — the parquet reader's missing-column rule).

    Files carrying a deletion vector (merge-on-read deletes,
    :func:`delete_delta_dv`) are read THROUGH it: their rows anti-join
    the DV's (file, row_index) set before entering the result — the
    protocol's read-side DV contract. DV-free files never pay the
    metadata-column or join cost."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    # one metadata walk serves both schema and layout (the layout is
    # fixed at v0 and evolution metaData carries it forward unchanged)
    meta = _table_metadata(table, version)
    if meta is None:
        raise ValueError(f"no metaData action in version 0 of {table}")
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    pcols = meta.get("partitionColumns", [])
    live = _replay(table, version)
    if partition_filter:
        bad = sorted(set(partition_filter) - set(pcols))
        if bad:
            raise ValueError(
                f"partition_filter keys {bad} are not partition columns of "
                f"{table} (partitioned by {sorted(pcols)})"
            )
    mapped = _mapping_on(meta)
    stats_filter = _translate_stats_filter(meta, stats_filter)
    _check_stats_filter(stats_filter)
    entries = sorted(
        (p, a)
        for p, a in live.items()
        if _match_partition(a, partition_filter)
        and not _stats_excludes(a, stats_filter)
    )
    return _scan_subset(spark, table, meta, schema, entries)


def _scan_subset(spark, table: str, meta: dict, schema, entries) -> DataFrame:
    """Scan an explicit subset of a snapshot's (path, add) entries under
    the snapshot's recorded schema — the shared engine of
    :func:`read_delta` (full manifest) and :func:`snapshot_diff`
    (symmetric-difference manifest). DV'd files are read through their
    vectors; column-mapped tables alias physical file names back to the
    snapshot's logical names."""
    from pyspark.sql import functions as F

    pcols = meta.get("partitionColumns", [])
    mapped = _mapping_on(meta)
    read_schema = _physical_schema(schema) if mapped else schema
    cols = [f.name for f in read_schema.fields]
    plain = [os.path.join(table, p) for p, a in entries if "deletionVector" not in a]
    dvd = [(p, a["deletionVector"]) for p, a in entries if "deletionVector" in a]
    reader = spark.read.schema(read_schema)
    if pcols:
        reader = reader.option("basePath", table)
    parts = []
    if plain:
        parts.append(reader.parquet(*plain).select(*cols))
    if dvd:
        _check_dv_reserved(cols)
        dv_rows = spark.read.parquet(
            *[os.path.join(table, dv["path"]) for _, dv in dvd]
        ).select("__delta_dv_file", "__delta_dv_pos")
        scan = (
            reader.parquet(*[os.path.join(table, p) for p, _ in dvd])
            .select(
                *cols,
                F.col("_metadata.file_name").alias("__delta_dv_file"),
                F.col("_metadata.row_index").alias("__delta_dv_pos"),
            )
            .join(dv_rows, ["__delta_dv_file", "__delta_dv_pos"], "left_anti")
            .select(*cols)
        )
        parts.append(scan)
    if not parts:
        return spark.createDataFrame([], schema)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if mapped:  # physical file names → the snapshot's logical names
        out = out.select(
            *[
                F.col(_physical_name(f)).alias(f.name)
                for f in schema.fields
            ]
        )
    return out


def snapshot_diff(
    spark: SparkSession,
    table: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Row-level diff between two snapshots in O(changed files) — the
    version-pair CDC that works where :func:`delta_changes` refuses
    (overwrite, RESTORE, MERGE, DV-delete commits in the range).

    Files carried over unchanged — same path AND same deletionVector
    reference — are provably identical (data files are immutable; a DV
    swap is the only way a carried file's visible rows change) and are
    never opened; only the symmetric difference of the two manifests is
    scanned. The row diff is then a multiset EXCEPT in each direction,
    so rows an OPTIMIZE merely moved between files cancel and a
    dataChange:false-only range reports zero changes — at the cost of
    reading the rewritten bins, which delta_changes avoids by trusting
    the flag. Trade-offs: delta_changes is O(appended data) but
    append-only; this is O(changed files) and total.

    Returns the table schema plus ``_change_type`` ('insert' rows are
    in ``to`` but not ``from``; 'delete' the reverse). Snapshots whose
    recorded schemas differ (evolution or column rename in the range)
    raise — a diff across shapes has no well-defined row equality.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    if to_version is None:
        to_version = _latest_version(table)
    m_from = _table_metadata(table, from_version)
    m_to = _table_metadata(table, to_version)
    if m_from is None or m_to is None:
        raise ValueError(f"no metaData action in version 0 of {table}")
    if m_from["schemaString"] != m_to["schemaString"]:
        raise ValueError(
            f"snapshot_diff across a schema change (v{from_version} -> "
            f"v{to_version} of {table}): row equality is undefined across "
            "shapes; diff each side of the evolution commit separately"
        )
    schema = StructType.fromJson(json.loads(m_to["schemaString"]))

    def _key(p: str, a: dict) -> tuple[str, str]:
        return (p, json.dumps(a.get("deletionVector"), sort_keys=True))

    live_f = _replay(table, from_version)
    live_t = _replay(table, to_version)
    keys_f = {_key(p, a) for p, a in live_f.items()}
    keys_t = {_key(p, a) for p, a in live_t.items()}
    only_f = sorted(
        ((p, a) for p, a in live_f.items() if _key(p, a) not in keys_t),
        key=lambda e: e[0],
    )
    only_t = sorted(
        ((p, a) for p, a in live_t.items() if _key(p, a) not in keys_f),
        key=lambda e: e[0],
    )
    old = _scan_subset(spark, table, m_from, schema, only_f)
    new = _scan_subset(spark, table, m_to, schema, only_t)
    return (
        new.exceptAll(old)
        .withColumn("_change_type", F.lit("insert"))
        .unionByName(old.exceptAll(new).withColumn("_change_type", F.lit("delete")))
    )


def delete_delta_dv(spark: SparkSession, table: str, predicate: str) -> dict:
    """Merge-on-read DELETE via deletion vectors — the protocol piece
    that makes deletes O(matching rows) instead of O(rewritten files):
    rows matching ``predicate`` (a SQL expression over the table's
    columns, partition columns included) are recorded as per-file
    (file, row_index) sidecars, and each touched file's add action is
    re-committed carrying a ``deletionVector`` reference. DATA FILES
    ARE NOT TOUCHED — time travel below the delete still sees every
    row from the same bytes, and a petabyte table deletes a single
    user's rows without rewriting anything (the GDPR-erasure shape).
    Re-deleting a file unions the new rows into a fresh sidecar (the
    old one becomes vacuum-able garbage). Returns
    ``{"version": v | None, "deleted_rows": n, "files": k}`` —
    version ``None`` when nothing matched (no empty commit).

    Consequences handled module-wide: reads anti-join the DV
    (``read_delta``), stats become LOOSE bounds (``high_water_mark``
    refuses stats-only answers for DV'd files — a deleted max must
    not be reported), OPTIMIZE skips DV'd files and ZORDER refuses
    them (:func:`materialize_deletes` is the purge that rewrites them
    clean), and the append-only change feed raises on the delete
    commit (it removes data, which the feed cannot represent).

    Scale shape: the matching scan is one pushdown-filtered pass;
    sidecar writes are distributed (one file per touched data file via
    a partitioned stage); the only driver-side state is the touched-
    file list and per-file cardinalities — O(|touched files|)
    metadata. The commit claims its version at plan time, so a
    concurrent commit conflicts explicitly."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    meta = _table_metadata(table)
    if meta is None:
        raise ValueError(f"no metaData action in version 0 of {table}")
    _refuse_mapping(meta, "delete_delta_dv")
    _refuse_append_only(meta, "delete_delta_dv")
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    pcols = meta.get("partitionColumns", [])
    version = _next_version(table)  # claim at plan time (TOCTOU rule)
    live = _replay(table)
    if not live:
        return {"version": None, "deleted_rows": 0, "files": 0}
    by_name = {os.path.basename(p): p for p in live}
    hits = (
        # scan reads THROUGH existing DVs: a row that is already
        # logically deleted must not match (and not re-count)
        _scan_with_rowmeta(spark, table, schema, pcols, live)
        .where(F.expr(predicate))
        .select("__delta_dv_file", "__delta_dv_pos")
        # materialize the matched set ONCE (it is deleted-rows-sized);
        # the three consumers below (touched files, per-file counts,
        # new-row count) must not each re-run the filtered table scan
        .localCheckpoint()
    )
    touched = sorted(r["__delta_dv_file"] for r in hits.select("__delta_dv_file").distinct().collect())
    if not touched:
        return {"version": None, "deleted_rows": 0, "files": 0}
    actions, new_adds = _stage_dv_actions(spark, table, hits, live, by_name, touched)
    actions.append(
        {
            "commitInfo": {
                "operation": "DELETE",
                "operationParameters": {"predicate": predicate, "mode": "DV"},
                "timestamp": 0,
            }
        }
    )
    try:
        _commit(table, version, actions)
    except Exception:
        _remove_staged(table, new_adds)
        raise
    new_deleted = int(hits.count())
    return {
        "version": version,
        "deleted_rows": new_deleted,
        "files": len(touched),
    }


def _stage_dv_actions(
    spark: SparkSession,
    table: str,
    hits,
    live: dict[str, dict],
    by_name: dict[str, str],
    touched: list[str],
) -> tuple[list[dict], list[dict]]:
    """Stage one fresh deletion-vector sidecar per touched data file and
    return ``(actions, new_sidecar_adds)``: per file a dataChange remove
    of its current add entry plus the same entry re-added carrying the
    new DV reference. ``hits`` is a (dv_file, row_index) DataFrame of
    NEWLY deleted rows; pre-existing DVs of the touched files are
    unioned in — the new sidecar is the FULL deleted set for its file
    (one DV per file, per protocol). Sidecar writes are distributed
    (one hash partition per touched file); callers own the commitInfo
    and the ``_commit`` (and must ``_remove_staged(new_sidecar_adds)``
    on a failed publish)."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    old_sidecars = [
        os.path.join(table, live[by_name[t]]["deletionVector"]["path"])
        for t in touched
        if "deletionVector" in live[by_name[t]]
    ]
    dv = hits
    if old_sidecars:
        dv = dv.unionByName(
            spark.read.parquet(*old_sidecars).select("__delta_dv_file", "__delta_dv_pos")
        )
    dv = dv.distinct()
    stage = os.path.join(table, f".stage-{uuid.uuid4().hex}")
    new_adds: list[dict] = []
    try:
        (
            dv.withColumn("__delta_dv_pf", F.col("__delta_dv_file"))
            .repartition(len(touched), "__delta_dv_pf")
            .sortWithinPartitions("__delta_dv_pf", "__delta_dv_pos")
            .write.partitionBy("__delta_dv_pf")
            .mode("overwrite")
            .parquet(stage)
        )
        counts = {
            r["__delta_dv_file"]: r["n"]
            for r in dv.groupBy("__delta_dv_file")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        actions: list[dict] = []
        for t in touched:
            parts = sorted(glob.glob(os.path.join(stage, f"__delta_dv_pf={t}", "part-*.parquet")))
            if len(parts) != 1:  # pragma: no cover - hash-group contract
                raise RuntimeError(f"DV stage for {t} wrote {len(parts)} files")
            rel = f"deletion-vector-{uuid.uuid4().hex}.parquet"
            shutil.move(parts[0], os.path.join(table, rel))
            new_adds.append({"path": rel})
            old_add = live[by_name[t]]
            actions.append(
                {
                    "remove": {
                        "path": by_name[t],
                        "deletionTimestamp": 0,
                        "dataChange": True,
                    }
                }
            )
            actions.append(
                {
                    "add": {
                        **old_add,
                        "dataChange": True,
                        "deletionVector": {
                            "path": rel,
                            "cardinality": int(counts[t]),
                        },
                    }
                }
            )
    except Exception:
        _remove_staged(table, new_adds)
        raise
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return actions, new_adds


#: internal column names used by the DV machinery (sidecar schema and
#: row-metadata scans) — reserved like real Delta's __delta-prefixed
#: names; a user column with one of these would make every DV join
#: ambiguous, so the scan helpers refuse loudly instead
_DV_RESERVED = ("__delta_dv_file", "__delta_dv_pos", "__delta_dv_pf")


def _check_dv_reserved(cols) -> None:
    clash = sorted(set(cols) & set(_DV_RESERVED))
    if clash:
        raise ValueError(
            f"table columns {clash} collide with the deletion-vector "
            f"machinery's reserved names {_DV_RESERVED}"
        )


def _scan_with_rowmeta(spark, table: str, schema, pcols, live: dict[str, dict]):
    """All LOGICALLY live rows of a snapshot with (dv_file, row_index)
    metadata columns appended: files carrying a deletion vector are
    read THROUGH it (their deleted rows anti-joined away before the
    caller sees them), so predicate matches and merge-key matches can
    never bind to a row that is already logically gone. DV-free files
    skip the join entirely."""
    from pyspark.sql import functions as F

    cols = [f.name for f in schema.fields]
    _check_dv_reserved(cols)
    meta_cols = [
        F.col("_metadata.file_name").alias("__delta_dv_file"),
        F.col("_metadata.row_index").alias("__delta_dv_pos"),
    ]
    reader = spark.read.schema(schema)
    if pcols:
        reader = reader.option("basePath", table)
    entries = sorted(live.items())
    plain = [os.path.join(table, p) for p, a in entries if "deletionVector" not in a]
    dvd = [(p, a["deletionVector"]) for p, a in entries if "deletionVector" in a]
    parts = []
    if plain:
        parts.append(reader.parquet(*plain).select(*cols, *meta_cols))
    if dvd:
        dv_rows = spark.read.parquet(
            *[os.path.join(table, dv["path"]) for _, dv in dvd]
        ).select("__delta_dv_file", "__delta_dv_pos")
        parts.append(
            reader.parquet(*[os.path.join(table, p) for p, _ in dvd])
            .select(*cols, *meta_cols)
            .join(dv_rows, ["__delta_dv_file", "__delta_dv_pos"], "left_anti")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def merge_delta_dv(
    spark: SparkSession,
    table: str,
    source: DataFrame,
    on: tuple[str, ...] | list[str],
    stats_cols: tuple[str, ...] = (),
) -> dict:
    """MERGE INTO with merge-on-read semantics (Delta's low-shuffle
    DV merge): target rows whose ``on`` key appears in ``source`` are
    DV-deleted in place — no data file is rewritten — and their
    replacements (the full source row) land together with the
    unmatched source rows as ordinary appended files, all in ONE
    commit. This is the upsert every CDC/ingest pipeline runs hourly;
    at 100 TB the cost is O(source + matching rows), never O(table).

    Semantics pinned to the real protocol: the source must be
    key-unique (several source rows binding one target row is Delta's
    ``DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW`` error — raised
    here too); duplicate-key TARGET rows are all updated (each matched
    target row is replaced, so target multiplicity is preserved);
    rows already DV-deleted never match (the key scan reads through
    existing vectors); matched rows are replaced unconditionally (no
    change detection). Source schema must equal the table schema —
    MERGE does not evolve. Returns ``{"version", "updated",
    "inserted", "files_touched"}`` (version ``None`` on an empty
    source: no empty commit).

    Scale shape: ONE target scan with row metadata joined once against
    the source (AQE picks broadcast vs shuffle by actual source size);
    the join result is materialized once (source-sized, not
    table-sized) and feeds the DV sidecars, the appended file stage,
    and both counters. Version claimed at plan time (TOCTOU rule):
    a concurrent commit conflicts explicitly rather than silently
    merging against a stale snapshot."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    meta = _table_metadata(table)
    if meta is None:
        raise ValueError(f"no metaData action in version 0 of {table}")
    _refuse_mapping(meta, "merge_delta_dv")
    _refuse_append_only(meta, "merge_delta_dv")
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    pcols = meta.get("partitionColumns", [])
    on = list(on)
    if not on:
        raise ValueError("merge_delta_dv needs at least one join key")
    missing = [k for k in on if k not in {f.name for f in schema.fields}]
    if missing:
        raise ValueError(f"merge keys {missing} are not columns of {table}")
    cols = [f.name for f in schema.fields]
    if sorted(source.columns) != sorted(cols):
        raise ValueError(
            f"merge source columns {sorted(source.columns)} differ from "
            f"{table}'s recorded columns {sorted(cols)} — MERGE does not "
            "evolve schemas"
        )
    source = source.select(*cols)  # align order; shape check is order-free
    if _schema_shape(json.loads(meta["schemaString"])) != _schema_shape(
        json.loads(source.schema.json())
    ):
        raise ValueError(
            f"merge source schema differs from {table}'s recorded schema "
            "in field types — MERGE does not evolve schemas"
        )
    version = _next_version(table)  # claim at plan time (TOCTOU rule)
    source = source.localCheckpoint()  # one pass, reused 4×
    _check_constraints(source, meta)  # MERGE's appended rows obey CHECKs
    # (merge sources carry the full schema, so this only VERIFIES)
    _apply_generated_columns(source, meta)
    # uniqueness only matters for keys that CAN bind a target row:
    # null-keyed source rows never match (the join below never binds
    # them — they are plain inserts), so Delta's multiple-source-row
    # error does not apply to them
    non_null = source
    for k in on:
        non_null = non_null.where(F.col(k).isNotNull())
    if (
        non_null.groupBy(*on)
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
        .limit(1)
        .count()
    ):
        raise ValueError(
            "merge source is not key-unique on "
            f"{on}: several source rows would bind the same target row "
            "(Delta's multiple-source-row-matching error)"
        )
    live = _replay(table)
    by_name = {os.path.basename(p): p for p in live}
    if live:
        target_keys = _scan_with_rowmeta(spark, table, schema, pcols, live).select(
            *on, "__delta_dv_file", "__delta_dv_pos"
        )
        merged = source.join(target_keys, on, "left").localCheckpoint()
    else:
        merged = source.select(
            "*",
            F.lit(None).cast("string").alias("__delta_dv_file"),
            F.lit(None).cast("long").alias("__delta_dv_pos"),
        ).localCheckpoint()
    hits = merged.where(F.col("__delta_dv_file").isNotNull()).select("__delta_dv_file", "__delta_dv_pos")
    updated = int(hits.count())
    inserted = int(merged.count()) - updated
    if updated + inserted == 0:
        return {"version": None, "updated": 0, "inserted": 0, "files_touched": 0}
    touched = sorted(
        r["__delta_dv_file"] for r in hits.select("__delta_dv_file").distinct().collect()
    )
    actions: list[dict] = []
    new_sidecars: list[dict] = []
    if touched:
        actions, new_sidecars = _stage_dv_actions(
            spark, table, hits, live, by_name, touched
        )
    new_adds = _stage_files(
        merged.select(*cols), table, stats_cols, partition_by=tuple(pcols)
    )
    actions.extend({"add": a} for a in new_adds)
    actions.append(
        {
            "commitInfo": {
                "operation": "MERGE",
                "operationParameters": {"predicate": " AND ".join(on), "mode": "DV"},
                "timestamp": 0,
            }
        }
    )
    try:
        _commit(table, version, actions)
    except Exception:
        _remove_staged(table, new_sidecars)
        _remove_staged(table, new_adds)
        raise
    return {
        "version": version,
        "updated": updated,
        "inserted": inserted,
        "files_touched": len(touched),
    }


def restore_delta(
    table: str, version: int, spark: SparkSession | None = None
) -> dict:
    """RESTORE TABLE ... TO VERSION AS OF — revert the live snapshot
    (data AND schema) to an earlier version as a NEW commit, keeping
    the full history: the protocol's answer to a bad write, priced at
    O(|files changed since|) metadata — no data is copied, the commit
    re-adds the old versions' still-on-disk files and removes the
    newer ones. Files vacuumed since (data or DV sidecar) make the
    restore impossible and raise BEFORE anything is committed — a
    partial restore is silent corruption. Restoring to the current
    live state is a no-op (``version: None``): no empty commits.
    The add entries are copied verbatim from the target snapshot, so
    deletion vectors, stats, and partition values all travel with the
    restore; a later-evolved schema is reverted by re-committing the
    as-of metaData action.

    CHECK constraints added since the target version still bind: the
    restored snapshot's rows are re-validated against the CURRENT
    constraints before anything commits (pass ``spark`` — a
    constrained restore without a session raises rather than skipping
    the check), and a restore that would ALSO revert the schema under
    recorded constraints raises: their expressions were written
    against the current columns."""
    latest = _latest_version(table)
    if not 0 <= version <= latest:
        raise ValueError(
            f"cannot restore {table} to version {version}: latest is {latest}"
        )
    new_version = _next_version(table)  # claim at plan time (TOCTOU rule):
    # a commit landing after the snapshot diff below would otherwise be
    # silently un-restored by a stale plan; claiming first makes the
    # interleaving an explicit FileExistsError conflict instead
    target = _replay(table, version)
    current = _replay(table)
    meta_at = _table_metadata(table, version)
    meta_cur = _table_metadata(table)
    if meta_at is None:
        raise ValueError(f"no metaData action at-or-below version {version}")
    _refuse_mapping(meta_cur, "restore_delta")
    _refuse_append_only(meta_cur, "restore_delta")
    _refuse_mapping(meta_at, "restore_delta")
    to_add = {
        p: a for p, a in target.items() if current.get(p) != a
    }
    to_remove = sorted(p for p in current if p not in target)
    same_schema = _schema_shape(
        json.loads(meta_at["schemaString"])
    ) == _schema_shape(json.loads(meta_cur["schemaString"]))
    if not to_add and not to_remove and same_schema:
        return {"version": None, "restored_files": 0, "removed_files": 0}
    constraints = _table_constraints(meta_cur)
    generated = _generated_columns(meta_cur)
    if constraints or generated:
        # a restore is a WRITE of the target snapshot: rows the current
        # constraints forbid — or that diverge from a generation
        # expression declared since — must not silently reappear
        declared = sorted(constraints) + sorted(generated)
        if not same_schema:
            raise ValueError(
                f"cannot restore {table} to version {version}: CHECK "
                f"constraint(s)/generated column(s) {declared} are recorded "
                "against the CURRENT schema, which the restore would revert"
            )
        if spark is None:
            raise ValueError(
                f"restoring {table} needs a SparkSession: "
                f"{declared} must re-validate the restored rows"
            )
        restored = read_delta(spark, table, version=version)
        _check_constraints(restored, meta_cur)
        _apply_generated_columns(restored, meta_cur)  # full schema: verifies
    missing = [
        f
        for p, a in sorted(to_add.items())
        for f in [p] + (
            [a["deletionVector"]["path"]] if "deletionVector" in a else []
        )
        if not os.path.exists(os.path.join(table, f))
    ]
    if missing:
        raise ValueError(
            f"cannot restore {table} to version {version}: files "
            f"{missing[:3]}{'...' if len(missing) > 3 else ''} were "
            "vacuumed — a partial restore would be silent corruption"
        )
    actions: list[dict] = []
    if not same_schema:
        actions.append({"metaData": {**meta_cur, "schemaString": meta_at["schemaString"]}})
    for p in to_remove:
        actions.append(
            {"remove": {"path": p, "deletionTimestamp": 0, "dataChange": True}}
        )
    for p, a in sorted(to_add.items()):
        actions.append({"add": {**a, "dataChange": True}})
    actions.append(
        {
            "commitInfo": {
                "operation": "RESTORE",
                "operationParameters": {"version": version},
                "timestamp": 0,
            }
        }
    )
    _commit(table, new_version, actions)
    return {
        "version": new_version,
        "restored_files": len(to_add),
        "removed_files": len(to_remove),
    }


def materialize_deletes(spark: SparkSession, table: str) -> dict:
    """PURGE (Delta's ``REORG TABLE ... APPLY (PURGE)``): rewrite every
    DV-carrying file with its deletion vector applied, committing the
    swap with ``dataChange: false`` — the table's LOGICAL rows are
    unchanged, so incremental readers skip the commit; the orphaned
    sidecars and superseded data files become vacuum-able. This is the
    step that re-enables ZORDER (which refuses DV'd files) and
    restores tight stats bounds. Returns
    ``{"version": v | None, "files": n}``."""
    import shutil

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    meta = _table_metadata(table)
    if meta is None:
        raise ValueError(f"no metaData action in version 0 of {table}")
    _refuse_mapping(meta, "materialize_deletes")
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    pcols = meta.get("partitionColumns", [])
    data_schema = StructType([f for f in schema.fields if f.name not in pcols])
    version = _next_version(table)  # claim at plan time
    live = _replay(table)
    targets = sorted(
        (p, a) for p, a in live.items() if "deletionVector" in a
    )
    if not targets:
        return {"version": None, "files": 0}
    adds: list[dict] = []
    removes: list[str] = []
    try:
        for p, a in targets:
            stats_cols = tuple(
                sorted(json.loads(a.get("stats", "{}")).get("minValues", {}))
            )
            dv_rows = spark.read.parquet(
                os.path.join(table, a["deletionVector"]["path"])
            ).select("__delta_dv_pos")
            clean = (
                spark.read.schema(data_schema)
                .parquet(os.path.join(table, p))
                .withColumn("__delta_dv_pos", F.col("_metadata.row_index"))
                .join(dv_rows, "__delta_dv_pos", "left_anti")
                .drop("__delta_dv_pos")
            )
            stage = os.path.join(table, f".stage-{uuid.uuid4().hex}")
            try:
                clean.coalesce(1).write.mode("overwrite").parquet(stage)
                parts = sorted(
                    f
                    for f in os.listdir(stage)
                    if f.startswith("part-") and f.endswith(".parquet")
                )
                if len(parts) != 1:  # pragma: no cover - coalesce(1) contract
                    raise RuntimeError("purge rewrite produced multiple files")
                src = os.path.join(stage, parts[0])
                md = pq.ParquetFile(src).metadata
                if md.num_rows == 0:
                    # the vector covered the WHOLE file: the purge of this
                    # file is just its remove — committing a 0-row live
                    # add would poison stats-only answers (empty min/max)
                    # and leave junk live files forever
                    removes.append(p)
                    continue
                # a shallow-cloned file has an ABSOLUTE source path: its
                # purged rewrite must land under THIS table's root (the
                # clone's copy-on-write), never back in the source dir
                rel_dir = "" if os.path.isabs(p) else os.path.dirname(p)
                name = f"part-{uuid.uuid4().hex}.parquet"
                rel = f"{rel_dir}/{name}" if rel_dir else name
                shutil.move(src, os.path.join(table, rel))
            finally:
                shutil.rmtree(stage, ignore_errors=True)
            stats = _file_stats(md, stats_cols)
            adds.append(
                {
                    "path": rel,
                    "partitionValues": dict(a.get("partitionValues") or {}),
                    "size": os.path.getsize(os.path.join(table, rel)),
                    "modificationTime": 0,
                    "dataChange": False,
                    **({"stats": json.dumps(stats)} if stats is not None else {}),
                }
            )
            removes.append(p)
        actions: list[dict] = [
            {"remove": {"path": p, "deletionTimestamp": 0, "dataChange": False}}
            for p in removes
        ]
        actions.extend({"add": a} for a in adds)
        actions.append(
            {
                "commitInfo": {
                    "operation": "PURGE",
                    "operationParameters": {},
                    "timestamp": 0,
                }
            }
        )
        _commit(table, version, actions)
    except Exception:
        _remove_staged(table, adds)
        raise
    return {"version": version, "files": len(targets)}


_CM_MODE_KEY = "delta.columnMapping.mode"
_CM_ID_KEY = "delta.columnMapping.id"
_CM_PHYS_KEY = "delta.columnMapping.physicalName"


def _mapping_on(meta: dict | None) -> bool:
    return bool(meta) and (meta.get("configuration") or {}).get(
        _CM_MODE_KEY
    ) == "name"


def _physical_name(field) -> str:
    return (field.metadata or {}).get(_CM_PHYS_KEY, field.name)


def _physical_schema(schema):
    """The schema as the DATA FILES store it: logical field names
    replaced by their recorded physicalName (types unchanged)."""
    from pyspark.sql.types import StructField, StructType

    return StructType(
        [
            StructField(_physical_name(f), f.dataType, f.nullable)
            for f in schema.fields
        ]
    )


def _refuse_mapping(meta: dict | None, op: str) -> None:
    """Column mapping is supported on the read/append/overwrite/stats
    paths; the rewrite-shaped operations refuse loudly instead of
    guessing at physical-name plumbing they were not built for."""
    if _mapping_on(meta):
        raise ValueError(
            f"{op} does not support column-mapped tables (mode=name); "
            "read/append/overwrite/rename/drop are the supported surface"
        )


def _append_only(meta: dict | None) -> bool:
    conf = (meta or {}).get("configuration") or {}
    return str(conf.get("delta.appendOnly", "")).lower() == "true"


def _refuse_append_only(meta: dict | None, op: str) -> None:
    """``delta.appendOnly=true`` blocks commits that destroy visible
    rows (the protocol rule: no dataChange-true removals — overwrite,
    DV delete, MERGE's in-place replacement, RESTORE). Layout-only
    rewrites (OPTIMIZE/ZORDER/PURGE, dataChange:false) stay legal, as
    in real Delta."""
    if _append_only(meta):
        raise ValueError(
            f"{op} is not allowed: table has delta.appendOnly=true "
            "(unset it with set_append_only(table, False) first)"
        )


def set_append_only(table: str, enabled: bool = True) -> int:
    """ALTER TABLE SET TBLPROPERTIES ('delta.appendOnly' = ...): the
    ingest-ledger guard rail — with it set, appends are the ONLY
    commits that may touch visible rows, so an audit table cannot be
    silently rewritten. Returns the commit version."""
    version = _next_version(table)  # claim before the metadata read
    meta = _table_metadata(table)
    if meta is None:
        raise ValueError(f"no metaData action in version 0 of {table}")
    conf = dict(meta.get("configuration") or {})
    conf["delta.appendOnly"] = "true" if enabled else "false"
    _commit(
        table,
        version,
        [
            {"metaData": {**meta, "configuration": conf}},
            {
                "commitInfo": {
                    "operation": "SET TBLPROPERTIES",
                    "operationParameters": {
                        "properties": {"delta.appendOnly": conf["delta.appendOnly"]}
                    },
                    "timestamp": 0,
                }
            },
        ],
    )
    return version


def enable_column_mapping(table: str) -> int:
    """Upgrade the table to column mapping mode 'name' (the protocol's
    rename/drop-without-rewrite feature): every schema field gets a
    stable ``physicalName`` — for an upgraded table, its CURRENT name,
    so every existing data file remains readable — plus a column id.
    From then on data files are written under physical names and the
    logical schema is free to rename or drop without touching a byte.
    Partitioned tables are refused (hive-path derivation speaks
    physical names — out of scope)."""
    version = _next_version(table)  # claim BEFORE the metadata
    # read (TOCTOU rule): a commit landing in between would be
    # clobbered by re-committing stale metaData; claiming first
    # turns the interleaving into an explicit version conflict
    meta = _table_metadata(table)
    if meta is None:
        raise ValueError(f"no metaData action in version 0 of {table}")
    if _mapping_on(meta):
        raise ValueError(f"column mapping already enabled on {table}")
    if meta.get("partitionColumns"):
        raise ValueError(
            "column mapping on partitioned tables is not supported"
        )
    gen = _generated_columns(meta)
    if gen:
        raise ValueError(
            f"column mapping on a table with generated column(s) "
            f"{sorted(gen)} is not supported: a later rename would unbind "
            "their expressions"
        )
    schema = json.loads(meta["schemaString"])
    for i, f in enumerate(schema["fields"], start=1):
        md = dict(f.get("metadata") or {})
        md[_CM_ID_KEY] = i
        md[_CM_PHYS_KEY] = f["name"]
        f["metadata"] = md
    conf = dict(meta.get("configuration") or {})
    conf[_CM_MODE_KEY] = "name"
    conf["delta.columnMapping.maxColumnId"] = str(len(schema["fields"]))
    proto = _table_protocol(table)
    proto["minReaderVersion"] = max(proto.get("minReaderVersion", 1), 2)
    proto["minWriterVersion"] = max(proto.get("minWriterVersion", 2), 5)
    _commit(
        table,
        version,
        [
            {"protocol": proto},  # spec: columnMapping needs (2, 5)
            {
                "metaData": {
                    **meta,
                    "schemaString": json.dumps(schema),
                    "configuration": conf,
                }
            },
            {
                "commitInfo": {
                    "operation": "UPGRADE COLUMN MAPPING",
                    "operationParameters": {"mode": "name"},
                    "timestamp": 0,
                }
            },
        ],
    )
    return version


def _constraint_references(meta: dict, column: str) -> list[str]:
    """Names of CHECK constraints and generated columns whose
    expressions reference ``column`` — renaming or dropping it would
    silently unbind them (generated hits are tagged ``generated:``)."""
    import re

    pat = re.compile(rf"\b{re.escape(column)}\b")
    hits = sorted(
        name
        for name, expr in _table_constraints(meta).items()
        if pat.search(expr)
    )
    hits += sorted(
        f"generated:{name}"
        for name, expr in _generated_columns(meta).items()
        if pat.search(expr)
    )
    return hits


def rename_column(table: str, old: str, new: str) -> int:
    """ALTER TABLE ... RENAME COLUMN — a metaData-only commit (zero
    bytes rewritten): the logical name changes, the recorded
    physicalName keeps pointing at the same parquet column. Requires
    column mapping; refuses when a CHECK constraint references the old
    name (its expression would silently stop binding)."""
    version = _next_version(table)  # claim BEFORE the metadata
    # read (TOCTOU rule): a commit landing in between would be
    # clobbered by re-committing stale metaData; claiming first
    # turns the interleaving into an explicit version conflict
    meta = _table_metadata(table)
    if meta is None:
        raise ValueError(f"no metaData action in version 0 of {table}")
    if not _mapping_on(meta):
        raise ValueError(
            f"rename_column needs column mapping: run "
            f"enable_column_mapping({table!r}) first"
        )
    refs = _constraint_references(meta, old)
    if refs:
        raise ValueError(
            f"cannot rename {old!r}: CHECK constraint(s) {refs} reference it"
        )
    schema = json.loads(meta["schemaString"])
    names = [f["name"] for f in schema["fields"]]
    if old not in names:
        raise ValueError(f"no column {old!r} on {table}")
    if new in names:
        raise ValueError(f"column {new!r} already exists on {table}")
    for f in schema["fields"]:
        if f["name"] == old:
            f["name"] = new
    _commit(
        table,
        version,
        [
            {"metaData": {**meta, "schemaString": json.dumps(schema)}},
            {
                "commitInfo": {
                    "operation": "RENAME COLUMN",
                    "operationParameters": {"from": old, "to": new},
                    "timestamp": 0,
                }
            },
        ],
    )
    return version


def drop_column(table: str, name: str) -> int:
    """ALTER TABLE ... DROP COLUMN — metaData-only (the data files keep
    the bytes; readers under the new schema simply never select the
    physical column, and time travel below the drop still sees it).
    Requires column mapping; refuses constraint-referenced columns and
    dropping the last column."""
    version = _next_version(table)  # claim BEFORE the metadata
    # read (TOCTOU rule): a commit landing in between would be
    # clobbered by re-committing stale metaData; claiming first
    # turns the interleaving into an explicit version conflict
    meta = _table_metadata(table)
    if meta is None:
        raise ValueError(f"no metaData action in version 0 of {table}")
    if not _mapping_on(meta):
        raise ValueError(
            f"drop_column needs column mapping: run "
            f"enable_column_mapping({table!r}) first"
        )
    refs = _constraint_references(meta, name)
    if refs:
        raise ValueError(
            f"cannot drop {name!r}: CHECK constraint(s) {refs} reference it"
        )
    schema = json.loads(meta["schemaString"])
    names = [f["name"] for f in schema["fields"]]
    if name not in names:
        raise ValueError(f"no column {name!r} on {table}")
    if len(names) == 1:
        raise ValueError("cannot drop the last column")
    schema["fields"] = [f for f in schema["fields"] if f["name"] != name]
    _commit(
        table,
        version,
        [
            {"metaData": {**meta, "schemaString": json.dumps(schema)}},
            {
                "commitInfo": {
                    "operation": "DROP COLUMN",
                    "operationParameters": {"name": name},
                    "timestamp": 0,
                }
            },
        ],
    )
    return version


def _translate_stats_filter(meta: dict | None, stats_filter):
    """Column-mapped tables key their add-action stats by PHYSICAL
    name; callers speak logical — translate predicate columns so data
    skipping keeps working after a rename (identity when unmapped)."""
    if not stats_filter or not _mapping_on(meta):
        return stats_filter
    from pyspark.sql.types import StructType as _ST

    phys_of = {
        f.name: _physical_name(f)
        for f in _ST.fromJson(json.loads(meta["schemaString"])).fields
    }
    return [(phys_of.get(c, c), op, v) for c, op, v in stats_filter]


_GEN_KEY = "delta.generationExpression"


def _generated_columns(meta: dict | None) -> dict[str, str]:
    """Generated columns recorded as per-field ``delta.
    generationExpression`` metadata (the protocol's writer-enforced
    derived columns)."""
    if not meta:
        return {}
    schema = json.loads(meta["schemaString"])
    return {
        f["name"]: (f.get("metadata") or {})[_GEN_KEY]
        for f in schema.get("fields", [])
        if _GEN_KEY in (f.get("metadata") or {})
    }


def set_generated_column(spark: SparkSession, table: str, name: str, expr: str) -> int:
    """Declare an EXISTING column as generated from ``expr`` (the
    protocol's generated-columns feature, writer version 4): from this
    commit on, every write either omits the column — the writer
    computes it — or provides values the writer VERIFIES equal the
    expression (a mismatch raises; a silently divergent derived column
    is a lie every downstream consumer inherits). Current rows are
    validated first, like :func:`add_constraint`. The expression may
    reference any non-generated column of the row."""
    from pyspark.sql import functions as F

    version = _next_version(table)  # claim BEFORE the metadata
    # read (TOCTOU rule): a commit landing in between would be
    # clobbered by re-committing stale metaData; claiming first
    # turns the interleaving into an explicit version conflict
    meta = _table_metadata(table)
    if meta is None:
        raise ValueError(f"no metaData action in version 0 of {table}")
    _refuse_mapping(meta, "set_generated_column")
    schema = json.loads(meta["schemaString"])
    field = next((f for f in schema["fields"] if f["name"] == name), None)
    if field is None:
        raise ValueError(f"no column {name!r} on {table}")
    if _GEN_KEY in (field.get("metadata") or {}):
        raise ValueError(f"column {name!r} is already generated")
    import re as _re

    existing_gen = _generated_columns(meta)
    for ref in [name, *existing_gen]:
        if _re.search(rf"\b{_re.escape(ref)}\b", expr):
            raise ValueError(
                f"generation expression for {name!r} references {ref!r}: "
                "expressions may only use plain (non-generated, non-self) "
                "columns — chained or self-referencing generation breaks "
                "writes that omit the columns"
            )
    existing = read_delta(spark, table)
    n_bad = existing.where(
        F.expr(f"({expr}) IS DISTINCT FROM {name}")
    ).count()
    if n_bad:
        raise ValueError(
            f"cannot declare {name!r} generated from ({expr}): {n_bad} "
            "existing row(s) diverge from the expression"
        )
    field["metadata"] = {**(field.get("metadata") or {}), _GEN_KEY: expr}
    proto = _table_protocol(table)
    actions: list[dict] = []
    if proto.get("minWriterVersion", 2) < 4:  # spec: generated cols → 4
        actions.append({"protocol": {**proto, "minWriterVersion": 4}})
    actions.append({"metaData": {**meta, "schemaString": json.dumps(schema)}})
    actions.append(
        {
            "commitInfo": {
                "operation": "SET GENERATED COLUMN",
                "operationParameters": {"name": name, "expr": expr},
                "timestamp": 0,
            }
        }
    )
    _commit(table, version, actions)
    return version


def _apply_generated_columns(df: DataFrame, meta: dict | None) -> DataFrame:
    """Writer-side generated-column contract: absent columns are
    COMPUTED from their expressions; present ones are VERIFIED equal
    (null-safe) — one OR-combined limit(1) scan, per-column counts only
    on the failure path."""
    from pyspark.sql import functions as F

    gen = _generated_columns(meta)
    if not gen:
        return df
    checks = []
    computed = False
    for name, expr in gen.items():
        if name not in df.columns:
            df = df.withColumn(name, F.expr(expr))
            computed = True
        else:
            checks.append((name, expr))
    if computed:
        # withColumn APPENDS: re-select into the recorded field order, or
        # the order-sensitive schema check spuriously rejects any write
        # whose omitted generated column is not the trailing field
        recorded = [
            f["name"] for f in json.loads(meta["schemaString"])["fields"]
        ]
        if sorted(df.columns) == sorted(recorded):
            df = df.select(*recorded)
    if checks:
        clause = " OR ".join(
            f"(({expr}) IS DISTINCT FROM {name})" for name, expr in checks
        )
        if df.where(F.expr(clause)).limit(1).count():
            detail = {
                name: df.where(
                    F.expr(f"({expr}) IS DISTINCT FROM {name}")
                ).count()
                for name, expr in checks
            }
            bad = {n: c for n, c in detail.items() if c}
            raise ValueError(
                f"write diverges from generated column(s) {bad}: "
                + "; ".join(
                    f"{n} := {dict(checks)[n]}" for n in bad
                )
            )
    return df


def _table_constraints(meta: dict | None) -> dict[str, str]:
    """CHECK constraints recorded in the metaData configuration under
    the protocol's ``delta.constraints.<name>`` keys."""
    if not meta:
        return {}
    prefix = "delta.constraints."
    return {
        k[len(prefix):]: v
        for k, v in (meta.get("configuration") or {}).items()
        if k.startswith(prefix)
    }


def _check_constraints(df: DataFrame, meta: dict | None) -> None:
    """Refuse a write whose rows violate any recorded CHECK constraint —
    ONE combined violation scan (all constraints OR'd, limit 1), then a
    per-constraint count only on the failure path for a useful error.
    NULL evaluation follows SQL CHECK semantics: a row violates only
    when the expression is definitively FALSE (UNKNOWN passes)."""
    from pyspark.sql import functions as F

    constraints = _table_constraints(meta)
    if not constraints:
        return
    clauses = [f"NOT coalesce(({expr}), true)" for expr in constraints.values()]
    if df.where(F.expr(" OR ".join(clauses))).limit(1).count():
        detail = {
            name: df.where(F.expr(f"NOT coalesce(({expr}), true)")).count()
            for name, expr in sorted(constraints.items())
        }
        bad = {n: c for n, c in detail.items() if c}
        raise ValueError(
            f"write violates CHECK constraint(s) {bad}: "
            + "; ".join(f"{n}: CHECK ({constraints[n]})" for n in bad)
        )


def add_constraint(spark: SparkSession, table: str, name: str, expr: str) -> int:
    """ALTER TABLE ... ADD CONSTRAINT ... CHECK (expr): records the
    constraint in the metaData configuration (the protocol's
    ``delta.constraints.`` namespace) AFTER verifying every CURRENTLY
    LIVE row satisfies it — adding a constraint existing data violates
    would make the table lie about itself. Later writes (append,
    overwrite, MERGE's appended rows) are refused if any row fails the
    check; deletes and rewrites of already-valid rows are unaffected.
    Returns the commit version.

    Scale shape: validation is one pushdown-friendly scan with
    limit(1) short-circuit; enforcement on writes costs one extra
    filter pass over the WRITE's rows only, never the table."""
    from pyspark.sql import functions as F

    version = _next_version(table)  # claim BEFORE the metadata
    # read (TOCTOU rule): a commit landing in between would be
    # clobbered by re-committing stale metaData; claiming first
    # turns the interleaving into an explicit version conflict
    meta = _table_metadata(table)
    if meta is None:
        raise ValueError(f"no metaData action in version 0 of {table}")
    if name in _table_constraints(meta):
        raise ValueError(f"constraint {name!r} already exists on {table}")
    existing = read_delta(spark, table)
    n_bad = existing.where(F.expr(f"NOT coalesce(({expr}), true)")).count()
    if n_bad:
        raise ValueError(
            f"cannot add constraint {name!r} to {table}: {n_bad} existing "
            f"row(s) violate CHECK ({expr})"
        )
    conf = dict(meta.get("configuration") or {})
    conf[f"delta.constraints.{name}"] = expr
    proto = _table_protocol(table)
    actions: list[dict] = []
    if proto.get("minWriterVersion", 2) < 3:  # spec: CHECKs need writer 3
        actions.append(
            {"protocol": {**proto, "minWriterVersion": 3}}
        )
    actions.append({"metaData": {**meta, "configuration": conf}})
    _commit(
        table,
        version,
        actions
        + [
            {
                "commitInfo": {
                    "operation": "ADD CONSTRAINT",
                    "operationParameters": {"name": name, "expr": expr},
                    "timestamp": 0,
                }
            },
        ],
    )
    return version


def drop_constraint(table: str, name: str) -> int:
    """ALTER TABLE ... DROP CONSTRAINT: removes the recorded check (a
    metaData-only commit). Unknown names raise — silently 'dropping'
    a typo would leave the real constraint enforced."""
    version = _next_version(table)  # claim BEFORE the metadata
    # read (TOCTOU rule): a commit landing in between would be
    # clobbered by re-committing stale metaData; claiming first
    # turns the interleaving into an explicit version conflict
    meta = _table_metadata(table)
    if meta is None:
        raise ValueError(f"no metaData action in version 0 of {table}")
    key = f"delta.constraints.{name}"
    conf = dict(meta.get("configuration") or {})
    if key not in conf:
        raise ValueError(f"no constraint {name!r} on {table}")
    del conf[key]
    _commit(
        table,
        version,
        [
            {"metaData": {**meta, "configuration": conf}},
            {
                "commitInfo": {
                    "operation": "DROP CONSTRAINT",
                    "operationParameters": {"name": name},
                    "timestamp": 0,
                }
            },
        ],
    )
    return version


def clone_delta(src: str, dst: str, version: int | None = None) -> dict:
    """SHALLOW CLONE — a zero-copy writable fork of ``src``'s snapshot
    (optionally as-of ``version``): ``dst`` gets a fresh version-0 log
    whose add actions point at the SOURCE's data files by absolute
    path; no bytes move. Writes to the clone are copy-on-write — new
    commits, OPTIMIZE rewrites, DV sidecars, and purges all land under
    the clone's own root (source files are only ever dereferenced,
    never touched), and the clone's vacuum reaps only clone-local
    files. This is the dev/test-table primitive: fork a petabyte table
    in O(|files|) metadata, experiment destructively, drop the dir.

    Same caveat as real Delta shallow clones: VACUUM ON THE SOURCE can
    delete files the clone still references — clones are working
    copies, not backups. Stats, and deletion-vector references travel
    verbatim (sidecar paths are absolutized too, so a clone of a DV'd
    snapshot reads through the same vectors). Partitioned sources are
    refused: the reader derives hive partition values under the
    TABLE's basePath, which cloned absolute paths live outside of
    (DEEP clone / path-rewrite is the out-of-scope fix)."""
    meta = _table_metadata(src, version)
    if meta is None:
        raise ValueError(f"no metaData action in version 0 of {src}")
    _refuse_mapping(meta, "clone_delta")
    if meta.get("partitionColumns"):
        raise ValueError(
            f"shallow clone of partitioned table {src} is not supported: "
            "hive partition derivation needs files under the clone's "
            "basePath — use a deep copy"
        )
    if os.path.exists(dst) and (
        os.path.isdir(_log_path(dst)) or os.listdir(dst)
    ):
        raise ValueError(f"clone destination {dst} already exists")
    live = _replay(src, version)
    src_root = os.path.abspath(src)
    actions: list[dict] = [
        # the clone's metaData may demand constraint/generated/mapping
        # enforcement: carry the source's protocol, not the base (1, 2)
        {"protocol": _table_protocol(src, version)},
        {
            "metaData": {
                **meta,
                "id": uuid.uuid4().hex,  # a clone is a NEW table
            }
        },
    ]
    n_files = 0
    for p, a in sorted(live.items()):
        entry = dict(a)
        entry["path"] = p if os.path.isabs(p) else os.path.join(src_root, p)
        dv = entry.get("deletionVector")
        if dv and not os.path.isabs(dv["path"]):
            entry["deletionVector"] = {
                **dv,
                "path": os.path.join(src_root, dv["path"]),
            }
        actions.append({"add": entry})
        n_files += 1
    actions.append(
        {
            "commitInfo": {
                "operation": "CLONE",
                "operationParameters": {
                    "source": src_root,
                    "sourceVersion": (
                        _latest_version(src) if version is None else version
                    ),
                    "isShallow": True,
                },
                "timestamp": 0,
            }
        }
    )
    os.makedirs(dst, exist_ok=True)
    _commit(dst, 0, actions)
    return {"version": 0, "files": n_files}


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
    cp = _last_checkpoint(table)
    if cp is not None:  # cleaned-prefix history survives via the checkpoint
        _, _, adds = _read_checkpoint(table, cp)
        live.update(a["path"] for a in adds)
        live.update(
            a["deletionVector"]["path"] for a in adds if a.get("deletionVector")
        )
    for v in _list_versions(table):
        with open(_version_file(table, v)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "add" in action:
                    live.add(action["add"]["path"])
                    dv = action["add"].get("deletionVector")
                    if dv:  # sidecar stays reachable for time travel
                        live.add(dv["path"])
    reaped = []
    for f in glob.glob(os.path.join(table, "**", "part-*.parquet"), recursive=True):
        rel = os.path.relpath(f, table).replace(os.sep, "/")
        if rel not in live and os.path.getmtime(f) < cutoff:
            os.remove(f)
            reaped.append(rel)
    for f in glob.glob(os.path.join(table, "deletion-vector-*.parquet")):
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


def optimize_delta(
    spark: SparkSession,
    table: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Delta's OPTIMIZE (bin-packing compaction): within each
    partition, pack live files smaller than ``target_bytes`` into bins
    of up to ``target_bytes``, rewrite each ≥2-file bin as ONE file,
    and commit the swap as remove+add actions with
    ``dataChange: false`` — the snapshot's rows are untouched (real
    Delta's semantics: incremental/streaming readers skip
    no-data-change commits instead of re-processing rewritten rows).
    Returns ``{"version": v | None, "removed": n, "added": m}``; a
    table with nothing to compact commits NOTHING (version ``None``,
    no empty commit polluting history).

    Scale shape: planning is pure log metadata (O(live files) driver-
    side — the same order every snapshot replay already pays); each bin
    rewrite scans and writes only that bin's bytes; bins are
    independent (parallelizable across partitions); the swap is one
    atomic commit. The small-file pathology this fixes is the
    reference's own backfill pattern — 9,504 hourly appends = 9,504
    tiny files (gha.ipynb:19-29) — OPTIMIZE keeps a scan's task count
    proportional to data volume, not commit history.

    Concurrency: claims the next version like any writer; on a lost
    race it raises with the staged files removed (the plan was computed
    against a stale snapshot — a remove-carrying commit must re-plan,
    never blind-retry; blind appends are the only commuting commits)."""
    import shutil

    import pyarrow.parquet as pq
    from pyspark.sql.types import StructType

    meta = _table_metadata(table)
    if meta is None:
        raise ValueError(f"no metaData action in version 0 of {table}")
    _refuse_mapping(meta, "optimize_delta")
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    pcols = meta.get("partitionColumns", [])
    data_schema = StructType([f for f in schema.fields if f.name not in pcols])

    # claim the version AT PLAN TIME: the plan is computed against this
    # snapshot, and any commit landing in between must turn into an
    # explicit O_EXCL conflict at _commit — a remove-carrying commit
    # built over a stale snapshot would resurrect overwritten rows
    version = _next_version(table)
    groups: dict[tuple, list[tuple[str, dict]]] = {}
    for path, add in sorted(_replay(table).items()):
        key = tuple(sorted((add.get("partitionValues") or {}).items()))
        groups.setdefault(key, []).append((path, add))

    removes: list[str] = []
    adds: list[dict] = []
    try:
        for key, files in sorted(groups.items()):
            # DV-carrying files are skipped: compacting one from its raw
            # bytes would resurrect deleted rows — materialize_deletes is
            # the rewrite that applies the DV first
            small = [
                (p, a)
                for p, a in files
                if a.get("size", 0) < target_bytes and "deletionVector" not in a
            ]
            bins: list[list[tuple[str, dict]]] = []
            cur: list[tuple[str, dict]] = []
            cur_bytes = 0
            for p, a in small:  # deterministic first-fit in path order
                if cur and cur_bytes + a.get("size", 0) > target_bytes:
                    bins.append(cur)
                    cur, cur_bytes = [], 0
                cur.append((p, a))
                cur_bytes += a.get("size", 0)
            if cur:
                bins.append(cur)
            for b in bins:
                if len(b) < 2:
                    continue  # a 1-file bin is already optimal
                # preserve whatever stats the inputs carried
                stats_cols = tuple(
                    sorted(
                        {
                            c
                            for _, a in b
                            for c in json.loads(a.get("stats", "{}")).get(
                                "minValues", {}
                            )
                        }
                    )
                )
                paths = [p for p, _ in b]
                stage = os.path.join(table, f".stage-{uuid.uuid4().hex}")
                try:
                    (
                        spark.read.schema(data_schema)
                        .parquet(*[os.path.join(table, p) for p in paths])
                        .coalesce(1)
                        .write.mode("overwrite")
                        .parquet(stage)
                    )
                    parts = sorted(
                        f
                        for f in os.listdir(stage)
                        if f.startswith("part-") and f.endswith(".parquet")
                    )
                    if len(parts) != 1:  # pragma: no cover - coalesce(1) contract
                        raise RuntimeError(
                            f"OPTIMIZE bin rewrite produced {len(parts)} files"
                        )
                    src = os.path.join(stage, parts[0])
                    md = pq.ParquetFile(src).metadata
                    # same partitionValues ⇒ same hive dir as the inputs:
                    # reuse it verbatim, no re-encoding to get wrong.
                    # A shallow-cloned input has an ABSOLUTE source
                    # path: its rewrite must land under THIS table's
                    # root, never back in the source dir (r7 review)
                    rel_dir = (
                        ""
                        if os.path.isabs(paths[0])
                        else os.path.dirname(paths[0])
                    )
                    name = f"part-{uuid.uuid4().hex}.parquet"
                    rel = f"{rel_dir}/{name}" if rel_dir else name
                    shutil.move(src, os.path.join(table, rel))
                finally:
                    shutil.rmtree(stage, ignore_errors=True)
                stats = _file_stats(md, stats_cols)
                adds.append(
                    {
                        "path": rel,
                        "partitionValues": dict(key),
                        "size": os.path.getsize(os.path.join(table, rel)),
                        "modificationTime": 0,
                        "dataChange": False,
                        **({"stats": json.dumps(stats)} if stats is not None else {}),
                    }
                )
                removes.extend(paths)
        if not adds:
            return {"version": None, "removed": 0, "added": 0}
        actions: list[dict] = [
            {"remove": {"path": p, "deletionTimestamp": 0, "dataChange": False}}
            for p in removes
        ]
        actions.extend({"add": a} for a in adds)
        actions.append(
            {
                "commitInfo": {
                    "operation": "OPTIMIZE",
                    "operationParameters": {"targetSize": target_bytes},
                    "timestamp": 0,
                }
            }
        )
        _commit(table, version, actions)  # version claimed at plan time
    except Exception:
        _remove_staged(table, adds)
        raise
    return {"version": version, "removed": len(removes), "added": len(adds)}


def zorder_delta(
    spark: SparkSession,
    table: str,
    zorder_by: tuple[str, ...],
    n_files: int,
    tiebreak: str,
    bits: int = 21,
) -> dict:
    """OPTIMIZE ZORDER BY on the Delta log: rewrite the live snapshot
    clustered by the Morton interleave of ``zorder_by`` (io/sink.py's
    ``zorder_key`` — pure bitwise codegen, no UDF) into exactly
    ``n_files`` rank-balanced files per partition, with add-action
    stats on the clustered columns. Each file then covers a small
    hyper-rectangle of the key space, so ``stats_filter`` scans prune
    on ANY clustered column — the access-path property a 100 TB table
    needs when one layout serves several predicates.

    File boundaries are EXACT rank splits (row_number over (zkey,
    ``tiebreak``) — the caller names a unique column), not
    repartitionByRange's sampled boundaries: same data in, same file
    contents and stats out, on every engine and every run. That
    determinism is what lets an external oracle recompute which files
    a box query must keep. The global rank sort is one exchange — the
    same price any clustering rewrite pays; at production scale the
    sampled-range variant (``write_table_zordered``) trades the
    determinism back for a balanced parallel sort.

    Commits remove+add with ``dataChange: false`` like OPTIMIZE (rows
    unchanged, incremental readers skip it). Returns
    ``{"version": v, "files": n}``."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType
    from pyspark.sql.window import Window

    from .sink import zorder_key

    if n_files < 1:
        raise ValueError("n_files must be >= 1")
    meta = _table_metadata(table)
    if meta is None:
        raise ValueError(f"no metaData action in version 0 of {table}")
    _refuse_mapping(meta, "zorder_delta")
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    pcols = meta.get("partitionColumns", [])
    if set(zorder_by) & set(pcols):
        raise ValueError("cannot z-order by a partition column")
    data_schema = StructType([f for f in schema.fields if f.name not in pcols])

    # claim the version at plan time (same TOCTOU rule as optimize_delta)
    version = _next_version(table)
    # the DV guard runs on the SAME post-claim replay the plan uses — a
    # guard on an earlier replay would miss a delete_delta_dv commit
    # landing in between, and the clustering would resurrect its rows
    live_adds = _replay(table)
    if any("deletionVector" in a for a in live_adds.values()):
        raise ValueError(
            f"zorder_delta on {table}: live files carry deletion vectors — "
            "clustering reads raw file bytes and would resurrect deleted "
            "rows; run materialize_deletes first"
        )
    groups: dict[tuple, list[str]] = {}
    for path, add in sorted(live_adds.items()):
        key = tuple(sorted((add.get("partitionValues") or {}).items()))
        groups.setdefault(key, []).append(path)

    removes: list[str] = []
    adds: list[dict] = []
    try:
        for key, paths in sorted(groups.items()):
            df = spark.read.schema(data_schema).parquet(
                *[os.path.join(table, p) for p in paths]
            )
            n_rows = df.count()
            if n_rows == 0:
                continue
            k = min(n_files, n_rows)
            rn = F.row_number().over(
                Window.orderBy(F.col("__zkey"), F.col(tiebreak))
            )
            clustered = (
                df.withColumn("__zkey", zorder_key(tuple(zorder_by), bits))
                .withColumn("__rn", rn)
                # exact integer split: file i gets ranks (i*n/k, (i+1)*n/k]
                .withColumn(
                    "__zfile",
                    F.expr(f"CAST(((__rn - 1) * {k}) DIV {n_rows} AS LONG)"),
                )
                .drop("__rn")
            )
            stage = os.path.join(table, f".stage-{uuid.uuid4().hex}")
            try:
                (
                    clustered.repartition(k, "__zfile")
                    .sortWithinPartitions("__zfile", "__zkey", tiebreak)
                    .drop("__zkey")
                    .write.partitionBy("__zfile")
                    .mode("overwrite")
                    .parquet(stage)
                )
                import glob
                import shutil

                import pyarrow.parquet as pq

                for zdir in sorted(os.listdir(stage)):
                    if not zdir.startswith("__zfile="):
                        continue
                    parts = sorted(
                        glob.glob(os.path.join(stage, zdir, "part-*.parquet"))
                    )
                    if len(parts) != 1:  # pragma: no cover - hash-group contract
                        raise RuntimeError(
                            f"z-order bucket {zdir} wrote {len(parts)} files"
                        )
                    md = pq.ParquetFile(parts[0]).metadata
                    if md.num_rows == 0:  # pragma: no cover
                        continue
                    # cloned inputs carry absolute source paths: the
                    # clustered rewrite is copy-on-write into THIS root
                    rel_dir = (
                        ""
                        if os.path.isabs(paths[0])
                        else os.path.dirname(paths[0])
                    )
                    name = f"part-{uuid.uuid4().hex}.parquet"
                    rel = f"{rel_dir}/{name}" if rel_dir else name
                    shutil.move(parts[0], os.path.join(table, rel))
                    stats = _file_stats(md, tuple(zorder_by))
                    adds.append(
                        {
                            "path": rel,
                            "partitionValues": dict(key),
                            "size": os.path.getsize(os.path.join(table, rel)),
                            "modificationTime": 0,
                            "dataChange": False,
                            **(
                                {"stats": json.dumps(stats)}
                                if stats is not None
                                else {}
                            ),
                        }
                    )
            finally:
                import shutil

                shutil.rmtree(stage, ignore_errors=True)
            removes.extend(paths)
        if not adds:
            return {"version": None, "files": 0}
        actions: list[dict] = [
            {"remove": {"path": p, "deletionTimestamp": 0, "dataChange": False}}
            for p in removes
        ]
        actions.extend({"add": a} for a in adds)
        actions.append(
            {
                "commitInfo": {
                    "operation": "OPTIMIZE",
                    "operationParameters": {
                        "zOrderBy": list(zorder_by),
                        "targetFiles": n_files,
                    },
                    "timestamp": 0,
                }
            }
        )
        _commit(table, version, actions)  # version claimed at plan time
    except Exception:
        _remove_staged(table, adds)
        raise
    return {"version": version, "files": len(adds)}


def delta_changes(
    spark: SparkSession,
    table: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Change-feed read for append-only flows: the rows ADDED by
    data-changing commits in ``(from_version, to_version]``, each
    tagged with a ``_commit_version`` column — the incremental-
    consumption primitive under the reference's hourly-ingest pattern
    (process only what arrived since the last run, identified by the
    log, never by file listing or timestamps).

    ``dataChange: false`` commits (OPTIMIZE) are SKIPPED entirely:
    their adds are rewrites of rows a consumer already processed —
    re-delivering them is the classic compaction double-count bug.
    A data-changing REMOVE inside the range (overwrite, delete,
    merge) raises: this minimal feed serves append-only tables;
    reconstructing row-level deletes needs the full CDF protocol
    (change-data files), which is out of scope — and silently
    returning just the adds of an overwrite would misrepresent it as
    an append. A range reaching below the retained JSON (cleaned
    prefix) also raises — the feed never guesses what a vanished
    commit did.

    Scale shape: the plan is a driver-side walk of just the range's
    JSON files (O(commits in range), each O(its own actions)); the
    data read is exactly the new files — incremental cost is
    proportional to new data, never to table size. Schema is the
    metaData as of ``to_version`` (pre-evolution files widen with
    nulls, same as any snapshot read)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    latest = _latest_version(table)
    if to_version is None:
        to_version = latest
    if not 0 <= from_version <= to_version <= latest:
        raise ValueError(
            f"invalid change range ({from_version}, {to_version}] for "
            f"{table} at version {latest}"
        )
    # a gapped log means lost commits: the schema lookup below could
    # silently resolve past a vanished evolution commit, so refuse the
    # whole table, not just ranges that touch the gap
    _check_contiguous(table, _list_versions(table))
    retained = set(_list_versions(table))
    per_version: list[tuple[int, list[str]]] = []
    for v in range(from_version + 1, to_version + 1):
        if v not in retained:
            raise ValueError(
                f"change feed of {table} needs version {v}, but its JSON "
                "was cleaned up — the feed never guesses what a vanished "
                "commit did"
            )
        files: list[str] = []
        with open(_version_file(table, v)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "add" in action and action["add"].get("dataChange", True):
                    files.append(action["add"]["path"])
                elif "remove" in action and action["remove"].get(
                    "dataChange", True
                ):
                    raise ValueError(
                        f"version {v} of {table} removes data (overwrite/"
                        "delete): this append-only change feed cannot "
                        "represent it — full CDF is out of scope"
                    )
                elif (
                    action.get("commitInfo", {}).get("operation") == "RESTORE"
                ):
                    # a restore that only re-adds (e.g. reverting a DV
                    # delete) carries no remove action, but its adds are
                    # files whose rows consumers already processed —
                    # delivering them again is the same double-count the
                    # remove rule guards against
                    raise ValueError(
                        f"version {v} of {table} is a RESTORE: its adds "
                        "re-deliver previously-consumed rows, which this "
                        "append-only change feed cannot represent"
                    )
        if files:
            per_version.append((v, files))
    meta = _table_metadata(table, to_version)
    if meta is None:
        raise ValueError(f"no metaData action at-or-below version "
                         f"{to_version} of {table}")
    _refuse_mapping(meta, "delta_changes")
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    pcols = meta.get("partitionColumns", [])
    out = None
    for v, files in per_version:
        reader = spark.read.schema(schema)
        if pcols:
            reader = reader.option("basePath", table)
        part = (
            reader.parquet(*[os.path.join(table, f) for f in files])
            .select(*[f.name for f in schema.fields])
            .withColumn("_commit_version", F.lit(v).cast("long"))
        )
        out = part if out is None else out.unionByName(part)
    if out is None:
        return spark.createDataFrame(
            [], schema.add("_commit_version", "long")
        )
    return out


def high_water_mark(table: str, col: str, version: int | None = None):
    """max(col) over the live snapshot answered from add-action STATS
    alone — zero data files opened (the reference's get_add_actions
    trick, preprocess.py:181-186). Returns None when any live file
    lacks stats for the column, OR carries a deletion vector — DV'd
    stats are LOOSE bounds (the max row may be among the deleted), and
    reporting a watermark that no longer exists is exactly the silent
    wrongness this helper refuses (falling back to a scan is the
    caller's choice)."""
    meta = _table_metadata(table, version)
    if _mapping_on(meta):
        from pyspark.sql.types import StructType as _ST

        for f in _ST.fromJson(json.loads(meta["schemaString"])).fields:
            if f.name == col:  # stats are keyed by PHYSICAL name
                col = _physical_name(f)
                break
        else:
            raise ValueError(f"no column {col!r} on {table}")
    maxes = []
    for add in _replay(table, version).values():
        stats = json.loads(add["stats"]) if "stats" in add else None
        if not stats or col not in stats.get("maxValues", {}):
            return None
        if "deletionVector" in add:
            return None
        maxes.append(stats["maxValues"][col])
    return max(maxes) if maxes else None


def history(table: str, allow_truncated: bool = False) -> list[dict]:
    """DESCRIBE HISTORY analog: one row per commit (version, operation,
    file add/remove counts).

    After :func:`cleanup_log` the JSON prefix is gone, so the full
    history no longer exists; returning just the tail as if it were
    everything would be a silently wrong audit (the module's
    time-travel path raises in the same situation). Default: raise.
    ``allow_truncated=True`` opts into the tail, which then carries a
    ``truncated_below`` marker on its first row."""
    versions = _list_versions(table)
    _check_contiguous(table, versions)
    cp = _last_checkpoint(table)
    if versions and versions[0] > 0:
        truncated_below = versions[0]
    elif not versions and cp is not None:
        # checkpoint-at-latest + cleanup leaves NO JSON at all: the
        # whole history is gone, not "no commits ever happened"
        truncated_below = cp["version"] + 1
    else:
        truncated_below = None
    if truncated_below is not None and not allow_truncated:
        raise ValueError(
            f"history of {table} is truncated below version "
            f"{truncated_below} (log cleanup removed the prefix); pass "
            "allow_truncated=True for the retained tail"
        )
    out = []
    for v in versions:
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
        row = {"version": v, "operation": op, "adds": adds, "removes": removes}
        if v == versions[0] and truncated_below is not None:
            row["truncated_below"] = truncated_below
        out.append(row)
    if not out and truncated_below is not None:
        # fully-cleaned log (checkpoint at latest): an empty list would
        # be indistinguishable from "no commits ever" — emit a marker-
        # only row so the opted-in caller still sees the truncation
        out.append(
            {
                "version": None,
                "operation": None,
                "adds": 0,
                "removes": 0,
                "truncated_below": truncated_below,
            }
        )
    return out


# --- checkpoints ---------------------------------------------------------


def _checkpoint_file(table: str, version: int) -> str:
    return os.path.join(_log_path(table), f"{version:020d}.checkpoint.parquet")


def _last_checkpoint_path(table: str) -> str:
    return os.path.join(_log_path(table), "_last_checkpoint")


def _last_checkpoint(table: str) -> dict | None:
    """Parse ``_delta_log/_last_checkpoint`` → {"version": int} or None.
    A pointer to a missing/corrupt checkpoint file raises: cleanup may
    already have relied on it, so ignoring it could silently replay a
    truncated log."""
    try:
        with open(_last_checkpoint_path(table)) as fh:
            meta = json.load(fh)
        version = int(meta["version"])
    except FileNotFoundError:
        return None
    except (OSError, ValueError, KeyError, json.JSONDecodeError) as exc:
        raise ValueError(f"corrupt _last_checkpoint in {table}: {exc}") from exc
    if not os.path.isfile(_checkpoint_file(table, version)):
        raise ValueError(
            f"_last_checkpoint of {table} names version {version} but "
            f"{_checkpoint_file(table, version)} is missing"
        )
    return {"version": version}


def _checkpoint_schema():
    import pyarrow as pa

    return pa.schema(
        [
            pa.field(
                "protocol",
                pa.struct(
                    [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
                ),
            ),
            pa.field(
                "metaData",
                pa.struct(
                    [
                        ("id", pa.string()),
                        ("format", pa.struct([("provider", pa.string())])),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                        ("configuration", pa.map_(pa.string(), pa.string())),
                        ("createdTime", pa.int64()),
                    ]
                ),
            ),
            pa.field(
                "add",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("partitionValues", pa.map_(pa.string(), pa.string())),
                        ("size", pa.int64()),
                        ("modificationTime", pa.int64()),
                        ("dataChange", pa.bool_()),
                        ("stats", pa.string()),
                        (
                            "deletionVector",
                            pa.struct(
                                [
                                    ("path", pa.string()),
                                    ("cardinality", pa.int64()),
                                ]
                            ),
                        ),
                    ]
                ),
            ),
        ]
    )


def checkpoint_delta(table: str, version: int | None = None) -> int:
    """Write a spec-shaped parquet checkpoint of the snapshot at
    ``version`` (default latest) — one row per live action, nested
    protocol/metaData/add columns — then atomically repoint
    ``_last_checkpoint``. Replay afterwards starts from the checkpoint
    and applies only the JSON tail; :func:`cleanup_log` may then drop
    the JSON prefix. Returns the checkpointed version.

    Tombstones (unexpired ``remove`` actions) are not carried — this
    writer's overwrites leave the removed files on disk for
    :func:`vacuum_delta`'s retention reaper, which does not consult
    tombstones, so dropping them loses nothing here (documented
    module-level)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    version = _latest_version(table) if version is None else version
    # _last_checkpoint must be monotone (real Delta keeps it
    # increasing): checkpointing at-or-below the pointer must not
    # repoint replay-of-latest back to a longer JSON tail, nor let a
    # later cleanup_log keep a prefix the newer checkpoint had already
    # made droppable. Nothing in this module ever reads a checkpoint
    # the pointer doesn't name, so the whole write is skipped — and
    # skipped BEFORE the O(live files) replay, not after it.
    existing = _last_checkpoint(table)
    if existing is not None and version <= existing["version"]:
        return version
    live = _replay(table, version)  # raises on gaps / cleaned prefixes
    meta = _table_metadata(table, version)  # schema AS OF the checkpoint
    if meta is None:
        raise ValueError(f"no metaData action found for {table}")
    proto_row = _table_protocol(table, version)
    meta_row = {
        "id": meta["id"],
        "format": {"provider": meta.get("format", {}).get("provider", "parquet")},
        "schemaString": meta["schemaString"],
        "partitionColumns": meta.get("partitionColumns", []),
        # constraints and column mapping live here: a checkpoint that
        # dropped configuration would silently disable both (r7 review)
        "configuration": list((meta.get("configuration") or {}).items()),
        "createdTime": meta.get("createdTime", 0),
    }
    add_rows = [
        {
            "path": a["path"],
            "partitionValues": list(a.get("partitionValues", {}).items()),
            "size": a["size"],
            "modificationTime": a.get("modificationTime", 0),
            "dataChange": False,
            "stats": a.get("stats"),
            "deletionVector": a.get("deletionVector"),
        }
        for _, a in sorted(live.items())
    ]
    n = len(add_rows) + 2
    table_arrow = pa.Table.from_pydict(
        {
            "protocol": [proto_row] + [None] * (n - 1),
            "metaData": [None, meta_row] + [None] * (n - 2),
            "add": [None, None] + add_rows,
        },
        schema=_checkpoint_schema(),
    )
    dest = _checkpoint_file(table, version)
    tmp = dest + f".tmp-{uuid.uuid4().hex}"
    try:
        pq.write_table(table_arrow, tmp)
        os.replace(tmp, dest)  # atomic publish
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    ptr_tmp = _last_checkpoint_path(table) + f".tmp-{uuid.uuid4().hex}"
    with open(ptr_tmp, "w") as fh:
        json.dump({"version": version, "size": n}, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(ptr_tmp, _last_checkpoint_path(table))
    return version


def _read_checkpoint(table: str, cp: dict) -> tuple[dict | None, dict | None, list[dict]]:
    """Checkpoint parquet → (metaData, protocol, add actions) with
    partitionValues back as dicts and absent stats dropped (so a
    checkpoint-sourced add action is indistinguishable from a
    JSON-sourced one downstream).

    The parse is memoized: one read_delta on a cleaned log otherwise
    parses the same checkpoint three times (schema → partition columns
    → replay). The cache key includes the file's (mtime_ns, size)
    identity, not just the path — a scratch table torn down and
    recreated at the same path with the same version number must never
    be served the old table's parse. Callers get fresh dict copies —
    the cached canonical rows must never alias anything a caller might
    mutate."""
    path = _checkpoint_file(table, cp["version"])
    st = os.stat(path)
    meta, proto, adds = _read_checkpoint_cached(path, st.st_mtime_ns, st.st_size)
    copy_meta = (
        None
        if meta is None
        else {
            **meta,
            "partitionColumns": list(meta["partitionColumns"]),
            "configuration": dict(meta.get("configuration") or {}),
        }
    )
    copy_adds = [
        {
            **a,
            "partitionValues": dict(a["partitionValues"]),
            **(
                {"deletionVector": dict(a["deletionVector"])}
                if "deletionVector" in a
                else {}
            ),
        }
        for a in adds
    ]
    return copy_meta, (None if proto is None else dict(proto)), copy_adds


@functools.lru_cache(maxsize=8)
def _read_checkpoint_cached(
    path: str, mtime_ns: int, size: int
) -> tuple[dict | None, dict | None, list[dict]]:
    import pyarrow.parquet as pq

    rows = pq.read_table(path).to_pylist()
    meta = proto = None
    adds: list[dict] = []
    for r in rows:
        if r.get("protocol"):
            proto = r["protocol"]
        if r.get("metaData"):
            m = dict(r["metaData"])
            # old checkpoints (pre-configuration column) deserialize to
            # None; new ones carry the map as a list of (k, v) pairs
            m["configuration"] = dict(m.get("configuration") or {})
            adds_pc = m.get("partitionColumns")
            m["partitionColumns"] = list(adds_pc) if adds_pc else []
            meta = m
        if r.get("add"):
            a = dict(r["add"])
            a["partitionValues"] = dict(a.get("partitionValues") or [])
            a["dataChange"] = bool(a.get("dataChange"))
            if a.get("stats") is None:
                a.pop("stats", None)
            if a.get("deletionVector") is None:
                a.pop("deletionVector", None)
            adds.append(a)
    return meta, proto, adds


def cleanup_log(table: str) -> list[str]:
    """Delete version JSON files at-or-below the last checkpoint (the
    spec's log cleanup — safe because replay of any version ≥ the
    checkpoint no longer needs them). Time travel below the checkpoint
    becomes an explicit error afterwards. Returns removed file names."""
    cp = _last_checkpoint(table)
    if cp is None:
        raise ValueError(f"cleanup_log: no checkpoint in {table}")
    removed = []
    for v in _list_versions(table):
        if v <= cp["version"]:
            os.remove(_version_file(table, v))
            removed.append(f"{v:020d}.json")
    return removed
